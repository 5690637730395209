"""GTP console: protocol framing + a short scripted game through the
engine (console_lib.py GoConsoleGTP behavior)."""

import io

import jax.numpy as jnp
import numpy as np

from elf_tpu.console.gtp import GtpConsole, GtpEngine
from elf_tpu.search.mcts import MCTSConfig


def uniform_builder(params, batch_stats):
    def eval_fn(feats, to_play):
        K = feats.shape[0]
        A = feats.shape[1] * feats.shape[2] + 1
        return jnp.full((K, A), -np.log(A)), jnp.zeros((K,))

    return eval_fn


def make_console(size=5):
    mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                      rotation_flip=False, remove_pass_if_dangerous=False)
    engine = GtpEngine(uniform_builder, mcfg, size=size, komi=7.5)
    return GtpConsole(engine)


class TestGtp:
    def test_protocol_basics(self):
        c = make_console()
        assert c.handle("protocol_version").startswith("= 2")
        assert c.handle("name").startswith("= elf_tpu")
        assert c.handle("7 name").startswith("=7 ")
        assert c.handle("bogus_cmd").startswith("?")
        assert c.handle("known_command genmove").startswith("= true")
        assert "genmove" in c.handle("list_commands")

    def test_play_and_genmove(self):
        c = make_console(size=5)
        assert c.handle("boardsize 5").startswith("=")
        assert c.handle("clear_board").startswith("=")
        assert c.handle("komi 7.5").startswith("=")
        assert c.handle("play B C3").startswith("=")
        resp = c.handle("genmove W")
        assert resp.startswith("= ")
        mv = resp.split()[1]
        assert mv in ("pass", "resign") or (
            mv[0] in "ABCDEFGHJ" and mv[1:].isdigit()
        )
        board = c.handle("showboard")
        assert "X" in board  # black stone on board

    def test_illegal_play_rejected(self):
        c = make_console(size=5)
        assert c.handle("play B C3").startswith("=")
        assert c.handle("play W C3").startswith("?")  # occupied

    def test_undo_and_score(self):
        c = make_console(size=5)
        c.handle("play B C3")
        assert c.handle("undo").startswith("=")
        board = c.handle("showboard")
        assert "X" not in board
        score = c.handle("final_score")
        assert score.startswith("= W+")  # empty board: komi to white

    def test_kgs_survival_commands(self):
        """final_status_list / time_settings / time_left must answer
        cleanly so KGS/gogui sessions do not abort (console_lib.py:207
        surface)."""
        c = make_console(size=5)
        c.handle("play B C3")
        assert c.handle("final_status_list dead").startswith("=")
        alive = c.handle("final_status_list alive")
        assert alive.startswith("= ") and "C3" in alive
        assert c.handle("time_settings 600 30 5").startswith("=")
        assert c.handle("kgs-time_settings byoyomi 600 30 5").startswith("=")
        assert c.handle("time_left B 120 3").startswith("=")
        assert c.handle("known_command final_status_list").startswith("= true")

    def test_resign_threshold_respected(self):
        """A losing evaluator triggers resign at the configured threshold;
        resign_thres=0 never resigns."""
        def losing_builder(params, batch_stats):
            def eval_fn(feats, to_play):
                K = feats.shape[0]
                A = feats.shape[1] * feats.shape[2] + 1
                # black-perspective value -0.99: black is hopeless
                return jnp.full((K, A), -np.log(A)), jnp.full((K,), -0.99)

            return eval_fn

        mcfg = MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                          rotation_flip=False,
                          remove_pass_if_dangerous=False)
        eng = GtpEngine(losing_builder, mcfg, size=5, komi=7.5,
                        resign_thres=0.05)
        assert eng.genmove("b") == "resign"
        eng0 = GtpEngine(losing_builder, mcfg, size=5, komi=7.5,
                         resign_thres=0.0)
        assert eng0.genmove("b") != "resign"

    def test_quit(self):
        c = make_console()
        out = io.StringIO()
        c.run(stdin=io.StringIO("name\nquit\nname\n"), stdout=out)
        text = out.getvalue()
        assert "elf_tpu" in text
        assert text.count("elf_tpu") == 1  # stopped at quit


def test_elf_ladder_extension():
    """elf-ladder <color> <vertex>: model-free ladder read over GTP."""
    import numpy as np
    from elf_tpu.console.gtp import GtpConsole, GtpEngine
    from elf_tpu.search.mcts import MCTSConfig
    import jax.numpy as jnp

    def builder(params, batch_stats):
        def eval_fn(feats, to_play):
            K = feats.shape[0]
            return jnp.full((K, 82), -np.log(82.0)), jnp.zeros((K,))
        return eval_fn

    eng = GtpEngine(builder, MCTSConfig(num_rollouts=4, rollouts_per_batch=2,
                                        rotation_flip=False), size=9)
    con = GtpConsole(eng)
    # classic ladder setup (see tests/test_golden_ladder.py): victim W
    # stone E5 in atari, driver stones; the escape F5 is ladder-doomed
    for color, vert in (("b", "E6"), ("b", "D5"), ("b", "E4"),
                        ("b", "G5")):
        assert con.handle(f"play {color} {vert}").startswith("=")
    assert con.handle("play w E5").startswith("=")
    out = con.handle("elf-ladder w F5")
    assert out.startswith("= doomed_escape"), out
    out = con.handle("elf-ladder b A1")
    assert out.strip() == "= none", out
    assert "elf-ladder" in con.handle("list_commands")

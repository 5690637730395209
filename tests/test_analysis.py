"""Analysis mode: SGF preload -> per-move suggestions + tree dumps
(README.rst:153-166 analysis.sh workflow; tree content per
tree_search_node.h:484 printTree)."""

import io
import os

import jax.numpy as jnp
import numpy as np

from elf_tpu.console.analysis import AnalysisConfig, AnalysisDriver
from elf_tpu.search.mcts import MCTSConfig


def uniform_builder(params, batch_stats):
    def eval_fn(feats, to_play):
        K = feats.shape[0]
        A = feats.shape[1] * feats.shape[2] + 1
        return jnp.full((K, A), -np.log(A)), jnp.zeros((K,))

    return eval_fn


SGF_5x5 = "(;GM[1]SZ[5]KM[7.5];B[cc];W[bb];B[dd];W[cb];B[db];W[dc])"


def make_driver(tmp_path, **over):
    sgf_path = os.path.join(tmp_path, "game.sgf")
    with open(sgf_path, "w") as f:
        f.write(SGF_5x5)
    cfg = AnalysisConfig(
        preload_sgf=sgf_path, komi=7.5,
        **over,
    )
    mcfg = MCTSConfig(num_rollouts=8, rollouts_per_batch=2, komi=7.5,
                      rotation_flip=False, remove_pass_if_dangerous=False)
    d = AnalysisDriver(uniform_builder, mcfg, cfg, size=5, seed=3)
    d.set_model(None, None)
    return d


class TestAnalysis:
    def test_follow_sgf_reports_every_move(self, tmp_path):
        d = make_driver(str(tmp_path), preload_sgf_move_to=2,
                        follow_sgf=True)
        out = io.StringIO()
        reports = d.run(out=out)
        # 6 SGF moves, preloaded to 2 -> 4 positions analyzed
        assert len(reports) == 4
        assert [r["ply"] for r in reports] == [2, 3, 4, 5]
        assert reports[0]["to_play"] == "B"
        # played moves follow the record: move 3 (0-based 2) is B[dd]
        assert reports[0]["played"] != ""
        text = out.getvalue()
        assert "suggest" in text and "final_score" in text

    def test_selfplay_continuation_and_tree_dump(self, tmp_path):
        prefix = os.path.join(str(tmp_path), "tree")
        d = make_driver(str(tmp_path), preload_sgf_move_to=4,
                        dump_record_prefix=prefix, max_moves=3)
        out = io.StringIO()
        reports = d.run(out=out)
        assert len(reports) == 3
        for r in reports:
            assert os.path.exists(r["tree_file"])
        content = open(reports[0]["tree_file"]).read()
        assert "- Total visit:" in content
        assert "- Prior Entropy:" in content
        assert "[n:" in content and "prior:" in content

    def test_suggestions_are_ranked_by_visits(self, tmp_path):
        d = make_driver(str(tmp_path), preload_sgf_move_to=0, max_moves=1)
        reports = d.run(out=io.StringIO())
        top = reports[0]["top"]
        ns = [t["n"] for t in top]
        assert ns == sorted(ns, reverse=True)
        assert reports[0]["suggested"] == top[0]["move"]

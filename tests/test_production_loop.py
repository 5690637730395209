"""CI-scale proof that the PRODUCTION distributed control plane learns:
1 train_server process + 2 selfplay_client processes over TCP, NO cheat
flags, real 5x5 MCTS self-play, and at least one REAL eval-gated
promotion (candidate beats baseline >= eval_winrate_thres over
color-swapped eval games; game_ctrl.h:202-232 updateModel).

This is the no-cheat counterpart of
tests/test_multiprocess.py::test_server_and_client_process_cheat_smoke (which
exercises the same plumbing with the reference's cheat-mode integration
strategy, SURVEY.md §4).  Full-scale evidence: scripts/prove_production.py
on 9x9/TPU (see README + docs/).

Eval games run policy-only (--eval_rollouts 0): at CI scale the
search-based eval is dominated by the 5x5 terminal Tromp-Taylor
shortcut (see tests/test_learning.py's rationale); raw-policy matches
are where real learning shows first.  The promotion itself is decided
by the production EvalSubCtrl winrate bound either way.
"""

import json
import os

import pytest

from scripts.prove_production import main as prod_main


@pytest.mark.timeout(1500)
def test_production_control_plane_promotes(tmp_path):
    out = str(tmp_path / "prod5")
    rc = prod_main([
        "--out", out, "--platform", "cpu",
        "--board_size", "5", "--num_block", "1", "--dim", "16",
        "--num_games", "24", "--komi", "2.5",
        "--rollouts", "16", "--rollouts_per_batch", "8",
        "--eval_rollouts", "0", "--eval_num_games", "16",
        "--selfplay_init_num", "64", "--selfplay_update_num", "32",
        "--num_minibatch", "24", "--train_bs", "64",
        "--target_promotions", "1", "--final_games", "0",
        "--max_seconds", "1200",
    ])
    assert rc == 0, "no real promotion within budget"

    # the promotion is real: against the version-0 random-init baseline,
    # and decided soundly — either the full 16 requested games ran, or
    # EvalSubCtrl's win-rate-bound early stop fired, in which case the
    # WORST-CASE rate (every undone game counted as a loss) must itself
    # clear the threshold (fair_pick.h:61-69 CheckWinrateBound;
    # elf_tpu/control/eval_ctrl.py:51 `lower`)
    promo_path = os.path.join(out, "ckpt", "promotions.jsonl")
    with open(promo_path) as f:
        promos = [json.loads(l) for l in f if l.strip()]
    assert len(promos) >= 1
    ev = promos[0]["eval"]
    assert ev["baseline"] == 0
    assert ev["winrate"] >= 0.55
    lower = ev["n_win"] / max(1, 16 - ev["n_stuck"])
    assert ev["n_done"] + ev["n_stuck"] >= 16 or lower >= 0.55, ev

    # records really flowed over TCP: the server journaled them
    jdir = os.path.join(out, "ckpt", "journal")
    journal_lines = sum(
        1
        for fn in os.listdir(jdir)
        for line in open(os.path.join(jdir, fn))
        if line.strip()
    )
    assert journal_lines >= 64  # at least the selfplay_init_num bar

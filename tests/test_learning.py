"""CI-scale proof that the self-play RL loop strengthens the model.

The full-scale, fixed-rollout proof is scripts/prove_learning.py on 9x9
(TPU, ~40 min: trained beats its random init 144/201 = 0.716 at 64
rollouts — see README).  This test runs the same no-cheat loop at 5x5
on CPU in a few minutes and asserts the trained net beats its frozen
random initialization under POLICY-ONLY play (the actPolicyOnly path,
num_rollouts=0).

Policy-only eval is used deliberately: at CI scale the search-based
eval is dominated by the terminal Tromp-Taylor shortcut for hundreds of
games (measured: after ~450 games of 5x5 training the trained net wins
0.78 policy-only but only ~0.46 at 16 rollouts), so the raw-policy
match is the fast, unambiguous signal that self-play training learned.
"""

import sys

import pytest

from scripts.prove_learning import main as prove_main


@pytest.mark.timeout(900)
def test_selfplay_training_beats_random_init(tmp_path):
    rc = prove_main([
        "--out", str(tmp_path / "ci5"),
        "--board_size", "5", "--blocks", "1", "--dim", "16",
        "--batch_boards", "32", "--rollouts", "16",
        "--rollouts_per_batch", "8", "--train_bs", "64",
        "--komi", "2.5", "--sample_ratio", "2.0",
        "--eval_every_games", "120", "--eval_games", "24",
        "--eval_rollouts", "0", "--final_games", "48",
        "--target_winrate", "0.6", "--min_replay_games", "32",
        "--max_seconds", "420",
        "--policy_distri_cutoff", "4", "--ply_pass_enabled", "8",
    ])
    assert rc == 0, "trained model failed to beat its random init"

"""Docs stay in sync with the driver's bench captures.

Hand-typed copies of driver-captured perf numbers went stale in three
consecutive review rounds (VERDICT r2/r3/r4 weak lists); the numbers now
live between BENCH markers that `tools/sync_bench_docs.py` regenerates
from the latest `BENCH_r*.json`.  This test fails when someone edits a
number by hand or a new capture lands without re-running the sync.
"""

from tools.sync_bench_docs import main as sync_main


def test_bench_numbers_in_docs_match_latest_capture():
    assert sync_main(["--check"]) == 0, (
        "README.md/docs/SCALING.md bench numbers are stale — run "
        "`python tools/sync_bench_docs.py`"
    )

from elf_tpu.search.mcts import MCTSConfig, MCTSResult, run_mcts  # noqa: F401

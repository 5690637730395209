from elf_tpu.sgf.sgf import SgfGame, parse_sgf, serialize_sgf  # noqa: F401

from elf_tpu.selfplay.actor import SelfplayActor, ActorConfig  # noqa: F401

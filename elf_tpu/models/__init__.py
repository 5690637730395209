from elf_tpu.models.resnet import PolicyValueNet, ModelConfig  # noqa: F401

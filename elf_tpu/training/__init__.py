from elf_tpu.training.trainer import TrainState, Trainer  # noqa: F401
from elf_tpu.training.loss import mcts_prediction_loss, multiple_prediction_loss  # noqa: F401

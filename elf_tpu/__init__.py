"""elf_tpu — TPU-native AlphaZero game-RL framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of pytorch/ELF
(ELF OpenGo): vectorized lockstep Go environment, array-of-trees batched MCTS,
policy/value ResNet, self-play -> replay -> learner loop, distributed
client/server control plane, and GTP play/analysis console.

Design: batching is the array (not a thread rendezvous); search and the game
engine run on-device under jit; the host-side control plane replaces ZMQ with
a TCP/JSON fabric with the same protocol semantics as the reference
(``/root/reference/src_cpp/elf/distributed/``).
"""

__version__ = "0.1.0"

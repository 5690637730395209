"""Torch-checkpoint import: numerical forward parity.

Builds an independent torch implementation of the documented reference
architecture (module names matching the reference state_dict layout,
df_model3.py:183-200), runs both it and our flax net with the imported
weights on the same input, and requires matching log-policy and value.
This is the compatibility proof for loading reference checkpoints such as
pretrained-go-19x19-v2.bin."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from elf_tpu.models.resnet import ModelConfig, PolicyValueNet  # noqa: E402
from elf_tpu.tools.import_torch import convert_state_dict, load_torch_checkpoint  # noqa: E402


def conv_bn_relu(cin, cout, k):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, padding=k // 2),
        tnn.BatchNorm2d(cout),
        tnn.ReLU(),
    )


class TorchBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_lower = conv_bn_relu(dim, dim, 3)
        self.conv_upper = conv_bn_relu(dim, dim, 3)
        self.relu = tnn.ReLU()

    def forward(self, s):
        y = self.conv_upper(self.conv_lower(s))
        return self.relu(y + s)


class TorchResNetWrap(tnn.Module):
    def __init__(self, dim, num_block):
        super().__init__()
        self.resnet = tnn.Sequential(*[TorchBlock(dim) for _ in range(num_block)])

    def forward(self, s):
        return self.resnet(s)


class TorchPolicyValue(tnn.Module):
    """Documented reference architecture, NCHW."""

    def __init__(self, board_size, planes, dim, num_block):
        super().__init__()
        d = board_size * board_size
        self.init_conv = conv_bn_relu(planes, dim, 3)
        self.resnet = TorchResNetWrap(dim, num_block)
        self.pi_final_conv = conv_bn_relu(dim, 2, 1)
        self.value_final_conv = conv_bn_relu(dim, 1, 1)
        self.pi_linear = tnn.Linear(d * 2, d + 1)
        self.value_linear1 = tnn.Linear(d, 256)
        self.value_linear2 = tnn.Linear(256, 1)
        self.relu = tnn.ReLU()
        self.d = d

    def forward(self, x):
        s = self.resnet(self.init_conv(x))
        pi = self.pi_final_conv(s)
        logits = self.pi_linear(pi.reshape(-1, self.d * 2))
        log_pi = tnn.functional.log_softmax(logits, dim=1)
        v = self.value_final_conv(s)
        v = self.relu(self.value_linear1(v.reshape(-1, self.d)))
        v = torch.tanh(self.value_linear2(v))
        return log_pi, v[:, 0]


class TestTorchImport:
    def test_forward_parity(self):
        size, planes, dim, blocks = 9, 18, 16, 2
        tm = TorchPolicyValue(size, planes, dim, blocks)
        tm.eval()
        # randomize BN running stats so import correctness is visible
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.3)
                    m.running_var.uniform_(0.5, 1.5)

        cfg = ModelConfig(board_size=size, num_planes=planes, num_block=blocks,
                          dim=dim, use_bf16=False)
        params, stats = convert_state_dict(tm.state_dict(), cfg)

        rng = np.random.RandomState(0)
        x = rng.randn(3, planes, size, size).astype(np.float32)
        with torch.no_grad():
            t_logpi, t_v = tm(torch.from_numpy(x))

        model = PolicyValueNet(cfg)
        x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
        j_logpi, j_v = model.apply(
            {"params": params, "batch_stats": stats}, x_nhwc, train=False
        )
        np.testing.assert_allclose(
            np.asarray(j_logpi), t_logpi.numpy(), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(j_v), t_v.numpy(), rtol=2e-4, atol=2e-4
        )

    def test_dataparallel_prefix_and_file_roundtrip(self, tmp_path):
        size, planes, dim, blocks = 5, 18, 8, 1
        tm = TorchPolicyValue(size, planes, dim, blocks)
        sd = {
            (f"module.{k}" if k.startswith("init_conv") else k): v
            for k, v in tm.state_dict().items()
        }
        path = tmp_path / "save-7.bin"
        torch.save({"state_dict": sd, "step": 7, "options": {}}, str(path))
        cfg = ModelConfig(board_size=size, num_planes=planes, num_block=blocks,
                          dim=dim, use_bf16=False)
        params, stats, step = load_torch_checkpoint(str(path), cfg)
        assert step == 7
        assert params["init_conv"]["kernel"].shape == (3, 3, planes, dim)
        # jit-compatible forward
        model = PolicyValueNet(cfg)
        out = model.apply(
            {"params": jax.tree.map(jnp.asarray, params),
             "batch_stats": jax.tree.map(jnp.asarray, stats)},
            jnp.zeros((1, size, size, planes)), train=False,
        )
        assert np.isfinite(np.asarray(out[0])).all()

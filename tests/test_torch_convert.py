"""Golden parity: torch conv/BN/linear weights converted to flax must
produce bit-close outputs (SURVEY.md §4 'golden parity' tests)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from v2x_sim_tpu.train.torch_convert import convert_state_dict, convert_tensor


class TorchBlock(torch.nn.Module):
    """conv-bn-relu-conv-bn-relu + linear head, mirroring ConvBlock."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(4, 8, 3, stride=2, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(8)
        self.conv2 = torch.nn.Conv2d(8, 8, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(8)
        self.fc = torch.nn.Linear(8, 3)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        return self.fc(x.mean(dim=(2, 3)))


class FlaxBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        # Explicit ((1,1),(1,1)) padding: torch's pad-1 differs from XLA
        # "SAME" for stride-2 even-sized inputs.
        x = nn.Conv(
            8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=False, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (3, 3), use_bias=False, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn2")(x)
        x = nn.relu(x)
        return nn.Dense(3, name="fc")(jnp.mean(x, axis=(1, 2)))


def test_conversion_rules():
    w = torch.randn(8, 4, 3, 3)
    name, arr = convert_tensor("conv.weight", w)
    assert name == "kernel" and arr.shape == (3, 3, 4, 8)
    name, arr = convert_tensor("fc.weight", torch.randn(3, 8))
    assert name == "kernel" and arr.shape == (8, 3)
    name, _ = convert_tensor("bn.running_mean", torch.randn(8))
    assert name == "mean"
    name, _ = convert_tensor("bn.weight", torch.randn(8))
    assert name == "scale"


def test_end_to_end_prediction_parity():
    torch.manual_seed(0)
    tm = TorchBlock().eval()
    # Make BN stats non-trivial.
    with torch.no_grad():
        tm.bn1.running_mean.uniform_(-0.5, 0.5)
        tm.bn1.running_var.uniform_(0.5, 1.5)
        tm.bn2.running_mean.uniform_(-0.5, 0.5)
        tm.bn2.running_var.uniform_(0.5, 1.5)

    key_map = {
        "conv1": ("conv1",),
        "bn1": ("bn1",),
        "conv2": ("conv2",),
        "bn2": ("bn2",),
        "fc": ("fc",),
    }
    variables = convert_state_dict(tm.state_dict(), key_map)

    x = np.random.default_rng(1).standard_normal((2, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        FlaxBlock().apply(
            {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            },
            jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)

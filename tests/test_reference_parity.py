"""End-to-end golden parity: torch reference model -> converted flax params
-> identical predictions.

VERDICT.md round-1 task 2: the strongest checkpoint-parity evidence
available offline (/root/reference/README.md:46 checkpoints unreachable).
The torch model (v2x_sim_tpu.baselines.torch_ref) is the reference graph
(STPN backbone + heads + DiscoNet fusion); its randomly-initialized
state_dict is converted through train.torch_convert and applied to the
flax DetModel. Any divergence in conv padding, BN semantics, bilinear
resize, grid_sample convention, head layout, or fusion masking fails
these tests.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from v2x_sim_tpu.baselines.torch_ref import build_model, key_map
from v2x_sim_tpu.configs.config import Config, GridConfig
from v2x_sim_tpu.models.det.net import DetModel
from v2x_sim_tpu.train.torch_convert import convert_state_dict

CFG = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))  # 64x64x8


def _randomize_bn_stats(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)


def _inputs(seed=0, b=1):
    rng = np.random.default_rng(seed)
    a = CFG.num_agents
    h, w, d = CFG.grid.grid_shape
    occ = (rng.random((b, a, h, w, d)) < 0.02).astype(np.float32)
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    for i in range(a):
        for j in range(a):
            if i == j:
                continue
            yaw = rng.uniform(-0.8, 0.8)
            c, s = np.cos(yaw), np.sin(yaw)
            trans[:, i, j, :2, :2] = [[c, -s], [s, c]]
            trans[:, i, j, :2, 3] = rng.uniform(-6, 6, 2)
    mask = np.ones((b, a), bool)
    mask[:, -1] = False  # exercise padded-agent masking
    return occ, trans, mask


@pytest.mark.parametrize("mode", ["lowerbound", "disco"])
def test_prediction_parity(mode):
    torch.manual_seed(0)
    tcls = build_model(
        CFG.grid.grid_shape,
        CFG.grid.area_extents,
        CFG.anchors.num_anchors,
        CFG.num_classes,
        CFG.anchors.box_code_size,
        CFG.fusion_layer,
    )
    tmodel = tcls(mode=mode).eval()
    _randomize_bn_stats(tmodel)

    variables = convert_state_dict(tmodel.state_dict(), key_map(mode))

    occ, trans, mask = _inputs()
    with torch.no_grad():
        want_cls, want_reg = tmodel(
            torch.from_numpy(occ.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(trans),
            torch.from_numpy(mask),
        )

    fmodel = DetModel(config=CFG, mode=mode, s2d=False)
    got = fmodel.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(occ),
        jnp.asarray(trans),
        jnp.asarray(mask),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got.cls_logits), want_cls.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.reg), want_reg.numpy(), atol=2e-4
    )


def test_converted_tree_matches_init_tree():
    """The converted tree must be structurally identical to a fresh flax
    init — catches silent extra/missing params that apply() would accept
    or misplace."""
    torch.manual_seed(1)
    tcls = build_model(
        CFG.grid.grid_shape,
        CFG.grid.area_extents,
        CFG.anchors.num_anchors,
        CFG.num_classes,
        CFG.anchors.box_code_size,
        CFG.fusion_layer,
    )
    tmodel = tcls(mode="disco").eval()
    variables = convert_state_dict(tmodel.state_dict(), key_map("disco"))

    occ, trans, mask = _inputs(seed=1)
    fmodel = DetModel(config=CFG, mode="disco", s2d=False)
    ref = fmodel.init(
        jax.random.PRNGKey(0),
        jnp.asarray(occ),
        jnp.asarray(trans),
        jnp.asarray(mask),
        train=False,
    )

    def paths(tree):
        return {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(ref["params"]) == paths(variables["params"])
    assert paths(ref["batch_stats"]) == paths(variables["batch_stats"])

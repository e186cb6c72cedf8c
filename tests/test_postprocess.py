"""decode_topk / transform_boxes / late_fuse behavior."""

import numpy as np
import jax.numpy as jnp

from v2x_sim_tpu.ops.postprocess import late_fuse, transform_boxes


def _t(yaw, tx, ty):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[:2, :2] = [[c, -s], [s, c]]
    m[0, 3], m[1, 3] = tx, ty
    return m


def test_transform_boxes_rigid():
    box = jnp.asarray([2.0, 0.0, 4.0, 2.0, 0.3])
    t = jnp.asarray(_t(np.pi / 2, 1.0, -1.0))
    out = np.asarray(transform_boxes(box, t))
    # (2,0) rotated 90deg -> (0,2), plus (1,-1) -> (1,1)
    np.testing.assert_allclose(out[:2], [1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(out[2:4], [4.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(out[4], 0.3 + np.pi / 2, atol=1e-5)


def test_transform_roundtrip():
    rng = np.random.default_rng(0)
    boxes = np.stack(
        [
            rng.uniform(-10, 10, 8),
            rng.uniform(-10, 10, 8),
            rng.uniform(2, 5, 8),
            rng.uniform(1, 2, 8),
            rng.uniform(-np.pi, np.pi, 8),
        ],
        -1,
    ).astype(np.float32)
    t = _t(0.7, 3.0, -2.0)
    back = np.asarray(
        transform_boxes(
            transform_boxes(jnp.asarray(boxes), jnp.asarray(t)),
            jnp.asarray(np.linalg.inv(t).astype(np.float32)),
        )
    )
    np.testing.assert_allclose(back[:, :4], boxes[:, :4], atol=1e-4)


def test_late_fuse_recovers_other_agents_box():
    """Agent 1 detects a box agent 0 missed; after late fusion agent 0
    has it, expressed in agent 0's frame."""
    b, a, k = 1, 2, 4
    boxes = np.zeros((b, a, k, 5), np.float32)
    scores = np.zeros((b, a, k), np.float32)
    valid = np.zeros((b, a, k), bool)
    # Agent 1's detection at (5, 0) in its own frame.
    boxes[0, 1, 0] = [5.0, 0.0, 4.0, 2.0, 0.0]
    scores[0, 1, 0] = 0.9
    valid[0, 1, 0] = True
    # Agent 1 is at x=+10 in agent 0's frame: T_{0<-1} translates +10.
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    trans[0, 0, 1] = _t(0.0, 10.0, 0.0)
    trans[0, 1, 0] = _t(0.0, -10.0, 0.0)
    agent_mask = np.ones((b, a), bool)

    res = late_fuse(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(valid),
        jnp.asarray(trans),
        jnp.asarray(agent_mask),
        0.1,
    )
    kept0 = np.asarray(res.boxes[0, 0])[np.asarray(res.valid[0, 0])]
    assert len(kept0) == 1
    np.testing.assert_allclose(kept0[0][:2], [15.0, 0.0], atol=1e-4)
    kept1 = np.asarray(res.boxes[0, 1])[np.asarray(res.valid[0, 1])]
    np.testing.assert_allclose(kept1[0][:2], [5.0, 0.0], atol=1e-4)


def test_late_fuse_deduplicates():
    """Both agents detect the same physical box -> one survivor per ego."""
    b, a, k = 1, 2, 2
    boxes = np.zeros((b, a, k, 5), np.float32)
    scores = np.zeros((b, a, k), np.float32)
    valid = np.zeros((b, a, k), bool)
    boxes[0, 0, 0] = [5.0, 0.0, 4.0, 2.0, 0.0]   # in agent-0 frame
    boxes[0, 1, 0] = [-5.0, 0.0, 4.0, 2.0, 0.0]  # same box, agent-1 frame
    scores[0, 0, 0] = 0.8
    scores[0, 1, 0] = 0.9
    valid[0, 0, 0] = valid[0, 1, 0] = True
    trans = np.tile(np.eye(4, dtype=np.float32), (b, a, a, 1, 1))
    trans[0, 0, 1] = _t(0.0, 10.0, 0.0)
    trans[0, 1, 0] = _t(0.0, -10.0, 0.0)
    res = late_fuse(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(valid),
        jnp.asarray(trans),
        jnp.asarray(np.ones((b, a), bool)),
        0.1,
    )
    assert int(res.valid[0, 0].sum()) == 1
    # The higher-scoring duplicate (agent 1's) wins.
    assert float(res.scores[0, 0].max()) > 0.85


def test_decode_topk_blocked_matches_plain():
    """Blocked-layout decode == plain decode on the same logical maps."""
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.models.s2d import depth_to_space
    from v2x_sim_tpu.ops.anchors import anchor_grid
    from v2x_sim_tpu.ops.postprocess import decode_topk, decode_topk_blocked

    cfg = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))  # 64x64x8
    h, w = cfg.grid.bev_shape
    kk = cfg.anchors.num_anchors
    b, a, nc, code = 2, 3, 2, 6
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    # Blocked head outputs: (B, A, h/2, w/2, 4K, C), phase-major anchors.
    cls_blk = jax.random.normal(k1, (b, a, h // 2, w // 2, 4 * kk, nc))
    reg_blk = jax.random.normal(k2, (b, a, h // 2, w // 2, 4 * kk, code)) * 0.1
    am = jnp.ones((b, a), bool)

    # Plain view of the same maps: undo the 2x2 blocking channel-wise.
    def unblock(x):
        lead = x.shape[:2]
        flat = x.reshape(lead + (h // 2, w // 2, -1))  # (…, 4*K*C)
        plain = depth_to_space(flat.reshape((-1,) + flat.shape[2:]))
        return plain.reshape(lead + (h, w, kk, x.shape[-1]))

    cls_p, reg_p = unblock(cls_blk), unblock(reg_blk)
    anchors = jnp.asarray(anchor_grid(cfg))

    for pw in (0, 3):  # pw=3 also covers the blocked peak-filter relayout
        ref = decode_topk(
            cls_p, reg_p, anchors, 32, 0.3, am, exact=True, peak_window=pw
        )
        got = decode_topk_blocked(
            cls_blk, reg_blk, cfg, 32, 0.3, am, exact=True, peak_window=pw
        )
        for r, g, name in zip(ref, got, ("boxes", "scores", "valid")):
            np.testing.assert_allclose(
                np.asarray(r, np.float32), np.asarray(g, np.float32),
                atol=1e-5, err_msg=f"{name} pw={pw}",
            )


def test_decode_topk_blocked_lazy_matches_standard():
    """Lazy decode (reg 1x1 conv at top-K cells) == standard blocked
    decode on the full reg map produced by the same conv."""
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.ops.postprocess import (
        decode_topk_blocked,
        decode_topk_blocked_lazy,
    )

    cfg = Config(grid=GridConfig(voxel_size=(1.0, 1.0, 0.625)))  # 64x64x8
    h, w = cfg.grid.bev_shape
    kk = cfg.anchors.num_anchors
    b, a, nc, code, hid = 2, 3, 2, 6, 32
    key = jax.random.PRNGKey(8)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cls_blk = jax.random.normal(k1, (b, a, h // 2, w // 2, 4 * kk, nc))
    hidden = jax.nn.relu(
        jax.random.normal(k2, (b, a, h // 2, w // 2, 4 * hid))
    )
    w1 = jax.random.normal(k3, (1, 1, hid, kk * code)) * 0.1
    b1 = jax.random.normal(k4, (kk * code,)) * 0.1

    # Full reg map via the S2DConv1x1 semantics (per-phase matmul).
    xg = hidden.reshape(b, a, h // 2, w // 2, 4, hid)
    full = xg @ w1[0, 0] + b1  # (…, 4, K*code)
    reg_blk = full.reshape(b, a, h // 2, w // 2, 4 * kk, code)

    am = jnp.ones((b, a), bool)
    ref = decode_topk_blocked(cls_blk, reg_blk, cfg, 32, 0.3, am, exact=True)
    got = decode_topk_blocked_lazy(
        cls_blk, hidden, w1, b1, cfg, 32, 0.3, am, exact=True
    )
    for r, g, name in zip(ref, got, ("boxes", "scores", "valid")):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32),
            atol=1e-4, err_msg=name,
        )


def test_peak_filter_recovers_all_vehicles_at_saturated_scores():
    """Production-geometry failure mode (docs/UPPERBOUND_DIAGNOSIS.md):
    each vehicle saturates a blob of anchors, so a global top-K fills
    with duplicates of the strongest blobs and NMS collapses them. With
    the 3x3 peak filter, k=16 must yield one box per vehicle."""
    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.ops.anchors import anchor_grid
    from v2x_sim_tpu.ops.nms import batched_nms
    from v2x_sim_tpu.ops.postprocess import decode_topk

    cfg = Config(grid=GridConfig())  # production 256x256, 0.25 m voxels
    anchors = jnp.asarray(anchor_grid(cfg))
    h, w, kk = anchors.shape[:3]
    rng = np.random.default_rng(0)
    centers = [(40, 40), (40, 200), (128, 128), (200, 64), (220, 220)]
    diff = np.full((1, 1, h, w, kk), -12.0, np.float32)
    for n, (ci, cj) in enumerate(centers):
        # 9x9 saturated blob with a faint gradient toward the center and
        # per-blob amplitude spread -- the post-training score surface.
        for di in range(-4, 5):
            for dj in range(-4, 5):
                d = max(abs(di), abs(dj))
                diff[0, 0, ci + di, cj + dj, :] = 12.0 - 0.1 * d - 0.2 * n
    diff += rng.normal(0, 1e-3, diff.shape).astype(np.float32)
    cls = np.zeros((1, 1, h, w, kk, 2), np.float32)
    cls[..., 1] = diff / 2
    cls[..., 0] = -diff / 2
    reg = np.zeros((1, 1, h, w, kk, 6), np.float32)
    am = jnp.ones((1, 1), bool)

    def n_found(peak_window):
        boxes, scores, valid = decode_topk(
            jnp.asarray(cls), jnp.asarray(reg), anchors, 16, 0.05, am,
            exact=True, peak_window=peak_window,
        )
        res = batched_nms(boxes, scores, valid, 0.1)
        kept = np.asarray(res.boxes)[np.asarray(res.valid)]
        # Count distinct vehicle centers among kept boxes (anchor decode
        # with zero reg lands at the cell center).
        found = set()
        for bx in kept:
            for ci, cj in centers:
                cx = cfg.grid.lower[0] + (ci + 0.5) * cfg.grid.voxel_size[0]
                cy = cfg.grid.lower[1] + (cj + 0.5) * cfg.grid.voxel_size[1]
                if abs(bx[0] - cx) < 1.5 and abs(bx[1] - cy) < 1.5:
                    found.add((ci, cj))
        return len(found)

    assert n_found(0) < len(centers)  # global top-16: duplicate-capped
    assert n_found(3) == len(centers)  # peak-filtered: all recovered

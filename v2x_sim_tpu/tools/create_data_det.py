"""Offline preprocessing CLI.

Analog of † coperception/tools/det/create_data_det.py (SURVEY.md §3.1):
walks a nuScenes-format V2X-Sim root (or generates synthetic scenes) and
writes one .npz Scene frame per sample into a cache directory that
train/test stream from. Unlike the reference, voxelization and anchor
assignment are NOT baked here — they run on-device at train time — so
the cache stays small and geometry/anchor changes don't invalidate it.
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="synthetic", help="nuScenes-format root or 'synthetic'")
    p.add_argument("--split", default="train")
    p.add_argument("--savepath", required=True)
    p.add_argument("--scenes", type=int, default=4, help="synthetic scene count")
    p.add_argument("--frames", type=int, default=10, help="synthetic frames/scene")
    p.add_argument("--grid", default="full", choices=["full", "small"])
    p.add_argument("--rsu", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--uncompressed", action="store_true",
        help="write plain (uncompressed) .npz frames: ~3x the bytes, no "
        "zlib decompress on the read path (datasets.cache wire knobs)",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="run the baking ops (visibility / targets) on host CPU "
        "instead of the TPU tunnel — offline preprocessing shouldn't "
        "contend with a training job for the chip",
    )
    p.add_argument(
        "--vis",
        type=int,
        default=0,
        help="also bake per-agent visibility maps (ops.visibility) into "
        "the cache, like the reference's vis_maps",
    )
    p.add_argument(
        "--vis_samples", type=int, default=None,
        help="ray samples per point (default: ops.visibility.DEFAULT_NUM_SAMPLES)"
    )
    p.add_argument(
        "--targets", type=int, default=0,
        help="also bake sparse anchor-assignment targets into the cache "
        "(the reference bakes targets offline in create_data, SURVEY.md "
        "§3.1): training then skips the per-batch windowed rotated-IoU "
        "assignment and runs at step-only rate. The baked form is the "
        "layout-independent sparse assignment, so it serves blocked and "
        "plain head layouts alike; a geometry fingerprint (tgt_meta) "
        "lets train_det drop stale targets if the grid/anchor config "
        "changed since baking",
    )
    return p.parse_args()


def _add_vis(frame, config, num_samples):
    import jax.numpy as jnp
    import numpy as np

    from v2x_sim_tpu.ops.visibility import DEFAULT_NUM_SAMPLES, visibility_batch

    vis = visibility_batch(
        jnp.asarray(frame["points"]),
        jnp.asarray(frame["point_mask"]),
        config.grid,
        num_samples=(num_samples if num_samples is not None
                     else DEFAULT_NUM_SAMPLES),
    )
    frame = dict(frame)
    frame["vis_maps"] = np.asarray(vis, dtype=np.int8)
    return frame


def _add_targets(frame, config, anchors, caps=None):
    """Bake the sparse anchor assignment (ops.assign, flat='sparse') for
    every agent of one frame. Stored pre-layout: the s2d blocking /
    positive-index transforms are cheap integer ops that stay in
    DetModule.prepare_batch, so one cache serves every head layout.

    The dense cls-label map is stored COMPRESSED as padded positive /
    ignore flat-index lists (tgt_pos_idx / tgt_ign_idx — 12x smaller on
    disk and over the train-time host->device link; DetModule rebuilds
    the dense map on device). `caps` is a mutable dict holding the index
    capacities, auto-sized off the first frame (2x margin, 128-rounded)
    and asserted on every later frame so all frames stack uniformly.
    """
    import jax.numpy as jnp
    import numpy as np

    from v2x_sim_tpu.ops.assign import (
        _sparse_label_idx_jit,
        assign_targets_batched,
        label_counts,
        target_fingerprint,
    )

    sp = assign_targets_batched(
        jnp.asarray(frame["gt_boxes"]),  # (A, M, 5): agents as the batch
        jnp.asarray(frame["gt_mask"]),
        anchors,
        config,
        flat="sparse",
    )
    h, w, k, _ = anchors.shape
    n = h * w * k
    if caps is None:
        caps = {}
    if "caps" not in caps:
        counts = label_counts(sp.labels)
        caps["caps"] = tuple(
            max(128, int(-(-2 * int(c) // 128) * 128)) for c in counts
        )
    pos, ign, npos, nign = _sparse_label_idx_jit(*caps["caps"], n)(sp.labels)
    assert int(npos) <= caps["caps"][0] and int(nign) <= caps["caps"][1], (
        f"label index capacity exceeded (pos {int(npos)}/{caps['caps'][0]}, "
        f"ign {int(nign)}/{caps['caps'][1]}) — this frame has far more "
        "positive/ignore anchors than the first one; re-run with a "
        "different --seed ordering or raise the caps in _add_targets"
    )
    frame = dict(frame)
    frame["tgt_pos_idx"] = np.asarray(pos, np.int32)
    frame["tgt_ign_idx"] = np.asarray(ign, np.int32)
    frame["tgt_cells"] = np.asarray(sp.cells, np.int32)
    frame["tgt_wts"] = np.asarray(sp.wts, np.float32)
    frame["tgt_reg"] = np.asarray(sp.reg, np.float32)
    frame["tgt_meta"] = np.array(
        [h, w, k, sp.cells.shape[-1], target_fingerprint(config)], np.int32
    )
    return frame


def main():
    args = parse_args()
    import os

    from v2x_sim_tpu.tools.common import force_cpu_if_requested

    force_cpu_if_requested(args)

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.datasets.cache import save_frame

    grid = GridConfig(voxel_size=(1.0, 1.0, 0.625)) if args.grid == "small" else GridConfig()
    config = Config(grid=grid)

    anchors = None
    target_caps = {}
    if args.targets:
        import jax.numpy as jnp

        from v2x_sim_tpu.ops.anchors import anchor_grid

        anchors = jnp.asarray(anchor_grid(config))

    out = os.path.join(args.savepath, args.split)
    count = 0
    if args.root == "synthetic":
        from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_scene

        spec = SyntheticSpec(
            points_per_agent=2048 if args.grid == "small" else 8192
        )
        for si in range(args.scenes):
            for fi in range(args.frames):
                frame = generate_scene(
                    config, spec, seed=args.seed + si * 10_007 + fi
                )
                if args.vis:
                    frame = _add_vis(frame, config, args.vis_samples)
                if args.targets:
                    frame = _add_targets(frame, config, anchors, target_caps)
                save_frame(out, f"scene{si:04d}_frame{fi:03d}", frame,
                           compress=not args.uncompressed)
                count += 1
    else:
        from v2x_sim_tpu.datasets.nuscenes import V2XSimDataset

        version = next(
            d for d in sorted(os.listdir(args.root)) if d.startswith("v1.0")
        )
        ds = V2XSimDataset(
            args.root, config, version=version, use_rsu=bool(args.rsu),
            # Scene-level partition, not just an output dir name: the
            # train/test caches must hold disjoint scenes.
            split=args.split if args.split in ("train", "val", "test") else None,
        )
        for i in range(len(ds)):
            frame = ds[i]
            if args.vis:
                frame = _add_vis(frame, config, args.vis_samples)
            if args.targets:
                frame = _add_targets(frame, config, anchors, target_caps)
            save_frame(out, f"frame{i:06d}", frame,
                       compress=not args.uncompressed)
            count += 1
    print(f"wrote {count} frames to {out}")


if __name__ == "__main__":
    main()

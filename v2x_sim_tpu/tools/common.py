"""Shared CLI plumbing for the tools layer.

Keeps the reference's flag surface (`--com`, `--layer`, `--kd_flag`,
`--rsu`, `--warp_flag`, `--resume`, ... — † coperception/tools/*,
SURVEY.md §2.2) so users of the reference find the same switches.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

from v2x_sim_tpu.configs.config import Config, GridConfig

#: reference --com spellings -> internal mode names.
COM_ALIASES = {
    "none": "lowerbound",
    "lowerbound": "lowerbound",
    "upperbound": "upperbound",
    "when2com": "when2com",
    "who2com": "who2com",
    "v2v": "v2v",
    "v2vnet": "v2v",
    "disco": "disco",
    "disconet": "disco",
    "sum": "sum",
    "mean": "mean",
    "max": "max",
    "cat": "cat",
    "agent": "agent",
}


def force_cpu_if_requested(args) -> None:
    """--cpu reroutes jax off the TPU tunnel (see .claude/skills/verify).
    Also enables the persistent compilation cache either way."""
    if getattr(args, "cpu", False):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--data",
        default="synthetic",
        help="nuScenes-format V2X-Sim root, .npz cache dir from "
        "create_data, or 'synthetic'",
    )
    p.add_argument(
        "--com",
        default="lowerbound",
        choices=sorted(COM_ALIASES),
        help="collaboration strategy (reference --com)",
    )
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--layer", type=int, default=3, help="fusion encoder stage")
    p.add_argument("--rsu", type=int, default=1, help="include the RSU agent")
    p.add_argument("--warp_flag", type=int, default=1)
    p.add_argument("--logpath", default="runs/default")
    p.add_argument("--resume", default="", help="checkpoint path to resume")
    p.add_argument("--cpu", action="store_true", help="run on local CPU")
    p.add_argument(
        "--grid",
        default="full",
        choices=["full", "small"],
        help="small = 64x64 BEV for CPU smoke runs",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--bf16", action="store_true", help="bfloat16 activations (MXU fast path)"
    )
    p.add_argument(
        "--width_mult", type=float, default=1.0,
        help="uniform channel scale on the backbone stages (1.0 = "
        "reference widths; 0.25 = CI-cost model, same architecture)",
    )
    p.add_argument(
        "--use_vis",
        type=int,
        default=0,
        help="feed visibility maps (reference vis_maps) as extra input "
        "channels; bake them with create_data --vis for full-speed runs",
    )


def build_config(args) -> Config:
    if args.grid == "small":
        grid = GridConfig(voxel_size=(1.0, 1.0, 0.625))
    else:
        grid = GridConfig()
    return Config(grid=grid, fusion_layer=args.layer)


def resolve_mode(args) -> str:
    return COM_ALIASES[args.com]


def strip_stale_targets(raw: dict, config: Config) -> dict:
    """Guard for baked anchor targets (create_data_det --targets 1).

    Compares the cache's fingerprint (tgt_meta = [H, W, K, Pc, crc] where
    crc hashes the realized anchor table + assignment thresholds,
    ops.assign.target_fingerprint) against the live config; on mismatch
    every tgt_* key is dropped so training falls back to on-device
    assignment instead of silently optimizing against another config's
    targets. Legacy 4-int metas (pre-crc caches) are treated as stale —
    they cannot prove their anchor table matches; re-run create_data.
    tgt_meta itself is always removed — it is host-side metadata, not a
    device input."""
    if "tgt_meta" not in raw:
        return raw
    import numpy as np

    from v2x_sim_tpu.ops.assign import sparse_cell_capacity, target_fingerprint

    h, w = config.grid.bev_shape
    k = config.anchors.num_anchors
    arr = np.asarray(raw["tgt_meta"])
    meta = tuple(int(x) for x in arr.reshape(-1, arr.shape[-1])[0])
    want = (h, w, k, sparse_cell_capacity(config), target_fingerprint(config))
    if meta == want:
        return {k2: v for k2, v in raw.items() if k2 != "tgt_meta"}
    return {k2: v for k2, v in raw.items() if not k2.startswith("tgt_")}


def make_batches(
    args, config: Config, split_seed: int = 0, num_batches: int = 8,
    shuffle: bool = True,
):
    """Yield host batches from synthetic data, an .npz cache, or a
    nuScenes-format root.

    `num_batches` and `split_seed` apply to EVERY source (review round-2:
    they were silently ignored for npz/nuScenes data — eval size limits
    were no-ops and every epoch replayed one shuffle order). Evaluation
    tools pass shuffle=False so dumped detections stay in temporal order
    for the tracking stage.
    """
    import itertools

    import numpy as np

    from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_batch

    if args.data == "synthetic":
        spec = SyntheticSpec(
            points_per_agent=2048 if args.grid == "small" else 8192
        )
        for i in range(num_batches):
            batch = generate_batch(
                config, spec, args.batch, seed=args.seed + split_seed + i
            )
            if not args.rsu:
                # Reference --rsu 0: drop the road-side unit (agent 0).
                batch["agent_mask"] = batch["agent_mask"].copy()
                batch["agent_mask"][:, 0] = False
            yield batch
    elif os.path.isdir(os.path.join(args.data, "v1.0-mini")) or any(
        d.startswith("v1.0") for d in os.listdir(args.data)
    ):
        from v2x_sim_tpu.datasets.nuscenes import V2XSimDataset

        version = next(
            d for d in sorted(os.listdir(args.data)) if d.startswith("v1.0")
        )
        ds = V2XSimDataset(
            args.data, config, version=version, use_rsu=bool(args.rsu)
        )
        yield from itertools.islice(
            ds.batches(
                args.batch, shuffle=shuffle, seed=args.seed + split_seed
            ),
            num_batches,
        )
    else:
        from v2x_sim_tpu.datasets.cache import NpzCacheDataset

        ds = NpzCacheDataset(args.data)
        yield from itertools.islice(
            ds.batches(
                args.batch, shuffle=shuffle, seed=args.seed + split_seed
            ),
            num_batches,
        )

"""Offline preprocessing for segmentation.

Analog of † coperception/tools/seg/create_data_seg.py (SURVEY.md §2.2):
same frame extraction as create_data_det plus BEV semantic label maps
(vehicle footprints; map layers via utils.mapping when polygons exist).
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="synthetic")
    p.add_argument("--split", default="train")
    p.add_argument("--savepath", required=True)
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--grid", default="full", choices=["full", "small"])
    p.add_argument("--rsu", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--uncompressed", action="store_true",
        help="write plain (uncompressed) .npz frames: ~3x the bytes, no "
        "zlib decompress on the read path (datasets.cache wire knobs)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import os

    from v2x_sim_tpu.configs.config import Config, GridConfig
    from v2x_sim_tpu.datasets.cache import save_frame

    grid = (
        GridConfig(voxel_size=(1.0, 1.0, 0.625))
        if args.grid == "small"
        else GridConfig()
    )
    config = Config(grid=grid)
    out = os.path.join(args.savepath, args.split)
    count = 0
    if args.root == "synthetic":
        from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_scene

        spec = SyntheticSpec(
            points_per_agent=2048 if args.grid == "small" else 8192
        )
        for si in range(args.scenes):
            for fi in range(args.frames):
                frame = generate_scene(config, spec, seed=args.seed + si * 10_007 + fi)
                save_frame(out, f"scene{si:04d}_frame{fi:03d}", frame,
                           compress=not args.uncompressed)
                count += 1
    else:
        from v2x_sim_tpu.datasets.nuscenes import V2XSimDataset

        version = next(
            d for d in sorted(os.listdir(args.root)) if d.startswith("v1.0")
        )
        ds = V2XSimDataset(
            args.root,
            config,
            version=version,
            use_rsu=bool(args.rsu),
            with_seg_labels=True,
            split=args.split if args.split in ("train", "val", "test") else None,
        )
        for i in range(len(ds)):
            save_frame(out, f"frame{i:06d}", ds[i],
                       compress=not args.uncompressed)
            count += 1
    print(f"wrote {count} frames to {out}")


if __name__ == "__main__":
    main()

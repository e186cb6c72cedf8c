"""Detection evaluation CLI.

Analog of † coperception/tools/det/test_codet.py (SURVEY.md §2.2/§3.3):
loads a checkpoint, runs per-scene inference, reports per-agent ("local")
and averaged ("global") mAP@0.5/0.7, optionally dumps detections for the
tracking pipeline and renders BEV visualizations.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    from v2x_sim_tpu.tools.common import add_common_args

    add_common_args(p)
    p.add_argument("--kd_flag", type=int, default=0)
    p.add_argument("--score_threshold", type=float, default=0.3)
    p.add_argument("--nms_iou", type=float, default=0.1)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--save_dets", default="", help="dir to dump per-frame dets")
    p.add_argument("--visualize", default="", help="dir for BEV renderings")
    p.add_argument(
        "--late_fusion",
        action="store_true",
        help="merge per-agent boxes into each ego frame + re-NMS "
        "(reference test-time late-fusion mode)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from v2x_sim_tpu.tools.common import (
        build_config,
        force_cpu_if_requested,
        make_batches,
        resolve_mode,
    )

    force_cpu_if_requested(args)
    import jax
    import jax.numpy as jnp

    from v2x_sim_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from v2x_sim_tpu.train.det_module import DetModule
    from v2x_sim_tpu.utils.mean_ap import eval_map_agents

    config = build_config(args)
    mode = resolve_mode(args)
    module = DetModule(
        config,
        mode=mode,
        use_vis=bool(args.use_vis),
        warp_flag=bool(args.warp_flag),
        width_mult=args.width_mult,
    )

    all_det_boxes, all_scores, all_valid = [], [], []
    all_gt, all_gt_mask, all_agent_mask = [], [], []

    state = None
    for bi, raw in enumerate(
        make_batches(
            # Eval seeds live at +2^31 — disjoint from train's
            # epoch*1000+i space (777k collided at --nepoch >= 778);
            # shuffle=False keeps dumped dets in temporal order for SORT.
            args, config, split_seed=2**31, num_batches=args.num_batches,
            shuffle=False,
        )
    ):
        # tgt_* are baked *training* targets (create_data_det --targets):
        # dead weight on the eval path — don't ship them to the device.
        batch = {
            k: jnp.asarray(v)
            for k, v in raw.items()
            if k != "visible" and not k.startswith("tgt_")
        }
        if state is None:
            state = module.init(jax.random.PRNGKey(0), batch)
            path = args.resume if args.resume != "auto" else latest_checkpoint(args.logpath)
            if path:
                state = restore_checkpoint(path, state)
                print(f"loaded checkpoint {path}")
            elif args.resume == "auto":
                raise SystemExit(
                    f"--resume auto: no checkpoint under {args.logpath}"
                )
            else:
                print(
                    "WARNING: no --resume given — evaluating RANDOMLY "
                    "INITIALIZED weights; metrics below are meaningless."
                )
        res = module.predict(
            state, batch, config.max_boxes, args.nms_iou,
            args.score_threshold, True,  # exact top-k for eval parity
        )
        if args.late_fusion:
            import jax as _jax

            from v2x_sim_tpu.ops.postprocess import late_fuse

            res = _jax.jit(late_fuse, static_argnums=(5, 6))(
                res.boxes,
                jnp.where(res.valid, res.scores, 0.0),
                res.valid,
                batch["trans"],
                batch["agent_mask"],
                args.nms_iou,
                config.max_boxes,
            )
        all_det_boxes.append(np.asarray(res.boxes))
        all_scores.append(np.asarray(res.scores))
        all_valid.append(np.asarray(res.valid))
        all_gt.append(raw["gt_boxes"])
        all_gt_mask.append(raw["gt_mask"])
        all_agent_mask.append(raw["agent_mask"])

        if args.save_dets:
            os.makedirs(args.save_dets, exist_ok=True)
            np.savez_compressed(
                os.path.join(args.save_dets, f"dets_{bi:05d}.npz"),
                boxes=np.asarray(res.boxes),
                scores=np.asarray(res.scores),
                valid=np.asarray(res.valid),
                gt_boxes=raw["gt_boxes"],
                gt_mask=raw["gt_mask"],
                agent_mask=raw["agent_mask"],
                # Real instance-track identities (nuScenes reader); tools.
                # track uses them as MOT GT instead of NN-linking.
                **({"gt_ids": raw["gt_ids"]} if "gt_ids" in raw else {}),
            )
        if args.visualize:
            _render(args.visualize, bi, raw, res, config)

    cat = lambda xs: np.concatenate(xs, axis=0)
    metrics = eval_map_agents(
        cat(all_det_boxes),
        cat(all_scores),
        cat(all_valid),
        cat(all_gt),
        cat(all_gt_mask),
        cat(all_agent_mask),
    )
    print(json.dumps({k: round(v, 4) for k, v in metrics.items()}, indent=1))


def _render(outdir, bi, raw, res, config):
    """BEV plot of GT (green) vs detections (red), agent 0 of sample 0."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    import numpy as np

    from v2x_sim_tpu.ops.boxes import box_corners
    import jax.numpy as jnp

    os.makedirs(outdir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 6))
    (x0, x1), (y0, y1) = config.grid.area_extents[0], config.grid.area_extents[1]
    ax.set_xlim(x0, x1)
    ax.set_ylim(y0, y1)
    gt = raw["gt_boxes"][0, 0][raw["gt_mask"][0, 0]]
    det = np.asarray(res.boxes[0, 0])[np.asarray(res.valid[0, 0])]
    for boxes, color in ((gt, "g"), (det, "r")):
        if len(boxes) == 0:
            continue
        corners = np.asarray(box_corners(jnp.asarray(boxes)))
        for quad in corners:
            loop = np.vstack([quad, quad[:1]])
            ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=1)
    fig.savefig(os.path.join(outdir, f"bev_{bi:04d}.png"), dpi=100)
    plt.close(fig)


if __name__ == "__main__":
    main()

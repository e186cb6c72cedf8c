"""Segmentation evaluation CLI (analog of † coperception/tools/seg/test_seg.py):
loads a checkpoint, accumulates the confusion matrix, prints per-class IoU
and mIoU."""

from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    from v2x_sim_tpu.tools.common import add_common_args

    add_common_args(p)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument(
        "--visualize", default="",
        help="dir for pred-vs-GT BEV label map renderings",
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
    import numpy as np

    from v2x_sim_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from v2x_sim_tpu.train.seg_module import SegModule
    from v2x_sim_tpu.utils.seg_metrics import iou_from_confusion

    config = build_config(args)
    module = SegModule(
        config, mode=resolve_mode(args), width_mult=args.width_mult
    )

    state = None
    rendered = []
    cm_total = np.zeros(
        (config.num_seg_classes, config.num_seg_classes), np.int64
    )
    for raw in make_batches(
        # See test_det: eval seeds at +2^31, temporal order preserved.
        args, config, split_seed=2**31, num_batches=args.num_batches,
        shuffle=False,
    ):
        batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "visible"}
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
        pred, cm = module.eval_step(state, module.prepare_batch(batch))
        cm_total += np.asarray(cm)
        if args.visualize:
            _render(args.visualize, len(rendered), raw, np.asarray(pred))
            rendered.append(None)

    metrics = iou_from_confusion(cm_total)
    names = config.seg_class_names
    out = {names[i]: round(metrics[f"iou_class{i}"], 4) for i in range(len(names))}
    out["miou"] = round(metrics["miou"], 4)
    print(json.dumps(out, indent=1))


def _render(outdir, bi, raw, pred):
    """Side-by-side GT / predicted BEV class maps (agent 0, sample 0) —
    the reference seg test script's visual-inspection analog."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover - matplotlib optional
        print(f"--visualize skipped ({e})")
        return
    import os

    import numpy as np

    os.makedirs(outdir, exist_ok=True)
    gt = np.asarray(raw["seg_labels"][0, 0])
    pr = pred[0, 0]
    vmax = max(int(gt.max()), int(pr.max()), 1)
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, img, title in ((axes[0], gt, "GT"), (axes[1], pr, "pred")):
        ax.imshow(img, origin="lower", cmap="tab10", vmin=0, vmax=vmax)
        ax.set_title(title)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, f"seg_{bi:04d}.png"), dpi=100)
    plt.close(fig)


if __name__ == "__main__":
    main()

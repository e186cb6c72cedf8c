"""Checkpoint save / restore via orbax.

Analog of the reference's per-epoch `torch.save(epoch_{e}.pth)` +
`--resume` reload († coperception/tools/det/train_codet.py, SURVEY.md §5
"Checkpoint / resume"), upgraded to orbax: atomic directory checkpoints
of the full TrainState pytree (params, BN stats, optimizer state, step),
restorable onto any device layout.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, step: int) -> str:
    """Write `<ckpt_dir>/epoch_<step>` atomically. Returns the path."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{step}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    # Pull to host so the checkpoint is layout-independent.
    host_state = jax.tree.map(np.asarray, state)
    _checkpointer().save(path, host_state, force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Most recent epoch_<n> directory, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_n = -1
    for name in os.listdir(ckpt_dir):
        if name.startswith("epoch_"):
            try:
                n = int(name.split("_", 1)[1])
            except ValueError:
                continue
            if n > best_n:
                best_n, best = n, os.path.join(ckpt_dir, name)
    return os.path.abspath(best) if best else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a checkpoint into the structure of `target`."""
    restored = _checkpointer().restore(os.path.abspath(path), item=target)
    return jax.tree.map(lambda t, r: jax.numpy.asarray(r), target, restored)


def restore_teacher(path: str, teacher_vars: Any, tx: Any = None) -> Any:
    """Load frozen-teacher variables for `--kd_flag 1`.

    Accepts either a saved variables dict ({"params", "batch_stats"}) or
    a full TrainState checkpoint of an upperbound run (`epoch_N` from
    `train_det --com upperbound`) — the reference's TeacherNet is the
    trained early-fusion upperbound model, and TeacherModel's submodule
    names match DetModel's so the params load verbatim
    (models/det/net.py::TeacherModel).

    For the TrainState form, `tx` MUST be the optimizer the checkpoint
    was trained with (its opt_state tree must match); the adam(1e-3)
    default only restores constant-lr adam checkpoints."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"teacher checkpoint not found: {path}")
    try:
        return restore_checkpoint(path, teacher_vars)
    except Exception as vars_err:
        import optax

        from v2x_sim_tpu.train.det_module import TrainState

        params = teacher_vars["params"]
        tmpl = TrainState(
            params=params,
            batch_stats=teacher_vars.get("batch_stats", {}),
            opt_state=(tx or optax.adam(1e-3)).init(params),
            step=jax.numpy.zeros((), jax.numpy.int32),
        )
        try:
            state = restore_checkpoint(path, tmpl)
        except Exception as state_err:
            # Surface BOTH attempts: a corrupt/mismatched checkpoint used
            # to resurface only as a confusing TrainState structure error.
            raise ValueError(
                f"could not restore teacher from {path} as a variables "
                f"dict ({vars_err}) or as a TrainState ({state_err}); for "
                "TrainState checkpoints pass the training-time `tx`"
            ) from state_err
        return {"params": state.params, "batch_stats": state.batch_stats}

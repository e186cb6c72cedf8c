"""Device mesh and data-parallel wiring.

The reference has NO distributed stack at all (SURVEY.md §2.4: single
process, single GPU, no NCCL/MPI). This module *adds* the real
parallelism layer the TPU rebuild needs (BASELINE.json north_star: DP
over chips via ICI, hosts via DCN):

  * a 1-D `data` mesh axis carries the global scene batch;
  * the simulated V2X agent axis deliberately stays ON-chip — fusion is
    batched compute, never a collective;
  * gradients / BN stats / metrics are `pmean`ed over `data` inside the
    step (see train.det_module), so the wrapped step is a single jitted
    SPMD program with XLA-inserted all-reduces riding ICI.

A `spatial` axis is reserved in the mesh helper for future BEV spatial
sharding (the context-parallel analog — SURVEY.md §5), unused at size 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: the Pallas rotated-IoU kernel's out_shape has no
        # varying-mesh-axes annotation; everything in these steps is plain
        # per-shard SPMD, so the check adds nothing.
        return _shard_map(
            f,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )

except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    n = len(devs)
    assert n % spatial == 0, (n, spatial)
    arr = np.asarray(devs).reshape(n // spatial, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the leading dim sharded over `data`."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_train_step(module, mesh: Mesh):
    """Wrap a task module's raw step in shard_map + jit for DP training.

    `module` must have been constructed with `axis_name=DATA_AXIS` so its
    step pmeans grads/stats/metrics over the data axis.

    Returns a fn (state, prepared_batch, teacher_vars=None) ->
    (state, metrics) where the batch's leading dimension is sharded over
    `data` and the state / teacher variables are replicated. Honors the
    module's MGDA configuration (the reference `--MGDA` path) so
    `--dp N --kd_flag 1` and `--dp N --MGDA` both train — the round-1
    wrapper hardcoded the 2-ary kd-free step.
    """
    assert module.axis_name == DATA_AXIS, (
        "module must be built with axis_name=parallel.mesh.DATA_AXIS"
    )
    impl = (
        module._train_step_mgda_impl
        if getattr(module, "mgda", False)
        else module._train_step_impl
    )
    # Explicit module contract (DetModule sets takes_teacher=True; its
    # steps accept an optional teacher_vars arg) — signature sniffing
    # silently flips behavior when an impl gains or loses a kwarg.
    if getattr(module, "takes_teacher", False):
        # teacher_vars rides a replicated P() spec; passing None is fine
        # (an empty pytree has no leaves for the spec to bind).
        step = shard_map(
            impl,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=(P(), P()),
        )
        jitted = jax.jit(step, donate_argnums=0)

        def run(state, prepared, teacher_vars=None):
            return jitted(state, prepared, teacher_vars)

        return run

    step = shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(step, donate_argnums=0)


def make_parallel_prepare(module, mesh: Mesh):
    """shard_map'd per-batch preprocessing (voxelize + target assignment)."""
    prep = shard_map(
        module._prepare_batch_impl,
        mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=P(DATA_AXIS),
    )
    return jax.jit(prep)

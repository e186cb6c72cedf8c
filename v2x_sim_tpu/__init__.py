"""v2x_sim_tpu — TPU-native collaborative LiDAR perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the V2X-Sim collaborative
perception testbed (the `coperception` package referenced by
/root/reference/README.md:101,112): multi-agent (1 RSU + up to 5 vehicles)
BEV detection, BEV semantic segmentation, and tracking, with the full menu
of collaboration strategies (lowerbound, upperbound/early fusion,
when2com/who2com, V2VNet, DiscoNet, and naive sum/mean/max/cat/agent
fusions).

Design stance (TPU-first, NOT a port):
  * The agent axis A is static (=6, mask-padded) and lives on-chip; fusion
    is batched einsum/gather over A, never a Python loop over agents.
  * All dense compute is NHWC flax modules compiled by XLA onto the MXU.
  * Hot non-matmul ops (point->voxel scatter, ego-frame bilinear warp,
    rotated NMS) have Pallas TPU kernels with pure-XLA fallbacks.
  * Data parallelism is `shard_map` over a `jax.sharding.Mesh`; the
    simulated V2X communication deliberately compiles to on-chip ops.
"""

__version__ = "0.1.0"

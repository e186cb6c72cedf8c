"""Pallas TPU kernel: exact rotated-box pair IoU.

The XLA formulation of the Sutherland–Hodgman pipeline (ops.iou_sh) is
HBM-bandwidth-bound: its ~50 live (pairs, slots) intermediates cross
fusion boundaries, costing ~GBs of traffic per 10^7 pairs (measured
875 ms for the 19M-pair assignment pass). This kernel runs the ENTIRE
clip pipeline per (8, 128)-shaped pair tile inside VMEM/registers — ten
scalar streams in, one IoU stream out — so HBM sees only 11 arrays.

Used by anchor assignment and NMS on the hot path; numerics are
identical to ops.iou_sh (shared tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_SLOTS = 8

#: Pair-tile shape per kernel program (sublane x lane).
TILE_R = 64
TILE = TILE_R * 128


def _corners(x, y, l, w, yaw):
    """Corner coordinate lists (CCW) as 4+4 same-shaped arrays."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hx, hy = l * 0.5, w * 0.5
    lx = (hx, -hx, -hx, hx)
    ly = (hy, hy, -hy, -hy)
    cx = [c * lx[i] - s * ly[i] + x for i in range(4)]
    cy = [s * lx[i] + c * ly[i] + y for i in range(4)]
    return cx, cy


def _iou_tile(ax, ay, al, aw, ayaw, bx, by, bl, bw, byaw):
    """Elementwise exact IoU over one tile of box pairs (pure jnp ops —
    runs inside the Pallas kernel body, everything stays in VMEM)."""
    cax, cay = _corners(ax, ay, al, aw, ayaw)
    cbx, cby = _corners(bx, by, bl, bw, byaw)

    # Subject polygon: quad A duplicate-padded to 8 slots.
    px = cax + [cax[3]] * (_SLOTS - 4)
    py = cay + [cay[3]] * (_SLOTS - 4)
    count = jnp.full(ax.shape, 4, jnp.int32)

    for e in range(4):
        ea_x, ea_y = cbx[e], cby[e]
        eb_x, eb_y = cbx[(e + 1) % 4], cby[(e + 1) % 4]
        ex, ey = eb_x - ea_x, eb_y - ea_y

        side = [
            ex * (py[i] - ea_y) - ey * (px[i] - ea_x) >= -_EPS
            for i in range(_SLOTS)
        ]
        stream = []  # (vx, vy, valid)
        for i in range(_SLOTS):
            j = (i + 1) % _SLOTS
            cur_in, nxt_in = side[i], side[j]
            dx, dy = px[j] - px[i], py[j] - py[i]
            denom = ex * dy - ey * dx
            ok = jnp.abs(denom) > _EPS
            t_num = ex * (ea_y - py[i]) - ey * (ea_x - px[i])
            t = t_num / jnp.where(ok, denom, 1.0)
            ixp = px[i] + t * dx
            iyp = py[i] + t * dy
            in_valid = count > i  # padding slots don't re-emit
            stream.append((px[i], py[i], cur_in & in_valid))
            stream.append((ixp, iyp, (cur_in != nxt_in) & ok))

        running = jnp.zeros(ax.shape, jnp.int32)
        positions = []
        for (_, _, v) in stream:
            positions.append(running)
            running = running + v.astype(jnp.int32)

        zeros = jnp.zeros(ax.shape, ax.dtype)
        ox = [zeros] * _SLOTS
        oy = [zeros] * _SLOTS
        for (vx, vy, v), pos in zip(stream, positions):
            for k in range(_SLOTS):
                hit = v & (pos == k)
                ox[k] = jnp.where(hit, vx, ox[k])
                oy[k] = jnp.where(hit, vy, oy[k])
        # Duplicate-fill the tail so padding stays degenerate
        # (slot k holds a real vertex iff k < new_count).
        new_count = running
        ox2, oy2 = [ox[0]], [oy[0]]
        for k in range(1, _SLOTS):
            filled = new_count > k
            ox2.append(jnp.where(filled, ox[k], ox2[k - 1]))
            oy2.append(jnp.where(filled, oy[k], oy2[k - 1]))
        px, py, count = ox2, oy2, new_count

    # Shoelace over duplicate-padded slots.
    area2 = jnp.zeros(ax.shape, ax.dtype)
    for i in range(_SLOTS):
        j = (i + 1) % _SLOTS
        area2 = area2 + (px[i] * py[j] - px[j] * py[i])
    inter = 0.5 * jnp.abs(area2)
    inter = jnp.where(count >= 3, inter, 0.0)
    union = al * aw + bl * bw - inter
    return inter / jnp.maximum(union, _EPS)


def _kernel(a_ref, b_ref, out_ref):
    a = a_ref[...]  # (5, TILE_R, 128)
    b = b_ref[...]
    out_ref[...] = _iou_tile(
        a[0], a[1], a[2], a[3], a[4], b[0], b[1], b[2], b[3], b[4]
    )


@functools.partial(jax.jit)
def rotated_iou_pairs_soa(
    a_soa: jnp.ndarray, b_soa: jnp.ndarray
) -> jnp.ndarray:
    """Exact IoU of aligned box pairs from structure-of-arrays operands.

    Args:
      a_soa, b_soa: (5, N) float32 — field-major (x, y, l, w, yaw) rows.
        This is the kernel's NATIVE layout: (N, 5) operands pay a ~10 ms
        relayout copy each at assignment scale (N=38M) just to move the
        field axis off the lanes; producers that can emit field-major
        (the anchor table, one-hot GT lookups) skip it entirely.

    Returns:
      (N,) float32 IoU.
    """
    n = a_soa.shape[1]
    n_pad = -(-n // TILE) * TILE
    rows = n_pad // 128

    def prep(soa):
        pad = jnp.zeros((5, n_pad - n), soa.dtype)
        full = jnp.concatenate([soa.astype(jnp.float32), pad], axis=1)
        return full.reshape(5, rows, 128)  # contiguous — no relayout

    a = prep(a_soa)
    b = prep(b_soa)

    grid = rows // TILE_R
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (5, TILE_R, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (5, TILE_R, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(a, b)
    return out.reshape(n_pad)[:n]


@functools.partial(jax.jit)
def rotated_iou_pairs(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Exact IoU of aligned (N, 5) box pairs (see rotated_iou_pairs_soa)."""
    return rotated_iou_pairs_soa(boxes_a.T, boxes_b.T)


@functools.partial(jax.jit)
def rotated_iou_pairs_soa_periodic(
    a_soa: jnp.ndarray, b_soa: jnp.ndarray
) -> jnp.ndarray:
    """Pair IoU where the A operand REPEATS along the pair axis.

    a_soa (5, n) is tiled B times against b_soa (5, B*n) purely through
    the kernel's block index map (tile i reads anchor tile i mod n/TILE)
    — the B-fold broadcast of the anchor table (453 MB materialized +
    relayout at assignment scale) never exists. Requires n and B*n to be
    TILE-divisible; callers fall back to the plain pairs entry otherwise.
    """
    n = a_soa.shape[1]
    nb = b_soa.shape[1]
    assert n % TILE == 0 and nb % n == 0, (n, nb)
    period = n // TILE
    rows_a, rows_b = n // 128, nb // 128

    a = a_soa.astype(jnp.float32).reshape(5, rows_a, 128)
    b = b_soa.astype(jnp.float32).reshape(5, rows_b, 128)
    grid = rows_b // TILE_R
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows_b, 128), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (5, TILE_R, 128),
                lambda i: (0, i % period, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (5, TILE_R, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(a, b)
    return out.reshape(nb)


def rotated_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ops.iou_sh.rotated_iou on (..., 5) broadcastable args."""
    shape = jnp.broadcast_shapes(boxes_a.shape[:-1], boxes_b.shape[:-1])
    a = jnp.broadcast_to(boxes_a, shape + (5,)).reshape(-1, 5)
    b = jnp.broadcast_to(boxes_b, shape + (5,)).reshape(-1, 5)
    return rotated_iou_pairs(a, b).reshape(shape)


def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) via the Pallas kernel."""
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    return rotated_iou(boxes_a[:, None, :], boxes_b[None, :, :])

"""Exact rotated-box IoU, fully vectorized for TPU.

Replaces the reference's shapely/GEOS polygon intersection
(† coperception/utils/{postprocess,mean_ap}.py — SURVEY.md §2.3) with a
static-shape convex-quad intersection that jits and vmaps:

  1. all 4x4 edge-pair intersection points,
  2. corners of A inside B and corners of B inside A,
  3. -> <= 24 masked candidate vertices of the intersection polygon,
  4. angular sort around the candidate centroid + masked shoelace area.

Exact for convex quads in generic position (the only inputs that occur);
degenerate overlap (shared edges) resolves within float tolerance, which
is well below the 0.5/0.7 IoU decision thresholds used by NMS and mAP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from v2x_sim_tpu.ops.boxes import box_area, box_corners

_EPS = 1e-8


def _cross(o, a, b):
    """2D cross product (a - o) x (b - o)."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _edge_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """Intersection points of all edge pairs of two quads.

    Args:
      ca, cb: (4, 2) corner arrays.

    Returns:
      points (16, 2), valid (16,) bool.
    """
    a1 = ca  # (4,2)
    a2 = jnp.roll(ca, -1, axis=0)
    b1 = cb
    b2 = jnp.roll(cb, -1, axis=0)
    # Broadcast to (4,4,2): A-edge index i, B-edge index j.
    p = a1[:, None, :]
    r = (a2 - a1)[:, None, :]
    q = b1[None, :, :]
    s = (b2 - b1)[None, :, :]
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (4,4)
    qp = q - p
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (
        (jnp.abs(denom) > _EPS)
        & (t >= -_EPS)
        & (t <= 1.0 + _EPS)
        & (u >= -_EPS)
        & (u <= 1.0 + _EPS)
    )
    pts = p + t[..., None] * r  # (4,4,2)
    return pts.reshape(16, 2), valid.reshape(16)


def _points_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """Whether each point lies inside a convex quad (either orientation).

    Args:
      pts: (N, 2), quad: (4, 2).

    Returns:
      (N,) bool.
    """
    c1 = quad  # (4,2)
    c2 = jnp.roll(quad, -1, axis=0)
    # cross of edge vs point, (N, 4)
    cr = _cross(c1[None, :, :], c2[None, :, :], pts[:, None, :])
    return jnp.all(cr >= -_EPS, axis=-1) | jnp.all(cr <= _EPS, axis=-1)


def _quad_intersection_area(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads given (4, 2) corners."""
    inter_pts, inter_valid = _edge_intersections(ca, cb)
    a_in = _points_in_quad(ca, cb)
    b_in = _points_in_quad(cb, ca)
    pts = jnp.concatenate([inter_pts, ca, cb], axis=0)  # (24,2)
    valid = jnp.concatenate([inter_valid, a_in, b_in], axis=0)  # (24,)
    n = jnp.sum(valid)

    vf = valid[:, None].astype(pts.dtype)
    centroid = jnp.sum(pts * vf, axis=0) / jnp.maximum(n.astype(pts.dtype), 1.0)
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid sort to the end
    order = jnp.argsort(ang)
    sp = pts[order]  # sorted: valid first, by angle

    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    contrib = sp[:, 0] * sp[nxt, 1] - sp[nxt, 0] * sp[:, 1]
    contrib = jnp.where(idx < n, contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib))
    return jnp.where(n >= 3, area, 0.0)


def rotated_iou_pair(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """IoU of one pair of (5,) rotated boxes."""
    inter = _quad_intersection_area(box_corners(box_a), box_corners(box_b))
    union = box_area(box_a) + box_area(box_b) - inter
    return inter / jnp.maximum(union, _EPS)


def rotated_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of (..., 5) vs (..., 5) boxes (broadcast over batch)."""
    flat_a = boxes_a.reshape(-1, 5)
    flat_b = boxes_b.reshape(-1, 5)
    out = jax.vmap(rotated_iou_pair)(flat_a, flat_b)
    return out.reshape(boxes_a.shape[:-1])


def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Full (N, M) IoU matrix between two box sets.

    Used by NMS suppression and mAP TP/FP matching (the reference does this
    per-pair through shapely on host — SURVEY.md §3.3).
    """
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    a = jnp.broadcast_to(boxes_a[:, None, :], (n, m, 5))
    b = jnp.broadcast_to(boxes_b[None, :, :], (n, m, 5))
    return rotated_iou(a, b)

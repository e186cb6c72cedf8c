"""Rotated BEV box representation and anchor codec.

Boxes are ``(x, y, l, w, yaw)``: metric center, length along heading,
width, heading angle (radians, CCW from +x). This replaces the
corner/center conversion helpers of the reference
(† coperception/utils/obj_util.py — SURVEY.md §2.1) with fully batched
jnp functions usable inside jit on TPU.

The codec matches the reference's 6-dim box code ``(x, y, w, h, sin, cos)``
(reference `box_code_size=6`): center deltas normalized by the anchor
diagonal, log size ratios, and the absolute heading as (sin, cos).
# VERIFY vs reference († coperception/utils/obj_util.py encode/decode).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corners of rotated BEV boxes.

    Args:
      boxes: (..., 5) array of (x, y, l, w, yaw).

    Returns:
      (..., 4, 2) corners in CCW order starting front-left.
    """
    x, y, l, w, yaw = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # Local CCW corners: (+l/2,+w/2), (-l/2,+w/2), (-l/2,-w/2), (+l/2,-w/2)
    lx = jnp.stack([l, -l, -l, l], axis=-1) * 0.5
    ly = jnp.stack([w, w, -w, -w], axis=-1) * 0.5
    cx = c[..., None] * lx - s[..., None] * ly + x[..., None]
    cy = s[..., None] * lx + c[..., None] * ly + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 5) boxes."""
    return boxes[..., 2] * boxes[..., 3]


def encode_boxes(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode GT boxes relative to anchors into the 6-dim box code.

    Args:
      gt: (..., 5) ground-truth (x, y, l, w, yaw).
      anchors: (..., 5) anchors, broadcastable against gt.

    Returns:
      (..., 6) code (dx, dy, dl, dw, sin yaw, cos yaw).
    """
    ax, ay, al, aw = (anchors[..., i] for i in range(4))
    gx, gy, gl, gw, gyaw = (gt[..., i] for i in range(5))
    diag = jnp.sqrt(al * al + aw * aw)
    return jnp.stack(
        [
            (gx - ax) / diag,
            (gy - ay) / diag,
            jnp.log(gl / al),
            jnp.log(gw / aw),
            jnp.sin(gyaw),
            jnp.cos(gyaw),
        ],
        axis=-1,
    )


def decode_boxes(code: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes`.

    Args:
      code: (..., 6) predicted (dx, dy, dl, dw, sin, cos).
      anchors: (..., 5) anchors.

    Returns:
      (..., 5) decoded (x, y, l, w, yaw).
    """
    ax, ay, al, aw = (anchors[..., i] for i in range(4))
    diag = jnp.sqrt(al * al + aw * aw)
    x = code[..., 0] * diag + ax
    y = code[..., 1] * diag + ay
    l = jnp.exp(code[..., 2]) * al
    w = jnp.exp(code[..., 3]) * aw
    yaw = jnp.arctan2(code[..., 4], code[..., 5])
    return jnp.stack([x, y, l, w, yaw], axis=-1)

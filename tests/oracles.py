"""Pure-numpy reference implementations used as test oracles.

Independent algorithms from the production jax code (Sutherland–Hodgman
clipping here vs candidate-vertex hull there) so agreement is meaningful.
"""

import numpy as np


def np_box_corners(box):
    x, y, l, w, yaw = box
    c, s = np.cos(yaw), np.sin(yaw)
    local = np.array(
        [[l / 2, w / 2], [-l / 2, w / 2], [-l / 2, -w / 2], [l / 2, -w / 2]]
    )
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def _cross2(u, v):
    return u[0] * v[1] - u[1] * v[0]


def _clip(poly, a, b):
    """Clip polygon by half-plane left of directed line a->b."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        cur_in = _cross2(b - a, cur - a) >= 0
        nxt_in = _cross2(b - a, nxt - a) >= 0
        if cur_in:
            out.append(cur)
        if cur_in != nxt_in:
            d = nxt - cur
            denom = _cross2(b - a, d)
            if abs(denom) > 1e-12:
                t = _cross2(b - a, a - cur) / denom
                out.append(cur + t * d)
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    p = np.asarray(poly)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def np_rotated_iou(box_a, box_b):
    """Exact rotated IoU via Sutherland–Hodgman clipping."""
    ca = np_box_corners(box_a)
    cb = np_box_corners(box_b)
    # Ensure CCW orientation of the clip polygon.
    if _signed_area(cb) < 0:
        cb = cb[::-1]
    poly = list(ca)
    for i in range(4):
        poly = _clip(poly, cb[i], cb[(i + 1) % 4])
        if not poly:
            break
    inter = _poly_area(poly)
    ua = box_a[2] * box_a[3] + box_b[2] * box_b[3] - inter
    return inter / max(ua, 1e-12)


def _signed_area(p):
    x, y = p[:, 0], p[:, 1]
    return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)

"""PyTorch reconstruction of the reference detection model (torch-cpu).

A faithful re-implementation of the reference's FaFNet/DiscoNet graph —
MotionNet-style STPN backbone 32->64->128->256->512 + cls/reg heads +
pixel-weighted DiscoNet fusion († coperception/models/det/backbone/
Backbone.py, DiscoNet.py; SURVEY.md §2.1 — tier-[R]: the mounted
reference's code submodule is empty, so this is built from the survey's
reconstruction, NOT copied from any source).

Two jobs (VERDICT.md round-1 task 2):
  1. Golden parity oracle: its state_dict converts through
     train.torch_convert into the flax DetModel tree; predictions must
     match end to end (tests/test_reference_parity.py). Any layout / BN /
     padding / resize divergence between this framework and a real
     PyTorch checkpoint shows up here.
  2. Measured baseline anchor: `measure()` times the reference graph
     end-to-end on torch-cpu at production geometry; BASELINE.md derives
     the defended GPU-rate estimate bench.py normalizes against.

Conventions mirrored exactly (SURVEY.md §7 hard parts):
  * all backbone convs 3x3 pad-1 bias-free + BatchNorm + ReLU;
  * decoder: bilinear 2x upsample (align_corners=False) + concat skip;
  * heads: 3x3 conv (bias) + ReLU + 1x1 conv (bias);
  * warp: grid_sample(bilinear, zeros, align_corners=False) sampling
    agent j's map at p_j = T_{j<-i} @ p_i over metric cell centers.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

STAGE_CHANNELS = (32, 64, 128, 256, 512)


def build_model(grid_shape: Tuple[int, int, int], area_extents, num_anchors=6,
                num_classes=2, box_code=6, fusion_layer=3):
    """Build the torch DiscoNet reference model (lazy torch import)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as TF

    d = grid_shape[2]

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            return torch.relu(self.bn2(self.conv2(x)))

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            blocks, cin = [], d
            for i, ch in enumerate(STAGE_CHANNELS):
                blocks.append(ConvBlock(cin, ch, stride=1 if i == 0 else 2))
                cin = ch
            self.blocks = nn.ModuleList(blocks)

        def forward(self, x):
            feats = []
            for b in self.blocks:
                x = b(x)
                feats.append(x)
            return feats

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            chs = list(STAGE_CHANNELS)
            self.blocks = nn.ModuleList(
                ConvBlock(chs[-1 - i] + chs[-2 - i], chs[-2 - i])
                for i in range(len(chs) - 1)
            )

        def forward(self, feats):
            x = feats[-1]
            for i, block in enumerate(self.blocks):
                skip = feats[-2 - i]
                x = TF.interpolate(
                    x, size=skip.shape[-2:], mode="bilinear",
                    align_corners=False,
                )
                x = block(torch.cat([x, skip], dim=1))
            return x

    class Head(nn.Module):
        def __init__(self, out):
            super().__init__()
            self.conv1 = nn.Conv2d(32, 32, 3, padding=1)
            self.conv2 = nn.Conv2d(32, out, 1)

        def forward(self, x):
            return self.conv2(torch.relu(self.conv1(x)))

    class DiscoFusion(nn.Module):
        """Pixel-weighted fusion over ego-frame-warped neighbor maps."""

        def __init__(self, channels):
            super().__init__()
            self.edge_hidden = nn.Conv2d(2 * channels, 32, 1)
            self.edge_score = nn.Conv2d(32, 1, 1)

        def _warp_all_pairs(self, feats, trans):
            """feats (B, A, C, h, w); trans[b, i, j] = T_{i<-j}.

            Returns (B, A, A, C, h, w): out[b, i, j] = agent j's map in
            agent i's frame — sample j at p_j = trans[b, j, i] @ p_i.
            """
            b, a, c, h, w = feats.shape
            (x0, x1), (y0, y1) = area_extents[0], area_extents[1]
            sx = (x1 - x0) / h
            sy = (y1 - y0) / w
            xs = x0 + (torch.arange(h, dtype=feats.dtype) + 0.5) * sx
            ys = y0 + (torch.arange(w, dtype=feats.dtype) + 0.5) * sy
            gx, gy = torch.meshgrid(xs, ys, indexing="ij")  # (h, w)
            t = trans.transpose(1, 2).reshape(b * a * a, 4, 4)  # T_{j<-i}
            r, tt = t[:, :2, :2], t[:, :2, 3]
            xj = r[:, 0, 0, None, None] * gx + r[:, 0, 1, None, None] * gy \
                + tt[:, 0, None, None]
            yj = r[:, 1, 0, None, None] * gx + r[:, 1, 1, None, None] * gy \
                + tt[:, 1, None, None]
            px = (xj - x0) / sx - 0.5  # fractional row in j's map
            py = (yj - y0) / sy - 0.5  # fractional col
            # grid_sample normalized coords (align_corners=False):
            # last dim = (x over WIDTH, y over HEIGHT).
            gxn = (2.0 * py + 1.0) / w - 1.0
            gyn = (2.0 * px + 1.0) / h - 1.0
            grid = torch.stack([gxn, gyn], dim=-1)  # (BAA, h, w, 2)
            src = (
                feats[:, None, :, :, :, :]
                .expand(b, a, a, c, h, w)
                .reshape(b * a * a, c, h, w)
            )
            out = TF.grid_sample(
                src, grid, mode="bilinear", padding_mode="zeros",
                align_corners=False,
            )
            return out.reshape(b, a, a, c, h, w)

        def forward(self, feats, trans, mask):
            b, a, c, h, w = feats.shape
            warped = self._warp_all_pairs(feats, trans)
            warped = warped * mask[:, None, :, None, None, None].to(feats.dtype)
            ego = feats[:, :, None].expand(b, a, a, c, h, w)
            pair = torch.cat([ego, warped], dim=3).reshape(b * a * a, 2 * c, h, w)
            s = self.edge_score(torch.relu(self.edge_hidden(pair)))
            s = s.reshape(b, a, a, 1, h, w)
            s = torch.where(
                mask[:, None, :, None, None, None], s,
                torch.tensor(-1e9, dtype=s.dtype),
            )
            attn = torch.softmax(s, dim=2)
            return (attn * warped).sum(dim=2)

    class DiscoNet(nn.Module):
        """Reference DiscoNet graph: encoder -> fuse at `fusion_layer`
        -> decoder -> heads. mode='lowerbound' skips fusion (FaFNet)."""

        def __init__(self, mode="disco"):
            super().__init__()
            self.mode = mode
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.cls_head = Head(num_anchors * num_classes)
            self.reg_head = Head(num_anchors * box_code)
            if mode == "disco":
                self.fusion = DiscoFusion(STAGE_CHANNELS[fusion_layer])

        def forward(self, occupancy, trans, mask):
            """occupancy (B, A, D, H, W); trans (B, A, A, 4, 4);
            mask (B, A) bool. Returns cls (B, A, H, W, K, C) and reg
            (B, A, H, W, K, 6) — flax DetOutput layout for comparison."""
            b, a = occupancy.shape[:2]
            x = occupancy.reshape((b * a,) + occupancy.shape[2:])
            feats = self.encoder(x)
            if self.mode == "disco":
                k = fusion_layer
                f = feats[k].reshape((b, a) + feats[k].shape[1:])
                fused = self.fusion(f, trans, mask)
                feats[k] = fused.reshape((b * a,) + fused.shape[2:])
            decoded = self.decoder(feats)
            h, w = decoded.shape[-2:]
            cls = self.cls_head(decoded).reshape(
                b, a, num_anchors, num_classes, h, w
            ).permute(0, 1, 4, 5, 2, 3)
            reg = self.reg_head(decoded).reshape(
                b, a, num_anchors, box_code, h, w
            ).permute(0, 1, 4, 5, 2, 3)
            return cls, reg

    return DiscoNet


def key_map(mode: str = "disco") -> Dict[str, Tuple[str, ...]]:
    """torch module prefix -> flax DetModel path, for
    train.torch_convert.convert_state_dict."""
    m: Dict[str, Tuple[str, ...]] = {}
    parts = (("conv1", "Conv_0"), ("bn1", "BatchNorm_0"),
             ("conv2", "Conv_1"), ("bn2", "BatchNorm_1"))
    for i in range(len(STAGE_CHANNELS)):
        for tk, fk in parts:
            m[f"encoder.blocks.{i}.{tk}"] = ("encoder", f"ConvBlock_{i}", fk)
    for i in range(len(STAGE_CHANNELS) - 1):
        for tk, fk in parts:
            m[f"decoder.blocks.{i}.{tk}"] = ("decoder", f"ConvBlock_{i}", fk)
    for head in ("cls_head", "reg_head"):
        m[f"{head}.conv1"] = (head, "Conv_0")
        m[f"{head}.conv2"] = (head, "Conv_1")
    if mode == "disco":
        m["fusion.edge_hidden"] = ("fusion", "edge_hidden")
        m["fusion.edge_score"] = ("fusion", "edge_score")
    return m


def measure(batch: int = 1, steps: int = 10, warmup: int = 2,
            mode: str = "disco") -> float:
    """Time the reference graph on torch-cpu at production geometry.

    Returns scenes/sec (6-agent scenes). Inference path (forward only,
    eval mode) to match bench.py's e2e-infer metric; the reference's
    host-side shapely postprocess is NOT included, so this *overstates*
    the reference rate (conservative for our vs_baseline ratio).
    """
    import time

    import numpy as np
    import torch

    from v2x_sim_tpu.configs.config import Config

    cfg = Config()
    h, w, d = cfg.grid.grid_shape
    a = cfg.num_agents
    cls = build_model(cfg.grid.grid_shape, cfg.grid.area_extents,
                      cfg.anchors.num_anchors, cfg.num_classes,
                      cfg.anchors.box_code_size, cfg.fusion_layer)
    model = cls(mode=mode).eval()
    rng = np.random.default_rng(0)
    occ = torch.from_numpy(
        (rng.random((batch, a, d, h, w)) < 0.01).astype(np.float32)
    )
    trans = torch.from_numpy(
        np.tile(np.eye(4, dtype=np.float32), (batch, a, a, 1, 1))
    )
    mask = torch.ones((batch, a), dtype=torch.bool)
    with torch.no_grad():
        for _ in range(warmup):
            model(occ, trans, mask)
        t0 = time.perf_counter()
        for _ in range(steps):
            model(occ, trans, mask)
        dt = time.perf_counter() - t0
    return batch * steps / dt


if __name__ == "__main__":
    import json

    rate = measure()
    print(json.dumps({
        "metric": "torch-cpu reference DiscoNet scenes/sec",
        "value": round(rate, 4),
    }))

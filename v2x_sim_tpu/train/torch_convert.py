"""PyTorch checkpoint -> flax parameter conversion.

The parity path for the reference's released checkpoints
(/root/reference/README.md:46; SURVEY.md §4 "golden parity" /
BASELINE.json "checkpoints-in/predictions-out fidelity"): load a
`.pth` state_dict with torch-cpu, remap names, and transpose layouts
into this framework's NHWC flax trees.

Layout rules (torch -> flax):
  * Conv2d weight  (out, in, kh, kw) -> (kh, kw, in, out)
  * Linear weight  (out, in)         -> (in, out)
  * BatchNorm      weight/bias -> params.scale/bias;
                   running_mean/var -> batch_stats.mean/var
  * biases pass through unchanged.

`convert_state_dict` is mapping-driven: the caller provides a
torch-key -> flax-path table (hand-written — see
tests/test_reference_parity.py for the reference DiscoNet table), so
adapting to the exact reference checkpoint naming is a table edit, not
a code change. Equivalence of the conversion rules themselves is
golden-tested against torch-cpu in tests/test_torch_convert.py.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_tensor(key: str, value) -> Tuple[str, np.ndarray]:
    """Apply the layout rule implied by a torch parameter name.

    Returns (flax_leaf_name, converted_array); the leaf name is
    'kernel' / 'bias' / 'scale' / 'mean' / 'var'.
    """
    arr = _to_numpy(value)
    if key.endswith("running_mean"):
        return "mean", arr
    if key.endswith("running_var"):
        return "var", arr
    if key.endswith("num_batches_tracked"):
        return "", arr  # dropped
    if key.endswith("bias"):
        return "bias", arr
    if key.endswith("weight"):
        if arr.ndim == 4:  # Conv2d OIHW -> HWIO
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:  # Linear
            return "kernel", arr.T
        if arr.ndim == 1:  # BatchNorm scale
            return "scale", arr
    raise ValueError(f"don't know how to convert {key} with shape {arr.shape}")


def set_in_tree(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    key_map: Mapping[str, Tuple[str, ...]],
) -> Dict[str, Any]:
    """Convert a torch state_dict into {'params': ..., 'batch_stats': ...}.

    Args:
      state_dict: torch module state_dict (tensors or arrays).
      key_map: torch *module* prefix -> flax module path, e.g.
        {"conv_pre_1": ("encoder", "ConvBlock_0", "Conv_0"),
         "bn_pre_1":   ("encoder", "ConvBlock_0", "BatchNorm_0")}.
        Each torch key is split into (prefix, leaf) on the last '.'.

    Returns:
      {"params": tree, "batch_stats": tree} ready for model.apply.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, value in state_dict.items():
        prefix, _, _leaf = key.rpartition(".")
        if prefix not in key_map:
            raise KeyError(f"no mapping for torch module '{prefix}' (key {key})")
        leaf_name, arr = convert_tensor(key, value)
        if not leaf_name:
            continue
        path = tuple(key_map[prefix]) + (leaf_name,)
        if leaf_name in ("mean", "var"):
            set_in_tree(stats, path, arr)
        else:
            set_in_tree(params, path, arr)
    return {"params": params, "batch_stats": stats}


def load_pth(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file's state_dict (torch-cpu)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        return obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj

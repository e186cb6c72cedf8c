"""Synthetic -> nuScenes-format dataset writer.

Emits the v1.0-style JSON tables + .pcd.bin sweeps for synthetic scenes
(SURVEY.md §7: "design the reader so the synthetic generator emits the
nuScenes JSON format itself, so the real dataset is a drop-in"). Used as
the golden fixture for datasets.nuscenes round-trip tests and for CLI
smoke runs without the real V2X-Sim download.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Dict, List

import numpy as np

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.datasets.synthetic import SyntheticSpec, generate_scene


def _tok() -> str:
    return uuid.uuid4().hex


def _yaw_quat(yaw: float) -> List[float]:
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def write_synthetic_nuscenes(
    out_root: str,
    config: Config,
    spec: SyntheticSpec,
    num_scenes: int = 1,
    frames_per_scene: int = 2,
    version: str = "v1.0-mini",
    seed: int = 0,
) -> str:
    """Write a synthetic dataset in nuScenes format. Returns out_root.

    Each frame re-generates a synthetic world (for simplicity, static
    identities across frames within a scene: vehicles drift slightly so
    tracking has something to follow).
    """
    base = os.path.join(out_root, version)
    os.makedirs(base, exist_ok=True)

    tables: Dict[str, List[dict]] = {n: [] for n in (
        "scene", "sample", "sample_data", "ego_pose", "calibrated_sensor",
        "sample_annotation", "sensor", "category", "instance",
    )}

    cat_token = _tok()
    tables["category"].append({"token": cat_token, "name": "vehicle.car"})

    sensor_tokens = {}
    for k in range(config.num_agents):
        st = _tok()
        sensor_tokens[k] = st
        tables["sensor"].append(
            {"token": st, "channel": f"LIDAR_TOP_id_{k}", "modality": "lidar"}
        )

    rng = np.random.default_rng(seed)
    for si in range(num_scenes):
        scene_token = _tok()
        sample_tokens = [_tok() for _ in range(frames_per_scene)]
        instance_tokens: Dict[int, str] = {}
        base_seed = seed * 977 + si * 131

        for fi, sample_token in enumerate(sample_tokens):
            scene_dict = generate_scene(config, spec, seed=base_seed)
            # Small per-frame drift so consecutive frames differ.
            drift = fi * 0.4

            tables["sample"].append(
                {
                    "token": sample_token,
                    "scene_token": scene_token,
                    "timestamp": 1_000_000 * fi,
                    "prev": sample_tokens[fi - 1] if fi > 0 else "",
                    "next": sample_tokens[fi + 1]
                    if fi + 1 < frames_per_scene
                    else "",
                }
            )

            # Reconstruct world-frame data from the generator internals:
            # agent 0 is at the origin, so agent-0-frame == world frame.
            gt0 = scene_dict["gt_boxes"][0][scene_dict["gt_mask"][0]]
            for vi, box in enumerate(gt0):
                if vi not in instance_tokens:
                    instance_tokens[vi] = _tok()
                    tables["instance"].append(
                        {
                            "token": instance_tokens[vi],
                            "category_token": cat_token,
                        }
                    )
                tables["sample_annotation"].append(
                    {
                        "token": _tok(),
                        "sample_token": sample_token,
                        "instance_token": instance_tokens[vi],
                        "translation": [
                            float(box[0] + drift),
                            float(box[1]),
                            0.0,
                        ],
                        "size": [float(box[3]), float(box[2]), 1.6],
                        "rotation": _yaw_quat(float(box[4])),
                    }
                )

            for k in range(config.num_agents):
                if not scene_dict["agent_mask"][k]:
                    continue
                # Agent pose in world frame = trans from agent-0 (world).
                a2w = scene_dict["trans"][0, k]  # T_{0<-k} = world_from_k
                yaw = float(np.arctan2(a2w[1, 0], a2w[0, 0]))
                ego_token = _tok()
                cs_token = _tok()
                tables["ego_pose"].append(
                    {
                        "token": ego_token,
                        "translation": [
                            float(a2w[0, 3] + drift),
                            float(a2w[1, 3]),
                            0.0,
                        ],
                        "rotation": _yaw_quat(yaw),
                        "timestamp": 1_000_000 * fi,
                    }
                )
                tables["calibrated_sensor"].append(
                    {
                        "token": cs_token,
                        "sensor_token": sensor_tokens[k],
                        "translation": [0.0, 0.0, 0.0],
                        "rotation": _yaw_quat(0.0),
                    }
                )
                rel = f"sweeps/LIDAR_TOP_id_{k}/{scene_token}_{fi}.pcd.bin"
                path = os.path.join(out_root, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                pts = scene_dict["points"][k][scene_dict["point_mask"][k]]
                full = np.zeros((len(pts), 5), np.float32)
                full[:, :3] = pts
                full.tofile(path)
                tables["sample_data"].append(
                    {
                        "token": _tok(),
                        "sample_token": sample_token,
                        "ego_pose_token": ego_token,
                        "calibrated_sensor_token": cs_token,
                        "filename": rel,
                        "fileformat": "pcd",
                        "is_key_frame": True,
                        "channel": f"LIDAR_TOP_id_{k}",
                    }
                )

        tables["scene"].append(
            {
                "token": scene_token,
                "name": f"scene-{si:04d}",
                "first_sample_token": sample_tokens[0],
                "last_sample_token": sample_tokens[-1],
                "nbr_samples": frames_per_scene,
            }
        )

    for name, rows in tables.items():
        with open(os.path.join(base, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return out_root

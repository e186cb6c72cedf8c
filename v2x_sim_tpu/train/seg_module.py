"""Segmentation task module: jitted train / eval steps.

Analog of the reference's `SegModule` († coperception/utils/SegModule.py,
SURVEY.md §2.1): per-pixel cross-entropy training and confusion-matrix
mIoU tracking, with the same donated-state jitted-step design as
train.det_module.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.models.seg.unet import SegModel
from v2x_sim_tpu.ops.voxelize import voxelize_batch
from v2x_sim_tpu.train.det_module import TrainState
from v2x_sim_tpu.utils.losses import seg_cross_entropy_sum
from v2x_sim_tpu.utils.seg_metrics import confusion_matrix


class SegModule:
    """Builds jitted steps for one segmentation model configuration."""

    def __init__(
        self,
        config: Config,
        mode: str = "lowerbound",
        learning_rate: float = 1e-3,
        axis_name: Optional[str] = None,
        compute_dtype: jnp.dtype = jnp.float32,
        width_mult: float = 1.0,
        depth: int = 4,
        spatial_mesh=None,
    ):
        self.config = config
        self.mode = mode
        self.axis_name = axis_name
        model_dtype = None if compute_dtype == jnp.float32 else compute_dtype
        self.model = SegModel(
            config=config, mode=mode, axis_name=axis_name, dtype=model_dtype,
            width_mult=width_mult, depth=depth, spatial_mesh=spatial_mesh,
        )
        self.compute_dtype = compute_dtype
        self.tx = optax.adam(learning_rate)
        self.prepare_batch = jax.jit(self._prepare_batch_impl)
        self.train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self.eval_step = jax.jit(self._eval_step_impl)

    def occupancy_from_points(self, points, point_mask):
        # Scatter straight into the s2d-blocked layout the UNet consumes
        # (ops.voxelize; the model infers blockedness from the channels).
        return voxelize_batch(
            points,
            point_mask,
            self.config.grid,
            dtype=self.compute_dtype,
            blocked=self.model.s2d,
        )

    def _model_input(self, batch):
        if "occupancy" in batch:
            return batch["occupancy"]
        if self.mode == "upperbound":
            # Early fusion: merge all real agents' clouds per ego frame.
            from v2x_sim_tpu.ops.voxelize import merged_occupancy

            return merged_occupancy(
                batch["points"],
                batch["point_mask"],
                batch["trans"],
                batch["agent_mask"],
                self.config.grid,
                dtype=self.compute_dtype,
                blocked=self.model.s2d,
            )
        return self.occupancy_from_points(batch["points"], batch["point_mask"])

    def _prepare_batch_impl(self, batch):
        out = dict(batch)
        out["occupancy"] = self._model_input(batch)
        return out

    def init(self, rng, batch) -> TrainState:
        occ = self._model_input(batch)
        variables = self.model.init(
            rng, occ, batch["trans"], batch["agent_mask"], train=False
        )
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    def loss_fn(self, params, batch_stats, batch, train=True):
        occ = self._model_input(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = self.model.apply(
                variables,
                occ,
                batch["trans"],
                batch["agent_mask"],
                train=True,
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            out = self.model.apply(
                variables, occ, batch["trans"], batch["agent_mask"], train=False
            )
            new_stats = batch_stats
        labels = jnp.where(
            batch["agent_mask"][:, :, None, None], batch["seg_labels"], -1
        )
        ce_sum, ce_n = seg_cross_entropy_sum(
            out.logits, labels, self.config.num_seg_classes
        )
        if self.axis_name is not None:
            ce_n = jax.lax.psum(ce_n, self.axis_name)
        loss = ce_sum / jnp.maximum(ce_n, 1.0)
        return loss, (new_stats, {"loss": loss})

    def _train_step_impl(self, state: TrainState, batch):
        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, True
        )
        if self.axis_name is not None:
            grads = jax.lax.psum(grads, self.axis_name)
            metrics = jax.lax.psum(metrics, self.axis_name)
            new_stats = jax.lax.pmean(new_stats, self.axis_name)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1), metrics

    def _eval_step_impl(self, state: TrainState, batch) -> Any:
        """Returns (pred (B, A, H, W) int32, confusion (C, C))."""
        occ = self._model_input(batch)
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            occ,
            batch["trans"],
            batch["agent_mask"],
            train=False,
        )
        pred = jnp.argmax(out.logits, axis=-1)
        labels = jnp.where(
            batch["agent_mask"][:, :, None, None], batch["seg_labels"], -1
        )
        cm = confusion_matrix(pred, labels, self.config.num_seg_classes)
        return pred, cm

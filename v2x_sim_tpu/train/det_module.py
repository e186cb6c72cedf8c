"""Detection task module: jitted train / eval steps.

TPU-native analog of the reference's `FaFModule`
(† coperception/utils/CoDetModule.py, SURVEY.md §2.1): one optimization
step = forward + anchor-masked focal cls loss + smooth-L1 loc loss
(+ optional KD MSE vs a frozen early-fusion teacher), backward, update.

Differences by design (SURVEY.md §7):
  * The whole step — voxelization of padded points, GT->anchor target
    assignment, model forward, loss, grad, optimizer — is ONE jitted,
    donated-state function; there is no host round trip per batch.
  * Data parallelism is the same function `shard_map`-ped over a mesh
    (see parallel.mesh); gradients are psum'd over the data axis.
  * Upperbound / teacher inputs (merged 6-agent clouds) are produced
    on-device from the same padded points via the pairwise transforms.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from v2x_sim_tpu.configs.config import Config
from v2x_sim_tpu.models.det.net import DetModel, TeacherModel
from v2x_sim_tpu.ops.anchors import anchor_grid
from v2x_sim_tpu.ops.assign import assign_targets_batched
from v2x_sim_tpu.ops.nms import NMSResult, batched_nms
from v2x_sim_tpu.ops.voxelize import voxelize_batch
from v2x_sim_tpu.utils.losses import (
    kd_mse_loss_sum,
    smooth_l1_loss_sparse_sum,
    softmax_focal_loss_sum,
)


class TrainState(NamedTuple):
    """Donated training state (params + BN stats + optimizer state)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class DetModule:
    """Builds jitted steps for one detection model configuration.

    Args:
      config: static geometry/anchor config.
      mode: collaboration mode (see models.det.net.MODES).
      kd_weight: weight of the DiscoNet KD MSE term (reference uses a
        large weight ~1e5 with `--kd_flag`; # VERIFY vs reference).
      kd_reduce: KD MSE normalization — "mean" (per-element, the
        reference's F.mse_loss default) or "pos" (normalize by the
        global positive-anchor count like the det terms, making the KD
        gradient scale track scene density). Ablated in PARITY.md #6.
      axis_name: set when the step runs inside shard_map for cross-device
        grad/BN psum.
    """

    def __init__(
        self,
        config: Config,
        mode: str = "lowerbound",
        learning_rate: float = 1e-3,
        kd_weight: float = 0.0,
        kd_reduce: str = "mean",
        mgda: bool = False,
        axis_name: Optional[str] = None,
        compute_dtype: jnp.dtype = jnp.float32,
        use_vis: bool = False,
        warp_flag: bool = True,
        v2v_rounds: int = 3,
        v2v_msg_norm: bool = False,
        width_mult: float = 1.0,
        spatial_mesh=None,
        grad_clip: float = 0.0,
    ):
        self.config = config
        self.mode = mode
        self.kd_weight = kd_weight
        assert kd_reduce in ("mean", "pos"), kd_reduce
        self.kd_reduce = kd_reduce
        self.mgda = mgda
        self.axis_name = axis_name
        self.compute_dtype = compute_dtype
        self.use_vis = use_vis
        self.warp_flag = warp_flag
        self.v2v_rounds = v2v_rounds
        self.v2v_msg_norm = v2v_msg_norm
        self.width_mult = width_mult
        self.spatial_mesh = spatial_mesh
        #: parallel.mesh contract: the step impls accept optional
        #: teacher_vars as a third argument.
        self.takes_teacher = True
        model_dtype = None if compute_dtype == jnp.float32 else compute_dtype
        # Blocked heads (s2d layout) on the training path: targets are
        # blocked to match, so no transpose sits on the gradient path.
        # eval_model uses standard-layout heads; predict_model keeps the
        # blocked heads + lazy reg decode (all three share params).
        self._blocked = mode in ("lowerbound", "upperbound") or (
            config.fusion_layer >= 1
        )
        self.model = DetModel(
            config=config,
            mode=mode,
            kd=kd_weight > 0.0,
            warp_flag=warp_flag,
            v2v_rounds=v2v_rounds,
            v2v_msg_norm=v2v_msg_norm,
            axis_name=axis_name,
            dtype=model_dtype,
            blocked_heads=self._blocked,
            width_mult=width_mult,
            spatial_mesh=spatial_mesh,
        )
        self.eval_model = DetModel(
            config=config,
            mode=mode,
            kd=kd_weight > 0.0,
            warp_flag=warp_flag,
            v2v_rounds=v2v_rounds,
            v2v_msg_norm=v2v_msg_norm,
            axis_name=axis_name,
            dtype=model_dtype,
            width_mult=width_mult,
            spatial_mesh=spatial_mesh,
        )
        # Predict path: blocked heads + lazy reg Conv_1 (evaluated at the
        # top-K cells inside decode — ops.postprocess). Shares params.
        self.predict_model = DetModel(
            config=config,
            mode=mode,
            kd=kd_weight > 0.0,
            warp_flag=warp_flag,
            v2v_rounds=v2v_rounds,
            v2v_msg_norm=v2v_msg_norm,
            axis_name=axis_name,
            dtype=model_dtype,
            blocked_heads=self._blocked,
            lazy_reg=self._blocked,
            width_mult=width_mult,
            spatial_mesh=spatial_mesh,
        )
        self.teacher = (
            TeacherModel(config=config, dtype=model_dtype, width_mult=width_mult)
            if kd_weight > 0.0
            else None
        )
        self.anchors = jnp.asarray(anchor_grid(config))
        # Global-norm gradient clipping before Adam. The reference's
        # FaFModule clips between backward and step (SURVEY.md §2.1 /
        # §3.2 "loss.backward(); clip; optimizer.step()" — exact
        # max_norm unpinned, PARITY.md #13); 0.0 disables (legacy rows
        # in committed tables trained unclipped). The production-
        # geometry upperbound instability is the motivating case:
        # docs/UPPERBOUND_DIAGNOSIS.md.
        self.grad_clip = grad_clip
        # Pre-top-K spatial peak filter (ops.postprocess._peak_filter).
        # At fine voxel grids one vehicle saturates ~80 anchors, so a
        # global top-K fills with duplicates of a few vehicles and NMS
        # collapses them — the production-geometry mAP cap of rounds 3-4
        # (oracle-decode evidence: docs/UPPERBOUND_DIAGNOSIS.md). 3x3
        # peaks at <=0.5 m voxels (~one candidate per vehicle); disabled
        # at coarse grids where two vehicles can share a neighborhood.
        self.peak_window = 3 if config.grid.voxel_size[0] <= 0.5 else 0
        # Voxelize straight into the s2d-blocked layout the encoder
        # consumes (skips the full-res relayout; ops.voxelize). Only when
        # the model runs s2d and no extra input channels get concatenated.
        self._occ_blocked = (
            mode in ("lowerbound", "upperbound") or config.fusion_layer >= 1
        ) and not use_vis
        self.tx = (
            optax.chain(
                optax.clip_by_global_norm(grad_clip),
                optax.adam(learning_rate),
            )
            if grad_clip > 0.0
            else optax.adam(learning_rate)
        )
        # Jitted entry points. The raw *_impl methods stay undecorated so
        # parallel.mesh can wrap them in shard_map before jitting.
        self.prepare_batch = jax.jit(self._prepare_batch_impl)
        step_impl = self._train_step_mgda_impl if mgda else self._train_step_impl
        self.train_step = jax.jit(step_impl, donate_argnums=0)
        self.predict = jax.jit(
            self._predict_impl, static_argnums=(2, 3, 4, 5)
        )

    # ------------------------------------------------------------------ #
    # Input-side device stages
    # ------------------------------------------------------------------ #

    def occupancy_from_points(self, points, point_mask):
        """(B, A, P, 3) padded points -> (B, A, H, W, D) occupancy — or
        (B, A, H/2, W/2, 4D) blocked when the model runs s2d (the scatter
        writes the compute dtype directly: the op is HBM-bound)."""
        return voxelize_batch(
            points,
            point_mask,
            self.config.grid,
            dtype=self.compute_dtype,
            blocked=self._occ_blocked,
        )

    def merged_occupancy(self, points, point_mask, trans, agent_mask):
        """Early-fusion occupancy (upperbound / teacher input); see
        ops.voxelize.merged_occupancy."""
        from v2x_sim_tpu.ops.voxelize import merged_occupancy

        return merged_occupancy(
            points,
            point_mask,
            trans,
            agent_mask,
            self.config.grid,
            dtype=self.compute_dtype,
            blocked=self._occ_blocked,
        )

    def targets_from_gt(self, gt_boxes, gt_mask, flat: bool = False):
        """Batched anchor assignment over (B, A) — one kernel launch for
        the whole batch (vmap would serialize ~B*A Pallas IoU calls).

        `flat=True` returns labels/mask as (B, A, n) and reg targets as
        structure-of-arrays (B, A, 6, n) — the layout the sparse-target
        extraction consumes (ops.assign)."""
        b, a, m, _ = gt_boxes.shape
        out = assign_targets_batched(
            gt_boxes.reshape(b * a, m, 5),
            gt_mask.reshape(b * a, m),
            self.anchors,
            self.config,
            flat=flat,
        )
        reshape = lambda x: x.reshape((b, a) + x.shape[1:])
        return jax.tree.map(reshape, out)

    # ------------------------------------------------------------------ #
    # Init / train / eval
    # ------------------------------------------------------------------ #

    def init(self, rng, batch) -> TrainState:
        occ = self._model_input(batch)
        variables = self.model.init(
            rng, occ, batch["trans"], batch["agent_mask"], train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def _model_input(self, batch):
        if "occupancy" in batch:
            return batch["occupancy"]
        if self.mode == "upperbound":
            occ = self.merged_occupancy(
                batch["points"],
                batch["point_mask"],
                batch["trans"],
                batch["agent_mask"],
            )
        else:
            occ = self.occupancy_from_points(
                batch["points"], batch["point_mask"]
            )
        if self.use_vis:
            occ = jnp.concatenate(
                [occ, self._vis_input(batch)], axis=-1
            )
        return occ

    def _vis_input(self, batch):
        """Visibility channels (reference vis_maps — SURVEY.md §2.1),
        scaled to [0, 1]. Prefer cache-baked maps (create_data --vis); the
        on-device fallback ray-carves per step, which is preprocessing-
        grade cost and logged as such in docs/PERF.md."""
        if "vis_maps" in batch:
            vis = batch["vis_maps"]
        else:
            from v2x_sim_tpu.ops.visibility import visibility_batch

            vis = visibility_batch(
                batch["points"], batch["point_mask"], self.config.grid
            )
        from v2x_sim_tpu.ops.visibility import OCCUPIED

        return vis.astype(self.compute_dtype) / OCCUPIED

    def _prepare_batch_impl(self, batch):
        """One-time per-batch device preprocessing: voxelize the padded
        points and assign anchor targets. Keeping this out of train_step
        means the (windowed rotated-IoU) assignment runs once per batch,
        not once per gradient step, and the input pipeline can run it
        asynchronously ahead of the train step."""
        out = dict(batch)
        out["occupancy"] = self._model_input(batch)
        if "tgt_labels" in batch or "tgt_pos_idx" in batch:
            # Baked offline by create_data_det --targets 1 (the
            # reference's create_data bakes targets too, SURVEY.md §3.1):
            # the windowed rotated-IoU assignment is skipped and only the
            # cheap layout transforms below run per batch. The labels
            # arrive either dense (legacy caches) or as sparse pos/ignore
            # flat indices (current wire format — 12x smaller on disk and
            # over the host->device link) rebuilt here with two scatters.
            if "tgt_labels" in batch:
                labels = batch["tgt_labels"]
            else:
                from v2x_sim_tpu.ops.assign import labels_from_sparse_idx

                h, w, k = self._grid_dims()
                labels = labels_from_sparse_idx(
                    batch["tgt_pos_idx"], batch["tgt_ign_idx"], h * w * k
                )
            cells = batch["tgt_cells"]
            reg, wts = batch["tgt_reg"], batch["tgt_wts"]
            for key in ("tgt_labels", "tgt_pos_idx", "tgt_ign_idx",
                        "tgt_cells", "tgt_reg", "tgt_wts", "tgt_meta"):
                out.pop(key, None)
        else:
            sp = self.targets_from_gt(
                batch["gt_boxes"], batch["gt_mask"], flat="sparse"
            )
            labels, cells, reg, wts = sp.labels, sp.cells, sp.reg, sp.wts
        # Cross the jit boundary FLAT (a (B, A, H, W, K, …) output forces
        # a ~28x padded relayout in the consumer), with the localization
        # targets SPARSE (losses.smooth_l1_loss_sparse_sum) — the dense
        # (B, A, H, W, K, 6) encode never exists (ops.assign).
        b, a = batch["agent_mask"].shape
        out["labels"] = self._flat_labels(labels, b, a)
        cell, lane = self._positive_indices(cells, b, a)
        out["reg_cell"] = cell
        out["reg_lane"] = lane
        # Baked/pooled targets may arrive storage-compressed (bf16 reg,
        # int8 wts — bench_table pool HBM budget); the loss runs f32.
        out["reg_sp_t"] = reg.astype(jnp.float32)
        out["reg_sp_w"] = wts.astype(jnp.float32)
        if self.kd_weight > 0.0:
            out["teacher_occupancy"] = self.merged_occupancy(
                batch["points"],
                batch["point_mask"],
                batch["trans"],
                batch["agent_mask"],
            )
        return out

    def _grid_dims(self):
        h, w = self.config.grid.bev_shape
        return h, w, self.config.anchors.num_anchors

    def _flat_labels(self, labels: jnp.ndarray, b: int, a: int):
        """Labels as flat (B, A, N) int8, permuted into the blocked
        (space-to-depth) anchor order when the training heads are blocked
        so logits and labels share one flattening. int8 because the
        values are {-1, 0, 1} and the dense map is 38 MB/batch."""
        lab = labels.astype(jnp.int8)
        if self._blocked:
            from v2x_sim_tpu.models.s2d import space_to_depth

            h, w, k = self._grid_dims()
            lab = space_to_depth(lab.reshape(b * a, h, w, k))
        return lab.reshape(b, a, -1)

    def _positive_indices(self, cells: jnp.ndarray, b: int, a: int):
        """Convert the sparse assignment's positive-cell indices to
        (cell, lane) indices into the heads' folded conv layout —
        blocked (space-to-depth) order when the training heads are
        blocked. Pure integer arithmetic on (B, A, Pc) arrays."""
        h, w, k = self._grid_dims()
        pc = cells.shape[-1]
        hh, ww = cells // w, cells % w
        ki = jnp.arange(k)[None, None, None, :]
        if self._blocked:
            p = 2 * (hh % 2) + (ww % 2)
            cell = (hh // 2) * (w // 2) + ww // 2
            lane = p[..., None] * k + ki
        else:
            cell = cells
            lane = jnp.broadcast_to(ki, (b, a, pc, k))
        cell = jnp.broadcast_to(cell[..., None], (b, a, pc, k))
        return (
            cell.reshape(b, a, pc * k).astype(jnp.int32),
            lane.reshape(b, a, pc * k).astype(jnp.int32),
        )

    def loss_fn(
        self, params, batch_stats, batch, teacher_vars=None, train=True,
        teacher_feat=None,
    ) -> Tuple[jnp.ndarray, Tuple[Any, Dict[str, jnp.ndarray]]]:
        """`teacher_feat`: precomputed (stop-gradient) teacher KD target —
        lets multi-backward callers (MGDA) run the frozen teacher forward
        once instead of once per task."""
        occ = self._model_input(batch)
        if "labels" in batch:
            labels_flat = batch["labels"]
            cell, lane = batch["reg_cell"], batch["reg_lane"]
            sp_t, sp_w = batch["reg_sp_t"], batch["reg_sp_w"]
        else:
            sp = self.targets_from_gt(
                batch["gt_boxes"], batch["gt_mask"], flat="sparse"
            )
            b, a = batch["agent_mask"].shape
            labels_flat = self._flat_labels(sp.labels, b, a)
            cell, lane = self._positive_indices(sp.cells, b, a)
            sp_t, sp_w = sp.reg, sp.wts

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

        # Mask padded agents out of every loss term. Flat (B, A, HWK)
        # views: (..., K)-minor shapes materialize ~21x padded on TPU.
        am = batch["agent_mask"]
        b, a = am.shape
        labels = jnp.where(
            am[:, :, None], labels_flat.reshape(b, a, -1), jnp.int8(-1)
        )
        sp_w = sp_w * am[:, :, None].astype(sp_w.dtype)

        cls_sum, num_pos = softmax_focal_loss_sum(out.cls_logits, labels)
        r_cells = out.reg.shape[2] * out.reg.shape[3]
        loc_sum, _ = smooth_l1_loss_sparse_sum(
            out.reg.reshape(b, a, r_cells, -1), cell, lane, sp_t, sp_w
        )
        # Normalize by the GLOBAL positive count under DP so that an N-way
        # sharded step computes exactly the full-batch gradient (grads are
        # psum'd to match — see _train_step_impl).
        if self.axis_name is not None:
            num_pos = jax.lax.psum(num_pos, self.axis_name)
        denom = jnp.maximum(num_pos, 1.0)
        cls_loss = cls_sum / denom
        loc_loss = loc_sum / denom
        loss = cls_loss + loc_loss
        metrics = {"cls_loss": cls_loss, "loc_loss": loc_loss}

        if self.kd_weight > 0.0 and (
            teacher_vars is not None or teacher_feat is not None
        ):
            if teacher_feat is None:
                t_occ = batch.get("teacher_occupancy")
                if t_occ is None:
                    t_occ = self.merged_occupancy(
                        batch["points"],
                        batch["point_mask"],
                        batch["trans"],
                        batch["agent_mask"],
                    )
                t_out = self.teacher.apply(teacher_vars, t_occ, train=False)
                teacher_feat = t_out.fused_feat
            kd_sum, kd_n = kd_mse_loss_sum(
                out.fused_feat, jax.lax.stop_gradient(teacher_feat)
            )
            if self.kd_reduce == "pos":
                # Normalize like the det terms (global positive count):
                # the KD gradient then scales with scene density instead
                # of being a constant per-element pull.
                kd_n = denom
            elif self.axis_name is not None:
                kd_n = jax.lax.psum(kd_n, self.axis_name)
            kd = kd_sum / jnp.maximum(kd_n, 1.0)
            loss = loss + self.kd_weight * kd
            metrics["kd_loss"] = kd

        metrics["loss"] = loss
        return loss, (new_stats, metrics)

    def _train_step_impl(self, state: TrainState, batch, teacher_vars=None):
        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, teacher_vars, True
        )
        if self.axis_name is not None:
            # Loss terms are (local sums / global normalizer): summing the
            # per-shard grads reconstructs the exact full-batch gradient.
            grads = jax.lax.psum(grads, self.axis_name)
            metrics = jax.lax.psum(metrics, self.axis_name)
            new_stats = jax.lax.pmean(new_stats, self.axis_name)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, new_stats, opt_state, state.step + 1),
            metrics,
        )

    def _train_step_mgda_impl(self, state: TrainState, batch, teacher_vars=None):
        """MGDA step: per-task backward passes + min-norm combination
        (reference `--MGDA` path in FaFModule; SURVEY.md §2.1)."""
        from v2x_sim_tpu.utils.mgda import mgda_grads

        task_keys = ["cls_loss", "loc_loss"]
        teacher_feat = None
        if self.kd_weight > 0.0 and teacher_vars is not None:
            task_keys.append("kd_loss")
            # Run the frozen teacher ONCE; each per-task backward below
            # re-traces loss_fn, and without hoisting the teacher forward
            # executes len(task_keys) times per step.
            t_occ = batch.get("teacher_occupancy")
            if t_occ is None:
                t_occ = self.merged_occupancy(
                    batch["points"],
                    batch["point_mask"],
                    batch["trans"],
                    batch["agent_mask"],
                )
            teacher_feat = jax.lax.stop_gradient(
                self.teacher.apply(teacher_vars, t_occ, train=False).fused_feat
            )

        def task_fn(params, key):
            _, (stats, metrics) = self.loss_fn(
                params, state.batch_stats, batch, None, True,
                teacher_feat=teacher_feat,
            )
            return metrics[key], (stats, metrics)

        grads = []
        new_stats = state.batch_stats
        metrics = {}
        for key in task_keys:
            g, (new_stats, metrics) = jax.grad(task_fn, has_aux=True)(
                state.params, key
            )
            if self.axis_name is not None:
                g = jax.lax.psum(g, self.axis_name)
            grads.append(g)
        combined, weights = mgda_grads(grads)
        if self.axis_name is not None:
            metrics = jax.lax.psum(metrics, self.axis_name)
            new_stats = jax.lax.pmean(new_stats, self.axis_name)
        for i, key in enumerate(task_keys):
            metrics[f"mgda_w_{key}"] = weights[i]
        updates, opt_state = self.tx.update(
            combined, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, new_stats, opt_state, state.step + 1),
            metrics,
        )

    def _predict_impl(
        self,
        state: TrainState,
        batch,
        max_boxes: Optional[int] = None,
        nms_iou: float = 0.1,
        score_threshold: float = 0.3,
        exact_topk: bool = False,
    ) -> NMSResult:
        """Eval path: forward -> score -> decode -> NMS, all on device.

        `exact_topk` uses an exact top-k for candidate selection (the
        eval tool's default — strict parity); the default approx_max_k
        (recall 0.99) is for the throughput path.

        Returns per-(batch, agent) NMSResult with (K, 5) boxes.
        """
        from v2x_sim_tpu.ops.postprocess import (
            decode_topk,
            decode_topk_blocked_lazy,
        )

        k = max_boxes or self.config.max_boxes
        occ = self._model_input(batch)
        # Blocked path: run the training-layout (space-to-depth) heads and
        # decode straight from the blocked maps — skips the depth_to_space
        # transpose of both full-res head outputs — with the reg head's
        # final 1x1 conv applied lazily at the top-K cells only
        # (ops.postprocess.decode_topk_blocked_lazy).
        model = self.predict_model if self._blocked else self.eval_model
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            occ,
            batch["trans"],
            batch["agent_mask"],
            train=False,
        )
        if self._blocked:
            w1 = state.params["reg_head"]["Conv_1"]["kernel"]
            b1 = state.params["reg_head"]["Conv_1"]["bias"]
            boxes, top_scores, valid = decode_topk_blocked_lazy(
                out.cls_logits,
                out.reg,
                w1,
                b1,
                self.config,
                k,
                score_threshold,
                batch["agent_mask"],
                exact=exact_topk,
                peak_window=self.peak_window,
            )
        else:
            boxes, top_scores, valid = decode_topk(
                out.cls_logits,
                out.reg,
                self.anchors,
                k,
                score_threshold,
                batch["agent_mask"],
                exact=exact_topk,
                peak_window=self.peak_window,
            )
        return batched_nms(boxes, top_scores, valid, nms_iou)

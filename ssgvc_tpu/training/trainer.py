"""Training system: GOP rollout in one jitted graph, 3-optimizer split, DP mesh.

TPU-native rebuild of the reference's VideoCompressionTrainer
(trainer_seg_video_model.py:471-1408):

  * The Python per-frame loop with manual backward + grad accumulation
    becomes ONE jitted graph: frame 0 through the frozen DMCI under
    stop_gradient, frame 1 with after_i=True, frames 2..T-1 as a
    ``lax.scan``. The reference detaches the DPB between frames
    (:1165-1166), so per-frame losses have no cross-frame gradient paths and
    summing them in one backward is mathematically identical to its
    accumulated micro-steps.
  * The backbone/probe/aux 3-optimizer split (:1325-1351) becomes an
    ``optax.multi_transform`` over param labels — backbone at 0.3x the cosine
    LR and 0.5x weight decay, probe (mask_sft/q_sft/mask_predictor) at full
    LR, aux (bit_estimator) at a fixed aux LR.
  * Global-norm grad clip 5.0 before the transforms (:1124).
  * DDP -> data-parallel ``jit`` over a 'data' mesh axis; params replicated,
    XLA inserts the gradient all-reduce.
  * Per-frame ``jax.checkpoint`` (remat) bounds memory for long GOPs.
  * ALM constrained mode (CONSTRAINT_OPT) and mask-train mode (MASK_TRAIN)
    are config flags; the ALM dual state lives in TrainState. The reference's
    ``loss =+ bce`` assignment bug (:1095) is implemented as the intended
    ``loss += bce``.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DMCConfig, DMCIConfig, TrainConfig
from ..models.dmc import DMC
from ..models.dmci import DMCI
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .loss import (
    alm_deadzone_penalty,
    alm_dual_update,
    init_psnrm_schedule,
    mse_from_psnr_db,
    psnr_from_mse,
    rate_distortion_loss,
    roi_mse,
)
from .schedule import warmup_cosine


def param_label(path: Tuple[str, ...]) -> str:
    """backbone / probe / aux split (trainer_seg_video_model.py:573-591)."""
    joined = "/".join(str(p) for p in path)
    if "bit_estimator" in joined:
        return "aux"
    if "mask_sft" in joined or "q_sft" in joined or "mask_predictor" in joined:
        return "probe"
    return "backbone"


class TrainState(NamedTuple):
    params_p: Any          # trainable P-model params
    params_i: Any          # frozen I-model params
    opt_state: Any
    step: jnp.ndarray
    alm_mu: jnp.ndarray
    alm_h_accum: jnp.ndarray
    alm_h_count: jnp.ndarray


class Trainer:
    """Owns the models, the optimizer and the jitted train/eval steps."""

    def __init__(self, cfg: TrainConfig, total_iters: int = 10000,
                 dmc_cfg: Optional[DMCConfig] = None,
                 dmci_cfg: Optional[DMCIConfig] = None,
                 mesh=None):
        self.cfg = cfg
        dtype = "bfloat16" if "bf16" in cfg.precision else "float32"
        if dmc_cfg is None:
            rr = getattr(cfg, "recon_residual", False)
            if getattr(cfg, "model_profile", "full") == "tiny":
                dmc_cfg = DMCConfig.variant(cfg.dmc_variant, dtype=dtype,
                                            ch_d=16, ch_y=8, ch_z=8,
                                            ch_recon=16, recon_residual=rr)
                dmci_cfg = dmci_cfg or DMCIConfig.tiny()
            else:
                dmc_cfg = DMCConfig.variant(cfg.dmc_variant, dtype=dtype,
                                            recon_residual=rr)
        self.dmc_cfg = dmc_cfg
        self.dmci_cfg = dmci_cfg or DMCIConfig(dtype=dtype)
        self.dmc = DMC(self.dmc_cfg)
        self.dmci = DMCI(self.dmci_cfg)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.num_devices)

        self.index_map = jnp.asarray(cfg.compression.index_map, jnp.int32)
        wm = cfg.compression.weights_map
        self.weights_arr = jnp.asarray(
            [wm[k] for k in sorted(wm)], jnp.float32)
        self.psnrm_targets = init_psnrm_schedule(
            cfg.psnrm_target_path, cfg.psnrm_default_db)

        sched = warmup_cosine(cfg.optimizer.base_lr, cfg.optimizer.min_lr,
                              cfg.optimizer.warmup_iters, total_iters)
        wd = cfg.optimizer.weight_decay
        opt = cfg.optimizer.optimizer_type.lower()

        def make(lr, weight_decay):
            if opt == "adamw":
                return optax.adamw(lr, weight_decay=weight_decay)
            if opt == "adam":
                # torch Adam applies weight decay as L2-in-gradient
                return optax.chain(optax.add_decayed_weights(weight_decay),
                                   optax.adam(lr))
            if opt == "lion":
                return optax.lion(lr, weight_decay=weight_decay)
            raise ValueError(f"unknown optimizer {opt!r}")

        if cfg.mask_train:
            # MASK_TRAIN trains ONLY mask_predictor (the reference backprops a
            # pure BCE loss and steps every optimizer, but only the probe path
            # carries useful gradient — trainer_seg_video_model.py:1080-1098);
            # we freeze everything else explicitly via zero updates.
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.multi_transform(
                    {
                        "mask_predictor": make(sched, wd),
                        "frozen": optax.set_to_zero(),
                    },
                    self._mask_train_labels,
                ),
            )
        else:
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.multi_transform(
                    {
                        "backbone": make(lambda s: 0.3 * sched(s), wd * 0.5),
                        "probe": make(sched, wd),
                        "aux": make(cfg.optimizer.aux_lr, wd),
                    },
                    self._labels,
                ),
            )
        if cfg.accumulation_steps and cfg.accumulation_steps > 1:
            # cross-batch gradient accumulation: the optimizers step every
            # accumulation_steps micro-batches on the mean gradient
            # (trainer_seg_video_model.py:1100-1148, loss / acc_steps +
            # boundary step), so effective batch = batch_size * acc_steps
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
        self.tx = tx
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------ init

    @staticmethod
    def _labels(params):
        from flax.traverse_util import flatten_dict, unflatten_dict
        flat = flatten_dict(params)
        return unflatten_dict({k: param_label(k) for k in flat})

    @staticmethod
    def _mask_train_labels(params):
        from flax.traverse_util import flatten_dict, unflatten_dict
        flat = flatten_dict(params)
        return unflatten_dict({
            k: ("mask_predictor"
                if "mask_predictor" in "/".join(str(p) for p in k)
                else "frozen")
            for k in flat})

    def example_batch(self, batch_size=2, seq_len=4, hw=(64, 64)):
        h, w = hw
        frames = jnp.zeros((batch_size, seq_len, h, w, 3), jnp.float32)
        masks = jnp.zeros((batch_size, seq_len, h, w, 1), jnp.float32)
        return {"frames": frames, "masks": masks}

    def init_state(self, rng: jax.Array, batch: Optional[Dict] = None,
                   params_p=None, params_i=None) -> TrainState:
        batch = batch or self.example_batch()
        frames, masks = batch["frames"], batch["masks"]
        b, _, h, w, _ = frames.shape
        r_i, r_p, r_n = jax.random.split(rng, 3)
        fresh_i = params_i is None
        if fresh_i:
            params_i = self.dmci.init(
                {"params": r_i}, frames[:, 0], jnp.int32(0), train=False
            )["params"]
        dpb = {
            "frame": frames[:, 0],
            "feature": jnp.zeros(
                (b, h // self.dmc_cfg.patch_size, w // self.dmc_cfg.patch_size,
                 self.dmc_cfg.ch_d), jnp.float32),
        }
        fresh_p = params_p is None
        if fresh_p:
            params_p = self.dmc.init(
                {"params": r_p, "noise": r_n}, frames[:, 1], jnp.int32(0), dpb,
                after_i=jnp.bool_(True), mask=masks[:, 1], train=False
            )["params"]
        # gain calibration: only for FRESH inits (restored checkpoints carry
        # trained gains) and only when the batch carries real signal (the
        # zeros example_batch would measure std 0 — e.g. dryrun_multichip)
        if self.cfg.calibrate_gains and float(jnp.std(frames)) > 1e-4:
            from .calibrate import calibrate_dmc, calibrate_dmci
            if fresh_i:
                params_i = calibrate_dmci(self.dmci, params_i, frames[:, 0])
            if fresh_p:
                params_p = calibrate_dmc(self.dmc, params_p, frames[:, 1],
                                         dpb, masks[:, 1])
        opt_state = self.tx.init(params_p)
        state = TrainState(
            params_p=params_p, params_i=params_i, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            alm_mu=jnp.asarray(self.cfg.lagr_init_lambda, jnp.float32),
            alm_h_accum=jnp.zeros((), jnp.float32),
            alm_h_count=jnp.zeros((), jnp.float32),
        )
        return replicate(self.mesh, state)

    # ------------------------------------------------------------- GOP loss

    def _p_frame_losses(self, params_p, frames, masks, qp, dpb, rng,
                        train: bool, eval_mode: bool):
        """Roll P-frames 1..T-1; returns (per-frame metric stack, extras)."""
        cfg = self.cfg
        seq_len = frames.shape[1]
        comp = cfg.compression
        mask_in = None if eval_mode else masks  # eval feeds 3ch only (:1238)

        def frame_step(dpb, t, after_i, rng_t):
            fa_idx = self.index_map[t % 8]
            curr_qp = qp + jnp.take(
                jnp.asarray(self.dmc_cfg.qp_shift, jnp.int32), fa_idx)
            w_t = jnp.where(eval_mode, 1.0, self.weights_arr[fa_idx])
            frame = frames[:, t]
            gt_mask = masks[:, t]
            m_in = None if mask_in is None else mask_in[:, t]

            apply = self.dmc.apply
            if train:
                apply = functools.partial(apply, rngs={"noise": rng_t})
            variables = {"params": params_p}
            out = apply(variables, frame, curr_qp, dpb, after_i=after_i,
                        mask=m_in, train=train)

            if cfg.constraint_opt:
                rd = rate_distortion_loss(out, frame, qp, w_t,
                                          comp.lambda_min, comp.lambda_max,
                                          comp.q_levels, mask=None,
                                          roi_weight=cfg.roi_weight)
                rate = rd.bpp_y + rd.bpp_z
                qp_eff = jnp.clip(curr_qp, 0, 63)
                tau = mse_from_psnr_db(jnp.take(self.psnrm_targets, qp_eff))
                g = (roi_mse(out["dpb"]["frame"], frame, gt_mask) - tau) / (tau + 1e-12)
                loss = rate + cfg.alm_penalty_scale * alm_deadzone_penalty(
                    g, cfg.lagr_rho)
                rd = rd._replace(loss=loss)
            else:
                rd = rate_distortion_loss(out, frame, qp, w_t,
                                          comp.lambda_min, comp.lambda_max,
                                          comp.q_levels, mask=gt_mask,
                                          roi_weight=cfg.roi_weight,
                                          lambda_normalize=cfg.lambda_normalize)
                g = jnp.zeros(())

            loss = rd.loss
            if cfg.mask_train and out.get("mask_pred") is not None:
                bce = jnp.mean(optax.sigmoid_binary_cross_entropy(
                    out["mask_pred"].astype(jnp.float32), gt_mask))
                # MASK_TRAIN: "Just predict the mask and compare with GT" —
                # the loss is the BCE alone (`loss =+ bce` assigns,
                # trainer_seg_video_model.py:1080-1098), and the optimizer
                # freezes everything but mask_predictor (see __init__)
                loss = bce

            metrics = jnp.stack([loss, rd.bpp, rd.bpp_y, rd.bpp_z, rd.mse,
                                 rd.prev_obj, g])
            new_dpb = jax.tree_util.tree_map(jax.lax.stop_gradient, out["dpb"])
            return new_dpb, metrics

        rngs = jax.random.split(rng, seq_len)
        # frame 1: after_i static True
        step1 = frame_step
        if not eval_mode:
            step1 = jax.checkpoint(frame_step, static_argnums=(2,))
        dpb, m1 = step1(dpb, 1, True, rngs[1])

        if seq_len > 2:
            def scan_body(carry_dpb, xs):
                t, rng_t = xs
                fn = frame_step
                if not eval_mode:
                    fn = jax.checkpoint(frame_step, static_argnums=(2,))
                return fn(carry_dpb, t, False, rng_t)

            ts = jnp.arange(2, seq_len)
            dpb, m_rest = jax.lax.scan(scan_body, dpb, (ts, rngs[2:seq_len]))
            metrics = jnp.concatenate([m1[None], m_rest], axis=0)
        else:
            metrics = m1[None]
        return metrics, dpb

    def gop_loss(self, params_p, params_i, frames, masks, qp, rng,
                 train: bool, eval_mode: bool):
        """Full GOP: I-frame (frozen) then P-frames. Returns (scalar loss,
        aux metrics dict)."""
        i_out = self.dmci.apply({"params": params_i}, frames[:, 0], qp,
                                train=False)
        dpb = {
            "frame": jax.lax.stop_gradient(i_out["dpb"]["frame"]),
            "feature": jnp.zeros(
                frames.shape[0:1] +
                (frames.shape[2] // self.dmc_cfg.patch_size,
                 frames.shape[3] // self.dmc_cfg.patch_size,
                 self.dmc_cfg.ch_d), frames.dtype),
        }
        metrics, _ = self._p_frame_losses(params_p, frames, masks, qp, dpb,
                                          rng, train, eval_mode)
        mean = metrics.mean(axis=0)
        aux = {
            "loss": mean[0], "bpp": mean[1], "bpp_y": mean[2],
            "bpp_z": mean[3], "mse": mean[4], "prev_obj": mean[5],
            "g_mean": mean[6], "psnr": psnr_from_mse(mean[5]),
            "i_bpp": jnp.mean(i_out["bpp"]),
        }
        return mean[0], aux

    # ------------------------------------------------------------ jit steps

    def _train_step_mutable(self, params_p, opt_state, step, alm_mu,
                            alm_h_accum, alm_h_count, params_i, batch,
                            qp: jnp.ndarray, rng: jax.Array):
        """Inner step over the MUTABLE state fields only, so donation never
        touches the frozen I-model params (which callers may share across
        trainers)."""
        def loss_fn(p):
            return self.gop_loss(p, params_i, batch["frames"],
                                 batch["masks"], qp, rng, train=True,
                                 eval_mode=False)

        grads, aux = jax.grad(loss_fn, has_aux=True)(params_p)
        updates, opt_state = self.tx.update(grads, opt_state, params_p)
        params_p = optax.apply_updates(params_p, updates)

        if self.cfg.constraint_opt:
            alm_h_accum = alm_h_accum + aux["g_mean"]
            alm_h_count = alm_h_count + 1.0

            def _dual(args):
                return alm_dual_update(*args, self.cfg.lagr_rho,
                                       mu_max=self.cfg.lagr_lambda_max)

            acc = self.cfg.accumulation_steps or 1
            if acc > 1:
                # With grad accumulation the optimizer only applies every k
                # micro-batches (optax.MultiSteps); the reference's dual
                # ascent runs per OPTIMIZER step, so gate the mu update on
                # the same boundary (mini_step wraps to 0 right after an
                # apply). Between boundaries g_mean keeps accumulating, so
                # one dual step still sees every micro-batch's constraint.
                at_boundary = opt_state.mini_step == 0
                alm_mu, alm_h_accum, alm_h_count = jax.lax.cond(
                    at_boundary, _dual, lambda args: args,
                    (alm_mu, alm_h_accum, alm_h_count))
            else:
                alm_mu, alm_h_accum, alm_h_count = _dual(
                    (alm_mu, alm_h_accum, alm_h_count))

        return (params_p, opt_state, step + 1, alm_mu, alm_h_accum,
                alm_h_count), aux

    def train_step(self, state: TrainState, batch: Dict, qp: jnp.ndarray,
                   rng: jax.Array):
        mut, aux = self._train_step_mutable(
            state.params_p, state.opt_state, state.step, state.alm_mu,
            state.alm_h_accum, state.alm_h_count, state.params_i, batch,
            qp, rng)
        return TrainState(mut[0], state.params_i, mut[1], mut[2], mut[3],
                          mut[4], mut[5]), aux

    def eval_step(self, state: TrainState, batch: Dict, qp: jnp.ndarray,
                  rng: jax.Array):
        _, aux = self.gop_loss(state.params_p, state.params_i,
                               batch["frames"], batch["masks"], qp, rng,
                               train=False, eval_mode=True)
        return aux

    def jit_train_step(self):
        if self._train_step is None:
            inner = jax.jit(self._train_step_mutable,
                            donate_argnums=(0, 1, 2, 3, 4, 5))

            def step(state: TrainState, batch, qp, rng):
                mut, aux = inner(state.params_p, state.opt_state, state.step,
                                 state.alm_mu, state.alm_h_accum,
                                 state.alm_h_count, state.params_i, batch,
                                 qp, rng)
                return TrainState(mut[0], state.params_i, mut[1], mut[2],
                                  mut[3], mut[4], mut[5]), aux

            self._train_step = step
        return self._train_step

    def jit_eval_step(self):
        if self._eval_step is None:
            self._eval_step = jax.jit(self.eval_step)
        return self._eval_step

    # ------------------------------------------------------------- fit loop

    def fit(self, train_iter, val_iter=None, steps: int = 100,
            val_every: int = 0, log_every: int = 10, seed: int = 0,
            logger=None, state: Optional[TrainState] = None,
            steps_per_epoch: int = 0, ckpt_manager=None,
            image_log_dir: Optional[str] = None):
        """Host-side loop: random qp per batch (0..63), shard batch, step,
        log, validate, checkpoint. Returns the final state.

        * ``steps_per_epoch`` populates the CSV ``epoch`` column; ``qp_avg``
          is the running mean of sampled QPs since the last log row
          (reference headers, trainer_seg_video_model.py:850-881 — and its
          qp_sum never accumulates, :1022, a known bug we implement as
          intended).
        * ``ckpt_manager`` (utils.checkpoint.CheckpointManager) receives the
          val metrics after each validation — top-k on val/loss + last, the
          Lightning ModelCheckpoint semantics (:1471-1478).
        * ``image_log_dir`` dumps an original/recon panel at each validation
          (reference _log_images, :1353-1369).
        """
        rng = jax.random.PRNGKey(seed)
        if state is None:
            first = next(train_iter)
            state = self.init_state(rng, shard_batch(self.mesh, first))
            train_step = self.jit_train_step()
            batches = [first]
        else:
            train_step = self.jit_train_step()
            batches = []

        host_rng = np.random.default_rng(seed)
        qp_sum, qp_cnt = 0.0, 0
        for step in range(steps):
            batch = batches.pop() if batches else next(train_iter)
            batch = shard_batch(self.mesh, batch)
            qp_host = int(host_rng.integers(0, 64))
            qp_sum += qp_host
            qp_cnt += 1
            qp = jnp.int32(qp_host)
            rng, step_rng = jax.random.split(rng)
            state, aux = train_step(state, batch, qp, step_rng)
            if logger is not None and step % log_every == 0:
                row = {k: float(v) for k, v in aux.items()}
                row["qp_avg"] = qp_sum / max(qp_cnt, 1)
                if steps_per_epoch:
                    row["epoch"] = step // steps_per_epoch
                qp_sum, qp_cnt = 0.0, 0
                logger.log_train(step, row)
            if val_iter is not None and val_every and (step + 1) % val_every == 0:
                val_metrics = self.validate(
                    state, val_iter, logger=logger, step=step,
                    seed=seed + step,
                    epoch=(step // steps_per_epoch if steps_per_epoch else 0))
                if ckpt_manager is not None and val_metrics:
                    ckpt_manager.save(
                        jax.device_get(state),
                        {"val/loss": val_metrics.get("loss")}, step)
                if image_log_dir and val_metrics:
                    self._log_recon_images(state, batch, image_log_dir, step)
        return state

    def _log_recon_images(self, state: TrainState, batch, out_dir: str,
                          step: int):
        """I- AND P-frame recon panels from the current batch (reference
        _log_images, trainer_seg_video_model.py:1353-1369 — the reference
        logs the P-model's recon, which is where training collapse shows;
        the ROI mask is tinted on the original half)."""
        try:
            from ..utils.logging import is_main_process
            from ..utils.visualize import save_recon_panel
            if not is_main_process():
                return
            frames = batch["frames"][:1]
            i_out = self.dmci.apply({"params": state.params_i}, frames[:, 0],
                                    jnp.int32(32), train=False)
            orig = np.asarray(frames[0, 0], np.float32)
            recon = np.asarray(i_out["dpb"]["frame"][0], np.float32)
            os.makedirs(out_dir, exist_ok=True)
            save_recon_panel(orig, recon,
                             os.path.join(out_dir, f"recon_step{step}.png"))
            # the TRAINED model's first P-frame, conditioned on the I recon
            if frames.shape[1] > 1:
                masks = batch.get("masks")
                m1 = (jnp.asarray(masks[:1, 1]) if masks is not None
                      else None)
                dpb = {"frame": i_out["dpb"]["frame"],
                       "feature": jnp.zeros(
                           (1, frames.shape[2] // self.dmc.cfg.patch_size,
                            frames.shape[3] // self.dmc.cfg.patch_size,
                            self.dmc.cfg.ch_d), jnp.float32)}
                p_out = self.dmc.apply(
                    {"params": state.params_p}, jnp.asarray(frames[:, 1]),
                    jnp.int32(32), dpb, after_i=True, mask=m1, train=False)
                save_recon_panel(
                    np.asarray(frames[0, 1], np.float32),
                    np.asarray(p_out["dpb"]["frame"][0], np.float32),
                    os.path.join(out_dir, f"recon_p_step{step}.png"),
                    mask=None if m1 is None else np.asarray(m1[0]))
        except Exception as e:  # pragma: no cover - logging is best-effort
            print(f"[images] recon panel failed: {e}")

    def validate(self, state: TrainState, val_iter, n_batches: int = 8,
                 logger=None, step: int = 0, seed: int = 0, epoch: int = 0):
        eval_step = self.jit_eval_step()
        host_rng = np.random.default_rng(seed)
        rng = jax.random.PRNGKey(seed)
        agg: Dict[str, float] = {}
        count = 0
        for _ in range(n_batches):
            try:
                batch = next(val_iter)
            except StopIteration:
                break
            batch = shard_batch(self.mesh, batch)
            qp = jnp.int32(host_rng.integers(0, 64))
            rng, step_rng = jax.random.split(rng)
            aux = eval_step(state, batch, qp, step_rng)
            for k, v in aux.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            count += 1
        if count:
            agg = {k: v / count for k, v in agg.items()}
            agg["epoch"] = epoch
            if logger is not None:
                logger.log_val(step, agg)
        return agg

#!/usr/bin/env python
"""Intra (I-frame) model training entry point.

The reference ships image_compression_config.yaml but no image trainer script
(SURVEY §7.4); this provides the missing surface: train/fine-tune DMCI with
the standard variable-rate RD loss over random QPs.

    python trainer_image_model.py dataset.batch_size=16 epochs=5 ...
"""

from __future__ import annotations

import os
import sys

CONFIG_PATH = "image_compression_config.yaml"

DEFAULT_YAML = """\
epochs: 10
grad_clip: 5.0
log_interval: 50
out_dir: out
image_checkpoint_path: ''
log_dir: ./logs
seed: 42
precision: bf16-mixed
num_devices: 1
exp_name: image-compression
dataset:
  dataset_type: waymo
  data_dir: ./dataset/waymo
  batch_size: 16
  crop_size: 256
  synthetic: false
optimizer:
  optimizer_type: adamw
  base_lr: 1.0e-4
  min_lr: 1.0e-5
  aux_lr: 5.0e-4
  weight_decay: 0.01
compression:
  lambda_min: 50.0
  lambda_max: 38400.0
  q_levels: 64
"""


def main(argv):
    if not os.path.exists(CONFIG_PATH):
        with open(CONFIG_PATH, "w") as f:
            f.write(DEFAULT_YAML)
        print(f"[config] wrote default {CONFIG_PATH}")

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ssgvc_tpu.config import DMCIConfig, load_config
    from ssgvc_tpu.data.dataset import make_datamodule
    from ssgvc_tpu.models.dmci import DMCI
    from ssgvc_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from ssgvc_tpu.training.loss import compute_lambda, psnr_from_mse
    from ssgvc_tpu.training.schedule import warmup_cosine
    from ssgvc_tpu.utils.logging import CSVLogger, save_config_snapshot

    cfg = load_config(CONFIG_PATH, argv)
    from ssgvc_tpu.parallel.mesh import maybe_init_distributed
    if maybe_init_distributed():
        import jax
        dm = make_datamodule(cfg, rank=jax.process_index(),
                             world=jax.process_count())
    else:
        dm = make_datamodule(cfg)
    steps_per_epoch = dm.steps_per_epoch()
    total_iters = cfg.epochs * steps_per_epoch

    log_dir = os.path.join(cfg.log_dir,
                           f"{cfg.exp_name}_{time.strftime('%Y%m%d_%H%M%S')}")
    logger = CSVLogger(log_dir)
    save_config_snapshot(log_dir, cfg)

    dtype = "bfloat16" if "bf16" in cfg.precision else "float32"
    model = DMCI(DMCIConfig(dtype=dtype))
    mesh = make_mesh(cfg.num_devices)

    sched = warmup_cosine(cfg.optimizer.base_lr, cfg.optimizer.min_lr,
                          cfg.optimizer.warmup_iters, total_iters)

    def label(path):
        return "aux" if "bit_estimator" in "/".join(map(str, path)) else "main"

    from flax.traverse_util import flatten_dict, unflatten_dict

    def labels_fn(params):
        flat = flatten_dict(params)
        return unflatten_dict({k: label(k) for k in flat})

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(
            {"main": optax.adamw(sched,
                                 weight_decay=cfg.optimizer.weight_decay),
             "aux": optax.adamw(cfg.optimizer.aux_lr,
                                weight_decay=cfg.optimizer.weight_decay)},
            labels_fn))

    rng = jax.random.PRNGKey(cfg.seed)
    first = next(dm.train_iter())
    frames = jnp.asarray(first["frames"][:, 0])
    params = model.init({"params": rng, "noise": rng}, frames, jnp.int32(0),
                        train=False)["params"]
    opt_state = tx.init(params)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)

    comp = cfg.compression

    @jax.jit
    def train_step(params, opt_state, x, qp, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, qp, train=True,
                              rngs={"noise": rng})
            mse = jnp.mean((out["dpb"]["frame"].astype(jnp.float32)
                            - x.astype(jnp.float32)) ** 2)
            lam = compute_lambda(qp, comp.lambda_min, comp.lambda_max,
                                 comp.q_levels)
            loss = jnp.mean(out["bpp_y"]) + jnp.mean(out["bpp_z"]) + lam * mse
            return loss, {"loss": loss, "bpp": jnp.mean(out["bpp"]),
                          "bpp_y": jnp.mean(out["bpp_y"]),
                          "bpp_z": jnp.mean(out["bpp_z"]), "mse": mse,
                          "psnr": psnr_from_mse(mse)}

        grads, aux = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, aux

    host_rng = np.random.default_rng(cfg.seed)
    train_it = dm.train_iter()
    print(f"[image-trainer] steps={total_iters} devices={mesh.devices.size}")
    for step in range(total_iters):
        batch = next(train_it)
        # every frame of the clip is a training image
        t_idx = int(host_rng.integers(0, batch["frames"].shape[1]))
        x = shard_batch(mesh, jnp.asarray(batch["frames"][:, t_idx]))
        qp = jnp.int32(host_rng.integers(0, comp.q_levels))
        rng, step_rng = jax.random.split(rng)
        params, opt_state, aux = train_step(params, opt_state, x, qp, step_rng)
        if step % cfg.log_interval == 0:
            logger.log_train(step, {k: float(v) for k, v in aux.items()})

    from ssgvc_tpu.utils.checkpoint import save_checkpoint
    path = save_checkpoint(os.path.join(log_dir, "checkpoints", "last"),
                           {"params": jax.device_get(params)})
    print(f"[done] checkpoint at {path}")


if __name__ == "__main__":
    main(sys.argv[1:])

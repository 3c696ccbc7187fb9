#!/usr/bin/env python
"""Training entry point — public surface mirrors the reference CLI:

    python trainer_seg_video_model.py key=value dataset.batch_size=8 ...

Loads video_compression_config.yaml (auto-created with defaults if missing,
like the reference trainer_seg_video_model.py:1515-1523), merges dotted CLI
overrides, optionally builds the YOLO mask cache, then runs the TPU trainer
(data-parallel jit over all local devices).
"""

from __future__ import annotations

import os
import sys

CONFIG_PATH = "video_compression_config.yaml"

DEFAULT_YAML = """\
epochs: 25
accumulation_steps: 8
grad_clip: 5.0
log_interval: 50
out_dir: out
dmc_variant: performance  # or: old / fast / mask_prop
image_checkpoint_path: ''
video_checkpoint_path: ''
log_dir: ./logs
seed: 42
precision: bf16-mixed
num_devices: 1
resume_from_checkpoint: null
build_cache: false
dataset:
  dataset_type: waymo
  data_dir: ./dataset/waymo
  seg_cache_dir: seg_cache
  batch_size: 32
  num_workers: 4
  seq_len: 4
  slide: 1
  crop_size: 128
  train_val_test_split: [0.9, 0.1, 0.0]
  strict_masks: false
  synthetic: false
optimizer:
  optimizer_type: adamw
  base_lr: 1.0e-4
  min_lr: 1.0e-5
  aux_lr: 5.0e-4
  weight_decay: 0.01
  warmup_iters: 0
compression:
  lambda_min: 50.0
  lambda_max: 38400.0
  q_levels: 64
  index_map: [0, 1, 0, 2, 0, 2, 0, 2]
  weights_map: {0: 0.5, 1: 1.2, 2: 0.9}
"""


def main(argv):
    if not os.path.exists(CONFIG_PATH):
        with open(CONFIG_PATH, "w") as f:
            f.write(DEFAULT_YAML)
        print(f"[config] wrote default {CONFIG_PATH}")

    from ssgvc_tpu.config import load_config
    from ssgvc_tpu.data.dataset import make_datamodule
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.logging import CSVLogger, save_config_snapshot

    cfg = load_config(CONFIG_PATH, argv)

    if cfg.build_cache:
        from ssgvc_tpu.data.build_cache import build_cache
        stats = build_cache(os.path.join(cfg.dataset.data_dir, "*.tfrecord"),
                            cfg.dataset.seg_cache_dir)
        print(f"[cache] {stats}")

    # multi-host: init the runtime BEFORE building the datamodule so each
    # host's loader iterates its disjoint epoch shard (DistributedSampler
    # semantics; the reference relied on Lightning DDP to inject this)
    from ssgvc_tpu.parallel.mesh import maybe_init_distributed
    if maybe_init_distributed():
        import jax
        dm = make_datamodule(cfg, rank=jax.process_index(),
                             world=jax.process_count())
    else:
        dm = make_datamodule(cfg)
    steps_per_epoch = dm.steps_per_epoch()
    total_iters = cfg.epochs * steps_per_epoch

    import time
    log_dir = os.path.join(cfg.log_dir,
                           f"{cfg.exp_name}_{time.strftime('%Y%m%d_%H%M%S')}")
    logger = CSVLogger(log_dir)
    save_config_snapshot(log_dir, cfg)

    trainer = Trainer(cfg, total_iters=total_iters)
    print(f"[trainer] variant={cfg.dmc_variant} devices={trainer.mesh.devices.size} "
          f"steps/epoch={steps_per_epoch} total={total_iters}")

    state = None
    if cfg.resume_from_checkpoint:
        from ssgvc_tpu.utils.checkpoint import restore_checkpoint
        import jax as _jax
        template = trainer.init_state(_jax.random.PRNGKey(cfg.seed))
        # orbax stores the TrainState NamedTuple as a field-name dict; the
        # NamedTuple template itself is the matching restore target (a plain
        # tuple() raises a structure mismatch)
        state = restore_checkpoint(cfg.resume_from_checkpoint,
                                   target=template)
        print(f"[resume] restored {cfg.resume_from_checkpoint}")
    elif cfg.image_checkpoint_path or cfg.video_checkpoint_path:
        from ssgvc_tpu.utils.checkpoint import load_pretrained
        state = load_pretrained(trainer, cfg)

    # Lightning semantics: float <= 1.0 -> fraction of an epoch,
    # int > 1 -> every N steps (trainer_seg_video_model.py:1498)
    vci = cfg.val_check_interval
    val_every = int(vci) if vci > 1 else max(1, int(steps_per_epoch * vci))

    from ssgvc_tpu.utils.checkpoint import CheckpointManager, save_checkpoint
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    ckpt_manager = CheckpointManager(ckpt_dir, monitor="val/loss",
                                     top_k=cfg.save_top_k)
    state = trainer.fit(dm.train_iter(), dm.val_iter(loop=True),
                        steps=total_iters, val_every=val_every,
                        log_every=cfg.log_interval, seed=cfg.seed,
                        logger=logger, state=state,
                        steps_per_epoch=steps_per_epoch,
                        ckpt_manager=ckpt_manager,
                        image_log_dir=os.path.join(log_dir, "images"))

    ckpt_path = os.path.join(ckpt_dir, "last")
    save_checkpoint(ckpt_path, state)
    print(f"[done] checkpoint at {ckpt_path} "
          f"(best: {ckpt_manager.best_path})")


if __name__ == "__main__":
    main(sys.argv[1:])

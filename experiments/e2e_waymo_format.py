#!/usr/bin/env python
"""End-to-end Waymo-format user journey, chained for real in one script:

  1. synthesize Waymo-format TFRecord segments (JPEG front-camera frames in
     the proto layout our reader AND the reference's vendored reader parse),
  2. build the segmentation-mask cache with ``build_cache`` (pluggable
     segmenter standing in for YOLO — the released yolov8x-seg weights are
     not in this zero-egress image),
  3. train via the real CLI (``trainer_seg_video_model.py``) on that data,
  4. restore the written checkpoint and run a real-bitstream coded eval.

Reference journey: /root/reference/trainer_seg_video_model.py:1412-1510
(build cache -> datamodule -> Lightning fit -> checkpoint).

Writes artifacts/e2e_waymo_format.json. CPU-runnable (~10 min, tiny profile).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_frame(t: int, hw, seed: int):
    """Driving-like frame: smooth gradient background + a moving 'car' box;
    returns (rgb uint8, gt box in pixel coords)."""
    h, w = hw
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bg = np.stack([
        0.35 + 0.3 * yy / h,
        0.45 + 0.2 * xx / w,
        0.55 - 0.25 * yy / h,
    ], axis=-1)
    bh, bw = h // 4, w // 5
    top = int((h - bh) * 0.5 + 0.25 * h * np.sin(0.4 * t))
    left = int((t * w * 0.06 + rng.uniform(0, 4)) % max(w - bw, 1))
    top = int(np.clip(top, 0, h - bh))
    frame = bg.copy()
    ys, xs = np.mgrid[0:bh, 0:bw].astype(np.float32)
    tex = 0.5 + 0.4 * np.sin(ys / 6.0) * np.cos(xs / 7.0)
    frame[top:top + bh, left:left + bw] = np.stack(
        [tex, 0.9 - 0.5 * tex, 0.3 + 0.3 * tex], axis=-1)
    rgb = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
    return rgb, (top, left, bh, bw)


def make_segment(path: str, n_frames: int, hw, seed: int):
    from ssgvc_tpu.data import tfrecord, waymo_proto

    boxes = []
    records = []
    for t in range(n_frames):
        rgb, box = synth_frame(t, hw, seed * 1000 + t)
        boxes.append(box)
        records.append(waymo_proto.build_frame_proto(
            waymo_proto.encode_jpeg(rgb, quality=95),
            context_name=f"e2e-seg-{seed}"))
    tfrecord.write_records(path, records)
    return boxes


def main():
    t_start = time.perf_counter()
    work = tempfile.mkdtemp(prefix="e2e_waymo_")
    data_dir = os.path.join(work, "waymo")
    cache_dir = os.path.join(work, "seg_cache")
    log_dir = os.path.join(work, "logs")
    os.makedirs(data_dir)
    result = {"work_dir": work, "stages": {}}

    # -- 1. Waymo-format TFRecords ------------------------------------------
    hw = (128, 192)
    n_frames = 12
    all_boxes = {}
    for seg in range(2):
        p = os.path.join(data_dir, f"segment_{seg}.tfrecord")
        all_boxes[p] = make_segment(p, n_frames, hw, seed=seg + 1)
    result["stages"]["tfrecords"] = {
        "segments": 2, "frames_per_segment": n_frames, "hw": list(hw)}

    # -- 2. mask cache (synthetic segmenter stands in for YOLO) -------------
    from ssgvc_tpu.data.build_cache import build_cache

    def segmenter_for(path):
        boxes = all_boxes[path]
        state = {"i": 0}

        def seg(rgb):
            top, left, bh, bw = boxes[state["i"]]
            state["i"] += 1
            m = np.zeros(rgb.shape[:2], np.float32)
            m[top:top + bh, left:left + bw] = 1.0
            return [(m, 2)]  # COCO class 2 = car

        return seg

    written = 0
    for p in sorted(all_boxes):
        stats = build_cache(p, cache_dir, segmenter=segmenter_for(p))
        written += stats["written"]
    assert written == 2 * n_frames, written
    result["stages"]["cache"] = {"masks_written": written}

    # -- 2.5 pretrain the intra model (the reference's journey loads a
    # pretrained cvpr2025_image.pth.tar and freezes it,
    # trainer_seg_video_model.py:825-846; a random frozen DMCI caps the
    # whole pipeline at garbage PSNR). Saved as an orbax dir that
    # image_checkpoint_path accepts. ----------------------------------------
    import jax
    import jax.numpy as jnp
    import optax

    from ssgvc_tpu.config import DMCIConfig
    from ssgvc_tpu.data.dataset import WaymoClipDataset
    from ssgvc_tpu.models.dmci import DMCI
    from ssgvc_tpu.training.calibrate import calibrate_dmci
    from ssgvc_tpu.training.loss import compute_lambda
    from ssgvc_tpu.utils.checkpoint import save_checkpoint

    t0 = time.perf_counter()
    ds = WaymoClipDataset(sorted(all_boxes), seg_cache_dir=cache_dir,
                          seq_len=1, slide=1, crop_size=64,
                          strict_masks=True)
    dmci = DMCI(DMCIConfig.tiny())
    rng_np = np.random.default_rng(7)
    x0 = jnp.asarray(ds.__getitem__(0, rng=rng_np)[0])  # (1, 64, 64, 3)
    key = jax.random.PRNGKey(7)
    params_i = dmci.init({"params": key, "noise": key}, x0, jnp.int32(0),
                         train=False)["params"]
    params_i = calibrate_dmci(dmci, params_i, x0)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    opt_state = tx.init(params_i)

    @jax.jit
    def dmci_step(params, opt_state, x, qp, rng):
        def loss_fn(p):
            out = dmci.apply({"params": p}, x, qp, train=True,
                             rngs={"noise": rng})
            mse = jnp.mean((out["dpb"]["frame"].astype(jnp.float32) - x) ** 2)
            lam = compute_lambda(qp, 50.0, 38400.0)
            return jnp.mean(out["bpp"]) / lam + mse, mse

        grads, mse = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, mse

    key_j = jax.random.PRNGKey(8)
    dmci_budget_s = float(os.environ.get("E2E_DMCI_BUDGET_S", "300"))
    mse = None
    t_train = None  # budget excludes the jit compile (shared 1-core host)

    def batch4():
        xs = [ds.__getitem__(int(rng_np.integers(0, len(ds))),
                             rng=rng_np)[0][0] for _ in range(4)]
        return jnp.asarray(np.stack(xs))

    for i in range(4000):
        x = batch4()
        key_j, sub = jax.random.split(key_j)
        params_i, opt_state, mse = dmci_step(
            params_i, opt_state, x, jnp.int32(int(rng_np.integers(0, 64))),
            sub)
        if t_train is None:
            jax.block_until_ready(mse)
            t_train = time.perf_counter()
        elif time.perf_counter() - t_train > dmci_budget_s:
            break
    dmci_psnr = float(-10.0 * np.log10(max(float(mse), 1e-12)))
    dmci_ckpt = os.path.join(work, "dmci_pretrain")
    save_checkpoint(dmci_ckpt, {"params_i": jax.device_get(params_i)})
    result["stages"]["dmci_pretrain"] = {
        "seconds": round(time.perf_counter() - t0, 1), "steps": i + 1,
        "train_psnr_db": round(dmci_psnr, 2)}

    # -- 3. train through the real CLI --------------------------------------
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    overrides = [
        f"dataset.data_dir={data_dir}",
        f"dataset.seg_cache_dir={cache_dir}",
        f"image_checkpoint_path={dmci_ckpt}",
        "dataset.batch_size=2", "dataset.seq_len=3", "dataset.crop_size=64",
        "dataset.strict_masks=true",
        "epochs=2", "model_profile=tiny", "precision=fp32",
        # from-scratch recipe: start at the copy-prev bound + balanced
        # per-QP gradients (docs/FROM_SCRATCH_TRAINING.md)
        "recon_residual=true", "lambda_normalize=true",
        "accumulation_steps=1", "num_devices=1",
        f"log_dir={log_dir}", "log_interval=5",
    ]
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "trainer_seg_video_model.py")]
        + overrides,
        env=env, cwd=work, capture_output=True, text=True, timeout=3000)
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"trainer CLI failed rc={proc.returncode}")
    ckpt = None
    for line in proc.stdout.splitlines():
        if line.startswith("[done] checkpoint at "):
            ckpt = line.split("[done] checkpoint at ")[1].split(" (")[0]
    assert ckpt and os.path.isdir(ckpt), f"no checkpoint dir: {ckpt}"
    result["stages"]["train"] = {
        "seconds": round(time.perf_counter() - t0, 1), "checkpoint": ckpt}

    # -- 4. coded eval from the written checkpoint --------------------------
    import jax

    from ssgvc_tpu.coding.codec import VideoCodec
    from ssgvc_tpu.config import load_config
    from ssgvc_tpu.data.dataset import WaymoClipDataset
    from ssgvc_tpu.training.evaluate import evaluate_gop_coded
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint

    cfg = load_config(os.path.join(work, "video_compression_config.yaml"),
                      overrides)
    trainer = Trainer(cfg, total_iters=1)
    template = trainer.init_state(jax.random.PRNGKey(0))
    state = restore_checkpoint(ckpt, target=template)

    ds = WaymoClipDataset(
        sorted(all_boxes), seg_cache_dir=cache_dir, seq_len=3, slide=1,
        crop_size=64, strict_masks=True)
    frames, masks = ds.__getitem__(0, rng=np.random.default_rng(0))
    codec = VideoCodec(trainer.dmci, state.params_i, trainer.dmc,
                       state.params_p)
    coded = evaluate_gop_coded(
        codec, frames, masks, qp=32,
        index_map=list(cfg.compression.index_map),
        qp_shift=list(trainer.dmc_cfg.qp_shift))
    result["stages"]["coded_eval"] = {
        "frames": [{k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in r.items()} for r in coded],
        "mean_p_bpp": round(float(np.mean(
            [r["bpp"] for r in coded if r["frame_type"] == "P"])), 4),
        "mean_p_psnr": round(float(np.mean(
            [r["psnr"] for r in coded if r["frame_type"] == "P"])), 2),
    }

    result["total_seconds"] = round(time.perf_counter() - t_start, 1)
    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    out = os.path.join(REPO, "artifacts", "e2e_waymo_format.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out} ({result['total_seconds']}s)")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

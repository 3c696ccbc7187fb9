"""Throughput sweep over batch size / variants for the 1080p P-frame loop.

Same honest harness as bench.py (scan inside one jit, fresh per-process salt,
value-fetch sync); reports fps/chip = batch * n_frames / time for each config.

    python experiments/bench_sweep.py [b1 b2 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench_batch(b, h=1088, w=1920, n_frames=16, variant="performance",
                reps=3):
    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.ops.pixel import pixel_unshuffle

    packed = os.environ.get("SSGVC_PACKED", "0") == "1"
    n_frames = int(os.environ.get("SSGVC_FRAMES", n_frames))
    cfg = DMCConfig.variant(variant, dtype="bfloat16", packed_io=packed)
    model = DMC(cfg)

    key = jax.random.PRNGKey(time.time_ns() % (2**31))
    frames = jax.random.uniform(key, (n_frames, b, h, w, 3), jnp.bfloat16)
    masks = (jax.random.uniform(jax.random.PRNGKey(1), (n_frames, b, h, w, 1))
             > 0.8).astype(jnp.bfloat16)
    dpb0 = {
        "frame": jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3),
                                    jnp.bfloat16),
        "feature": (jax.random.normal(jax.random.PRNGKey(3),
                                      (b, h // 8, w // 8, cfg.ch_d),
                                      jnp.bfloat16) * 0.1),
    }
    params = model.init(
        jax.random.PRNGKey(4),
        pixel_unshuffle(jnp.zeros((1, 64, 64, 3)), 8) if packed
        else jnp.zeros((1, 64, 64, 3)),
        jnp.int32(32),
        {"frame": pixel_unshuffle(jnp.zeros((1, 64, 64, 3)), 8) if packed
         else jnp.zeros((1, 64, 64, 3)),
         "feature": jnp.zeros((1, 8, 8, cfg.ch_d))},
        after_i=False,
        mask=pixel_unshuffle(jnp.zeros((1, 64, 64, 1)), 8) if packed
        else jnp.zeros((1, 64, 64, 1)),
        train=False)["params"]

    @jax.jit
    def gop(params, frames, masks, qp, dpb):
        if packed:
            # one batched ingest permutation (counted in the timing), then
            # the whole scan stays in the packed domain
            fb = frames.reshape((n_frames * b,) + frames.shape[2:])
            mb = masks.reshape((n_frames * b,) + masks.shape[2:])
            frames = pixel_unshuffle(fb, 8).reshape(
                (n_frames, b, h // 8, w // 8, -1))
            masks = pixel_unshuffle(mb, 8).reshape(
                (n_frames, b, h // 8, w // 8, -1))
            dpb = dict(dpb, frame=pixel_unshuffle(dpb["frame"], 8))

        def step(dpb, xs):
            frame, mask = xs
            out = model.apply({"params": params}, frame, qp, dpb,
                              after_i=False, mask=mask, train=False)
            return out["dpb"], out["bpp"]

        dpb, bpps = jax.lax.scan(step, dpb, (frames, masks))
        return bpps.sum(), dpb["frame"].sum()

    out = gop(params, frames, masks, jnp.int32(32), dpb0)
    float(out[0])

    times = []
    for r in range(reps):
        start = time.perf_counter()
        out = gop(params, frames, masks, jnp.int32(33 + r), dpb0)
        float(out[0])
        times.append(time.perf_counter() - start)
    t = min(times)
    fps = n_frames * b / t
    ms_per_frame = t / n_frames * 1e3
    return fps, ms_per_frame


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    for b in batches:
        fps, ms = bench_batch(b)
        tfs = 939.1e9 * fps / 1e12  # 939 GFLOP/frame (XLA cost analysis)
        print(f"batch={b}: {fps:8.1f} fps/chip  {ms:7.2f} ms/step  "
              f"~{tfs:6.1f} TFLOP/s ({tfs/197*100:4.1f}% of v5e peak)",
              flush=True)


if __name__ == "__main__":
    main()

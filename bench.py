"""Benchmark: 1080p P-frame encode+decode throughput on one TPU chip.

Runs the flagship 'performance' DMC forward (full encode + decode transforms,
mask SFT, hyper path, 2-pass checkerboard prior, recon, bit estimation) on
1920x1088 frames in bf16 and reports steady-state frames/s.

The frame loop is a ``lax.scan`` inside ONE jit (the DPB carry never leaves
the device), which is also how the trainer and the streaming inference API
run — per-frame host dispatch would otherwise dominate on tunneled setups.

Baseline note: the reference publishes no fps numbers (see BASELINE.md);
DCVC-RT's headline claim is real-time 1080p coding, so we use 30 fps as the
A100-class real-time bar. vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC

    cfg = DMCConfig.variant("performance", dtype="bfloat16")
    model = DMC(cfg)

    b, h, w = 1, 1088, 1920
    n_frames = 16
    # unique per-process salt: tunneled runtimes cache (executable, args)
    # results across processes, which would fake the measurement
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
    qp = jnp.int32(32)

    # init with tiny shapes (params are shape-independent)
    params = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)), qp,
        {"frame": jnp.zeros((1, 64, 64, 3)),
         "feature": jnp.zeros((1, 8, 8, cfg.ch_d))},
        after_i=False, mask=jnp.zeros((1, 64, 64, 1)), train=False)["params"]

    @jax.jit
    def gop(params, frames, masks, qp, dpb):
        def step(dpb, xs):
            frame, mask = xs
            out = model.apply({"params": params}, frame, qp, dpb,
                              after_i=False, mask=mask, train=False)
            return out["dpb"], out["bpp"]

        dpb, bpps = jax.lax.scan(step, dpb, (frames, masks))
        return bpps.sum(), dpb["frame"].sum()

    # warmup/compile
    out = gop(params, frames, masks, qp, dpb0)
    float(out[0])

    # Sync by FETCHING a scalar result per rep: on tunneled runtimes
    # block_until_ready does not actually block, and (executable, args)
    # results are cached across processes — fresh inputs + a value fetch are
    # the only honest measurement.
    reps = 4
    times = []
    for r in range(reps):
        start = time.perf_counter()
        out = gop(params, frames, masks, jnp.int32(33 + r), dpb0)
        float(out[0])
        times.append(time.perf_counter() - start)
    fps = n_frames * b / min(times)

    baseline_fps = 30.0  # A100-class real-time bar; reference publishes no fps
    print(json.dumps({
        "metric": "1080p P-frame enc+dec fps/chip (performance variant, bf16)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()

"""Benchmark: 1080p P-frame encode+decode throughput on one TPU chip.

Runs the flagship 'performance' DMC forward (full encode + decode transforms,
mask SFT, hyper path, 2-pass checkerboard prior, recon) on 1920x1088 frames in
bf16 and reports steady-state frames/s.

Baseline note: the reference publishes no fps numbers
(see BASELINE.md); DCVC-RT's headline claim is real-time 1080p coding, so we
use 30 fps as the A100-class real-time bar. vs_baseline = fps / 30.

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
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (b, h, w, 3), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 1)) > 0.8
            ).astype(jnp.float32)
    dpb = {
        "frame": jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3),
                                    jnp.float32),
        "feature": jax.random.normal(jax.random.PRNGKey(3),
                                     (b, h // 8, w // 8, cfg.ch_d),
                                     jnp.float32) * 0.1,
    }
    qp = jnp.int32(32)
    params = model.init(jax.random.PRNGKey(4), frame, qp, dpb,
                        after_i=False, mask=mask, train=False)["params"]

    @jax.jit
    def p_frame(params, frame, mask, qp, dpb):
        out = model.apply({"params": params}, frame, qp, dpb,
                          after_i=False, mask=mask, train=False)
        return out["dpb"], out["bpp"]

    # warmup/compile
    new_dpb, bpp = p_frame(params, frame, mask, qp, dpb)
    jax.block_until_ready(bpp)

    iters = 20
    start = time.perf_counter()
    cur = dpb
    for _ in range(iters):
        cur, bpp = p_frame(params, frame, mask, qp, cur)
    jax.block_until_ready(bpp)
    elapsed = time.perf_counter() - start
    fps = iters * b / elapsed

    baseline_fps = 30.0  # A100-class real-time bar; reference publishes no fps
    print(json.dumps({
        "metric": "1080p P-frame enc+dec fps/chip (performance variant, bf16)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()

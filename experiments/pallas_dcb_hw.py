#!/usr/bin/env python
"""Bounded on-hardware validation of the fused DepthConvBlock Pallas kernel.

Compiles ops/pallas_dcb.dcb_fused via Mosaic on the real TPU (the round-2
attempt never returned — tunnel issues), checks numerics vs the XLA
composition, and times both on the packed-loop shapes the 1080p trace showed
dominating (H/8 x W/8, ch_d). Prints PALLAS_HW_OK on success — the one-shot
script keys the SSGVC_PALLAS_DCB=1 bench rerun off that token.

Run alone (ONE TPU client): scripts/tpu_oneshot.sh step 3.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def xla_ref(x, w0, b0, w2, b2, w3, b3, wf0, bf0, wf2, bf2, q, shortcut):
    def wsilu(v):
        return v * jax.nn.sigmoid(4.0 * v)

    h = wsilu(jax.lax.conv_general_dilated(
        x, w0, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        + b0)
    hd = jax.lax.conv_general_dilated(
        h, w2, (1, 1), "SAME", feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    u = x + jax.lax.conv_general_dilated(
        hd, w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) \
        + b3
    f = wsilu(jax.lax.conv_general_dilated(
        u, wf0, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        + bf0)
    c = x.shape[-1]
    f = f[..., : 2 * c] + f[..., 2 * c:]
    y = u + jax.lax.conv_general_dilated(
        f, wf2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) \
        + bf2
    if shortcut:
        y = y + x
    return y * q


def bench(fn, args, iters=30):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ssgvc_tpu.ops.pallas_dcb import dcb_fused

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    results = []
    # packed-loop shapes: 1080p/8 with the full-size ch_d, plus ch_recon
    for (h, w, c) in ((136, 240, 256), (136, 240, 320)):
        dt = jnp.bfloat16
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, dt)
        x = mk(1, h, w, c)
        w0, b0 = mk(1, 1, c, c), mk(c)
        w2, b2 = mk(3, 3, 1, c), mk(c)
        w3, b3 = mk(1, 1, c, c), mk(c)
        wf0, bf0 = mk(1, 1, c, 4 * c), mk(4 * c)
        wf2, bf2 = mk(1, 1, 2 * c, c), mk(c)
        q = jnp.ones((1, 1, 1, c), dt)

        t0 = time.perf_counter()
        y_pl = dcb_fused(x, w0, b0, w2, b2, w3, b3, wf0, bf0, wf2, bf2,
                         q=q, shortcut=True, interpret=False)
        y_pl.block_until_ready()
        compile_s = time.perf_counter() - t0
        print(f"[{h}x{w}x{c}] Mosaic compile+run: {compile_s:.1f}s",
              flush=True)

        y_ref = xla_ref(x.astype(jnp.float32), *(a.astype(jnp.float32)
                        for a in (w0, b0, w2, b2, w3, b3, wf0, bf0, wf2,
                                  bf2)), q.astype(jnp.float32), True)
        err = float(jnp.max(jnp.abs(y_pl.astype(jnp.float32) - y_ref)))
        rel = err / float(jnp.max(jnp.abs(y_ref)) + 1e-9)
        print(f"[{h}x{w}x{c}] max abs err {err:.4f} (rel {rel:.4f})",
              flush=True)

        jit_ref = jax.jit(lambda *a: xla_ref(*a, True))
        ms_ref = bench(jit_ref, (x, w0, b0, w2, b2, w3, b3, wf0, bf0, wf2,
                                 bf2, q))
        ms_pl = bench(lambda *a: dcb_fused(*a, q=q, shortcut=True,
                                           interpret=False),
                      (x, w0, b0, w2, b2, w3, b3, wf0, bf0, wf2, bf2))
        print(f"[{h}x{w}x{c}] XLA {ms_ref:.3f} ms  Pallas {ms_pl:.3f} ms  "
              f"({ms_ref / ms_pl:.2f}x)", flush=True)
        results.append((rel, ms_ref, ms_pl))

    # bf16 tolerance: the two paths differ in summation order only
    if all(r[0] < 0.05 for r in results):
        print("PALLAS_HW_OK", flush=True)
    else:
        print("PALLAS_HW_NUMERIC_MISMATCH", flush=True)


if __name__ == "__main__":
    main()

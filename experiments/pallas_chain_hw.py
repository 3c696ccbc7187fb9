#!/usr/bin/env python
"""Bounded on-hardware validation of the CHAINED DepthConvBlock kernel.

Compiles ops/pallas_dcb_chain.dcb_chain_fused via Mosaic on the real TPU,
checks numerics vs the XLA composition, and times chain-of-N vs both the
XLA composition and N single-block pallas calls at the packed-loop shapes
(H/8 x W/8, ch_d / 3*ch_y). The single-block kernel wins 1.78x isolated
but loses integrated (fusion barriers, artifacts/bench_r04_pallas_dcb.json)
— the chain amortizes the barrier over N blocks. Prints CHAIN_HW_OK on
numeric success so scripts can key a SSGVC_PALLAS_DCB=2 bench rerun off it.

Run alone (ONE TPU client; takes the client lock).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from pallas_dcb_hw import bench, xla_ref


def _lock():
    import fcntl

    if os.environ.get("SSGVC_TPU_LOCK_HELD"):
        return None
    f = open("/tmp/ssgvc_tpu_client.lock", "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        raise SystemExit("another TPU client holds the lock; refusing")
    return f


def main():
    from ssgvc_tpu.ops.pallas_dcb import dcb_fused
    from ssgvc_tpu.ops.pallas_dcb_chain import _plan_segments, dcb_chain_fused

    _l = _lock()  # noqa: F841
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    ok = True
    # (h, w, c, n): FeatureExtractor part2 chain at 1080p/8; PriorFusion
    # chain at 1080p/16
    for (h, w, c, n) in ((136, 240, 256, 4), (136, 240, 256, 2),
                         (68, 120, 384, 3)):
        dt = jnp.bfloat16
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, dt)
        x = mk(1, h, w, c)
        blocks = []
        for _ in range(n):
            blocks.append((mk(1, 1, c, c), mk(c), mk(3, 3, 1, c), mk(c),
                           mk(1, 1, c, c), mk(c), mk(1, 1, c, 4 * c),
                           mk(4 * c), mk(1, 1, 2 * c, c), mk(c)))
        plan = _plan_segments(h, w, c, n, x.dtype.itemsize)
        print(f"[{h}x{w}x{c} n={n}] plan {plan}", flush=True)

        t0 = time.perf_counter()
        y_ch = dcb_chain_fused(x, blocks, interpret=False)
        y_ch.block_until_ready()
        print(f"[{h}x{w}x{c} n={n}] Mosaic compile+run: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        # fp32 XLA reference (summation-order-only differences)
        xr = x.astype(jnp.float32)
        for bp in blocks:
            a = [t.astype(jnp.float32) for t in bp]
            xr = xla_ref(xr, *a[:10], jnp.ones((1, 1, 1, c)), False)
        err = float(jnp.max(jnp.abs(y_ch.astype(jnp.float32) - xr)))
        rel = err / float(jnp.max(jnp.abs(xr)) + 1e-9)
        print(f"[{h}x{w}x{c} n={n}] max abs err {err:.4f} (rel {rel:.4f})",
              flush=True)
        ok = ok and rel < 0.05

        # --- timings: XLA chain, N single-block pallas, chained pallas ----
        def xla_chain(x, *flat):
            out = x
            for j in range(n):
                a = flat[j * 10:(j + 1) * 10]
                out = xla_ref(out, *a, jnp.ones((1, 1, 1, c), dt), False)
            return out

        flat = [t for bp in blocks for t in bp]
        ms_xla = bench(jax.jit(xla_chain), (x, *flat))

        def singles(x, *flat):
            out = x
            for j in range(n):
                a = flat[j * 10:(j + 1) * 10]
                out = dcb_fused(out, *a, interpret=False)
            return out

        ms_single = bench(singles, (x, *flat))
        ms_chain = bench(lambda x, *f: _chained(x, f), (x, *flat))
        print(f"[{h}x{w}x{c} n={n}] XLA {ms_xla:.3f} ms  "
              f"single-blocks {ms_single:.3f} ms  chain {ms_chain:.3f} ms  "
              f"(chain vs XLA {ms_xla / ms_chain:.2f}x, "
              f"vs singles {ms_single / ms_chain:.2f}x)", flush=True)

    print("CHAIN_HW_OK" if ok else "CHAIN_HW_NUMERIC_MISMATCH", flush=True)


def _chained(x, flat):
    from ssgvc_tpu.ops.pallas_dcb_chain import dcb_chain_fused

    n = len(flat) // 10
    blocks = [tuple(flat[j * 10:(j + 1) * 10]) for j in range(n)]
    return dcb_chain_fused(x, blocks, interpret=False)


if __name__ == "__main__":
    main()

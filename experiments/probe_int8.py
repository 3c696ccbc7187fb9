"""Feasibility probe: does int8 buy MXU throughput over bf16 on this chip?

The remaining single-stream perf lever after the r04 A/Bs (Pallas chains,
depthwise shiftadd, in-scan ingest, multi-stream batching — all measured
losses, see README perf notes) is precision: v5e quotes ~2x peak int8 OPS
vs bf16 FLOPS. Before building a quantized serving path through the codec,
measure raw conv/matmul throughput at the model's dominant shapes:

  * packed-domain 1x1 convs at 136x240 spatial, ch_d=256 (the DepthConvBlock
    trunk — where the FLOPs are, ssgvc_tpu/models/dmc.py)
  * 3x3 convs at the same shape (encoder/decoder stages)

For each: bf16 x bf16 -> bf16, int8 x int8 -> int32 (preferred_element_type),
and the dequant epilogue included (int32 * scale -> bf16), since that is what
a real quantized layer pays.

Prints one JSON line per case. Run on the TPU (holds the client lock).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


_FLOOR = None  # measured per-call dispatch+fetch floor (tunnel round trip)


def call_floor():
    """The ~26 ms/call tunnel dispatch+fetch floor (first probe version
    returned exactly this for EVERY case — pure round-trip latency, not
    compute). Measured once with a trivial jitted op and subtracted."""
    global _FLOOR
    if _FLOOR is None:
        tiny = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        float(jnp.sum(f(tiny))[None][0])
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(jnp.sum(f(tiny))[None][0])
            ts.append(time.perf_counter() - t0)
        _FLOOR = min(ts)
    return _FLOOR


def bench(fn, x, *args, chain=1000, reps=6):
    """Time ``chain`` data-dependent applications of fn inside ONE jit;
    return seconds per single application net of the dispatch floor.
    fn must map x -> same shape/dtype."""

    @jax.jit
    def chained(x, *args):
        def body(x, _):
            return fn(x, *args), ()
        x, _ = lax.scan(body, x, None, length=chain)
        return x

    out = chained(x, *args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = chained(x, *args)
        float(jnp.sum(out.astype(jnp.float32))[None][0])
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - call_floor(), 1e-9) / chain


def main():
    from bench import _tpu_lock  # shared client-lock discipline

    _lock = _tpu_lock()  # noqa: F841
    b, h, w, c = 1, 136, 240, 256
    k_out = 256
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
    x_i = jnp.asarray(rng.integers(-127, 127, size=(b, h, w, c)), jnp.int8)
    results = []
    for kh in (1, 3):
        w_f = jnp.asarray(rng.normal(size=(kh, kh, c, k_out)) * 0.05,
                          jnp.bfloat16)
        w_i = jnp.asarray(rng.integers(-127, 127, size=(kh, kh, c, k_out)),
                          jnp.int8)
        scale = jnp.float32(0.01)
        dn = lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        pad = "SAME" if kh == 3 else "VALID"

        def conv_bf16(x, w):
            return lax.conv_general_dilated(x, w, (1, 1), pad,
                                            dimension_numbers=dn)

        def conv_int8(x, w):
            # int8 conv + the requant epilogue a real quantized layer pays
            y = lax.conv_general_dilated(
                x, w, (1, 1), pad, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) * scale),
                          -127, 127)
            return yq.astype(jnp.int8)

        t_f = bench(conv_bf16, x_f, w_f)
        try:
            t_i = bench(conv_int8, x_i, w_i)
        except Exception as e:  # noqa: BLE001 — unsupported lowering
            t_i = None
            err = str(e)[-200:]
        flops = 2 * b * h * w * c * k_out * kh * kh
        row = {
            "case": f"{kh}x{kh} conv {c}->{k_out} @ {h}x{w}",
            "bf16_ms": round(t_f * 1e3, 4),
            "bf16_tflops": round(flops / t_f / 1e12, 1),
        }
        if t_i is not None:
            row["int8_ms"] = round(t_i * 1e3, 4)
            row["int8_tops"] = round(flops / t_i / 1e12, 1)
            row["int8_speedup"] = round(t_f / t_i, 3)
        else:
            row["int8_error"] = err
        results.append(row)
        print(json.dumps(row), flush=True)

    # pure matmul control (MXU ceiling check): 4096^3
    m = 4096
    a_f = jnp.asarray(rng.normal(size=(m, m)), jnp.bfloat16)
    a_i = jnp.asarray(rng.integers(-127, 127, size=(m, m)), jnp.int8)

    def mm_bf16(a, b_):
        return a @ b_

    def mm_int8(a, b_):
        y = lax.dot(a, b_, preferred_element_type=jnp.int32)
        yq = jnp.clip(jnp.round(y.astype(jnp.float32) * 1e-4), -127, 127)
        return yq.astype(jnp.int8)

    t_f = bench(mm_bf16, a_f, a_f, chain=50)
    t_i = bench(mm_int8, a_i, a_i, chain=50)
    flops = 2 * m ** 3
    row = {"case": f"matmul {m}^3",
           "bf16_ms": round(t_f * 1e3, 3),
           "bf16_tflops": round(flops / t_f / 1e12, 1),
           "int8_ms": round(t_i * 1e3, 3),
           "int8_tops": round(flops / t_i / 1e12, 1),
           "int8_speedup": round(t_f / t_i, 3)}
    results.append(row)
    print(json.dumps(row), flush=True)
    with open("artifacts/probe_int8.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

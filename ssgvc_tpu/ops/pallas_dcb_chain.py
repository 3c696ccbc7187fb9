"""Chained DepthConvBlock Pallas kernel: N blocks per pallas_call.

Why: the single-block kernel (ops/pallas_dcb.py) wins 1.78x in isolation at
c=256 inter shapes but LOSES ~19% integrated into the full 1080p model
(artifacts/bench_r04_pallas_dcb.json) — every pallas_call is a fusion
barrier, so XLA can no longer fuse the blocks' neighbors and relayouts
appear at each kernel boundary. The fix its own STATUS note prescribes:
amortize the boundary over a whole SUBGRAPH. This kernel runs a chain of N
adaptor-free DepthConvBlocks (the dominant repeated motif — reference
src/models/video_model.py:23-49,100-120 stacks 2-4 of them back to back) in
ONE pallas_call: one HBM read of the chain input, one write of the chain
output, all N blocks' intermediates in VMEM.

Math per block == ssgvc_tpu.layers.blocks.DepthConvBlock (== torch
src/layers/layers.py:43-79) up to float summation order:

    h   = wsilu(x @ W0 + b0)        # 1x1
    h   = dw3x3(h) + b2             # depthwise, zero-padded
    u   = x + (h @ W3 + b3)         # 1x1 + residual
    f   = wsilu_chunk_add(u @ Wf0)  # 1x1 C->4C, silu(4x)/4, halves added
    y   = u + (f @ Wf2 + bf2)       # 1x1 2C->C + residual
    y  *= q[j]                      # per-block quant (ones unless folded)

Tiling: the grid walks row-tiles of th rows. Each chained block's 3x3
depthwise consumes one halo row per side, so the kernel loads th + 2N rows
(N clamped single-row refs above and below the tile) and the live region
shrinks by 2 rows per block, reaching exactly th at the output. Rows
outside the frame are zeroed in h-space per block (the depthwise's
zero-padding semantics; clamped duplicate rows never leak — they only feed
the masked path, and residuals are row-aligned).

Weights arrive stacked along a leading N axis (one VMEM-resident block per
kind, constant index map -> fetched once), with the ffn 4C projection
pre-split into two 2C halves exactly like the single-block kernel (VMEM
peak + the c=320 Mosaic bias-slice workaround documented there).

STATUS: bit-accurate vs the XLA composition in interpret mode
(tests/test_pallas_dcb_chain.py). Hardware: validated on the v5e chip
2026-08-19 — chain-of-4 at c=256 1080p inter shapes beats per-block Pallas
and the XLA composition in isolation (experiments/pallas_chain_hw.py);
full-model A/B via SSGVC_PALLAS_DCB=2 (layers/blocks.py gate + model
call-sites in models/dmc.py) is measured by bench.py — see
artifacts/bench_r04_pallas_chain.json.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wsilu(x):
    return x * jax.nn.sigmoid(4.0 * x)


def _chain_kernel(*refs, th: int, w: int, c: int, n: int):
    """refs layout: x, up_1..up_N (rows tile_start-N..tile_start-1),
    dn_1..dn_N (rows tile_end..tile_end+N-1), then the 13 stacked weight
    arrays, then the output ref."""
    x_ref = refs[0]
    ups = refs[1:1 + n]
    dns = refs[1 + n:1 + 2 * n]
    (w0s, b0s, w2s, b2s, w3s, b3s, wf0as, bf0as, wf0bs, bf0bs, wf2s,
     bf2s, qs) = refs[1 + 2 * n:14 + 2 * n]
    y_ref = refs[14 + 2 * n]

    i = pl.program_id(0)
    h_total = pl.num_programs(0) * th
    cdt = x_ref.dtype

    cur = jnp.concatenate(
        [u[:] for u in ups] + [x_ref[:]] + [d[:] for d in dns], axis=0)

    for j in range(n):
        ext = th + 2 * (n - j)          # rows in this block's input
        off = n - j                     # global row of cur[0] = i*th - off

        # -- dc_0 (1x1) + wsilu over all ext rows --------------------------
        x2d = cur.reshape((ext * w, c))
        h = jnp.dot(x2d, w0s[j], preferred_element_type=jnp.float32)
        h = _wsilu(h + b0s[j].astype(jnp.float32)).reshape((ext, w, c))

        # zero h on rows outside the frame: the depthwise zero-pads in
        # h-space (a zero x row would still give wsilu(b0) != 0)
        g = (i * th - off) + jax.lax.broadcasted_iota(
            jnp.int32, (ext, 1, 1), 0)
        h = jnp.where(jnp.logical_and(g >= 0, g < h_total), h, 0.0)

        # -- depthwise 3x3, zero-padded cols, valid rows -> ext-2 rows -----
        zrow = jnp.zeros((ext, 1, c), jnp.float32)
        hl = jnp.concatenate([zrow, h[:, :-1, :]], axis=1)
        hr = jnp.concatenate([h[:, 1:, :], zrow], axis=1)
        w2 = w2s[j].astype(jnp.float32)            # (3, 3, c)
        acc = jnp.zeros((ext - 2, w, c), jnp.float32)
        for dy in range(3):
            rs = slice(dy, dy + ext - 2)
            acc += hl[rs] * w2[dy, 0]
            acc += h[rs] * w2[dy, 1]
            acc += hr[rs] * w2[dy, 2]
        acc += b2s[j].astype(jnp.float32)          # (1, 1, c)

        # -- dc_3 (1x1, rezero tail) + residual ----------------------------
        rows = ext - 2
        h2d = acc.reshape((rows * w, c))
        u = jnp.dot(h2d.astype(cdt), w3s[j],
                    preferred_element_type=jnp.float32)
        u = u + b3s[j].astype(jnp.float32)
        u = u + cur[1:ext - 1].reshape((rows * w, c)).astype(jnp.float32)

        # -- ffn (pre-split 2C halves; see module docstring) ---------------
        uc = u.astype(cdt)
        f = _wsilu(jnp.dot(uc, wf0as[j], preferred_element_type=jnp.float32)
                   + bf0as[j].astype(jnp.float32))
        f = f + _wsilu(
            jnp.dot(uc, wf0bs[j], preferred_element_type=jnp.float32)
            + bf0bs[j].astype(jnp.float32))
        y = jnp.dot(f.astype(cdt), wf2s[j],
                    preferred_element_type=jnp.float32)
        y = y + bf2s[j].astype(jnp.float32) + u
        y = y * qs[j].astype(jnp.float32)

        cur = y.reshape((rows, w, c)).astype(cdt)

    y_ref[:] = cur


def _chain_vmem_bytes(th: int, w: int, c: int, n: int, itemsize: int) -> int:
    """Upper-bound live VMEM for one grid step. Activations: the first
    block's halo-extended rows dominate — xh (input dtype) plus ~6
    fp32-row-sized intermediates (h, hl, hr, acc, u, f-halves) at ext rows.
    Weights: all N blocks resident (constant index maps), dominated by the
    8c^2 of matmul kernels per block, in the input dtype."""
    ext = th + 2 * n
    act = w * c * ext * (itemsize * 2 + 4 * 6)
    weights = n * (8 * c * c + 15 * c) * itemsize
    return act + weights


def _pick_tile(h: int, w: int, c: int, n: int, itemsize: int,
               budget: int = 10 * 1024 * 1024) -> Optional[int]:
    """Largest row-tile dividing h that fits the VMEM budget with at most
    3x halo redundancy ((th+2N)/th <= 3, so the N-row halo never triples
    the row work). None if no tile fits — caller splits the chain."""
    for th in (32, 16, 8, 4, 2):
        if h % th or th + 2 * n > 3 * th:
            continue
        if _chain_vmem_bytes(th, w, c, n, itemsize) <= budget:
            return th
    return None


def _plan_segments(h: int, w: int, c: int, length: int,
                   itemsize: int) -> Sequence[tuple]:
    """Split a chain of ``length`` blocks into (n, th) segments: prefer the
    longest n with a feasible tile (fewer pallas_call boundaries), then
    recurse on the remainder."""
    plan = []
    rest = length
    while rest > 0:
        for n in range(rest, 0, -1):
            th = _pick_tile(h, w, c, n, itemsize)
            if th is not None:
                plan.append((n, th))
                rest -= n
                break
        else:                       # not even n=1 fits: bail to caller
            return []
    return plan


def dcb_chain_fused(x: jnp.ndarray, blocks: Sequence[tuple],
                    q_last: Optional[jnp.ndarray] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Run ``len(blocks)`` chained DepthConvBlocks over x (B=1, NHWC).

    ``blocks``: per block the 10-tuple of flax-layout params
    (k0, b0, k2, b2, k3, b3, kf0, bf0, kf2, bf2) as declared by
    ``DepthConvBlock(..., return_params=True)``. ``q_last``: optional
    quant-step vector folded into the last block's output (the
    ``f = f * quant_step`` that follows these chains in the model).
    Falls back to None-return if no tile plan fits VMEM — the caller keeps
    the XLA composition in that case.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, c = x.shape
    assert b == 1, "dcb_chain_fused: inference path is B=1"
    plan = _plan_segments(h, w, c, len(blocks), x.dtype.itemsize)
    if not plan:
        return None
    out = x
    idx = 0
    for n, th in plan:
        seg = blocks[idx:idx + n]
        idx += n
        q = q_last if idx == len(blocks) else None
        out = _chain_call(out, _stack_params(seg, c, x.dtype, q),
                          n=n, th=th, interpret=interpret)
    return out


def _stack_params(seg, c, cdt, q_last):
    """Stack a segment's per-block params along a leading N axis in the
    kernel's layouts (matmul kernels in the activation dtype, ffn pre-split
    into 2C halves)."""
    n = len(seg)
    w0s, b0s, w2s, b2s, w3s, b3s = [], [], [], [], [], []
    wf0as, bf0as, wf0bs, bf0bs, wf2s, bf2s, qs = [], [], [], [], [], [], []
    for j, (k0, b0, k2, b2, k3, b3, kf0, bf0, kf2, bf2) in enumerate(seg):
        w0s.append(k0.reshape(c, c).astype(cdt))
        b0s.append(b0.reshape(1, c).astype(cdt))
        w2s.append(k2.reshape(3, 3, c).astype(cdt))
        b2s.append(b2.reshape(1, 1, c).astype(cdt))
        w3s.append(k3.reshape(c, c).astype(cdt))
        b3s.append(b3.reshape(1, c).astype(cdt))
        kf0m = kf0.reshape(c, 4 * c).astype(cdt)
        wf0as.append(kf0m[:, :2 * c])
        wf0bs.append(kf0m[:, 2 * c:])
        bf0v = bf0.reshape(4 * c).astype(cdt)
        bf0as.append(bf0v[:2 * c].reshape(1, 2 * c))
        bf0bs.append(bf0v[2 * c:].reshape(1, 2 * c))
        wf2s.append(kf2.reshape(2 * c, c).astype(cdt))
        bf2s.append(bf2.reshape(1, c).astype(cdt))
        if j == n - 1 and q_last is not None:
            qs.append(jnp.broadcast_to(q_last, (1, 1, 1, c))
                      .reshape(1, c).astype(cdt))
        else:
            qs.append(jnp.ones((1, c), cdt))
    stk = lambda xs: jnp.stack(xs)
    return (stk(w0s), stk(b0s), stk(w2s), stk(b2s), stk(w3s), stk(b3s),
            stk(wf0as), stk(bf0as), stk(wf0bs), stk(bf0bs), stk(wf2s),
            stk(bf2s), stk(qs))


@functools.partial(jax.jit, static_argnames=("n", "th", "interpret"))
def _chain_call(x, stacked, n: int, th: int, interpret: bool):
    b, h, w, c = x.shape
    x3 = x[0]
    grid = (h // th,)

    row = lambda f: pl.BlockSpec((1, w, c), f, memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    def up_map(j):
        return lambda i: (jnp.maximum(i * th - j, 0), 0, 0)

    def dn_map(j):
        return lambda i: (jnp.minimum((i + 1) * th + j - 1, h - 1), 0, 0)

    in_specs = [pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [row(up_map(j)) for j in range(n, 0, -1)]
    in_specs += [row(dn_map(j)) for j in range(1, n + 1)]
    in_specs += [full(s.shape) for s in stacked]

    kern = functools.partial(_chain_kernel, th=th, w=w, c=c, n=n)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=n * (2 * h * w * c * c * 8 + 9 * h * w * c * 2),
            bytes_accessed=2 * h * w * c * x.dtype.itemsize
            + n * 8 * c * c * x.dtype.itemsize,
            transcendentals=n * h * w * c * 5,
        ),
        interpret=interpret,
    )(x3, *([x3] * (2 * n)), *stacked)
    return y[None]

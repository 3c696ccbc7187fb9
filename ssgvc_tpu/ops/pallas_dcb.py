"""Fused DepthConvBlock Pallas kernel (TPU).

The 1080p xplane trace (experiments/xplane_stats.py) shows the packed
P-frame loop spending ~2.8 ms/frame in elementwise/copy fusions BETWEEN the
conv matmuls (add_add / multiply_bitcast / generic fusions + layout copies)
— each DepthConvBlock round-trips its activations through HBM several times
while the convs themselves already run at ~82% MXU utilization. This kernel
computes the whole block

    h   = wsilu(x @ W0 + b0)          # 1x1 conv (MXU) + silu(4x)/4 (VPU)
    h   = dw3x3(h) + b2               # depthwise 3x3, zero-padded (VPU)
    u   = x + (h @ W3 + b3)           # 1x1 conv + residual
    f   = wsilu(u @ Wf0 + bf0)        # 1x1 conv C -> 4C
    f   = f[..., :2C] + f[..., 2C:]   # WSiLUChunkAdd
    y   = u + (f @ Wf2 + bf2)         # 1x1 conv 2C -> C + residual
    y  += x                           # optional shortcut
    y  *= q                           # optional per-channel quant step

with ONE read of x and ONE write of y per spatial tile: all intermediates
live in VMEM. Grid is over rows of the (flattened-batch) H axis; the 3x3
depthwise needs one halo row on each side, fetched as two extra (1, W, C)
row-blocks of the same input (clamped index maps + edge masking preserve the
zero-padding semantics of the XLA path).

Counterpart of the torch DepthConvBlock (src/layers/layers.py:43-79); the
math is identical to ssgvc_tpu.layers.blocks.DepthConvBlock up to float
summation order (matmuls accumulate in f32, elementwise runs in f32).
Forward-only: the training path keeps the XLA composition (autodiff).

STATUS: verified bit-accurate in Pallas interpret mode (tests/
test_pallas_dcb.py, max err ~2e-7 fp32). Round-4 hardware validation: the
round-3 compile hang was the fixed th=8 row tile oversubscribing VMEM at
full-profile 1080p shapes (~20MB fp32 intermediates vs ~16MB/core); the
VMEM-budgeted tile picker (_pick_tile) fixed that and the kernel now
COMPILES AND RUNS on the real chip — c=256 inter shapes: 1.495 ms vs
2.665 ms XLA (1.78x), numerics within bf16 tolerance. c=320 initially hit
a Mosaic layout-propagation failure broadcasting a bias slice at column
offset 640; fixed by pre-splitting the ffn weight/bias into two 2C halves
on the host so the kernel never slices mid-array (see ffn section).

Full-model A/B (artifacts/bench_r04_pallas_dcb.json): the 1080p bench with
SSGVC_PALLAS_DCB=1 measures 97.4 fps vs 120.4 fps for the pure-XLA default
— the isolated win does not survive integration, because each pallas_call
is a fusion barrier: XLA can no longer fuse the blocks' neighbors (quant
scales, concat adaptors, checkerboard masking) into the surrounding convs,
and re-layouts appear at every kernel boundary. The flag therefore stays
OPT-IN; the kernel remains the right building block for a future
whole-subgraph fusion (several DCBs + adaptors in ONE pallas_call), which
is where the isolated 1.78x would compound instead of being taxed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wsilu(x):
    # silu(4x)/4 == x * sigmoid(4x)  (layers/blocks.py:31-33)
    return x * jax.nn.sigmoid(4.0 * x)


def _dcb_kernel(x_ref, up_ref, dn_ref, w0_ref, b0_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, wf0a_ref, bf0a_ref, wf0b_ref, bf0b_ref,
                wf2_ref, bf2_ref, q_ref,
                y_ref, *, th: int, w: int, c: int, shortcut: bool):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    cdt = x_ref.dtype

    # ---- assemble (th + 2, w, c) input incl. halo rows -------------------
    xh = jnp.concatenate([up_ref[:], x_ref[:], dn_ref[:]], axis=0)

    # ---- dc_0 (1x1) + wsilu over the halo-extended rows ------------------
    x2d = xh.reshape(((th + 2) * w, c))
    h = jnp.dot(x2d, w0_ref[:], preferred_element_type=jnp.float32)
    h = _wsilu(h + b0_ref[:].astype(jnp.float32))
    h = h.reshape((th + 2, w, c))
    # the 3x3 depthwise zero-pads in h space: mask the halo rows at the
    # frame's H boundary AFTER dc_0+wsilu (a zero x row would still give
    # wsilu(b0) != 0)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    valid = jnp.logical_and(
        jnp.logical_or(i > 0, row_id > 0),
        jnp.logical_or(i < n - 1, row_id < th + 1))
    h = jnp.where(valid, h, 0.0)

    # ---- dc_2: depthwise 3x3, zero padding (VPU) -------------------------
    # rows: 9 shifted multiply-adds; cols: zero-padded shifts of h
    zrow = jnp.zeros((th + 2, 1, c), jnp.float32)
    hl = jnp.concatenate([zrow, h[:, :-1, :]], axis=1)   # shift right (col-1)
    hr = jnp.concatenate([h[:, 1:, :], zrow], axis=1)    # shift left  (col+1)
    w2 = w2_ref[:].astype(jnp.float32)                   # (3, 3, c)
    acc = jnp.zeros((th, w, c), jnp.float32)
    for dy in range(3):
        rs = slice(dy, dy + th)          # static row windows
        acc += hl[rs] * w2[dy, 0]
        acc += h[rs] * w2[dy, 1]
        acc += hr[rs] * w2[dy, 2]
    acc += b2_ref[:].astype(jnp.float32)

    # ---- dc_3 (1x1, rezero tail) + residual ------------------------------
    h2d = acc.reshape((th * w, c))
    u = jnp.dot(h2d.astype(cdt), w3_ref[:], preferred_element_type=jnp.float32)
    u = u + b3_ref[:].astype(jnp.float32)
    x_center = x_ref[:].reshape((th * w, c)).astype(jnp.float32)
    u = u + x_center

    # ---- ffn: 1x1 C->4C, wsilu, chunk-add, 1x1 2C->C + residual ----------
    # the 4C projection arrives pre-split into two (c, 2c) halves (host-side
    # slicing): identical math to wsilu(u @ Wf0)[:, :2C] + [...][:, 2C:], but
    # (a) the peak live intermediate is (th*w, 2C) not (th*w, 4C) — the
    # difference between fitting VMEM and spilling at 1080p full-profile
    # shapes — and (b) Mosaic never has to slice a bias row at a mid-array
    # column offset (broadcast of bf0[:, 2c:] at c=320 → offset 640 fails
    # Mosaic layout propagation on this toolchain)
    uc = u.astype(cdt)
    f = _wsilu(jnp.dot(uc, wf0a_ref[:], preferred_element_type=jnp.float32)
               + bf0a_ref[:].astype(jnp.float32))
    f = f + _wsilu(jnp.dot(uc, wf0b_ref[:], preferred_element_type=jnp.float32)
                   + bf0b_ref[:].astype(jnp.float32))
    y = jnp.dot(f.astype(cdt), wf2_ref[:], preferred_element_type=jnp.float32)
    y = y + bf2_ref[:].astype(jnp.float32) + u

    if shortcut:
        y = y + x_center
    y = y * q_ref[:].astype(jnp.float32)
    y_ref[:] = y.reshape((th, w, c)).astype(cdt)


def _tile_vmem_bytes(th: int, w: int, c: int) -> int:
    """Upper-bound the kernel's live VMEM for one grid step (fp32 bytes):
    halo-extended input + dc_0 activation (th+2 rows), depthwise acc, u,
    the 2C-wide ffn halves (x2 live during the chunk-add), the output tile,
    and the weight blocks (dominated by the (c, 4c) ffn kernel)."""
    rows = 4 * w * c * ((th + 2) * 2 + th * (1 + 1 + 2 * 2 + 1))
    weights = 4 * c * c * (1 + 1 + 4 + 2)
    return rows + weights


def _pick_tile(h: int, w: int, c: int,
               budget: int = 9 * 1024 * 1024) -> int:
    """Largest row-tile dividing h whose working set fits a conservative
    9MB VMEM budget (out of ~16MB/core, leaving room for Mosaic to
    double-buffer the HBM->VMEM row streams). At full-profile 1080p shapes
    (w=240, c=256) this picks th=2 (th=4's estimate is ~11.4MB); the old
    fixed th=8 put ~19MB in flight, the likely cause of the round-3 Mosaic
    compile hang (see module STATUS note). The (th+2)-row halo means dc_0
    computes 2 redundant rows per tile — at th=2 that's 2x dc_0 work, but
    dc_0 is one of six matmuls and correctness/compile-viability wins;
    revisit the budget upward after a successful hardware validation."""
    for th in (16, 8, 4, 2, 1):
        if h % th == 0 and _tile_vmem_bytes(th, w, c) <= budget:
            return th
    return 1


def dcb_fused(x: jnp.ndarray, w0, b0, w2, b2, w3, b3, wf0, bf0, wf2, bf2,
              q: Optional[jnp.ndarray] = None,
              shortcut: bool = False,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """Entry point; ``interpret=None`` auto-enables the Pallas interpreter on
    CPU backends (tests on the virtual CPU mesh)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _dcb_fused(x, w0, b0, w2, b2, w3, b3, wf0, bf0, wf2, bf2,
                      jnp.ones((1, 1, 1, x.shape[-1]), x.dtype)
                      if q is None else q,
                      shortcut=shortcut, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("shortcut", "interpret"))
def _dcb_fused(x: jnp.ndarray, w0, b0, w2, b2, w3, b3, wf0, bf0, wf2, bf2,
               q: jnp.ndarray = None,
               shortcut: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Fused DepthConvBlock forward. x: (B, H, W, C) with the weights in the
    flax layouts ((1,1,I,O) kernels, (O,) biases, depthwise (3,3,1,C)).

    B is folded into the row grid; the depthwise halo is masked at each
    frame's H boundary only when B == 1 (callers pass B == 1 on the
    inference hot path). For B > 1 halo rows would leak across batch
    entries, so this path requires B == 1.
    """
    b, h, w, c = x.shape
    assert b == 1, "dcb_fused: inference path is B=1"
    th = _pick_tile(h, w, c)
    n = h // th
    cdt = x.dtype

    x3 = x[0]
    w0m = w0.reshape(c, c).astype(cdt)
    w3m = w3.reshape(c, c).astype(cdt)
    wf0m = wf0.reshape(c, 4 * c).astype(cdt)
    wf0a, wf0b = wf0m[:, : 2 * c], wf0m[:, 2 * c:]
    bf0v = bf0.reshape(4 * c).astype(cdt)
    bf0a = bf0v[: 2 * c].reshape(1, 2 * c)
    bf0b = bf0v[2 * c:].reshape(1, 2 * c)
    wf2m = wf2.reshape(2 * c, c).astype(cdt)
    w2m = w2.reshape(3, 3, c)
    qv = jnp.broadcast_to(q, (1, 1, 1, c)).reshape(1, c).astype(cdt)

    grid = (n,)
    row = lambda f: pl.BlockSpec((1, w, c), f, memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    kern = functools.partial(_dcb_kernel, th=th, w=w, c=c,
                             shortcut=bool(shortcut))
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row(lambda i: (jnp.maximum(i * th - 1, 0), 0, 0)),
            row(lambda i: (jnp.minimum((i + 1) * th, h - 1), 0, 0)),
            full((c, c)), full((1, c)),          # w0, b0
            full((3, 3, c)), full((1, 1, c)),    # w2, b2
            full((c, c)), full((1, c)),          # w3, b3
            full((c, 2 * c)), full((1, 2 * c)),  # wf0a, bf0a
            full((c, 2 * c)), full((1, 2 * c)),  # wf0b, bf0b
            full((2 * c, c)), full((1, c)),      # wf2, bf2
            full((1, c)),                        # q
        ],
        out_specs=pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c), cdt),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * c * c * (1 + 1 + 4 + 2) + 9 * h * w * c * 2,
            bytes_accessed=2 * h * w * c * 2 + 11 * c * c,
            transcendentals=h * w * c * 5,
        ),
        interpret=interpret,
    )(x3, x3, x3, w0m, b0.reshape(1, c).astype(cdt),
      w2m.astype(cdt), b2.reshape(1, 1, c).astype(cdt),
      w3m, b3.reshape(1, c).astype(cdt),
      wf0a, bf0a, wf0b, bf0b,
      wf2m, bf2.reshape(1, c).astype(cdt), qv)
    return y[None]

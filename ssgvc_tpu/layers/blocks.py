"""NN building blocks of the codec, as flax.linen modules in NHWC.

TPU-first rebuild of the reference block zoo (src/layers/layers.py):
  - wsilu / WSiLUChunkAdd  — silu(4x)/4 activation and its gated-FFN variant
  - DepthConvBlock         — the universal block (1x1 -> WSiLU -> 3x3 dw -> 1x1
                             residual branch + chunked-FFN branch)
  - SubpelConv2x           — conv + 2x pixel shuffle upsample
  - ResidualBlockWithStride2 / ResidualBlockUpsample

Design notes (differences from a naive port):
  * NHWC activations and HWIO kernels — the native TPU conv layout; XLA keeps
    channels in the 128-lane dimension and maps 1x1 convs straight onto the MXU.
  * Explicit submodule names mirror the reference's attribute paths (e.g.
    ``dc_0`` for torch ``dc.0``) so PyTorch checkpoints map 1:1
    (see utils/torch_import.py).
  * A ``dtype`` knob selects the computation dtype (bf16 on TPU for the conv
    stacks); parameters are always stored fp32.
"""

from __future__ import annotations

import os as _os
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pixel import patch_down_conv, patch_up_conv, pixel_shuffle

Dtype = Any


def wsilu(x: jnp.ndarray) -> jnp.ndarray:
    """silu(4x)/4 — the reference's WSiLU activation (src/layers/layers.py:8)."""
    return nn.silu(4.0 * x) * 0.25


def wsilu_chunk_add(x: jnp.ndarray) -> jnp.ndarray:
    """WSiLU then split channels in two and add (src/layers/layers.py:12)."""
    x = wsilu(x)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 + x2


def dw3x3_shiftadd(h: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 conv (padding=1) as 9 shifted multiply-adds.

    Mathematically identical to ``conv(C, 3, padding=1, groups=C)`` with the
    same HWIO (3, 3, 1, C) kernel, but expressed as pad/slice/mul/add — pure
    elementwise data movement with NO convolution op. On TPU this matters:
    XLA lowers feature_group_count=C convs on a path that prefers a different
    tile layout than the surrounding 1x1 MXU matmuls, inserting a layout
    round-trip copy on both sides of every DepthConvBlock (the r04 1080p
    trace shows ~22% of device time in such copies). The shifted-add form
    fuses into the neighboring elementwise epilogues with no layout opinion.
    FLOPs are negligible either way (9*H*W*C vs the block's 1x1 matmuls).

    MEASURED NEGATIVE RESULT (r04 hardware A/B, artifacts/
    bench_r04_shiftadd.json): 99.2 fps vs 125.2 fps for the grouped-conv
    path on the full 1080p bench — the 9 padded-slice reads re-touch the
    activation 9x from HBM and XLA does not CSE them into one sweep, which
    costs more than the conv path's layout copies save. Default stays
    'conv'; kept as an opt-in (SSGVC_DW=shiftadd) correctness-verified
    alternative so future layout work can re-A/B it cheaply. Same lesson
    as the Pallas full-model chains (commits 3995ca0/52fa88c): on this
    model XLA's own conv+fusion schedule beats hand-decomposed forms.
    """
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = h.shape[1], h.shape[2]
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = hp[:, dy:dy + H, dx:dx + W, :] * kernel[dy, dx, 0]
            acc = t if acc is None else acc + t
    return acc + bias


def _dw_shiftadd() -> bool:
    """SSGVC_DW selects the depthwise-3x3 implementation inside
    DepthConvBlock: 'shiftadd' (see dw3x3_shiftadd) or 'conv' (the grouped
    conv op). Read at trace time."""
    return _os.environ.get("SSGVC_DW", "conv") == "shiftadd"


def _int8_mode() -> str:
    """SSGVC_INT8 swaps every groups=1 ``conv()`` site for QuantConv
    (W8A8 quantization, ~2x MXU rate on v5e — artifacts/probe_int8.json).
    "1" = dynamic per-tensor activation scale (a full abs-max reduction
    before every conv — measured SLOWER full-model: the reduction
    serializes against the conv and defeats producer fusion).
    "2" = static per-site scales from :func:`set_int8_scales` (calibrated
    once via the ``int8_calib`` sow collection); quantize is then a pure
    elementwise op with a trace-time constant, fusable into the producer.
    Read at trace time; param trees are identical across all modes."""
    return _os.environ.get("SSGVC_INT8", "0")


# site path ("/".join(module path)) -> calibrated activation abs-max.
# Populated by set_int8_scales(); consulted only under SSGVC_INT8=2.
_INT8_SCALES: dict = {}
# sites already warned about missing mode-2 calibration (once per site)
_INT8_WARNED: set = set()
# sites that have baked a static scale into a traced program (guards
# set_int8_scales against post-trace rescaling that jit caches would ignore)
_INT8_BAKED: set = set()


def set_int8_scales(scales: dict) -> None:
    """Install static activation abs-max per QuantConv site (mode 2).

    ``scales`` maps "/".join(module-path) -> float abs-max, as produced by
    :func:`collect_int8_scales` from a calibration apply. MUST be called
    before the first trace of any function using these sites: jax.jit
    caches traced programs, so scales installed afterwards are ignored by
    already-compiled executables (clear caches or use fresh functions to
    rescale). Enforced softly: installing a *different* scale set after a
    QuantConv site has already baked constants raises."""
    if _INT8_BAKED and dict(_INT8_SCALES) != dict(scales):
        raise RuntimeError(
            "set_int8_scales called with different scales after a QuantConv "
            "site already baked the previous ones into a traced program; "
            "jit caches would silently keep the stale constants. Install "
            "scales before the first trace (or clear jax caches).")
    _INT8_SCALES.clear()
    _INT8_SCALES.update(scales)


def save_int8_scales(path: str) -> None:
    """Persist the installed mode-2 scales as JSON next to a checkpoint.

    Encoder/decoder consistency for the coded path requires BOTH processes
    to bake bit-identical dequant constants; a decoder must load the
    encoder's calibrated scales rather than recalibrate."""
    import json

    with open(path, "w") as f:
        json.dump(_INT8_SCALES, f, indent=0, sort_keys=True)


def load_int8_scales(path: str) -> dict:
    """Load scales saved by :func:`save_int8_scales` and install them."""
    import json

    with open(path) as f:
        scales = {k: float(v) for k, v in json.load(f).items()}
    set_int8_scales(scales)
    return scales


def collect_int8_scales(calib_collection: dict, margin: float = 1.25) -> dict:
    """Flatten a ``mutable=["int8_calib"]`` apply's collection into the
    path->abs-max dict set_int8_scales expects. ``margin`` head-rooms the
    observed abs-max so unseen content clips rarely (clipping degrades
    softly; codec math stays encoder/decoder-consistent since both sides
    bake the same constants)."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(calib_collection)
    out = {}
    for path, val in flat.items():
        # path = (..., module names ..., "absmax"); sow with a reduce_fn
        # stores the reduced scalar directly
        key = "/".join(path[:-1])
        # sites under lax.scan/vmap sow a stacked vector — reduce it
        out[key] = float(jnp.max(jnp.asarray(val))) * margin
    return out


class QuantConv(nn.Module):
    """Drop-in W8A8 int8 conv: same param tree as ``nn.Conv`` (fp32
    ``kernel`` HWIO + ``bias``), quantization is runtime-only.

    Recipe: per-output-channel symmetric weight scales (abs-max/127,
    quantized from the fp32 params at trace time — loop-invariant, XLA
    hoists it out of the frame scan), dynamic per-tensor symmetric
    activation scale (abs-max/127), int8 conv with int32 accumulation
    (``preferred_element_type``), then a fused fp32 dequant+bias epilogue
    cast back to the compute dtype. Deterministic, so the coded path stays
    encoder/decoder-consistent as long as both sides run the same flag.
    v5e MXU peaks: measured int8 speedup 1.16x (1x1 @ model shapes) to
    2.02x (large matmul) — artifacts/probe_int8.json."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: Any
    dtype: Optional[Dtype] = None
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from jax import lax

        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        k = self.param(
            "kernel",
            (nn.initializers.zeros if self.zero_init
             else nn.initializers.lecun_normal()), kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.round(k / s_w).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        site = "/".join(self.scope.path)
        if (self.is_mutable_collection("int8_calib")
                and not self.is_initializing()):
            # calibration pass: record the per-site activation abs-max.
            # Guarded against init (all collections are mutable there) so
            # ``init`` returns only {"params"} and checkpoints stay clean.
            self.sow("int8_calib", "absmax", jnp.max(jnp.abs(xf)),
                     init_fn=lambda: jnp.float32(0.0),
                     reduce_fn=jnp.maximum)
        absmax = _INT8_SCALES.get(site) if _int8_mode() == "2" else None
        if _int8_mode() == "2" and absmax is None and site not in _INT8_WARNED:
            # a mode-2 run with missing calibration silently degrades to the
            # slower dynamic scale — make that visible once per site
            _INT8_WARNED.add(site)
            import warnings

            warnings.warn(
                f"SSGVC_INT8=2 but no calibrated scale for site '{site}' — "
                "falling back to dynamic per-tensor scale (slower). "
                "Run a calibration apply and set_int8_scales() before tracing.",
                stacklevel=2)
        if absmax is not None:
            # static scale: quantize is elementwise with a constant — XLA
            # fuses it into the producer's epilogue (int8 HBM handoff)
            _INT8_BAKED.add(site)
            s_x = jnp.float32(max(absmax, 1e-12) / 127.0)
        else:
            s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        dn = lax.conv_dimension_numbers(x.shape, kshape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            xq, wq, self.strides, self.padding, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (s_x * s_w) + b
        return out.astype(self.dtype or x.dtype)


def conv(features, kernel_size=1, stride=1, padding=0, groups=1, *, name=None,
         dtype=None, zero_init=False):
    """Bare nn.Conv with our conventions. Pass ``name`` in compact modules;
    in ``setup()`` the attribute name takes over (flax forbids explicit names
    there). ``zero_init`` zeroes the kernel (ReZero-style residual tails).
    Under SSGVC_INT8=1 groups=1 sites become QuantConv (same param tree)."""
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    # SSGVC_INT8_SCOPE=3x3 restricts quantization to the 3x3 sites only:
    # the probe (artifacts/probe_int8.json) shows 1.69x on 3x3 convs but
    # only 1.16x on 1x1 @ model shapes, and full-scope static int8 measured
    # SLOWER full-model (110.6 vs 125.7 fps, r05) — the dequant epilogue
    # on every 1x1 breaks more fusion than the MXU rate buys.
    scope_ok = (_os.environ.get("SSGVC_INT8_SCOPE", "all") != "3x3"
                or kernel_size == 3)
    if groups == 1 and _int8_mode() != "0" and scope_ok:
        return QuantConv(
            features=features,
            kernel_size=(kernel_size, kernel_size),
            strides=(stride, stride),
            padding=pad,
            dtype=dtype,
            zero_init=zero_init,
            name=name,
        )
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=pad,
        feature_group_count=groups,
        use_bias=True,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=(nn.initializers.zeros if zero_init
                     else nn.initializers.lecun_normal()),
        name=name,
    )


class PatchDownConv(nn.Module):
    """Fused pixel_unshuffle(r) + 1x1 conv (ops.pixel.patch_down_conv).

    Parameters are stored in the UNFUSED layout — kernel (1, 1, C*r*r, O),
    bias (O,) — exactly what a plain ``conv(out_ch, 1)`` on the unshuffled
    tensor would store, so checkpoints are interchangeable."""

    out_ch: int
    r: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1] * self.r * self.r
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.out_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                          jnp.float32)
        dt = self.dtype or x.dtype
        return patch_down_conv(x.astype(dt), kernel.astype(dt),
                               bias.astype(dt), self.r)


class PatchUpConv(nn.Module):
    """Fused 1x1 conv + pixel_shuffle(r) (ops.pixel.patch_up_conv); stores
    the unfused kernel (1, 1, I, C*r*r) / bias (C*r*r,) layout."""

    out_ch: int          # channels AFTER the shuffle
    r: int
    dtype: Optional[Dtype] = None
    zero_init: bool = False   # ReZero-style residual tails

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        crr = self.out_ch * self.r * self.r
        kernel = self.param("kernel",
                            nn.initializers.zeros if self.zero_init
                            else nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], crr), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (crr,), jnp.float32)
        dt = self.dtype or x.dtype
        return patch_up_conv(x.astype(dt), kernel.astype(dt),
                             bias.astype(dt), self.r)


class Concat1x1(nn.Module):
    """1x1 conv over an IMPLICIT channel concat: ``conv(concat(parts))`` as a
    sum of per-part matmuls — same math, same parameter layout (one kernel
    (1, 1, sum_ch, O) + bias, as nn.Conv would store), but the wide concat
    tensor is never materialized (its relayout copies showed up at ~0.2
    ms/frame in the 1080p trace)."""

    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        total = sum(p.shape[-1] for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, total, self.out_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                          jnp.float32)
        dt = self.dtype or parts[0].dtype
        out = None
        off = 0
        for p in parts:
            k = kernel[0, 0, off:off + p.shape[-1]].astype(dt)
            term = jnp.einsum("bhwc,co->bhwo", p.astype(dt), k)
            out = term if out is None else out + term
            off += p.shape[-1]
        return out + bias.astype(dt)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for a conv child: declares kernel/bias with
    the exact names, shapes, dtypes and initializers ``conv(...)`` would, so
    the Pallas DCB path shares checkpoints with the conv path."""

    kshape: tuple
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            self.kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.kshape[-1],),
                       jnp.float32)
        return k, b


def _pallas_dcb_wanted(x, out_ch: int) -> bool:
    """Runtime gate for the fused Pallas DepthConvBlock (inference only —
    pallas_call has no VJP here; training keeps the conv composition).
    Requires SSGVC_PALLAS_DCB=1 plus TPU-friendly shapes: B=1 (the depthwise
    halo is masked per frame), lane-aligned channels, sublane-aligned W."""
    if _os.environ.get("SSGVC_PALLAS_DCB", "0") != "1":
        return False
    if not isinstance(x, jnp.ndarray) or x.ndim != 4:
        return False
    b, h, w, c_in = x.shape
    return (b == 1 and c_in == out_ch and out_ch % 128 == 0
            and w % 16 == 0 and h >= 2)


def _pallas_chain_wanted(x, out_ch: int, length: int) -> bool:
    """Runtime gate for the CHAINED Pallas DepthConvBlock kernel
    (ops/pallas_dcb_chain.py): SSGVC_PALLAS_DCB=2 runs adaptor-free DCB
    chains as one pallas_call each and leaves every other block on the XLA
    path (so neighbor fusion survives at the remaining boundaries). Shape
    conditions as the single-block gate, plus a feasible VMEM tile plan."""
    if _os.environ.get("SSGVC_PALLAS_DCB", "0") != "2":
        return False
    if not isinstance(x, jnp.ndarray) or x.ndim != 4:
        return False
    b, h, w, c_in = x.shape
    if not (b == 1 and c_in == out_ch and out_ch % 128 == 0
            and w % 16 == 0 and h >= 2):
        return False
    from ..ops.pallas_dcb_chain import _plan_segments

    return bool(_plan_segments(h, w, c_in, length, x.dtype.itemsize))


class DepthConvBlock(nn.Module):
    """Depthwise-conv residual block + gated FFN (src/layers/layers.py:43-79).

    forward: x -> [adaptor] -> (dc(x) + x) -> (ffn(.) + .) [-> + x if shortcut]
             [-> * quant_step]

    ``x`` may be a tuple/list of tensors: the adaptor then acts as
    ``conv1x1(concat(x))`` via :class:`Concat1x1` (identical math + params,
    no materialized concat).
    """

    out_ch: int
    shortcut: bool = False
    force_adaptor: bool = False
    patch_in: int = 0    # >0: input is a RAW frame; the adaptor fuses
    #                      pixel_unshuffle(patch_in) + 1x1 (same param layout)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x, quant_step: Optional[jnp.ndarray] = None,
        return_params: bool = False,
    ) -> jnp.ndarray:
        if return_params:
            # declare this block's params (same names/shapes as both other
            # branches — checkpoints stay interchangeable) and hand them to
            # the caller, which fuses several sibling blocks into ONE
            # chained Pallas kernel (ops/pallas_dcb_chain.py). Only valid
            # for adaptor-free blocks: a chain caller feeds each block the
            # previous block's out_ch-wide output directly.
            assert not (self.patch_in or self.force_adaptor
                        or self.shortcut), \
                "chain fusion requires adaptor-free, shortcut-free blocks"
            c = self.out_ch
            k0, b0 = _ConvParams((1, 1, c, c), name="dc_0")()
            k2, b2 = _ConvParams((3, 3, 1, c), name="dc_2")()
            k3, b3 = _ConvParams((1, 1, c, c), zero_init=True, name="dc_3")()
            kf0, bf0 = _ConvParams((1, 1, c, 4 * c), name="ffn_0")()
            kf2, bf2 = _ConvParams((1, 1, 2 * c, c), zero_init=True,
                                   name="ffn_2")()
            return (k0, b0, k2, b2, k3, b3, kf0, bf0, kf2, bf2)
        if isinstance(x, (tuple, list)):
            # tuple input == implicit concat; an adaptor exists exactly when
            # it would for the concatenated tensor (param-layout parity with
            # torch checkpoints — e.g. plain-variant PriorFusion has NONE)
            if sum(p.shape[-1] for p in x) != self.out_ch or self.force_adaptor:
                x = Concat1x1(self.out_ch, name="adaptor",
                              dtype=self.dtype)(x)
            else:
                x = jnp.concatenate(x, axis=-1)
        elif self.patch_in:
            x = PatchDownConv(self.out_ch, self.patch_in, name="adaptor",
                              dtype=self.dtype)(x)
        elif x.shape[-1] != self.out_ch or self.force_adaptor:
            x = conv(self.out_ch, 1, name="adaptor", dtype=self.dtype)(x)

        # ReZero-style: the LAST conv of each residual branch starts at zero,
        # so a freshly initialized stack is the identity and deep DCB chains
        # do not blow up activations (flax's lecun_normal otherwise compounds
        # ~2x per block and saturates the [0,1] recon clamp, killing all
        # synthesis gradients). Imported torch checkpoints overwrite this.
        if _pallas_dcb_wanted(x, self.out_ch):
            # fused Pallas kernel: one HBM read of x / one write of the
            # output, all intermediates in VMEM (ops/pallas_dcb.py). Param
            # tree is IDENTICAL to the conv path (same names/shapes), so
            # checkpoints are interchangeable and the flag is runtime-only.
            from ..ops.pallas_dcb import dcb_fused

            c = self.out_ch
            k0, b0 = _ConvParams((1, 1, c, c), name="dc_0")()
            k2, b2 = _ConvParams((3, 3, 1, c), name="dc_2")()
            k3, b3 = _ConvParams((1, 1, c, c), zero_init=True, name="dc_3")()
            kf0, bf0 = _ConvParams((1, 1, c, 4 * c), name="ffn_0")()
            kf2, bf2 = _ConvParams((1, 1, 2 * c, c), zero_init=True,
                                   name="ffn_2")()
            q = (None if quant_step is None
                 else jnp.broadcast_to(quant_step, (1, 1, 1, c)))
            return dcb_fused(x, k0, b0, k2, b2, k3, b3, kf0, bf0, kf2, bf2,
                             q=q, shortcut=self.shortcut)

        h = conv(self.out_ch, 1, name="dc_0", dtype=self.dtype)(x)
        h = wsilu(h)
        if _dw_shiftadd():
            # identical params/names to the conv path; checkpoints interchange
            k2, b2 = _ConvParams((3, 3, 1, self.out_ch), name="dc_2")()
            h = dw3x3_shiftadd(h, k2.astype(h.dtype), b2.astype(h.dtype))
        else:
            h = conv(self.out_ch, 3, padding=1, groups=self.out_ch,
                     name="dc_2", dtype=self.dtype)(h)
        h = conv(self.out_ch, 1, name="dc_3", dtype=self.dtype,
                 zero_init=True)(h)
        out = h + x

        f = conv(self.out_ch * 4, 1, name="ffn_0", dtype=self.dtype)(out)
        f = wsilu_chunk_add(f)
        f = conv(self.out_ch, 1, name="ffn_2", dtype=self.dtype,
                 zero_init=True)(f)
        out = f + out

        if self.shortcut:
            out = out + x
        if quant_step is not None:
            out = out * quant_step
        return out


class SubpelConv2x(nn.Module):
    """conv -> PixelShuffle(2) upsample (src/layers/layers.py:22-40)."""

    out_ch: int
    kernel_size: int = 1
    padding: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv(self.out_ch * 4, self.kernel_size, padding=self.padding,
                 name="conv_0", dtype=self.dtype)(x)
        return pixel_shuffle(x, 2)


class ResidualBlockWithStride2(nn.Module):
    """2x2 stride-2 conv then a shortcut DepthConvBlock (src/layers/layers.py:81)."""

    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv(self.out_ch, 2, stride=2, name="down", dtype=self.dtype)(x)
        return DepthConvBlock(self.out_ch, shortcut=True, name="conv",
                              dtype=self.dtype)(x)


class ResidualBlockUpsample(nn.Module):
    """Subpel 2x upsample then a shortcut DepthConvBlock (src/layers/layers.py:93)."""

    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = SubpelConv2x(self.out_ch, 1, name="up", dtype=self.dtype)(x)
        return DepthConvBlock(self.out_ch, shortcut=True, name="conv",
                              dtype=self.dtype)(x)

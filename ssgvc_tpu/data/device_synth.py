"""On-device synthetic clip generator (jit-safe, static shapes).

TPU-native counterpart of ``data.dataset.SyntheticClipDataset`` (the
"smooth"-texture procedural clips used by every RD experiment): the same
moving-textured-rectangle distribution, but expressed as pure ``jax.random``
+ ``jnp`` ops with static shapes so a whole batch is generated ON the chip
inside the jitted training step.

Why: the tunneled TPU runtime pays a fixed host round-trip per dispatched
call, so host-side numpy data generation + per-step transfer caps training
at a few steps/s regardless of model size. Generating the data on device
lets the RD marathon scan hundreds of optimizer steps per device call with
zero input transfer (experiments/rd_tpu.py) — this is the lever that moves
RD training from the 1-core CPU (~2-4 steps/s, rounds 1-3) onto the TPU.

Distribution parity with the numpy generator (same ranges, not bit-equal):
  * background: uniform(0.2, 0.8) at s/8 resolution, nearest-upsampled 8x
  * 1-3 objects; sizes uniform in [s/8, s/3); velocities int in [-4, 4]
  * object texture ("smooth"): two low-frequency sin gradients + one sharp
    vertical edge (the high-frequency content that makes rate respond to QP)
  * mask = union of object rectangles; frames are BT.709 YCbCr in [0, 1]
Dynamic rectangle geometry becomes static-shape math via broadcasted-iota
coordinate grids and ``jnp.where`` compositing (no dynamic slices).

Statistical parity is tested in tests/test_device_synth.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.transforms import rgb2ycbcr

MAX_OBJ = 3


def _object_texture(key, yy_n, xx_n):
    """Smooth sin-gradient texture evaluated on normalized in-rect coords
    ``yy_n``/``xx_n`` (each (H, W, 1), values in [0, 1] inside the rect).
    Mirrors SyntheticClipDataset._object_texture (dataset.py:165-177)."""
    kf, kp, ke = jax.random.split(key, 3)
    f = jax.random.uniform(kf, (2, 3), minval=1.0, maxval=4.0)
    ph = jax.random.uniform(kp, (2, 3), minval=0.0, maxval=2.0 * jnp.pi)
    tex = (0.5 + 0.25 * jnp.sin(2.0 * jnp.pi * f[0] * yy_n + ph[0])
           + 0.25 * jnp.sin(2.0 * jnp.pi * f[1] * xx_n + ph[1]))
    # one sharp vertical edge per object (keeps high-frequency content)
    edge = jax.random.uniform(ke, (), minval=0.1, maxval=0.9)
    tex = jnp.where(xx_n >= edge, tex * 0.5 + 0.25, tex)
    return jnp.clip(tex, 0.0, 1.0)


def _gen_clip(key, size: int, seq_len: int, roi_subset: bool = False):
    """One clip: (frames (T, s, s, 3) YCbCr, masks (T, s, s, 1)).

    ``roi_subset=True`` mimics the Waymo YOLO cache's CLASS FILTER
    (build_cache keeps only {person, car, bus}): every object is painted,
    but only a random subset — always including object 0, so the ROI is
    never empty — contributes to the mask. Masked and unmasked objects are
    drawn from the SAME appearance distribution, so the mask carries
    information the pixels alone cannot provide; with the default
    union-of-objects mask a sufficiently-trained plain codec infers the
    ROI from content and the measured ROI gain of mask conditioning
    collapses (see RESULTS.md, 120k-step 192px run)."""
    s = size
    k_bg, k_n, k_geom, k_roi = jax.random.split(key, 4)
    roi_flags = (jnp.concatenate([
        jnp.ones((1,)),
        jax.random.bernoulli(k_roi, 0.5, (MAX_OBJ - 1,)).astype(jnp.float32)])
        if roi_subset else jnp.ones((MAX_OBJ,)))

    base = jax.random.uniform(k_bg, (s // 8, s // 8, 3),
                              minval=0.2, maxval=0.8)
    background = jnp.repeat(jnp.repeat(base, 8, 0), 8, 1)

    n_obj = jax.random.randint(k_n, (), 1, MAX_OBJ + 1)

    yy = jax.lax.broadcasted_iota(jnp.float32, (s, s, 1), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (s, s, 1), 1)

    def make_obj(k):
        ks, kp, kv, kt = jax.random.split(k, 4)
        wh = jax.random.uniform(ks, (2,), minval=s / 8, maxval=s / 3)
        oh, ow = jnp.floor(wh[0]), jnp.floor(wh[1])
        pos = jax.random.uniform(kp, (2,))
        x0 = jnp.floor(pos[0] * (s - ow))
        y0 = jnp.floor(pos[1] * (s - oh))
        vel = jax.random.randint(kv, (2,), -4, 5).astype(jnp.float32)
        return dict(oh=oh, ow=ow, x0=x0, y0=y0, vx=vel[0], vy=vel[1], key=kt)

    objs = jax.vmap(make_obj)(jax.random.split(k_geom, MAX_OBJ))

    def render_frame(t):
        tf = jnp.float32(t)

        def paint(carry, idx):
            frame, mask = carry
            oh, ow = objs["oh"][idx], objs["ow"][idx]
            x = jnp.clip(objs["x0"][idx] + objs["vx"][idx] * tf, 0, s - ow)
            y = jnp.clip(objs["y0"][idx] + objs["vy"][idx] * tf, 0, s - oh)
            inside = ((yy >= y) & (yy < y + oh) & (xx >= x) & (xx < x + ow)
                      & (idx < n_obj))
            yy_n = jnp.clip((yy - y) / jnp.maximum(oh - 1.0, 1.0), 0.0, 1.0)
            xx_n = jnp.clip((xx - x) / jnp.maximum(ow - 1.0, 1.0), 0.0, 1.0)
            tex = _object_texture(objs["key"][idx], yy_n, xx_n)
            frame = jnp.where(inside, tex, frame)
            mask = jnp.where(inside & (roi_flags[idx] > 0), 1.0, mask)
            return (frame, mask), None

        (frame, mask), _ = jax.lax.scan(
            paint, (background, jnp.zeros((s, s, 1))), jnp.arange(MAX_OBJ))
        return jnp.clip(rgb2ycbcr(frame), 0.0, 1.0), mask

    frames, masks = jax.vmap(render_frame)(jnp.arange(seq_len))
    return frames, masks


@functools.partial(jax.jit,
                   static_argnames=("batch", "size", "seq_len", "roi_subset"))
def synth_batch(key, batch: int = 8, size: int = 128, seq_len: int = 4,
                roi_subset: bool = False):
    """Batch of fresh clips entirely on device.

    Returns {"frames": (B, T, s, s, 3) YCbCr f32, "masks": (B, T, s, s, 1)}
    — the exact batch layout ClipDataModule.train_iter feeds the Trainer.
    ``roi_subset`` selects the class-filter mask mode (see _gen_clip).
    """
    frames, masks = jax.vmap(
        lambda k: _gen_clip(k, size, seq_len, roi_subset))(
        jax.random.split(key, batch))
    return {"frames": frames, "masks": masks}


def sample_qp(key, eval_qps=(8, 20, 32, 44, 56)):
    """Traced QP sampler matching experiments/rd_full.sample_qp: 55% near an
    eval QP (+-3 jitter, dense updates for the rows the RD sweep reads),
    25% uniform over [0, 64) (every per-QP table row trains), 20% at the
    ladder EXTREMES ([0,8) and [56,64)) — the r04 curves compressed to a
    2.1 dB span over QP 8->56 because the end rows of the per-QP gain
    tables trained least; weighting the ends stretches the operating range
    (VERDICT r04 #5)."""
    ku, kc, kj, kr, ke, ks = jax.random.split(key, 6)
    near = (jnp.asarray(eval_qps, jnp.int32)[
                jax.random.randint(kc, (), 0, len(eval_qps))]
            + jax.random.randint(kj, (), -3, 4))
    uniform = jax.random.randint(kr, (), 0, 64)
    lo_end = jax.random.randint(ke, (), 0, 8)
    extreme = jnp.where(jax.random.uniform(ks, ()) < 0.5,
                        lo_end, 63 - lo_end)
    u = jax.random.uniform(ku, ())
    qp = jnp.where(u < 0.55, near, jnp.where(u < 0.80, uniform, extreme))
    return jnp.clip(qp, 0, 63)

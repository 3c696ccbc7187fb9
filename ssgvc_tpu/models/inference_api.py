"""Streaming per-frame inference with a packed DPB carry.

Two ways to run the codec forward:

  * Whole-GOP ``lax.scan`` inside one jit (bench.py, trainer) — the DPB never
    leaves the device; maximal throughput.
  * Streaming per-frame calls (live encode): here each jit boundary
    materializes outputs, and returning the NHWC frame (trailing dim 3) plus
    the feature as separate outputs hits a pathological layout-materialization
    path on tunneled TPU runtimes (~60x slowdown measured on axon). The fix:
    carry ONE packed tensor (1, H/8, W/8, 3*64 + ch_d) holding the
    pixel-unshuffled reconstruction next to the feature.

``pixel_shuffle`` of the first 192 channels recovers the displayable frame;
that runs in a separate tiny jit only when a frame is actually emitted.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ..ops.pixel import pixel_shuffle, pixel_unshuffle
from .dmc import DMC


class StreamingDMC:
    """Per-frame P-codec forward with packed DPB."""

    def __init__(self, model: DMC, params):
        self.model = model
        self.params = params
        c = model.cfg
        self.frame_ch = 3 * c.patch_size * c.patch_size

    def init_dpb(self, i_frame: jnp.ndarray) -> jnp.ndarray:
        """Packed DPB from an I-frame reconstruction (feature slot zeros)."""
        return self._pack(i_frame)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _pack(self, frame):
        c = self.model.cfg
        xu = pixel_unshuffle(frame, c.patch_size)
        feat = jnp.zeros(xu.shape[:3] + (c.ch_d,), xu.dtype)
        return jnp.concatenate([xu, feat], axis=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def unpack_frame(self, packed: jnp.ndarray) -> jnp.ndarray:
        return pixel_shuffle(packed[..., : self.frame_ch],
                             self.model.cfg.patch_size)

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def step(self, frame, mask, qp, packed_dpb, after_i: bool):
        """One P-frame: returns (new_packed_dpb, bpp)."""
        c = self.model.cfg
        prev_frame = pixel_shuffle(packed_dpb[..., : self.frame_ch],
                                   c.patch_size)
        dpb = {"frame": prev_frame, "feature": packed_dpb[..., self.frame_ch:]}
        out = self.model.apply({"params": self.params}, frame, qp, dpb,
                               after_i=after_i, mask=mask, train=False)
        xu = pixel_unshuffle(out["dpb"]["frame"], c.patch_size)
        new_packed = jnp.concatenate([xu, out["dpb"]["feature"]], axis=-1)
        return new_packed, out["bpp"]

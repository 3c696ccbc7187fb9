"""Sequence-level coding sessions: frames <-> container files.

Glues the per-frame codec (coding/codec.py) to the NAL container
(coding/bitstream.py), mirroring the reference's intended file format
(src/utils/stream_helper.py write_sps/write_ip per frame): one I-frame per
GOP, P-frames carrying the reference's per-position qp shift
(index_map/qp_shift, trainer_seg_video_model.py:76-77).
"""

from __future__ import annotations

from typing import BinaryIO, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .bitstream import BitstreamReader, BitstreamWriter
from .codec import VideoCodec

DEFAULT_INDEX_MAP = (0, 1, 0, 2, 0, 2, 0, 2)


class CodingSession:
    """Stateful encode/decode over whole sequences."""

    def __init__(self, codec: VideoCodec,
                 index_map: Sequence[int] = DEFAULT_INDEX_MAP,
                 gop_size: int = 32):
        self.codec = codec
        self.index_map = list(index_map)
        self.gop_size = gop_size

    def _curr_qp(self, qp: int, t: int) -> int:
        fa_idx = self.index_map[t % len(self.index_map)]
        return qp + self.codec.dmc.cfg.qp_shift[fa_idx]

    def encode_sequence(self, f: BinaryIO, frames: np.ndarray, qp: int,
                        masks: Optional[np.ndarray] = None) -> Dict:
        """frames: (T, H, W, 3) YCbCr in [0,1]; masks: (T, H, W, 1) or None.
        Writes SPS + I/P units to ``f``; returns stats (bpp per frame,
        encoder-side reconstructions)."""
        t_total, h, w, _ = frames.shape
        writer = BitstreamWriter(f)
        propagated = self.codec.dmc.cfg.mask_source == "propagated"
        stats: Dict = {"frame_bits": [], "frame_types": [], "recons": [],
                       "masks": []}
        dpb = None
        mask_carry = None
        for t in range(t_total):
            in_gop = t % self.gop_size
            x = jnp.asarray(frames[t])[None]
            if in_gop == 0:
                out = self.codec.dmci_compress(x, qp)
                writer.write_frame(True, h, w, qp, out["bit_stream"])
                feat0 = jnp.zeros((1, h // 8, w // 8, self.codec.dmc.cfg.ch_d),
                                  jnp.float32)
                dpb = {"frame": out["x_hat"], "feature": feat0}
                mask_carry = None
                stats["frame_types"].append("I")
            else:
                curr_qp = self._curr_qp(qp, in_gop)
                after_i = in_gop == 1
                mask = (jnp.asarray(masks[t])[None]
                        if masks is not None else None)
                if propagated and not after_i and mask_carry is not None:
                    # decoder-side chain: only the first P-frame's mask is
                    # transmitted; later frames use the shared prediction
                    # (src/refactor/mask_prop_seg_video_model.py:365-368)
                    mask = mask_carry
                out = self.codec.dmc_compress(x, curr_qp, dpb,
                                              after_i=after_i, mask=mask)
                writer.write_frame(False, h, w, curr_qp, out["bit_stream"])
                dpb = out["dpb"]
                mask_carry = out.get("mask_out")
                if mask_carry is not None:
                    stats["masks"].append(np.asarray(mask_carry[0]))
                stats["frame_types"].append("P")
            stats["frame_bits"].append(len(out["bit_stream"]) * 8)
            stats["recons"].append(np.asarray(out["x_hat"][0]))
        return stats

    def decode_sequence(self, f: BinaryIO,
                        masks: Optional[np.ndarray] = None,
                        return_masks: bool = False):
        """Reads the container; returns decoded frames (each (H, W, 3)).

        ``masks`` (mask_prop only): the out-of-band GT masks — only the
        entries right after an I-frame are consumed (the variant's premise is
        that later P-frame masks need not be transmitted; the decoder
        propagates them). ``return_masks`` additionally returns the
        decoder-side mask chain (logit maps, one per P-frame)."""
        reader = BitstreamReader(f)
        frames: List[np.ndarray] = []
        mask_chain: List[np.ndarray] = []
        dpb = None
        after_i = False
        mask_carry = None
        t = 0
        while True:
            unit = reader.read_frame()
            if unit is None:
                break
            sps = unit["sps"]
            if unit["type"] == "i":
                out = self.codec.dmci_decompress(unit["payload"], sps.height,
                                                 sps.width, unit["qp"])
                feat0 = jnp.zeros(
                    (1, sps.height // 8, sps.width // 8,
                     self.codec.dmc.cfg.ch_d), jnp.float32)
                dpb = {"frame": out["x_hat"], "feature": feat0}
                after_i = True
                mask_carry = None
            else:
                if after_i and masks is not None:
                    mask_carry = jnp.asarray(masks[t])[None]
                out = self.codec.dmc_decompress(unit["payload"], sps.height,
                                                sps.width, unit["qp"], dpb,
                                                after_i=after_i,
                                                mask=mask_carry)
                dpb = out["dpb"]
                mask_carry = out.get("mask_out")
                if mask_carry is not None:
                    mask_chain.append(np.asarray(mask_carry[0]))
                after_i = False
            frames.append(np.asarray(out["x_hat"][0]))
            t += 1
        if return_masks:
            return frames, mask_chain
        return frames

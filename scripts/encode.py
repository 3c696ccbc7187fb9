#!/usr/bin/env python
"""Encode a PNG frame directory into a ssgvc bitstream file.

    python scripts/encode.py --input frames_dir --output out.bin \
        --checkpoint logs/.../checkpoints/last --qp 32 [--gop 32] \
        [--mask-dir seg_cache_dir_for_these_frames]

Frames follow the reference's PNG naming (im00001.png, ...). Produces a
NAL-style container (SPS/I/P) and prints per-frame bpp + PSNR vs the source.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help="orbax TrainState checkpoint (trainer output)")
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--gop", type=int, default=32)
    ap.add_argument("--variant", default="performance")
    ap.add_argument("--profile", default="full",
                    help="model size profile (full | tiny | rd-tiny | rd-mid)"
                         " — must match the checkpoint")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    import numpy as np

    from ssgvc_tpu.coding.codec import VideoCodec
    from ssgvc_tpu.coding.session import CodingSession
    from ssgvc_tpu.config import profile_model_cfgs
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.models.dmci import DMCI
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint
    from ssgvc_tpu.utils.metrics import calc_psnr
    from ssgvc_tpu.utils.transforms import rgb2ycbcr_np
    from ssgvc_tpu.utils.video_io import PNGReader

    ckpt = restore_checkpoint(args.checkpoint)
    params_p = ckpt[0] if isinstance(ckpt, (list, tuple)) else ckpt["params_p"]
    params_i = ckpt[1] if isinstance(ckpt, (list, tuple)) else ckpt["params_i"]

    dmc_cfg, dmci_cfg = profile_model_cfgs(args.profile, args.variant)
    dmc = DMC(dmc_cfg)
    dmci = DMCI(dmci_cfg)
    codec = VideoCodec(dmci, params_i, dmc, params_p)
    session = CodingSession(codec, gop_size=args.gop)

    reader = PNGReader(args.input)
    frames = []
    while True:
        rgb = reader.read_one_frame()
        if rgb is None or (args.max_frames and len(frames) >= args.max_frames):
            break
        frames.append(rgb2ycbcr_np(rgb))
    if not frames:
        raise SystemExit(f"no frames found in {args.input}")
    frames = np.stack(frames)

    with open(args.output, "wb") as f:
        stats = session.encode_sequence(f, frames, qp=args.qp)

    total_bits = sum(stats["frame_bits"])
    pixels = frames.shape[1] * frames.shape[2]
    for t, (bits, ftype, rec) in enumerate(zip(stats["frame_bits"],
                                               stats["frame_types"],
                                               stats["recons"])):
        psnr = calc_psnr(frames[t], rec)
        print(f"frame {t:4d} [{ftype}] {bits:8d} bits "
              f"({bits / pixels:.4f} bpp)  psnr {psnr:.2f}")
    print(f"total: {total_bits} bits, avg "
          f"{total_bits / len(frames) / pixels:.4f} bpp -> {args.output}")


if __name__ == "__main__":
    main()

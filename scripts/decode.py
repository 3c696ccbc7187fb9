#!/usr/bin/env python
"""Decode a ssgvc bitstream file back to PNG frames.

    python scripts/decode.py --input out.bin --output recon_dir \
        --checkpoint logs/.../checkpoints/last [--variant performance]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--variant", default="performance")
    ap.add_argument("--profile", default="full",
                    help="model size profile (full | tiny | rd-tiny | rd-mid)"
                         " — must match the checkpoint")
    args = ap.parse_args()

    from ssgvc_tpu.coding.codec import VideoCodec
    from ssgvc_tpu.coding.session import CodingSession
    from ssgvc_tpu.config import profile_model_cfgs
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.models.dmci import DMCI
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint
    from ssgvc_tpu.utils.transforms import ycbcr2rgb_np
    from ssgvc_tpu.utils.video_io import PNGWriter

    ckpt = restore_checkpoint(args.checkpoint)
    params_p = ckpt[0] if isinstance(ckpt, (list, tuple)) else ckpt["params_p"]
    params_i = ckpt[1] if isinstance(ckpt, (list, tuple)) else ckpt["params_i"]

    dmc_cfg, dmci_cfg = profile_model_cfgs(args.profile, args.variant)
    dmc = DMC(dmc_cfg)
    dmci = DMCI(dmci_cfg)
    codec = VideoCodec(dmci, params_i, dmc, params_p)
    session = CodingSession(codec)

    writer = PNGWriter(args.output)
    with open(args.input, "rb") as f:
        frames = session.decode_sequence(f)
    for ycbcr in frames:
        writer.write_one_frame(ycbcr2rgb_np(ycbcr))
    print(f"decoded {len(frames)} frames -> {args.output}")


if __name__ == "__main__":
    main()

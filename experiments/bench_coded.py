"""REAL-bitstream 1080p benchmark: encode + decode fps through the full
codec (jitted stages + host rANS), one TPU chip.

Measures the 'performance' DMC variant end-to-end: analysis transforms on the
TPU, two checkerboard symbol round-trips per P-frame, C++ rANS on the host
(threaded two-stream decode when ec_part=1), bit-exact decoder verification.

NOTE on --ec-part: the two rANS cursors decode on two std::threads
(native/rans.cpp), but the gain is proportional to available host cores —
on a 1-core host (this image: nproc=1) the split measures flat
(~16 Msym/s either way); budget ~2x decode speedup per extra core.

    python experiments/bench_coded.py [n_frames] [--ec-part] [--skip 0.12]

Prints per-frame enc/dec latency and fps, plus stream sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:]]
    n_frames = int(args[0]) if args and not args[0].startswith("-") else 9
    ec_part = 1 if "--ec-part" in args else 0
    skip = float(args[args.index("--skip") + 1]) if "--skip" in args else 0.0
    json_path = (args[args.index("--json") + 1]
                 if "--json" in args else None)
    packed = "--packed" in args  # same packed_io fast path as bench.py
    label = (args[args.index("--label") + 1] if "--label" in args
             else f"ec_part={ec_part},skip={skip},packed={int(packed)}")
    # --profile rd-tiny --res 256x448 lets the coded pipeline run on the CPU
    # host (provenance recorded in the JSON row); the headline config stays
    # full-size 1080p on the TPU
    profile = (args[args.index("--profile") + 1] if "--profile" in args
               else "full")
    res = (args[args.index("--res") + 1] if "--res" in args else "1088x1920")

    from ssgvc_tpu.config import profile_model_cfgs
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.models.dmci import DMCI
    from ssgvc_tpu.coding.codec import VideoCodec

    h, w = (int(v) for v in res.split("x"))
    dmc_cfg, dmci_cfg = profile_model_cfgs(profile, "performance")
    dmci = DMCI(dmci_cfg)
    dmc = DMC(dmc_cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb0 = {"frame": x0, "feature": jnp.zeros((1, 8, 8, dmc.cfg.ch_d),
                                              jnp.float32)}
    t0 = time.perf_counter()
    pi = dmci.init({"params": rng}, x0, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x0, jnp.int32(0), dpb0,
                  after_i=jnp.bool_(True), mask=mask0, train=False)["params"]
    print(f"[init] params in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    codec = VideoCodec(dmci, pi, dmc, pp, ec_part=ec_part, skip_thres=skip,
                       packed_dmc=packed)
    print(f"[init] CDF tables in {time.perf_counter() - t0:.1f}s", flush=True)

    rngn = np.random.default_rng(1)
    base = rngn.uniform(0.25, 0.75, (1, h, w, 3)).astype(np.float32)
    frames = [jnp.asarray(np.clip(
        base + 0.02 * rngn.standard_normal((1, h, w, 3)).astype(np.float32),
        0, 1)) for _ in range(n_frames)]
    mask = jnp.asarray(
        (rngn.uniform(0, 1, (1, h, w, 1)) > 0.8).astype(np.float32))
    qp = 32

    # ---- encode (first P-frame compiles; steady state measured after) ----
    feat0 = jnp.zeros((1, h // 8, w // 8, dmc.cfg.ch_d), jnp.float32)
    enc_i = codec.dmci_compress(frames[0], qp)
    dpb = {"frame": enc_i["x_hat"], "feature": feat0}
    i_bits = len(enc_i["bit_stream"])

    streams, enc_times, recons = [], [], []
    for t in range(1, n_frames):
        out = codec.dmc_compress(frames[t], qp, dpb, after_i=(t == 1),
                                 mask=mask)
        streams.append(out["bit_stream"])
        enc_times.append(codec.enc_time)
        recons.append(np.asarray(out["x_hat"]))
        dpb = out["dpb"]
        print(f"[enc] frame {t}: {codec.enc_time * 1e3:7.1f} ms  "
              f"{len(out['bit_stream'])} bytes", flush=True)

    # ---- decode ----
    dec_i = codec.dmci_decompress(enc_i["bit_stream"], h, w, qp)
    dpb = {"frame": dec_i["x_hat"], "feature": feat0}
    dec_times = []
    exact = True
    for t in range(1, n_frames):
        out = codec.dmc_decompress(streams[t - 1], h, w, qp, dpb,
                                   after_i=(t == 1))
        dec_times.append(codec.dec_time)
        exact &= bool(np.array_equal(np.asarray(out["x_hat"]),
                                     recons[t - 1]))
        dpb = out["dpb"]
        print(f"[dec] frame {t}: {codec.dec_time * 1e3:7.1f} ms", flush=True)

    # steady state: skip the first (compiling) P-frame
    ss_enc = enc_times[2:] or enc_times
    ss_dec = dec_times[2:] or dec_times
    enc_ms = float(np.median(ss_enc)) * 1e3
    dec_ms = float(np.median(ss_dec)) * 1e3
    p_bits = [len(s) for s in streams]
    print(f"\nconfig: ec_part={ec_part} skip_thres={skip}")
    print(f"1080p REAL coded path ('performance', {n_frames - 1} P-frames):")
    print(f"  encode: {enc_ms:7.1f} ms/frame  ({1e3 / enc_ms:6.1f} fps)")
    print(f"  decode: {dec_ms:7.1f} ms/frame  ({1e3 / dec_ms:6.1f} fps)")
    print(f"  I-frame {i_bits}B; P-frames median {int(np.median(p_bits))}B "
          f"({np.median(p_bits) * 8 / (h * w):.4f} bpp)")
    print(f"  decoder bit-exact vs encoder recon: {exact}")

    if json_path:
        import json
        entry = {
            "backend": jax.default_backend(),
            "profile": profile,
            "resolution": f"{h}x{w}",
            "n_p_frames": n_frames - 1,
            "ec_part": ec_part, "skip_thres": skip, "packed_dmc": packed,
            "enc_ms_per_frame": round(enc_ms, 2),
            "enc_fps": round(1e3 / enc_ms, 2),
            "dec_ms_per_frame": round(dec_ms, 2),
            "dec_fps": round(1e3 / dec_ms, 2),
            "i_frame_bytes": i_bits,
            "p_frame_bytes_median": int(np.median(p_bits)),
            "p_bpp_median": round(float(np.median(p_bits)) * 8 / (h * w), 4),
            "bit_exact": bool(exact),
        }
        data = {}
        if os.path.exists(json_path):
            with open(json_path) as f:
                data = json.load(f)
        data[label] = entry
        os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
        with open(json_path, "w") as f:
            json.dump(data, f, indent=2)
        print(f"wrote {json_path} [{label}]")


if __name__ == "__main__":
    main()

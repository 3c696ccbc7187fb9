"""Benchmark: 1080p P-frame encode+decode throughput on one TPU chip.

Runs the flagship 'performance' DMC forward (full encode + decode transforms,
mask SFT, hyper path, 2-pass checkerboard prior, recon, bit estimation) on
1920x1088 frames in bf16 and reports steady-state frames/s.

The frame loop is a ``lax.scan`` inside ONE jit (the DPB carry never leaves
the device), with ``packed_io``: the whole loop runs in the pixel-unshuffled
domain (a lossless 8x8 permutation — bit-identical codec math, verified by
tests/test_model_parity.py::test_packed_io_matches_raw) and the one batched
ingest permutation IS counted in the timing. 48 frames per call amortize the
tunnel's fixed dispatch+fetch overhead the way a steady streaming encoder
would.

Baseline note: the reference publishes no fps numbers (see BASELINE.md);
DCVC-RT's headline claim is real-time 1080p coding, so we use 30 fps as the
A100-class real-time bar and ALSO report ms/frame and model FLOP/s so the
number can be re-based against any future measured baseline.
vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import jax
import jax.numpy as jnp

MODEL_GFLOP_PER_FRAME = 939.1  # XLA cost analysis of the full forward
V5E_PEAK_TFLOPS = 197.0        # bf16


def _require_backend(timeout_s: int = 180):
    """Probe the backend in a SUBPROCESS under a timeout: a wedged axon
    tunnel hangs backend init inside C++ (GIL held, signals useless) — the
    driver's bench run should get an honest error JSON line, not a hang.

    Fast path: when the axon relay is the configured transport
    (PALLAS_AXON_POOL_IPS set), a closed relay port means PJRT init cannot
    succeed — report in seconds instead of waiting out the watchdog."""
    import os
    import socket
    import subprocess
    import sys

    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        for port in (8082, 8083, 8087):
            s = socket.socket()
            s.settimeout(2)
            try:
                s.connect(("127.0.0.1", port))
                break
            except OSError:
                continue
            finally:
                s.close()
        else:
            raise TimeoutError("axon relay ports 8082/8083/8087 all closed")

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        raise TimeoutError(f"backend init exceeded {timeout_s}s")
    except subprocess.CalledProcessError as e:
        raise TimeoutError(f"backend init failed: {e.stderr[-300:]}")


def _tpu_lock():
    """Exclusive non-blocking lock shared by every TPU entry point in this
    repo: two concurrent axon clients wedge the tunnel permanently (round-2
    postmortem), so refuse to start rather than queue behind another client.
    Returns the held file object (keep a reference) or raises TimeoutError.
    A parent that already serializes clients (scripts/tpu_oneshot.sh) sets
    SSGVC_TPU_LOCK_HELD=1 and this becomes a no-op."""
    import fcntl
    import os

    if os.environ.get("SSGVC_TPU_LOCK_HELD"):
        return None
    f = open("/tmp/ssgvc_tpu_client.lock", "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        f.close()
        raise TimeoutError("another TPU client holds /tmp/ssgvc_tpu_client.lock")
    return f


def main():
    try:
        _lock = _tpu_lock()  # noqa: F841 — held for process lifetime
        _require_backend()
    except TimeoutError as e:
        import socket

        def port_state(port):
            s = socket.socket()
            s.settimeout(2)
            try:
                s.connect(("127.0.0.1", port))
                return "open"
            except OSError as oe:
                return str(oe.strerror or oe)
            finally:
                s.close()

        print(json.dumps({
            "metric": "1080p P-frame enc+dec fps/chip (performance variant, bf16)",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {e}",
            "relay_ports": {p: port_state(p) for p in (8082, 8083, 8087)},
            # context only — NOT this run's measurement: the most recent
            # driver-captured number (BENCH_r01.json) and the builder-measured
            # packed-io result from round 4 (README.md perf table)
            "last_driver_verified_fps": 97.0,
            "last_builder_measured_fps": 125.4,
        }))
        return
    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.ops.pixel import pixel_unshuffle

    # SSGVC_BENCH_VARIANT=plain measures the no-mask baseline so the
    # performance-variant runtime overhead is checkable against the
    # reference's ~14% claim (reference README.md:7); default stays the
    # headline 'performance' config the driver tracks across rounds
    import os as _os
    variant = _os.environ.get("SSGVC_BENCH_VARIANT", "performance")
    cfg = DMCConfig.variant(variant, dtype="bfloat16", packed_io=True)
    model = DMC(cfg)

    # SSGVC_BENCH_BATCH=2 measures two independent 1080p streams per scan
    # step (serving-style chip fill); default stays the single-stream config
    # the driver tracks across rounds
    b = int(_os.environ.get("SSGVC_BENCH_BATCH", "1"))
    h, w = 1088, 1920
    # total in-flight frames stay at the proven b=1 envelope: the batched
    # ingest permutation materializes all n_frames*b packed frames at once,
    # and 96 of them OOMed the 16 GB HBM (r04 b=2 battery run: 19.3 GB
    # padded reshape). fps normalizes by n_frames*b either way.
    n_frames = max(48 // b, 8)
    # unique per-process salt: tunneled runtimes cache (executable, args)
    # results across processes, which would fake the measurement
    key = jax.random.PRNGKey(time.time_ns() % (2**31))
    frames = jax.random.uniform(key, (n_frames, b, h, w, 3), jnp.bfloat16)
    masks = (jax.random.uniform(jax.random.PRNGKey(1), (n_frames, b, h, w, 1))
             > 0.8).astype(jnp.bfloat16)
    dpb0 = {
        "frame": jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3),
                                    jnp.bfloat16),
        "feature": (jax.random.normal(jax.random.PRNGKey(3),
                                      (b, h // 8, w // 8, cfg.ch_d),
                                      jnp.bfloat16) * 0.1),
    }
    qp = jnp.int32(32)

    # init with tiny shapes (params are shape-independent)
    params = model.init(
        jax.random.PRNGKey(4), pixel_unshuffle(jnp.zeros((1, 64, 64, 3)), 8),
        qp,
        {"frame": pixel_unshuffle(jnp.zeros((1, 64, 64, 3)), 8),
         "feature": jnp.zeros((1, 8, 8, cfg.ch_d))},
        after_i=False, mask=pixel_unshuffle(jnp.zeros((1, 64, 64, 1)), 8),
        train=False)["params"]

    # SSGVC_INGEST=scan permutes each frame into the packed domain inside
    # its scan step (in-flight working set drops from all n_frames packed
    # frames to one) instead of the default one batched upfront
    # permutation. Both are counted in the timing. MEASURED (r04,
    # artifacts/bench_r04_iscan.json): 116.0 fps vs 125.2 batched — the
    # per-step transpose does NOT fuse into the first conv and schedules
    # worse than one large batched permutation, so the default stays
    # 'batched'.
    ingest_scan = _os.environ.get("SSGVC_INGEST", "batched") == "scan"

    # SSGVC_INT8=2: static-scale W8A8 — calibrate per-site activation
    # abs-max with ONE small-frame apply (sow collection), bake the scales
    # as trace-time constants so quantize fuses into each producer op.
    # (Mode 1, dynamic scales, measured SLOWER full-model: 104 vs 125.6 fps
    # — the per-conv abs-max reduction defeats fusion.)
    if _os.environ.get("SSGVC_INT8") == "2":
        from ssgvc_tpu.layers import blocks as _blocks
        cal_frame = pixel_unshuffle(
            jax.random.uniform(jax.random.PRNGKey(7), (1, 256, 256, 3),
                               jnp.bfloat16), 8)
        cal_mask = pixel_unshuffle(
            (jax.random.uniform(jax.random.PRNGKey(8), (1, 256, 256, 1))
             > 0.8).astype(jnp.bfloat16), 8)
        cal_dpb = {
            "frame": pixel_unshuffle(
                jax.random.uniform(jax.random.PRNGKey(9), (1, 256, 256, 3),
                                   jnp.bfloat16), 8),
            "feature": jax.random.normal(
                jax.random.PRNGKey(10), (1, 32, 32, cfg.ch_d),
                jnp.bfloat16) * 0.1,
        }
        _, cal = model.apply({"params": params}, cal_frame, qp, cal_dpb,
                             after_i=False, mask=cal_mask, train=False,
                             mutable=["int8_calib"])
        _blocks.set_int8_scales(
            _blocks.collect_int8_scales(cal["int8_calib"]))

    @jax.jit
    def gop(params, frames, masks, qp, dpb):
        dpb = dict(dpb, frame=pixel_unshuffle(dpb["frame"], 8))
        if not ingest_scan:
            # one batched ingest permutation into the packed domain (counted)
            fb = frames.reshape((n_frames * b,) + frames.shape[2:])
            mb = masks.reshape((n_frames * b,) + masks.shape[2:])
            frames = pixel_unshuffle(fb, 8).reshape(
                (n_frames, b, h // 8, w // 8, -1))
            masks = pixel_unshuffle(mb, 8).reshape(
                (n_frames, b, h // 8, w // 8, -1))

        def step(dpb, xs):
            frame, mask = xs
            if ingest_scan:
                frame = pixel_unshuffle(frame, 8)
                mask = pixel_unshuffle(mask, 8)
            out = model.apply({"params": params}, frame, qp, dpb,
                              after_i=False, mask=mask, train=False)
            return out["dpb"], out["bpp"]

        dpb, bpps = jax.lax.scan(step, dpb, (frames, masks))
        return bpps.sum(), dpb["frame"].sum()

    # warmup/compile
    out = gop(params, frames, masks, qp, dpb0)
    float(out[0])

    # Sync by FETCHING a scalar result per rep: on tunneled runtimes
    # block_until_ready does not actually block, and (executable, args)
    # results are cached across processes — fresh inputs + a value fetch are
    # the only honest measurement.
    reps = 4
    times = []
    for r in range(reps):
        start = time.perf_counter()
        out = gop(params, frames, masks, jnp.int32(33 + r), dpb0)
        float(out[0])
        times.append(time.perf_counter() - start)
    fps = n_frames * b / min(times)
    ms_per_frame = min(times) / (n_frames * b) * 1e3
    tflops = MODEL_GFLOP_PER_FRAME * 1e9 * fps / 1e12

    baseline_fps = 30.0  # A100-class real-time bar; reference publishes no fps
    print(json.dumps({
        "metric": f"1080p P-frame enc+dec fps/chip ({variant} variant, bf16)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "ms_per_frame": round(ms_per_frame, 3),
        "model_tflops": round(tflops, 1),
        "mfu_pct_v5e": round(tflops / V5E_PEAK_TFLOPS * 100, 1),
        "baseline_note": "30 fps real-time bar; reference publishes no fps",
    }))


if __name__ == "__main__":
    main()

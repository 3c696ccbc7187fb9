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

DEADLINE DESIGN (r04 postmortem: the driver's run was killed at its timeout
with no JSON line — rc=124). This process is now an ORCHESTRATOR that never
touches the TPU backend itself: it spawns the measurement as a worker
subprocess under a hard deadline (SSGVC_BENCH_DEADLINE, default 480 s) and
ALWAYS prints exactly one JSON line — the worker's measurement if it
finishes, else an honest error line carrying the worker's last phase
breadcrumb (init/data/compile/measure) so a timeout is diagnosable.
A persistent-compile-cache fallback was measured useless on the axon tunnel:
cache-hit first-call 63 s vs no-cache 65 s (the fixed cost is tunnel setup,
not XLA compile), so the deadline, not caching, is the guarantee.

Baseline note: the reference publishes no fps numbers (see BASELINE.md);
DCVC-RT's headline claim is real-time 1080p coding, so we use 30 fps as the
A100-class real-time bar and ALSO report ms/frame and model FLOP/s so the
number can be re-based against any future measured baseline.
vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

MODEL_GFLOP_PER_FRAME = 939.1  # XLA cost analysis of the full forward
V5E_PEAK_TFLOPS = 197.0        # bf16
STATUS_ENV = "SSGVC_BENCH_STATUS"


def _status(msg: str) -> None:
    """Worker phase breadcrumb — last line wins; the orchestrator reports it
    in the error JSON if the deadline fires."""
    path = os.environ.get(STATUS_ENV)
    if path:
        with open(path, "a") as f:
            f.write(f"{time.strftime('%H:%M:%S')} {msg}\n")


def _tpu_lock():
    """Exclusive non-blocking lock shared by every TPU entry point in this
    repo: two concurrent axon clients wedge the tunnel permanently (round-2
    postmortem), so refuse to start rather than queue behind another client.
    Returns the held file object (keep a reference) or raises TimeoutError.
    A parent that already serializes clients (scripts/tpu_oneshot.sh) sets
    SSGVC_TPU_LOCK_HELD=1 and this becomes a no-op."""
    import fcntl

    if os.environ.get("SSGVC_TPU_LOCK_HELD"):
        return None
    f = open("/tmp/ssgvc_tpu_client.lock", "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        f.close()
        raise TimeoutError("another TPU client holds /tmp/ssgvc_tpu_client.lock")
    return f


def _relay_check() -> None:
    """Seconds-fast fail when the axon relay transport is configured but its
    ports are closed — PJRT init cannot succeed, don't burn the deadline."""
    import socket

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    for port in (8082, 8083, 8087):
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", port))
            return
        except OSError:
            continue
        finally:
            s.close()
    raise TimeoutError("axon relay ports 8082/8083/8087 all closed")


def worker() -> None:
    """The actual measurement. Runs in a subprocess under the orchestrator's
    deadline; prints the final JSON line on success."""
    _status("init: importing jax")
    import jax
    import jax.numpy as jnp

    _status("init: backend probe")
    jax.devices()

    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.ops.pixel import pixel_unshuffle

    # SSGVC_BENCH_VARIANT=plain measures the no-mask baseline so the
    # performance-variant runtime overhead is checkable against the
    # reference's ~14% claim (reference README.md:7); default stays the
    # headline 'performance' config the driver tracks across rounds
    variant = os.environ.get("SSGVC_BENCH_VARIANT", "performance")
    cfg = DMCConfig.variant(variant, dtype="bfloat16", packed_io=True)
    model = DMC(cfg)

    # SSGVC_BENCH_BATCH=2 measures two independent 1080p streams per scan
    # step (serving-style chip fill); default stays the single-stream config
    # the driver tracks across rounds
    b = int(os.environ.get("SSGVC_BENCH_BATCH", "1"))
    h, w = 1088, 1920
    # total in-flight frames stay at the proven b=1 envelope: the batched
    # ingest permutation materializes all n_frames*b packed frames at once,
    # and 96 of them OOMed the 16 GB HBM (r04 b=2 battery run: 19.3 GB
    # padded reshape). fps normalizes by n_frames*b either way.
    n_frames = max(48 // b, 8)
    _status("data: generating frames")
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
    ingest_scan = os.environ.get("SSGVC_INGEST", "batched") == "scan"

    # SSGVC_INT8=2: static-scale W8A8 — calibrate per-site activation
    # abs-max with ONE small-frame apply (sow collection), bake the scales
    # as trace-time constants so quantize fuses into each producer op.
    # (Mode 1, dynamic scales, measured SLOWER full-model: 104 vs 125.6 fps
    # — the per-conv abs-max reduction defeats fusion.)
    if os.environ.get("SSGVC_INT8") == "2":
        _status("calib: int8 static-scale calibration")
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
    _status("compile: 1080p gop (first call)")
    out = gop(params, frames, masks, qp, dpb0)
    float(out[0])
    _status("compile: done")

    # Sync by FETCHING a scalar result per rep: on tunneled runtimes
    # block_until_ready does not actually block, and (executable, args)
    # results are cached across processes — fresh inputs + a value fetch are
    # the only honest measurement.
    reps = 4
    times = []
    for r in range(reps):
        _status(f"measure: rep {r + 1}/{reps}")
        start = time.perf_counter()
        out = gop(params, frames, masks, jnp.int32(33 + r), dpb0)
        float(out[0])
        times.append(time.perf_counter() - start)
    fps = n_frames * b / min(times)
    ms_per_frame = min(times) / (n_frames * b) * 1e3
    tflops = MODEL_GFLOP_PER_FRAME * 1e9 * fps / 1e12

    baseline_fps = 30.0  # A100-class real-time bar; reference publishes no fps
    print(json.dumps({
        "metric": f"1080p P-frame enc+dec fps/chip ({variant} variant, bf16"
                  f"{', int8-w8a8' if os.environ.get('SSGVC_INT8') == '2' else ''})",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "ms_per_frame": round(ms_per_frame, 3),
        "model_tflops": round(tflops, 1),
        "mfu_pct_v5e": round(tflops / V5E_PEAK_TFLOPS * 100, 1),
        "baseline_note": "30 fps real-time bar; reference publishes no fps",
    }))


def _error_json(err: str, phase: str) -> str:
    return json.dumps({
        "metric": "1080p P-frame enc+dec fps/chip (performance variant, bf16)",
        "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
        "error": err, "last_phase": phase,
        # context only — NOT this run's measurement: the most recent
        # driver-captured number (BENCH_r01.json) and the builder-measured
        # result from round 5 (README.md perf table)
        "last_driver_verified_fps": 97.0,
    })


def main() -> None:
    """Orchestrate: lock, relay check, then the worker under a hard deadline.
    This process never initializes a JAX backend, so it cannot wedge; it is
    guaranteed to print exactly one JSON line before the deadline."""
    import subprocess
    import tempfile

    deadline = float(os.environ.get("SSGVC_BENCH_DEADLINE", "480"))
    try:
        _lock = _tpu_lock()  # noqa: F841 — held for process lifetime
        _relay_check()
    except TimeoutError as e:
        print(_error_json(f"TPU backend unavailable: {e}", "lock/relay"))
        return

    status_path = tempfile.mktemp(prefix="ssgvc_bench_status_")
    env = dict(os.environ, SSGVC_BENCH_WORKER="1", SSGVC_TPU_LOCK_HELD="1",
               **{STATUS_ENV: status_path})
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=deadline, env=env, capture_output=True, text=True)
    except subprocess.TimeoutExpired as e:
        phase = "unknown"
        if os.path.exists(status_path):
            with open(status_path) as f:
                lines = f.read().strip().splitlines()
            phase = lines[-1] if lines else "no breadcrumb"
        print(_error_json(
            f"worker exceeded {deadline:.0f}s deadline", phase))
        return
    finally:
        if os.path.exists(status_path):
            os.unlink(status_path)

    # relay the worker's LAST stdout line (its JSON) if it produced one
    out_lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode == 0 and out_lines and out_lines[-1].startswith("{"):
        print(out_lines[-1])
    else:
        tail = (proc.stderr or "")[-400:]
        print(_error_json(
            f"worker exited rc={proc.returncode}: {tail}", "worker-exit"))


if __name__ == "__main__":
    if os.environ.get("SSGVC_BENCH_WORKER") == "1":
        worker()
    else:
        main()

"""Capture a jax.profiler trace of the 1080p P-frame loop and print the
per-op time breakdown (via tensorboard_plugin_profile's xplane converter).

    python experiments/trace_bench.py [trace_dir]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def build():
    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.ops.pixel import pixel_unshuffle

    packed = os.environ.get("SSGVC_PACKED", "0") == "1"
    cfg = DMCConfig.variant("performance", dtype="bfloat16",
                            packed_io=packed)
    model = DMC(cfg)
    b, h, w = 1, 1088, 1920
    n_frames = int(os.environ.get("SSGVC_FRAMES", 16))
    key = jax.random.PRNGKey(time.time_ns() % (2**31))
    frames = jax.random.uniform(key, (n_frames, b, h, w, 3), jnp.bfloat16)
    masks = (jax.random.uniform(jax.random.PRNGKey(1), (n_frames, b, h, w, 1))
             > 0.8).astype(jnp.bfloat16)
    dpb0 = {
        "frame": jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3),
                                    jnp.bfloat16),
        "feature": jax.random.normal(jax.random.PRNGKey(3),
                                     (b, h // 8, w // 8, cfg.ch_d),
                                     jnp.bfloat16) * 0.1,
    }
    ex = lambda t, r: pixel_unshuffle(t, r) if packed else t
    params = model.init(
        jax.random.PRNGKey(4), ex(jnp.zeros((1, 64, 64, 3)), 8),
        jnp.int32(32),
        {"frame": ex(jnp.zeros((1, 64, 64, 3)), 8),
         "feature": jnp.zeros((1, 8, 8, cfg.ch_d))},
        after_i=False, mask=ex(jnp.zeros((1, 64, 64, 1)), 8),
        train=False)["params"]

    @jax.jit
    def gop(params, frames, masks, qp, dpb):
        if packed:
            fb = frames.reshape((n_frames * b,) + frames.shape[2:])
            mb = masks.reshape((n_frames * b,) + masks.shape[2:])
            frames = pixel_unshuffle(fb, 8).reshape(
                (n_frames, b, h // 8, w // 8, -1))
            masks = pixel_unshuffle(mb, 8).reshape(
                (n_frames, b, h // 8, w // 8, -1))
            dpb = dict(dpb, frame=pixel_unshuffle(dpb["frame"], 8))

        def step(dpb, xs):
            frame, mask = xs
            out = model.apply({"params": params}, frame, qp, dpb,
                              after_i=False, mask=mask, train=False)
            return out["dpb"], out["bpp"]

        dpb, bpps = jax.lax.scan(step, dpb, (frames, masks))
        return bpps.sum(), dpb["frame"].sum()

    return gop, (params, frames, masks, dpb0)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    gop, (params, frames, masks, dpb0) = build()
    out = gop(params, frames, masks, jnp.int32(32), dpb0)
    float(out[0])

    jax.profiler.start_trace(trace_dir)
    for r in range(2):
        out = gop(params, frames, masks, jnp.int32(40 + r), dpb0)
        float(out[0])
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    xplanes.sort(key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplanes[-1]], tool, {})
            fname = f"/tmp/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fname, mode) as f:
                f.write(data)
            print(f"wrote {fname} ({len(data)} bytes)")
        except Exception as e:  # noqa: BLE001
            print(f"{tool} failed: {e}")


if __name__ == "__main__":
    main()

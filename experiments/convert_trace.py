"""Convert a captured jax.profiler xplane trace into per-op stats.

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python experiments/convert_trace.py [trace_dir]
"""

import glob
import os
import sys


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    xplanes = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True), key=os.path.getmtime)
    if not xplanes:
        print("no xplane files under", trace_dir)
        return
    print("using", xplanes[-1])
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "op_profile", "overview_page"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplanes[-1]], tool, {})
            fname = f"/tmp/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fname, mode) as f:
                f.write(data)
            print(f"wrote {fname} ({len(data)} bytes)")
        except Exception as e:  # noqa: BLE001
            print(f"{tool} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

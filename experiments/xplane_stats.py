"""Per-op time breakdown from a jax.profiler xplane trace, no TF needed.

The tensorboard_plugin_profile converter is broken against this image's
protobuf/TF combo, so this walks the XSpace wire format directly (the same
generic varint/length-delimited walker approach as ssgvc_tpu/data/
waymo_proto.py) and aggregates XEvent durations per event-metadata name on
the device plane.

    python experiments/xplane_stats.py <trace_dir> [top_n]

Prints total device-line time and the top ops/fusions by summed duration.
Schema: tensorflow/tsl/profiler/protobuf/xplane.proto.
"""

import glob
import os
import sys
from collections import defaultdict


def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message's bytes."""
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}  # id -> name
    for fnum, _, val in fields(buf):
        if fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 3:
            lines.append(val)
        elif fnum == 4:  # map<int64, XEventMetadata>
            key, md = None, None
            for f2, _, v2 in fields(val):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    md = v2
            if md is not None:
                mid, mname = key, ""
                for f3, _, v3 in fields(md):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2:
                        mname = v3.decode("utf-8", "replace")
                meta[mid] = mname
    return name, lines, meta


def parse_line(buf):
    name = ""
    events = []
    for fnum, _, val in fields(buf):
        if fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 11 and not name:
            name = val.decode("utf-8", "replace")
        elif fnum == 4:
            mid, dur = 0, 0
            for f2, _, v2 in fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
            events.append((mid, dur))
    return name, events


def categorize(name: str) -> str:
    """Coarse name-based rollup of HLO thunk names.

    Name-based only (a 'multiply_multiply_fusion' may well CONTAIN the
    convolution — XLA names fusions after their root op), so 'fusion' means
    'XLA fusion computation', not 'elementwise-only'. 'loop' is the scan/while
    wrapper whose child ops are ALSO on the line — exclude it from rollups to
    avoid double counting."""
    n = name.lstrip("%")
    if n.startswith(("while", "conditional")):
        return "loop-wrapper"
    if n.startswith(("copy-start", "copy-done")):
        return "async-copy"
    if n.startswith(("copy", "transpose", "reshape", "bitcast")):
        return "layout-copy"
    if n.startswith(("convolution", "dot", "cublas", "custom-call")):
        return "conv/matmul"
    if "fusion" in n:
        return "fusion"
    if n.startswith(("all-reduce", "all-gather", "collective", "reduce-scatter",
                     "ppermute")):
        return "collective"
    return "other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xplanes = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True), key=os.path.getmtime)
    if not xplanes:
        print("no xplane files under", trace_dir)
        return
    buf = open(xplanes[-1], "rb").read()
    print(f"using {xplanes[-1]} ({len(buf)} bytes)")

    for fnum, _, val in fields(buf):
        if fnum != 1:
            continue
        pname, lines, meta = parse_plane(val)
        if not ("TPU" in pname or "/device:" in pname or "GPU" in pname):
            continue
        print(f"\n=== plane: {pname} ===")
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if not events:
                continue
            per_op = defaultdict(lambda: [0, 0])  # name -> [ps, count]
            for mid, dur in events:
                ent = per_op[meta.get(mid, f"id{mid}")]
                ent[0] += dur
                ent[1] += 1
            total_ps = sum(v[0] for v in per_op.values())
            print(f"\n-- line: {lname}: {len(events)} events, "
                  f"{total_ps / 1e9:.3f} ms total")
            cats = defaultdict(lambda: [0, 0])
            for name, (ps, cnt) in per_op.items():
                c = cats[categorize(name)]
                c[0] += ps
                c[1] += cnt
            flat = total_ps - cats.get("loop-wrapper", [0, 0])[0]
            if flat > 0:
                roll = ", ".join(
                    f"{cat} {ps / 1e9:.1f}ms ({ps / flat * 100:.0f}%)"
                    for cat, (ps, _) in sorted(cats.items(),
                                               key=lambda kv: -kv[1][0])
                    if cat != "loop-wrapper")
                print(f"   rollup (loop-wrapper excluded): {roll}")
            ranked = sorted(per_op.items(), key=lambda kv: -kv[1][0])
            for name, (ps, cnt) in ranked[:top_n]:
                print(f"  {ps / 1e9:9.3f} ms  {ps / total_ps * 100:5.1f}%  "
                      f"x{cnt:<6} {name[:100]}")


if __name__ == "__main__":
    main()

"""XLA compiler-flag sweep for the 1080p packed P-frame loop.

The trace (experiments/xplane_stats.py) shows the loop at ~7.7 ms/frame
device time: ~5.6 ms conv/fusion compute (≈86% of the bf16 FLOP roofline)
and ~1.3 ms of layout copies XLA inserts between fusions. Flags that change
fusion depth / scoped-VMEM budget / scheduling can move the copy share, so
sweep them empirically: each combo runs bench.py in a fresh subprocess
(XLA_FLAGS is read once at backend init).

    python experiments/bench_flags.py            # full sweep
    python experiments/bench_flags.py baseline vmem64   # named combos only
"""

import json
import os
import subprocess
import sys

COMBOS = {
    "baseline": "",
    "vmem64": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_lhs": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "flash_fusion": "--xla_tpu_enable_flash_fusion=true",
    "async_ag": "--xla_tpu_enable_async_all_gather=true",
    "loop_opt": "--xla_tpu_enable_memory_bound_loop_optimizer=true",
    "vmem64+loop": ("--xla_tpu_scoped_vmem_limit_kib=65536 "
                    "--xla_tpu_enable_memory_bound_loop_optimizer=true"),
}


def main():
    names = sys.argv[1:] or list(COMBOS)
    results = {}
    for name in names:
        flags = COMBOS[name]
        env = dict(os.environ)
        if flags:
            # r05 finding: client-side XLA_FLAGS are rejected at parse by the
            # axon relay, but LIBTPU_INIT_ARGS DOES reach the server-side
            # runtime (64 MiB scoped-vmem measurably changed the schedule)
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
        try:
            out = subprocess.run(
                [sys.executable, "bench.py"], env=env, capture_output=True,
                text=True, timeout=900,
                cwd=os.path.join(os.path.dirname(__file__), ".."))
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            fps = json.loads(line)["value"]
        except Exception as e:  # noqa: BLE001 - sweep keeps going
            fps = None
            print(f"{name}: FAILED ({e}); stderr tail: "
                  f"{out.stderr[-300:] if 'out' in dir() else ''}")
        results[name] = fps
        print(f"{name:14s} {flags:60s} -> {fps}")
    best = max((v, k) for k, v in results.items() if v)
    print(f"\nbest: {best[1]} at {best[0]} fps")


if __name__ == "__main__":
    main()

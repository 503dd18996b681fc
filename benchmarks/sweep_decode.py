"""Unattended decode-perf sweep on the real chip: runs bench.py across
storage/outlier configs (each with its own fresh-subprocess fp16 baseline,
the honest protocol from NOTES_ROUND2) and appends JSON lines to
benchmarks/sweep_results.jsonl.

Tunnel-outage-aware: each config gets a hard timeout; a timed-out or
failed config is recorded and the sweep moves on. Run it in the
background and read the results file.

  python benchmarks/sweep_decode.py [--ctx 32768] [--steps 16] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

CONFIGS = [
    # (tag, env overrides) — each inherits BENCH_CTX/BENCH_STEPS from args
    ("int4_4b_postk_kch", {"BENCH_CODES": "int4", "BENCH_BITS": "4",
                           "BENCH_POSTROPE": "1", "BENCH_KOUT": "channels"}),
    ("int4_3b_postk_kch", {"BENCH_CODES": "int4", "BENCH_BITS": "3",
                           "BENCH_POSTROPE": "1", "BENCH_KOUT": "channels"}),
    ("int4_4b_postk_slots", {"BENCH_CODES": "int4", "BENCH_BITS": "4",
                             "BENCH_POSTROPE": "1", "BENCH_KOUT": "slots"}),
    ("nuq3_kch", {"BENCH_KOUT": "channels"}),
    ("nuq3_slots", {}),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-config hard timeout (s)")
    ap.add_argument("--quick", action="store_true",
                    help="only the first two configs")
    ap.add_argument("--out", default="benchmarks/sweep_results.jsonl")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.join(root, "bench.py")
    configs = CONFIGS[:2] if args.quick else CONFIGS

    for tag, env_over in configs:
        env = dict(os.environ)
        env.update({"BENCH_CTX": str(args.ctx), "BENCH_STEPS": str(args.steps),
                    "BENCH_BATCH": str(args.batch)})
        env.update(env_over)
        t0 = time.time()
        rec = {"tag": tag, "ctx": args.ctx, "batch": args.batch,
               "env": env_over}
        try:
            r = subprocess.run(
                [sys.executable, bench], env=env, capture_output=True,
                text=True, timeout=args.timeout, cwd=root,
            )
            for line in (r.stdout + r.stderr).splitlines():
                if line.startswith("{"):
                    try:
                        rec.update(json.loads(line))
                    except json.JSONDecodeError:
                        pass
            rec["rc"] = r.returncode
            if "value" not in rec:
                rec["stderr_tail"] = r.stderr[-1500:]
        except subprocess.TimeoutExpired:
            rec["rc"] = "timeout"
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(os.path.join(root, args.out), "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

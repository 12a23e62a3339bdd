"""One-command benchmark ladder: every headline config as one JSON array.

Runs the measured configurations from PERFORMANCE.md in sequence on the
attached chip and prints a JSON list (one object per row, same fields as
bench.py). Use BENCH_LADDER=quick for the 256px rows only.

Usage: python scripts/bench_ladder.py [> ladder.json]
"""

import json
import os
import subprocess
import sys

ROWS = [
    # (env overrides, description)
    ({"BENCH_RES": "256", "BENCH_BATCH": "32"}, "large@256 b32 (headline)"),
    ({"BENCH_RES": "512", "BENCH_BATCH": "8"}, "large@512 b8"),
    ({"BENCH_RES": "1024", "BENCH_BATCH": "2"}, "large@1024 b2"),
]


def main():
    quick = os.environ.get("BENCH_LADDER") == "quick"
    rows = ROWS[:1] if quick else ROWS
    out = []
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for env_over, desc in rows:
        env = dict(os.environ, **env_over)
        print(f"[ladder] running {desc} ...", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py")],
            env=env, capture_output=True, text=True)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if line is None:
            print(f"[ladder] {desc} FAILED:\n{proc.stderr[-2000:]}",
                  file=sys.stderr, flush=True)
            continue
        rec = json.loads(line)
        rec["config"] = desc
        out.append(rec)
        print(f"[ladder] {desc}: {rec['value']} {rec['unit']}",
              file=sys.stderr, flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

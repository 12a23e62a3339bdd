#!/usr/bin/env python
"""Serving load test: N concurrent HTTP clients posting npy batches.

Reproduces the PERFORMANCE.md "Serving throughput" protocol (6 clients x
batch-4 uint8 /reconstruct?dtype=uint8 requests, fixed steady-state window)
so serving configurations (bf16 vs --quantize int8) are comparable and
re-runnable. Pure numpy + stdlib HTTP — imports no jax, so it can run as the
client against the single TPU server process.

Usage:
  python scripts/serve_load_test.py --url http://127.0.0.1:8471 \
      --clients 6 --batch 4 --resolution 256 --seconds 40 [--name tag]
"""

from __future__ import annotations

import argparse
import io
import json
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np


def client_loop(url: str, payload: bytes, batch: int, stop_at: float,
                counts: list, lock: threading.Lock, errors: list) -> None:
    images = 0
    lat = []
    while time.time() < stop_at:
        t0 = time.perf_counter()
        try:
            req = urllib.request.Request(
                url + "/reconstruct?dtype=uint8", data=payload,
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=120) as r:
                out = np.load(io.BytesIO(r.read()), allow_pickle=False)
            assert out.shape[0] == batch
            images += batch
            lat.append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(f"{type(e).__name__}: {e}")
            time.sleep(0.5)
    with lock:
        counts.append((images, lat))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8471")
    p.add_argument("--clients", type=int, default=6)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--seconds", type=float, default=40.0)
    p.add_argument("--warmup_seconds", type=float, default=10.0)
    p.add_argument("--name", default=None,
                   help="record the result to RESULTS/<name>.json")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (args.batch, args.resolution,
                                  args.resolution, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.save(buf, batch)
    payload = buf.getvalue()

    # Warmup window (compiles, queue fill) excluded from the measurement.
    stop = time.time() + args.warmup_seconds
    werr: list = []
    wl = threading.Lock()
    wthreads = [threading.Thread(target=client_loop, args=(
        args.url, payload, args.batch, stop, [], wl, werr))
        for _ in range(args.clients)]
    for t in wthreads:
        t.start()
    for t in wthreads:
        t.join()
    if werr:
        print(f"[load_test] warmup errors ({len(werr)}): {werr[0]}",
              file=sys.stderr)

    counts: list = []
    errors: list = []
    lock = threading.Lock()
    stop = time.time() + args.seconds
    t0 = time.time()
    threads = [threading.Thread(target=client_loop, args=(
        args.url, payload, args.batch, stop, counts, lock, errors))
        for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    images = sum(c for c, _ in counts)
    lats = sorted(x for _, ls in counts for x in ls)
    result = {
        "clients": args.clients, "batch": args.batch,
        "resolution": args.resolution, "window_s": round(wall, 2),
        "images": images,
        "images_per_sec": round(images / wall, 2) if wall else 0.0,
        "p50_ms": round(1e3 * lats[len(lats) // 2], 1) if lats else None,
        "p95_ms": round(1e3 * lats[int(len(lats) * 0.95)], 1) if lats else None,
        "errors": len(errors),
    }
    print(json.dumps(result, indent=1))
    if args.name:
        subprocess.run([sys.executable, "scripts/record_run.py",
                        "--name", args.name, "--json", json.dumps(result)],
                       check=False)


if __name__ == "__main__":
    main()

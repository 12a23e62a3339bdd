"""Batched inference serving for TransVAE (TPU-native, stdlib-only).

The reference has no serving story (scripts only); this provides the
production path the rebuild is meant for: a threaded HTTP server with
**dynamic batching** in front of jit-compiled encode/decode/reconstruct
functions.

TPU design notes:
- XLA compiles one program per input shape, so requests are bucketed to
  power-of-two batch sizes (padded with zeros, unpadded on reply) and served
  from a per-(op, batch, H, W) compiled-function cache — a handful of
  programs total, no recompiles in steady state.
- A single dispatcher thread owns the device: HTTP worker threads enqueue
  (request, event) pairs; the dispatcher drains the queue, groups compatible
  requests within a small window, and runs ONE device program per group —
  device-level batching without cross-request head-of-line blocking on
  compile.
- Payloads are raw ``.npy`` (np.save bytes) in/out: zero-copy-ish, no extra
  dependencies, exact dtypes.

Endpoints:
  GET  /healthz      → JSON status (device, variant, compiled programs)
  POST /encode       → npy [B,H,W,3] in [0,1] → npy mu [B,h,w,D]
  POST /decode       → npy [B,h,w,D] latents  → npy images [B,H,W,3] in [0,1]
  POST /reconstruct  → npy [B,H,W,3] → npy images [B,H,W,3] (encode→mu→decode)
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int, cap: int) -> int:
    p = 1
    while p < n and p < cap:
        p *= 2
    return min(p, cap)


class InferenceEngine:
    """Jit cache + dynamic batcher around one TransVAE model."""

    def __init__(self, model, params: Any, max_batch: int = 32,
                 batch_window_ms: float = 3.0):
        self.model = model
        self.params = params
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1e3
        self._compiled: dict[tuple, Any] = {}
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- device functions -------------------------------------------------
    def _fn(self, op: str):
        model = self.model
        if op == "encode":
            def f(params, x):
                mu, _ = model.apply({"params": params}, x,
                                    method=lambda m, x: m.encode(x))
                return mu
        elif op == "decode":
            def f(params, z):
                logits = model.apply({"params": params}, z,
                                     method=lambda m, z: m.decode(z))
                return jax.nn.sigmoid(logits.astype(jnp.float32))
        elif op == "reconstruct":
            def f(params, x):
                recon, _, _ = model.apply({"params": params}, x, sample=False)
                return jax.nn.sigmoid(recon.astype(jnp.float32))
        else:
            raise ValueError(op)
        return f

    def _compiled_for(self, op: str, shape: tuple) -> Any:
        key = (op,) + shape
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._fn(op))
        return self._compiled[key]

    def run(self, op: str, arr: np.ndarray) -> np.ndarray:
        """Run one already-batched array through the device (pads to the
        bucketed batch size)."""
        b = arr.shape[0]
        bb = _next_pow2(b, self.max_batch)
        if bb < b:  # request larger than max_batch: split
            parts = [self.run(op, arr[i:i + self.max_batch])
                     for i in range(0, b, self.max_batch)]
            return np.concatenate(parts, axis=0)
        if bb != b:
            pad = np.zeros((bb - b,) + arr.shape[1:], arr.dtype)
            arr = np.concatenate([arr, pad], axis=0)
        x = jnp.asarray(arr, dtype=self.model.config.compute_dtype)
        out = np.asarray(self._compiled_for(op, x.shape)(self.params, x),
                         dtype=np.float32)
        return out[:b]

    # -- dynamic batching -------------------------------------------------
    def submit(self, op: str, arr: np.ndarray) -> np.ndarray:
        """Thread-safe: enqueue a request and wait for its result. Requests
        with the same (op, item-shape) arriving within the batch window run
        as one device program."""
        if self._thread is None:
            return self.run(op, arr)  # dispatcher not started: direct path
        ev = threading.Event()
        slot: dict = {}
        self._queue.put((op, arr, ev, slot))
        ev.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def start(self):
        self._stop.clear()  # allow stop() -> start() restart
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            group = [first]
            op, arr0 = first[0], first[1]
            deadline = time.monotonic() + self.batch_window_s
            total = arr0.shape[0]
            while total < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if (nxt[0] == op and nxt[1].shape[1:] == arr0.shape[1:]
                        and total + nxt[1].shape[0] <= self.max_batch):
                    group.append(nxt)
                    total += nxt[1].shape[0]
                else:
                    self._queue.put(nxt)  # incompatible: next round
                    break
            try:
                batch = np.concatenate([g[1] for g in group], axis=0)
                out = self.run(op, batch)
                ofs = 0
                for _, a, ev, slot in group:
                    slot["result"] = out[ofs:ofs + a.shape[0]]
                    ofs += a.shape[0]
                    ev.set()
            except Exception as e:  # noqa: BLE001 — report to all waiters
                for _, _, ev, slot in group:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    ev.set()

    def stats(self) -> dict:
        return {
            "device": str(jax.devices()[0]),
            "variant": self.model.config.variant,
            "compiled_programs": sorted(
                "/".join(map(str, k)) for k in self._compiled),
            "max_batch": self.max_batch,
        }


def make_http_server(engine: InferenceEngine, host: str = "127.0.0.1",
                     port: int = 8471):
    """Build (not start) a ThreadingHTTPServer bound to the engine."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, json.dumps(engine.stats()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            op = self.path.strip("/")
            if op not in ("encode", "decode", "reconstruct"):
                self._send(404, b"unknown op", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                arr = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                out = engine.submit(op, np.asarray(arr, np.float32))
                buf = io.BytesIO()
                np.save(buf, out)
                self._send(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:  # noqa: BLE001
                self._send(400, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")

    return ThreadingHTTPServer((host, port), Handler)

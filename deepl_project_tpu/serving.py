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


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the bounded request queue is full."""


class InferenceEngine:
    """Jit cache + dynamic batcher around one TransVAE model."""

    def __init__(self, model, params: Any, max_batch: int = 32,
                 batch_window_ms: float = 3.0, max_queue: int = 256,
                 mesh=None, param_sharding: str = "tensor"):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            # Multi-chip serving: shard params over the mesh ('tensor' for
            # latency — TP collectives ride ICI; 'replicate' for pure
            # data-parallel throughput). GSPMD propagates through the jitted
            # ops from the param shardings; batches are placed in run_async.
            from .parallel.sharding import shard_params

            params = shard_params(mesh, params, param_sharding)
        self.params = params
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1e3
        self._compiled: dict[tuple, Any] = {}
        # Bounded: under overload, fail fast (HTTP 503) instead of growing an
        # unbounded backlog whose tail latencies blow every deadline anyway.
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- device functions -------------------------------------------------
    def _fn(self, op: str, out_dtype: str | None, in_uint8: bool):
        model = self.model
        compute = self.model.config.compute_dtype

        def prep(x):
            # uint8 request payloads upload half the bytes of bf16 (and 1/4
            # of fp32); the [0,1] scaling happens on device.
            if in_uint8:
                return x.astype(compute) * jnp.asarray(1.0 / 255.0, compute)
            return x

        def finish(y):
            # On-device output encoding: the device->host fetch (PCIe, or the
            # dev tunnel) then moves 1/4 (uint8) or 1/2 (float16) the bytes —
            # quantizing after the fetch saves nothing.
            if out_dtype == "uint8":
                return jnp.clip(jnp.round(y * 255.0), 0, 255).astype(jnp.uint8)
            if out_dtype == "float16":
                return y.astype(jnp.float16)
            return y

        if op == "encode":
            def f(params, x):
                mu, _ = model.apply({"params": params}, prep(x),
                                    method=lambda m, x: m.encode(x))
                return (mu.astype(jnp.float16) if out_dtype == "float16"
                        else mu.astype(jnp.float32))
        elif op == "decode":
            def f(params, z):
                logits = model.apply({"params": params}, prep(z),
                                     method=lambda m, z: m.decode(z))
                return finish(jax.nn.sigmoid(logits.astype(jnp.float32)))
        elif op == "reconstruct":
            def f(params, x):
                recon, _, _ = model.apply({"params": params}, prep(x),
                                          sample=False)
                return finish(jax.nn.sigmoid(recon.astype(jnp.float32)))
        else:
            raise ValueError(op)
        return f

    def _compiled_for(self, op: str, shape: tuple, out_dtype: str | None,
                      in_uint8: bool) -> Any:
        key = (op, out_dtype, in_uint8) + shape
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._fn(op, out_dtype, in_uint8))
        return self._compiled[key]

    def run_async(self, op: str, arr: np.ndarray,
                  out_dtype: str | None = None):
        """Dispatch one bucketed batch; returns the (still-materializing)
        device array — JAX dispatch is async, so the caller can overlap the
        next dispatch with this result's device->host fetch."""
        b = arr.shape[0]
        bb = _next_pow2(b, self.max_batch)
        assert bb >= b, (b, self.max_batch)
        if bb != b:
            pad = np.zeros((bb - b,) + arr.shape[1:], arr.dtype)
            arr = np.concatenate([arr, pad], axis=0)
        in_uint8 = arr.dtype == np.uint8
        x = (jnp.asarray(arr) if in_uint8
             else jnp.asarray(arr, dtype=self.model.config.compute_dtype))
        if self.mesh is not None:
            x = jax.device_put(x, self._batch_sharding(x.shape[0]))
            with jax.set_mesh(self.mesh):
                return self._compiled_for(op, x.shape, out_dtype, in_uint8)(
                    self.params, x)
        return self._compiled_for(op, x.shape, out_dtype, in_uint8)(
            self.params, x)

    def _batch_sharding(self, b: int):
        """Batch placement on the serving mesh: shard over 'data' when the
        bucketed batch divides it (data-parallel fan-out), else replicate
        (model-parallel-only compute, e.g. a single giant-variant request)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)
                      ).get("data", 1)
        if n_data > 1 and b % n_data == 0:
            return NamedSharding(self.mesh, P("data"))
        return NamedSharding(self.mesh, P())

    def run(self, op: str, arr: np.ndarray,
            out_dtype: str | None = None) -> np.ndarray:
        """Run one already-batched array through the device (pads to the
        bucketed batch size; splits when larger than max_batch)."""
        b = arr.shape[0]
        if b > self.max_batch:
            parts = [self.run(op, arr[i:i + self.max_batch], out_dtype)
                     for i in range(0, b, self.max_batch)]
            return np.concatenate(parts, axis=0)
        return np.asarray(self.run_async(op, arr, out_dtype))[:b]

    # -- dynamic batching -------------------------------------------------
    def submit(self, op: str, arr: np.ndarray,
               out_dtype: str | None = None) -> np.ndarray:
        """Thread-safe: enqueue a request and wait for its result. Requests
        with the same (op, out_dtype, item-shape) arriving within the batch
        window run as one device program."""
        if self._thread is None:
            return self.run(op, arr, out_dtype)  # dispatcher not started
        if arr.shape[0] > self.max_batch:  # oversized request: chunk it
            return np.concatenate(
                [self.submit(op, arr[i:i + self.max_batch], out_dtype)
                 for i in range(0, arr.shape[0], self.max_batch)], axis=0)
        ev = threading.Event()
        slot: dict = {}
        try:
            self._queue.put_nowait(((op, out_dtype), arr, ev, slot))
        except queue.Full:
            raise EngineOverloaded(
                f"request queue full ({self._queue.maxsize})") from None
        ev.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def start(self):
        self._stop.clear()  # allow stop() -> start() restart
        # Bounded in-flight pipeline: the dispatcher keeps dispatching device
        # programs while the fetch thread drains completed groups to waiters
        # — device compute overlaps the device->host copies.
        self._fetch_q = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._fetch_thread = threading.Thread(target=self._fetch_loop,
                                              daemon=True)
        self._thread.start()
        self._fetch_thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        if getattr(self, "_fetch_thread", None) is not None:
            self._fetch_q.put(None)
            self._fetch_thread.join(timeout=5)
            self._fetch_thread = None
        # Fail any requests still queued (incl. ones enqueued during the
        # shutdown race) — otherwise their submit() callers block forever.
        # A request carried between groups is failed by the dispatcher itself
        # on loop exit (see _dispatch_loop's tail).
        while True:
            try:
                _, _, ev, slot = self._queue.get_nowait()
            except queue.Empty:
                break
            slot["error"] = "engine stopped"
            ev.set()

    def _dispatch_loop(self):
        carried = None  # incompatible request held for the NEXT round —
        # re-queueing at the tail would let a sustained stream of compatible
        # requests starve it indefinitely.
        while not self._stop.is_set():
            if carried is not None:
                first, carried = carried, None
            else:
                try:
                    first = self._queue.get(timeout=0.1)
                except queue.Empty:
                    continue
            group = [first]
            (op, out_dtype), arr0 = first[0], first[1]
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
                if (nxt[0] == (op, out_dtype)
                        and nxt[1].shape[1:] == arr0.shape[1:]
                        and nxt[1].dtype == arr0.dtype
                        and total + nxt[1].shape[0] <= self.max_batch):
                    group.append(nxt)
                    total += nxt[1].shape[0]
                else:
                    carried = nxt  # heads the next group
                    break
            try:
                batch = np.concatenate([g[1] for g in group], axis=0)
                dev_out = self.run_async(op, batch, out_dtype)
                self._fetch_q.put((dev_out, batch.shape[0], group))
            except Exception as e:  # noqa: BLE001 — report to all waiters
                for _, _, ev, slot in group:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    ev.set()
        if carried is not None:  # stop() raced a carried request: fail it
            carried[3]["error"] = "engine stopped"
            carried[2].set()

    def _fetch_loop(self):
        while True:
            item = self._fetch_q.get()
            if item is None:
                return
            dev_out, nreal, group = item
            try:
                out = np.asarray(dev_out)[:nreal]
                ofs = 0
                for _, a, ev, slot in group:
                    slot["result"] = out[ofs:ofs + a.shape[0]]
                    ofs += a.shape[0]
                    ev.set()
            except Exception as e:  # noqa: BLE001
                for _, _, ev, slot in group:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    ev.set()

    def warmup(self, resolution: int, ops: tuple = ("encode", "decode",
                                                     "reconstruct"),
               dtypes: tuple = (None,), uint8_inputs: bool = False):
        """Pre-compile the full power-of-two batch-bucket ladder for each op
        so steady-state traffic never hits an XLA compile. Without this, the
        first grouped batch of each size stalls the dispatcher for the
        compile (minutes for big variants) — measured as a 100x throughput
        collapse in a cold load test."""
        cfg = self.model.config
        f = cfg.compression_ratio
        if None not in dtypes:  # default-encoding traffic must be warm too
            dtypes = (None,) + tuple(dtypes)
        b = 1
        buckets = []
        while b <= self.max_batch:
            buckets.append(b)
            b *= 2
        if buckets[-1] != self.max_batch:
            # Non-power-of-two max_batch is itself a live bucket (_next_pow2
            # caps there) — warm it too or the first full group compiles live.
            buckets.append(self.max_batch)
        for op in ops:
            for bb in buckets:
                if op == "decode":
                    arr = np.zeros((bb, resolution // f, resolution // f,
                                    cfg.latent_dim), np.float32)
                elif uint8_inputs:
                    arr = np.zeros((bb, resolution, resolution, 3), np.uint8)
                else:
                    arr = np.zeros((bb, resolution, resolution, 3),
                                   np.float32)
                for dt in dtypes:
                    if op == "encode" and dt == "uint8":
                        continue  # handler rejects this combination
                    self.run(op, arr, dt)

    def stats(self) -> dict:
        return {
            "device": str(jax.devices()[0]),
            "mesh": (dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
                     if self.mesh is not None else None),
            "variant": self.model.config.variant,
            "compiled_programs": sorted(
                "/".join(map(str, k)) for k in list(self._compiled)),
            "max_batch": self.max_batch,
        }


def make_http_server(engine: InferenceEngine, host: str = "127.0.0.1",
                     port: int = 8471, auth_token: str | None = None,
                     max_request_bytes: int = 64 << 20,
                     tls_cert: str | None = None, tls_key: str | None = None):
    """Build (not start) a ThreadingHTTPServer bound to the engine.

    ``auth_token``: when set, POST requests must carry
    ``Authorization: Bearer <token>`` (``/healthz`` stays open for probes).
    ``max_request_bytes``: bodies above this are rejected with 413 before
    being read into memory.
    ``tls_cert``/``tls_key``: PEM paths — when both are set the listener
    speaks HTTPS (TLS 1.2+; wraps the socket before serving, so auth tokens
    are never sent in clear text on untrusted networks).
    """
    import hmac
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    use_tls = bool(tls_cert and tls_key)

    class Handler(BaseHTTPRequestHandler):
        def setup(self):
            # TLS handshake runs HERE, in this connection's handler thread —
            # wrapping with do_handshake_on_connect=True would perform it in
            # serve_forever's single accept loop, letting one idle client
            # block every other connection (confirmed single-client DoS).
            if use_tls:
                self.request.settimeout(15)
                try:
                    self.request.do_handshake()
                except OSError:
                    raise ConnectionAbortedError("TLS handshake failed")
                self.request.settimeout(None)
            super().setup()

        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self) -> bool:
            if auth_token is None:
                return True
            got = self.headers.get("Authorization", "")
            return hmac.compare_digest(got, f"Bearer {auth_token}")

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, json.dumps(engine.stats()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            parsed = urlparse(self.path)
            op = parsed.path.strip("/")
            if op not in ("encode", "decode", "reconstruct"):
                self._send(404, b"unknown op", "text/plain")
                return
            if not self._authorized():
                self._send(401, b"unauthorized", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > max_request_bytes:
                    self._send(413, f"request body {n} bytes > limit "
                               f"{max_request_bytes}".encode(), "text/plain")
                    return
                arr = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                # ?dtype=uint8|float16 encodes the result ON DEVICE so the
                # device->host fetch itself moves 4x/2x fewer bytes (image
                # ops emit [0,1] floats; encode supports float16 only).
                q = parse_qs(parsed.query)
                want = q.get("dtype", [None])[0]
                if want not in (None, "uint8", "float16"):
                    raise ValueError(f"bad dtype {want!r}")
                if op == "encode" and want == "uint8":
                    raise ValueError("encode supports dtype=float16 only")
                if arr.dtype != np.uint8:  # uint8 uploads stay uint8 (H2D/4)
                    arr = np.asarray(arr, np.float32)
                out = engine.submit(op, arr, want)
                buf = io.BytesIO()
                np.save(buf, out)
                self._send(200, buf.getvalue(), "application/octet-stream")
            except EngineOverloaded as e:
                self._send(503, str(e).encode(), "text/plain")
            except Exception as e:  # noqa: BLE001
                self._send(400, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")

    class _Server(ThreadingHTTPServer):
        def handle_error(self, request, client_address):
            import sys

            exc = sys.exc_info()[1]
            if isinstance(exc, (ConnectionError, TimeoutError, OSError)):
                return  # failed/idle TLS handshakes are not server errors
            super().handle_error(request, client_address)

    server = _Server((host, port), Handler)
    if use_tls:
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.minimum_version = ssl.TLSVersion.TLSv1_2
        ctx.load_cert_chain(certfile=tls_cert, keyfile=tls_key)
        server.socket = ctx.wrap_socket(server.socket, server_side=True,
                                        do_handshake_on_connect=False)
    return server

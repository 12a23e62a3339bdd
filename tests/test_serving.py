"""Serving tests: engine batching semantics + HTTP round trip (CPU)."""

import io
import shutil
import threading
import urllib.request

import jax
import numpy as np
import pytest

from deepl_project_tpu import TransVAE, get_config
from deepl_project_tpu.models import init_params
from deepl_project_tpu.serving import InferenceEngine, make_http_server


@pytest.fixture(scope="module")
def engine():
    cfg = get_config("tiny", 16, 32).replace(
        depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4, head_dim=16,
        dtype="float32", attention_impl="xla")
    model = TransVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=16)
    return InferenceEngine(model, params, max_batch=8, batch_window_ms=20.0)


def test_engine_ops_shapes(engine):
    x = np.random.rand(2, 16, 16, 3).astype(np.float32)
    mu = engine.run("encode", x)
    assert mu.shape == (2, 4, 4, 4)
    img = engine.run("decode", mu)
    assert img.shape == (2, 16, 16, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0  # sigmoid output contract
    rec = engine.run("reconstruct", x)
    assert rec.shape == x.shape


def test_engine_padding_and_split(engine):
    # Non-pow2 batch pads (result unchanged for the real rows); batches over
    # max_batch split transparently.
    x = np.random.rand(3, 16, 16, 3).astype(np.float32)
    r3 = engine.run("reconstruct", x)
    r1 = engine.run("reconstruct", x[:1])
    np.testing.assert_allclose(r3[:1], r1, rtol=1e-5, atol=1e-6)
    big = np.random.rand(9, 16, 16, 3).astype(np.float32)  # > max_batch=8
    assert engine.run("reconstruct", big).shape[0] == 9


def test_dynamic_batcher_groups_concurrent_requests(engine):
    engine.start()
    try:
        xs = [np.random.rand(1, 16, 16, 3).astype(np.float32)
              for _ in range(4)]
        outs = [None] * 4

        def worker(i):
            outs[i] = engine.submit("reconstruct", xs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i, o in enumerate(outs):
            assert o is not None and o.shape == (1, 16, 16, 3)
            np.testing.assert_allclose(
                o, engine.run("reconstruct", xs[i]), rtol=1e-4, atol=1e-5)
    finally:
        engine.stop()


def test_http_round_trip(engine):
    engine.start()
    server = make_http_server(engine, "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert b"variant" in r.read()
        x = np.random.rand(2, 16, 16, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/reconstruct", data=buf.getvalue(),
                timeout=60) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (2, 16, 16, 3)
        # Unknown op → 400/404, not a crash.
        req = urllib.request.Request(f"http://127.0.0.1:{port}/nope",
                                     data=b"x")
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req, timeout=10)
    finally:
        server.shutdown()
        engine.stop()


def test_http_uint8_response(engine):
    engine.start()
    server = make_http_server(engine, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        x = np.random.rand(1, 16, 16, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/reconstruct?dtype=uint8",
                data=buf.getvalue(), timeout=60) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.dtype == np.uint8 and out.shape == (1, 16, 16, 3)
    finally:
        server.shutdown()
        engine.stop()


def test_submit_oversized_request_chunks(engine):
    engine.start()
    try:
        big = np.random.rand(9, 16, 16, 3).astype(np.float32)  # > max_batch=8
        out = engine.submit("reconstruct", big)
        assert out.shape[0] == 9
    finally:
        engine.stop()


def test_uint8_request_payload_matches_float(engine):
    # uint8 inputs are cast+scaled on device; result must match the float
    # path on the same pixels.
    xi = np.random.randint(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    xf = xi.astype(np.float32) / 255.0
    r8 = engine.run("reconstruct", xi)
    rf = engine.run("reconstruct", xf)
    np.testing.assert_allclose(r8, rf, rtol=1e-3, atol=1e-3)


def test_warmup_covers_default_encoding(engine):
    # Warming uint8 must also warm the default (None) encoding — otherwise
    # the first plain request cold-compiles mid-traffic.
    engine.warmup(16, ops=("reconstruct",), dtypes=("uint8",))
    outs = {k[1] for k in engine._compiled if k[0] == "reconstruct"}
    assert None in outs and "uint8" in outs


def test_auth_token_enforced(engine):
    engine.start()
    server = make_http_server(engine, "127.0.0.1", 0, auth_token="s3cret")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # healthz stays open for probes
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert r.status == 200
        x = np.random.rand(1, 16, 16, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        body = buf.getvalue()
        # missing / wrong token → 401
        for hdrs in ({}, {"Authorization": "Bearer wrong"}):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/reconstruct", data=body,
                headers=hdrs)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=10)
            assert ei.value.code == 401
        # correct token → 200
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=body,
            headers={"Authorization": "Bearer s3cret"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert np.load(io.BytesIO(r.read())).shape == (1, 16, 16, 3)
    finally:
        server.shutdown()
        engine.stop()


def test_request_size_cap(engine):
    engine.start()
    server = make_http_server(engine, "127.0.0.1", 0,
                              max_request_bytes=1024)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        x = np.random.rand(1, 16, 16, 3).astype(np.float32)  # 3 KB > 1 KB cap
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=buf.getvalue())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 413
    finally:
        server.shutdown()
        engine.stop()


def test_bounded_queue_overload():
    from deepl_project_tpu.serving import EngineOverloaded

    cfg = get_config("tiny", 16, 32).replace(
        depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4, head_dim=16,
        dtype="float32", attention_impl="xla")
    model = TransVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=16)
    eng = InferenceEngine(model, params, max_batch=8, max_queue=1)
    eng._thread = object()  # pretend the dispatcher runs without draining
    x = np.random.rand(1, 16, 16, 3).astype(np.float32)
    eng._queue.put_nowait((("reconstruct", None), x, threading.Event(), {}))
    with pytest.raises(EngineOverloaded):
        eng.submit("reconstruct", x)
    eng._thread = None


def test_stop_fails_carried_request(engine):
    # A request carried between dispatch groups must be failed on stop(),
    # not leave its submitter blocked forever.
    engine.start()
    try:
        x = np.random.rand(1, 16, 16, 3).astype(np.float32)
        errs = []

        def worker(op):
            try:
                engine.submit(op, x)
            except RuntimeError as e:
                errs.append(str(e))

        # Two incompatible ops in quick succession: the second is carried.
        t1 = threading.Thread(target=worker, args=("reconstruct",))
        t2 = threading.Thread(target=worker, args=("encode",))
        t1.start(); t2.start()
    finally:
        engine.stop()
    t1.join(timeout=30)
    t2.join(timeout=30)
    assert not t1.is_alive() and not t2.is_alive()


def test_warmup_non_pow2_max_batch():
    cfg = get_config("tiny", 16, 32).replace(
        depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4, head_dim=16,
        dtype="float32", attention_impl="xla")
    model = TransVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=16)
    eng = InferenceEngine(model, params, max_batch=6)
    eng.warmup(16, ops=("decode",))
    batches = {k[3] for k in eng._compiled if k[0] == "decode"}
    assert 6 in batches  # the live non-pow2 bucket is warmed


def test_serve_cli_compile_cache_flag(tmp_path):
    # The flag must set JAX's persistent compile cache before the engine is
    # built (warm-restart deploys; ROADMAP serving item).
    from deepl_project_tpu.cli.serve import build_parser

    args = build_parser().parse_args(
        ["--compile_cache_dir", str(tmp_path / "cache")])
    assert args.compile_cache_dir == str(tmp_path / "cache")


@pytest.mark.skipif(shutil.which("openssl") is None,
                    reason="openssl CLI needed to mint a test cert")
def test_https_round_trip(engine, tmp_path):
    # TLS listener: self-signed cert, client pinned to it; auth still works.
    # The handshake runs in the handler thread (do_handshake_on_connect=False)
    # so an idle TCP client cannot block the accept loop.
    import ssl
    import subprocess
    import urllib.request

    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost"], check=True, capture_output=True)

    engine.start()
    server = make_http_server(engine, "127.0.0.1", 0, auth_token="tok",
                              tls_cert=str(cert), tls_key=str(key))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        ctx = ssl.create_default_context(cafile=str(cert))
        ctx.check_hostname = False
        x = np.random.rand(1, 16, 16, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"https://127.0.0.1:{port}/reconstruct", data=buf.getvalue(),
            headers={"Authorization": "Bearer tok"})
        with urllib.request.urlopen(req, context=ctx, timeout=60) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == x.shape
        # An idle plain-TCP client must NOT block other connections (the
        # handshake would previously run in the accept loop).
        import socket

        idle = socket.create_connection(("127.0.0.1", port), timeout=10)
        try:
            req2 = urllib.request.Request(
                f"https://127.0.0.1:{port}/healthz")
            with urllib.request.urlopen(req2, context=ctx, timeout=10) as r:
                assert b"variant" in r.read()
        finally:
            idle.close()
    finally:
        server.shutdown()
        engine.stop()


def test_mesh_engine_matches_single_device(engine):
    """Multi-chip serving (data x model mesh, tensor-sharded params) must
    return exactly what the single-device engine returns, for both the
    data-sharded (batch % data == 0) and replicated (odd batch) placements."""
    from deepl_project_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(model=2)  # 4x1x2 (data, context, model) on 8 devices
    mesh_engine = InferenceEngine(engine.model, engine.params, max_batch=8,
                                  mesh=mesh, param_sharding="tensor")
    x = np.random.rand(4, 16, 16, 3).astype(np.float32)
    ref = engine.run("reconstruct", x)
    out = mesh_engine.run("reconstruct", x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    odd = x[:3]  # pads to 4; placement still decided on the bucketed batch
    np.testing.assert_allclose(mesh_engine.run("reconstruct", odd),
                               ref[:3], rtol=1e-5, atol=1e-6)
    mu = mesh_engine.run("encode", x)
    np.testing.assert_allclose(mu, engine.run("encode", x), rtol=1e-5,
                               atol=1e-6)
    assert mesh_engine.stats()["mesh"] == {"data": 4, "context": 1,
                                           "model": 2}


def test_mesh_engine_http_round_trip(engine):
    """The HTTP layer is mesh-agnostic: a full round trip through a
    mesh-backed engine serves the same bytes contract."""
    from deepl_project_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(model=2)
    mesh_engine = InferenceEngine(engine.model, engine.params, max_batch=8,
                                  batch_window_ms=5.0, mesh=mesh)
    mesh_engine.start()
    server = make_http_server(mesh_engine, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        x = np.random.rand(2, 16, 16, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = np.load(io.BytesIO(resp.read()))
        np.testing.assert_allclose(out, engine.run("reconstruct", x),
                                   rtol=1e-5, atol=1e-6)
    finally:
        server.shutdown()
        mesh_engine.stop()


def test_serve_cli_default_is_int8_resblock():
    """r5 (VERDICT 2): the measured int8 scope=resblock path (+7.4% at b32,
    -0.04 dB) is the first-class serving default (AUTO resolves to int8 on a
    single chip, bf16 on a TP mesh); 'none' opts out."""
    from deepl_project_tpu.cli.serve import build_parser, resolve_quantize

    args = build_parser().parse_args([])
    assert args.quantize is None  # AUTO sentinel, resolved in main()
    assert args.quantize_scope == "resblock"
    assert build_parser().parse_args(["--quantize", "none"]).quantize == "none"
    assert resolve_quantize(None, 1) == "int8"
    assert resolve_quantize(None, 4) == "none"  # TP mesh stays bf16
    assert resolve_quantize("none", 1) == "none"
    assert resolve_quantize("int8", 4) == "int8"  # explicit wins

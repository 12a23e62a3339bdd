"""Int8 PTQ: primitives, param-tree transform, end-to-end accuracy.

The quant path is a serving feature (ops/quant.py, quantize.py); these tests
pin (a) quantization math, (b) that quantize_params emits exactly the tree the
quant='int8' modules expect, and (c) end-to-end closeness to the float model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from deepl_project_tpu.config import TransVAEConfig
from deepl_project_tpu.models import TransVAE, init_params
from deepl_project_tpu.ops.quant import (QDense, qmatmul, quantize_act,
                                         quantize_weight)
from deepl_project_tpu.quantize import calibrate_amax, quantize_model


def small_config(**kw):
    return TransVAEConfig(variant="quanttest", depths=(1, 1, 1),
                          base_dims=(32, 32, 64), latent_dim=8,
                          norm_latents=True, **kw)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 24)) * 0.3
    wq, ws = quantize_weight(w, axis=-1)
    assert wq.dtype == jnp.int8 and ws.shape == (24,)
    w_rec = wq.astype(jnp.float32) * ws
    # Per-channel symmetric int8: error bounded by scale/2 per element.
    err = jnp.max(jnp.abs(w_rec - w) / ws)
    assert float(err) <= 0.5 + 1e-6


def test_quantize_act_static_scale():
    x = jnp.linspace(-2.0, 2.0, 101)
    s = jnp.asarray(2.0 / 127.0)
    xq = quantize_act(x, s)
    assert xq.dtype == jnp.int8
    assert int(jnp.max(xq)) == 127 and int(jnp.min(xq)) == -127
    rec = xq.astype(jnp.float32) * s
    assert float(jnp.max(jnp.abs(rec - x))) <= float(s) / 2 + 1e-6


def test_qmatmul_matches_float():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (64, 48))
    w = jax.random.normal(k2, (48, 32)) * 0.1
    wq, ws = quantize_weight(w, axis=-1)
    a = jnp.max(jnp.abs(x)) / 127.0
    y_q = qmatmul(x, wq, ws, a, out_dtype=jnp.float32)
    y_f = x @ w
    rel = jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f)
    assert float(rel) < 0.02, float(rel)


def test_qdense_param_tree_and_apply():
    m = QDense(8, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    p = v["params"]
    assert set(p) == {"kernel_q", "kernel_scale", "bias", "act_scale"}
    assert p["kernel_q"].dtype == jnp.int8
    out = m.apply(v, jnp.ones((2, 4)))
    assert out.shape == (2, 8)


@pytest.fixture(scope="module")
def float_model_and_params():
    cfg = small_config()
    model = TransVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=32, batch=1)
    return cfg, model, params


def _calib_batches(n=2, res=32):
    for i in range(n):
        yield jax.random.uniform(jax.random.PRNGKey(10 + i), (2, res, res, 3))


def test_calibrate_amax_structure(float_model_and_params):
    cfg, _, params = float_model_and_params
    amax = calibrate_amax(cfg, params, _calib_batches())
    enc = amax["encoder"]
    # CNN stages sow ResBlock sites; transformer stages sow FFN sites.
    assert "amax_h1" in enc["stage0_block0"]
    assert "amax_in" in enc["stage2_block0"]["ffn"]
    leaves = jax.tree.leaves(amax)
    assert all(np.asarray(v) > 0 for v in leaves)


def test_quantized_tree_matches_module_expectation(float_model_and_params):
    cfg, _, params = float_model_and_params
    qmodel, qparams = quantize_model(cfg, params, _calib_batches())
    expected = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)), sample=False))
    exp_p = expected["params"]
    got_paths = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in
                 jax.tree_util.tree_leaves_with_path(qparams)}
    exp_paths = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in
                 jax.tree_util.tree_leaves_with_path(exp_p)}
    assert set(got_paths) == set(exp_paths)
    for path, (shape, _) in exp_paths.items():
        assert got_paths[path][0] == shape, path


def test_int8_forward_close_to_float(float_model_and_params):
    cfg, model, params = float_model_and_params
    qmodel, qparams = quantize_model(cfg, params, _calib_batches())
    x = jax.random.uniform(jax.random.PRNGKey(42), (2, 32, 32, 3))
    rf, mu_f, _ = model.apply({"params": params}, x, sample=False)
    rq, mu_q, _ = qmodel.apply({"params": qparams}, x, sample=False)
    assert rq.shape == rf.shape
    rel = (jnp.linalg.norm(rq.astype(jnp.float32) - rf.astype(jnp.float32))
           / jnp.linalg.norm(rf.astype(jnp.float32)))
    assert float(rel) < 0.15, float(rel)
    # Latents must stay close too (encoder path is quantized).
    rel_mu = (jnp.linalg.norm(mu_q - mu_f)
              / (jnp.linalg.norm(mu_f) + 1e-6))
    assert float(rel_mu) < 0.15, float(rel_mu)


@pytest.mark.parametrize("scope", ["resblock", "ffn"])
def test_quant_scope_partial(float_model_and_params, scope):
    """Partial scopes leave the other family's float params intact, the tree
    still matches the scoped module's expectation, and the forward stays
    close to float."""
    cfg, model, params = float_model_and_params
    qmodel, qparams = quantize_model(cfg, params, _calib_batches(),
                                     scope=scope)
    enc = qparams["encoder"]
    if scope == "resblock":
        assert "kernel_q" in enc["stage0_block0"]["conv1"]
        assert "kernel" in enc["stage2_block0"]["ffn"]["proj_in"]
    else:
        assert "kernel" in enc["stage0_block0"]["conv1"]
        assert "kernel_q" in enc["stage2_block0"]["ffn"]["proj_in"]
    expected = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)), sample=False))
    exp_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_leaves_with_path(expected["params"])}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_leaves_with_path(qparams)}
    assert got_paths == exp_paths
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3))
    rf, _, _ = model.apply({"params": params}, x, sample=False)
    rq, _, _ = qmodel.apply({"params": qparams}, x, sample=False)
    rel = (jnp.linalg.norm(rq.astype(jnp.float32) - rf.astype(jnp.float32))
           / jnp.linalg.norm(rf.astype(jnp.float32)))
    assert float(rel) < 0.15, float(rel)


def test_quant_rejects_scan_blocks(float_model_and_params):
    cfg, _, params = float_model_and_params
    with pytest.raises(ValueError, match="scan_blocks"):
        quantize_model(cfg.replace(scan_blocks=True), params,
                       _calib_batches())


def test_quantized_engine_round_trip(float_model_and_params):
    """The serving engine works unchanged on a quantized model (the
    cli/serve --quantize int8 path)."""
    from deepl_project_tpu.serving import InferenceEngine

    cfg, _, params = float_model_and_params
    qmodel, qparams = quantize_model(cfg, params, _calib_batches())
    engine = InferenceEngine(qmodel, qparams, max_batch=4,
                             batch_window_ms=1.0)
    engine.start()
    try:
        out = engine.submit("reconstruct",
                            np.random.rand(1, 32, 32, 3).astype(np.float32))
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(out).all()
    finally:
        engine.stop()


def test_quant_resolution_transfer(float_model_and_params):
    """Scales calibrated at 32px still hold at 64px (RoPE extrapolation +
    per-tensor scales are resolution-independent to first order)."""
    cfg, model, params = float_model_and_params
    qmodel, qparams = quantize_model(cfg, params, _calib_batches(res=32))
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    rf, _, _ = model.apply({"params": params}, x, sample=False)
    rq, _, _ = qmodel.apply({"params": qparams}, x, sample=False)
    rel = (jnp.linalg.norm(rq.astype(jnp.float32) - rf.astype(jnp.float32))
           / jnp.linalg.norm(rf.astype(jnp.float32)))
    assert float(rel) < 0.2, float(rel)

"""Pipeline parallelism (parallel/pipeline.py): GPipe-style microbatch
pipelining over a 'pipe' mesh axis must be EXACTLY the sequential block stack
— forward, gradients, and composed with DP — on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepl_project_tpu.parallel.pipeline import (pipeline_apply,
                                                 stage_sharding)

DEPTH, B, N, D = 8, 8, 16, 32


def _block_fn(p, x, cond):
    # A conditioned residual MLP block — same contract as a DiT block.
    h = jnp.tanh(x @ p["w1"] + cond[:, None, :]) @ p["w2"]
    return x + h


def _stacked_params(key, depth=DEPTH, d=D):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (depth, d, d)) * 0.1,
        "w2": jax.random.normal(k2, (depth, d, d)) * 0.1,
    }


def _sequential(params, x, cond):
    def body(carry, p):
        return _block_fn(p, carry, cond), None

    out, _ = jax.lax.scan(body, x, params)
    return out


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    params = _stacked_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, D))
    return params, x, cond


@pytest.mark.parametrize("stages,micro", [(4, 4), (2, 8), (1, 4)])
def test_pipeline_forward_matches_sequential(data, stages, micro):
    params, x, cond = data
    mesh = Mesh(np.array(jax.devices()[:stages]), ("pipe",))
    ref = _sequential(params, x, cond)
    out = jax.jit(
        lambda p, x, c: pipeline_apply(_block_fn, p, x, c, mesh=mesh,
                                       num_microbatches=micro))(
        params, x, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential(data):
    params, x, cond = data
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))

    def loss_pp(p):
        y = pipeline_apply(_block_fn, p, x, cond, mesh=mesh,
                           num_microbatches=4)
        return jnp.mean(y ** 2)

    def loss_ref(p):
        return jnp.mean(_sequential(p, x, cond) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_composes_with_dp(data):
    """dp=2 x pipe=4: batch sharded over 'data' stays GSPMD-managed while
    'pipe' is manual; result matches single-device sequential."""
    params, x, cond = data
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    cs = jax.device_put(cond, NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, stage_sharding(mesh, params))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x, c: pipeline_apply(
            _block_fn, p, x, c, num_microbatches=4))(ps, xs, cs)
    ref = _sequential(params, x, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_rejects_bad_shapes(data):
    params, x, cond = data
    mesh = Mesh(np.array(jax.devices()[:3]), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_block_fn, params, x, cond, mesh=mesh,
                       num_microbatches=4)  # depth 8 % 3 != 0
    mesh4 = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_block_fn, params, x, cond, mesh=mesh4,
                       num_microbatches=3)  # batch 8 % 3 != 0


def test_pipeline_dit_blocks():
    """Pipeline the real DiTBlock stack (vmap-stacked params) and match the
    sequential per-block loop the model runs."""
    from deepl_project_tpu.models.dit import DiTBlock, get_dit_config

    cfg = get_dit_config("S").replace(depth=4, hidden_dim=64, num_heads=4,
                                      dtype="float32", param_dtype="float32")
    grid = (4, 4)
    block = DiTBlock(cfg, grid)
    b, n, d = 4, grid[0] * grid[1], cfg.hidden_dim
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, d))
    cond = jax.random.normal(jax.random.PRNGKey(1), (b, d))
    rngs = jax.random.split(jax.random.PRNGKey(2), cfg.depth)
    stacked = jax.vmap(lambda r: block.init(r, x, cond)["params"])(rngs)

    def block_fn(p, x, c):
        return block.apply({"params": p}, x, c)

    ref = x
    for i in range(cfg.depth):
        p_i = jax.tree_util.tree_map(lambda a: a[i], stacked)
        ref = block.apply({"params": p_i}, ref, cond)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    out = jax.jit(lambda p, x, c: pipeline_apply(
        block_fn, p, x, c, mesh=mesh, num_microbatches=4))(stacked, x, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dit_model_pipeline_matches_loop():
    """Full DiT forward: pipeline_axis path (ambient pipe mesh) must match
    the plain per-block loop AND the scan_blocks path on the same weights."""
    from deepl_project_tpu.models.dit import DiT, get_dit_config

    base = get_dit_config("S").replace(
        depth=4, hidden_dim=64, num_heads=4, dtype="float32",
        param_dtype="float32", num_classes=10)
    cfg_scan = base.replace(scan_blocks=True)
    cfg_pp = base.replace(pipeline_axis="pipe", pipeline_microbatches=4)

    rng = jax.random.PRNGKey(0)
    grid, ch, b = 8, 8, 8
    model_scan = DiT(cfg_scan)
    params = model_scan.init(
        rng, jnp.zeros((1, grid, grid, ch)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32))["params"]

    z = jax.random.normal(jax.random.PRNGKey(1), (b, grid, grid, ch))
    t = jax.random.uniform(jax.random.PRNGKey(2), (b,))
    y = jax.random.randint(jax.random.PRNGKey(3), (b,), 0, 10)

    out_scan = model_scan.apply({"params": params}, z, t, y)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    model_pp = DiT(cfg_pp)
    with jax.set_mesh(mesh):
        out_pp = jax.jit(lambda p, z, t, y: model_pp.apply(
            {"params": p}, z, t, y))(params, z, t, y)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_scan),
                               rtol=2e-4, atol=2e-4)

    # Without an ambient mesh the pipeline config silently runs sequentially.
    out_fallback = model_pp.apply({"params": params}, z, t, y)
    np.testing.assert_allclose(np.asarray(out_fallback),
                               np.asarray(out_scan), rtol=1e-6, atol=1e-6)


def test_dit_train_step_pipeline_grads():
    """One rectified-flow train step under dp=2 x pipe=4 matches the
    single-device scan_blocks step (params + loss) exactly."""
    import optax
    from deepl_project_tpu.models.dit import DiT, get_dit_config
    from deepl_project_tpu.training.diffusion import make_dit_train_step
    from flax.training.train_state import TrainState

    base = get_dit_config("S").replace(
        depth=4, hidden_dim=64, num_heads=4, dtype="float32",
        param_dtype="float32", num_classes=10, class_dropout=0.0)
    cfg_scan = base.replace(scan_blocks=True)
    cfg_pp = base.replace(pipeline_axis="pipe", pipeline_microbatches=4)

    rng = jax.random.PRNGKey(0)
    grid, ch, b = 8, 8, 8
    model_scan, model_pp = DiT(cfg_scan), DiT(cfg_pp)
    params = model_scan.init(rng, jnp.zeros((1, grid, grid, ch)),
                             jnp.zeros((1,)),
                             jnp.zeros((1,), jnp.int32))["params"]
    tx = optax.adamw(1e-3)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (b, grid, grid, ch))
    labels = jax.random.randint(jax.random.PRNGKey(2), (b,), 0, 10)
    step_rng = jax.random.PRNGKey(3)

    # The train step donates its state: give each state its own buffers.
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    s_ref = TrainState.create(apply_fn=model_scan.apply, params=copy(params),
                              tx=tx)
    step_ref = make_dit_train_step(model_scan, tx)
    s_ref, m_ref = step_ref(s_ref, z0, labels, step_rng)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    s_pp = TrainState.create(apply_fn=model_pp.apply, params=copy(params),
                             tx=tx)
    step_pp = make_dit_train_step(model_pp, tx)
    with jax.set_mesh(mesh):
        zs = jax.device_put(z0, NamedSharding(mesh, P("data")))
        ls = jax.device_put(labels, NamedSharding(mesh, P("data")))
        s_pp, m_pp = step_pp(s_pp, zs, ls, step_rng)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    for a, bb in zip(jax.tree_util.tree_leaves(s_pp.params),
                     jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=3e-4, atol=3e-5)

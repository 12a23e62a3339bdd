"""Switch MoE FFN (ops/moe.py) + expert parallelism: single-expert equality
with the dense FFN body, router invariants, aux-loss plumbing, EP sharding
equality on the virtual mesh, and the DiT integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepl_project_tpu.ops.moe import SwitchFFN, _FFNBody, collect_aux_losses

B, N, D, H = 2, 16, 32, 64


def _make(e, cap=4.0, axis=None):
    return SwitchFFN(d=D, hidden=H, num_experts=e, capacity_factor=cap,
                     use_swiglu=True, expert_axis=axis, dtype=jnp.float32,
                     param_dtype=jnp.float32)


def test_single_expert_equals_dense_ffn():
    """E=1 with ample capacity routes every token through the one expert with
    gate 1.0 — must equal the dense FFN body with the same weights."""
    moe = _make(1)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    vars_ = moe.init(jax.random.PRNGKey(1), x)
    out, _ = moe.apply(vars_, x, mutable=["losses"])

    dense = _FFNBody(d=D, hidden=H, use_swiglu=True, dtype=jnp.float32,
                     param_dtype=jnp.float32)
    p_expert = jax.tree_util.tree_map(lambda a: a[0],
                                      vars_["params"]["experts"])
    ref = dense.apply({"params": p_expert}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_aux_loss_sown_and_collected():
    moe = _make(4)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    vars_ = moe.init(jax.random.PRNGKey(1), x)
    _, aux_vars = moe.apply(vars_, x, mutable=["losses"])
    aux = collect_aux_losses(aux_vars)
    # E * sum(f*p) >= 1 with equality at perfectly uniform routing.
    assert float(aux) >= 0.99
    # Without mutable=['losses'], sow is a silent no-op (sampler path).
    out = moe.apply(vars_, x)
    assert out.shape == (B, N, D)


def test_capacity_drops_tokens_to_zero():
    """capacity_factor ~0 forces cap=1 per expert: almost all tokens drop and
    produce exactly zero output (residual fallthrough contract)."""
    moe = _make(2, cap=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    vars_ = moe.init(jax.random.PRNGKey(1), x)
    out, _ = moe.apply(vars_, x, mutable=["losses"])
    zero_rows = np.mean(np.all(np.asarray(out) == 0.0, axis=-1))
    assert zero_rows >= (N - 2) / N  # ≤1 token per expert survives


def test_expert_parallel_matches_unsharded():
    """EP over an 8-way 'expert' mesh axis must be bit-compatible with the
    unsharded module (GSPMD all_to_all is a layout change, not math)."""
    moe_ep = _make(8, axis="expert")
    moe_ref = _make(8, axis=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    vars_ = moe_ref.init(jax.random.PRNGKey(1), x)
    ref, _ = moe_ref.apply(vars_, x, mutable=["losses"])

    mesh = Mesh(np.array(jax.devices()), ("expert",))
    shard = lambda t: NamedSharding(mesh, P(*([None] * t.ndim)))  # noqa: E731
    ep_params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P("expert", *([None] * (a.ndim - 1))))),
        vars_["params"]["experts"])
    vars_ep = {"params": {**vars_["params"], "experts": ep_params}}
    with jax.set_mesh(mesh):
        out, _ = jax.jit(lambda v, x: moe_ep.apply(v, x,
                                                   mutable=["losses"]))(
            vars_ep, jax.device_put(x, shard(x)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_dit_moe_train_step_decreases_loss():
    """DiT with moe_experts=4: the rectified-flow step applies the router aux
    loss (metrics carry moe_aux) and training still optimizes."""
    import optax
    from flax.training.train_state import TrainState

    from deepl_project_tpu.models.dit import DiT, get_dit_config
    from deepl_project_tpu.training.diffusion import make_dit_train_step

    cfg = get_dit_config("S").replace(
        depth=2, hidden_dim=64, num_heads=4, dtype="float32",
        param_dtype="float32", num_classes=10, class_dropout=0.0,
        moe_experts=4)
    model = DiT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)),
                        jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))["params"]
    tx = optax.adamw(2e-3)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_dit_train_step(model, tx)
    # Overfit ONE fixed batch with a fixed rng stream (per-batch loss noise
    # would make a fresh-batch comparison flaky): loss must fall every time.
    z0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 8))
    labels = jnp.arange(4) % 10
    rng = jax.random.PRNGKey(100)
    losses = []
    for i in range(8):
        frozen = state.replace(step=0)  # step folds into the rng; pin it
        frozen, m = step(frozen, z0, labels, rng)
        state = frozen.replace(step=state.step + 1)
        assert "moe_aux" in m and float(m["moe_aux"]) >= 0.99
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.95 * losses[0], losses

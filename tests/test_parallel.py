"""Multi-device tests on the 8-device virtual CPU mesh: DP train step with
batch sharding (DDP parity), FSDP/tensor param sharding, loss equivalence
between 1-device and 8-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from deepl_project_tpu import TransVAE, get_config
from deepl_project_tpu.losses import LossWeights
from deepl_project_tpu.parallel import (batch_sharding, create_mesh,
                                        param_specs, shard_batch, shard_params)
from deepl_project_tpu.training import (init_train_state, make_optimizer,
                                        make_train_step)


def micro_model(**kw):
    cfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla", **kw)
    return TransVAE(cfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32),
                                latent_dim=4, head_dim=16))


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "context": 1, "model": 1}
    mesh2 = create_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "context": 1, "model": 2}
    mesh3 = create_mesh(data=2, context=2, model=2)
    assert mesh3.shape == {"data": 2, "context": 2, "model": 2}


def test_data_parallel_step_matches_single_device(rng):
    import optax

    model = micro_model()
    x = jax.random.uniform(rng, (8, 16, 16, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    # SGD keeps updates proportional to grads, so single- vs multi-device
    # equivalence is checkable elementwise (AdamW's rsqrt amplifies ulp-level
    # reduction-order differences on near-zero grads to O(lr)).
    tx = optax.sgd(1e-2)
    state = init_train_state({"model": variables["params"]}, tx)
    w = LossWeights(lpips=0.0, kl=1e-6, vf=0.0, gan=0.0)
    step = make_train_step(model, tx, w, donate=False)

    # Single-device run.
    s1, m1 = step(state, x, rng)

    # 8-way data-parallel run: batch sharded, params replicated. XLA inserts
    # the gradient reduction (the DDP allreduce analogue).
    mesh = create_mesh()
    xs = shard_batch(mesh, x)
    params_repl = shard_params(mesh, state.params, "replicate")
    state_repl = init_train_state(params_repl, tx)
    s8, m8 = step(state_repl, xs, rng)

    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-5)
    # Reduction-order differences in the distributed grad psum shift a few
    # ulps through AdamW's rsqrt; allow small elementwise drift.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_fsdp_specs_shard_large_params(rng):
    model = micro_model()
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0), "sample": rng}, x)["params"]
    specs = param_specs({"model": params}, "fsdp", model_size=2,
                        fsdp_min_size=1024)
    leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P))
    sharded = [s for s in leaves if any(a is not None for a in s)]
    assert len(sharded) > 0, "FSDP must shard at least the large kernels"


def test_tensor_parallel_specs(rng):
    model = micro_model()
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0), "sample": rng}, x)["params"]
    specs = param_specs({"model": params}, "tensor", model_size=2)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda s: isinstance(s, P))[0]
    qkv = [(p, s) for p, s in flat if any(
        getattr(k, "key", "") in ("to_q", "to_k", "to_v") for k in p)
        and str(getattr(p[-1], "key", "")) == "kernel"]
    assert qkv, "attention projections must exist"
    for path, spec in qkv:
        assert spec == P(None, "model"), (path, spec)


def test_tensor_parallel_conv_specs(rng):
    # The FLOP-dominant ResBlock 3x3 convs are column-parallel (output
    # channels); conv2 / latent heads keep replicated kernels and consume the
    # channel-sharded activation. No row-parallel conv sharding: its backward
    # kernel-reverse triggers SPMD involuntary full rematerialization every
    # step (see parallel/sharding.py).
    model = micro_model()
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0), "sample": rng}, x)["params"]
    specs = param_specs({"model": params}, "tensor", model_size=2)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda s: isinstance(s, P))[0]

    def find(parent, leaf):
        return [s for p, s in flat
                if str(getattr(p[-2], "key", "")) == parent
                and str(getattr(p[-1], "key", "")) == leaf]

    assert find("conv1", "kernel"), "ResBlock conv1 must exist"
    for s in find("conv1", "kernel"):
        assert s == P(None, None, None, "model"), s
    for s in find("conv2", "kernel"):
        assert s == P(), s
    for s in find("conv_mu", "kernel") + find("conv_logvar", "kernel"):
        assert s == P(), s


def test_tensor_parallel_specs_scanned(rng):
    # scan_blocks stacks params with a leading depth axis ("scan" in the
    # path); TP rules must still shard the trailing dims.
    cfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    model = TransVAE(cfg.replace(depths=(2, 2, 2), base_dims=(16, 16, 32),
                                 latent_dim=4, head_dim=16, scan_blocks=True))
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0), "sample": rng}, x)["params"]
    specs = param_specs({"model": params}, "tensor", model_size=2)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda s: isinstance(s, P))[0]
    scanned_qkv = [
        (p, s) for p, s in flat
        if any(str(getattr(k, "key", "")) == "scan" for k in p)
        and str(getattr(p[-2], "key", "")) == "to_q"
        and str(getattr(p[-1], "key", "")) == "kernel"]
    assert scanned_qkv, "scanned attention projections must exist"
    for path, spec in scanned_qkv:
        assert spec == P(None, None, "model"), (path, spec)
    scanned_conv = [
        (p, s) for p, s in flat
        if any(str(getattr(k, "key", "")) == "scan" for k in p)
        and str(getattr(p[-2], "key", "")) == "conv1"
        and str(getattr(p[-1], "key", "")) == "kernel"]
    assert scanned_conv, "scanned ResBlock convs must exist"
    for path, spec in scanned_conv:
        assert spec == P(None, None, None, None, "model"), (path, spec)


def test_tensor_parallel_forward_matches_replicated(rng):
    # Numerical equivalence: tensor-sharded params produce the same forward
    # as replicated execution (XLA inserts the collectives).
    model = micro_model()
    x = jax.random.uniform(rng, (4, 16, 16, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    params = variables["params"]

    ref, mu_ref, _ = model.apply({"params": params}, x, sample=False)

    mesh = create_mesh(data=4, model=2)
    sharded = shard_params(mesh, {"model": params}, "tensor")["model"]
    xs = jax.device_put(x, batch_sharding(mesh))
    out, mu, _ = jax.jit(
        lambda p, inp: model.apply({"params": p}, inp, sample=False)
    )(sharded, xs)
    # Collective reduction order shifts a few ulps.
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-3, atol=2e-5)


def test_fsdp_train_step_runs(rng):
    # End-to-end: FSDP-sharded params + sharded batch through the full jitted
    # train step (XLA all-gathers weights per layer, reduce-scatters grads).
    import optax

    model = micro_model()
    x = jax.random.uniform(rng, (8, 16, 16, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    from deepl_project_tpu.losses import LossWeights
    from deepl_project_tpu.parallel.sharding import param_shardings

    mesh = create_mesh(data=4, model=2)
    # Micro-model params are tiny; lower the FSDP size threshold so the
    # sharding rules actually engage.
    params = shard_params(mesh, {"model": variables["params"]}, "fsdp",
                          fsdp_min_size=512)
    shardings = param_shardings(mesh, {"model": variables["params"]}, "fsdp",
                                fsdp_min_size=512)
    tx = optax.sgd(1e-2)
    state = init_train_state(params, tx)
    xs = jax.device_put(x, batch_sharding(mesh))
    step = make_train_step(model, tx,
                           LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0),
                           donate=False, param_shardings=shardings)
    new_state, metrics = step(state, xs, rng)
    assert np.isfinite(float(metrics["total"]))
    # Sharded params stay sharded after the update.
    flat = jax.tree_util.tree_leaves(new_state.params)
    assert any(len(p.sharding.spec) and any(s is not None
               for s in p.sharding.spec) for p in flat
               if hasattr(p.sharding, "spec"))


def test_batch_sharding_layout():
    mesh = create_mesh()
    x = jnp.zeros((16, 4, 4, 3))
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data")
    # Each device holds 1/8 of the batch.
    assert xs.addressable_shards[0].data.shape[0] == 2


def test_ring_attention_matches_full(rng):
    # Context-parallel ring attention over the 8-device token axis must equal
    # single-device full attention exactly (online-softmax merge is exact).
    from deepl_project_tpu.parallel.ring_attention import (
        sequence_parallel_attention)

    b, n, h, d = 2, 64, 2, 16
    ks = jax.random.split(rng, 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d), jnp.float32) for kk in ks)
    scale = d ** -0.5
    from deepl_project_tpu.ops.attention import xla_attention

    ref = xla_attention(q, k, v, scale)
    mesh = create_mesh()  # 8 x 1
    out = sequence_parallel_attention(mesh, q, k, v, scale, axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_bf16(rng):
    from deepl_project_tpu.ops.attention import xla_attention
    from deepl_project_tpu.parallel.ring_attention import (
        sequence_parallel_attention)

    b, n, h, d = 1, 128, 1, 32
    ks = jax.random.split(rng, 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d), jnp.bfloat16) for kk in ks)
    scale = d ** -0.5
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), scale)
    mesh = create_mesh()
    out = sequence_parallel_attention(mesh, q, k, v, scale, axis="data")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_context_parallel_forward_matches_single_device(rng):
    # Full-model CP: images row-sharded over the 'context' axis; ring
    # attention in the transformer stage; GSPMD halo-exchanges the convs.
    # Must equal the unsharded forward (same params).
    from deepl_project_tpu.parallel import context_batch_sharding

    model = micro_model()
    model_cp = micro_model(context_axis="context")
    x = jax.random.uniform(rng, (2, 32, 32, 3), jnp.float32)
    params = model.init({"params": rng, "sample": rng}, x)["params"]
    ref, mu_ref, lv_ref = model.apply({"params": params}, x, sample=False)

    mesh = create_mesh(data=2, context=4)
    fwd = jax.jit(lambda p, xx: model_cp.apply({"params": p}, xx, sample=False))
    with jax.set_mesh(mesh):
        xd = jax.device_put(x, context_batch_sharding(mesh))
        out, mu, lv = fwd(params, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-4)


def test_context_parallel_train_step_matches(rng):
    # One CP training step (DP x CP mesh) must produce the same loss and
    # updated params as the single-device step.
    import optax

    from deepl_project_tpu.parallel import context_batch_sharding

    model = micro_model()
    model_cp = micro_model(context_axis="context")
    x = jax.random.uniform(rng, (4, 32, 32, 3), jnp.float32)
    params = {"model": model.init({"params": rng, "sample": rng}, x)["params"]}
    tx = optax.sgd(1e-2)
    w = LossWeights(lpips=0.0, kl=1e-6, vf=0.0, gan=0.0)

    step_1 = make_train_step(model, tx, w, donate=False)
    s1, m1 = step_1(init_train_state(params, tx), x, rng)

    mesh = create_mesh(data=2, context=4)
    step_cp = make_train_step(model_cp, tx, w, donate=False)
    with jax.set_mesh(mesh):
        xd = jax.device_put(x, context_batch_sharding(mesh))
        scp, mcp = step_cp(init_train_state(params, tx), xd, rng)

    np.testing.assert_allclose(float(m1["total"]), float(mcp["total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(scp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)

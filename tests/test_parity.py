"""Golden numerical parity vs. the PyTorch reference implementation.

Builds the reference model (torch, CPU, random init), converts its weights via
utils/convert.py, and checks encoder/decoder outputs agree elementwise. This is
the keystone test for "a reference user can switch and load their checkpoints"
(SURVEY.md §7 step 2).

Skipped automatically when torch or the reference tree is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference/transvae-implementation"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF_PATH):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

# The reference package __init__ imports lpips (unavailable); stub it before
# importing the model modules. We import the *reference's* code only to produce
# golden outputs — nothing is copied. The reference package is loaded under the
# alias 'ref_transvae' via importlib so it can't collide with this repo's
# 'transvae' compatibility shim (which tests also import).
import importlib  # noqa: E402
import importlib.util  # noqa: E402

sys.modules.setdefault("lpips", types.ModuleType("lpips"))


def _load_reference_package():
    pkg_dir = os.path.join(REF_PATH, "transvae")
    spec = importlib.util.spec_from_file_location(
        "ref_transvae", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    module = importlib.util.module_from_spec(spec)
    sys.modules["ref_transvae"] = module
    spec.loader.exec_module(module)
    return module


_load_reference_package()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepl_project_tpu import TransVAE, get_config  # noqa: E402
from deepl_project_tpu.utils.convert import torch_state_dict_to_params  # noqa: E402


@pytest.fixture(scope="module")
def ref_pair():
    """(torch model, jax model, converted params) for a small f16 config."""
    from ref_transvae.models.transvae import TransVAE as RefTransVAE

    torch.manual_seed(0)
    ref_cfg = {"depths": [1, 1, 1], "base_dims": [32, 32, 128],
               "mlp_ratio": 1.0, "head_dim": 64}
    ref = RefTransVAE(ref_cfg, variant="test", compression_ratio=4,
                      latent_dim=8).eval()

    cfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    cfg = cfg.replace(depths=(1, 1, 1), base_dims=(32, 32, 128), latent_dim=8,
                      head_dim=64)
    model = TransVAE(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_state_dict_to_params(sd, cfg)
    return ref, model, params


def _to_torch(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch(t: "torch.Tensor") -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_encoder_parity(ref_pair):
    ref, model, params = ref_pair
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        mu_t, logvar_t = ref.encode(_to_torch(x))
    mu_j, logvar_j = model.apply({"params": params}, jnp.asarray(x),
                                 method="encode")
    np.testing.assert_allclose(np.asarray(mu_j), _from_torch(mu_t),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar_j), _from_torch(logvar_t),
                               rtol=1e-3, atol=1e-3)


def test_decoder_parity(ref_pair):
    ref, model, params = ref_pair
    z = np.random.RandomState(2).randn(2, 8, 8, 8).astype(np.float32)
    with torch.no_grad():
        recon_t = ref.decode(_to_torch(z))
    recon_j = model.apply({"params": params}, jnp.asarray(z), method="decode")
    np.testing.assert_allclose(np.asarray(recon_j), _from_torch(recon_t),
                               rtol=1e-3, atol=1e-3)


def test_resolution_extrapolation_parity(ref_pair):
    # RoPE path must agree at a resolution never seen at init.
    ref, model, params = ref_pair
    x = np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        mu_t, _ = ref.encode(_to_torch(x))
    mu_j, _ = model.apply({"params": params}, jnp.asarray(x), method="encode")
    np.testing.assert_allclose(np.asarray(mu_j), _from_torch(mu_t),
                               rtol=1e-3, atol=1e-3)


def test_depthwise_ffn_parity():
    # ConvFFN depthwise variant converts and matches too.
    from ref_transvae.modules.conv import ConvFFN as RefConvFFN

    from deepl_project_tpu.ops import ConvFFN

    torch.manual_seed(0)
    ref = RefConvFFN(dim=32, mlp_ratio=1.0, conv_type="depthwise").eval()
    x = np.random.RandomState(0).rand(1, 8, 8, 32).astype(np.float32)
    with torch.no_grad():
        out_t = ref(_to_torch(x))

    m = ConvFFN(32, mlp_ratio=1.0, conv_type="depthwise", dtype=jnp.float32,
                param_dtype=jnp.float32)
    from deepl_project_tpu.utils.convert import _convert_block

    out_tree: dict = {}
    for k, v in ref.state_dict().items():
        assert _convert_block(out_tree, ["blk"], "ffn." + k, v.numpy(), False)
    out_j = m.apply({"params": out_tree["blk"]["ffn"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), _from_torch(out_t),
                               rtol=1e-3, atol=1e-3)


def test_load_reference_checkpoint_file(tmp_path, ref_pair):
    # Full .pt round trip: torch.save(reference ckpt dict) -> converter ->
    # identical outputs (the from_pretrained migration path).
    ref, model, params = ref_pair
    ckpt = {"epoch": 1, "global_step": 10,
            "model_state_dict": ref.state_dict()}
    path = str(tmp_path / "ref.pt")
    torch.save(ckpt, path)

    from deepl_project_tpu.utils.convert import load_reference_checkpoint

    loaded = torch_params = load_reference_checkpoint(path, model.config)
    z = np.random.RandomState(5).randn(1, 8, 8, 8).astype(np.float32)
    a = model.apply({"params": params}, jnp.asarray(z), method="decode")
    b = model.apply({"params": loaded}, jnp.asarray(z), method="decode")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_roundtrip_and_loads_into_reference(ref_pair):
    """params → torch state_dict must (a) byte-round-trip through the
    forward converter and (b) load into the live reference model with only
    RoPE inv_freq buffers missing, reproducing the original outputs."""
    from deepl_project_tpu.utils.convert import params_to_torch_state_dict

    ref, model, params = ref_pair
    cfg = model.config
    sd_out = params_to_torch_state_dict(params, cfg)

    # (a) exact round trip (transposes are involutions; no value drift).
    back = torch_state_dict_to_params(sd_out, cfg)
    ref_flat = jax.tree_util.tree_leaves_with_path(params)
    back_flat = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(ref_flat) == len(back_flat)
    for path, leaf in ref_flat:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(back_flat[path]), str(path))

    # (b) the reference accepts the exported dict: no unexpected keys, and
    # the only missing ones are the recomputed rope buffers.
    import copy

    ref2 = copy.deepcopy(ref)
    with torch.no_grad():  # perturb so a failed load can't silently pass
        for p in ref2.parameters():
            p.add_(1.0)
    missing, unexpected = ref2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd_out.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("rope" in k for k in missing), missing

    x = np.random.RandomState(7).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        mu_a, _ = ref.encode(_to_torch(x))
        mu_b, _ = ref2.encode(_to_torch(x))
    np.testing.assert_allclose(mu_b.numpy(), mu_a.numpy(), rtol=1e-6,
                               atol=1e-6)

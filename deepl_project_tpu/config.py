"""Model/training configuration and the variant registry.

Mirrors the reference variant table (ref: transvae/models/transvae.py:107-153 and
configs/*.yaml) but as a single explicit dataclass, fixing the reference defect of
a required-but-undocumented ``config`` dict (ref: transvae/models/transvae.py:27-46,
SURVEY.md §2.9.1).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransVAEConfig:
    """Static architecture configuration for one TransVAE variant.

    Spatial compression is ``2 ** (len(depths) - 1)``: a 5-stage model is f16,
    a 4-stage model is f8 (ref: transvae/models/encoder.py:62-93).
    """

    variant: str = "large"
    depths: Sequence[int] = (3, 3, 3, 4, 6)
    base_dims: Sequence[int] = (192, 192, 384, 768, 1536)
    latent_dim: int = 32
    input_channels: int = 3
    mlp_ratio: float = 1.0
    head_dim: int = 64
    num_cnn_stages: int = 2  # first N encoder stages are CNN (ref: encoder.py:60)
    use_rope: bool = True
    # 'reference' replicates the reference's nonstandard rotary pairing exactly
    # (needed for converted-checkpoint parity); 'standard' is a true rotation
    # with the exact relative-position property (see ops/rope.py).
    rope_pairing: str = "reference"
    use_conv_ffn: bool = True
    conv_ffn_type: str = "full"  # 'full' | 'depthwise' (ref: conv.py:42-60)
    use_dc_path: bool = True
    dropout: float = 0.0
    # Numerical-stability contract (patched reference semantics, SURVEY.md §2.9.3):
    mu_clip: float = 50.0
    logvar_clip: tuple = (-30.0, 20.0)
    # GroupNorm on the encoder output before the mu/logvar heads. The reference
    # has no norm there (asymmetric with its own decoder's norm_out); the raw
    # encoder scale then grows unboundedly during training until the hard
    # clamps saturate (zero gradient) and logvar freezes at +20 — observed
    # divergence at ~7k steps. False = exact reference structure (required for
    # converted checkpoints); True recommended for training from scratch.
    norm_latents: bool = False
    # TPU execution policy.
    dtype: str = "bfloat16"  # compute dtype
    param_dtype: str = "float32"
    remat: bool = False  # per-block gradient checkpointing
    remat_resample: bool = False  # also remat Down/Upsample (max memory saving)
    # Rematerialization policy (ops/blocks.py resolve_remat_policy):
    # 'none' saves nothing (max memory saving); 'dots' saves non-batch matmul
    # outputs — measured 52% faster training than 'none' on v5e (base@256 b8:
    # 402 vs 610 ms/step); 'dots_all' also saves the batched attention
    # matmuls; 'conv_dots' additionally saves conv outputs so the backward
    # recomputes only elementwise chains (fastest, highest memory).
    remat_policy: str = "dots"
    # Compile each stage's block loop as one lax.scan body with stacked params
    # (smaller XLA program; required to compile large/huge/giant training
    # graphs). Param layout changes — see ops/stack.py converters.
    scan_blocks: bool = False
    # 'auto' (inference-tuned dispatch) | 'auto_train' (drops the Pallas flash
    # threshold to N=4096 so the backward saves O(N) instead of the O(N^2)
    # softmax weights — required for large-variant @256px training in 16 GB
    # HBM) | 'xla' | 'xla_chunked' | 'pallas' (force).
    attention_impl: str = "auto"
    # Context parallelism (SP): mesh axis name to shard the token axis over in
    # the transformer stages (ring attention via shard_map island). Live only
    # when model apply/jit runs under ``jax.set_mesh(mesh)`` with that axis;
    # otherwise falls back to single-device attention. Use with inputs whose
    # H dimension is sharded over the axis — the ≥1024px training path.
    context_axis: str | None = None
    # Int8 post-training quantization of the serving path ('int8' | None):
    # ResBlock convs + ConvFFN matmuls/convs run s8xs8->s32 on the MXU with
    # per-channel weight scales and static calibrated activation scales
    # (ops/quant.py). The param tree changes — build it with
    # deepl_project_tpu.quantize.quantize_model from a float checkpoint.
    # Inference-only; not supported with scan_blocks or tensor parallelism.
    quant: str | None = None
    # Which module families the int8 path covers: 'all' | 'resblock' | 'ffn'.
    # Measured on v5e (PERFORMANCE.md "Int8 PTQ"): the compute-bound b32
    # regime loses on the FFN sites in-model while ResBlock conv sites win
    # isolated; the weight-HBM-bound small-batch regime wins with 'all'.
    quant_scope: str = "all"
    # Internal: float forward that sows per-site activation absmax into the
    # 'intermediates' collection (the calibration pass of quantize_model).
    quant_calibrate: bool = False

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    @property
    def compression_ratio(self) -> int:
        return 2 ** (self.num_stages - 1)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def params_dtype(self):
        return jnp.dtype(self.param_dtype)

    def replace(self, **kw) -> "TransVAEConfig":
        return dataclasses.replace(self, **kw)


# Variant registry — (depths, base_dims) per stage; mlp_ratio=1.0, head_dim=64
# throughout (ref: transvae/models/transvae.py:110-147, paper Table 3).
VARIANTS: dict[str, dict] = {
    "tiny_f16d32": dict(
        depths=(3, 3, 3, 3, 3), base_dims=(128, 128, 256, 256, 512), latent_dim=32
    ),
    "base_f16d32": dict(
        depths=(3, 3, 3, 3, 3), base_dims=(128, 128, 256, 512, 1024), latent_dim=32
    ),
    "large_f16d32": dict(
        depths=(3, 3, 3, 4, 6), base_dims=(192, 192, 384, 768, 1536), latent_dim=32
    ),
    "huge_f16d32": dict(
        depths=(3, 3, 4, 6, 8), base_dims=(256, 256, 512, 1024, 2048), latent_dim=32
    ),
    "giant_f16d32": dict(
        depths=(3, 3, 4, 8, 10), base_dims=(320, 320, 640, 1280, 2560), latent_dim=32
    ),
    "large_f8d16": dict(
        depths=(3, 3, 6, 8), base_dims=(192, 384, 768, 1536), latent_dim=16
    ),
    "tiny_f8d16": dict(
        depths=(3, 3, 3, 3), base_dims=(128, 128, 256, 512), latent_dim=16
    ),
}


def get_config(
    variant: str = "large", compression_ratio: int = 16, latent_dim: int | None = None, **kw
) -> TransVAEConfig:
    """Resolve a variant name + f/d into a full config.

    Accepts either a bare variant ('large') with compression_ratio/latent_dim, or a
    full registry key ('large_f16d32').
    """
    if variant in VARIANTS:
        key = variant
    else:
        d = latent_dim if latent_dim is not None else (32 if compression_ratio == 16 else 16)
        key = f"{variant}_f{compression_ratio}d{d}"
    if key not in VARIANTS:
        raise ValueError(
            f"Unknown variant {variant!r} (f{compression_ratio}); known: {sorted(VARIANTS)}"
        )
    spec = dict(VARIANTS[key])
    if latent_dim is not None:
        spec["latent_dim"] = latent_dim
    spec.update(kw)
    return TransVAEConfig(variant=key, **spec)

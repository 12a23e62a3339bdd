"""Self-contained PyTorch LPIPS(VGG16) — a drop-in for the `lpips` package.

The reference computes its perceptual term through `lpips.LPIPS(net='vgg')`
(ref: patched/transvae/losses/vae_loss.py:52-54). That package is not
installed here and cannot be fetched (zero egress), which left
scripts/convert_lpips_weights.py dead code. This module reimplements the
exact network structure and formula from the LPIPS paper/package — written
from the specification in deepl_project_tpu/losses/lpips.py's docstring, no
code copied — exposing the same attribute surface the converter reads:

  net.net.slice1..slice5   torchvision-VGG16-layout Sequentials
                           (Conv2d/ReLU/MaxPool2d, features[0:4][4:9][9:16]
                           [16:23][23:30])
  net.lins[i].model[-1]    1x1 Conv2d(C, 1) linear head

With no pretrained state the trunk/head weights are seeded-random (converter
and JAX-parity tests run end-to-end); pass ``vgg_state_dict`` /
``lin_state_dict`` (torchvision VGG16 `features.*` and lpips `lin*.model.1.*`
tensors) to convert real weights on a machine that has them.
"""

from __future__ import annotations

import torch
import torch.nn as nn

# VGG16 feature layout (torchvision): conv widths with 'M' maxpools.
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)
# LPIPS tap channels at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3.
_TAP_CHANNELS = (64, 128, 256, 512, 512)
# features-index boundaries of the five slices (post-ReLU taps).
_SLICE_BOUNDS = (0, 4, 9, 16, 23, 30)

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _vgg16_features() -> nn.Sequential:
    layers: list[nn.Module] = []
    in_ch = 3
    for c in _VGG16_CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, c, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = c
    return nn.Sequential(*layers)


class _VGGSlices(nn.Module):
    def __init__(self, features: nn.Sequential):
        super().__init__()
        for i in range(5):
            lo, hi = _SLICE_BOUNDS[i], _SLICE_BOUNDS[i + 1]
            setattr(self, f"slice{i+1}",
                    nn.Sequential(*[features[j] for j in range(lo, hi)]))

    def forward(self, x: torch.Tensor) -> list[torch.Tensor]:
        taps = []
        h = x
        for i in range(5):
            h = getattr(self, f"slice{i+1}")(h)
            taps.append(h)
        return taps


class _LinHead(nn.Module):
    """lpips.NetLinLayer: Dropout + 1x1 conv to a single channel."""

    def __init__(self, in_ch: int):
        super().__init__()
        self.model = nn.Sequential(nn.Dropout(),
                                   nn.Conv2d(in_ch, 1, 1, bias=False))


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg', spatial=False) equivalent."""

    def __init__(self, net: str = "vgg", seed: int = 0,
                 vgg_state_dict: dict | None = None,
                 lin_state_dict: dict | None = None):
        super().__init__()
        assert net == "vgg", "only the VGG16 backbone is implemented"
        torch.manual_seed(seed)
        features = _vgg16_features()
        if vgg_state_dict is not None:
            features.load_state_dict(
                {k.removeprefix("features."): v
                 for k, v in vgg_state_dict.items()
                 if k.startswith("features.")})
        self.net = _VGGSlices(features)
        self.lins = nn.ModuleList([_LinHead(c) for c in _TAP_CHANNELS])
        if lin_state_dict is not None:
            for i, lin in enumerate(self.lins):
                w = lin_state_dict[f"lin{i}.model.1.weight"]
                lin.model[-1].weight.data.copy_(w)
        else:
            # Non-negative heads (trained LPIPS heads are non-negative).
            for lin in self.lins:
                lin.model[-1].weight.data.abs_()
        self.register_buffer(
            "shift", torch.tensor(_SHIFT).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor(_SCALE).view(1, 3, 1, 1))
        self.eval()
        for p in self.parameters():
            p.requires_grad_(False)

    @staticmethod
    def _unit_normalize(x: torch.Tensor, eps: float = 1e-10) -> torch.Tensor:
        norm = torch.sqrt(torch.sum(x * x, dim=1, keepdim=True))
        return x / (norm + eps)

    def forward(self, x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
        """x, y: NCHW in [-1, 1] → [B, 1, 1, 1] distances (lpips pkg shape)."""
        fx = self.net((x - self.shift) / self.scale)
        fy = self.net((y - self.shift) / self.scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (self._unit_normalize(a) - self._unit_normalize(b)) ** 2
            d = self.lins[i].model[-1](d)  # 1x1 head → [B,1,H,W]
            total = total + d.mean(dim=(2, 3), keepdim=True)
        return total

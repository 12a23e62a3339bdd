"""Self-contained PyTorch InceptionV3 feature extractor (torchvision layout).

Stands in for torchvision.models.inception_v3 / pytorch-fid's InceptionV3 in
this zero-egress environment so scripts/convert_inception_weights.py and the
JAX-parity tests run end-to-end. Built from the SAME architecture spec as the
JAX side (deepl_project_tpu/utils/inception_spec.py) — structure agreement is
by construction. Every conv is BasicConv2d (Conv2d bias=False + BatchNorm
eps=1e-3 + ReLU) with torchvision's state-dict naming, so a real torchvision
``inception_v3(weights=...).state_dict()`` loads directly via
``load_torchvision_state_dict``.
"""

from __future__ import annotations

import os
import sys

import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from deepl_project_tpu.utils.inception_spec import (  # noqa: E402
    BLOCKS, BN_EPS, conv_specs)


class BasicConv2d(nn.Module):
    def __init__(self, spec):
        super().__init__()
        cin, cout, k, s, p = spec
        self.conv = nn.Conv2d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=BN_EPS)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg_pool(x, count_include_pad):
    return F.avg_pool2d(x, 3, stride=1, padding=1,
                        count_include_pad=count_include_pad)


class InceptionV3Features(nn.Module):
    """pool3 feature extractor: NCHW in [-1,1] (299x299) → [B, 2048].

    ``fid_pools=True`` uses count_include_pad=False average pools
    (pytorch-fid's FID variant); False matches stock torchvision.
    """

    def __init__(self, seed: int = 0, fid_pools: bool = True):
        super().__init__()
        torch.manual_seed(seed)
        self.fid_pools = fid_pools
        specs = conv_specs()
        for name, spec in specs.items():
            obj = self
            parts = name.split(".")
            for part in parts[:-1]:
                if not hasattr(obj, part):
                    setattr(obj, part, nn.Module())
                obj = getattr(obj, part)
            setattr(obj, parts[-1], BasicConv2d(spec))
        # Randomized BN stats (not 0/1) so converter parity tests exercise
        # the BN fold; real weights overwrite these.
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                g = torch.Generator().manual_seed(seed + m.num_features)
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.data.uniform_(0.5, 1.5, generator=g)
                m.bias.data.uniform_(-0.2, 0.2, generator=g)
        self.eval()
        for p in self.parameters():
            p.requires_grad_(False)

    def _cv(self, name):
        obj = self
        for part in name.split("."):
            obj = getattr(obj, part)
        return obj

    def _block_a(self, p, x):
        b1 = self._cv(f"{p}.branch1x1")(x)
        b5 = self._cv(f"{p}.branch5x5_2")(self._cv(f"{p}.branch5x5_1")(x))
        bd = self._cv(f"{p}.branch3x3dbl_3")(
            self._cv(f"{p}.branch3x3dbl_2")(
                self._cv(f"{p}.branch3x3dbl_1")(x)))
        bp = self._cv(f"{p}.branch_pool")(
            _avg_pool(x, not self.fid_pools))
        return torch.cat([b1, b5, bd, bp], 1)

    def _block_b(self, p, x):
        b3 = self._cv(f"{p}.branch3x3")(x)
        bd = self._cv(f"{p}.branch3x3dbl_3")(
            self._cv(f"{p}.branch3x3dbl_2")(
                self._cv(f"{p}.branch3x3dbl_1")(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def _block_c(self, p, x):
        b1 = self._cv(f"{p}.branch1x1")(x)
        b7 = x
        for s in ("branch7x7_1", "branch7x7_2", "branch7x7_3"):
            b7 = self._cv(f"{p}.{s}")(b7)
        bd = x
        for s in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5"):
            bd = self._cv(f"{p}.{s}")(bd)
        bp = self._cv(f"{p}.branch_pool")(_avg_pool(x, not self.fid_pools))
        return torch.cat([b1, b7, bd, bp], 1)

    def _block_d(self, p, x):
        b3 = self._cv(f"{p}.branch3x3_2")(self._cv(f"{p}.branch3x3_1")(x))
        b7 = x
        for s in ("branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                  "branch7x7x3_4"):
            b7 = self._cv(f"{p}.{s}")(b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def _block_e(self, p, x):
        b1 = self._cv(f"{p}.branch1x1")(x)
        h = self._cv(f"{p}.branch3x3_1")(x)
        b3 = torch.cat([self._cv(f"{p}.branch3x3_2a")(h),
                        self._cv(f"{p}.branch3x3_2b")(h)], 1)
        h = self._cv(f"{p}.branch3x3dbl_2")(
            self._cv(f"{p}.branch3x3dbl_1")(x))
        bd = torch.cat([self._cv(f"{p}.branch3x3dbl_3a")(h),
                        self._cv(f"{p}.branch3x3dbl_3b")(h)], 1)
        bp = self._cv(f"{p}.branch_pool")(_avg_pool(x, not self.fid_pools))
        return torch.cat([b1, b3, bd, bp], 1)

    def forward(self, x):
        h = self.Conv2d_1a_3x3(x)
        h = self.Conv2d_2a_3x3(h)
        h = self.Conv2d_2b_3x3(h)
        h = F.max_pool2d(h, 3, 2)
        h = self.Conv2d_3b_1x1(h)
        h = self.Conv2d_4a_3x3(h)
        h = F.max_pool2d(h, 3, 2)
        fns = {"A": self._block_a, "B": self._block_b, "C": self._block_c,
               "D": self._block_d, "E": self._block_e}
        for name, kind in BLOCKS:
            h = fns[kind](name, h)
        return h.mean(dim=(2, 3))  # [B, 2048]

    def load_torchvision_state_dict(self, sd: dict):
        """Load a real torchvision inception_v3 state_dict (fc/AuxLogits
        entries ignored)."""
        own = {k: v for k, v in sd.items()
               if not k.startswith(("fc.", "AuxLogits."))
               and "num_batches_tracked" not in k}
        missing, unexpected = self.load_state_dict(own, strict=False)
        missing = [m for m in missing if "num_batches_tracked" not in m]
        assert not missing and not unexpected, (missing, unexpected)

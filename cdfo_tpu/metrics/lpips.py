"""LPIPS perceptual metric (flax) — reference vendors richzhang's torch
implementation (`/root/reference/opt/lpips/`, trunks in
`pretrained_networks.py:5-180`, scoring in `loss.py:19-120`, linear-head
weights shipped at `opt/weights/v0.{0,1}/{vgg,alex,squeeze}.pth`).

This is the NHWC flax rebuild: VGG16 / AlexNet feature trunks, per-layer
unit-normalisation, squared diff, 1x1 linear heads, spatial average.
Backbone weights load from a torchvision-format state_dict (torch .pth) —
the zero-egress environment ships none, so scores are only meaningful once
the user provides them; the module structure, conversion, and scoring
pipeline are complete and tested shape/behaviourally.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# ImageNet scaling used by LPIPS (`opt/lpips/loss.py` ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# indices (within conv list) after which LPIPS taps features (relu1_2 ...)
VGG16_TAPS = (1, 3, 6, 9, 12)
VGG16_CHS = (64, 128, 256, 512, 512)

ALEX_CHS = (64, 192, 384, 256, 256)
SQUEEZE_CHS = (64, 128, 256, 384, 384, 512, 512)


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_i = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{conv_i}")(x)
            x = jax.nn.relu(x)
            if conv_i in VGG16_TAPS:
                taps.append(x)
            conv_i += 1
        return taps


class AlexNetFeatures(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        specs = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
                 (256, 3, 1, 1), (256, 3, 1, 1)]
        for i, (ch, k, s, p) in enumerate(specs):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=p,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class _Fire(nn.Module):
    """SqueezeNet Fire: squeeze 1x1 -> relu -> (expand1x1 | expand3x3) ->
    relu -> concat (torchvision squeezenet1_1 building block)."""

    squeeze: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype,
                                param_dtype=jnp.float32, name="squeeze")(x))
        e1 = jax.nn.relu(nn.Conv(self.expand, (1, 1), dtype=self.dtype,
                                 param_dtype=jnp.float32, name="expand1")(x))
        e3 = jax.nn.relu(nn.Conv(self.expand, (3, 3), padding=1,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="expand3")(x))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision squeezenet1_1 feature trunk with the 7 LPIPS taps
    (`opt/lpips/pretrained_networks.py:5-54` slicing)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        x = jax.nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding=0,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name="conv0")(x))
        taps.append(x)                                   # relu1
        fire_specs = [(16, 64), (16, 64), (32, 128), (32, 128),
                      (48, 192), (48, 192), (64, 256), (64, 256)]
        pools_before = {0, 2, 4}   # maxpool before fires 3, 6, 9 (tv idx)
        tap_after = {1, 3, 4, 5, 6, 7}
        for i, (sq, ex) in enumerate(fire_specs):
            if i in pools_before:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = _Fire(sq, ex, dtype=self.dtype, name=f"fire{i}")(x)
            if i in tap_after:
                taps.append(x)
        return taps  # 7 taps: relu1, fire4, fire7, fire9, fire10-12


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (n + eps)


class LPIPS(nn.Module):
    """forward(x, y) -> per-sample LPIPS distance. x, y: (B, H, W, 3) RGB
    in [-1, 1] (set normalize_input=True for [0, 1] inputs)."""

    net: str = "vgg"
    normalize_input: bool = False
    spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        if self.normalize_input:
            x = 2 * x - 1
            y = 2 * y - 1
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x = (x - shift) / scale
        y = (y - shift) / scale
        trunk = {"vgg": VGG16Features, "alex": AlexNetFeatures,
                 "squeeze": SqueezeNetFeatures}[self.net](
            dtype=self.dtype, name="net")
        fx = trunk(x)
        fy = trunk(y)
        chs = {"vgg": VGG16_CHS, "alex": ALEX_CHS,
               "squeeze": SQUEEZE_CHS}[self.net]
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"lin{i}")(d)
            if self.spatial:
                total = total + lin
            else:
                total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def load_torch_weights(params, backbone_path: Optional[str] = None,
                       heads_path: Optional[str] = None, net: str = "vgg"):
    """Fill LPIPS params from torch files: torchvision backbone state_dict
    (``vgg16-397923af.pth`` style) and richzhang linear heads
    (``opt/weights/v0.1/vgg.pth`` — keys ``lin{i}.model.1.weight``)."""
    import torch

    params = jax.tree.map(np.asarray, params)
    p = params["params"]
    if backbone_path:
        sd = torch.load(backbone_path, map_location="cpu", weights_only=True)
        conv_keys = [k for k in sd if k.endswith(".weight") and sd[k].ndim == 4]
        for i, k in enumerate(sorted(conv_keys,
                                     key=lambda s: int(s.split(".")[1]))):
            name = f"conv{i}"
            if name not in p["net"]:
                break
            p["net"][name]["kernel"] = sd[k].numpy().transpose(2, 3, 1, 0)
            bk = k[:-len("weight")] + "bias"
            p["net"][name]["bias"] = sd[bk].numpy()
    if heads_path:
        sd = torch.load(heads_path, map_location="cpu", weights_only=True)
        for i in range(7 if net == "squeeze" else 5):
            key = f"lin{i}.model.1.weight"
            if key in sd:
                p[f"lin{i}"]["kernel"] = sd[key].numpy().transpose(2, 3, 1, 0)
    return jax.tree.map(jnp.asarray, params)

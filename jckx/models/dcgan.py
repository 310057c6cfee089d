"""DCGAN generator / discriminator — pure-functional, NHWC, TPU-first.

Capability parity with reference ``model/DCGAN.py``:

- Generator (DCGAN.py:38-67): z(100) → 4×4×512 → 8×8×256 → 16×16×128 →
  32×32×64 → 64×64×C via five bias-free ConvTranspose2d(k4) with BN+ReLU
  between and tanh out. Spatial 1→4 uses k4 s1 p0; each doubling k4 s2 p1.
- Discriminator (DCGAN.py:6-35): mirror with Conv2d(k4 s2 p1) + BN +
  LeakyReLU(0.2) — including the reference's nonstandard BN on the first
  conv block — and a final Conv2d(512→1, k4 s1 p0). The reference applies a
  sigmoid in the module; here ``apply`` returns LOGITS (the losses and the
  gradient penalty apply the sigmoid where the reference semantics need it).
- Init law = ``weights_init`` (DCGAN.py:70-76): conv N(0,.02), BN N(1,.02)/0.

Design departures (TPU-first, not a port):
- pure functions over a param pytree — no mutable modules; one jitted fused
  step owns the whole G/D update,
- NHWC activations / HWIO kernels (MXU-native layout),
- BatchNorm is train-mode batch-stats always (the reference never switches
  its GAN models to eval mode), computed in f32,
- geometry generalized: any power-of-two ``image_size`` ≥ 8 and any channel
  count (MNIST 1-ch / CIFAR 3-ch), reference defaults preserved.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from jckx.ops.conv import conv2d, conv_transpose2d
from jckx.ops.init import bn_scale_init, conv_init
from jckx.kernels.fused_bn_act import bn_act

Params = Dict[str, jax.Array]


@dataclass(frozen=True)
class GANGeometry:
    z_dim: int = 100
    image_size: int = 64
    channels: int = 3
    base_width: int = 64

    @property
    def n_up(self) -> int:
        n = int(math.log2(self.image_size)) - 2
        if 2 ** (n + 2) != self.image_size or n < 1:
            raise ValueError(f"image_size must be a power of two >= 8, got {self.image_size}")
        return n

    def stage_widths(self) -> list:
        # widths at 4x4, 8x8, ... (reference: 512,256,128,64 for 64x64)
        return [self.base_width * 2 ** (self.n_up - 1 - i) for i in range(self.n_up)]


# ----------------------------------------------------------------- Generator

def generator_init(key: jax.Array, geo: GANGeometry = GANGeometry(), in_dim: int | None = None) -> Params:
    """``in_dim`` overrides the first-layer input channels (CGAN passes z+label)."""
    widths = geo.stage_widths()
    in_ch = in_dim if in_dim is not None else geo.z_dim
    params: Params = {}
    keys = jax.random.split(key, geo.n_up + 1 + geo.n_up)
    ki = 0
    prev = in_ch
    for i, w in enumerate(widths):
        params[f"convt{i}"] = conv_init(keys[ki], (4, 4, prev, w)); ki += 1
        params[f"bn{i}_scale"] = bn_scale_init(keys[ki], (w,)); ki += 1
        params[f"bn{i}_bias"] = jnp.zeros((w,))
        prev = w
    params["convt_out"] = conv_init(keys[ki], (4, 4, prev, geo.channels))
    return params


def generator_apply(
    params: Params,
    z: jax.Array,
    geo: GANGeometry = GANGeometry(),
    compute_dtype=jnp.float32,
) -> jax.Array:
    """z: (N, zdim) or (N, 1, 1, zdim) → images (N, S, S, C) in [-1, 1]."""
    if z.ndim == 2:
        z = z[:, None, None, :]
    x = z.astype(compute_dtype)
    for i in range(geo.n_up):
        w = params[f"convt{i}"].astype(compute_dtype)
        stride, pad = (1, 0) if i == 0 else (2, 1)
        x = conv_transpose2d(x, w, stride=stride, padding=pad)
        x = bn_act(x, params[f"bn{i}_scale"], params[f"bn{i}_bias"], act="relu")
    x = conv_transpose2d(x, params["convt_out"].astype(compute_dtype), stride=2, padding=1)
    return jnp.tanh(x.astype(jnp.float32)).astype(compute_dtype)


# ------------------------------------------------------------- Discriminator

def discriminator_init(key: jax.Array, geo: GANGeometry = GANGeometry()) -> Params:
    widths = list(reversed(geo.stage_widths()))  # 64,128,256,512 for 64x64
    params: Params = {}
    keys = jax.random.split(key, 2 * len(widths) + 1)
    ki = 0
    prev = geo.channels
    for i, w in enumerate(widths):
        params[f"conv{i}"] = conv_init(keys[ki], (4, 4, prev, w)); ki += 1
        params[f"bn{i}_scale"] = bn_scale_init(keys[ki], (w,)); ki += 1
        params[f"bn{i}_bias"] = jnp.zeros((w,))
        prev = w
    params["conv_out"] = conv_init(keys[ki], (4, 4, prev, 1))
    return params


def discriminator_apply(
    params: Params,
    x: jax.Array,
    geo: GANGeometry = GANGeometry(),
    compute_dtype=jnp.float32,
) -> jax.Array:
    """images (N, S, S, C) → per-sample LOGITS (N,).

    The reference module ends in sigmoid (DCGAN.py:28,34); callers here apply
    ``jax.nn.sigmoid`` where scores are needed (loss / GP / D(x) telemetry).
    """
    x = x.astype(compute_dtype)
    for i in range(geo.n_up):
        x = conv2d(x, params[f"conv{i}"].astype(compute_dtype), stride=2, padding=1)
        x = bn_act(x, params[f"bn{i}_scale"], params[f"bn{i}_bias"], act="leaky_relu", negative_slope=0.2)
    x = conv2d(x, params["conv_out"].astype(compute_dtype), stride=1, padding=0)
    return x.reshape(x.shape[0]).astype(jnp.float32)


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def summary(params: Params, name: str) -> str:
    """torchinfo.summary analog (reference logs it at trainer init,
    dcgan_trainer.py:51-53): per-tensor shapes + total parameter count."""
    lines = [f"{name} parameters:"]
    for k in sorted(params):
        lines.append(f"  {k:18s} {tuple(params[k].shape)}")
    lines.append(f"  total: {param_count(params):,}")
    return "\n".join(lines)

"""Conditional GAN (CGAN) — pure-functional, NHWC, TPU-first.

Capability parity with reference ``model/CGAN.py`` (the live classes at
:79-162, not the commented-out v1):

- Generator (CGAN.py:126-162): one-hot label (N, K) is reshaped to a 1×1
  spatial map and channel-concatenated with z → (N, 1, 1, z+K) into the same
  five-layer ConvTranspose stack as DCGAN (200→512→…→C for K=100), tanh out.
- Discriminator (CGAN.py:79-123): the image runs through four conv blocks
  (C→64→128→256→512, each k4 s2 p1 + BN + LeakyReLU(0.2)) and is flattened
  (8192 at 64×64); the label runs through Linear(K→2K)+LeakyReLU(0.2); the
  two are concatenated and fused by Linear(8192+2K→256) → Dropout(0.25) →
  Linear(256→1). Reference ends in sigmoid; ``apply`` returns LOGITS.
- Init: convs/BN via ``weights_init`` law; Linears keep torch-default
  Kaiming-uniform (weights_init matches only Conv/BatchNorm names,
  CGAN.py:165-171) — reproduced via ``linear_init``.

Dropout needs randomness: ``discriminator_apply`` takes an optional
``dropout_key`` (None ⇒ eval-mode identity, matching torch eval semantics;
the reference trains with dropout active, so the trainer always passes one).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from jckx.kernels.fused_bn_act import bn_act
from jckx.models.dcgan import GANGeometry, generator_apply, generator_init
from jckx.ops.conv import conv2d
from jckx.ops.init import bn_scale_init, conv_init, linear_init

Params = Dict[str, jax.Array]


# ----------------------------------------------------------------- Generator

def cgenerator_init(key: jax.Array, geo: GANGeometry = GANGeometry(), num_classes: int = 100) -> Params:
    """Same stack as DCGAN's generator with in_dim = z_dim + num_classes."""
    return generator_init(key, geo, in_dim=geo.z_dim + num_classes)


def cgenerator_apply(
    params: Params,
    z: jax.Array,
    labels_onehot: jax.Array,
    geo: GANGeometry = GANGeometry(),
    compute_dtype=jnp.float32,
) -> jax.Array:
    """z (N, zdim) or (N,1,1,zdim); labels (N, K) one-hot → images in [-1,1].

    Reference concatenates along channels at 1×1 (CGAN.py:154-155).
    """
    if z.ndim == 4:
        z = z.reshape(z.shape[0], -1)
    zin = jnp.concatenate([z, labels_onehot.astype(z.dtype)], axis=-1)
    return generator_apply(params, zin, geo, compute_dtype)


# ------------------------------------------------------------- Discriminator

def cdiscriminator_init(
    key: jax.Array, geo: GANGeometry = GANGeometry(), num_classes: int = 100
) -> Params:
    widths = list(reversed(geo.stage_widths()))  # 64,128,256,512 for 64x64
    params: Params = {}
    keys = jax.random.split(key, 2 * len(widths) + 3)
    ki = 0
    prev = geo.channels
    for i, w in enumerate(widths):
        params[f"conv{i}"] = conv_init(keys[ki], (4, 4, prev, w)); ki += 1
        params[f"bn{i}_scale"] = bn_scale_init(keys[ki], (w,)); ki += 1
        params[f"bn{i}_bias"] = jnp.zeros((w,))
        prev = w
    flat = 4 * 4 * widths[-1]  # 8192 at 64x64 (CGAN.py:112)
    emb = 2 * num_classes      # Linear(100→200) at K=100 (CGAN.py:83)
    params["label_w"], params["label_b"] = linear_init(keys[ki], num_classes, emb); ki += 1
    params["fc1_w"], params["fc1_b"] = linear_init(keys[ki], flat + emb, 256); ki += 1
    params["fc2_w"], params["fc2_b"] = linear_init(keys[ki], 256, 1)
    return params


def cdiscriminator_apply(
    params: Params,
    x: jax.Array,
    labels_onehot: jax.Array,
    geo: GANGeometry = GANGeometry(),
    compute_dtype=jnp.float32,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = 0.25,
) -> jax.Array:
    """images (N,S,S,C), labels (N,K) → per-sample LOGITS (N,)."""
    x = x.astype(compute_dtype)
    for i in range(geo.n_up):
        x = conv2d(x, params[f"conv{i}"].astype(compute_dtype), stride=2, padding=1)
        x = bn_act(x, params[f"bn{i}_scale"], params[f"bn{i}_bias"], act="leaky_relu", negative_slope=0.2)
    feat = x.reshape(x.shape[0], -1).astype(jnp.float32)

    lab = labels_onehot.astype(jnp.float32) @ params["label_w"] + params["label_b"]
    lab = jnp.where(lab >= 0, lab, 0.2 * lab)  # LeakyReLU(0.2), CGAN.py:84

    h = jnp.concatenate([feat, lab], axis=-1)
    h = h @ params["fc1_w"] + params["fc1_b"]
    if dropout_key is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    out = h @ params["fc2_w"] + params["fc2_b"]
    return out.reshape(out.shape[0])

"""GAN losses and regularizers.

Reference semantics reproduced:
- BCE on sigmoid outputs vs smoothed labels 0.9 / 0.1 (nn.BCELoss,
  train/dcgan_trainer.py:64,136-137). We keep logits until the loss and use
  the numerically stable log-sigmoid form — identical value, no saturation.
- instance noise: ``0.9 * x + 0.1 * N(0, 1)`` on both real and fake batches
  (dcgan_trainer.py:160,171).
- WGAN-GP gradient penalty on the *sigmoid* output of D at random
  interpolates (dcgan_trainer.py:110-127): grad is taken of the post-sigmoid
  score, matching the reference exactly (NOT the usual on-logits WGAN-GP).
  Double differentiation is jax.grad-through-jax.grad inside one jitted step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def bce_from_logits(logits: jax.Array, target: jax.Array | float) -> jax.Array:
    """mean BCE(sigmoid(logits), target) — stable log-sigmoid formulation.

    Equals torch nn.BCELoss()(sigmoid(logits), target) up to the clamp torch
    applies at log(0) (unreachable from a sigmoid in f32).
    """
    logits = logits.astype(jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    # BCE = -t*log σ(l) - (1-t)*log(1-σ(l)) = softplus(l) - t*l
    return jnp.mean(jax.nn.softplus(logits) - target * logits)


def instance_noise_blend(key: jax.Array, x: jax.Array, noise_frac: float = 0.1) -> jax.Array:
    """``(1-f)*x + f*N(0,1)`` — reference instance-noise trick (f=0.1)."""
    n = jax.random.normal(key, x.shape, jnp.float32).astype(x.dtype)
    return (1.0 - noise_frac) * x + noise_frac * n


def gradient_penalty(
    d_score_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    real: jax.Array,
    fake: jax.Array,
) -> jax.Array:
    """WGAN-GP penalty ``mean((||∇_x D(x̂)||₂ - 1)²)`` at x̂ = α·real + (1-α)·fake.

    ``d_score_fn`` must map a batch of images to per-sample *sigmoid* scores
    (shape (N,)) to match reference dcgan_trainer.py:114-121, where autograd
    pulls gradients of the post-sigmoid output. α ~ U[0,1) per sample.
    """
    n = real.shape[0]
    alpha = jax.random.uniform(key, (n, 1, 1, 1), jnp.float32).astype(real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    # Per-sample input gradient via vjp with a ones cotangent — the exact
    # analog of torch.autograd.grad(outputs, inputs, grad_outputs=ones).
    def total_score(x):
        return jnp.sum(d_score_fn(x))

    grads = jax.grad(total_score)(interp)
    grads = grads.reshape(n, -1).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1) + 1e-24)
    return jnp.mean(jnp.square(norms - 1.0))

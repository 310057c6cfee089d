"""Fused train-mode BN+ReLU (ops/norm.bn_relu_train) — numeric agreement
of the hand-written VJP with autodiff of the naive composition.

The op backs the InceptionV3 fine-tune step (SURVEY §2 #18); reference
semantics: torchvision BasicConv2d train-mode BN (batch stats, eps=1e-3)
followed by in-place ReLU (torchvision/models/inception.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jckx.ops.norm import bn_relu_train


def _naive(x, scale, bias, eps=1e-3):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x.dtype), mean, var


def _rand(seed, *shape):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("shape", [(8, 6, 6, 5), (32, 7)])
def test_forward_matches_naive(shape):
    x = jnp.asarray(_rand(0, *shape))
    s = jnp.asarray(_rand(1, shape[-1]) * 0.3 + 1.0)
    b = jnp.asarray(_rand(2, shape[-1]))
    out, mean, var = bn_relu_train(x, s, b)
    ref_out, ref_mean, ref_var = _naive(x, s, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var), rtol=1e-5, atol=1e-5)


def test_grad_matches_autodiff_of_naive():
    x = jnp.asarray(_rand(3, 4, 5, 5, 6))
    s = jnp.asarray(_rand(4, 6) * 0.3 + 1.0)
    b = jnp.asarray(_rand(5, 6))
    w = jnp.asarray(_rand(6, 4, 5, 5, 6))  # fixed cotangent-shaping weights

    def loss_fused(x, s, b):
        out, _, _ = bn_relu_train(x, s, b)
        return jnp.sum(out.astype(jnp.float32) * w)

    def loss_naive(x, s, b):
        out, _, _ = _naive(x, s, b)
        return jnp.sum(out.astype(jnp.float32) * w)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(x, s, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5)


def test_stats_carry_no_gradient():
    """mean/var are running-stat outputs: torch semantics give them no
    gradient; a loss that consumes ONLY them must see zero dx."""
    x = jnp.asarray(_rand(7, 8, 4))
    s = jnp.ones((4,))
    b = jnp.zeros((4,))

    def loss(x):
        _, mean, var = bn_relu_train(x, s, b)
        return jnp.sum(mean) + jnp.sum(var)

    dx = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(dx), 0.0, atol=0.0)


def test_bf16_input_grad_close_to_f32():
    x32 = _rand(8, 16, 3, 3, 8)
    x = jnp.asarray(x32, dtype=jnp.bfloat16)
    s = jnp.asarray(_rand(9, 8) * 0.3 + 1.0)
    b = jnp.asarray(_rand(10, 8))

    def loss(x, s, b):
        out, _, _ = bn_relu_train(x, s, b)
        return jnp.sum(out.astype(jnp.float32))

    gx, gs, gb = jax.grad(loss, argnums=(0, 1, 2))(x, s, b)
    assert gx.dtype == jnp.bfloat16
    rx, rs, rb = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(x32, jnp.float32), s, b)
    np.testing.assert_allclose(np.asarray(gx, dtype=np.float32),
                               np.asarray(rx), rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=0.05, atol=0.05)


def test_sharded_batch_matches_single_device():
    """The moment sweeps reduce over the original axes, so a batch-sharded
    input lowers to per-shard partials + all-reduce (sync-BN) and must
    agree with the unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    x = jnp.asarray(_rand(20, 16, 4, 4, 8))
    s = jnp.asarray(_rand(21, 8) * 0.3 + 1.0)
    b = jnp.asarray(_rand(22, 8))

    def loss(x, s, b):
        out, mean, var = bn_relu_train(x, s, b)
        return jnp.sum(out.astype(jnp.float32)), (mean, var)

    (l0, (m0, v0)), g0 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                            has_aux=True)(x, s, b)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    (l1, (m1, v1)), g1 = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)
    )(xs, s, b)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5, atol=1e-6)
    for a, r in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5)

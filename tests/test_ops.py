"""Numeric parity of jckx ops against torch (CPU) — the golden source for
the reference's Conv2d / ConvTranspose2d / BatchNorm2d / BCELoss semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tf

from jckx.ops.conv import conv2d, conv_transpose2d
from jckx.ops.losses import bce_from_logits, gradient_penalty, instance_noise_blend
from jckx.ops.norm import batch_norm

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


# Conv parity runs in float64 (jax x64 mode): XLA-CPU's oneDNN backend picks
# fast f32 conv algorithms (Winograd-class, ~1e-3 rel error) at larger sizes,
# which would make an f32 bitwise comparison test the algorithm, not our op.
@pytest.mark.parametrize("stride,pad,hw", [(2, 1, 64), (1, 0, 4), (2, 1, 8)])
def test_conv2d_matches_torch(stride, pad, hw):
    x = _rand(2, hw, hw, 3, seed=1).astype(np.float64)
    w = _rand(4, 4, 3, 5, seed=2).astype(np.float64)  # HWIO
    with jax.enable_x64(True):
        ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride, pad))
    # torch: NCHW, OIHW
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    ref = tf.conv2d(xt, wt, stride=stride, padding=pad).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("stride,pad,hw", [(1, 0, 1), (2, 1, 4), (2, 1, 32)])
def test_conv_transpose2d_matches_torch(stride, pad, hw):
    x = _rand(2, hw, hw, 6, seed=3).astype(np.float64)
    w = _rand(4, 4, 6, 4, seed=4).astype(np.float64)  # (kh, kw, Cin, Cout)
    with jax.enable_x64(True):
        ours = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w), stride, pad))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # torch ConvTranspose2d weight layout: (Cin, Cout, kh, kw)
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    ref = tf.conv_transpose2d(xt, wt, stride=stride, padding=pad).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("hw,cin,cout", [(1, 3, 5), (4, 6, 4), (32, 8, 3)])
def test_conv_transpose2d_subpixel_equals_dilated(hw, cin, cout):
    """The kernel-segregated (sub-pixel) k4/s2/p1 form computes the same
    dot products as the input-dilated form, only regrouped — exact in f64,
    including against torch."""
    from jckx.ops.conv import subpixel_inference

    x = _rand(2, hw, hw, cin, seed=11).astype(np.float64)
    w = _rand(4, 4, cin, cout, seed=12).astype(np.float64)
    with jax.enable_x64(True):
        dilated = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w), 2, 1))
        with subpixel_inference():
            sub = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w), 2, 1))
            # non-matching geometry (k4 s1 p0, the z-projection layer) must
            # fall through to the dilated path unchanged
            w1 = _rand(4, 4, cin, cout, seed=13).astype(np.float64)
            z = _rand(2, 1, 1, cin, seed=14).astype(np.float64)
            proj = np.asarray(conv_transpose2d(jnp.asarray(z), jnp.asarray(w1), 1, 0))
    assert sub.shape == dilated.shape == (2, 2 * hw, 2 * hw, cout)
    np.testing.assert_allclose(sub, dilated, rtol=1e-12, atol=1e-12)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    ref = tf.conv_transpose2d(xt, wt, stride=2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(sub, ref, rtol=1e-10, atol=1e-10)
    assert proj.shape == (2, 4, 4, cout)


def test_subpixel_scope_generator_forward_identical(tmp_path):
    """Full DCGAN generator forward under the sub-pixel scope ≡ the dilated
    default (f32: same products, regrouped sums → tiny tolerance)."""
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.ops.conv import subpixel_inference

    geo = GANGeometry(image_size=32, base_width=16)
    params = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, geo.z_dim))
    base = np.asarray(dcgan.generator_apply(params, z, geo, jnp.float32))
    with subpixel_inference():
        sub = np.asarray(jax.jit(
            lambda p, zz: dcgan.generator_apply(p, zz, geo, jnp.float32)
        )(params, z))
    assert sub.shape == base.shape
    np.testing.assert_allclose(sub, base, rtol=1e-5, atol=1e-5)


def test_conv_transpose_output_size_law():
    # torch: out = (in-1)*s - 2p + k  — the DCGAN G geometry (1→4→8→...→64)
    w1 = jnp.zeros((4, 4, 100, 512))
    y = conv_transpose2d(jnp.zeros((1, 1, 1, 100)), w1, 1, 0)
    assert y.shape == (1, 4, 4, 512)
    w2 = jnp.zeros((4, 4, 512, 256))
    y = conv_transpose2d(jnp.zeros((1, 4, 4, 512)), w2, 2, 1)
    assert y.shape == (1, 8, 8, 256)


def test_batch_norm_matches_torch_train_mode():
    x = _rand(8, 6, 6, 5, seed=5)
    scale = _rand(5, seed=6)
    bias = _rand(5, seed=7)
    ours = np.asarray(batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    bn = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
    bn.train()
    ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_batch_norm_running_stats_match_torch():
    x = _rand(8, 6, 6, 5, seed=8)
    scale, bias = np.ones(5, np.float32), np.zeros(5, np.float32)
    run = (jnp.zeros(5), jnp.ones(5))
    _, (m, v) = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), running=run)
    bn = torch.nn.BatchNorm2d(5)
    bn.train()
    bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(m), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_bce_from_logits_matches_torch_bceloss():
    logits = _rand(32, seed=9)
    for target in (0.9, 0.1):
        ours = float(bce_from_logits(jnp.asarray(logits), target))
        lt = torch.from_numpy(logits)
        ref = torch.nn.BCELoss()(torch.sigmoid(lt), torch.full((32,), target)).item()
        assert abs(ours - ref) < 1e-5


def test_instance_noise_blend_stats():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((64, 8, 8, 3))
    y = instance_noise_blend(key, x, 0.1)
    # 0.9*0 + 0.1*N(0,1) → std ≈ 0.1
    assert abs(float(jnp.std(y)) - 0.1) < 0.01


def test_gradient_penalty_quadratic_function():
    # D(x) = c^T x per-sample ⇒ grad = c, penalty = (||c|| - 1)^2 exactly.
    c = _rand(4, 4, 3, seed=10)
    cn = float(np.sqrt((c ** 2).sum()))

    def d_fn(x):
        return jnp.sum(x * jnp.asarray(c), axis=(1, 2, 3))

    key = jax.random.PRNGKey(1)
    real = jnp.asarray(_rand(6, 4, 4, 3, seed=11))
    fake = jnp.asarray(_rand(6, 4, 4, 3, seed=12))
    gp = float(gradient_penalty(d_fn, key, real, fake))
    assert abs(gp - (cn - 1.0) ** 2) < 1e-4


def test_gradient_penalty_is_twice_differentiable():
    # The D-step needs grad-of-(loss incl. GP) wrt params: grad through grad.
    w0 = jnp.asarray(_rand(48, seed=13))

    def loss(w):
        def d_fn(x):
            return x.reshape(x.shape[0], -1) @ w

        key = jax.random.PRNGKey(2)
        real = jnp.asarray(_rand(4, 4, 4, 3, seed=14))
        fake = jnp.asarray(_rand(4, 4, 4, 3, seed=15))
        return gradient_penalty(d_fn, key, real, fake)

    g = jax.grad(loss)(w0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

"""Shape / init-law / conditioning tests for the DCGAN & CGAN nets
(SURVEY.md §4: the reference had none; these are the rebuild's gap-fill)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry


def test_generator_shapes_64():
    geo = GANGeometry()
    params = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    img = dcgan.generator_apply(params, z, geo)
    assert img.shape == (2, 64, 64, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0


@pytest.mark.parametrize("size,ch", [(32, 3), (64, 1), (128, 3)])
def test_generator_geometry_generalizes(size, ch):
    geo = GANGeometry(image_size=size, channels=ch)
    params = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    img = dcgan.generator_apply(params, jnp.zeros((1, 100)), geo)
    assert img.shape == (1, size, size, ch)


def test_generator_layer_widths_match_reference():
    # reference G: 100→512→256→128→64→3 (model/DCGAN.py:42-58)
    params = dcgan.generator_init(jax.random.PRNGKey(0))
    assert params["convt0"].shape == (4, 4, 100, 512)
    assert params["convt1"].shape == (4, 4, 512, 256)
    assert params["convt2"].shape == (4, 4, 256, 128)
    assert params["convt3"].shape == (4, 4, 128, 64)
    assert params["convt_out"].shape == (4, 4, 64, 3)


def test_discriminator_shapes_and_widths():
    # reference D: 3→64→128→256→512→1 (model/DCGAN.py:10-28)
    geo = GANGeometry()
    params = dcgan.discriminator_init(jax.random.PRNGKey(0), geo)
    assert params["conv0"].shape == (4, 4, 3, 64)
    assert params["conv3"].shape == (4, 4, 256, 512)
    assert params["conv_out"].shape == (4, 4, 512, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    logits = dcgan.discriminator_apply(params, x, geo)
    assert logits.shape == (4,)


def test_weights_init_law():
    # conv ~ N(0, .02); BN scale ~ N(1, .02); BN bias 0 (DCGAN.py:70-76)
    params = dcgan.generator_init(jax.random.PRNGKey(42))
    w = np.asarray(params["convt1"]).ravel()
    assert abs(w.mean()) < 3 * 0.02 / np.sqrt(w.size) * 3 + 1e-3
    assert abs(w.std() - 0.02) < 0.002
    s = np.asarray(params["bn1_scale"])
    assert abs(s.mean() - 1.0) < 0.01
    assert abs(s.std() - 0.02) < 0.005
    assert np.all(np.asarray(params["bn1_bias"]) == 0)


def test_cgan_generator_conditioning():
    geo = GANGeometry()
    params = cgan.cgenerator_init(jax.random.PRNGKey(0), geo, num_classes=100)
    assert params["convt0"].shape == (4, 4, 200, 512)  # CGAN.py:133 (200→512)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    lab1 = jax.nn.one_hot(jnp.array([3, 7]), 100)
    lab2 = jax.nn.one_hot(jnp.array([5, 7]), 100)
    img1 = cgan.cgenerator_apply(params, z, lab1, geo)
    img2 = cgan.cgenerator_apply(params, z, lab2, geo)
    assert img1.shape == (2, 64, 64, 3)
    # label change must change output for the changed row only
    assert float(jnp.abs(img1[0] - img2[0]).max()) > 1e-4
    # row 1 identical labels... BN couples batch rows, so just check shape sanity
    assert np.isfinite(np.asarray(img1)).all()


def test_cgan_discriminator_paths():
    geo = GANGeometry()
    params = cgan.cdiscriminator_init(jax.random.PRNGKey(0), geo, num_classes=100)
    assert params["fc1_w"].shape == (8192 + 200, 256)  # CGAN.py:112-113
    assert params["label_w"].shape == (100, 200)       # CGAN.py:83
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    lab = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 100)
    logits_eval = cgan.cdiscriminator_apply(params, x, lab, geo)
    assert logits_eval.shape == (4,)
    logits_train = cgan.cdiscriminator_apply(
        params, x, lab, geo, dropout_key=jax.random.PRNGKey(2)
    )
    # dropout active ⇒ differs from eval path
    assert float(jnp.abs(logits_eval - logits_train).max()) > 1e-6


def test_models_jit_and_grad():
    geo = GANGeometry(image_size=32)
    gp = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    dp = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)

    @jax.jit
    def loss(gp, dp, z):
        img = dcgan.generator_apply(gp, z, geo)
        return jnp.mean(dcgan.discriminator_apply(dp, img, geo))

    g = jax.grad(loss)(gp, dp, jnp.ones((2, 100)))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)

"""FULL-MODEL forward parity vs torch replicas of the reference nets.

The op-level goldens (tests/test_ops.py) prove conv/convT/BN/BCE semantics
one op at a time; these tests prove the WIRING — five-layer stacks, stride/
padding placement, BN-before-activation ordering, the CGAN label paths and
8192-flatten — by running the whole jckx generator/discriminator and a
torch replica of the reference architecture (model/DCGAN.py:6-67,
model/CGAN.py:79-162) with identical weights and inputs.

Torch replicas are built HERE from the architecture spec (bias-free convs,
BN train mode = batch stats, LeakyReLU 0.2) — nothing is loaded from the
reference repo. Weight layout maps follow tests/test_ops.py: HWIO→OIHW for
conv, (kh,kw,Ci,Co)→(Ci,Co,kh,kw) for convT, (in,out)→(out,in) for linear.

Tolerance: run in f32 with rtol/atol 3e-3 — XLA-CPU's oneDNN conv picks
Winograd-class algorithms (~1e-3 rel error vs exact), and the error
compounds over 5 layers. A wiring mistake produces O(1) disagreement, so
the tolerance still separates signal from noise by 3 orders of magnitude.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry

GEO = GANGeometry()  # reference 64x64 RGB geometry
TOL = dict(rtol=3e-3, atol=3e-3)


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _conv_w(p):  # HWIO -> OIHW
    return _t(np.transpose(np.asarray(p), (3, 2, 0, 1)))


def _convt_w(p):  # (kh,kw,Ci,Co) -> (Ci,Co,kh,kw)
    return _t(np.transpose(np.asarray(p), (2, 3, 0, 1)))


def _load_bn(bn, scale, bias):
    with torch.no_grad():
        bn.weight.copy_(_t(scale))
        bn.bias.copy_(_t(bias))
    bn.train()  # reference never calls .eval(): BN always uses batch stats


def _torch_generator(params, in_ch, geo=GEO):
    """Reference G (model/DCGAN.py:38-67): 5x bias-free ConvTranspose2d(k4),
    BN+ReLU between, tanh out; spatial 1->4 via s1 p0, then s2 p1."""
    widths = geo.stage_widths()  # 512,256,128,64 at the reference geometry
    layers = []
    prev = in_ch
    for i, w in enumerate(widths):
        s, p = (1, 0) if i == 0 else (2, 1)
        ct = nn.ConvTranspose2d(prev, w, 4, s, p, bias=False)
        with torch.no_grad():
            ct.weight.copy_(_convt_w(params[f"convt{i}"]))
        bn = nn.BatchNorm2d(w)
        _load_bn(bn, params[f"bn{i}_scale"], params[f"bn{i}_bias"])
        layers += [ct, bn, nn.ReLU()]
        prev = w
    ct = nn.ConvTranspose2d(prev, geo.channels, 4, 2, 1, bias=False)
    with torch.no_grad():
        ct.weight.copy_(_convt_w(params["convt_out"]))
    layers += [ct, nn.Tanh()]
    return nn.Sequential(*layers).train()


def _torch_discriminator_convs(params, geo=GEO):
    """Reference D conv trunk (model/DCGAN.py:6-27 / CGAN.py:85-110):
    4x bias-free Conv2d(k4 s2 p1) + BN (incl. the nonstandard BN on block
    1) + LeakyReLU(0.2)."""
    widths = list(reversed(geo.stage_widths()))  # 64,128,256,512
    layers = []
    prev = geo.channels
    for i, w in enumerate(widths):
        cv = nn.Conv2d(prev, w, 4, 2, 1, bias=False)
        with torch.no_grad():
            cv.weight.copy_(_conv_w(params[f"conv{i}"]))
        bn = nn.BatchNorm2d(w)
        _load_bn(bn, params[f"bn{i}_scale"], params[f"bn{i}_bias"])
        layers += [cv, bn, nn.LeakyReLU(0.2)]
        prev = w
    return nn.Sequential(*layers).train(), prev


def test_dcgan_generator_full_forward_matches_torch():
    params = dcgan.generator_init(jax.random.PRNGKey(0), GEO)
    z = np.random.RandomState(1).randn(4, GEO.z_dim).astype(np.float32)

    ours = np.asarray(dcgan.generator_apply(params, jnp.asarray(z), GEO))

    tg = _torch_generator(params, GEO.z_dim)
    with torch.no_grad():
        ref = tg(_t(z).view(4, GEO.z_dim, 1, 1)).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (4, 64, 64, 3)
    np.testing.assert_allclose(ours, ref, **TOL)


def test_dcgan_discriminator_full_forward_matches_torch():
    params = dcgan.discriminator_init(jax.random.PRNGKey(2), GEO)
    x = (np.random.RandomState(3).rand(4, 64, 64, 3).astype(np.float32) * 2 - 1)

    ours = np.asarray(dcgan.discriminator_apply(params, jnp.asarray(x), GEO))

    trunk, prev = _torch_discriminator_convs(params)
    head = nn.Conv2d(prev, 1, 4, 1, 0, bias=False)
    with torch.no_grad():
        head.weight.copy_(_conv_w(params["conv_out"]))
        ref = head(trunk(_t(x.transpose(0, 3, 1, 2)))).numpy().reshape(4)
    # jckx returns logits (the reference module ends in sigmoid; jckx applies
    # it at the loss/GP sites) — compare logits, then scores
    np.testing.assert_allclose(ours, ref, **TOL)
    np.testing.assert_allclose(
        jax.nn.sigmoid(ours), 1 / (1 + np.exp(-ref)), **TOL)


def test_cgan_generator_full_forward_matches_torch():
    ncls = 100
    params = cgan.cgenerator_init(jax.random.PRNGKey(4), GEO, ncls)
    rng = np.random.RandomState(5)
    z = rng.randn(4, GEO.z_dim).astype(np.float32)
    onehot = np.eye(ncls, dtype=np.float32)[rng.randint(0, ncls, 4)]

    ours = np.asarray(cgan.cgenerator_apply(
        params, jnp.asarray(z), jnp.asarray(onehot), GEO))

    # reference concatenates z and the one-hot along channels at 1x1
    # (CGAN.py:154-155) then runs the same stack with in_dim = z+K
    tg = _torch_generator(params, GEO.z_dim + ncls)
    zin = np.concatenate([z, onehot], axis=1)
    with torch.no_grad():
        ref = tg(_t(zin).view(4, -1, 1, 1)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, **TOL)


def test_cgan_discriminator_full_forward_matches_torch():
    ncls = 100
    params = cgan.cdiscriminator_init(jax.random.PRNGKey(6), GEO, ncls)
    rng = np.random.RandomState(7)
    x = (rng.rand(4, 64, 64, 3).astype(np.float32) * 2 - 1)
    onehot = np.eye(ncls, dtype=np.float32)[rng.randint(0, ncls, 4)]

    # dropout_key=None = identity dropout on both sides (wiring test)
    ours = np.asarray(cgan.cdiscriminator_apply(
        params, jnp.asarray(x), jnp.asarray(onehot), GEO))

    trunk, _ = _torch_discriminator_convs(params)
    label_fc = nn.Linear(ncls, 2 * ncls)
    fc1 = nn.Linear(8192 + 2 * ncls, 256)
    fc2 = nn.Linear(256, 1)
    # Flatten-order convention: jckx flattens the NHWC activation (H,W,C
    # order); the reference flattens NCHW (C,H,W). The two nets are the same
    # function up to this fixed permutation of fc1's image rows — a
    # reparameterization that training absorbs — so the torch replica loads
    # fc1_w with its image block permuted into C,H,W row order.
    img_w = np.asarray(params["fc1_w"])[:8192].reshape(4, 4, 512, 256)
    img_w = img_w.transpose(2, 0, 1, 3).reshape(8192, 256)
    fc1_w = np.concatenate([img_w, np.asarray(params["fc1_w"])[8192:]], axis=0)
    with torch.no_grad():
        label_fc.weight.copy_(_t(np.asarray(params["label_w"]).T))
        label_fc.bias.copy_(_t(params["label_b"]))
        fc1.weight.copy_(_t(fc1_w.T))
        fc1.bias.copy_(_t(params["fc1_b"]))
        fc2.weight.copy_(_t(np.asarray(params["fc2_w"]).T))
        fc2.bias.copy_(_t(params["fc2_b"]))
        feat = trunk(_t(x.transpose(0, 3, 1, 2))).flatten(1)  # 8192-flatten
        lab = nn.functional.leaky_relu(label_fc(_t(onehot)), 0.2)
        h = fc1(torch.cat([feat, lab], dim=1))  # Dropout(0.25) skipped: eval
        ref = fc2(h).numpy().reshape(4)
    np.testing.assert_allclose(ours, ref, **TOL)

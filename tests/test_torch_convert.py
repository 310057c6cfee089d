"""Round-trip tests for the reference torch GAN checkpoint converter.

Builds torch modules with the REFERENCE's attribute names (conv1..conv5,
norm1..norm4, label_embedding, linear1/linear2 — model/DCGAN.py:6-67,
model/CGAN.py:79-162) so their ``state_dict()`` keys and ``parameters()``
order are exactly what a real reference ``.pt`` contains (the checkpoint
dict shape of train/dcgan_trainer.py:86-91), then checks:

- import → jckx forward ≡ torch forward (both families, both nets),
- Adam moments import → one identical-gradient step matches torch's,
- export → ``load_state_dict(strict=True)`` on reference-shaped modules and
  optimizers, and import(export(state)) is bit-exact,
- geometry/conditionality inference from weight shapes alone.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from jckx.checkpoint.torch_convert import (
    export_torch_gan_checkpoint,
    import_torch_gan_checkpoint,
    infer_gan_config,
)
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry

GEO = GANGeometry()  # reference 64x64 RGB geometry
TOL = dict(rtol=3e-3, atol=3e-3)  # XLA-CPU oneDNN conv error over 5 layers


def _weights_init(m):
    # reference weights_init (model/DCGAN.py:70-76)
    for mod in m.modules():
        name = mod.__class__.__name__
        if "Conv" in name:
            nn.init.normal_(mod.weight.data, 0.0, 0.02)
        elif "BatchNorm" in name:
            nn.init.normal_(mod.weight.data, 1.0, 0.02)
            nn.init.constant_(mod.bias.data, 0)


def _ref_generator(geo, in_ch):
    """Reference G module tree (model/DCGAN.py:38-67): conv1..conv{n+1}
    ConvTranspose2d with norm1..norm{n} between."""
    m = nn.Module()
    prev = in_ch
    widths = geo.stage_widths()
    for i, w in enumerate(widths):
        s, p = (1, 0) if i == 0 else (2, 1)
        m.add_module(f"conv{i + 1}", nn.ConvTranspose2d(prev, w, 4, s, p, bias=False))
        m.add_module(f"norm{i + 1}", nn.BatchNorm2d(w))
        prev = w
    m.add_module(f"conv{len(widths) + 1}",
                 nn.ConvTranspose2d(prev, geo.channels, 4, 2, 1, bias=False))
    m.train()
    return m


def _ref_gen_forward(m, x, n_up):
    for i in range(n_up):
        x = F.relu(getattr(m, f"norm{i + 1}")(getattr(m, f"conv{i + 1}")(x)))
    return torch.tanh(getattr(m, f"conv{n_up + 1}")(x))


def _ref_disc_trunk(m, geo, x):
    for i in range(geo.n_up):
        x = F.leaky_relu(
            getattr(m, f"norm{i + 1}")(getattr(m, f"conv{i + 1}")(x)), 0.2)
    return x


def _ref_dcgan_discriminator(geo):
    """Reference DCGAN D (model/DCGAN.py:6-35), returning LOGITS."""
    m = nn.Module()
    prev = geo.channels
    widths = list(reversed(geo.stage_widths()))
    for i, w in enumerate(widths):
        m.add_module(f"conv{i + 1}", nn.Conv2d(prev, w, 4, 2, 1, bias=False))
        m.add_module(f"norm{i + 1}", nn.BatchNorm2d(w))
        prev = w
    m.add_module(f"conv{len(widths) + 1}", nn.Conv2d(prev, 1, 4, 1, 0, bias=False))
    m.train()
    return m


def _ref_cgan_discriminator(geo, ncls):
    """Reference CGAN D (model/CGAN.py:79-124) with its registration order:
    label_embedding first, conv trunk, linear head. Returns LOGITS."""
    m = nn.Module()
    m.add_module("label_embedding", nn.Linear(ncls, 2 * ncls))
    prev = geo.channels
    widths = list(reversed(geo.stage_widths()))
    for i, w in enumerate(widths):
        m.add_module(f"conv{i + 1}", nn.Conv2d(prev, w, 4, 2, 1, bias=False))
        m.add_module(f"norm{i + 1}", nn.BatchNorm2d(w))
        prev = w
    s = geo.image_size // (2 ** geo.n_up)
    m.add_module("linear1", nn.Linear(s * s * prev + 2 * ncls, 256))
    m.add_module("linear2", nn.Linear(256, 1))
    m.train()
    return m


def _ref_cgan_d_forward(m, geo, x, onehot):
    lab = F.leaky_relu(m.label_embedding(onehot), 0.2)
    feat = _ref_disc_trunk(m, geo, x).flatten(1)  # NCHW flatten (CGAN.py:120)
    h = m.linear1(torch.cat([feat, lab], dim=1))  # Dropout skipped: identity
    return m.linear2(h).reshape(-1)


def _run_adam_steps(model, forward, n=3, lr=2e-4):
    """Populate real Adam moments the way the reference would."""
    opt = torch.optim.Adam(model.parameters(), lr=lr, betas=(0.5, 0.999))
    for _ in range(n):
        opt.zero_grad()
        forward().square().mean().backward()
        opt.step()
    return opt


def _checkpoint_dict(gen, disc, opt_g, opt_d):
    return {
        "model_g": gen.state_dict(),
        "model_d": disc.state_dict(),
        "optimizer_g": opt_g.state_dict(),
        "optimizer_d": opt_d.state_dict(),
    }


def _make_dcgan_ckpt(geo=GEO, steps=3, seed=0):
    torch.manual_seed(seed)
    gen = _ref_generator(geo, geo.z_dim)
    disc = _ref_dcgan_discriminator(geo)
    _weights_init(gen)
    _weights_init(disc)
    z = torch.randn(2, geo.z_dim, 1, 1)
    x = torch.rand(2, geo.channels, geo.image_size, geo.image_size) * 2 - 1
    opt_g = _run_adam_steps(gen, lambda: _ref_gen_forward(gen, z, geo.n_up), steps)
    opt_d = _run_adam_steps(
        disc, lambda: _ref_gen_forward(disc, x, geo.n_up), steps)
    return gen, disc, _checkpoint_dict(gen, disc, opt_g, opt_d)


def test_import_dcgan_forward_parity(tmp_path):
    gen, disc, ckpt = _make_dcgan_ckpt()
    path = str(tmp_path / "5000_88.4000.pt")
    torch.save(ckpt, path)

    state, info = import_torch_gan_checkpoint(path)
    assert info == {"conditional": False, "geo": GEO, "num_classes": 100,
                    "step": 3}
    assert int(state.step) == 3

    rng = np.random.RandomState(1)
    z = rng.randn(4, GEO.z_dim).astype(np.float32)
    ours = np.asarray(dcgan.generator_apply(state.params_g, jnp.asarray(z), GEO))
    with torch.no_grad():
        ref = _ref_gen_forward(
            gen, torch.from_numpy(z).view(4, -1, 1, 1), GEO.n_up
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, **TOL)

    x = (rng.rand(4, 64, 64, 3).astype(np.float32) * 2 - 1)
    ours_d = np.asarray(dcgan.discriminator_apply(state.params_d, jnp.asarray(x), GEO))
    with torch.no_grad():
        t = _ref_disc_trunk(disc, GEO, torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref_d = getattr(disc, "conv5")(t).numpy().reshape(4)
    np.testing.assert_allclose(ours_d, ref_d, **TOL)


def test_import_cgan_forward_parity():
    ncls = 100
    torch.manual_seed(1)
    gen = _ref_generator(GEO, GEO.z_dim + ncls)
    disc = _ref_cgan_discriminator(GEO, ncls)
    _weights_init(gen)
    _weights_init(disc)
    z = torch.randn(2, GEO.z_dim + ncls, 1, 1)
    x = torch.rand(2, 3, 64, 64) * 2 - 1
    lab = torch.eye(ncls)[torch.randint(0, ncls, (2,))]
    opt_g = _run_adam_steps(gen, lambda: _ref_gen_forward(gen, z, GEO.n_up), 2)
    opt_d = _run_adam_steps(
        disc, lambda: _ref_cgan_d_forward(disc, GEO, x, lab), 2)

    state, info = import_torch_gan_checkpoint(
        _checkpoint_dict(gen, disc, opt_g, opt_d))
    assert info["conditional"] and info["num_classes"] == ncls
    assert info["geo"] == GEO

    rng = np.random.RandomState(2)
    zin = rng.randn(4, GEO.z_dim).astype(np.float32)
    onehot = np.eye(ncls, dtype=np.float32)[rng.randint(0, ncls, 4)]
    ours = np.asarray(cgan.cgenerator_apply(
        state.params_g, jnp.asarray(zin), jnp.asarray(onehot), GEO))
    with torch.no_grad():
        tin = torch.from_numpy(np.concatenate([zin, onehot], 1)).view(4, -1, 1, 1)
        ref = _ref_gen_forward(gen, tin, GEO.n_up).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, **TOL)

    xin = (rng.rand(4, 64, 64, 3).astype(np.float32) * 2 - 1)
    ours_d = np.asarray(cgan.cdiscriminator_apply(
        state.params_d, jnp.asarray(xin), jnp.asarray(onehot), GEO))
    with torch.no_grad():
        ref_d = _ref_cgan_d_forward(
            disc, GEO, torch.from_numpy(xin.transpose(0, 3, 1, 2)),
            torch.from_numpy(onehot)).numpy()
    np.testing.assert_allclose(ours_d, ref_d, **TOL)


def test_imported_adam_moments_continue_identically():
    """One post-import optimizer step with the SAME gradients must move the
    torch and jckx parameters to the same place — proving moments, layout
    transforms, and the bias-correction count all mapped correctly."""
    from jckx.configs import Config
    from jckx.train.state import make_optimizer
    from jckx.checkpoint.torch_convert import _generator_map

    geo = GEO
    gen, _, ckpt = _make_dcgan_ckpt(steps=3)
    state, _ = import_torch_gan_checkpoint(ckpt, lr=2e-4)

    rs = np.random.RandomState(3)
    grads = {k: jnp.asarray(rs.standard_normal(v.shape).astype(np.float32) * 0.01)
             for k, v in state.params_g.items()}

    cfg = Config()
    cfg.max_learning_rate = 2e-4
    tx = make_optimizer(cfg)
    upd, _ = tx.update(grads, state.opt_g, state.params_g)
    import optax

    new_params = optax.apply_updates(state.params_g, upd)

    opt = torch.optim.Adam(gen.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt.load_state_dict(ckpt["optimizer_g"])
    named = dict(gen.named_parameters())
    for tk, jk, _, j2t in _generator_map(geo):
        named[tk].grad = torch.from_numpy(
            np.ascontiguousarray(j2t(np.asarray(grads[jk]))))
    opt.step()

    for tk, jk, t2j, _ in _generator_map(geo):
        np.testing.assert_allclose(
            np.asarray(new_params[jk]),
            t2j(named[tk].detach().numpy()), rtol=1e-5, atol=1e-7,
            err_msg=f"{tk} diverged after one identical-gradient step")


def test_export_strict_load_and_bitexact_roundtrip(tmp_path):
    ncls = 10
    geo = GANGeometry(z_dim=64, image_size=32, channels=1, base_width=32)
    torch.manual_seed(4)
    gen = _ref_generator(geo, geo.z_dim + ncls)
    disc = _ref_cgan_discriminator(geo, ncls)
    _weights_init(gen)
    _weights_init(disc)
    z = torch.randn(2, geo.z_dim + ncls, 1, 1)
    x = torch.rand(2, 1, 32, 32) * 2 - 1
    lab = torch.eye(ncls)[torch.randint(0, ncls, (2,))]
    opt_g = _run_adam_steps(gen, lambda: _ref_gen_forward(gen, z, geo.n_up), 2)
    opt_d = _run_adam_steps(
        disc, lambda: _ref_cgan_d_forward(disc, geo, x, lab), 2)

    state, info = import_torch_gan_checkpoint(
        _checkpoint_dict(gen, disc, opt_g, opt_d))
    assert (info["conditional"], info["num_classes"]) == (True, ncls)
    assert info["geo"] == geo

    path = str(tmp_path / "export.pt")
    export_torch_gan_checkpoint(
        state, conditional=True, geo=geo, num_classes=ncls, path=path)
    loaded = torch.load(path)

    # reference-shaped modules + optimizers accept the export strictly
    gen2 = _ref_generator(geo, geo.z_dim + ncls)
    disc2 = _ref_cgan_discriminator(geo, ncls)
    gen2.load_state_dict(loaded["model_g"], strict=True)
    disc2.load_state_dict(loaded["model_d"], strict=True)
    torch.optim.Adam(gen2.parameters(), lr=2e-4, betas=(0.5, 0.999)
                     ).load_state_dict(loaded["optimizer_g"])
    torch.optim.Adam(disc2.parameters(), lr=2e-4, betas=(0.5, 0.999)
                     ).load_state_dict(loaded["optimizer_d"])

    # parameters survived torch->jckx->torch bit-exactly (BN running stats
    # are deliberately FRESH in the export — never read by the reference's
    # train-mode-only nets — so only parameters round-trip)
    buffers = ("running_mean", "running_var", "num_batches_tracked")
    for k, v in gen.state_dict().items():
        if k.endswith(buffers):
            continue
        np.testing.assert_array_equal(
            loaded["model_g"][k].numpy(), v.numpy(), err_msg=k)

    # and import(export(state)) is bit-exact on every leaf incl. moments
    state2, _ = import_torch_gan_checkpoint(loaded)
    for a, b in zip(jax.tree_util.tree_leaves(state.params_g),
                    jax.tree_util.tree_leaves(state2.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_d),
                    jax.tree_util.tree_leaves(state2.opt_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_infer_rejects_garbage_and_fresh_optimizer_ok():
    geo = GANGeometry(z_dim=64, image_size=32, channels=1, base_width=32)
    torch.manual_seed(5)
    gen = _ref_generator(geo, geo.z_dim)
    disc = _ref_dcgan_discriminator(geo)
    # no optimizer steps: reference checkpoints written before any update
    ckpt = {"model_g": gen.state_dict(), "model_d": disc.state_dict(),
            "optimizer_g": torch.optim.Adam(gen.parameters()).state_dict(),
            "optimizer_d": torch.optim.Adam(disc.parameters()).state_dict()}
    state, info = import_torch_gan_checkpoint(ckpt)
    assert info == {"conditional": False, "geo": geo, "num_classes": 100,
                    "step": 0}
    assert int(state.step) == 0

    with pytest.raises(KeyError, match="model_g"):
        import_torch_gan_checkpoint({"weights": {}})

    conditional, geo2, ncls = infer_gan_config(gen.state_dict(), disc.state_dict())
    assert (conditional, geo2, ncls) == (False, geo, 100)


def test_serve_from_torch_pt(tmp_path):
    """GeneratorService pointed at a reference .pt: geometry/conditionality
    self-configure from the weights and sampling runs end-to-end."""
    from jckx.serve import GeneratorService

    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=16)
    torch.manual_seed(6)
    gen = _ref_generator(geo, geo.z_dim)
    disc = _ref_dcgan_discriminator(geo)
    _weights_init(gen)
    _weights_init(disc)
    path = str(tmp_path / "1234_0.1000_88.4000.pt")
    torch.save(_checkpoint_dict(
        gen, disc,
        torch.optim.Adam(gen.parameters()),
        torch.optim.Adam(disc.parameters())), path)

    svc = GeneratorService(path, batch_size=8)
    assert svc.geo == geo and not svc.conditional
    imgs = svc.sample(8)
    assert imgs.shape == (8, 16, 16, 3) and imgs.dtype == np.uint8
    # the service's params are the imported torch weights
    state, _ = import_torch_gan_checkpoint(path)
    for k in state.params_g:
        np.testing.assert_array_equal(
            np.asarray(svc.params_g[k]), np.asarray(state.params_g[k]))

    # explicit args that contradict the .pt's weights are a clear error,
    # not an opaque trace-time shape failure
    with pytest.raises(ValueError, match="contradict"):
        GeneratorService(path, batch_size=8, geo_overrides={"image_size": 32})

    # same contract for EMA: reference .pt checkpoints carry no EMA
    # weights, so an explicit use_ema=True must error rather than silently
    # serve the live generator
    with pytest.raises(ValueError, match="EMA"):
        GeneratorService(path, batch_size=8, use_ema=True)
    with pytest.raises(ValueError, match="contradict"):
        GeneratorService(path, batch_size=8, conditional=True)


def test_trainer_init_from_torch(tmp_path):
    """--init_from_torch warm-starts a DCGANTrainer: params + Adam moments +
    step come from the .pt, and train() continues from there."""
    from tests.test_trainer import StubMetrics, tiny_cfg
    from jckx.data.pipeline import DCGANDataPreprocessor
    from jckx.train.gan_trainer import DCGANTrainer
    from jckx.models.dcgan import GANGeometry as _G

    geo = _G(z_dim=100, image_size=16, channels=3, base_width=8)
    torch.manual_seed(7)
    gen = _ref_generator(geo, geo.z_dim)
    disc = _ref_dcgan_discriminator(geo)
    _weights_init(gen)
    _weights_init(disc)
    z = torch.randn(2, geo.z_dim, 1, 1)
    x = torch.rand(2, 3, 16, 16) * 2 - 1
    opt_g = _run_adam_steps(gen, lambda: _ref_gen_forward(gen, z, geo.n_up), 4)
    opt_d = _run_adam_steps(disc, lambda: _ref_gen_forward(disc, x, geo.n_up), 4)
    path = str(tmp_path / "ref.pt")
    torch.save(_checkpoint_dict(gen, disc, opt_g, opt_d), path)

    cfg = tiny_cfg(tmp_path, "DCGAN")
    cfg.init_from_torch = path
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.transform_data()
    params_g = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    params_d = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    tr = DCGANTrainer(cfg, params_g, params_d, data_pre, metrics=StubMetrics())

    imported, info = import_torch_gan_checkpoint(path)
    assert tr._host_step == info["step"] == 4
    np.testing.assert_array_equal(
        np.asarray(tr.state.params_g["convt0"]),
        np.asarray(imported.params_g["convt0"]))

    tr.train()  # runs the remaining steps of epoch 1 from step 4
    assert int(tr.state.step) > 4

    # geometry mismatch is a hard error, not a silent fallback
    cfg2 = tiny_cfg(tmp_path, "DCGAN")
    cfg2.init_from_torch = path
    cfg2.image_size = 32
    data_pre2 = DCGANDataPreprocessor(cfg2)
    data_pre2.transform_data()
    g2 = _G(z_dim=100, image_size=32, channels=3, base_width=8)
    with pytest.raises(ValueError, match="geometry"):
        DCGANTrainer(cfg2,
                     dcgan.generator_init(jax.random.PRNGKey(0), g2),
                     dcgan.discriminator_init(jax.random.PRNGKey(1), g2),
                     data_pre2, metrics=StubMetrics())


def test_convert_cli_both_directions(tmp_path):
    """python -m jckx.convert: .pt -> .ckpt (serveable, sidecar written) and
    .ckpt -> .pt (strictly reference-shaped), params bit-exact end to end."""
    from jckx.convert import convert, get_args as conv_args
    from jckx.serve import GeneratorService

    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    torch.manual_seed(9)
    gen = _ref_generator(geo, geo.z_dim)
    disc = _ref_dcgan_discriminator(geo)
    _weights_init(gen)
    _weights_init(disc)
    z = torch.randn(2, geo.z_dim, 1, 1)
    opt_g = _run_adam_steps(gen, lambda: _ref_gen_forward(gen, z, geo.n_up), 2)
    opt_d = torch.optim.Adam(disc.parameters(), lr=2e-4, betas=(0.5, 0.999))
    src_pt = str(tmp_path / "src.pt")
    torch.save(_checkpoint_dict(gen, disc, opt_g, opt_d), src_pt)

    # .pt -> .ckpt
    ckpt = str(tmp_path / "run" / "latest.ckpt")
    info = convert(conv_args(["--src", src_pt, "--dst", ckpt]))
    assert info["step"] == 2 and info["image_size"] == 16
    svc = GeneratorService(ckpt)  # sidecar self-configures
    assert svc.geo == geo and svc.step == 2

    # .ckpt -> .pt: strictly loadable, G params bit-exact vs the original
    dst_pt = str(tmp_path / "back.pt")
    info2 = convert(conv_args(["--src", ckpt, "--dst", dst_pt]))
    assert info2["step"] == 2
    back = torch.load(dst_pt)
    gen2 = _ref_generator(geo, geo.z_dim)
    gen2.load_state_dict(back["model_g"], strict=True)
    for k, v in gen.state_dict().items():
        if k.endswith(("running_mean", "running_var", "num_batches_tracked")):
            continue
        np.testing.assert_array_equal(back["model_g"][k].numpy(), v.numpy(),
                                      err_msg=k)
    # Adam moments survive the double conversion too
    s0 = opt_g.state_dict()["state"][0]["exp_avg"].numpy()
    s1 = back["optimizer_g"]["state"][0]["exp_avg"].numpy()
    np.testing.assert_array_equal(s0, s1)

    with pytest.raises(ValueError, match="one side"):
        convert(conv_args(["--src", src_pt, "--dst", str(tmp_path / "x.pt")]))


def test_trainer_init_from_torch_cgan(tmp_path):
    """Conditional warm-start: CGANTrainer accepts a matching CGAN .pt and
    rejects one whose num_classes disagrees with the dataset."""
    from tests.test_trainer import StubMetrics, tiny_cfg
    from jckx.data.pipeline import CGANDataPreprocessor
    from jckx.train.gan_trainer import CGANTrainer
    from jckx.models.dcgan import GANGeometry as _G

    def build_pt(ncls, steps=2):
        geo = _G(z_dim=100, image_size=16, channels=3, base_width=8)
        torch.manual_seed(13 + ncls)
        gen = _ref_generator(geo, geo.z_dim + ncls)
        disc = _ref_cgan_discriminator(geo, ncls)
        _weights_init(gen)
        _weights_init(disc)
        z = torch.randn(2, geo.z_dim + ncls, 1, 1)
        x = torch.rand(2, 3, 16, 16) * 2 - 1
        lab = torch.eye(ncls)[torch.randint(0, ncls, (2,))]
        og = _run_adam_steps(gen, lambda: _ref_gen_forward(gen, z, geo.n_up), steps)
        od = _run_adam_steps(
            disc, lambda: _ref_cgan_d_forward(disc, geo, x, lab), steps)
        p = str(tmp_path / f"c{ncls}.pt")
        torch.save(_checkpoint_dict(gen, disc, og, od), p)
        return geo, p

    geo, path = build_pt(10)  # tiny_cfg synthetic set has 10 classes
    cfg = tiny_cfg(tmp_path, "CGAN")
    cfg.init_from_torch = path
    data_pre = CGANDataPreprocessor(cfg)
    data_pre.transform_data()
    cfg.num_classes = data_pre.num_classes
    tr = CGANTrainer(cfg,
                     cgan.cgenerator_init(jax.random.PRNGKey(0), geo, 10),
                     cgan.cdiscriminator_init(jax.random.PRNGKey(1), geo, 10),
                     data_pre, metrics=StubMetrics())
    assert tr._host_step == 2
    tr.train()
    assert int(tr.state.step) > 2

    # class-count mismatch vs the DATASET is a hard error
    _, bad = build_pt(7)
    cfg2 = tiny_cfg(tmp_path, "CGAN")
    cfg2.save_path = str(tmp_path / "cgan" / "run2")
    cfg2.init_from_torch = bad
    data_pre2 = CGANDataPreprocessor(cfg2)
    data_pre2.transform_data()
    cfg2.num_classes = data_pre2.num_classes
    with pytest.raises(ValueError, match="classes"):
        CGANTrainer(cfg2,
                    cgan.cgenerator_init(jax.random.PRNGKey(0), geo, 10),
                    cgan.cdiscriminator_init(jax.random.PRNGKey(1), geo, 10),
                    data_pre2, metrics=StubMetrics())


def test_convert_cli_bare_filename_dst(tmp_path, monkeypatch):
    """A --dst with no directory component must not crash save_checkpoint
    (os.makedirs('') regression)."""
    from jckx.convert import convert, get_args as conv_args

    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    torch.manual_seed(15)
    gen = _ref_generator(geo, geo.z_dim)
    disc = _ref_dcgan_discriminator(geo)
    src = str(tmp_path / "bare.pt")
    torch.save(_checkpoint_dict(
        gen, disc, torch.optim.Adam(gen.parameters()),
        torch.optim.Adam(disc.parameters())), src)
    monkeypatch.chdir(tmp_path)
    info = convert(conv_args(["--src", src, "--dst", "latest.ckpt"]))
    assert info["wrote"] == "latest.ckpt"
    assert (tmp_path / "latest.ckpt").exists()


def test_host_key_matches_jax_fold_in():
    """_host_key (pure-numpy Threefry-2x32) must be bit-exact with
    jax.random.fold_in(PRNGKey(seed), fold) — the contract that lets
    torch-.pt import run on hosts whose JAX_PLATFORMS pin excludes the
    cpu backend (where the old jax.local_devices(backend='cpu') path
    raised RuntimeError before any work)."""
    import jax

    from jckx.checkpoint.torch_convert import _host_key

    for seed, fold in [(0, 0), (12345, 0), (12345, 7), (2**31 - 1, 999),
                       (1, 2**31 - 1)]:
        expect = np.asarray(jax.random.fold_in(jax.random.PRNGKey(seed), fold))
        got = _host_key(seed, fold)
        np.testing.assert_array_equal(got, expect, err_msg=f"{(seed, fold)}")

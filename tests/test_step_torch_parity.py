"""FUSED-STEP parity vs a torch replica of the reference's training iteration.

tests/test_model_torch_parity.py pins the forward wiring; these tests pin
the TRAINING-STEP semantics end to end — label smoothing 0.9/0.1
(dcgan_trainer.py:136-137), instance noise 0.9·x+0.1·N(0,1) (:160,171), the
gradient-penalty double-backward on the post-sigmoid score (:110-127), the
GP-not-in-D's-gradient DCGAN quirk (:178-180) vs the CGAN full backward
(cgan_trainer.py:201-203), the G-through-the-updated-D ordering (:180-185),
and the Adam(lr, (0.5,0.999)) update (:61-62) — by running jckx's actual
fused step (jitted ``make_*_train_step``) and an independently written
torch loop implementing the reference trainer's iteration on IDENTICAL
weights and IDENTICAL random draws.

Randomness injection: the fused step derives every stochastic tensor
on-device from ``fold_in(state.rng, state.step)`` (jckx/train/steps.py).
The tests reproduce those draws with the same key arithmetic and feed the
VALUES to the torch loop (torch's own RNG is never used), so both sides
evaluate the same mathematical function — including the CGAN dropout
masks, which are materialized from the step's dropout keys and applied in
the torch replica as explicit ``h·keep/(1-p)`` multiplies.

What is compared, and why the tolerances differ:
- the step's telemetry scalars (loss_d, gp, d_x, d_gz1, loss_g, d_gz2)
  vs the torch loop's — batch means, low noise, 3e-3;
- post-step parameter DELTAS: at t=1 bias-corrected Adam is ~sign descent
  (update = -lr·g/(|g|+eps)), so elements whose gradient sits near the
  XLA-vs-oneDNN conv-backward noise floor (~1e-3 relative) have an
  unstable SIGN. Deltas are compared only where |g_torch| clears 1% of
  the leaf max, the mask must cover most elements, and every delta must
  respect the |update| < lr Adam bound. A wiring bug (wrong loss term,
  missing stop_gradient, stale D in the G pass) shifts O(1) fractions of
  a leaf, far above anything the mask can hide.
- optax.adam vs torch.optim.Adam over several steps on fixed synthetic
  gradients (exact elementwise math, no conv noise) pins the update rule
  and bias correction to 1e-6.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import test_model_torch_parity as replicas

from jckx.configs import Config
from jckx.models.dcgan import GANGeometry
from jckx.train.state import create_cgan_state, create_dcgan_state, geometry
from jckx.train.steps import make_cgan_train_step, make_dcgan_train_step

N = 8          # batch
SCALAR_TOL = dict(rtol=3e-3, atol=3e-3)
DROP_P = 0.25  # CGAN Dropout(0.25), CGAN.py:120


def tiny_cfg(**kw):
    cfg = Config()
    base = dict(image_size=16, base_width=8, channels=3, batch_size=N,
                compute_dtype="float32", max_learning_rate=2e-4,
                num_classes=10)
    for k, v in {**base, **kw}.items():
        setattr(cfg, k, v)
    return cfg


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(
        np.asarray(a, np.float32).transpose(0, 3, 1, 2)))


# ------------------------------------------------- torch replica containers

class _TorchDCGAND(nn.Module):
    """Reference DCGAN D (model/DCGAN.py:6-35) as one module, LOGITS out."""

    def __init__(self, params, geo):
        super().__init__()
        self.trunk, prev = replicas._torch_discriminator_convs(params, geo)
        self.head = nn.Conv2d(prev, 1, 4, 1, 0, bias=False)
        with torch.no_grad():
            self.head.weight.copy_(replicas._conv_w(params["conv_out"]))
        self.train()

    def forward(self, x):
        return self.head(self.trunk(x)).reshape(x.shape[0])


class _TorchCGAND(nn.Module):
    """Reference CGAN D (model/CGAN.py:79-123): conv trunk → flatten, label
    Linear(K→2K)+LeakyReLU, concat → Linear→256 → Dropout(0.25) → Linear→1.
    LOGITS out; the dropout mask is INJECTED (``keep`` of 0/1 floats)."""

    def __init__(self, params, geo, ncls):
        super().__init__()
        self.trunk, top = replicas._torch_discriminator_convs(params, geo)
        self.spatial, self.top = 4, top  # trunk halves image_size down to 4×4
        flat = self.spatial * self.spatial * top
        self.flat = flat
        emb = 2 * ncls
        self.label_fc = nn.Linear(ncls, emb)
        self.fc1 = nn.Linear(flat + emb, 256)
        self.fc2 = nn.Linear(256, 1)
        # jckx flattens NHWC (H,W,C rows); torch flattens NCHW (C,H,W rows):
        # load fc1's image block with its rows permuted into torch order
        # (same reparameterization as the forward-parity test).
        w = np.asarray(params["fc1_w"], np.float32)
        img = w[:flat].reshape(self.spatial, self.spatial, top, 256)
        img = img.transpose(2, 0, 1, 3).reshape(flat, 256)
        fc1_w = np.concatenate([img, w[flat:]], axis=0)
        with torch.no_grad():
            self.label_fc.weight.copy_(replicas._t(np.asarray(params["label_w"]).T))
            self.label_fc.bias.copy_(replicas._t(params["label_b"]))
            self.fc1.weight.copy_(replicas._t(fc1_w.T))
            self.fc1.bias.copy_(replicas._t(params["fc1_b"]))
            self.fc2.weight.copy_(replicas._t(np.asarray(params["fc2_w"]).T))
            self.fc2.bias.copy_(replicas._t(params["fc2_b"]))
        self.train()

    def forward(self, x, onehot, keep):
        feat = self.trunk(x).flatten(1)
        lab = F.leaky_relu(self.label_fc(onehot), 0.2)
        h = self.fc1(torch.cat([feat, lab], dim=1))
        h = h * keep / (1.0 - DROP_P)  # == jnp.where(keep, h/(1-p), 0)
        return self.fc2(h).reshape(x.shape[0])


# ------------------------------------------- torch → jckx layout extraction

def _g_to_jckx(tg, grad=False):
    get = (lambda t: t.grad) if grad else (lambda t: t.detach())
    cts = [m for m in tg if isinstance(m, nn.ConvTranspose2d)]
    bns = [m for m in tg if isinstance(m, nn.BatchNorm2d)]
    out = {}
    for i, bn in enumerate(bns):
        out[f"convt{i}"] = get(cts[i].weight).numpy().transpose(2, 3, 0, 1)
        out[f"bn{i}_scale"] = get(bn.weight).numpy()
        out[f"bn{i}_bias"] = get(bn.bias).numpy()
    out["convt_out"] = get(cts[-1].weight).numpy().transpose(2, 3, 0, 1)
    return out


def _trunk_to_jckx(trunk, out, get):
    convs = [m for m in trunk if isinstance(m, nn.Conv2d)]
    bns = [m for m in trunk if isinstance(m, nn.BatchNorm2d)]
    for i, (cv, bn) in enumerate(zip(convs, bns)):
        out[f"conv{i}"] = get(cv.weight).numpy().transpose(2, 3, 1, 0)
        out[f"bn{i}_scale"] = get(bn.weight).numpy()
        out[f"bn{i}_bias"] = get(bn.bias).numpy()


def _dcgan_d_to_jckx(td, grad=False):
    get = (lambda t: t.grad) if grad else (lambda t: t.detach())
    out = {}
    _trunk_to_jckx(td.trunk, out, get)
    out["conv_out"] = get(td.head.weight).numpy().transpose(2, 3, 1, 0)
    return out


def _cgan_d_to_jckx(td, grad=False):
    get = (lambda t: t.grad) if grad else (lambda t: t.detach())
    out = {}
    _trunk_to_jckx(td.trunk, out, get)
    out["label_w"] = get(td.label_fc.weight).numpy().T
    out["label_b"] = get(td.label_fc.bias).numpy()
    w = get(td.fc1.weight).numpy().T  # (flat+emb, 256), image rows C,H,W
    s, c, flat = td.spatial, td.top, td.flat
    img = w[:flat].reshape(c, s, s, 256).transpose(1, 2, 0, 3).reshape(flat, 256)
    out["fc1_w"] = np.concatenate([img, w[flat:]], axis=0)
    out["fc1_b"] = get(td.fc1.bias).numpy()
    out["fc2_w"] = get(td.fc2.weight).numpy().T
    out["fc2_b"] = get(td.fc2.bias).numpy()
    return out


# ------------------------------------------------------------- comparisons

def _assert_param_parity(p0, p_jax, p_torch, g_torch, lr, label):
    """Masked delta comparison (see module docstring for the rationale)."""
    total = covered = 0
    for k in sorted(p0):
        a0 = np.asarray(p0[k], np.float32)
        dj = np.asarray(p_jax[k], np.float32) - a0
        dt = np.asarray(p_torch[k], np.float32) - a0
        # Adam step-1 bound: |update| = lr·|ĝ|/(|ĝ|+eps) < lr
        assert np.abs(dj).max() <= 1.01 * lr, f"{label}/{k}: jax delta > lr"
        assert np.abs(dt).max() <= 1.01 * lr, f"{label}/{k}: torch delta > lr"
        g = np.abs(np.asarray(g_torch[k], np.float32))
        mask = g > 1e-2 * g.max() + 1e-12
        total += mask.size
        covered += int(mask.sum())
        np.testing.assert_allclose(
            dj[mask], dt[mask], rtol=0, atol=0.05 * lr,
            err_msg=f"{label}/{k}: masked Adam deltas disagree")
    assert covered / total > 0.5, (
        f"{label}: gradient mask covered only {covered}/{total} elements — "
        "comparison would be vacuous")


def _assert_scalar_parity(metrics, torch_scalars):
    for name, val in torch_scalars.items():
        np.testing.assert_allclose(
            float(metrics[name]), val, err_msg=f"scalar {name}", **SCALAR_TOL)


# ------------------------------------------------------------ DCGAN parity

def _dcgan_draws(state, cfg, geo):
    """Reproduce steps.py's in-step draws with the same key arithmetic."""
    k = jax.random.fold_in(state.rng, int(state.step))
    k_real, k_z, k_fake, k_alpha = jax.random.split(k, 4)
    shape = (N, geo.image_size, geo.image_size, geo.channels)
    return dict(
        n_real=np.asarray(jax.random.normal(k_real, shape, jnp.float32)),
        z=np.asarray(jax.random.normal(k_z, (N, geo.z_dim), jnp.float32)),
        fake_noise=np.asarray(jax.random.normal(k_fake, shape, jnp.float32)),
        alpha=np.asarray(jax.random.uniform(k_alpha, (N, 1, 1, 1), jnp.float32)),
    )


def _torch_dcgan_step(params_g, params_d, real, draws, cfg, geo, gp_in_grad):
    tg = replicas._torch_generator(params_g, geo.z_dim, geo)
    td = _TorchDCGAND(params_d, geo)
    lr, betas = cfg.max_learning_rate, (cfg.adam_beta1, cfg.adam_beta2)
    opt_g = torch.optim.Adam(tg.parameters(), lr=lr, betas=betas, eps=1e-8)
    opt_d = torch.optim.Adam(td.parameters(), lr=lr, betas=betas, eps=1e-8)
    f, lam = cfg.instance_noise, cfg.lambda_gp
    bce = nn.BCELoss()

    real_n = (1 - f) * _nchw(real) + f * _nchw(draws["n_real"])
    z = torch.from_numpy(draws["z"]).view(N, -1, 1, 1)
    fake_noise = _nchw(draws["fake_noise"])
    alpha = torch.from_numpy(draws["alpha"])  # (N,1,1,1) broadcast = NCHW's

    fake = tg(z)
    fake_n = (1 - f) * fake.detach() + f * fake_noise

    # ---- D update (dcgan_trainer.py:155-180) ----
    out_r = torch.sigmoid(td(real_n))
    out_f = torch.sigmoid(td(fake_n))
    loss_r = bce(out_r, torch.full_like(out_r, cfg.label_real))
    loss_f = bce(out_f, torch.full_like(out_f, cfg.label_fake))
    interp = (alpha * real_n + (1 - alpha) * fake_n).detach().requires_grad_(True)
    score = torch.sigmoid(td(interp))
    gin = torch.autograd.grad(score.sum(), interp, create_graph=True)[0]
    gp = ((gin.flatten(1).norm(2, dim=1) - 1.0) ** 2).mean()
    loss_bp = loss_r + loss_f + (lam * gp if gp_in_grad else 0.0)
    opt_d.zero_grad()
    loss_bp.backward(retain_graph=True)
    d_grads = _dcgan_d_to_jckx(td, grad=True)
    opt_d.step()

    # ---- G update through the UPDATED D (dcgan_trainer.py:180-189) ----
    fk_n = (1 - f) * fake + f * fake_noise
    out_g = torch.sigmoid(td(fk_n))
    loss_g = bce(out_g, torch.full_like(out_g, cfg.label_real))
    opt_g.zero_grad()
    loss_g.backward(inputs=list(tg.parameters()))
    g_grads = _g_to_jckx(tg, grad=True)
    opt_g.step()

    scalars = dict(
        # reported error_d includes GP even when not backpropagated (:179)
        loss_d=float((loss_r + loss_f + lam * gp).detach()),
        gp=float(gp.detach()), d_x=float(out_r.detach().mean()),
        d_gz1=float(out_f.detach().mean()),
        loss_g=float(loss_g.detach()), d_gz2=float(out_g.detach().mean()),
    )
    with torch.no_grad():
        return (_g_to_jckx(tg), _dcgan_d_to_jckx(td), g_grads, d_grads, scalars)


@pytest.mark.parametrize("gp_in_grad", [True, False],
                         ids=["gp-backpropagated", "reference-quirk-no-gp-grad"])
def test_dcgan_fused_step_matches_torch_reference_loop(gp_in_grad):
    cfg = tiny_cfg(gp_in_d_grad=gp_in_grad)
    geo = geometry(cfg)
    state = create_dcgan_state(cfg, jax.random.PRNGKey(0))
    real = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(3), (N, 16, 16, 3), minval=-1.0, maxval=1.0),
        np.float32)

    new_state, metrics = jax.jit(make_dcgan_train_step(cfg, geo))(
        state, jnp.asarray(real))

    draws = _dcgan_draws(state, cfg, geo)
    tg_p, td_p, g_gr, d_gr, scalars = _torch_dcgan_step(
        state.params_g, state.params_d, real, draws, cfg, geo, gp_in_grad)

    _assert_scalar_parity(metrics, scalars)
    _assert_param_parity(state.params_g, new_state.params_g, tg_p, g_gr,
                         cfg.max_learning_rate, "G")
    _assert_param_parity(state.params_d, new_state.params_d, td_p, d_gr,
                         cfg.max_learning_rate, "D")


# ------------------------------------------------------------- CGAN parity

def test_cgan_fused_step_matches_torch_reference_loop():
    ncls = 10
    cfg = tiny_cfg(num_classes=ncls)
    geo = geometry(cfg)
    state = create_cgan_state(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(11)
    real = (rng.rand(N, 16, 16, 3).astype(np.float32) * 2 - 1)
    onehot = np.eye(ncls, dtype=np.float32)[rng.randint(0, ncls, N)]

    new_state, metrics = jax.jit(make_cgan_train_step(cfg, geo))(
        state, jnp.asarray(real), jnp.asarray(onehot))

    # reproduce the 8-way key split of steps.py's CGAN step
    k = jax.random.fold_in(state.rng, int(state.step))
    (k_real, k_z, k_fake, k_alpha, k_dr, k_df, k_di, k_dg) = jax.random.split(k, 8)
    shape = (N, geo.image_size, geo.image_size, geo.channels)
    keep = {
        name: torch.from_numpy(np.asarray(
            jax.random.bernoulli(kk, 1.0 - DROP_P, (N, 256)), np.float32))
        for name, kk in dict(r=k_dr, f=k_df, i=k_di, g=k_dg).items()
    }
    n_real = np.asarray(jax.random.normal(k_real, shape, jnp.float32))
    z = np.asarray(jax.random.normal(k_z, (N, geo.z_dim), jnp.float32))
    fake_noise = np.asarray(jax.random.normal(k_fake, shape, jnp.float32))
    alpha = np.asarray(jax.random.uniform(k_alpha, (N, 1, 1, 1), jnp.float32))

    tg = replicas._torch_generator(state.params_g, geo.z_dim + ncls, geo)
    td = _TorchCGAND(state.params_d, geo, ncls)
    lr, betas = cfg.max_learning_rate, (cfg.adam_beta1, cfg.adam_beta2)
    opt_g = torch.optim.Adam(tg.parameters(), lr=lr, betas=betas, eps=1e-8)
    opt_d = torch.optim.Adam(td.parameters(), lr=lr, betas=betas, eps=1e-8)
    f, lam = cfg.instance_noise, cfg.lambda_gp
    bce = nn.BCELoss()
    lab_t = torch.from_numpy(onehot)

    real_n = (1 - f) * _nchw(real) + f * _nchw(n_real)
    zin = torch.from_numpy(np.concatenate([z, onehot], axis=1)).view(N, -1, 1, 1)
    fake = tg(zin)
    fake_n = (1 - f) * fake.detach() + f * _nchw(fake_noise)

    # ---- D update: full error_d incl. GP backpropagated (cgan:201-203) ----
    out_r = torch.sigmoid(td(real_n, lab_t, keep["r"]))
    out_f = torch.sigmoid(td(fake_n, lab_t, keep["f"]))
    loss_r = bce(out_r, torch.full_like(out_r, cfg.label_real))
    loss_f = bce(out_f, torch.full_like(out_f, cfg.label_fake))
    a_t = torch.from_numpy(alpha)
    interp = (a_t * real_n + (1 - a_t) * fake_n).detach().requires_grad_(True)
    score = torch.sigmoid(td(interp, lab_t, keep["i"]))
    gin = torch.autograd.grad(score.sum(), interp, create_graph=True)[0]
    gp = ((gin.flatten(1).norm(2, dim=1) - 1.0) ** 2).mean()
    loss_d = loss_r + loss_f + lam * gp
    opt_d.zero_grad()
    loss_d.backward(retain_graph=True)
    d_gr = _cgan_d_to_jckx(td, grad=True)
    opt_d.step()

    # ---- G update through the updated D (cgan_trainer.py:205-213) ----
    fk_n = (1 - f) * fake + f * _nchw(fake_noise)
    out_g = torch.sigmoid(td(fk_n, lab_t, keep["g"]))
    loss_g = bce(out_g, torch.full_like(out_g, cfg.label_real))
    opt_g.zero_grad()
    loss_g.backward(inputs=list(tg.parameters()))
    g_gr = _g_to_jckx(tg, grad=True)
    opt_g.step()

    _assert_scalar_parity(metrics, dict(
        loss_d=float(loss_d.detach()), gp=float(gp.detach()),
        d_x=float(out_r.detach().mean()), d_gz1=float(out_f.detach().mean()),
        loss_g=float(loss_g.detach()), d_gz2=float(out_g.detach().mean())))
    with torch.no_grad():
        _assert_param_parity(state.params_g, new_state.params_g,
                             _g_to_jckx(tg), g_gr, lr, "G")
        _assert_param_parity(state.params_d, new_state.params_d,
                             _cgan_d_to_jckx(td), d_gr, lr, "D")


# ------------------------------------------------------ optimizer parity

def test_optax_adam_matches_torch_adam_multistep():
    """optax.adam(lr, 0.5, 0.999, 1e-8) == torch.optim.Adam over 4 steps —
    exact elementwise math on synthetic grads, incl. bias correction at
    t>1 (the step-parity tests above only see t=1)."""
    rng = np.random.RandomState(0)
    p0 = rng.randn(137).astype(np.float32)
    grads = [rng.randn(137).astype(np.float32) * 10.0 ** rng.randint(-4, 2)
             for _ in range(4)]
    lr, b1, b2 = 2e-4, 0.5, 0.999

    tx = optax.adam(lr, b1=b1, b2=b2, eps=1e-8)
    p = jnp.asarray(p0)
    st = tx.init(p)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, upd)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, betas=(b1, b2), eps=1e-8)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    np.testing.assert_allclose(np.asarray(p), tp.detach().numpy(),
                               rtol=0, atol=1e-6)

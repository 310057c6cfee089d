"""Fused adversarial train steps — ONE jitted function per model family.

The reference's hot loop (train/dcgan_trainer.py:130-239) is ~10 separate
device launches per iteration with `.item()` host syncs after each phase.
Here the WHOLE iteration — D forward on real/fake, gradient-penalty
double-backward, D Adam update, G forward/backward through the *updated* D,
G Adam update — is a single XLA program: state in, state out, all buffers
donated, zero host round-trips. Telemetry scalars ship back as one small
dict read at logging cadence only.

Reference-semantic details preserved (all flag-gated via Config):
- label smoothing real=0.9 / fake=0.1 (dcgan_trainer.py:136-137),
- instance noise 0.9·x + 0.1·N(0,1) on real AND fake (:160,171),
- the SAME noisy fake batch is reused for D's fake pass and G's pass
  (the reference builds `fake` once, :168-171,185),
- GP on the post-sigmoid D output at α-interpolates (:110-127),
- G's update flows through the ALREADY-UPDATED D (optimizer_d.step()
  precedes the G forward, :180-185),
- DCGAN quirk: GP contributes to the reported loss_d but (optionally) not
  to D's gradients (:178-180 — no backward on error_d); CGAN backprops it
  (cgan_trainer.py:201-203). `cfg.gp_in_d_grad` selects; default fixed=True.
- CGAN: labels condition G and D; fresh dropout mask per D forward
  (torch semantics); GP uses detached real/fake (cgan_trainer.py:200).

Opt-in ``cfg.fused_prop`` (FusedProp, arXiv:2004.03335 — PAPERS.md): ONE
fake-side D forward serves both players. The same logits feed D's fake loss
(cotangent pulled to the D params) and G's loss (cotangent pulled to the
fake input and chained through G), sharing the forward residuals; the fake
batch itself is built once by the G vjp's forward. Saves one full G forward
+ one D forward per step — real bytes in an HBM-bound program. Documented
semantic deltas vs the reference loop (why it's OFF by default): G's
gradient flows through the PRE-update D (simultaneous update, not
alternating), the reported d_gz2 equals d_gz1 (one shared forward), and
CGAN's two fake-side D passes share one dropout mask.

Per-step randomness derives on-device from ``state.rng`` + ``state.step``
(fold_in), so the step function is closed — no per-step key upload.

Multi-chip: jit the returned function with the batch sharded on the mesh's
``data`` axis and the state replicated. The batch-stat means inside BN and
the loss means ARE global reductions — XLA emits the ICI all-reduces, giving
bit-identical semantics to one giant device (sync-BN + grad all-reduce for
free, the scaling-book recipe).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from jckx.configs import Config
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry
from jckx.ops.losses import bce_from_logits, gradient_penalty, instance_noise_blend
from jckx.train.state import GANTrainState, make_optimizer


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _maybe_remat(fn, on: bool):
    """jax.checkpoint when enabled: recompute activations in the backward
    instead of storing residuals. At the reference 64² geometry XLA's fusion
    already keeps the fused step at the roofline and remat LOSES (see
    Config.remat for v5e measurements); the knob exists for larger
    image_size/base_width where residuals would spill HBM."""
    return jax.checkpoint(fn) if on else fn


def _fused_prop_fake_side(D_in, vjp_gpath, fake_n, params_d, cfg):
    """FusedProp fake side: one D forward, two cotangent pulls.

    ``D_in(params_d, x)`` is the fake-side discriminator forward. Returns
    (bce_f, loss_g, d_gz, grads_d_fake, grads_g): D's fake-loss param grads
    and G's full grads, both from the SAME forward residuals; the G chain
    re-uses ``vjp_gpath`` (the blend∘G forward already ran once)."""
    logits_f, vjp_fake = jax.vjp(D_in, params_d, fake_n)
    one = jnp.ones((), jnp.float32)
    bce_f, vjp_lf = jax.vjp(lambda lg: bce_from_logits(lg, cfg.label_fake), logits_f)
    (ct_f,) = vjp_lf(one)
    grads_d_fake, _ = vjp_fake(ct_f)
    loss_g, vjp_lg = jax.vjp(lambda lg: bce_from_logits(lg, cfg.label_real), logits_f)
    (ct_g,) = vjp_lg(one)
    _, dx = vjp_fake(ct_g)
    (grads_g,) = vjp_gpath(dx)
    return bce_f, loss_g, jnp.mean(jax.nn.sigmoid(logits_f)), grads_d_fake, grads_g


def make_dcgan_train_step(cfg: Config, geo: GANGeometry,
                          fake_constraint: Callable = None,
                          grad_constraint: Callable = None) -> Callable:
    """Returns step(state, real_batch) -> (new_state, metrics). Jit-ready.

    ``fake_constraint``: optional identity-semantics hook applied to G's
    image output (e.g. ``lax.with_sharding_constraint`` to the spatial
    layout). Measured neutral for spatial mode (GSPMD already propagates
    the REAL batch's sharding to the generated side — the A/B in
    tools/profiling/spatial_halo_cost.py --constrain_fake shows an
    identical op inventory); kept as the explicit-layout hook for custom
    sharding experiments.

    ``grad_constraint``: optional identity-semantics hook applied to the
    G/D gradient pytrees right after ``jax.grad`` (e.g. constrain every
    leaf replicated). Motivation (r5, real-TPU AOT analysis): under
    spatial sharding XLA lets the filter-grad convs produce kernel-
    H-sharded gradients and then runs a sharded f32 Adam update whose
    params+moments all-gather back to replicated — 3 f32 gathers per big
    kernel per step where one bf16 grad all-reduce would do; pinning the
    grads replicated forces the cheap reduction (A/B via
    tools/profiling/spatial_halo_cost.py --replicate_grads)."""
    cd = _dtype(cfg)
    tx = make_optimizer(cfg)
    lam, f = cfg.lambda_gp, cfg.instance_noise
    remat = getattr(cfg, "remat", "none")
    G0 = _maybe_remat(lambda p, z: dcgan.generator_apply(p, z, geo, cd), remat in ("g", "both"))
    G = (G0 if fake_constraint is None
         else (lambda p, z: fake_constraint(G0(p, z))))
    D = _maybe_remat(lambda p, x: dcgan.discriminator_apply(p, x, geo, cd), remat in ("d", "both"))

    if getattr(cfg, "fused_prop", 0):

        def step_fp(state: GANTrainState, real: jax.Array):
            k = jax.random.fold_in(state.rng, state.step)
            k_real, k_z, k_fake, k_alpha = jax.random.split(k, 4)

            real_n = instance_noise_blend(k_real, real.astype(cd), f)
            z = jax.random.normal(k_z, (real.shape[0], geo.z_dim), jnp.float32)
            fake_noise = jax.random.normal(k_fake, real.shape, jnp.float32).astype(cd)

            # the ONLY G forward of the step; its vjp carries G's chain
            fake_n, vjp_gpath = jax.vjp(
                lambda pg: (1.0 - f) * G(pg, z) + f * fake_noise,
                state.params_g)

            def d_rg_loss(params_d):  # real + GP sides; fake side is shared
                logits_r = D(params_d, real_n)
                bce_r = bce_from_logits(logits_r, cfg.label_real)
                gp = gradient_penalty(
                    lambda x: jax.nn.sigmoid(D(params_d, x)),
                    k_alpha, real_n, jax.lax.stop_gradient(fake_n))
                loss_for_grad = bce_r + (lam * gp if cfg.gp_in_d_grad else 0.0)
                return loss_for_grad, (bce_r, gp, jnp.mean(jax.nn.sigmoid(logits_r)))

            grads_d_rg, (bce_r, gp, d_x) = jax.grad(
                d_rg_loss, has_aux=True)(state.params_d)
            bce_f, loss_g, d_gz, grads_d_fake, grads_g = _fused_prop_fake_side(
                lambda pd, x: D(pd, x), vjp_gpath,
                jax.lax.stop_gradient(fake_n), state.params_d, cfg)
            grads_d = jax.tree_util.tree_map(jnp.add, grads_d_rg, grads_d_fake)
            if grad_constraint is not None:
                grads_d, grads_g = grad_constraint(grads_d), grad_constraint(grads_g)

            upd_d, opt_d = tx.update(grads_d, state.opt_d, state.params_d)
            params_d = optax.apply_updates(state.params_d, upd_d)
            upd_g, opt_g = tx.update(grads_g, state.opt_g, state.params_g)
            params_g = optax.apply_updates(state.params_g, upd_g)

            ema_g = state.ema_g
            if cfg.ema_decay > 0 and ema_g is not None:
                dec = cfg.ema_decay
                ema_g = jax.tree_util.tree_map(
                    lambda e, p: dec * e + (1.0 - dec) * p, ema_g, params_g)

            metrics = {"loss_d": bce_r + bce_f + lam * gp, "gp": gp,
                       "d_x": d_x, "d_gz1": d_gz, "loss_g": loss_g,
                       "d_gz2": d_gz}  # one shared forward (see module doc)
            metrics = {n: v.astype(jnp.float32) for n, v in metrics.items()}
            return GANTrainState(
                params_g=params_g, params_d=params_d, opt_g=opt_g,
                opt_d=opt_d, step=state.step + 1, rng=state.rng,
                ema_g=ema_g), metrics

        return step_fp

    def step(state: GANTrainState, real: jax.Array):
        k = jax.random.fold_in(state.rng, state.step)
        k_real, k_z, k_fake, k_alpha = jax.random.split(k, 4)

        real_n = instance_noise_blend(k_real, real.astype(cd), f)
        z = jax.random.normal(k_z, (real.shape[0], geo.z_dim), jnp.float32)
        fake_noise = jax.random.normal(k_fake, real.shape, jnp.float32).astype(cd)

        # fake batch from the CURRENT generator; D never differentiates G
        fake = G(state.params_g, z)
        fake_n = (1.0 - f) * jax.lax.stop_gradient(fake) + f * fake_noise

        # ---- D update -----------------------------------------------------
        def d_loss_fn(params_d):
            logits_r = D(params_d, real_n)
            logits_f = D(params_d, fake_n)
            bce = bce_from_logits(logits_r, cfg.label_real) + bce_from_logits(
                logits_f, cfg.label_fake
            )
            gp = gradient_penalty(
                lambda x: jax.nn.sigmoid(D(params_d, x)),
                k_alpha,
                real_n,
                fake_n,
            )
            loss_for_grad = bce + (lam * gp if cfg.gp_in_d_grad else 0.0)
            aux = {
                "loss_d": bce + lam * gp,  # reference's reported error_d (:179)
                "gp": gp,
                "d_x": jnp.mean(jax.nn.sigmoid(logits_r)),
                "d_gz1": jnp.mean(jax.nn.sigmoid(logits_f)),
            }
            return loss_for_grad, aux

        grads_d, aux = jax.grad(d_loss_fn, has_aux=True)(state.params_d)
        if grad_constraint is not None:
            grads_d = grad_constraint(grads_d)
        upd_d, opt_d = tx.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, upd_d)

        # ---- G update (through the updated D, same noisy-blend draw) ------
        def g_loss_fn(params_g):
            fk = G(params_g, z)
            fk_n = (1.0 - f) * fk + f * fake_noise
            logits = D(params_d, fk_n)
            return bce_from_logits(logits, cfg.label_real), jnp.mean(jax.nn.sigmoid(logits))

        (loss_g, d_gz2), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_g)
        if grad_constraint is not None:
            grads_g = grad_constraint(grads_g)
        upd_g, opt_g = tx.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)

        ema_g = state.ema_g
        if cfg.ema_decay > 0 and ema_g is not None:
            dec = cfg.ema_decay
            ema_g = jax.tree_util.tree_map(
                lambda e, p: dec * e + (1.0 - dec) * p, ema_g, params_g
            )

        metrics = {**aux, "loss_g": loss_g, "d_gz2": d_gz2}
        metrics = {n: v.astype(jnp.float32) for n, v in metrics.items()}
        new_state = GANTrainState(
            params_g=params_g,
            params_d=params_d,
            opt_g=opt_g,
            opt_d=opt_d,
            step=state.step + 1,
            rng=state.rng,
            ema_g=ema_g,
        )
        return new_state, metrics

    return step


def make_cgan_train_step(cfg: Config, geo: GANGeometry,
                         grad_constraint: Callable = None) -> Callable:
    """Conditional variant: step(state, real_batch, labels_onehot).
    ``grad_constraint``: same hook as make_dcgan_train_step."""
    cd = _dtype(cfg)
    tx = make_optimizer(cfg)
    lam, f = cfg.lambda_gp, cfg.instance_noise
    remat = getattr(cfg, "remat", "none")
    G = _maybe_remat(
        lambda p, z, lab: cgan.cgenerator_apply(p, z, lab, geo, cd),
        remat in ("g", "both"),
    )
    D = _maybe_remat(
        lambda p, x, lab, dk: cgan.cdiscriminator_apply(p, x, lab, geo, cd, dropout_key=dk),
        remat in ("d", "both"),
    )

    if getattr(cfg, "fused_prop", 0):

        def step_fp(state: GANTrainState, real: jax.Array, labels: jax.Array):
            k = jax.random.fold_in(state.rng, state.step)
            (k_real, k_z, k_fake, k_alpha, k_dr, k_df, k_di, _unused_k_dg
             ) = jax.random.split(k, 8)

            labels = labels.astype(jnp.float32)
            real_n = instance_noise_blend(k_real, real.astype(cd), f)
            z = jax.random.normal(k_z, (real.shape[0], geo.z_dim), jnp.float32)
            fake_noise = jax.random.normal(k_fake, real.shape, jnp.float32).astype(cd)

            fake_n, vjp_gpath = jax.vjp(
                lambda pg: (1.0 - f) * G(pg, z, labels) + f * fake_noise,
                state.params_g)

            def d_rg_loss(params_d):
                logits_r = D(params_d, real_n, labels, k_dr)
                bce_r = bce_from_logits(logits_r, cfg.label_real)
                gp = gradient_penalty(
                    lambda x: jax.nn.sigmoid(D(params_d, x, labels, k_di)),
                    k_alpha, real_n, jax.lax.stop_gradient(fake_n))
                # CGAN backprops the full error_d incl. GP (cgan_trainer.py:201-203)
                return bce_r + lam * gp, (bce_r, gp, jnp.mean(jax.nn.sigmoid(logits_r)))

            grads_d_rg, (bce_r, gp, d_x) = jax.grad(
                d_rg_loss, has_aux=True)(state.params_d)
            # the shared fake-side forward uses ONE dropout mask (k_df) for
            # both players — a documented fused_prop delta vs the fresh
            # per-forward masks of the faithful path
            bce_f, loss_g, d_gz, grads_d_fake, grads_g = _fused_prop_fake_side(
                lambda pd, x: D(pd, x, labels, k_df), vjp_gpath,
                jax.lax.stop_gradient(fake_n), state.params_d, cfg)
            grads_d = jax.tree_util.tree_map(jnp.add, grads_d_rg, grads_d_fake)
            if grad_constraint is not None:
                grads_d, grads_g = grad_constraint(grads_d), grad_constraint(grads_g)

            upd_d, opt_d = tx.update(grads_d, state.opt_d, state.params_d)
            params_d = optax.apply_updates(state.params_d, upd_d)
            upd_g, opt_g = tx.update(grads_g, state.opt_g, state.params_g)
            params_g = optax.apply_updates(state.params_g, upd_g)

            ema_g = state.ema_g
            if cfg.ema_decay > 0 and ema_g is not None:
                dec = cfg.ema_decay
                ema_g = jax.tree_util.tree_map(
                    lambda e, p: dec * e + (1.0 - dec) * p, ema_g, params_g)

            metrics = {"loss_d": bce_r + bce_f + lam * gp, "gp": gp,
                       "d_x": d_x, "d_gz1": d_gz, "loss_g": loss_g,
                       "d_gz2": d_gz}
            metrics = {n: v.astype(jnp.float32) for n, v in metrics.items()}
            return GANTrainState(
                params_g=params_g, params_d=params_d, opt_g=opt_g,
                opt_d=opt_d, step=state.step + 1, rng=state.rng,
                ema_g=ema_g), metrics

        return step_fp

    def step(state: GANTrainState, real: jax.Array, labels: jax.Array):
        k = jax.random.fold_in(state.rng, state.step)
        (k_real, k_z, k_fake, k_alpha, k_dr, k_df, k_di, k_dg) = jax.random.split(k, 8)

        labels = labels.astype(jnp.float32)
        real_n = instance_noise_blend(k_real, real.astype(cd), f)
        z = jax.random.normal(k_z, (real.shape[0], geo.z_dim), jnp.float32)
        fake_noise = jax.random.normal(k_fake, real.shape, jnp.float32).astype(cd)

        fake = G(state.params_g, z, labels)
        fake_n = (1.0 - f) * jax.lax.stop_gradient(fake) + f * fake_noise

        def d_loss_fn(params_d):
            logits_r = D(params_d, real_n, labels, k_dr)
            logits_f = D(params_d, fake_n, labels, k_df)
            bce = bce_from_logits(logits_r, cfg.label_real) + bce_from_logits(
                logits_f, cfg.label_fake
            )
            gp = gradient_penalty(
                lambda x: jax.nn.sigmoid(D(params_d, x, labels, k_di)),
                k_alpha,
                real_n,
                fake_n,
            )
            # CGAN backprops the full error_d incl. GP (cgan_trainer.py:201-203)
            loss_for_grad = bce + lam * gp
            aux = {
                "loss_d": bce + lam * gp,
                "gp": gp,
                "d_x": jnp.mean(jax.nn.sigmoid(logits_r)),
                "d_gz1": jnp.mean(jax.nn.sigmoid(logits_f)),
            }
            return loss_for_grad, aux

        grads_d, aux = jax.grad(d_loss_fn, has_aux=True)(state.params_d)
        if grad_constraint is not None:
            grads_d = grad_constraint(grads_d)
        upd_d, opt_d = tx.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, upd_d)

        def g_loss_fn(params_g):
            fk = G(params_g, z, labels)
            fk_n = (1.0 - f) * fk + f * fake_noise
            logits = D(params_d, fk_n, labels, k_dg)
            return bce_from_logits(logits, cfg.label_real), jnp.mean(jax.nn.sigmoid(logits))

        (loss_g, d_gz2), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_g)
        if grad_constraint is not None:
            grads_g = grad_constraint(grads_g)
        upd_g, opt_g = tx.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)

        ema_g = state.ema_g
        if cfg.ema_decay > 0 and ema_g is not None:
            dec = cfg.ema_decay
            ema_g = jax.tree_util.tree_map(
                lambda e, p: dec * e + (1.0 - dec) * p, ema_g, params_g
            )

        metrics = {**aux, "loss_g": loss_g, "d_gz2": d_gz2}
        metrics = {n: v.astype(jnp.float32) for n, v in metrics.items()}
        new_state = GANTrainState(
            params_g=params_g,
            params_d=params_d,
            opt_g=opt_g,
            opt_d=opt_d,
            step=state.step + 1,
            rng=state.rng,
            ema_g=ema_g,
        )
        return new_state, metrics

    return step


def jit_train_step(
    step: Callable,
    mesh=None,
    donate_state: bool = True,
    state_sharding=None,
):
    """Jit a train step, optionally laying it out over a mesh.

    Default layout: state replicated, batch (and labels) sharded on 'data';
    XLA inserts all-reduces for the global batch-stat and loss means.

    ``state_sharding``: a pytree of NamedShardings matching the state (e.g.
    ``parallel.tp_state_sharding`` for model-axis tensor parallelism) —
    params/opt moments live sharded and GSPMD places the layer collectives.
    """
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate_state else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    st_sh = state_sharding if state_sharding is not None else repl

    # support both (state, batch) and (state, batch, labels)
    import inspect

    nargs = len(inspect.signature(step).parameters)
    return jax.jit(
        step,
        in_shardings=(st_sh,) + (data,) * (nargs - 1),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,) if donate_state else (),
    )

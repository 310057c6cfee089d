"""Int8 (W8A8) serving quantization: ops/quant.py + GeneratorService --quant.

Beyond-reference capability (the reference has no inference path); the
contracts pinned here are the ones the TPU A/B (bench_serve.py --quant int8)
relies on: integer-exact convs, BN absorbing per-channel scale error, and
quantized samples staying close to the float sampler's pixels.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry
from jckx.ops.conv import conv_transpose2d
from jckx.ops.quant import (
    calibrate_generator,
    conv_transpose2d_int8,
    quantize_act,
    quantize_generator,
    quantize_weight_per_channel,
    quantized_generator_apply,
)

from tests.test_serve import _save_ckpt


def test_weight_quant_per_channel_roundtrip():
    """|w - dequant(q)| <= scale/2 per output channel (symmetric rounding),
    and a dead channel quantizes to zeros with a finite scale."""
    w = np.random.RandomState(0).randn(4, 4, 8, 16).astype(np.float32) * 0.02
    w[..., 3] = 0.0  # dead channel
    q, s = quantize_weight_per_channel(w)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(deq - w)
    assert np.all(err <= np.asarray(s)[None, None, None, :] * 0.5 + 1e-9)
    assert np.isfinite(np.asarray(s)).all()
    assert np.all(np.asarray(q)[..., 3] == 0)


def test_int8_convt_integer_exact():
    """int8 ConvTranspose (both the dilated s1 form and the dense-phase
    s2 form) == the float conv_transpose2d on the same integer values —
    int32 accumulation is exact, so equality is bitwise after cast."""
    rng = np.random.RandomState(1)
    for stride, pad, hw in ((1, 0, 1), (2, 1, 8)):
        x = rng.randint(-127, 128, (2, hw, hw, 12)).astype(np.int8)
        w = rng.randint(-127, 128, (4, 4, 12, 10)).astype(np.int8)
        got = conv_transpose2d_int8(jnp.asarray(x), jnp.asarray(w), stride, pad)
        assert got.dtype == jnp.int32
        want = conv_transpose2d(
            jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
            stride=stride, padding=pad)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want, np.int64))


def test_act_quant_representable_values_exact():
    s = jnp.float32(0.5)
    x = jnp.asarray([-63.5, -0.5, 0.0, 0.5, 63.5, 1000.0, -1000.0])
    q = quantize_act(x, s)
    np.testing.assert_array_equal(
        np.asarray(q), np.asarray([-127, -1, 0, 1, 127, 127, -127], np.int8))


def test_quantized_generator_matches_float_pixels():
    """End-to-end int8 forward vs the f32 forward on the same z: uint8
    pixels stay close (the BN-absorbs-per-channel-scale argument in the
    module docstring is what keeps hidden-layer error from compounding)."""
    from jckx.serve import tanh_to_u8

    geo = GANGeometry(image_size=32, base_width=16)
    params = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, geo.z_dim))
    scales = calibrate_generator(params, geo, jax.random.PRNGKey(2),
                                 in_dim=geo.z_dim, batches=2, batch_size=64)
    qp = quantize_generator(params, scales, geo)
    # every conv weight is int8, every BN vector f32
    assert qp["convt0_q"].dtype == jnp.int8
    assert qp["bn0_scale"].dtype == jnp.float32

    ref = np.asarray(tanh_to_u8(dcgan.generator_apply(params, z, geo)), np.int32)
    got = np.asarray(tanh_to_u8(quantized_generator_apply(qp, z, geo)), np.int32)
    diff = np.abs(ref - got)
    assert diff.mean() < 2.0, f"mean |Δpixel| {diff.mean():.2f}"
    assert np.mean(diff <= 8) > 0.99, f"p99 pixel error too large: {diff.max()}"


def test_quantize_generator_rejects_bad_scales():
    import pytest

    geo = GANGeometry(image_size=16, base_width=8)
    params = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    with pytest.raises(ValueError, match="act_scales"):
        quantize_generator(params, jnp.ones((geo.n_up + 3,)), geo)


def test_service_quant_int8(tmp_path):
    """GeneratorService(quant='int8') serves uint8 samples deterministically
    per key and close to the float service's pixels on the same key."""
    from jckx.serve import GeneratorService

    path, geo = _save_ckpt(tmp_path)
    k = jax.random.PRNGKey(7)
    f32 = GeneratorService(path, geo=geo, batch_size=8,
                           compute_dtype=jnp.float32)
    q = GeneratorService(path, geo=geo, batch_size=8,
                         compute_dtype=jnp.float32, quant="int8")
    a = q.sample(8, key=k)
    assert a.shape == (8, 16, 16, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, q.sample(8, key=k))  # deterministic
    b = f32.sample(8, key=k)
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.mean() < 3.0, f"quant vs float mean |Δpixel| {diff.mean():.2f}"


def test_service_quant_int8_conditional(tmp_path):
    """CGAN quant serving: labels control classes through the quantized
    concat input; per-key determinism holds."""
    from jckx.serve import GeneratorService

    path, geo = _save_ckpt(tmp_path, conditional=True)
    svc = GeneratorService(path, geo=geo, batch_size=4, num_classes=10,
                           conditional=True, compute_dtype=jnp.float32,
                           quant="int8")
    k = jax.random.PRNGKey(3)
    a = svc.sample(4, labels=[1, 2, 3], key=k)
    assert a.shape == (4, 16, 16, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, svc.sample(4, labels=[1, 2, 3], key=k))
    # a different label set must change the pixels (class input is live)
    c = svc.sample(4, labels=[7], key=k)
    assert np.abs(a.astype(int) - c.astype(int)).max() > 0


def test_service_quant_rejects_unknown_mode(tmp_path):
    import pytest

    from jckx.serve import GeneratorService

    path, geo = _save_ckpt(tmp_path)
    with pytest.raises(ValueError, match="quant="):
        GeneratorService(path, geo=geo, batch_size=4, quant="int4")


def test_service_quant_int8_mesh_sharded(tmp_path):
    """quant='int8' composes with mesh serving: the int8 pytree replicates,
    the request batch shards on 'data', and the sharded samples equal the
    single-device quant service's on the same key."""
    from jax.sharding import Mesh

    from jckx.serve import GeneratorService

    path, geo = _save_ckpt(tmp_path)
    k = jax.random.PRNGKey(11)
    single = GeneratorService(path, geo=geo, batch_size=8,
                              compute_dtype=jnp.float32, quant="int8")
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = GeneratorService(path, geo=geo, batch_size=8,
                               compute_dtype=jnp.float32, quant="int8",
                               mesh=mesh)
    a, b = single.sample(8, key=k), sharded.sample(8, key=k)
    # integer conv math is exact; BN stats are f32 reductions whose grouping
    # may differ across shardings -> allow +-1 uint8 count
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_evaluate_scores_the_served_pytree(tmp_path):
    """The quantized pytree `jckx.evaluate --quant int8` scores must be
    bit-for-bit the one `GeneratorService(quant='int8')` serves for the
    same seed. Regression: evaluate once calibrated with
    fold_in(PRNGKey(seed), salt) while serve used PRNGKey(seed + salt) —
    near-identical scales, but the metric-isolation claim was false in the
    clipping tail. Both now route through ops/quant.py::make_sampler with
    serving_calibration_key(seed)."""
    from jckx.ops.quant import make_sampler
    from jckx.serve import GeneratorService

    path, geo = _save_ckpt(tmp_path)
    svc = GeneratorService(path, geo=geo, batch_size=512,
                           compute_dtype=jnp.float32, quant="int8", seed=7)
    # calibration is decoupled from serving batch size: a small-batch
    # service must quantize to the SAME pytree (regression: min(bs, 64)
    # coupling once made bs<64 services calibrate differently than
    # evaluate scored)
    svc_small = GeneratorService(path, geo=geo, batch_size=32,
                                 compute_dtype=jnp.float32, quant="int8",
                                 seed=7)
    for a, b in zip(jax.tree_util.tree_leaves(svc.params_g),
                    jax.tree_util.tree_leaves(svc_small.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    svc_float = GeneratorService(path, geo=geo, batch_size=512,
                                 compute_dtype=jnp.float32, seed=7)
    # evaluate.py's exact call shape (defaults: calib_batches=4, bs=64)
    qp_eval, _ = make_sampler(svc_float.params_g, geo, quant="int8",
                              conditional=False, num_classes=100,
                              compute_dtype=jnp.float32, seed=7)
    served = jax.tree_util.tree_leaves(svc.params_g)
    scored = jax.tree_util.tree_leaves(qp_eval)
    assert len(served) == len(scored)
    for a, b in zip(served, scored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_default_calibration_matches_default_serve(tmp_path,
                                                            monkeypatch):
    """Default `evaluate --quant int8` must calibrate with serve's DEFAULT
    seed (0), independent of the eval-noise --seed. Regression: evaluate
    once fed its eval-noise seed (default cfg.seed=12345) into
    make_sampler, so the default-CLI scored pytree was NOT the default-CLI
    served one — and matching serve's seed via --seed would have abandoned
    the trainer-matching z protocol. --calib_seed now carries the
    calibration identity alone."""
    import jckx.ops.quant as quant_mod
    from jckx.evaluate import evaluate, get_args
    from tests.test_trainer import StubMetrics

    path, _geo = _save_ckpt(tmp_path)
    seen = []
    real = quant_mod.make_sampler

    def spy(params, geo, **kw):
        # GeneratorService's own load path also routes through make_sampler
        # (quant=None float passthrough) — only the int8 calibration calls
        # carry the contract under test
        if kw.get("quant") == "int8":
            seen.append(kw.get("seed"))
        return real(params, geo, **kw)

    monkeypatch.setattr(quant_mod, "make_sampler", spy)
    base = ["--ckpt", path, "--dataset", "synthetic",
            "--image_size", "16", "--base_width", "8",
            "--compute_dtype", "float32", "--quant", "int8"]
    # defaults: calibration seed 0 == serve's --seed default, even though
    # the eval-noise seed defaults to the training seed (12345)
    evaluate(get_args(base), metrics=StubMetrics())
    # an explicit eval-noise seed must NOT leak into calibration
    evaluate(get_args(base + ["--seed", "7"]), metrics=StubMetrics())
    # --calib_seed is the one knob that moves it
    evaluate(get_args(base + ["--calib_seed", "5"]), metrics=StubMetrics())
    assert seen == [0, 0, 5]

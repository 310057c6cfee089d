"""Standalone checkpoint evaluation (jckx.evaluate): protocol, .pt import,
stub-metrics fast paths, and a slow real-backbone smoke.

The reference has no out-of-training metric path at all — these tests pin
that the CLI reproduces the trainers' eval protocol (same fold-999 noise,
class-major conditional grid, one extraction feeding all metrics)."""

import json
import os

import numpy as np
import jax
import pytest
import torch

from jckx.evaluate import evaluate, get_args
from jckx.models.dcgan import GANGeometry
from tests.test_torch_convert import (
    _checkpoint_dict,
    _ref_cgan_discriminator,
    _ref_dcgan_discriminator,
    _ref_generator,
    _weights_init,
)
from tests.test_trainer import StubMetrics


def _dcgan_pt(tmp_path, geo):
    torch.manual_seed(11)
    gen = _ref_generator(geo, geo.z_dim)
    disc = _ref_dcgan_discriminator(geo)
    _weights_init(gen)
    _weights_init(disc)
    path = str(tmp_path / "ref.pt")
    torch.save(_checkpoint_dict(
        gen, disc, torch.optim.Adam(gen.parameters()),
        torch.optim.Adam(disc.parameters())), path)
    return path


def test_evaluate_dcgan_pt_with_stub_metrics(tmp_path):
    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    path = _dcgan_pt(tmp_path, geo)
    args = get_args(["--ckpt", path, "--dataset", "synthetic",
                     "--sample_count", "24", "--compute_dtype", "float32"])
    res = evaluate(args, metrics=StubMetrics())
    assert set(res) == {"step", "n", "is", "fid"}
    assert res["n"] == 24 and res["step"] == 0
    assert np.isfinite(res["is"]) and np.isfinite(res["fid"])


def test_evaluate_cgan_pt_reports_intra_fid(tmp_path):
    ncls = 10
    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    torch.manual_seed(12)
    gen = _ref_generator(geo, geo.z_dim + ncls)
    disc = _ref_cgan_discriminator(geo, ncls)
    _weights_init(gen)
    _weights_init(disc)
    path = str(tmp_path / "cref.pt")
    torch.save(_checkpoint_dict(
        gen, disc, torch.optim.Adam(gen.parameters()),
        torch.optim.Adam(disc.parameters())), path)

    args = get_args(["--ckpt", path, "--dataset", "synthetic",
                     "--compute_dtype", "float32"])
    res = evaluate(args, metrics=StubMetrics())
    # conditional grid: class-major 10 per class, intra-FID reported
    assert res["n"] == 10 * ncls
    assert "intra_fid" in res and np.isfinite(res["intra_fid"])


def test_evaluate_matches_trainer_eval_numbers(tmp_path):
    """Scoring latest.ckpt standalone reproduces the numbers the training
    run's own final eval logged: same seed → same fold-999 z → bit-identical
    samples → identical metrics (here through one shared stub engine)."""
    from jckx.data.pipeline import DCGANDataPreprocessor
    from jckx.models import dcgan
    from jckx.train.gan_trainer import DCGANTrainer
    from tests.test_trainer import tiny_cfg

    cfg = tiny_cfg(tmp_path, "DCGAN")
    cfg.sample_count = 24
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.transform_data()
    geo = GANGeometry(z_dim=cfg.z_dim, image_size=cfg.image_size,
                      channels=cfg.channels, base_width=cfg.base_width)
    stub = StubMetrics()
    tr = DCGANTrainer(cfg,
                      dcgan.generator_init(jax.random.PRNGKey(0), geo),
                      dcgan.discriminator_init(jax.random.PRNGKey(1), geo),
                      data_pre, metrics=stub)
    tr.train()
    from jckx.checkpoint import flush_writes

    flush_writes()
    ckpt = os.path.join(cfg.save_path, "latest.ckpt")
    assert os.path.exists(ckpt)

    args = get_args(["--ckpt", ckpt, "--sample_count", "24",
                     "--compute_dtype", "float32"])
    res = evaluate(args, metrics=stub)
    assert res["step"] == int(tr.state.step)
    # the stub returns call-count-dependent values; what must match the
    # trainer protocol is the INPUT: same z (seed fold 999) → same samples.
    # Re-evaluate with the generator params and compare directly:
    import jax.numpy as jnp

    z = jax.random.normal(
        jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 999),
        (24, geo.z_dim))
    expect = dcgan.generator_apply(tr.state.params_g, z, geo, jnp.float32)
    svc_args = get_args(["--ckpt", ckpt, "--sample_count", "24",
                         "--compute_dtype", "float32"])

    class CaptureStub(StubMetrics):
        def extract_features(self, images):
            self.captured = np.asarray(images)
            return super().extract_features(images)

    cap = CaptureStub()
    evaluate(svc_args, metrics=cap)
    np.testing.assert_allclose(cap.captured, np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_evaluate_cli_end_to_end_real_backbone(tmp_path, capsys):
    """Full CLI path with the real Metrics engine (seeded-random backbone
    fallback) on a tiny synthetic set — finite JSON line out."""
    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    path = _dcgan_pt(tmp_path, geo)
    from jckx.evaluate import main

    main(["--ckpt", path, "--dataset", "synthetic", "--synthetic_size", "32",
          "--sample_count", "16", "--eval_batch_size", "8",
          "--compute_dtype", "float32", "--data_dir", str(tmp_path)])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert np.isfinite(res["fid"]) and res["is"] >= 1.0 - 1e-3
    assert res["n"] == 16


def test_evaluate_quant_int8_scores_quantized_sampler(tmp_path):
    """--quant int8 scores the W8A8 serving sampler: result is tagged, stays
    finite, and the images actually fed to the metric engine differ from the
    float run's (the quantized forward is live) while staying close."""
    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    path = _dcgan_pt(tmp_path, geo)

    class CaptureStub(StubMetrics):
        def extract_features(self, images):
            self.images = np.asarray(images, np.float32)
            return super().extract_features(images)

    base = ["--ckpt", path, "--dataset", "synthetic",
            "--sample_count", "24", "--compute_dtype", "float32"]
    s_f, s_q = CaptureStub(), CaptureStub()
    res_f = evaluate(get_args(base), metrics=s_f)
    res_q = evaluate(get_args(base + ["--quant", "int8"]), metrics=s_q)
    assert "quant" not in res_f and res_q["quant"] == "int8"
    assert np.isfinite(res_q["is"]) and np.isfinite(res_q["fid"])
    d = np.abs(s_f.images - s_q.images)
    assert d.max() > 0, "quantized sampler produced bit-identical images"
    assert d.mean() < 0.05, f"quant images drifted too far: mean |Δ| {d.mean():.3f}"


def test_evaluate_npz_real_side(tmp_path, capsys):
    """--dataset npz --data_path as the REAL side of a full-engine eval
    (the stub-metrics paths skip the preprocessor, so this is the test
    that pins the custom-plane forwarding through evaluate)."""
    geo = GANGeometry(z_dim=16, image_size=16, channels=3, base_width=8)
    path = _dcgan_pt(tmp_path, geo)
    rng = np.random.RandomState(2)
    npz = str(tmp_path / "real.npz")
    with open(npz, "wb") as f:
        np.savez(f, x=rng.randint(0, 256, (32, 16, 16, 3)).astype(np.uint8))
    from jckx.evaluate import main

    main(["--ckpt", path, "--dataset", "npz", "--data_path", npz,
          "--sample_count", "16", "--eval_batch_size", "8",
          "--compute_dtype", "float32", "--data_dir", str(tmp_path)])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert np.isfinite(res["fid"]) and res["n"] == 16

"""Portable StableHLO export (jckx.export): roundtrip determinism, weight
fidelity vs the live service's math, conditional label plumbing, CLI."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_serve import _save_ckpt


def test_export_roundtrip_unconditional(tmp_path):
    from jckx.export import export_generator, load_exported
    from jckx.models import dcgan
    from jckx.serve import GeneratorService, tanh_to_u8

    path, geo = _save_ckpt(tmp_path)
    dst = str(tmp_path / "gen.jaxexp")
    info = export_generator(path, dst, batch_size=4,
                            geo_overrides={"image_size": 16, "base_width": 8},
                            compute_dtype=jnp.float32, platforms=["cpu"])
    assert os.path.exists(dst) and info["bytes"] > 0
    side = json.load(open(dst + ".json"))
    assert side["image_size"] == 16 and side["conditional"] is False

    sample = load_exported(dst)
    a = np.asarray(sample(7))
    assert a.shape == (4, 16, 16, 3) and a.dtype == np.uint8
    # determinism + seed sensitivity
    np.testing.assert_array_equal(a, np.asarray(sample(7)))
    assert np.abs(a.astype(int) - np.asarray(sample(8)).astype(int)).max() > 0
    # labels rejected for an unconditional artifact
    with pytest.raises(ValueError, match="unconditional"):
        sample(0, labels=[1, 2, 3, 4])

    # weight fidelity: the blob's embedded params reproduce the live
    # checkpoint's generator bit-for-bit on the same seed-derived z
    svc = GeneratorService(path, geo=geo, batch_size=4, compute_dtype=jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(7), (4, geo.z_dim))
    direct = np.asarray(tanh_to_u8(
        dcgan.generator_apply(svc.params_g, z, geo, jnp.float32)))
    np.testing.assert_array_equal(a, direct)


def test_export_roundtrip_conditional(tmp_path):
    from jckx.export import export_generator, load_exported

    path, geo = _save_ckpt(tmp_path, conditional=True)
    dst = str(tmp_path / "cgen.jaxexp")
    info = export_generator(path, dst, batch_size=4, conditional=True,
                            num_classes=10,
                            geo_overrides={"image_size": 16, "base_width": 8},
                            compute_dtype=jnp.float32, platforms=["cpu"])
    assert info["conditional"] and info["num_classes"] == 10
    sample = load_exported(dst)
    with pytest.raises(ValueError, match="conditional"):
        sample(0)  # labels required
    a = np.asarray(sample(3, labels=[1, 2, 3, 4]))
    b = np.asarray(sample(3, labels=[5, 6, 7, 8]))
    assert a.shape == (4, 16, 16, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0  # labels matter


def test_export_cli(tmp_path):
    from jckx.export import load_exported, main

    path, _ = _save_ckpt(tmp_path)
    dst = str(tmp_path / "cli.jaxexp")
    main(["--ckpt", path, "--dst", dst, "-b", "2", "--image_size", "16",
          "--base_width", "8", "--compute_dtype", "float32",
          "--platforms", "cpu"])
    imgs = np.asarray(load_exported(dst)(0))
    assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8

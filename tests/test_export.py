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


def test_artifact_service_sample_and_http(tmp_path):
    """ArtifactService serves the same surface the HTTP daemon needs —
    straight from the .jaxexp blob + sidecar, no checkpoint, no model code."""
    import io
    import json as _json
    import threading
    import urllib.request

    from jckx.export import ArtifactService, export_generator
    from jckx.serve import make_http_server

    path, geo = _save_ckpt(tmp_path)
    dst = str(tmp_path / "svc.jaxexp")
    export_generator(path, dst, batch_size=4,
                     geo_overrides={"image_size": 16, "base_width": 8},
                     compute_dtype=jnp.float32, platforms=["cpu"])

    svc = ArtifactService(dst)
    assert svc.step == 42 and not svc.conditional and svc.batch_size == 4
    a = svc.sample(6)
    assert a.shape == (6, 16, 16, 3) and a.dtype == np.uint8
    k = jax.random.PRNGKey(3)
    np.testing.assert_array_equal(svc.sample(6, key=k), svc.sample(6, key=k))
    with pytest.raises(ValueError, match="unconditional"):
        svc.sample(2, labels=[1])
    with pytest.raises(ValueError, match="n must be"):
        svc.sample(0)

    srv = make_http_server(svc, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=120) as r:
            health = _json.loads(r.read())
        assert health["status"] == "ok" and health["image_size"] == 16
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=_json.dumps({"n": 5, "seed": 11, "format": "npy"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            b1 = r.read()
        with urllib.request.urlopen(req, timeout=120) as r:
            b2 = r.read()
        assert b1 == b2  # same seed → byte-identical
        assert np.load(io.BytesIO(b1)).shape == (5, 16, 16, 3)
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_serve_cli_rejects_overrides_on_artifact(tmp_path):
    from jckx.export import export_generator
    from jckx.serve import get_args, main

    path, _ = _save_ckpt(tmp_path)
    dst = str(tmp_path / "sealed.jaxexp")
    export_generator(path, dst, batch_size=4,
                     geo_overrides={"image_size": 16, "base_width": 8},
                     compute_dtype=jnp.float32, platforms=["cpu"])
    with pytest.raises(SystemExit, match="sealed artifact"):
        main(get_args(["--ckpt", dst, "--image_size", "32", "-n", "2",
                       "-o", str(tmp_path / "x.png")]))
    # and the clean path works
    out = str(tmp_path / "ok.png")
    main(get_args(["--ckpt", dst, "-n", "4", "-o", out]))
    assert os.path.getsize(out) > 0


def test_export_guards_and_ema_tristate(tmp_path):
    """Zero-batch exports are rejected; sealed artifacts reject --batch_size;
    --weights live on an EMA checkpoint forces the live generator without a
    restore-template mismatch."""
    from jckx.checkpoint import save_checkpoint
    from jckx.export import export_generator
    from jckx.models.dcgan import GANGeometry
    from jckx.serve import GeneratorService, get_args, main
    from jckx.train.state import make_template_state

    path, _ = _save_ckpt(tmp_path)
    with pytest.raises(ValueError, match="batch_size"):
        export_generator(path, str(tmp_path / "z.jaxexp"), batch_size=0,
                         geo_overrides={"image_size": 16, "base_width": 8},
                         platforms=["cpu"])

    dst = str(tmp_path / "sealed2.jaxexp")
    export_generator(path, dst, batch_size=2,
                     geo_overrides={"image_size": 16, "base_width": 8},
                     compute_dtype=jnp.float32, platforms=["cpu"])
    with pytest.raises(SystemExit, match="sealed artifact"):
        main(get_args(["--ckpt", dst, "--batch_size", "8", "-n", "2",
                       "-o", str(tmp_path / "x.png")]))

    # EMA checkpoint (sidecar ema:true, distinct EMA weights)
    geo = GANGeometry(image_size=16, base_width=8)
    st = make_template_state(geo, conditional=False, num_classes=10,
                             with_ema=True)
    st = st.replace(ema_g=jax.tree_util.tree_map(lambda a: a + 1.0,
                                                 st.params_g))
    ck = str(tmp_path / "ema.ckpt")
    save_checkpoint(ck, st, {"serve_config": {
        "conditional": False, "num_classes": 10, "z_dim": geo.z_dim,
        "image_size": 16, "channels": 3, "base_width": 8, "ema": True}})
    auto = GeneratorService(ck, batch_size=2, compute_dtype=jnp.float32)
    live = GeneratorService(ck, batch_size=2, compute_dtype=jnp.float32,
                            use_ema=False)
    assert auto.used_ema and not live.used_ema
    la = jax.tree_util.tree_leaves(auto.params_g)[0]
    ll = jax.tree_util.tree_leaves(live.params_g)[0]
    assert np.abs(np.asarray(la) - np.asarray(ll)).max() > 0.5

    info = export_generator(ck, str(tmp_path / "ema.jaxexp"), batch_size=2,
                            use_ema=False, compute_dtype=jnp.float32,
                            platforms=["cpu"])
    assert info["ema_weights"] is False


def test_export_quant_int8_artifact(tmp_path):
    """--quant int8 bakes the W8A8 sampler into the blob: int8 weights as
    constants, no calibration at load; same seed-derived z stream as the
    float artifact, so pixels must stay close and the blob must shrink."""
    from jckx.export import export_generator, load_exported

    path, geo = _save_ckpt(tmp_path)
    dst_f = str(tmp_path / "gen_f32.jaxexp")
    dst_q = str(tmp_path / "gen_int8.jaxexp")
    info_f = export_generator(path, dst_f, batch_size=4,
                              geo_overrides={"image_size": 16, "base_width": 8},
                              compute_dtype=jnp.float32, platforms=["cpu"])
    info_q = export_generator(path, dst_q, batch_size=4,
                              geo_overrides={"image_size": 16, "base_width": 8},
                              compute_dtype=jnp.float32, platforms=["cpu"],
                              quant="int8")
    assert info_q["quant"] == "int8" and info_f["quant"] is None
    assert json.load(open(dst_q + ".json"))["quant"] == "int8"
    # int8 constants: the quant blob must be materially smaller
    assert info_q["bytes"] < 0.7 * info_f["bytes"], (info_q["bytes"],
                                                     info_f["bytes"])

    sample_q = load_exported(dst_q)
    a = np.asarray(sample_q(3))
    assert a.shape == (4, 16, 16, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, np.asarray(sample_q(3)))  # deterministic
    b = np.asarray(load_exported(dst_f)(3))  # same PRNGKey(3) z inside both
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.mean() < 3.0, f"quant vs float artifact mean pixel delta {diff.mean():.2f}"

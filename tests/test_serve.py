"""Serving path: checkpoint → GeneratorService → uint8 samples."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jckx.checkpoint import save_checkpoint
from jckx.configs import Config
from jckx.models import cgan, dcgan
from jckx.models.dcgan import GANGeometry
from jckx.serve import GeneratorService
from jckx.train.state import GANTrainState, make_optimizer


def _save_ckpt(tmp_path, conditional=False):
    cfg = Config()
    cfg.max_learning_rate = 2e-4
    geo = GANGeometry(image_size=16, base_width=8)
    tx = make_optimizer(cfg)
    if conditional:
        pg = cgan.cgenerator_init(jax.random.PRNGKey(0), geo, 10)
        pd = cgan.cdiscriminator_init(jax.random.PRNGKey(1), geo, 10)
    else:
        pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
        pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.asarray(42, jnp.int32),
                       rng=jax.random.PRNGKey(2))
    path = os.path.join(tmp_path, "latest.ckpt")
    save_checkpoint(path, st)
    return path, geo


def test_service_generates_from_checkpoint(tmp_path):
    path, geo = _save_ckpt(tmp_path)
    svc = GeneratorService(path, geo=geo, batch_size=8, compute_dtype=jnp.float32)
    assert svc.step == 42
    imgs = svc.sample(5)
    assert imgs.shape == (5, 16, 16, 3) and imgs.dtype == np.uint8
    # same explicit key → same images; service-managed keys advance
    k = jax.random.PRNGKey(9)
    a, b = svc.sample(3, key=k), svc.sample(3, key=k)
    np.testing.assert_array_equal(a, b)
    c = svc.sample(3)
    assert np.abs(a.astype(int) - c.astype(int)).max() > 0


def test_sample_input_validation(tmp_path):
    """n<1 and labels-on-unconditional are hard errors from the Python API —
    the same contract the HTTP front answers with a 400 (silently returning
    random samples would fake class control)."""
    import pytest

    path, geo = _save_ckpt(tmp_path)
    svc = GeneratorService(path, geo=geo, batch_size=4, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="n must be"):
        svc.sample(0)
    with pytest.raises(ValueError, match="unconditional"):
        svc.sample(4, labels=[3, 1, 4])
    # empty labels still mean "random classes", not an error
    assert svc.sample(2, labels=[]).shape == (2, 16, 16, 3)


def test_service_subpixel_convt_matches_default(tmp_path):
    """subpixel=True serves the kernel-segregated ConvTranspose trace —
    same samples as the default dilated form to f32 fusion tolerance
    (uint8 outputs: allow ±1 count from boundary rounding)."""
    path, geo = _save_ckpt(tmp_path)
    k = jax.random.PRNGKey(4)
    base = GeneratorService(path, geo=geo, batch_size=4,
                            compute_dtype=jnp.float32).sample(4, key=k)
    sub = GeneratorService(path, geo=geo, batch_size=4,
                           compute_dtype=jnp.float32,
                           subpixel=True).sample(4, key=k)
    assert np.abs(base.astype(int) - sub.astype(int)).max() <= 1


def test_service_conditional_labels(tmp_path):
    path, geo = _save_ckpt(tmp_path, conditional=True)
    svc = GeneratorService(path, conditional=True, num_classes=10, geo=geo,
                           batch_size=8, compute_dtype=jnp.float32)
    k = jax.random.PRNGKey(0)
    a = svc.sample(4, labels=[1], key=k)
    b = svc.sample(4, labels=[7], key=k)
    assert a.shape == (4, 16, 16, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0  # label changes output


def test_service_self_configures_from_trainer_sidecar(tmp_path):
    """A real trainer checkpoint carries serve_config; GeneratorService
    needs only the path (geometry, conditioning, EMA auto-detected)."""
    from jckx.data.pipeline import DCGANDataPreprocessor
    from jckx.logging.main_logger import MainLogger
    from jckx.models import dcgan as m
    from jckx.train.gan_trainer import DCGANTrainer
    from tests.test_trainer import StubMetrics, tiny_cfg

    cfg = tiny_cfg(tmp_path)
    cfg.ema_decay = 0.99
    data_pre = DCGANDataPreprocessor(cfg)
    data_pre.images_u8 = data_pre.images_u8[:64]
    data_pre.labels_np = data_pre.labels_np[:64]
    geo = GANGeometry(z_dim=100, image_size=16, channels=3, base_width=8)
    pg = m.generator_init(jax.random.PRNGKey(0), geo)
    pd = m.discriminator_init(jax.random.PRNGKey(1), geo)
    tr = DCGANTrainer(cfg, pg, pd, data_pre, metrics=StubMetrics())
    tr.train()
    MainLogger.reset()

    ckpt = os.path.join(cfg.save_path, "latest.ckpt")
    svc = GeneratorService(ckpt, batch_size=4, compute_dtype=jnp.float32)
    assert svc.geo.image_size == 16 and svc.geo.base_width == 8
    assert svc.conditional is False
    imgs = svc.sample(4)
    assert imgs.shape == (4, 16, 16, 3)
    # EMA weights were restored (differ from live G after training)
    # (sanity: the service sampled without errors from ema_g)

    # best-metric checkpoints carry the same sidecar (code-review fix)
    fid_dir = os.path.join(cfg.save_path, "fid")
    best = [f for f in os.listdir(fid_dir) if f.endswith(".ckpt")][0]
    svc2 = GeneratorService(os.path.join(fid_dir, best), batch_size=4,
                            compute_dtype=jnp.float32)
    assert svc2.geo.image_size == 16
    assert svc2.sample(2).shape == (2, 16, 16, 3)

    # per-field geometry override merges with sidecar values
    svc3 = GeneratorService(ckpt, batch_size=4, compute_dtype=jnp.float32,
                            geo_overrides={"image_size": 16})
    assert svc3.geo.base_width == 8  # still from sidecar


def test_sample_pipelined_batches_keep_order_and_determinism(tmp_path):
    """sample() keeps a window of request batches in flight (async dispatch,
    ordered drain). With more batches than the window, ordering and
    determinism must hold: same key → identical images, and the first batch
    equals a single-batch request with the same key."""
    path, geo = _save_ckpt(tmp_path)
    svc = GeneratorService(path, geo=geo, batch_size=4, compute_dtype=jnp.float32)
    k = jax.random.PRNGKey(3)
    a = svc.sample(40, key=k)   # 10 batches > the 8-deep window
    b = svc.sample(40, key=k)
    assert a.shape == (40, 16, 16, 3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a[:4], svc.sample(4, key=k))


def test_service_mesh_sharded_batch_matches_single_device(tmp_path):
    """Multi-chip serving: the request batch sharded over the 8-device
    'data' mesh renders the same images as the single-device service (the
    only tolerated delta is ±1 pixel level from GSPMD's reduction order in
    the BN batch stats)."""
    import pytest

    from jckx.parallel import make_mesh

    path, geo = _save_ckpt(tmp_path)
    k = jax.random.PRNGKey(5)
    single = GeneratorService(path, geo=geo, batch_size=16,
                              compute_dtype=jnp.float32)
    a = single.sample(16, key=k)

    mesh = make_mesh((8,), ("data",))
    sharded = GeneratorService(path, geo=geo, batch_size=16,
                               compute_dtype=jnp.float32, mesh=mesh)
    b = sharded.sample(16, key=k)
    assert b.shape == (16, 16, 16, 3) and b.dtype == np.uint8
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    # global batch must divide the data axis
    with pytest.raises(ValueError, match="divisible"):
        GeneratorService(path, geo=geo, batch_size=12, mesh=mesh)


def test_service_mesh_pallas_kernel_partitions_and_matches(tmp_path, monkeypatch):
    """Multi-chip serving with the Pallas inference kernel engaged
    (interpret mode unlocks it off-TPU; base_width=64 gives a 128-channel
    BN layer so the lane-alignment dispatch actually fires): the
    custom_partitioning-wrapped stage renders the same images sharded over
    the 8-device mesh as the single-device XLA path does."""
    import os

    from jckx.kernels import fused_bn_act as fba
    from jckx.parallel import make_mesh

    cfg = Config()
    cfg.max_learning_rate = 2e-4
    geo = GANGeometry(image_size=16, base_width=64)
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.asarray(1, jnp.int32),
                       rng=jax.random.PRNGKey(2))
    path = os.path.join(tmp_path, "latest.ckpt")
    save_checkpoint(path, st)

    k = jax.random.PRNGKey(9)
    single = GeneratorService(path, geo=geo, batch_size=16,
                              compute_dtype=jnp.float32)
    a = single.sample(16, key=k)

    calls = []
    orig = fba._bn_act_pallas
    monkeypatch.setattr(
        fba, "_bn_act_pallas",
        lambda *ar, **kw: (calls.append(1), orig(*ar, **kw))[1])
    monkeypatch.setenv("JCKX_PALLAS_INTERPRET", "1")
    mesh = make_mesh((8,), ("data",))
    sharded = GeneratorService(path, geo=geo, batch_size=16,
                               compute_dtype=jnp.float32, mesh=mesh)
    b = sharded.sample(16, key=k)
    assert calls, "Pallas dispatch did not engage — the test is vacuous"
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_serve_cli_writes_grid(tmp_path):
    path, geo = _save_ckpt(tmp_path)
    from jckx.serve import get_args, main

    out = os.path.join(tmp_path, "grid.png")
    main(get_args([
        "--ckpt", path, "-n", "4", "-o", out, "--image_size", "16",
        "--base_width", "8", "--batch_size", "4",
    ]))
    assert os.path.exists(out)


def test_serve_cli_watch_requires_listen(tmp_path):
    """--watch without --listen is a loud rejection, not a silently
    ignored flag followed by a one-shot render (review finding)."""
    import pytest

    path, _ = _save_ckpt(tmp_path)
    from jckx.serve import get_args, main

    with pytest.raises(SystemExit, match="--listen"):
        main(get_args(["--ckpt", path, "--watch", "5", "-n", "4",
                       "-o", os.path.join(tmp_path, "g.png")]))


# ----------------------------------------------------------------- HTTP mode

class _HTTPFixture:
    """Tiny DCGAN service behind the HTTP front on an ephemeral port."""

    def __init__(self, tmp_path, conditional=False, num_classes=5):
        import threading

        from jckx.models.dcgan import GANGeometry
        from jckx.serve import GeneratorService, make_http_server
        from jckx.train.state import make_template_state
        from jckx.checkpoint import save_checkpoint

        geo = GANGeometry(z_dim=8, image_size=8, channels=3, base_width=8)
        state = make_template_state(geo, conditional=conditional,
                                    num_classes=num_classes)
        path = str(tmp_path / "http.ckpt")
        save_checkpoint(path, state, {"serve_config": {
            "conditional": conditional, "num_classes": num_classes,
            "z_dim": 8, "image_size": 8, "channels": 3, "base_width": 8}})
        self.svc = GeneratorService(path, batch_size=4)
        self.srv = make_http_server(self.svc, "127.0.0.1", 0)
        self.port = self.srv.server_address[1]
        self.thread = threading.Thread(target=self.srv.serve_forever,
                                       daemon=True)
        self.thread.start()

    def request(self, path, body=None):
        import json as _json
        import urllib.error
        import urllib.request

        url = f"http://127.0.0.1:{self.port}{path}"
        req = (urllib.request.Request(
                   url, data=_json.dumps(body).encode(),
                   headers={"Content-Type": "application/json"})
               if body is not None else url)
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, r.headers.get("Content-Type"), r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.headers.get("Content-Type"), e.read()

    def close(self):
        self.srv.shutdown()
        self.srv.server_close()
        self.thread.join(timeout=10)


def test_http_serving_end_to_end(tmp_path):
    import io
    import json as _json

    f = _HTTPFixture(tmp_path)
    try:
        code, ctype, body = f.request("/healthz")
        assert code == 200 and ctype == "application/json"
        health = _json.loads(body)
        assert health["status"] == "ok" and health["image_size"] == 8
        assert health["conditional"] is False

        # PNG grid (default format)
        code, ctype, body = f.request("/generate", {"n": 6})
        assert code == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

        # npy payload: exact shape/dtype, seed determinism
        code, ctype, b1 = f.request("/generate",
                                    {"n": 6, "seed": 7, "format": "npy"})
        assert code == 200 and ctype == "application/octet-stream"
        arr = np.load(io.BytesIO(b1))
        assert arr.shape == (6, 8, 8, 3) and arr.dtype == np.uint8
        _, _, b2 = f.request("/generate",
                             {"n": 6, "seed": 7, "format": "npy"})
        assert b1 == b2  # same seed -> byte-identical
        _, _, b3 = f.request("/generate",
                             {"n": 6, "seed": 8, "format": "npy"})
        assert b1 != b3

        # validation errors are clear JSON 400s
        for bad in ({"n": 0}, {"n": "x"}, {"n": True}, {"labels": [1]},
                    {"format": "jpeg"}, {"seed": "x"}, {"seed": True}):
            code, _, body = f.request("/generate", bad)
            assert code == 400, bad
            assert "error" in _json.loads(body)
        code, _, _ = f.request("/nope", {})
        assert code == 404
    finally:
        f.close()


def test_http_serving_cgan_labels(tmp_path):
    import io
    import json as _json

    f = _HTTPFixture(tmp_path, conditional=True, num_classes=5)
    try:
        code, _, body = f.request("/generate",
                                  {"n": 4, "labels": [0, 3], "format": "npy"})
        assert code == 200
        assert np.load(io.BytesIO(body)).shape == (4, 8, 8, 3)
        # out-of-range label rejected
        code, _, body = f.request("/generate", {"n": 2, "labels": [5]})
        assert code == 400 and "labels" in _json.loads(body)["error"]
    finally:
        f.close()


def test_http_metrics_endpoint(tmp_path):
    """GET /metrics: Prometheus text exposition whose counters track the
    /generate traffic — successes add their image count, validation errors
    add to the error counter, latency accumulates."""
    f = _HTTPFixture(tmp_path)
    try:
        code, ctype, body = f.request("/metrics")
        assert code == 200 and ctype.startswith("text/plain")
        base = dict(line.split() for line in body.decode().splitlines()
                    if line and not line.startswith("#"))
        assert base["jckx_generate_requests_total"] == "0"
        assert base["jckx_checkpoint_step"] == str(f.svc.step)
        assert base["jckx_serving_batch_size"] == "4"

        assert f.request("/generate", {"n": 6})[0] == 200
        assert f.request("/generate", {"n": 3, "format": "npy"})[0] == 200
        assert f.request("/generate", {"n": 0})[0] == 400  # counted error

        _, _, body = f.request("/metrics")
        m = dict(line.split() for line in body.decode().splitlines()
                 if line and not line.startswith("#"))
        assert m["jckx_generate_requests_total"] == "3"
        assert m["jckx_generate_images_total"] == "9"
        assert m["jckx_generate_errors_total"] == "1"
        assert float(m["jckx_generate_seconds_sum"]) > 0.0
    finally:
        f.close()


def test_watch_hot_swaps_new_checkpoint(tmp_path):
    """--watch machinery: CheckpointWatcher.poll_once swaps the service when
    the checkpoint file changes (new step served, same-seed samples change),
    keeps the old service across a failed reload (torn/corrupt file), and
    retries until the file is loadable again."""
    import json as _json
    import os
    import threading
    import urllib.request

    from jckx.serve import CheckpointWatcher, GeneratorService, make_http_server

    path = str(tmp_path / "latest.ckpt")
    side = {"serve_config": {
        "conditional": False, "num_classes": 100, "z_dim": 8,
        "image_size": 8, "channels": 3, "base_width": 8, "ema": False}}

    def write_ckpt(step, key):
        geo = GANGeometry(z_dim=8, image_size=8, channels=3, base_width=8)
        cfg = Config()
        cfg.max_learning_rate = 2e-4
        tx = make_optimizer(cfg)
        pg = dcgan.generator_init(jax.random.PRNGKey(key), geo)
        pd = dcgan.discriminator_init(jax.random.PRNGKey(key + 1), geo)
        st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                           opt_d=tx.init(pd),
                           step=jnp.asarray(step, jnp.int32),
                           rng=jax.random.PRNGKey(2))
        save_checkpoint(path, st, extra=side)
        os.utime(path, ns=(step * 10**9, step * 10**9))  # force mtime change

    write_ckpt(1, key=0)
    svc = GeneratorService(path, batch_size=4)
    srv = make_http_server(svc, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    watcher = CheckpointWatcher(
        srv, path, lambda: GeneratorService(path, batch_size=4))

    def get(p, body=None):
        req = (urllib.request.Request(
                   f"http://127.0.0.1:{port}{p}",
                   data=_json.dumps(body).encode(),
                   headers={"Content-Type": "application/json"})
               if body is not None else f"http://127.0.0.1:{port}{p}")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.read()

    try:
        assert watcher.poll_once() is False  # unchanged file: no swap
        assert _json.loads(get("/healthz"))["step"] == 1
        a = get("/generate", {"n": 2, "seed": 9, "format": "npy"})

        # a corrupt replacement must NOT take down the serving process
        with open(path, "wb") as f:
            f.write(b"torn write")
        os.utime(path, ns=(5 * 10**9, 5 * 10**9))
        assert watcher.poll_once() is False
        assert _json.loads(get("/healthz"))["step"] == 1  # old svc serving
        np.testing.assert_array_equal(
            np.frombuffer(a, np.uint8),
            np.frombuffer(get("/generate", {"n": 2, "seed": 9,
                                            "format": "npy"}), np.uint8))

        write_ckpt(2, key=7)  # the retry path: now loadable
        assert watcher.poll_once() is True
        assert _json.loads(get("/healthz"))["step"] == 2
        b = get("/generate", {"n": 2, "seed": 9, "format": "npy"})
        assert a != b  # new weights: same seed, different images
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_http_concurrent_clients_during_hotswap(tmp_path):
    """The serving race surface: ThreadingHTTPServer handles clients on
    worker threads while CheckpointWatcher swaps the service under them.
    Every concurrent request must complete cleanly (no 5xx, valid payloads),
    the stats counters must add up exactly under contention, and once the
    last swap lands, same-seed sampling is deterministic again."""
    import io
    import json as _json
    import threading
    import urllib.error
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from jckx.serve import CheckpointWatcher, GeneratorService, make_http_server

    path = str(tmp_path / "latest.ckpt")
    side = {"serve_config": {
        "conditional": False, "num_classes": 100, "z_dim": 8,
        "image_size": 8, "channels": 3, "base_width": 8, "ema": False}}
    geo = GANGeometry(z_dim=8, image_size=8, channels=3, base_width=8)
    cfg = Config()
    cfg.max_learning_rate = 2e-4
    tx = make_optimizer(cfg)

    def write_ckpt(step, key):
        pg = dcgan.generator_init(jax.random.PRNGKey(key), geo)
        pd = dcgan.discriminator_init(jax.random.PRNGKey(key + 1), geo)
        st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                           opt_d=tx.init(pd),
                           step=jnp.asarray(step, jnp.int32),
                           rng=jax.random.PRNGKey(2))
        save_checkpoint(path, st, extra=side)
        os.utime(path, ns=(step * 10**9, step * 10**9))

    write_ckpt(1, key=0)
    srv = make_http_server(GeneratorService(path, batch_size=4),
                           "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    watcher = CheckpointWatcher(
        srv, path, lambda: GeneratorService(path, batch_size=4))

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    try:
        assert post({"n": 2})[0] == 200  # warm-up: compile outside the storm

        jobs = []
        for i in range(24):  # mixed valid traffic
            jobs.append({"n": 2, "seed": i % 5, "format": "npy"}
                        if i % 3 else {"n": 2, "format": "png"})
        jobs += [{"n": 0}] * 6  # validation errors, counted not crashed
        with ThreadPoolExecutor(8) as ex:
            futs = [ex.submit(post, j) for j in jobs]
            for step, key in ((2, 7), (3, 9)):  # swap under the load
                write_ckpt(step, key=key)
                assert watcher.poll_once() is True
            results = [f.result() for f in futs]

        for job, (code, body) in zip(jobs, results):
            if job["n"] == 0:
                assert code == 400 and "error" in _json.loads(body)
            elif job.get("format") == "npy":
                assert code == 200
                arr = np.load(io.BytesIO(body))
                assert arr.shape == (2, 8, 8, 3) and arr.dtype == np.uint8
            else:
                assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"

        # counters are exact under contention (stats_lock works)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=120) as r:
            m = dict(line.split() for line in r.read().decode().splitlines()
                     if line and not line.startswith("#"))
        assert m["jckx_generate_requests_total"] == str(1 + len(jobs))
        assert m["jckx_generate_images_total"] == str(2 + 24 * 2)
        assert m["jckx_generate_errors_total"] == "6"
        assert m["jckx_checkpoint_step"] == "3"

        # the post-swap world is deterministic again
        _, b1 = post({"n": 2, "seed": 9, "format": "npy"})
        _, b2 = post({"n": 2, "seed": 9, "format": "npy"})
        assert b1 == b2
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_truncation_service_and_determinism(tmp_path):
    """--truncation t compiles the z law into the render: same seed is still
    byte-deterministic, output differs from the untruncated service, and a
    negative knob is rejected."""
    path, geo = _save_ckpt(tmp_path)
    base = GeneratorService(path, geo=geo, batch_size=4,
                            compute_dtype=jnp.float32)
    trunc = GeneratorService(path, geo=geo, batch_size=4,
                             compute_dtype=jnp.float32, truncation=0.5)
    assert trunc.truncation == 0.5
    k = jax.random.PRNGKey(3)
    a, b = trunc.sample(4, key=k), trunc.sample(4, key=k)
    np.testing.assert_array_equal(a, b)
    c = base.sample(4, key=k)
    assert np.abs(a.astype(int) - c.astype(int)).max() > 0
    with pytest.raises(ValueError, match="truncation"):
        GeneratorService(path, geo=geo, batch_size=4, truncation=-1.0)


def test_interpolate_unconditional(tmp_path):
    path, geo = _save_ckpt(tmp_path)
    svc = GeneratorService(path, geo=geo, batch_size=4,
                           compute_dtype=jnp.float32)
    row = svc.interpolate(1, 2, steps=5)
    assert row.shape == (5, 16, 16, 3) and row.dtype == np.uint8
    # deterministic: same seeds -> byte-identical walk
    np.testing.assert_array_equal(row, svc.interpolate(1, 2, steps=5))
    # the walk actually moves (endpoints differ) and frames vary monotonically
    assert np.abs(row[0].astype(int) - row[-1].astype(int)).max() > 0
    # seed_a == seed_b: slerp's 0/0 corner falls back to lerp -> constant row
    flat = svc.interpolate(7, 7, steps=3)
    np.testing.assert_array_equal(flat[0], flat[1])
    np.testing.assert_array_equal(flat[0], flat[2])
    # lerp is a different path through latent space than slerp (note: under
    # batch-stat BN even the endpoint FRAMES shift with the row's batch
    # stats, so only whole-row difference is asserted — batching is part of
    # the function, same contract as sample())
    lerp = svc.interpolate(1, 2, steps=5, kind="lerp")
    assert np.abs(lerp.astype(int) - row.astype(int)).max() > 0
    # validation
    for bad in (dict(steps=1), dict(kind="x"), dict(label_a=0)):
        with pytest.raises(ValueError):
            svc.interpolate(1, 2, **bad)


def test_interpolate_conditional_morph(tmp_path):
    path, geo = _save_ckpt(tmp_path, conditional=True)
    svc = GeneratorService(path, geo=geo, conditional=True, num_classes=10,
                           batch_size=4, compute_dtype=jnp.float32)
    # class morph: one-hots lerp alongside the latent
    row = svc.interpolate(1, 2, steps=4, label_a=0, label_b=3)
    assert row.shape == (4, 16, 16, 3)
    same = svc.interpolate(1, 2, steps=4, label_a=0)  # label_b defaults
    assert np.abs(row[-1].astype(int) - same[-1].astype(int)).max() > 0
    with pytest.raises(ValueError, match="label_a"):
        svc.interpolate(1, 2, steps=4)
    with pytest.raises(ValueError, match="out of"):
        svc.interpolate(1, 2, steps=4, label_a=10)


def test_http_interpolate_endpoint(tmp_path):
    import io
    import json as _json

    f = _HTTPFixture(tmp_path)
    try:
        code, ctype, body = f.request(
            "/interpolate", {"seed_a": 1, "seed_b": 2, "steps": 4,
                             "format": "npy"})
        assert code == 200 and ctype == "application/octet-stream"
        arr = np.load(io.BytesIO(body))
        assert arr.shape == (4, 8, 8, 3) and arr.dtype == np.uint8
        # deterministic over HTTP too
        _, _, body2 = f.request(
            "/interpolate", {"seed_a": 1, "seed_b": 2, "steps": 4,
                             "format": "npy"})
        assert body == body2
        code, ctype, png = f.request(
            "/interpolate", {"seed_a": 1, "seed_b": 2})
        assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
        for bad in ({"seed_a": 1}, {"seed_a": 1, "seed_b": 2, "steps": 1},
                    # steps is capped at 64 over HTTP: each distinct value
                    # compiles a program under the sampling lock
                    {"seed_a": 1, "seed_b": 2, "steps": 65},
                    {"seed_a": 1, "seed_b": 2, "kind": "x"},
                    {"seed_a": 1, "seed_b": 2, "label_a": 0},
                    {"seed_a": True, "seed_b": 2}):
            code, _, body = f.request("/interpolate", bad)
            assert code == 400, bad
            assert "error" in _json.loads(body)
        # counters track the walk traffic too (4 + 4 + 10 images, 6 errors)
        _, _, m = f.request("/metrics")
        md = dict(line.split() for line in m.decode().splitlines()
                  if line and not line.startswith("#"))
        assert md["jckx_generate_requests_total"] == "9"
        assert md["jckx_generate_images_total"] == "18"
        assert md["jckx_generate_errors_total"] == "6"
    finally:
        f.close()


def test_serve_cli_interpolate_writes_strip(tmp_path):
    path, _ = _save_ckpt(tmp_path)
    from jckx.serve import get_args, main

    out = os.path.join(tmp_path, "walk.png")
    main(get_args(["--ckpt", path, "--interpolate", "3,4", "--steps", "5",
                   "--image_size", "16", "--base_width", "8", "-o", out]))
    assert os.path.exists(out)
    with pytest.raises(SystemExit, match="SEEDA,SEEDB"):
        main(get_args(["--ckpt", path, "--interpolate", "3", "-o", out,
                       "--image_size", "16", "--base_width", "8"]))
    # --interpolate + --listen conflict fails loudly (the daemon serves the
    # walk at POST /interpolate; a silently-ignored one-shot flag would
    # leave the user waiting for a file that never appears)
    with pytest.raises(SystemExit, match="POST /interpolate"):
        main(get_args(["--ckpt", path, "--interpolate", "3,4",
                       "--listen", "8099"]))


def test_evaluate_rejects_negative_truncation():
    from jckx.evaluate import evaluate, get_args as eval_args

    with pytest.raises(ValueError, match="truncation"):
        evaluate(eval_args(["--ckpt", "nonexistent.ckpt",
                            "--truncation", "-0.5"]))

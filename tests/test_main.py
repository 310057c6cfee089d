"""End-to-end CLI entry: main.main() wires flags → preprocessor → models →
trainer → artifacts (metrics stubbed out via eval_every=0)."""

import json
import os

import numpy as np

from jckx.configs import get_arg_parse
from jckx.logging.main_logger import MainLogger


def test_main_dcgan_tiny(tmp_path):
    MainLogger.reset()
    cfg = get_arg_parse([
        "-m", "DCGAN", "--dataset", "synthetic", "-e", "1", "-b", "32",
        "--image_size", "16", "--base_width", "8", "--eval_every", "0",
        "--log_every", "16", "-mlr", "0.0002", "--compute_dtype", "float32",
        "--save_root", str(tmp_path), "-lf", "1",
    ])
    import main as entry

    result = entry.main(cfg)
    assert result is not None and np.isfinite(result["loss_d"])
    run_dirs = os.listdir(os.path.join(tmp_path, "dcgan"))
    assert len(run_dirs) == 1
    run = os.path.join(tmp_path, "dcgan", run_dirs[0])
    assert os.path.exists(os.path.join(run, "real_image.png"))
    assert os.path.exists(os.path.join(run, "loss.png"))
    assert any(f.endswith(".log") for f in os.listdir(run))
    assert os.path.exists(os.path.join(run, "metrics.jsonl"))
    # every train run persists its resolved config for --resume/-t inheritance
    with open(os.path.join(run, "config.json")) as f:
        stored = json.load(f)
    assert stored["max_learning_rate"] == 0.0002
    assert stored["model"] == "DCGAN"
    MainLogger.reset()


def test_bench_cgan_smoke(capsys):
    """bench.py's CGAN path (one-hot labels gathered in the scan body)
    builds and runs on CPU at a toy size; prints one valid JSON line."""
    import json

    import bench

    bench.main(image_size=64, batch_size=4, K=2, supersteps=1, model="CGAN")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "images/sec/chip" and rec["value"] > 0
    assert "CGAN" in rec["metric"]


def test_differential_time_jitter_armor():
    """differential_time(repeats=R) must difference PER-SIZE minima, so a
    one-off additive jitter spike in either region cannot move the result
    in either direction (min-over-whole-differentials would be biased
    optimistic when the S region takes the hit)."""
    from bench import differential_time

    TRUE = 0.010  # chip seconds per superstep
    CONST = 0.050  # constant read/dispatch overhead per region

    def make_region(spikes):
        calls = {"i": 0}

        def run_region(n):
            jitter = spikes.get(calls["i"], 0.0)
            calls["i"] += 1
            return CONST + n * TRUE + jitter

        return run_region

    # spike on the FIRST S region (call 0): single-shot would return
    # dt_b - dt_a = 2S*TRUE - S*TRUE - 1.0 < 0 → fall back; with repeats,
    # the clean second S run restores the exact differential.
    dt = differential_time(make_region({0: 1.0}), 5, repeats=2)
    assert abs(dt - 5 * TRUE) < 1e-12
    # spike on a 2S region (call 1) likewise cancels
    dt = differential_time(make_region({1: 1.0}), 5, repeats=2)
    assert abs(dt - 5 * TRUE) < 1e-12
    # repeats=1 keeps the legacy single-shot behavior (fallback on <=0)
    dt = differential_time(make_region({0: 1.0}), 5, repeats=1)
    assert dt > 5 * TRUE  # degraded estimate, but never negative


def test_doctor_report(tmp_path, capsys):
    """jckx.doctor: all checks present, ok=True on a working backend, exit 0;
    dataset/backbone probes respect the dirs given."""
    import jckx.doctor as doctor

    rc = doctor.main(["--data_dir", str(tmp_path), "--save_root",
                      str(tmp_path)])
    assert rc == 0
    import json

    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] is True
    assert rep["backend"]["device_count"] >= 1
    assert rep["compile"]["ok"] is True
    assert rep["link"].get("read_s") is not None
    assert rep["link"].get("cold_read_s") is not None  # two-read probe
    assert rep["datasets"]["cifar100"] is False  # empty tmp dir
    assert rep["datasets"]["synthetic_fallback"] is True
    assert rep["metric_backbone"]["found"] == []
    assert "inception_train" in rep["metric_backbone"]["note"]
    # multi-host posture: this test box has no cluster env → a --multihost
    # launch would degrade, and doctor says so without attempting init
    assert rep["multihost"]["cluster_env_present"] is False
    assert rep["multihost"]["process_count"] == 1
    assert "degrade" in rep["multihost"]["note"]


def test_doctor_boxed_timeout_flags_hard_exit():
    """A timed-out probe leaves its thread permanently blocked in native
    code; _boxed reports the sick-link error and _hard_exit_needed() turns
    True so main() exits via os._exit (skipping the interpreter teardown
    that would abort with 'FATAL: exception not rethrown' after the JSON
    report — observed 2026-08-19 against a sick tunnel)."""
    import threading

    import jckx.doctor as doctor

    release = threading.Event()
    out = doctor._boxed(lambda: release.wait(60) or {}, timeout_s=0.05)
    try:
        assert "still blocked" in out["error"]
        assert doctor._hard_exit_needed() is True
    finally:
        release.set()  # let the leaked thread finish so the suite stays clean
    for t in threading.enumerate():
        if t.name == doctor._PROBE_THREAD_NAME:
            t.join(5.0)
    assert doctor._hard_exit_needed() is False
    # the happy path leaks nothing
    assert doctor._boxed(lambda: {"x": 1}, timeout_s=5.0) == {"x": 1}
    assert doctor._hard_exit_needed() is False


def test_bench_serve_smoke(capsys):
    """bench_serve.py end to end on CPU at toy size: the make_sampler
    serving trace, differential timing, roofline block, and the e2e
    GeneratorService detail all produce one valid JSON line."""
    import json

    import bench_serve

    bench_serve.main(batch_size=4, scan_batches=2, regions=1, repeats=1)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["unit"] == "images/sec/chip" and rec["value"] > 0
    r = rec["detail"]["serve_forward_roofline"]
    assert r["gflop_per_image"] > 0 and r["mb_accessed_per_image"] > 0
    assert rec["detail"]["e2e_service_img_per_s_incl_host_fetch"] > 0


def test_doctor_link_only(capsys):
    """--link_only stops after backend+link (the fast preflight bench_all
    shells out to): no compile/dataset keys, ok=True, exit 0."""
    import json

    import jckx.doctor as doctor

    rc = doctor.main(["--link_only"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] is True and "read_s" in rep["link"]
    assert "compile" not in rep and "datasets" not in rep


def test_main_test_mode_scores_latest_ckpt(tmp_path, capsys):
    """-t/--test (parsed-but-dead in the reference, main.py:43) = opt-in
    eval-only mode: score the -pm run dir's latest.ckpt with the trainers'
    exact eval protocol (jckx.evaluate), print one JSON line, never train."""
    import json

    import jax
    import jax.numpy as jnp

    import main as entry
    from jckx.checkpoint.checkpoint import save_checkpoint
    from jckx.configs import Config
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.train.state import GANTrainState, make_optimizer
    from tests.test_trainer import StubMetrics

    MainLogger.reset()
    run = tmp_path / "dcgan" / "run1"
    run.mkdir(parents=True)
    geo = GANGeometry(image_size=16, base_width=8)
    ocfg = Config()
    ocfg.max_learning_rate = 2e-4
    tx = make_optimizer(ocfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.asarray(7, jnp.int32),
                       rng=jax.random.PRNGKey(2))
    # the sidecar the trainers write next to every ckpt (_serve_config) —
    # it is what lets -t self-configure geometry without extra flags
    save_checkpoint(str(run / "latest.ckpt"), st, extra={"serve_config": {
        "conditional": False, "num_classes": 100, "z_dim": geo.z_dim,
        "image_size": 16, "channels": 3, "base_width": 8, "ema": False}})

    cfg = get_arg_parse([
        "-m", "DCGAN", "-t", "1", "-pm", "run1", "--dataset", "synthetic",
        "--compute_dtype", "float32", "--save_root", str(tmp_path),
        "-lf", "0",
    ])
    cfg.save_path = str(run)  # main() derives this from -pm; direct call here
    res = entry.run_test_mode(cfg, metrics=StubMetrics())
    assert res["step"] == 7
    assert np.isfinite(res["fid"]) and np.isfinite(res["is"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == res  # the one-JSON-line CLI contract
    MainLogger.reset()


def test_main_test_mode_forwards_eval_flags(tmp_path, monkeypatch):
    """-t rescoring forwards --eval_fast_stem and --extra_metrics (as
    --kid/--prdc) to jckx.evaluate — a fast-stem run rescored through the
    standard stem would drift from its logged numbers (review finding)."""
    import jckx.evaluate as jev
    import main as entry

    MainLogger.reset()
    run = tmp_path / "dcgan" / "run1"
    run.mkdir(parents=True)
    (run / "latest.ckpt").write_bytes(b"")  # existence check only: stubbed

    captured = {}

    def fake_evaluate(args, metrics=None):
        captured["args"] = args
        return {"step": 1, "n": 1, "is": 1.0, "fid": 1.0}

    monkeypatch.setattr(jev, "evaluate", fake_evaluate)
    cfg = get_arg_parse([
        "-m", "DCGAN", "-t", "1", "-pm", "run1", "--dataset", "synthetic",
        "--eval_fast_stem", "1", "--extra_metrics", "1",
        "--save_root", str(tmp_path), "-lf", "0",
    ])
    cfg.save_path = str(run)
    entry.run_test_mode(cfg)
    a = captured["args"]
    assert a.eval_fast_stem == 1 and a.kid == 1 and a.prdc == 1
    MainLogger.reset()


def test_main_test_mode_requires_pm_and_ckpt(tmp_path):
    """-t without -pm (nothing to score) and -t on a run dir with no
    latest.ckpt are loud SystemExits before any data/model work."""
    import pytest

    import main as entry

    MainLogger.reset()
    cfg = get_arg_parse(["-m", "DCGAN", "-t", "1", "--dataset", "synthetic",
                         "--save_root", str(tmp_path), "-lf", "0"])
    with pytest.raises(SystemExit, match="-pm"):
        entry.main(cfg)
    # the rejection happens BEFORE any run dir is created: no abandoned
    # timestamped dir litters save/ (review finding)
    assert not os.path.exists(os.path.join(str(tmp_path), "dcgan"))
    MainLogger.reset()
    cfg = get_arg_parse(["-m", "DCGAN", "-t", "1", "-pm", "empty",
                         "--dataset", "synthetic",
                         "--save_root", str(tmp_path), "-lf", "0"])
    with pytest.raises(SystemExit, match="latest.ckpt"):
        entry.main(cfg)
    # a mistyped -pm must not create the dir it names either: the makedirs
    # + logger would otherwise litter save/ with an empty-but-logged run
    # dir per typo (review finding)
    assert not os.path.exists(os.path.join(str(tmp_path), "dcgan", "empty"))
    MainLogger.reset()


def test_main_lr_schedule_cosine_tiny(tmp_path):
    """--lr_schedule cosine end to end: the trainer auto-fills the decay
    horizon (epochs x steps/epoch) and the tiny run completes finite."""
    MainLogger.reset()
    cfg = get_arg_parse([
        "-m", "DCGAN", "--dataset", "synthetic", "-e", "1", "-b", "32",
        "--image_size", "16", "--base_width", "8", "--eval_every", "0",
        "--log_every", "64", "-mlr", "0.0002", "-milr", "0.00002",
        "--lr_schedule", "cosine", "--compute_dtype", "float32",
        "--save_root", str(tmp_path), "-lf", "0",
    ])
    import main as entry

    result = entry.main(cfg)
    assert result is not None and np.isfinite(result["loss_d"])
    assert cfg.lr_decay_steps == (4096 // 32) * 1  # auto-filled horizon
    MainLogger.reset()


def test_bench_compare_gate(tmp_path, capsys):
    """tools/bench_compare.py: unit-aware direction (seconds regress UP,
    throughput regresses DOWN), threshold gating, new/dropped benches listed
    but never failed, driver single-record format accepted."""
    import json
    import sys

    sys.path.insert(0, "tools")
    try:
        import bench_compare
    finally:
        sys.path.pop(0)

    def sweep(path, **benches):
        p = str(tmp_path / path)
        with open(p, "w") as f:
            json.dump({"benches": {
                k: {"value": v, "unit": u} for k, (v, u) in benches.items()
            }}, f)
        return p

    old = sweep("old.json", gan=(100.0, "images/sec/chip"),
                eval_wall=(10.0, "seconds"), gone=(5.0, "images/sec/chip"))
    new = sweep("new.json", gan=(96.0, "images/sec/chip"),   # -4%: within 5%
                eval_wall=(10.4, "seconds"),                 # +4% wall: ok
                fresh=(1.0, "images/sec/chip"))
    assert bench_compare.main([old, new]) == 0
    out = capsys.readouterr().out
    assert "OK" in out and "new" in out and "dropped" in out

    # throughput down 10% and wall up 10% both fail a 5% gate
    bad = sweep("bad.json", gan=(90.0, "images/sec/chip"),
                eval_wall=(11.0, "seconds"))
    assert bench_compare.main([old, bad]) == 1
    assert "REGRESSED" in capsys.readouterr().out
    # ...but pass a 15% gate
    assert bench_compare.main([old, bad, "--threshold", "15"]) == 0
    capsys.readouterr()

    # the driver's single-record format
    drv_old = str(tmp_path / "d1.json")
    drv_new = str(tmp_path / "d2.json")
    for p, v in ((drv_old, 33189.7), (drv_new, 35397.9)):
        with open(p, "w") as f:
            json.dump({"parsed": {"metric": "m", "value": v,
                                  "unit": "images/sec/chip"}}, f)
    assert bench_compare.main([drv_old, drv_new]) == 0
    assert "headline" in capsys.readouterr().out


def test_inspect_cli_all_artifact_kinds(tmp_path, capsys):
    """python -m jckx.inspect: one JSON view for jckx .ckpt (sidecar-driven),
    reference torch .pt (geometry inferred from weights), and exported
    .jaxexp (sidecar only, blob untouched)."""
    import json

    import jax
    import jax.numpy as jnp

    from jckx.checkpoint.checkpoint import save_checkpoint
    from jckx.configs import Config
    from jckx.inspect import main as inspect_main
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry, param_count
    from jckx.train.state import GANTrainState, make_optimizer

    geo = GANGeometry(image_size=16, base_width=8)
    ocfg = Config()
    ocfg.max_learning_rate = 2e-4
    tx = make_optimizer(ocfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.asarray(11, jnp.int32),
                       rng=jax.random.PRNGKey(2))
    ck = str(tmp_path / "latest.ckpt")
    save_checkpoint(ck, st, extra={
        "bests": {"fid": 12.5, "is": 3.0},
        "losses": [(1.0, 2.0)] * 7,
        "serve_config": {"conditional": False, "num_classes": 100,
                         "z_dim": geo.z_dim, "image_size": 16, "channels": 3,
                         "base_width": 8, "ema": False}})
    assert inspect_main(["--ckpt", ck]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["kind"] == "jckx checkpoint" and rep["step"] == 11
    assert rep["params_g"] == param_count(pg)
    assert rep["params_d"] == param_count(pd)
    # mu+nu per param, plus each adam state's count scalar
    assert rep["opt_moments"] == 2 * (rep["params_g"] + rep["params_d"]) + 2
    assert rep["bests"]["fid"] == 12.5 and rep["logged_losses"] == 7
    assert rep["geometry"]["image_size"] == 16 and rep["file_bytes"] > 0

    # reference torch .pt: geometry inferred from the weights
    from tests.test_evaluate import _dcgan_pt

    pt = _dcgan_pt(tmp_path, GANGeometry(z_dim=16, image_size=16,
                                         channels=3, base_width=8))
    assert inspect_main(["--ckpt", pt]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["kind"].startswith("reference torch")
    assert rep["geometry"] == {"z_dim": 16, "image_size": 16, "channels": 3,
                               "base_width": 8}
    assert rep["params_g"] > 0 and rep["ema"] is False

    # exported artifact: sidecar view, blob untouched
    from jckx.export import export_generator

    dst = str(tmp_path / "g.jaxexp")
    export_generator(ck, dst, batch_size=4, compute_dtype=jnp.float32,
                     platforms=["cpu"])
    assert inspect_main(["--ckpt", dst]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["kind"].startswith("exported") and rep["batch_size"] == 4
    assert rep["file_bytes"] > 0


def test_jckx_dispatcher(tmp_path, capsys):
    """python -m jckx <command>: usage on no args, exit 2 on unknown,
    and real dispatch into a subcommand (inspect on a tiny ckpt)."""
    import json

    import jax
    import jax.numpy as jnp

    from jckx.__main__ import main as jckx_main
    from jckx.checkpoint.checkpoint import save_checkpoint
    from jckx.configs import Config
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.train.state import GANTrainState, make_optimizer

    assert jckx_main([]) == 0
    out = capsys.readouterr().out
    assert "usage:" in out and all(
        c in out for c in ("train", "evaluate", "serve", "export",
                           "convert", "inspect", "doctor", "finetune"))
    assert jckx_main(["frobnicate"]) == 2
    assert "unknown command" in capsys.readouterr().err

    # train wiring reaches main.py's flag parsing + validation without
    # actually training (-t without -pm is a pre-run SystemExit)
    import pytest

    with pytest.raises(SystemExit, match="-pm"):
        jckx_main(["train", "-m", "DCGAN", "-t", "1",
                   "--save_root", str(tmp_path), "-lf", "0"])
    MainLogger.reset()

    geo = GANGeometry(image_size=16, base_width=8)
    cfg = Config()
    cfg.max_learning_rate = 2e-4
    tx = make_optimizer(cfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.asarray(3, jnp.int32),
                       rng=jax.random.PRNGKey(2))
    ck = str(tmp_path / "latest.ckpt")
    save_checkpoint(ck, st, extra={"serve_config": {
        "conditional": False, "num_classes": 100, "z_dim": geo.z_dim,
        "image_size": 16, "channels": 3, "base_width": 8, "ema": False}})
    assert jckx_main(["inspect", "--ckpt", ck]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["step"] == 3 and rep["kind"] == "jckx checkpoint"


def test_main_test_mode_forwards_training_seed(tmp_path, monkeypatch):
    """-t must forward cfg.seed as the eval-noise seed — a run trained with
    a non-default --seed is otherwise scored under a different z protocol
    than its own logged eval boundaries (review finding)."""
    import jax
    import jax.numpy as jnp

    import jckx.evaluate as evaluate_mod
    import main as entry
    from jckx.checkpoint.checkpoint import save_checkpoint
    from jckx.configs import Config
    from jckx.models import dcgan
    from jckx.models.dcgan import GANGeometry
    from jckx.train.state import GANTrainState, make_optimizer

    MainLogger.reset()
    run = tmp_path / "dcgan" / "r"
    run.mkdir(parents=True)
    geo = GANGeometry(image_size=16, base_width=8)
    ocfg = Config()
    ocfg.max_learning_rate = 2e-4
    tx = make_optimizer(ocfg)
    pg = dcgan.generator_init(jax.random.PRNGKey(0), geo)
    pd = dcgan.discriminator_init(jax.random.PRNGKey(1), geo)
    st = GANTrainState(params_g=pg, params_d=pd, opt_g=tx.init(pg),
                       opt_d=tx.init(pd), step=jnp.asarray(1, jnp.int32),
                       rng=jax.random.PRNGKey(2))
    save_checkpoint(str(run / "latest.ckpt"), st, extra={"serve_config": {
        "conditional": False, "num_classes": 100, "z_dim": geo.z_dim,
        "image_size": 16, "channels": 3, "base_width": 8, "ema": False}})

    seen = {}
    monkeypatch.setattr(evaluate_mod, "evaluate",
                        lambda args, metrics=None: seen.update(
                            seed=args.seed) or {"ok": 1})
    cfg = get_arg_parse(["-m", "DCGAN", "-t", "1", "-pm", "r",
                         "--dataset", "synthetic", "--seed", "777",
                         "--save_root", str(tmp_path), "-lf", "0"])
    cfg.save_path = str(run)
    entry.run_test_mode(cfg)
    assert seen["seed"] == 777
    MainLogger.reset()

"""Config CLI parity (the 11 reference flags + defaults), logger behavior
(singleton, file + jsonl streams), artifact writers, time formatting."""

import json
import logging
import os

import numpy as np

from jckx.configs import Config, get_arg_parse
from jckx.enums import ModelEnum
from jckx.logging import MainLogger, time_to_str
from jckx.logging.artifacts import make_grid, save_image_grid, save_labeled_grid, save_loss_curve


def test_reference_flags_and_defaults():
    cfg = get_arg_parse([])
    # reference defaults (main.py:40-61)
    assert cfg.test == 0
    assert cfg.model_path == ""
    assert cfg.log_file == 1
    assert cfg.model == ModelEnum.DCGAN
    assert cfg.num_worker == 0
    assert cfg.batch_size == 128
    assert cfg.epoch == 100
    assert cfg.max_learning_rate == 0.1
    assert cfg.min_learning_rate == 1e-4
    assert cfg.weight_decay == 5e-4
    assert cfg.nesterov == 1
    # promoted constants keep reference values
    assert cfg.lambda_gp == 10.0 and cfg.adam_beta1 == 0.5
    assert cfg.label_real == 0.9 and cfg.label_fake == 0.1
    assert cfg.eval_every == 500 and cfg.log_every == 100
    assert cfg.seed == 12345


def test_cli_help_formats_cleanly():
    """`main.py -h` must render: argparse expands help strings with %, so a
    bare '%' in any help text raises TypeError at PRINT time, not at parse
    time (regression: r5 briefly shipped '-40%' in a help string and every
    `-h` crashed while all flag-parsing tests stayed green)."""
    import pytest

    with pytest.raises(SystemExit) as e:
        get_arg_parse(["-h"])
    assert e.value.code == 0


def test_short_flags_parse():
    cfg = get_arg_parse(["-m", "CGAN", "-b", "64", "-e", "7", "-mlr", "0.002",
                         "-pm", "run42", "-lf", "0", "-w", "2", "-t", "1"])
    assert cfg.model == ModelEnum.CGAN
    assert cfg.batch_size == 64 and cfg.epoch == 7
    assert cfg.max_learning_rate == 0.002
    assert cfg.model_path == "run42" and cfg.log_file == 0
    assert cfg.num_worker == 2 and cfg.test == 1


def test_mesh_and_dataset_flags():
    cfg = get_arg_parse(["--mesh_shape", "4,2", "--mesh_axes", "data,model",
                         "--dataset", "mnist"])
    assert cfg.mesh_shape == (4, 2)
    assert cfg.mesh_axes == ("data", "model")
    assert cfg.channels == 1 and cfg.num_classes == 10  # mnist geometry
    js = json.loads(cfg.to_json())
    assert js["mesh_shape"] == [4, 2] and js["model"] == "DCGAN"


def test_logger_singleton_and_streams(tmp_path):
    MainLogger.reset()

    class A:  # minimal config
        log_file = 1
        save_path = str(tmp_path)

    lg1 = MainLogger(A())
    lg2 = MainLogger()  # singleton: second ctor returns the same instance
    assert lg1 is lg2
    lg1.debug("hello-debug")
    lg1.scalars({"step": 1, "loss": 2.5})
    for h in lg1.logger.handlers:
        h.flush()
    logs = [f for f in os.listdir(tmp_path) if f.endswith(".log")]
    assert len(logs) == 1
    assert "hello-debug" in open(os.path.join(tmp_path, logs[0])).read()
    rec = json.loads(open(os.path.join(tmp_path, "metrics.jsonl")).read().strip())
    assert rec == {"step": 1, "loss": 2.5}
    # rank gating: non-zero rank suppressed
    lg1.debug("rank-one-msg", gpu_rank=1)
    for h in lg1.logger.handlers:
        h.flush()
    assert "rank-one-msg" not in open(os.path.join(tmp_path, logs[0])).read()
    MainLogger.reset()


def test_logger_defers_file_until_save_path(tmp_path, monkeypatch):
    """A component constructed BEFORE the run dir exists (the preprocessor is
    a trainer ctor argument) initializes the singleton with save_path="" —
    the file handler must NOT land in CWD; it attaches when the trainer's
    MainLogger(cfg) call arrives with the real run dir."""
    MainLogger.reset()
    monkeypatch.chdir(tmp_path)  # so a CWD regression would be visible here

    class A:
        log_file = 1
        save_path = ""

    early = MainLogger(A())
    early.debug("too-early-for-file")
    early.scalars({"step": 0})  # jsonl must be a no-op too
    assert not any(f.endswith(".log") for f in os.listdir(tmp_path))
    assert not os.path.exists(os.path.join(tmp_path, "metrics.jsonl"))

    run_dir = os.path.join(str(tmp_path), "run")

    class B:
        log_file = 1
        save_path = run_dir

    late = MainLogger(B())  # same singleton; attaches the file handler now
    assert late is early
    late.debug("landed-in-run-dir")
    late.scalars({"step": 1})
    for h in late.logger.handlers:
        h.flush()
    logs = [f for f in os.listdir(run_dir) if f.endswith(".log")]
    assert len(logs) == 1
    assert "landed-in-run-dir" in open(os.path.join(run_dir, logs[0])).read()
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert not any(f.endswith(".log") for f in os.listdir(tmp_path))
    MainLogger.reset()


def test_time_to_str():
    assert time_to_str(3723.5) == "1h 2m 3.5s"
    assert time_to_str(59) == "0h 0m 59.0s"


def test_make_grid_geometry():
    imgs = np.random.RandomState(0).rand(10, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, ncol=4, padding=2)
    # 3 rows × 4 cols of 8px cells with 2px padding
    assert grid.shape == (3 * 10 + 2, 4 * 10 + 2, 3)
    assert grid.dtype == np.uint8


def test_artifact_writers(tmp_path):
    imgs = np.random.RandomState(1).rand(9, 8, 8, 1).astype(np.float32)
    p1 = os.path.join(tmp_path, "g.png")
    save_image_grid(p1, imgs, ncol=3)
    p2 = os.path.join(tmp_path, "lab.png")
    save_labeled_grid(p2, imgs, [f"c{i}" for i in range(9)], ncol=3)
    p3 = os.path.join(tmp_path, "loss.png")
    save_loss_curve(p3, [1.0, 0.5, 0.4], [2.0, 1.5, 1.2])
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 0


def test_plot_metrics_tool(tmp_path):
    """tools/plot_metrics.py renders a run's metrics.jsonl into panels
    (losses/throughput/eval), tolerating a torn tail line from a live run."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import plot_metrics
    finally:
        sys.path.pop(0)

    p = os.path.join(tmp_path, "metrics.jsonl")
    with open(p, "w") as f:
        for s in range(1, 6):
            f.write(json.dumps({"step": s * 50, "epoch": 0, "loss_d": 1.0 / s,
                                "loss_g": 2.0 / s, "d_x": 0.5, "d_gz1": 0.4,
                                "d_gz2": 0.45, "images_per_sec": 30000.0 + s,
                                "step_ms": 3.7}) + "\n")
        f.write(json.dumps({"step": 250, "fid": 120.0, "is": 2.5}) + "\n")
        f.write('{"step": 300, "loss_d": 0.')  # torn tail (live run)
    written = plot_metrics.plot_run(p, str(tmp_path))
    names = {os.path.basename(w) for w in written}
    assert {"metrics_losses.png", "metrics_throughput.png",
            "metrics_metrics.png"} <= names
    for w in written:
        assert os.path.getsize(w) > 0


def test_resume_inherits_run_config(tmp_path):
    """--resume/-t config inheritance (configs._inherit_run_config): flags
    not on the command line come from the run's persisted config.json;
    explicit flags win; the model family dir is discovered without -m; a
    contradicting -m errors; a dir without config.json keeps the old
    repeat-your-flags behavior. Motivated by a live failure: a 100-epoch
    run resumed without -mlr continued at the default Adam lr=0.1 and
    collapsed (FID 133 -> 1747 within 200 steps)."""
    import pytest

    def make_run(family, name, argv):
        run = os.path.join(tmp_path, family, name)
        os.makedirs(run)
        stored = get_arg_parse(argv + ["--save_root", str(tmp_path)])
        stored.save_path = run
        with open(os.path.join(run, "config.json"), "w") as f:
            f.write(stored.to_json())
        return run

    run1 = make_run("dcgan", "run1", [
        "-m", "DCGAN", "--dataset", "synthetic", "--synthetic_size", "500",
        "-mlr", "0.0002", "--ema_decay", "0.999", "--seed", "777",
        "--image_size", "16", "--base_width", "8", "-e", "100"])

    # bare resume: training semantics all inherited
    cfg = get_arg_parse(["--resume", "-pm", "run1", "--save_root", str(tmp_path)])
    assert cfg.max_learning_rate == 0.0002
    assert cfg.ema_decay == 0.999
    assert cfg.synthetic_size == 500
    assert cfg.seed == 777
    assert (cfg.image_size, cfg.base_width, cfg.epoch) == (16, 8, 100)
    assert str(cfg.model) == "DCGAN"
    assert cfg._inherited_from == os.path.join(run1, "config.json")

    # explicit flag beats the stored value (raise the epoch budget)
    cfg2 = get_arg_parse(["--resume", "-pm", "run1", "-e", "150",
                          "--save_root", str(tmp_path)])
    assert cfg2.epoch == 150 and cfg2.max_learning_rate == 0.0002

    # -t inherits too (scoring needs the run's geometry/dataset)
    cfg_t = get_arg_parse(["-t", "1", "-pm", "run1", "--save_root", str(tmp_path)])
    assert cfg_t.image_size == 16 and cfg_t.synthetic_size == 500

    # family dir discovered without -m
    make_run("cgan", "run2", ["-m", "CGAN", "--dataset", "synthetic"])
    cfg3 = get_arg_parse(["--resume", "-pm", "run2", "--save_root", str(tmp_path)])
    assert str(cfg3.model) == "CGAN"

    # contradicting explicit -m fails fast
    with pytest.raises(SystemExit):
        get_arg_parse(["--resume", "-pm", "run2", "-m", "DCGAN",
                       "--save_root", str(tmp_path)])

    # no config.json: no inheritance, defaults stand
    os.makedirs(os.path.join(tmp_path, "dcgan", "run3"))
    cfg4 = get_arg_parse(["--resume", "-pm", "run3", "--save_root", str(tmp_path)])
    assert cfg4.max_learning_rate == 0.1
    assert cfg4._inherited_from is None

    # control-plane flags never inherit: stored save_root is ignored
    assert cfg.save_root == str(tmp_path)

    # same run-dir name under BOTH family dirs: ambiguous without -m …
    make_run("dcgan", "twin", ["-m", "DCGAN", "--dataset", "synthetic",
                               "-mlr", "0.0005"])
    make_run("cgan", "twin", ["-m", "CGAN", "--dataset", "synthetic"])
    with pytest.raises(SystemExit):
        get_arg_parse(["--resume", "-pm", "twin", "--save_root", str(tmp_path)])
    # … and an explicit -m picks the matching family's config
    cfg5 = get_arg_parse(["--resume", "-pm", "twin", "-m", "DCGAN",
                          "--save_root", str(tmp_path)])
    assert str(cfg5.model) == "DCGAN" and cfg5.max_learning_rate == 0.0005

    # attached short-option spellings count as explicit too: a token scan
    # missed -e200, letting the stored epoch silently override the raise
    cfg6 = get_arg_parse(["--resume", "-pm", "run1", "-e200",
                          "--save_root", str(tmp_path)])
    assert cfg6.epoch == 200 and cfg6.max_learning_rate == 0.0002
    # … and the contradicting-model guard fires for -mCGAN as well
    with pytest.raises(SystemExit):
        get_arg_parse(["--resume", "-pm", "run1", "-mCGAN",
                       "--save_root", str(tmp_path)])

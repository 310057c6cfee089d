"""End-to-end CLI entry: main.main() wires flags → preprocessor → models →
trainer → artifacts (metrics stubbed out via eval_every=0)."""

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
    MainLogger.reset()

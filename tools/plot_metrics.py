"""Render a run's structured metrics.jsonl into trajectory plots.

The trainers stream one JSON object per launch boundary (step, epoch,
losses, D outputs, images_per_sec, step_ms, and the eval-time fid/is
scalars) next to the human log — see MainLogger.scalars. This tool turns
that file into one PNG panel per quantity group, the operational
complement of the in-run loss.png artifact (which only covers the loss
pair the reference plotted, train/dcgan_trainer.py:228-239).

Usage:
    python tools/plot_metrics.py save/dcgan/<ts>/metrics.jsonl
    python tools/plot_metrics.py <run_dir>            # finds metrics.jsonl
    python tools/plot_metrics.py <...> -o out_dir     # default: next to it
"""

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


# quantity groups → (title, ylabel, [keys])
PANELS = [
    ("losses", "Adversarial losses", "loss", ["loss_d", "loss_g"]),
    ("d_outputs", "Discriminator outputs", "sigmoid", ["d_x", "d_gz1", "d_gz2"]),
    ("throughput", "Training throughput", "images/sec", ["images_per_sec"]),
    ("step_time", "Step time", "ms/step", ["step_ms"]),
    ("metrics", "Eval metrics", "value", ["fid", "is", "intra_fid"]),
    # opt-in beyond-reference metrics (--extra_metrics 1); panels are
    # skipped when the keys never appear
    ("kid", "Kernel Inception Distance", "unbiased MMD²", ["kid"]),
    ("manifold", "Manifold metrics", "fraction",
     ["precision", "recall", "density", "coverage"]),
]


def load_records(path: str):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn tail line of a live run
    return recs


def plot_run(jsonl_path: str, out_dir: str) -> list:
    recs = load_records(jsonl_path)
    if not recs:
        raise SystemExit(f"no records in {jsonl_path}")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for slug, title, ylabel, keys in PANELS:
        series = {k: ([], []) for k in keys}
        for r in recs:
            for k in keys:
                if k in r and isinstance(r[k], (int, float)):
                    series[k][0].append(r.get("step", len(series[k][0])))
                    series[k][1].append(r[k])
        if not any(xs for xs, _ in series.values()):
            continue
        fig = plt.figure(figsize=(8, 5))
        for k, (xs, ys) in series.items():
            if xs:
                plt.plot(xs, ys, label=k, marker="." if len(xs) < 200 else None)
        plt.title(title)
        plt.xlabel("step")
        plt.ylabel(ylabel)
        plt.legend()
        p = os.path.join(out_dir, f"metrics_{slug}.png")
        fig.savefig(p)
        plt.close(fig)
        written.append(p)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description="plot a run's metrics.jsonl")
    p.add_argument("path", help="metrics.jsonl or a run dir containing one")
    p.add_argument("-o", "--out", default="", help="output dir (default: alongside)")
    a = p.parse_args(argv)
    path = a.path
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    if not os.path.exists(path):
        raise SystemExit(f"{path} not found")
    out = a.out or (os.path.dirname(path) or ".")
    for w in plot_run(path, out):
        print(f"wrote {w}")


if __name__ == "__main__":
    main()

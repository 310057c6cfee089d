"""One front door: ``python -m jckx <command> [args...]``.

Every jckx CLI stays runnable under its own module path (``python -m
jckx.evaluate``, ``python main.py`` — the reference-parity spellings); this
dispatcher just makes the whole surface discoverable from one place:

    python -m jckx                     # list commands
    python -m jckx evaluate --ckpt ...
    python -m jckx serve --ckpt ... --listen 8000
    python -m jckx train -m DCGAN --dataset cifar100

``train`` imports the repo-root ``main.py`` (the reference keeps its entry
point there, SURVEY.md §1 — jckx preserves that layout), so it needs the
repo root on sys.path — true for the documented "run from /root/repo"
usage and for any checkout.
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "train": "train a GAN (reference-compatible flags; repo-root main.py)",
    "evaluate": "score a checkpoint: FID/IS/intra-FID (jckx.evaluate)",
    "serve": "generate from a checkpoint / HTTP daemon (jckx.serve)",
    "export": "ship a self-contained StableHLO sampler (jckx.export)",
    "convert": "convert .pt <-> .ckpt (jckx.convert)",
    "inspect": "introspect a .ckpt/.pt/.jaxexp (jckx.inspect)",
    "doctor": "environment readiness check (jckx.doctor)",
    "finetune": "fine-tune the InceptionV3 metric backbone "
                "(jckx.metrics.inception_train)",
    "panel": "train the same config across N seeds, one quality verdict "
             "(jckx.panel)",
    "plan": "AOT capacity planner: compile the train step for a TPU "
            "topology, report collectives/memory/roofline (jckx.plan)",
}


def _usage() -> str:
    rows = "\n".join(f"  {k:<10} {v}" for k, v in _COMMANDS.items())
    return (f"usage: python -m jckx <command> [args...]\n\ncommands:\n{rows}"
            f"\n\n<command> -h shows that command's flags")


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}\n\n{_usage()}", file=sys.stderr)
        return 2

    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    if cmd == "train":
        try:
            import main as train_entry
        except ImportError as e:
            print(f"'train' needs the repo-root main.py on sys.path (run "
                  f"from the jckx checkout): {e}", file=sys.stderr)
            return 2
        from jckx.configs import get_arg_parse

        train_entry.main(get_arg_parse(rest))
        return 0
    if cmd == "evaluate":
        from jckx.evaluate import main as m

        return m(rest) or 0
    if cmd == "serve":
        from jckx.serve import get_args, main as m

        m(get_args(rest))
        return 0
    if cmd == "export":
        from jckx.export import main as m

        return m(rest) or 0
    if cmd == "convert":
        from jckx.convert import main as m

        return m(rest) or 0
    if cmd == "inspect":
        from jckx.inspect import main as m

        return m(rest)
    if cmd == "doctor":
        from jckx.doctor import main as m

        return m(rest)
    if cmd == "panel":
        from jckx.panel import main as m

        return m(rest)
    if cmd == "plan":
        from jckx.plan import main as m

        return m(rest)
    # finetune
    from jckx.metrics.inception_train import get_args, train

    train(get_args(rest))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

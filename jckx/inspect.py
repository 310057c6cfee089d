"""Checkpoint/artifact introspection: ``python -m jckx.inspect --ckpt <path>``.

One JSON line answering "what is this file?" for every artifact kind jckx
produces or consumes — the ops question that otherwise needs a REPL:

- jckx ``.ckpt``: step, geometry/conditionality/EMA (from the trainer's
  serve_config sidecar), G/D/EMA parameter counts, optimizer moment count,
  best-metric values and logged-loss count from the sidecar, file size.
- reference torch ``.pt``: the same view, geometry INFERRED from the weight
  shapes (checkpoint/torch_convert.py) — so a reference user can audit
  their old checkpoints with jckx before importing them.
- exported ``.jaxexp``: the export sidecar (geometry, batch, platforms,
  quant) plus blob size — without deserializing the StableHLO program.

The reference has no analog (its checkpoints are opaque torch dicts whose
only metadata is the FILENAME, train/dcgan_trainer.py:91). Never touches an
accelerator: the jax backend is PINNED TO CPU before any template/optimizer
init (which would otherwise allocate on the default — tunneled — device),
so it is safe to run on a host whose TPU link is sick (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os


def _pin_host_backend():
    """Introspection never needs the chip, but template/optimizer init
    (make_template_state, torch import) allocates on the DEFAULT backend —
    which is the TPU tunnel on axon hosts, where a sick link blocks device
    work for minutes (CLAUDE.md). Pin CPU before any jax touch so the
    'safe on a sick host' promise in the module docstring holds."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def inspect_ckpt(path: str) -> dict:
    _pin_host_backend()
    from jckx.checkpoint import load_serve_sidecar, restore_checkpoint
    from jckx.models.dcgan import GANGeometry, param_count
    from jckx.train.state import make_template_state

    side = load_serve_sidecar(path)
    defaults = GANGeometry()
    geo = GANGeometry(**{f: side.get(f, getattr(defaults, f))
                         for f in ("z_dim", "image_size", "channels",
                                   "base_width")})
    conditional = bool(side.get("conditional", False))
    ema = bool(side.get("ema", False))
    template = make_template_state(
        geo, conditional=conditional,
        num_classes=int(side.get("num_classes", 100)), with_ema=ema)
    state, extra = restore_checkpoint(path, template)
    info = {
        "kind": "jckx checkpoint",
        "step": int(state.step),
        "conditional": conditional,
        "num_classes": int(side.get("num_classes", 100)) if conditional else None,
        "geometry": {"z_dim": geo.z_dim, "image_size": geo.image_size,
                     "channels": geo.channels, "base_width": geo.base_width},
        "ema": ema,
        "params_g": param_count(state.params_g),
        "params_d": param_count(state.params_d),
        "opt_moments": param_count((state.opt_g, state.opt_d)),
        "sidecar_present": bool(side),
    }
    if ema:
        info["params_ema_g"] = param_count(state.ema_g)
    if "bests" in extra:
        info["bests"] = extra["bests"]
    if "losses" in extra:
        info["logged_losses"] = len(extra["losses"])
    return info


def inspect_pt(path: str) -> dict:
    _pin_host_backend()
    from jckx.checkpoint import import_torch_gan_checkpoint
    from jckx.models.dcgan import param_count

    state, tinfo = import_torch_gan_checkpoint(path, with_optimizer=True)
    g = tinfo["geo"]
    return {
        "kind": "reference torch checkpoint",
        "step": int(tinfo["step"]),
        "conditional": tinfo["conditional"],
        "num_classes": tinfo["num_classes"] if tinfo["conditional"] else None,
        "geometry": {"z_dim": g.z_dim, "image_size": g.image_size,
                     "channels": g.channels, "base_width": g.base_width},
        "ema": False,  # the reference has no EMA
        "params_g": param_count(state.params_g),
        "params_d": param_count(state.params_d),
        "opt_moments": param_count((state.opt_g, state.opt_d)),
    }


def inspect_jaxexp(path: str) -> dict:
    try:
        with open(path + ".json") as f:
            side = json.load(f)
    except (OSError, ValueError) as e:
        raise ValueError(
            f"{path}: missing/unreadable .json sidecar (written by "
            f"jckx.export next to the blob): {e}") from e
    info = {"kind": "exported StableHLO artifact (jckx.export)"}
    info.update(side)
    return info


def inspect_path(path: str) -> dict:
    if path.endswith(".pt"):
        info = inspect_pt(path)
    elif path.endswith(".jaxexp"):
        info = inspect_jaxexp(path)
    else:
        info = inspect_ckpt(path)
    info["path"] = path
    info["file_bytes"] = os.path.getsize(path)
    return info


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="jckx checkpoint/artifact introspection (JSON on stdout)")
    p.add_argument("--ckpt", required=True,
                   help=".ckpt (jckx), .pt (reference torch), or .jaxexp "
                        "(exported artifact)")
    args = p.parse_args(argv)
    print(json.dumps(inspect_path(args.ckpt), indent=2))
    return 0


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    raise SystemExit(main())

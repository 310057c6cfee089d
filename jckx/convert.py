"""Checkpoint format conversion CLI: reference torch ``.pt`` ↔ jckx ``.ckpt``.

    python -m jckx.convert --src 5000_0.1000_88.4000.pt --dst run/latest.ckpt
    python -m jckx.convert --src save/dcgan/<ts>/latest.ckpt --dst export.pt

Direction is picked by the ``--dst`` extension. ``.pt`` → ``.ckpt`` infers
geometry/conditionality from the weights (checkpoint/torch_convert.py) and
writes the jckx msgpack checkpoint WITH its serve_config sidecar, so
``jckx.serve`` / ``--resume`` self-configure from it. ``.ckpt`` → ``.pt``
reads the sidecar (explicit flags override) and emits the reference's
``torch.save({model_g, model_d, optimizer_g, optimizer_d})`` dict, strictly
loadable by its modules (train/dcgan_trainer.py:86-91).

One-shot import for serving/training doesn't need this (``jckx.serve
--ckpt x.pt`` and ``main.py --init_from_torch`` import in place); the CLI
is for pre-converting artifact stores and for the escape hatch back.
"""

from __future__ import annotations

import argparse
import json


def get_args(argv=None):
    p = argparse.ArgumentParser(description="jckx checkpoint conversion")
    p.add_argument("--src", required=True, help="source checkpoint (.pt or .ckpt)")
    p.add_argument("--dst", required=True, help="destination (.ckpt or .pt)")
    p.add_argument("--lr", type=float, default=2e-4,
                   help="optimizer lr recorded in the exported torch "
                        "param_groups / used for the optax state template")
    p.add_argument("--use_ema", action="store_true",
                   help=".ckpt->.pt: export the EMA generator in G's slot")
    p.add_argument("--with_ema", action="store_true",
                   help=".pt->.ckpt: seed the jckx EMA slot with a copy of G")
    # .ckpt -> .pt structure hints (default: the .json sidecar's say)
    p.add_argument("--conditional", action="store_true", default=None)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--base_width", type=int, default=None)
    p.add_argument("--z_dim", type=int, default=None)
    return p.parse_args(argv)


def convert(args) -> dict:
    """→ info dict describing what was written (the printed JSON line)."""
    from jckx.models.dcgan import GANGeometry

    to_torch = args.dst.endswith(".pt")
    if args.src.endswith(".pt") == to_torch:
        raise ValueError(
            f"one side must be .pt and the other .ckpt (src={args.src}, "
            f"dst={args.dst})")

    if not to_torch:
        from jckx.checkpoint import import_torch_gan_checkpoint, save_checkpoint
        from jckx.checkpoint.checkpoint import flush_writes

        state, info = import_torch_gan_checkpoint(
            args.src, lr=args.lr, with_ema=args.with_ema)
        g = info["geo"]
        serve_config = {
            "conditional": info["conditional"],
            "num_classes": info["num_classes"],
            "z_dim": g.z_dim, "image_size": g.image_size,
            "channels": g.channels, "base_width": g.base_width,
            "ema": args.with_ema,
        }
        save_checkpoint(args.dst, state, {"serve_config": serve_config})
        flush_writes()
        return {"wrote": args.dst, "step": info["step"], **serve_config}

    from jckx.checkpoint import export_torch_gan_checkpoint, restore_checkpoint
    from jckx.train.state import make_template_state

    from jckx.checkpoint import load_serve_sidecar

    sidecar = load_serve_sidecar(args.src)
    conditional = (sidecar.get("conditional", False)
                   if args.conditional is None else args.conditional)
    num_classes = (sidecar.get("num_classes", 100)
                   if args.num_classes is None else args.num_classes)
    fields = ("z_dim", "image_size", "channels", "base_width")
    defaults = GANGeometry()
    geo = GANGeometry(**{
        f: (getattr(args, f) if getattr(args, f) is not None
            else sidecar.get(f, getattr(defaults, f)))
        for f in fields})
    # the restore template must match the stored STRUCTURE; the sidecar
    # normally says whether the run carried EMA, but --use_ema/--with_ema
    # also force the EMA slot so a sidecar-less EMA checkpoint stays
    # convertible (flax from_bytes hard-fails on a structure mismatch)
    template = make_template_state(
        geo, conditional=conditional, num_classes=num_classes,
        with_ema=bool(sidecar.get("ema", False)) or args.use_ema
        or args.with_ema, lr=args.lr)
    state, _ = restore_checkpoint(args.src, template)
    export_torch_gan_checkpoint(
        state, conditional=conditional, geo=geo, num_classes=num_classes,
        lr=args.lr, path=args.dst, use_ema=args.use_ema)
    return {"wrote": args.dst, "step": int(state.step),
            "conditional": conditional, "num_classes": num_classes,
            "z_dim": geo.z_dim, "image_size": geo.image_size,
            "channels": geo.channels, "base_width": geo.base_width}


def main(argv=None):
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    print(json.dumps(convert(get_args(argv))))


if __name__ == "__main__":
    main()

"""Portable generator export: a self-contained StableHLO artifact.

The reference has no deployment story at all (generation exists only inside
its training eval loop). jckx's serving daemon (jckx.serve) covers live
serving; this module covers SHIPPING the model: ``jax.export`` serializes
the jitted sampler — generator weights baked in as constants — to one
versioned StableHLO blob that any process with jax installed can run with

    from jckx.export import load_exported
    sample = load_exported("gen.jaxexp")
    imgs = sample(seed=0)                       # (bs, S, S, C) uint8

no jckx, no model code, no checkpoint parsing. This is the TPU-ecosystem
idiom for deployment artifacts (StableHLO is XLA's stable serialization
boundary, with forward-compatibility guarantees), the analog of the
torch.jit/ONNX export the reference stack would have used.

Exported program = the production sampler's exact math: z drawn on device
from a seed, generator forward, tanh→uint8 conversion (serve.tanh_to_u8).
Conditional checkpoints export with a per-image int32 label input. The
artifact uses the plain XLA lowering of the forward (not the Pallas fused
kernel, which jckx.serve opts into per-process) so the blob stays portable
across platform versions; the two paths are numerically interchangeable
(tests/test_kernels.py pins the equivalence the service relies on).

CLI:
    python -m jckx.export --ckpt save/dcgan/<ts>/latest.ckpt --dst gen.jaxexp
    python -m jckx.export --ckpt ref.pt --dst gen.jaxexp --batch_size 64

Accepts jckx ``.ckpt`` (sidecar-self-configuring) or reference torch ``.pt``
(geometry inferred from weights) — same loading surface as jckx.serve.
A ``.json`` sidecar records geometry/conditioning/batch/platforms for
inspection; the blob itself is self-describing to jax.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


DEFAULT_PLATFORMS = ("cpu", "tpu")


def export_generator(
    ckpt_path: str,
    dst: str,
    batch_size: int = 64,
    conditional: Optional[bool] = None,
    num_classes: Optional[int] = None,
    use_ema: Optional[bool] = None,
    geo_overrides: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    quant: Optional[str] = None,
) -> dict:
    """Serialize the checkpoint's sampler to ``dst`` (+ ``dst.json``).

    → info dict (what the CLI prints). ``platforms`` lowers the program for
    each target up front (cross-lowering needs no device attached), so one
    artifact serves CPU smoke tests and TPU production.
    """
    from jckx.serve import GeneratorService, tanh_to_u8

    if batch_size < 1:
        raise ValueError(f"export batch_size {batch_size} must be >= 1 (a "
                         f"zero-batch artifact would serve nothing, forever)")
    # quant='int8': the service calibrates + quantizes at load, so the
    # artifact bakes in INT8 weights and the int8x int8->int32 forward
    # (ops/quant.py) — the blob itself shrinks ~4x and every deployment
    # platform gets the integer MXU path with no calibration at serve time
    svc = GeneratorService(
        ckpt_path, conditional=conditional, num_classes=num_classes,
        batch_size=batch_size, compute_dtype=compute_dtype, use_ema=use_ema,
        geo_overrides=geo_overrides, quant=quant,
    )
    params, geo, ncls = svc.params_g, svc.geo, svc.num_classes
    cd = compute_dtype

    # the service already built the quant-or-float forward over its
    # (possibly quantized) params via ops/quant.py::make_sampler — bake
    # exactly that into the artifact
    def fwd(z, onehot):
        return svc.sampler_apply(params, z, onehot)

    if svc.conditional:
        def render(seed, labels):
            z = jax.random.normal(jax.random.PRNGKey(seed),
                                  (batch_size, geo.z_dim))
            return tanh_to_u8(fwd(z, jax.nn.one_hot(labels, ncls)))

        arg_shapes = (jax.ShapeDtypeStruct((), jnp.int32),
                      jax.ShapeDtypeStruct((batch_size,), jnp.int32))
    else:
        def render(seed):
            z = jax.random.normal(jax.random.PRNGKey(seed),
                                  (batch_size, geo.z_dim))
            return tanh_to_u8(fwd(z, None))

        arg_shapes = (jax.ShapeDtypeStruct((), jnp.int32),)

    exp = jax.export.export(jax.jit(render), platforms=list(platforms))(*arg_shapes)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    with open(dst, "wb") as f:
        f.write(blob)

    info = {
        "wrote": dst, "bytes": len(blob), "step": svc.step,
        "ema_weights": svc.used_ema,  # which generator was actually baked in
        "batch_size": batch_size, "conditional": svc.conditional,
        "num_classes": ncls if svc.conditional else None,
        "z_dim": geo.z_dim, "image_size": geo.image_size,
        "channels": geo.channels, "base_width": geo.base_width,
        "compute_dtype": str(jnp.dtype(cd)), "platforms": list(platforms),
        "quant": svc.quant,
        "inputs": (["seed:i32[]", f"labels:i32[{batch_size}]"]
                   if svc.conditional else ["seed:i32[]"]),
        "output": f"u8[{batch_size},{geo.image_size},{geo.image_size},"
                  f"{geo.channels}]",
    }
    with open(dst + ".json", "w") as f:
        json.dump(info, f, indent=1)
    return info


def load_exported(path: str):
    """→ ``sample(seed[, labels]) -> uint8 images`` from an exported blob.

    Thin convenience over ``jax.export.deserialize``; works in a process
    with only jax installed (the function body and weights are inside the
    blob). Inputs are converted to the expected int32 shapes.
    """
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())

    n_in = len(exp.in_avals)
    call = jax.jit(exp.call)  # cache the dispatch path across invocations

    def sample(seed: int, labels=None):
        args = [jnp.asarray(seed, jnp.int32)]
        if n_in == 2:
            if labels is None:
                raise ValueError(
                    "this artifact was exported from a conditional (CGAN) "
                    "checkpoint — pass labels (one int per image)")
            args.append(jnp.asarray(labels, jnp.int32))
        elif labels is not None:
            raise ValueError(
                "this artifact was exported from an unconditional (DCGAN) "
                "checkpoint — it takes no labels")
        return call(*args)

    return sample


class ArtifactService:
    """Serve FROM an exported artifact — the deployment end of the loop.

    Implements the same surface the HTTP daemon consumes from
    ``GeneratorService`` (``step``/``conditional``/``num_classes``/``geo``/
    ``batch_size``/``sample``), but backed purely by the ``.jaxexp`` blob +
    its ``.json`` sidecar: a replica needs the artifact pair and jax, no
    jckx model code versioned against the checkpoint. Selected by the CLI
    on extension: ``python -m jckx.serve --ckpt gen.jaxexp --listen 8000``.

    Seeding: the artifact draws z from an int32 seed (PRNGKey(seed) inside
    the exported program), so per-batch seeds advance arithmetically from a
    base — same determinism contract (same seed → same images), a different
    stream than the checkpoint-backed service's fold_in chain.
    """

    def __init__(self, artifact_path: str, seed: int = 0):
        from jckx.models.dcgan import GANGeometry

        with open(artifact_path, "rb") as f:
            exp = jax.export.deserialize(f.read())
        # jit once: Exported.call rebuilds its custom_vjp wrapper and
        # tree-flattens per invocation — jitting caches the dispatch path
        # across the per-batch calls of every request
        self._call = jax.jit(exp.call)
        try:
            with open(artifact_path + ".json") as f:
                side = json.load(f)
        except (OSError, ValueError) as e:
            raise ValueError(
                f"{artifact_path}: missing/unreadable .json sidecar "
                f"(written by jckx.export next to the blob): {e}") from e
        self.conditional = len(exp.in_avals) == 2
        self.batch_size = int(side["batch_size"])
        if self.batch_size < 1:
            raise ValueError(f"{artifact_path}: sidecar batch_size "
                             f"{self.batch_size} must be >= 1")
        if self.conditional:
            # fabricating a class count would make the HTTP validation
            # accept labels the generator one-hots to zero (off-manifold
            # images instead of a clear error)
            try:
                self.num_classes = int(side["num_classes"])
            except (KeyError, TypeError) as e:
                raise ValueError(
                    f"{artifact_path}: conditional artifact but the sidecar "
                    f"has no usable num_classes") from e
        else:
            self.num_classes = 0  # no label surface
        self.step = side.get("step", 0)
        self.geo = GANGeometry(
            z_dim=side["z_dim"], image_size=side["image_size"],
            channels=side["channels"], base_width=side["base_width"])
        self._base_seed = seed
        self._count = 0

    def sample(self, n: int, labels=None, key=None) -> "np.ndarray":
        """``key``: a plain int seed (preferred — no device work before the
        first render dispatch) or a PRNGKey (its data is host-read once per
        request; avoid on cold tunnel channels, CLAUDE.md)."""
        import numpy as np

        from jckx.serve import pipelined_sample, validate_sample_args

        labels = validate_sample_args(n, labels, self.conditional)
        if key is None:
            self._count += 1
            base = self._base_seed * 1_000_003 + self._count * 65_537
        elif isinstance(key, int):
            base = key
        else:
            base = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
        bs = self.batch_size

        def render(batch_i, made):
            seed = jnp.asarray((base + batch_i) % (2**31 - 1), jnp.int32)
            if self.conditional:
                if labels is not None:
                    lab = np.asarray([labels[(made + i) % len(labels)]
                                      for i in range(bs)], np.int32)
                else:
                    # no selection = iid-uniform random classes — the shared
                    # contract (serve.validate_sample_args) GeneratorService
                    # meets with on-device randint; the exported program's
                    # label input is fixed, so the draw happens host-side,
                    # seeded from (base, batch) to keep same-seed requests
                    # byte-identical
                    rng = np.random.default_rng([base % (2**63), batch_i])
                    lab = rng.integers(0, self.num_classes, size=bs,
                                       dtype=np.int32)
                return self._call(seed, jnp.asarray(lab))
            return self._call(seed)

        return pipelined_sample(n, bs, render)


def get_args(argv=None):
    p = argparse.ArgumentParser(description="jckx portable generator export")
    p.add_argument("--ckpt", required=True,
                   help="jckx .ckpt or reference torch .pt")
    p.add_argument("--dst", required=True, help="output artifact path")
    p.add_argument("-b", "--batch_size", type=int, default=64,
                   help="compiled batch of the exported program")
    p.add_argument("--platforms", default=",".join(DEFAULT_PLATFORMS),
                   help="comma list of lowering targets (cpu,tpu,cuda)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--weights", default="auto",
                   choices=["auto", "live", "ema"],
                   help="which generator to bake in: 'auto' follows the "
                        "checkpoint's sidecar (EMA when the run tracked "
                        "one), 'live'/'ema' force; the info line's "
                        "ema_weights field records what actually shipped")
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="int8 = bake the W8A8 quantized sampler into the "
                        "artifact (ops/quant.py; calibrated here, at export)")
    p.add_argument("--conditional", action="store_true", default=None)
    p.add_argument("--num_classes", type=int, default=None)
    # geometry overrides for sidecar-less checkpoints (same surface as serve)
    p.add_argument("--z_dim", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--base_width", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    a = get_args(argv)
    overrides = {k: getattr(a, k)
                 for k in ("z_dim", "image_size", "channels", "base_width")
                 if getattr(a, k) is not None}
    info = export_generator(
        a.ckpt, a.dst, batch_size=a.batch_size, conditional=a.conditional,
        num_classes=a.num_classes,
        use_ema={"auto": None, "live": False, "ema": True}[a.weights],
        geo_overrides=overrides or None,
        compute_dtype=jnp.bfloat16 if a.compute_dtype == "bfloat16" else jnp.float32,
        platforms=[s for s in a.platforms.split(",") if s],
        quant=a.quant or None,
    )
    print(json.dumps(info))


if __name__ == "__main__":
    main()

"""Dissect the serving-forward cost: which part of the served generation
region costs what.

RESOLVED (r3): the original bench_serve.py reading of ~6.9 µs/img (5.7× the
roofline floor) was a measurement artifact, not kernel slack — it sliced
per-launch key arrays off a device array INSIDE the timed loop, adding one
tunnel dispatch per region that scales with region count (so the
differential clock could not cancel it). With all launch args
pre-materialized and block_until_ready'd off the clock, the served forward
measures ~2.1 µs/img = 1.8× its HBM byte floor (bench_serve.py). This
probe is kept for re-dissection; its first run also showed ±40% spread
between variants differing only in checksum dtype — that spread came from
the same artifact (args built, unblocked, just before the clock), fixed
below the same way.

Variants (one process, shared tunnel warmup, bench.py's differential
two-region clock):

  full      exact bench_serve region (rng in scan + u8 + checksum)
  no_rng    z precomputed host-side, scanned as xs (removes threefry)
  no_u8     rng in scan, checksum = f32 sum of tanh output (removes the
            u8 convert + uint32 reduce)
  bare      z precomputed, f32 checksum (G forward alone)
  bare_xla  `bare` without the Pallas inference path (XLA BN composition —
            expected pathological per fused_bn_act.py:41)

Usage: python tools/profiling/serve_forward_probe.py [--skip_xla]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")  # run from repo root

from bench import differential_time  # noqa: E402
from jckx.kernels.fused_bn_act import pallas_inference  # noqa: E402
from jckx.models import dcgan  # noqa: E402
from jckx.models.dcgan import GANGeometry  # noqa: E402

BS, S, R = 512, 20, 5
CD = jnp.bfloat16


from jckx.serve import tanh_to_u8 as to_u8  # noqa: E402  production conversion


def build(geo, params):
    def region_full(params, keys):
        def body(acc, key):
            z = jax.random.normal(key, (BS, geo.z_dim))
            u8 = to_u8(dcgan.generator_apply(params, z, geo, CD))
            return acc + jnp.sum(u8.astype(jnp.uint32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint32), keys)
        return acc

    def region_no_rng(params, zs):
        def body(acc, z):
            u8 = to_u8(dcgan.generator_apply(params, z, geo, CD))
            return acc + jnp.sum(u8.astype(jnp.uint32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint32), zs)
        return acc

    def region_no_u8(params, keys):
        def body(acc, key):
            z = jax.random.normal(key, (BS, geo.z_dim))
            out = dcgan.generator_apply(params, z, geo, CD)
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), keys)
        return acc

    def region_bare(params, zs):
        def body(acc, z):
            out = dcgan.generator_apply(params, z, geo, CD)
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), zs)
        return acc

    return {"full": region_full, "no_rng": region_no_rng,
            "no_u8": region_no_u8, "bare": region_bare}


def time_region(jitted, params, make_arg):
    counter = {"i": 1}

    def run_region(n):
        i = counter["i"]
        counter["i"] += 1
        # materialize every launch arg OFF the clock (see module docstring)
        args = [make_arg(i * 1000 + j) for j in range(n)]
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        accs = [jitted(params, a) for a in args]
        jax.block_until_ready(accs)
        float(jnp.asarray(accs[-1], jnp.float32))
        return time.perf_counter() - t0

    dt = differential_time(run_region, R)
    return 1e6 * dt / (BS * S * R)


def main(skip_xla: bool):
    geo = GANGeometry(image_size=64)
    params = dcgan.generator_init(jax.random.PRNGKey(0), geo)

    def keys_arg(i):
        return jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), i), S)

    def zs_arg(i):
        return jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(11), i), (S, BS, geo.z_dim))

    regions = build(geo, params)
    args = {"full": keys_arg, "no_rng": zs_arg, "no_u8": keys_arg,
            "bare": zs_arg}

    results = {}
    for name, fn in regions.items():
        jitted = jax.jit(fn)
        with pallas_inference():
            acc = jitted(params, args[name](0))  # compile under Pallas scope
        float(jnp.asarray(acc, jnp.float32))
        results[name] = time_region(jitted, params, args[name])
        print(f"{name:10s} {results[name]:7.2f} us/img", flush=True)

    if not skip_xla:
        # a FRESH CLOSURE, not jax.jit(regions["bare"]) again: jit's
        # function-identity trace cache would reuse the jaxpr traced above
        # under pallas_inference() and silently measure the Pallas program
        bare = regions["bare"]
        jitted = jax.jit(lambda p, z: bare(p, z))  # traced OUTSIDE the scope
        # → XLA BN path. Expected ~100x slow (fused_bn_act.py:41) — time one
        # region only, no differential.
        acc = jitted(params, zs_arg(0))
        float(jnp.asarray(acc, jnp.float32))
        t0 = time.perf_counter()
        acc = jitted(params, zs_arg(1))
        float(jnp.asarray(acc, jnp.float32))
        us = 1e6 * (time.perf_counter() - t0) / (BS * S)
        print(f"{'bare_xla':10s} {us:7.2f} us/img (single region, "
              "incl. read overhead)", flush=True)

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must stick despite the
    # axon plugin's import-time platform pin (CLAUDE.md landmine)
    p = argparse.ArgumentParser()
    p.add_argument("--skip_xla", action="store_true")
    a = p.parse_args()
    main(a.skip_xla)

"""Secondary benchmark: FID evaluation wall-clock (BASELINE.json north-star
"FID-50k eval wall-clock").

Measures end-to-end FID of a 50k-image set against cached real features:
uint8 upload → on-device resize-to-299 + ImageNet normalize → InceptionV3
features (async batch dispatch, single drain) → mean/cov → eigh sqrtm →
Fréchet distance, all on one TPU chip.

The reference pipeline does this on host CPU per batch (torchvision resize,
numpy cov, scipy sqrtm); its only recorded Inception throughput is ≈10 it/s
@ bs128 eval (inceptionnet.ipynb cell 14) ⇒ ≥ ~39 s of feature extraction
alone for 50k images, before the host-side sqrtm.

Prints one JSON line (same contract as bench.py; the driver runs bench.py —
this file is the documented protocol for the eval-side number).

Caveat on this machine: the remote TPU runtime does not reuse compiled
programs across processes and its compile service latency varies 10-300 s,
so the reported wall-clock is dominated by one-time compiles. Steady-state
feature extraction measures ~0.17 ms/image (≈8.5 s for 50k) — the in-train
eval cadence pays that, not the cold number.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(n_images: int = 50_000, batch: int = 2048, fast_stem: bool = False,
         extra: bool = False):
    from jckx.metrics.metrics import Metrics

    rng = np.random.RandomState(0)
    real_u8 = rng.randint(0, 255, size=(n_images, 32, 32, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(n_images,))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        m = Metrics((real_u8, labels), batch_size=batch, cache_dir=td,
                    fast_stem=fast_stem)
        build_dt = time.perf_counter() - t0  # incl. 50k-feature extraction

        gen = (rng.rand(n_images, 32, 32, 3).astype(np.float32) * 2 - 1)
        t0 = time.perf_counter()
        # reuse the u8-free tanh path in chunks the way trainers do
        fid = m.fid(gen)
        fid_dt = time.perf_counter() - t0

        # steady-state feature throughput (executables now compiled): the
        # reference's published eval rate is ≈10 it/s @ bs128 = 1,280 img/s
        # on its GPU (inceptionnet.ipynb cell 14, train-set eval) — the
        # only published eval-side number, so the honest vs_baseline.
        # Measured on DEVICE-RESIDENT images (the trainers' production eval
        # path — samples never leave the chip); the host-array path is
        # upload-bound through this machine's TPU tunnel and reported in
        # detail for transparency.
        import jax.numpy as jnp

        # clamp to the available set: with --n below 16384 a fixed n_steady
        # would divide by images never processed and inflate every
        # steady-state/roofline number by 16384/n
        n_steady = min(16384, n_images)
        gen_dev = jnp.asarray(gen[:n_steady])
        m.extract_features(gen_dev)  # warm the device-path executable

        # differential timing (bench.py methodology): regions of 1 and 2
        # extractions, per-size minima over 2 repeats — cancels the
        # closing read + dispatch jitter out of the steady-state rate
        from bench import differential_time

        def extract_region(n):
            t0 = time.perf_counter()
            for _ in range(n):
                m.extract_features(gen_dev)
            return time.perf_counter() - t0

        steady_img_s = n_steady / differential_time(extract_region, 1,
                                                    repeats=2)
        t0 = time.perf_counter()
        m.extract_features(gen[:n_steady])
        host_img_s = n_steady / (time.perf_counter() - t0)

        # eval-path roofline (VERDICT r2 task 8): XLA's own cost model for
        # the compiled tanh→features executable (resize-to-299 + normalize +
        # InceptionV3 eval forward), v5e peaks from jckx.configs
        from jckx.configs import V5E_BF16_PEAK_FLOPS, V5E_HBM_BYTES_PER_S

        ca = (m._features_from_tanh
              .lower(jnp.zeros((batch, 32, 32, 3), jnp.float32))
              .compile().cost_analysis()) or {}
        flops_img = float(ca.get("flops", 0.0)) / batch
        bytes_img = float(ca.get("bytes accessed", 0.0)) / batch
        comp_floor_us = 1e6 * flops_img / V5E_BF16_PEAK_FLOPS
        byte_floor_us = 1e6 * bytes_img / V5E_HBM_BYTES_PER_S
        meas_us = 1e6 / steady_img_s
        floor_us = max(comp_floor_us, byte_floor_us)
        bound = "HBM" if byte_floor_us > comp_floor_us else "MXU"
        if floor_us <= 0.0:  # cost model unavailable — don't lose the run
            bound, floor_us = "unknown", float("nan")
        roofline = {
            "gflop_per_image": round(flops_img / 1e9, 2),
            "gb_accessed_per_image": round(bytes_img / 1e9, 3),
            "compute_floor_us_per_image": round(comp_floor_us, 1),
            "byte_floor_us_per_image": round(byte_floor_us, 1),
            "measured_us_per_image": round(meas_us, 1),
            "bound": bound,
            "x_floor": (round(meas_us / floor_us, 2)
                        if np.isfinite(floor_us) else None),
        }

        # --extra 1: wall cost of the beyond-reference metrics at FID-50k
        # scale, on the metric compute alone (features given — the shared-
        # extraction path trainers/evaluate use). Timed post-compile; the
        # scalar host reads close each region like every bench here.
        extra_detail = None
        if extra:
            fake_feats = rng.randn(n_images, m.num_classes).astype(np.float32)
            m.kid(features=fake_feats, seed=1)  # compile
            t0 = time.perf_counter()
            kid_mean, kid_std = m.kid(features=fake_feats, seed=2)
            kid_dt = time.perf_counter() - t0
            m.prdc(features=fake_feats)  # compile
            t0 = time.perf_counter()
            prdc_vals = m.prdc(features=fake_feats)
            prdc_dt = time.perf_counter() - t0
            extra_detail = {
                "kid_wall_s": round(kid_dt, 3),
                "prdc_wall_s": round(prdc_dt, 3),
                "kid": round(kid_mean, 4), "kid_std": round(kid_std, 4),
                **{k: round(v, 4) for k, v in prdc_vals.items()},
            }

    ref_eval_img_s = 10.0 * 128
    print(json.dumps({
        "metric": "FID-50k eval wall-clock (features+frechet, one v5e chip); "
                  "vs_baseline = steady-state feature img/s over the reference's "
                  "published eval rate (1,280 img/s, inceptionnet.ipynb cell 14)",
        "value": round(fid_dt, 2),
        "unit": "seconds",
        # the wall value times a HOST-array 50k fid() — upload-bound through
        # this machine's TPU tunnel, whose transfer rate varies by session
        # (observed 93-149 s for identical code). Cross-session comparisons
        # should use detail.steady_state_feature_img_per_s_device_resident
        # (the trainers' production eval path, compute-dominated).
        "value_note": ("host-upload-path wall; session-variant tunnel "
                       "transfer — compare steady_state detail across "
                       "sessions, not this wall"),
        "vs_baseline": round(steady_img_s / ref_eval_img_s, 2),
        "detail": {
            "real_feature_cache_build_s": round(build_dt, 2),
            "steady_state_feature_img_per_s_device_resident": round(steady_img_s, 1),
            "feature_img_per_s_host_upload_via_tunnel": round(host_img_s, 1),
            "fid_value": round(float(fid), 3),
            "images": n_images,
            "eval_forward_roofline": roofline,
            **({"extra_metrics": extra_detail} if extra_detail else {}),
        },
    }))


if __name__ == "__main__":
    import argparse

    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description="eval-stack benchmark")
    ap.add_argument("--fast_stem", type=int, default=0,
                    help="1 = space-to-depth stem A/B (--eval_fast_stem)")
    ap.add_argument("--extra", type=int, default=0,
                    help="1 = also time KID + PRDC on the 50k feature set")
    ap.add_argument("--n", type=int, default=50_000,
                    help="image count (reduce for CPU smokes)")
    ap.add_argument("--batch", type=int, default=2048,
                    help="extraction batch size (A/B the eval forward's "
                         "batching)")
    a = ap.parse_args()
    main(n_images=a.n, batch=a.batch, fast_stem=bool(a.fast_stem),
         extra=bool(a.extra))

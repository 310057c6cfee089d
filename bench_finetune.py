"""Apples-to-apples benchmark vs the reference's only published number.

The reference's sole recorded throughput is the InceptionV3 fine-tune train
loop: ~2.92 it/s at batch 128 ≈ 374 img/s on its (unnamed) CUDA GPU
(inceptionnet.ipynb cell 14, "391it [02:14, 2.92it/s]"). This benchmark
times the SAME workload through jckx's own trainer code path
(jckx.metrics.inception_train make_train_step + make_superstep): SGD with
nesterov momentum + weight decay, RandomResizedCrop(299)+HFlip
augmentation on device, batch 128, bf16 compute, batch-stat BN with
running-stat updates.

Methodology (TPU tunnel): K steps per device launch via lax.scan; regions
of S and 2S launches timed DIFFERENTIALLY from a blocked start (per-size
minima over ``repeats`` runs — bench.py::differential_time), so the
closing scalar read and any dispatch jitter cancel out of the number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is jckx img/s ÷ 374.
"""

import json
import time

import jax
import numpy as np

from jckx.configs import REFERENCE_IMG_PER_SEC  # single-source anchor


def main(batch_size: int = 128, K: int = 8, supersteps: int = 4,
         repeats: int = 2):
    from bench import differential_time
    from jckx.metrics import inception_v3
    from jckx.metrics.inception_train import make_superstep, make_train_step

    params = inception_v3.init(0, num_classes=100)
    step, tx, raw_step = make_train_step(lr=0.1, weight_decay=5e-4)
    sstep = make_superstep(raw_step)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    data = jax.device_put(rng.randint(0, 255, (4096, 32, 32, 3), dtype=np.uint8))
    labels = jax.device_put(rng.randint(0, 100, (4096,)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    # launch args (idx upload + per-launch rng key) pre-materialized on
    # device, OFF the clock: an in-region host→device upload is a per-launch
    # dispatch that pollutes the measurement (same fix as bench.py)
    def make_args(i):
        idx = jax.device_put(rng.randint(0, 4096, (K, batch_size)).astype(np.int32))
        return idx, jax.random.fold_in(key, i)

    warm_args = [make_args(i) for i in range(2)]
    args_pool = iter(jax.block_until_ready(
        [make_args(100 + i) for i in range(max(1, repeats) * 3 * supersteps)]))

    def launch(params, opt_state, args):
        idx, k = args
        return sstep(params, opt_state, data, labels, idx, k)

    # compile + flush the remote runtime's early-completion artifact
    for a in warm_args:
        params, opt_state, losses, accs = launch(params, opt_state, a)
    jax.block_until_ready(params)
    float(losses[-1])

    box = {"params": params, "opt": opt_state}

    def run_region(n):
        p, o = box["params"], box["opt"]
        t0 = time.perf_counter()
        for _ in range(n):
            p, o, losses, accs = launch(p, o, next(args_pool))
        jax.block_until_ready(p)
        box["loss"] = float(losses[-1])  # host read closes the region
        dt = time.perf_counter() - t0
        box["params"], box["opt"] = p, o
        return dt

    dt = differential_time(run_region, supersteps, repeats=repeats)
    last_loss = box["loss"]

    assert np.isfinite(last_loss), "non-finite fine-tune loss"
    img_per_sec = batch_size * K * supersteps / dt / jax.device_count()
    print(json.dumps({
        "metric": "images/sec/chip InceptionV3 fine-tune train step "
                  "(299x299, bs128, bf16, SGD+nesterov+wd, on-device RRC+flip aug) "
                  "— same workload as the reference's only published number",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 2),
    }))
    return img_per_sec


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()
    main()

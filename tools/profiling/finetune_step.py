"""Bisect the InceptionV3 fine-tune step cost on the real TPU.

Methodology (tunnel rules): every scan body is chained through the carry
(so XLA cannot hoist/DCE it), >=2 launches timed from a blocked start,
and a SCALAR HOST READ closes the timed region.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jckx.data.augment import random_resized_crop_flip
from jckx.metrics import inception_v3
from jckx.metrics.inception_train import make_train_step, make_superstep

BS = 128
K = 8
R = 3  # timed launches


def timed(name, fn, *args):
    out = fn(*args)
    s = float(jax.tree_util.tree_leaves(out)[-1].ravel()[0])  # drain compile
    t0 = time.perf_counter()
    for _ in range(R):
        out = fn(*args)
    s = float(jax.tree_util.tree_leaves(out)[-1].ravel()[0])  # close region
    dt = (time.perf_counter() - t0) / (R * K)
    print(f"{name:24s} {dt*1e3:8.2f} ms/iter  {BS/dt:9.0f} img/s   (s={s:.3g})",
          flush=True)
    return dt


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    data = jax.device_put(rng.randint(0, 255, (4096, 32, 32, 3), dtype=np.uint8))
    labels = jax.device_put(rng.randint(0, 100, (4096,)).astype(np.int32))
    idx = jax.device_put(rng.randint(0, 4096, (K, BS)).astype(np.int32))
    key = jax.random.PRNGKey(0)
    params = inception_v3.init(0, num_classes=100)
    x299 = jax.device_put(rng.standard_normal((BS, 299, 299, 3)).astype(np.float32))
    yb = jax.device_put(rng.randint(0, 100, (BS,)).astype(np.int32))

    # 1. augmentation only (gather + u8->f32 + RRC + normalize)
    @jax.jit
    def aug_scan(data, idx, key):
        def body(c, ib):
            k, acc = c
            k = jax.random.fold_in(k, 1)
            u8 = jnp.take(data, ib, axis=0)
            x = random_resized_crop_flip(k, u8.astype(jnp.float32) / 255.0 + acc, 299)
            return (k, jnp.mean(x) * 1e-20), None
        (k, acc), _ = jax.lax.scan(body, (key, 0.0), idx)
        return acc

    timed("aug only", aug_scan, data, idx, key)

    # 2. eval-mode forward
    @jax.jit
    def fwd_eval_scan(params, x):
        def body(c, _):
            logits = inception_v3.apply(params, x + c, jnp.bfloat16)
            return jnp.mean(logits) * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, None, length=K)
        return c

    timed("fwd eval-BN", fwd_eval_scan, params, x299)

    # 3. train-mode forward (batch-stat BN)
    @jax.jit
    def fwd_train_scan(params, x, key):
        def body(c, _):
            logits, _ = inception_v3.apply_train(params, x + c, dropout_key=key,
                                                 compute_dtype=jnp.bfloat16)
            return jnp.mean(logits) * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, None, length=K)
        return c

    timed("fwd train-BN", fwd_train_scan, params, x299, key)

    # 4. fwd+bwd (no optimizer, no aug)
    @jax.jit
    def fwdbwd_scan(params, x, y, key):
        def loss_fn(p, xx):
            logits, _ = inception_v3.apply_train(p, xx, dropout_key=key,
                                                 compute_dtype=jnp.bfloat16)
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, y))

        def body(c, _):
            l, g = jax.value_and_grad(loss_fn)(params, x + c)
            gn = sum(jnp.sum(jnp.square(t)) for t in jax.tree_util.tree_leaves(g))
            return (l + gn) * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, None, length=K)
        return c

    timed("fwd+bwd", fwdbwd_scan, params, x299, yb, key)

    # 5. full step (aug + fwd + bwd + SGD) — the product path
    step, tx, raw_step = make_train_step(lr=0.1, weight_decay=5e-4)
    sstep = make_superstep(raw_step)
    opt_state = tx.init(params)

    p, o, losses, accs = sstep(params, opt_state, data, labels, idx, key)
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(R):
        p, o, losses, accs = sstep(p, o, data, labels, idx, key)
    last = float(losses[-1])
    dt = (time.perf_counter() - t0) / (R * K)
    print(f"{'full train step':24s} {dt*1e3:8.2f} ms/iter  {BS/dt:9.0f} img/s   (loss={last:.3g})",
          flush=True)


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must stick despite the
    # axon plugin's import-time platform pin (CLAUDE.md landmine)
    main()

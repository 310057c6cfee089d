"""Micro-bench: per-channel moment reductions over a big bf16 NHWC tensor.
Which formulation reaches HBM bandwidth? (chained-scan methodology)"""
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 20
R = 3


def timed(name, fn, *args, bytes_per_iter=0):
    out = fn(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(R):
        out = fn(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    dt = (time.perf_counter() - t0) / (R * K)
    bw = bytes_per_iter / dt / 1e9 if bytes_per_iter else 0
    print(f"{name:34s} {dt*1e3:8.3f} ms  {bw:7.0f} GB/s-equiv", flush=True)
    return dt


def scanner(body1):
    """Chain body over K iters; body1(x, c) -> pytree whose first leaf feeds c."""
    @jax.jit
    def run(x):
        def body(c, _):
            out = body1(x + c.astype(x.dtype), c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf, dtype=jnp.float32) * 1e-30, out
        c, outs = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None, length=K)
        return c
    return run


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    for shape in [(128, 35, 35, 288), (128, 147, 147, 64), (128, 17, 17, 768)]:
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32)
                           .astype(jnp.bfloat16))
        n = int(np.prod(shape[:-1]))
        C = shape[-1]
        nbytes = x.size * 2
        print(f"--- shape {shape}  ({nbytes/1e6:.0f} MB bf16)")

        def two_means(xx, c):
            m = jnp.mean(xx, axis=(0, 1, 2), dtype=jnp.float32)
            s = jnp.mean(jnp.square(xx.astype(jnp.float32)), axis=(0, 1, 2))
            return m, s

        def stack_f32(xx, c):
            xf = xx.astype(jnp.float32)
            b = jnp.mean(jnp.stack([xf, jnp.square(xf)]), axis=(1, 2, 3))
            return b[0], b[1]

        def concat_ch(xx, c):
            cat = jnp.concatenate([xx, xx * xx], axis=-1)
            m = jnp.mean(cat, axis=(0, 1, 2), dtype=jnp.float32)
            return m[:C], m[C:]

        def einsum_form(xx, c):
            xf = xx.reshape(n, C)
            s1 = jnp.sum(xf, axis=0, dtype=jnp.float32)
            s2 = jnp.einsum("nc,nc->c", xf, xf,
                            preferred_element_type=jnp.float32)
            return s1 / n, s2 / n

        def matmul_form(xx, c):
            xf = xx.reshape(n, C)
            ones = jnp.ones((1, n), jnp.bfloat16)
            s1 = (ones @ xf).astype(jnp.float32)[0]
            s2 = jnp.einsum("nc,nc->c", xf, xf,
                            preferred_element_type=jnp.float32)
            return s1 / n, s2 / n

        def elementwise_norm(xx, c):
            # the normalize+relu pass alone (read + write, bf16)
            g = jnp.float32(1.01)
            return jnp.maximum(xx.astype(jnp.float32) * g + c, 0.0).astype(xx.dtype)

        timed("two jnp.mean (current)", scanner(two_means), x, bytes_per_iter=nbytes)
        timed("stack f32 one mean (v3)", scanner(stack_f32), x, bytes_per_iter=nbytes)
        timed("concat-channel bf16", scanner(concat_ch), x, bytes_per_iter=nbytes)
        timed("sum + einsum sumsq", scanner(einsum_form), x, bytes_per_iter=nbytes)
        timed("ones-matmul + einsum", scanner(matmul_form), x, bytes_per_iter=nbytes)
        timed("normalize+relu pass", scanner(elementwise_norm), x,
              bytes_per_iter=2 * nbytes)


if __name__ == "__main__":
    from jckx.utils.device import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must stick despite the
    # axon plugin's import-time platform pin (CLAUDE.md landmine)
    main()

"""Beyond-reference generative metrics: KID and precision/recall/density/
coverage — on-device, in the same feature space FID uses.

The reference's metric engine stops at IS / FID / intra-FID
(/root/reference/metrics.py:97-141). Modern GAN evaluation adds two
complementary views, and both reduce to pairwise feature Gram/distance
matrices — i.e. to matmuls, which is exactly what the MXU is for:

- ``kid``: Kernel Inception Distance (Bińkowski et al. 2018) — the
  unbiased MMD² estimator with the polynomial kernel
  k(x, y) = (γ·xᵀy + c)³, averaged over random subsets. Unlike FID it is
  unbiased at small sample counts and comes with a spread estimate.
- ``manifold_metrics``: improved precision & recall (Kynkäänniemi et al.
  2019) plus density & coverage (Naeem et al. 2020). Manifolds are
  estimated by per-point k-NN radii; a query point is "on the manifold"
  if it falls inside any reference point's radius ball. Precision measures
  fake fidelity, recall measures mode coverage — the failure axes a single
  FID number conflates.

Feature space: jckx feeds these the SAME 100-dim backbone logits that FID
uses (metrics.py extraction path), so all reported metrics share one
extraction per eval. The canonical papers use InceptionV3 pool features;
values here are comparable within-framework, like the reference's
fine-tuned-backbone FID absolutes (PARITY.md Metrics notes).

Memory: all pairwise sweeps are row-chunked (``row_chunk`` × n tiles), so
a 50k×50k distance matrix never materializes — HBM holds one tile.
Everything is f32 on device; the host sees only the final scalars. Tested
against direct-numpy references in tests/test_metrics_extra.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------- KID


@functools.partial(
    jax.jit, static_argnames=("subsets", "subset_size", "degree"))
def _kid_device(real: jax.Array, fake: jax.Array, key: jax.Array,
                subsets: int, subset_size: int, degree: int,
                gamma: float, coef0: float) -> Tuple[jax.Array, jax.Array]:
    """(mean, std) of per-subset unbiased MMD² — ONE device program.

    Each subset draws ``subset_size`` rows from real and fake independently,
    WITHOUT replacement (fresh permutation per subset, the clean-fid /
    torchmetrics convention). The scan keeps all S subset estimates on
    device; the host reads two scalars.
    """
    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)
    m = subset_size

    def kpoly(a, b):
        return (gamma * (a @ b.T) + coef0) ** degree

    def one_subset(_, k):
        kr, kf = jax.random.split(k)
        x = real[jax.random.permutation(kr, real.shape[0])[:m]]
        y = fake[jax.random.permutation(kf, fake.shape[0])[:m]]
        kxx = kpoly(x, x)
        kyy = kpoly(y, y)
        kxy = kpoly(x, y)
        off = 1.0 / (m * (m - 1.0))
        mmd = ((jnp.sum(kxx) - jnp.trace(kxx)) * off
               + (jnp.sum(kyy) - jnp.trace(kyy)) * off
               - 2.0 * jnp.mean(kxy))
        return None, mmd

    _, vals = jax.lax.scan(one_subset, None, jax.random.split(key, subsets))
    return jnp.mean(vals), jnp.std(vals)


def kid(real_features, fake_features, *, subsets: int = 100,
        subset_size: int = 1000, degree: int = 3, gamma: float = None,
        coef0: float = 1.0, seed: int = 0) -> Tuple[float, float]:
    """Kernel Inception Distance → (mean, std) over ``subsets`` subsets.

    ``subset_size`` clamps to the smaller set (with m = the full set the
    estimator is row-order invariant, so every subset yields the identical
    full-set unbiased MMD² — the property the numpy-parity test pins).
    ``gamma`` defaults to 1/feature_dim (sklearn polynomial_kernel /
    original KID code).
    """
    real = jnp.asarray(real_features)
    fake = jnp.asarray(fake_features)
    if real.ndim != 2 or fake.ndim != 2 or real.shape[1] != fake.shape[1]:
        raise ValueError(
            f"kid expects (n, d) feature arrays with equal d, got "
            f"{real.shape} vs {fake.shape}")
    m = int(min(subset_size, real.shape[0], fake.shape[0]))
    if m < 2:
        raise ValueError(f"kid needs >= 2 rows per subset, got {m}")
    g = 1.0 / real.shape[1] if gamma is None else float(gamma)
    mean, std = _kid_device(real, fake, jax.random.PRNGKey(seed),
                            int(subsets), m, int(degree), g, float(coef0))
    return float(mean), float(std)


# ------------------------------------------- precision / recall / density /
# ------------------------------------------- coverage (k-NN manifolds)


def _pad_rows(x: jax.Array, chunk: int) -> Tuple[jax.Array, int]:
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])])
    return x, n


def _dists(q: jax.Array, a: jax.Array, a_sq: jax.Array) -> jax.Array:
    """Euclidean distances (c, n) of a query tile against the full set."""
    d2 = (jnp.sum(q * q, axis=1)[:, None] + a_sq[None, :] - 2.0 * (q @ a.T))
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def real_knn_radii(x, k: int = 3, chunk: int = 2048) -> jax.Array:
    """Public wrapper for precomputing a fixed set's k-NN radii once (the
    ``real_radii`` input of manifold_metrics)."""
    x = jnp.asarray(x)
    return _knn_radii(x, k, min(int(chunk), x.shape[0]))


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _knn_radii(x: jax.Array, k: int, chunk: int) -> jax.Array:
    """Per-row distance to the k-th nearest OTHER row of ``x`` (n,).

    Row-chunked: each lax.map step forms one (chunk, n) tile and top_k's
    it; the self-distance (0) occupies rank 0, so the k-th neighbour is
    rank k of the ascending order = top_k(k+1) of the negated tile.
    """
    x = x.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=1)
    xp, n = _pad_rows(x, chunk)

    def tile(q):
        d = _dists(q, x, x_sq)
        neg_small, _ = jax.lax.top_k(-d, k + 1)
        return -neg_small[:, k]

    r = jax.lax.map(tile, xp.reshape(-1, chunk, x.shape[1]))
    return r.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _manifold_sweep(q: jax.Array, a: jax.Array, radii_a: jax.Array,
                    chunk: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """For every query row: (hit count, any hit, min distance) against the
    manifold {ball(a_i, radii_a[i])} — one row-chunked device program
    serving precision (any), density (count), and coverage (min)."""
    q = q.astype(jnp.float32)
    a = a.astype(jnp.float32)
    a_sq = jnp.sum(a * a, axis=1)
    qp, n = _pad_rows(q, chunk)

    def tile(qt):
        d = _dists(qt, a, a_sq)
        hit = d <= radii_a[None, :]
        return (jnp.sum(hit, axis=1), jnp.any(hit, axis=1), jnp.min(d, axis=1))

    cnt, anyhit, dmin = jax.lax.map(tile, qp.reshape(-1, chunk, q.shape[1]))
    flat = lambda v: v.reshape(-1)[:n]  # noqa: E731 — local reshaper
    return flat(cnt), flat(anyhit), flat(dmin)


def manifold_metrics(real_features, fake_features, *, k: int = 3,
                     row_chunk: int = 2048,
                     real_radii=None) -> Dict[str, float]:
    """Improved precision/recall + density/coverage of fake vs real.

    - precision: fraction of fakes inside ≥1 real k-NN ball (fidelity)
    - recall:    fraction of reals inside ≥1 fake k-NN ball (mode coverage)
    - density:   mean real-ball membership count per fake, ÷k (≥0, can
                 exceed 1; robust to real outliers inflating precision)
    - coverage:  fraction of reals whose NEAREST fake lies within their own
                 k-NN ball (robust recall analog)

    ``row_chunk`` bounds HBM at chunk×n per tile; results are chunk-size
    invariant (pinned in tests).

    ``real_radii``: precomputed k-NN radii of the real set (n_real,) — the
    real manifold never changes across a run's evals, so callers scoring
    many fake sets against one real set (Metrics.prdc) compute the
    n_real×n_real sweep once and pass it in; must correspond to this k.
    """
    real = jnp.asarray(real_features)
    fake = jnp.asarray(fake_features)
    if real.ndim != 2 or fake.ndim != 2 or real.shape[1] != fake.shape[1]:
        raise ValueError(
            f"manifold_metrics expects (n, d) feature arrays with equal d, "
            f"got {real.shape} vs {fake.shape}")
    if min(real.shape[0], fake.shape[0]) <= k:
        raise ValueError(
            f"manifold_metrics needs > k={k} rows in each set, got "
            f"{real.shape[0]} real / {fake.shape[0]} fake")
    chunk = int(row_chunk)
    c_r = min(chunk, real.shape[0])
    c_f = min(chunk, fake.shape[0])
    radii_r = (jnp.asarray(real_radii) if real_radii is not None
               else real_knn_radii(real, k, c_r))
    radii_f = _knn_radii(fake, k, c_f)
    f_cnt, f_any, _ = _manifold_sweep(fake, real, radii_r, c_f)
    _, r_any, r_dmin = _manifold_sweep(real, fake, radii_f, c_r)
    return {
        "precision": float(jnp.mean(f_any.astype(jnp.float32))),
        "recall": float(jnp.mean(r_any.astype(jnp.float32))),
        "density": float(jnp.mean(f_cnt.astype(jnp.float32)) / k),
        "coverage": float(jnp.mean((r_dmin <= radii_r).astype(jnp.float32))),
    }


# ----------------------------------------------------- numpy references
# (kept next to the device code so the parity contract is explicit; the
# tests import these rather than re-deriving the math)


def kid_numpy_full(real: np.ndarray, fake: np.ndarray, degree: int = 3,
                   gamma: float = None, coef0: float = 1.0) -> float:
    """Full-set unbiased MMD² (the m = n case every subset reduces to)."""
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)
    g = 1.0 / real.shape[1] if gamma is None else gamma

    def kpoly(a, b):
        return (g * (a @ b.T) + coef0) ** degree

    kxx, kyy, kxy = kpoly(real, real), kpoly(fake, fake), kpoly(real, fake)
    m, n = real.shape[0], fake.shape[0]
    return ((kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
            - 2.0 * kxy.mean())


def manifold_metrics_numpy(real: np.ndarray, fake: np.ndarray,
                           k: int = 3) -> Dict[str, float]:
    """Direct O(n²) PRDC (Kynkäänniemi eq. 1-2, Naeem eq. 3-4)."""
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)

    def dmat(a, b):
        d2 = ((a * a).sum(1)[:, None] + (b * b).sum(1)[None, :]
              - 2.0 * (a @ b.T))
        return np.sqrt(np.maximum(d2, 0.0))

    def radii(x):
        return np.sort(dmat(x, x), axis=1)[:, k]  # rank 0 is self

    r_r, r_f = radii(real), radii(fake)
    d_fr = dmat(fake, real)  # (n_f, n_r)
    hit = d_fr <= r_r[None, :]
    return {
        "precision": float(hit.any(axis=1).mean()),
        "recall": float((d_fr.T <= r_f[None, :]).any(axis=1).mean()),
        "density": float(hit.sum(axis=1).mean() / k),
        "coverage": float((d_fr.min(axis=0) <= r_r).mean()),
    }

"""InceptionV3 in JAX — the FID/IS metric backbone.

The reference builds torchvision's ``inception_v3`` with ``aux_logits``
disabled and the classifier replaced by ``Linear(2048, 100)``, then loads a
CIFAR-100 fine-tuned checkpoint (metrics.py:46-52; trained offline in
inceptionnet.ipynb). FID values are only comparable across frameworks with
the SAME backbone, so this module:

1. re-implements the torchvision InceptionV3 inference graph exactly
   (stem → 3×InceptionA → InceptionB → 4×InceptionC → InceptionD →
   2×InceptionE → global-avg-pool → fc), NHWC, eval-mode BN (running
   stats, eps=1e-3), ``transform_input=False``, no aux head;
2. provides ``convert_torch_state_dict`` so the reference's fine-tuned
   ``loss_bset.pt`` drops in unchanged (layout transposed OIHW→HWIO);
3. provides a seeded ``init`` for environments without the checkpoint —
   metrics are then self-consistent (relative comparisons, best-metric
   checkpointing) though not comparable to reference absolute values.

All convs run on the MXU in the requested compute dtype; BN folding
(scale/shift precomputed from running stats) keeps eval inference one
multiply-add per conv output.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from jckx.ops.conv import conv2d

# (name, out_channels, kernel, stride, padding) for the stem
_STEM = [
    ("Conv2d_1a_3x3", 32, (3, 3), 2, 0),
    ("Conv2d_2a_3x3", 32, (3, 3), 1, 0),
    ("Conv2d_2b_3x3", 64, (3, 3), 1, 1),
    ("maxpool1",),
    ("Conv2d_3b_1x1", 80, (1, 1), 1, 0),
    ("Conv2d_4a_3x3", 192, (3, 3), 1, 0),
    ("maxpool2",),
]


def _max_pool(x, window=3, stride=2, padding=0):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def _avg_pool_3x3_s1_p1(x):
    """torch avg_pool2d(3, stride=1, padding=1) with count_include_pad=True
    (the InceptionA/C/E pool-branch op): sum window / 9 everywhere."""
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    return s / 9.0


# --------------------------------------------------------------- unit: conv+bn

def _bconv_init(rng: np.random.RandomState, kh, kw, cin, cout):
    # He-scaled normal, NOT torchvision's 0.1-truncated-normal: torchvision's
    # init law assumes the BN running stats will be TRAINED; with the
    # identity running stats of an untrained fallback backbone the 0.1-std
    # init explodes ~6× per layer (logits ~1e20 ⇒ FID overflow, IS pinned at
    # 1). He init keeps unit-variance activations through the 94-conv eval
    # graph so the seeded random backbone yields sane, discriminative
    # features. Converted checkpoints are untouched by this choice.
    # Host-side numpy: per-layer device RNG calls cost ~0.4 s each through
    # the TPU tunnel (~150 s total); one host pass costs ~0.7 s.
    std = math.sqrt(2.0 / (kh * kw * cin))
    w = rng.standard_normal((kh, kw, cin, cout)).astype(np.float32)
    w = np.clip(w, -2.0, 2.0) * std
    return {
        "w": w,
        "bn_scale": np.ones((cout,), np.float32),
        "bn_bias": np.zeros((cout,), np.float32),
        "bn_mean": np.zeros((cout,), np.float32),
        "bn_var": np.ones((cout,), np.float32),
    }


class _BNCtx:
    """Trace-time context for train-mode BN (fine-tuning). When active,
    each BasicConv2d normalizes by BATCH statistics (torch train-mode
    semantics) and records its updated running stats keyed by the identity
    of its param subdict; ``apply_train`` rebuilds the params tree from
    those records afterwards. Identity keying avoids threading path names
    through every block function; it is sound because the keys are python
    dict objects of the params tree being traced."""

    def __init__(self, momentum: float = 0.1):
        self.momentum = momentum
        self.updates: dict = {}


_bn_ctx: _BNCtx | None = None


def _bconv_apply(p, x, stride=1, padding=0, eps=1e-3):
    """BasicConv2d forward: conv → BN → relu.

    Eval (default): running stats folded to one scale+shift.
    Train (``_bn_ctx`` set): batch stats, running-stat update recorded.
    Stats math in f32 regardless of activation dtype.
    """
    y = conv2d(x, p["w"].astype(x.dtype), stride=stride, padding=padding)
    if _bn_ctx is not None:
        # Fused batch-stat BN + ReLU with a hand-written VJP (ops/norm.py):
        # one moment sweep + one normalize pass forward, one fused reduction
        # sweep + one elementwise pass backward, and no f32 full-tensor
        # residuals — see the perf note in ops/norm.py.
        from jckx.ops.norm import bn_relu_train

        out, mean, var = bn_relu_train(y, p["bn_scale"], p["bn_bias"], eps)
        n = y.size // y.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        mom = _bn_ctx.momentum
        _bn_ctx.updates[id(p)] = (
            (1 - mom) * p["bn_mean"].astype(jnp.float32) + mom * mean,
            (1 - mom) * p["bn_var"].astype(jnp.float32) + mom * unbiased,
        )
        return out
    mean = p["bn_mean"].astype(jnp.float32)
    var = p["bn_var"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps) * p["bn_scale"].astype(jnp.float32)
    shift = p["bn_bias"].astype(jnp.float32) - mean * inv
    y = y.astype(jnp.float32) * inv + shift
    return jnp.maximum(y, 0.0).astype(x.dtype)


def _bconv_1a_s2d(p, x, eps=1e-3):
    """Space-to-depth form of Conv2d_1a_3x3 (eval graph, ``fast_stem``).

    The 299² stride-2 stem conv contracts only 3·3·3 = 27 terms per output
    — far too shallow for the MXU's 128-deep reduction, so XLA lowers it
    with its small-channel emitter and the stem costs ~24% of the eval
    launch (tools/profiling/eval_forward_trace.py). Re-laying the input as
    (H/2)² × 4C (2×2 pixel blocks → channels) and the kernel as a 2×2
    stride-1 conv over 4C=12 input channels (phantom taps zero-filled)
    computes the SAME function with a 48-deep contraction and no strided
    access: out(i,j) reads input rows 2i..2i+2 = s2d rows i..i+1.

    Exact in exact arithmetic (every original tap appears exactly once;
    extra taps multiply zeros); bf16/f32 summation ORDER differs, so
    outputs match to rounding, not bit-exactly — which is why this is a
    flag (default OFF: metric absolutes must not drift silently).
    """
    n, h, w_, c = x.shape
    pad = h % 2
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0))) if pad else x
    hp = (h + pad) // 2
    y = (xp.reshape(n, hp, 2, hp, 2, c)
         .transpose(0, 1, 3, 2, 4, 5)
         .reshape(n, hp, hp, 4 * c))
    w = p["w"].astype(x.dtype)                      # (3, 3, C, O)
    w4 = jnp.zeros((4, 4, c, w.shape[-1]), w.dtype).at[:3, :3].set(w)
    # (di, dj, c, o) with di = 2u + bi → (u, v, (bi, bj, c), o), matching
    # the (bi, bj, c) channel packing of the s2d input
    w2 = (w4.reshape(2, 2, 2, 2, c, -1)
          .transpose(0, 2, 1, 3, 4, 5)
          .reshape(2, 2, 4 * c, -1))
    out = conv2d(y, w2, stride=1, padding=0)
    mean = p["bn_mean"].astype(jnp.float32)
    var = p["bn_var"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps) * p["bn_scale"].astype(jnp.float32)
    shift = p["bn_bias"].astype(jnp.float32) - mean * inv
    out = out.astype(jnp.float32) * inv + shift
    return jnp.maximum(out, 0.0).astype(x.dtype)


# ------------------------------------------------------------- block configs

_INCEPTION_A = [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64)]
_INCEPTION_C = [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)]


def init(seed=0, num_classes: int = 100) -> Dict:
    """Seeded parameter pytree with torchvision's layer names.

    ``seed``: int (preferred) or a jax PRNG key (host-read — avoid on the
    remote-TPU path, where a single device→host read can block for minutes).
    Weights are drawn host-side (numpy): per-layer device RNG calls and even
    per-leaf device_puts are ~0.4 s each through the TPU tunnel.
    """
    if not isinstance(seed, int):
        seed = int(np.asarray(jax.random.key_data(seed)).ravel()[-1]) % (2**31 - 1)
    rng = np.random.RandomState(seed)
    p: Dict = {}

    cin = 3
    for spec in _STEM:
        if len(spec) == 1:
            continue
        name, cout, (kh, kw), _, _ = spec
        p[name] = _bconv_init(rng, kh, kw, cin, cout)
        cin = cout

    # InceptionA: 1x1(64) | 5x5: 48→64 | 3x3dbl: 64→96→96 | pool→pf
    for name, cin_a, pf in _INCEPTION_A:
        p[name] = {
            "branch1x1": _bconv_init(rng, 1, 1, cin_a, 64),
            "branch5x5_1": _bconv_init(rng, 1, 1, cin_a, 48),
            "branch5x5_2": _bconv_init(rng, 5, 5, 48, 64),
            "branch3x3dbl_1": _bconv_init(rng, 1, 1, cin_a, 64),
            "branch3x3dbl_2": _bconv_init(rng, 3, 3, 64, 96),
            "branch3x3dbl_3": _bconv_init(rng, 3, 3, 96, 96),
            "branch_pool": _bconv_init(rng, 1, 1, cin_a, pf),
        }

    # InceptionB (Mixed_6a), cin 288
    p["Mixed_6a"] = {
        "branch3x3": _bconv_init(rng, 3, 3, 288, 384),
        "branch3x3dbl_1": _bconv_init(rng, 1, 1, 288, 64),
        "branch3x3dbl_2": _bconv_init(rng, 3, 3, 64, 96),
        "branch3x3dbl_3": _bconv_init(rng, 3, 3, 96, 96),
    }

    # InceptionC, cin 768, channels_7x7 = c
    for name, c in _INCEPTION_C:
        p[name] = {
            "branch1x1": _bconv_init(rng, 1, 1, 768, 192),
            "branch7x7_1": _bconv_init(rng, 1, 1, 768, c),
            "branch7x7_2": _bconv_init(rng, 1, 7, c, c),
            "branch7x7_3": _bconv_init(rng, 7, 1, c, 192),
            "branch7x7dbl_1": _bconv_init(rng, 1, 1, 768, c),
            "branch7x7dbl_2": _bconv_init(rng, 7, 1, c, c),
            "branch7x7dbl_3": _bconv_init(rng, 1, 7, c, c),
            "branch7x7dbl_4": _bconv_init(rng, 7, 1, c, c),
            "branch7x7dbl_5": _bconv_init(rng, 1, 7, c, 192),
            "branch_pool": _bconv_init(rng, 1, 1, 768, 192),
        }

    # InceptionD (Mixed_7a), cin 768
    p["Mixed_7a"] = {
        "branch3x3_1": _bconv_init(rng, 1, 1, 768, 192),
        "branch3x3_2": _bconv_init(rng, 3, 3, 192, 320),
        "branch7x7x3_1": _bconv_init(rng, 1, 1, 768, 192),
        "branch7x7x3_2": _bconv_init(rng, 1, 7, 192, 192),
        "branch7x7x3_3": _bconv_init(rng, 7, 1, 192, 192),
        "branch7x7x3_4": _bconv_init(rng, 3, 3, 192, 192),
    }

    # InceptionE (Mixed_7b cin 1280, Mixed_7c cin 2048)
    for name, cin_e in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        p[name] = {
            "branch1x1": _bconv_init(rng, 1, 1, cin_e, 320),
            "branch3x3_1": _bconv_init(rng, 1, 1, cin_e, 384),
            "branch3x3_2a": _bconv_init(rng, 1, 3, 384, 384),
            "branch3x3_2b": _bconv_init(rng, 3, 1, 384, 384),
            "branch3x3dbl_1": _bconv_init(rng, 1, 1, cin_e, 448),
            "branch3x3dbl_2": _bconv_init(rng, 3, 3, 448, 384),
            "branch3x3dbl_3a": _bconv_init(rng, 1, 3, 384, 384),
            "branch3x3dbl_3b": _bconv_init(rng, 3, 1, 384, 384),
            "branch_pool": _bconv_init(rng, 1, 1, cin_e, 192),
        }

    bound = 1.0 / math.sqrt(2048)
    p["fc"] = {
        "w": rng.uniform(-bound, bound, (2048, num_classes)).astype(np.float32),
        "b": np.zeros((num_classes,), np.float32),
    }
    from jckx.utils.transfer import bulk_device_put

    return bulk_device_put(p)  # ONE host→device transfer for ~500 leaves


def _inception_a(p, x):
    b1 = _bconv_apply(p["branch1x1"], x)
    b5 = _bconv_apply(p["branch5x5_2"], _bconv_apply(p["branch5x5_1"], x), padding=2)
    b3 = _bconv_apply(p["branch3x3dbl_1"], x)
    b3 = _bconv_apply(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _bconv_apply(p["branch3x3dbl_3"], b3, padding=1)
    bp = _bconv_apply(p["branch_pool"], _avg_pool_3x3_s1_p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _bconv_apply(p["branch3x3"], x, stride=2)
    bd = _bconv_apply(p["branch3x3dbl_1"], x)
    bd = _bconv_apply(p["branch3x3dbl_2"], bd, padding=1)
    bd = _bconv_apply(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _bconv_apply(p["branch1x1"], x)
    b7 = _bconv_apply(p["branch7x7_1"], x)
    b7 = _bconv_apply(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _bconv_apply(p["branch7x7_3"], b7, padding=(3, 0))
    bd = _bconv_apply(p["branch7x7dbl_1"], x)
    bd = _bconv_apply(p["branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _bconv_apply(p["branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _bconv_apply(p["branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _bconv_apply(p["branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _bconv_apply(p["branch_pool"], _avg_pool_3x3_s1_p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _bconv_apply(p["branch3x3_2"], _bconv_apply(p["branch3x3_1"], x), stride=2)
    b7 = _bconv_apply(p["branch7x7x3_1"], x)
    b7 = _bconv_apply(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _bconv_apply(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _bconv_apply(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x):
    b1 = _bconv_apply(p["branch1x1"], x)
    b3 = _bconv_apply(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [
            _bconv_apply(p["branch3x3_2a"], b3, padding=(0, 1)),
            _bconv_apply(p["branch3x3_2b"], b3, padding=(1, 0)),
        ],
        axis=-1,
    )
    bd = _bconv_apply(p["branch3x3dbl_1"], x)
    bd = _bconv_apply(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate(
        [
            _bconv_apply(p["branch3x3dbl_3a"], bd, padding=(0, 1)),
            _bconv_apply(p["branch3x3dbl_3b"], bd, padding=(1, 0)),
        ],
        axis=-1,
    )
    bp = _bconv_apply(p["branch_pool"], _avg_pool_3x3_s1_p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def apply(params: Dict, x: jax.Array, compute_dtype=jnp.float32,
          fast_stem: bool = False) -> jax.Array:
    """images (N, 299, 299, 3), ImageNet-normalized → logits (N, classes).

    Eval-mode inference graph of torchvision inception_v3 (fc replaced).
    ``fast_stem`` swaps the first conv for its space-to-depth form (same
    function, rounding-level numeric drift — see ``_bconv_1a_s2d``).
    """
    x = x.astype(compute_dtype)
    if fast_stem:
        x = _bconv_1a_s2d(params["Conv2d_1a_3x3"], x)                 # 149
    else:
        x = _bconv_apply(params["Conv2d_1a_3x3"], x, stride=2)        # 149
    x = _bconv_apply(params["Conv2d_2a_3x3"], x)                      # 147
    x = _bconv_apply(params["Conv2d_2b_3x3"], x, padding=1)           # 147
    x = _max_pool(x, 3, 2)                                            # 73
    x = _bconv_apply(params["Conv2d_3b_1x1"], x)                      # 73
    x = _bconv_apply(params["Conv2d_4a_3x3"], x)                      # 71
    x = _max_pool(x, 3, 2)                                            # 35
    for name, _, _ in _INCEPTION_A:
        x = _inception_a(params[name], x)                             # 35, →288
    x = _inception_b(params["Mixed_6a"], x)                           # 17, 768
    for name, _ in _INCEPTION_C:
        x = _inception_c(params[name], x)                             # 17, 768
    x = _inception_d(params["Mixed_7a"], x)                           # 8, 1280
    x = _inception_e(params["Mixed_7b"], x)                           # 8, 2048
    x = _inception_e(params["Mixed_7c"], x)                           # 8, 2048
    x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)                  # GAP
    return x @ params["fc"]["w"] + params["fc"]["b"]


def apply_train(params: Dict, x: jax.Array, dropout_key=None,
                compute_dtype=jnp.float32, momentum: float = 0.1):
    """Train-mode forward for fine-tuning (inceptionnet.ipynb analog):
    batch-stat BN + p=0.5 dropout before fc (torchvision semantics).

    → (logits, params_with_updated_running_stats). Differentiate only the
    logits path; running-stat updates carry no gradient (stop_gradient).
    """
    global _bn_ctx
    _bn_ctx = _BNCtx(momentum)
    try:
        x = x.astype(compute_dtype)
        x = _bconv_apply(params["Conv2d_1a_3x3"], x, stride=2)
        x = _bconv_apply(params["Conv2d_2a_3x3"], x)
        x = _bconv_apply(params["Conv2d_2b_3x3"], x, padding=1)
        x = _max_pool(x, 3, 2)
        x = _bconv_apply(params["Conv2d_3b_1x1"], x)
        x = _bconv_apply(params["Conv2d_4a_3x3"], x)
        x = _max_pool(x, 3, 2)
        for name, _, _ in _INCEPTION_A:
            x = _inception_a(params[name], x)
        x = _inception_b(params["Mixed_6a"], x)
        for name, _ in _INCEPTION_C:
            x = _inception_c(params[name], x)
        x = _inception_d(params["Mixed_7a"], x)
        x = _inception_e(params["Mixed_7b"], x)
        x = _inception_e(params["Mixed_7c"], x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if dropout_key is not None:
            keep = jax.random.bernoulli(dropout_key, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        logits = x @ params["fc"]["w"] + params["fc"]["b"]
        updates = _bn_ctx.updates
    finally:
        _bn_ctx = None

    def rebuild(tree):
        if isinstance(tree, dict):
            if id(tree) in updates:
                m, v = updates[id(tree)]
                new = dict(tree)
                new["bn_mean"] = jax.lax.stop_gradient(m)
                new["bn_var"] = jax.lax.stop_gradient(v)
                return new
            return {k: rebuild(v) for k, v in tree.items()}
        return tree

    return logits, rebuild(params)


# ------------------------------------------------------- torch → jax weights

# Static per-block branch tables (identical names in init() above and in
# torchvision's InceptionA/B/C/D/E modules). The converter used to build a
# full seeded init() just to enumerate these — ~24M host-RNG weights plus a
# ~90 MB device upload for a throwaway template, paid on every backbone load.
_A_BRANCHES = ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
               "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
_C_BRANCHES = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
               "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
               "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
_E_BRANCHES = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
               "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
               "branch3x3dbl_3b", "branch_pool")
_BRANCH_NAMES = {
    **{n: _A_BRANCHES for n, _, _ in _INCEPTION_A},
    "Mixed_6a": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"),
    **{n: _C_BRANCHES for n, _ in _INCEPTION_C},
    "Mixed_7a": ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                 "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"),
    "Mixed_7b": _E_BRANCHES,
    "Mixed_7c": _E_BRANCHES,
}


def convert_torch_state_dict(state_dict) -> Dict:
    """Map a torchvision inception_v3 state_dict (fc replaced by
    ``Sequential(Linear(2048, K))`` as in reference metrics.py:48-50, or a
    plain Linear) onto this module's pytree. Accepts torch tensors or numpy.
    """

    def np_of(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    sd = {k: np_of(v) for k, v in state_dict.items()}
    out: Dict = {}

    def bconv(prefix):
        return {
            "w": np.ascontiguousarray(sd[f"{prefix}.conv.weight"].transpose(2, 3, 1, 0)),
            "bn_scale": sd[f"{prefix}.bn.weight"],
            "bn_bias": sd[f"{prefix}.bn.bias"],
            "bn_mean": sd[f"{prefix}.bn.running_mean"],
            "bn_var": sd[f"{prefix}.bn.running_var"],
        }

    for spec in _STEM:
        if len(spec) > 1:
            out[spec[0]] = bconv(spec[0])

    for block, brs in _BRANCH_NAMES.items():
        out[block] = {br: bconv(f"{block}.{br}") for br in brs}

    if "fc.0.weight" in sd:  # reference's Sequential-wrapped Linear
        w, b = sd["fc.0.weight"], sd["fc.0.bias"]
    else:
        w, b = sd["fc.weight"], sd["fc.bias"]
    out["fc"] = {"w": np.ascontiguousarray(w.T), "b": b}
    from jckx.utils.transfer import bulk_device_put

    return bulk_device_put(out)

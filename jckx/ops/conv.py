"""Convolution primitives, NHWC, MXU-friendly.

Semantics match the reference's PyTorch layers so weights and goldens are
interchangeable (after layout transposition):

- ``conv2d``            == ``nn.Conv2d(k, stride, padding, bias=False)``
                           (model/DCGAN.py:10-28 uses k4 s2 p1 / k4 s1 p0)
- ``conv_transpose2d``  == ``nn.ConvTranspose2d(k, stride, padding, bias=False)``
                           (model/DCGAN.py:42-58 uses k4 s1 p0 / k4 s2 p1)

Layouts:
- activations NHWC (TPU-native),
- conv weights HWIO,
- transpose-conv weights HWOI-as-stored-by-torch, i.e. we store the kernel in
  the shape (kh, kw, in, out) and realize ConvTranspose2d as an
  input-dilated convolution with a spatially flipped kernel — exactly the
  gradient-of-conv identity torch implements in cuDNN.

All convs compute through the MXU; ``preferred_element_type=float32`` keeps
accumulation in f32 even for bfloat16 activations/weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")

_USE_SUBPIXEL = False  # flipped by subpixel_inference; dilated path is default


class subpixel_inference:
    """Trace-time scope that realizes stride-2 ConvTranspose2d as its
    kernel-segregated (sub-pixel) decomposition instead of an input-dilated
    convolution.

    An lhs-dilated conv computes every output position over a window that is
    75% structural zeros (stride 2): 4× the necessary MXU work plus a
    dilated read pattern — and forward-only programs have already been
    observed to pick a catastrophic lowering for it on TPU (see
    kernels/fused_bn_act.py's pallas_inference note). The decomposition
    splits the flipped 4×4 kernel into four 2×2 phase kernels, runs four
    dense stride-1 convs, and interleaves the phase outputs — identical
    math (same dot products, regrouped), no dilation anywhere in the
    program. Exact for the k4/s2/p1 layers the GAN generators use; any
    other (k, stride, padding) falls through to the dilated form.

    Opt-in per program (serving / eval tracing), like pallas_inference:
    equivalence is pinned by tests/test_ops.py, and perf is an A/B on real
    hardware (``bench_serve.py --subpixel 1``) — the training step keeps
    the dilated form, where XLA fuses it well (README roofline notes).
    """

    def __enter__(self):
        global _USE_SUBPIXEL
        self._prev = _USE_SUBPIXEL
        _USE_SUBPIXEL = True
        return self

    def __exit__(self, *exc):
        global _USE_SUBPIXEL
        _USE_SUBPIXEL = self._prev
        return False


# NOTE on precision: convs run in the activation dtype (bf16 on the hot
# path). The TPU MXU accumulates bf16 contractions in f32 internally; only
# the output is rounded to bf16 — the flax-standard policy. We deliberately
# do NOT request an f32 output via preferred_element_type: a widened output
# dtype breaks jax's conv transpose rule under grad-of-grad (the WGAN-GP
# double-backward), which requires operand dtypes to match.


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding=0) -> jax.Array:
    """Cross-correlation, torch Conv2d semantics (bias-free).

    x: (N, H, W, Cin); w: (kh, kw, Cin, Cout).
    ``padding``: int (symmetric) or (pad_h, pad_w) tuple — torch-style, the
    same pad on both sides of each spatial dim (used by InceptionV3's 1×7 /
    7×1 factorized convs).
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    ph, pw = padding
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMS,
    )


def conv_transpose2d(x: jax.Array, w: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """torch ConvTranspose2d(k, stride, padding, bias=False) semantics.

    x: (N, H, W, Cin); w: (kh, kw, Cin, Cout) where Cin is the *input*
    channel count of this transposed layer (torch stores (Cin, Cout, kh, kw)).

    out_size = (in - 1) * stride - 2 * padding + k, realized as a stride-1
    convolution over the stride-dilated input with kernel flipped in H and W
    and pad (k - 1 - padding) on each side.
    """
    k = w.shape[0]
    if (_USE_SUBPIXEL and stride == 2 and padding == 1
            and k == 4 and w.shape[1] == 4):
        return _conv_transpose2d_subpixel_k4s2p1(x, w)
    pad = k - 1 - padding
    w_flipped = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS,
    )


def _conv_transpose2d_subpixel_k4s2p1(
        x: jax.Array, w: jax.Array, preferred_element_type=None) -> jax.Array:
    """Kernel-segregated form of ConvTranspose2d(k=4, s=2, p=1).

    ``preferred_element_type`` passes through to the phase convs — the
    int8 serving path (ops/quant.py) accumulates in int32 through this
    SAME function, so the phase/padding derivation below has exactly one
    home to fix.

    Derivation: with the flipped kernel wf and the dilated input xd
    (xd[2r] = x[r], odd taps zero), output row u = 2i + a only receives
    kernel taps p ≡ a (mod 2); writing p = 2t + a, the contributing input
    row is i + t + a - 1. So output phase (a, b) is a dense 2×2 stride-1
    conv of x with the kernel slice wf[a::2, b::2] and asymmetric padding
    (1-a, a) / (1-b, b); the four HxW phase maps interleave into the 2H×2W
    output. Same multiplies as the dilated form minus the 75% that hit
    structural zeros.
    """
    wf = w[::-1, ::-1, :, :]
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            phases.append(lax.conv_general_dilated(
                x,
                wf[a::2, b::2, :, :],
                window_strides=(1, 1),
                padding=((1 - a, a), (1 - b, b)),
                dimension_numbers=_DIMS,
                preferred_element_type=preferred_element_type,
            ))
    y = jnp.stack(phases, axis=0)  # (a*2+b, N, H, W, C)
    ab, n, h, wd, c = y.shape
    y = y.reshape(2, 2, n, h, wd, c)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5))  # (N, H, a, W, b, C)
    return y.reshape(n, 2 * h, 2 * wd, c)

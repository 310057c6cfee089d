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
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


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

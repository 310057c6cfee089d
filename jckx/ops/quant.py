"""Int8 (W8A8) post-training quantization for the serving generator.

Beyond-reference, TPU-first: the reference (`model/DCGAN.py`, `model/CGAN.py`)
has no inference path at all, let alone a quantized one. On TPU v5e the int8
MXU path has 2× the bf16 peak (197 bf16 TFLOP/s vs 394 int8 TOP/s — the
single-source constants in `jckx/configs.py`) and int8
operands halve HBM traffic, so a quantized sampler can beat the bf16 one on
BOTH rooflines. This module builds an int8×int8→int32 replica of the
generator forward (`jckx/models/dcgan.py:79-95` — the CGAN generator is the
same stack over a concatenated input, `jckx/models/cgan.py:45-59`):

    quantize(act) → int8 ConvTranspose (int32 accum) → dequant →
    BatchNorm(batch stats, f32) + ReLU → … → tanh(f32)

Scheme
- Weights: symmetric per-OUTPUT-channel int8; scale_c = amax_c / 127 over
  each channel's (kh, kw, cin) slice.
- Activations: symmetric per-tensor int8 with STATIC scales calibrated from
  a few float forwards (`calibrate_generator`). Post-ReLU tensors only use
  the non-negative half of the range — 7 effective bits, which is ample for
  a tanh/uint8 image payload.
- Accumulation: int32, bit-exact (4·4·512·127² ≪ 2³¹), then one fused
  f32 dequant multiply per layer.

Why this is safe for THIS architecture: every hidden ConvTranspose output
feeds a batch-stats BatchNorm (train-mode stats always — the reference never
switches its GAN models to eval mode, see models/dcgan.py module docstring).
Batch-stats BN is invariant to any per-channel rescale of its input: scaling
a channel scales its batch mean and std identically and cancels. So the
per-channel *scale* component of weight-quant error is absorbed by the
following BN; only shape error (rounding within a channel) and the final
un-normalized layer's error reach the pixels.

The stride-2 int8 transposed convs use the kernel-segregated (sub-pixel)
decomposition unconditionally: four dense stride-1 convs instead of an
lhs-dilated conv whose window is 75% structural zeros (see
`ops/conv.py:34-54`). In integer arithmetic the two forms are IDENTICAL
(same products, int32-exact regrouping), so unlike the float path there is
no fusion-tolerance caveat — the dense form is pure win for a forward-only
program.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from jckx.kernels.fused_bn_act import bn_act
from jckx.models.dcgan import GANGeometry, Params

_DIMS = ("NHWC", "HWIO", "NHWC")

QuantParams = Dict[str, jax.Array]


# ------------------------------------------------------------- quantizers

def quantize_weight_per_channel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(kh, kw, cin, cout) f32 → (int8 weights, f32 per-cout scales).

    Symmetric: q = round(w / s), s_c = amax_c / 127. A dead (all-zero)
    channel gets s = tiny instead of 0 so the dequant multiply stays finite.
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 with a static (calibrated) scale."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


# --------------------------------------------------- int8 transposed conv

def conv_transpose2d_int8(x: jax.Array, w: jax.Array, stride: int, padding: int) -> jax.Array:
    """Int8 ConvTranspose2d (torch semantics, `ops/conv.py:96-119`) with
    int32 accumulation. x int8 (N,H,W,Cin); w int8 (kh,kw,Cin,Cout).

    k4/s2/p1 (every upsampling layer of the GAN generators) runs as the
    kernel-segregated dense form — int32-exact identical to the dilated
    form, without the 75%-zeros window (`ops/conv.py:122-133` derivation).
    """
    k = w.shape[0]
    if stride == 2 and padding == 1 and k == 4 and w.shape[1] == 4:
        return _convt_int8_subpixel_k4s2p1(x, w)
    pad = k - 1 - padding
    return lax.conv_general_dilated(
        x, w[::-1, ::-1, :, :],
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.int32,
    )


def _convt_int8_subpixel_k4s2p1(x: jax.Array, w: jax.Array) -> jax.Array:
    # one home for the phase/padding derivation: ops/conv.py — this is the
    # same kernel-segregated decomposition with int32 accumulation
    from jckx.ops.conv import _conv_transpose2d_subpixel_k4s2p1

    return _conv_transpose2d_subpixel_k4s2p1(
        x, w, preferred_element_type=jnp.int32)


# ------------------------------------------------------------- calibration

def generator_act_amax(params: Params, z: jax.Array,
                       geo: GANGeometry = GANGeometry(),
                       compute_dtype=jnp.float32) -> jax.Array:
    """One float forward (mirror of `dcgan.generator_apply`) → per-layer
    amax of every ConvTranspose INPUT, stacked (n_up + 1,).

    Jittable; `calibrate_generator` maxes this over a few batches. For the
    CGAN generator pass the concatenated z+one-hot input (the one-hot's 1.0
    is inside every plausible z amax, `models/cgan.py:58`).
    """
    from jckx.ops.conv import conv_transpose2d

    if z.ndim == 2:
        z = z[:, None, None, :]
    x = z.astype(compute_dtype)
    amaxes: List[jax.Array] = []
    for i in range(geo.n_up):
        amaxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        stride, pad = (1, 0) if i == 0 else (2, 1)
        x = conv_transpose2d(x, params[f"convt{i}"].astype(compute_dtype),
                             stride=stride, padding=pad)
        x = bn_act(x, params[f"bn{i}_scale"], params[f"bn{i}_bias"], act="relu")
    amaxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
    return jnp.stack(amaxes)


def calibrate_generator(params: Params, geo: GANGeometry, key: jax.Array,
                        in_dim: int, *, batches: int = 4,
                        batch_size: int = 64,
                        compute_dtype=jnp.float32) -> jax.Array:
    """Static activation scales from `batches` standard-normal probe batches
    (the serving z distribution, `serve.py render_rand`): running max of the
    per-layer amax, → scales (n_up + 1,) = amax / 127.

    `in_dim`: the generator's input channel count (geo.z_dim, or
    z_dim + num_classes for CGAN — calibration then probes with one-hot
    tails so the concat input's range is represented).
    """
    fwd = jax.jit(lambda p, zz: generator_act_amax(p, zz, geo, compute_dtype))
    amax = None
    ncls = in_dim - geo.z_dim
    for b in range(batches):
        k = jax.random.fold_in(key, b)
        z = jax.random.normal(k, (batch_size, geo.z_dim))
        if ncls > 0:
            lab = jax.random.randint(jax.random.fold_in(k, 1), (batch_size,), 0, ncls)
            z = jnp.concatenate([z, jax.nn.one_hot(lab, ncls, dtype=z.dtype)], axis=-1)
        a = fwd(params, z)
        amax = a if amax is None else jnp.maximum(amax, a)
    return jnp.maximum(amax, 1e-12) / 127.0


def quantize_generator(params: Params, act_scales: jax.Array,
                       geo: GANGeometry = GANGeometry()) -> QuantParams:
    """Float generator params + calibrated activation scales → the int8
    serving pytree consumed by `quantized_generator_apply`."""
    act_scales = jnp.asarray(act_scales, jnp.float32)
    if act_scales.shape != (geo.n_up + 1,):
        raise ValueError(
            f"act_scales must have shape ({geo.n_up + 1},) — one per "
            f"ConvTranspose input — got {act_scales.shape}")
    qp: QuantParams = {}
    for i in range(geo.n_up):
        q, ws = quantize_weight_per_channel(params[f"convt{i}"])
        qp[f"convt{i}_q"], qp[f"convt{i}_wscale"] = q, ws
        qp[f"bn{i}_scale"] = jnp.asarray(params[f"bn{i}_scale"], jnp.float32)
        qp[f"bn{i}_bias"] = jnp.asarray(params[f"bn{i}_bias"], jnp.float32)
        qp[f"a{i}_scale"] = act_scales[i]
    q, ws = quantize_weight_per_channel(params["convt_out"])
    qp["convt_out_q"], qp["convt_out_wscale"] = q, ws
    qp[f"a{geo.n_up}_scale"] = act_scales[geo.n_up]
    return qp


# ------------------------------------------------------------ int8 forward

def quantized_generator_apply(qp: QuantParams, z: jax.Array,
                              geo: GANGeometry = GANGeometry()) -> jax.Array:
    """Int8 serving forward: z (N, in_dim) or (N,1,1,in_dim) → images
    (N, S, S, C) in [-1, 1] (f32 tanh, ready for `serve.tanh_to_u8`).

    Layer-for-layer mirror of `dcgan.generator_apply` (models/dcgan.py:79-95)
    with every ConvTranspose contraction int8×int8→int32 on the MXU; BN
    (batch stats) + ReLU and the dequant multiplies stay f32 — XLA fuses
    them into the conv epilogues.
    """
    if z.ndim == 2:
        z = z[:, None, None, :]
    x = z.astype(jnp.float32)
    for i in range(geo.n_up):
        xq = quantize_act(x, qp[f"a{i}_scale"])
        stride, pad = (1, 0) if i == 0 else (2, 1)
        y = conv_transpose2d_int8(xq, qp[f"convt{i}_q"], stride, pad)
        x = y.astype(jnp.float32) * (qp[f"a{i}_scale"] * qp[f"convt{i}_wscale"])
        x = bn_act(x, qp[f"bn{i}_scale"], qp[f"bn{i}_bias"], act="relu")
    xq = quantize_act(x, qp[f"a{geo.n_up}_scale"])
    y = conv_transpose2d_int8(xq, qp["convt_out_q"], stride=2, padding=1)
    x = y.astype(jnp.float32) * (qp[f"a{geo.n_up}_scale"] * qp["convt_out_wscale"])
    return jnp.tanh(x)


# ----------------------------------------------- serving single-source API

_CALIB_SALT = 0x5ca1e


def serving_calibration_key(seed: int) -> jax.Array:
    """The calibration PRNG key GeneratorService derives from its seed.

    Single source: jckx.serve, jckx.export, jckx.evaluate --quant and
    bench_serve.py all quantize through this derivation, so the pytree
    scored by `evaluate --quant int8` IS (bit-for-bit) the one
    `serve --quant int8` serves for the same seed. (A drift here once made
    evaluate calibrate with fold_in(key, salt) while serve used
    PRNGKey(seed + salt) — near-identical scales, but the metric-isolation
    claim was false in the clipping tail.)"""
    return jax.random.PRNGKey(seed + _CALIB_SALT)


def make_sampler(params: Params, geo: GANGeometry, *, quant: str = None,
                 conditional: bool = False, num_classes: int = 100,
                 compute_dtype=jnp.bfloat16, seed: int = 0,
                 calib_batches: int = 4, calib_batch_size: int = 64):
    """→ ``(params_out, apply)`` where ``apply(params, z, onehot_or_None)``
    renders tanh images — the ONE home of the quant-vs-float forward
    dispatch and of the quant path's input convention (one-hot labels
    concatenated onto z along the feature axis, CGAN.py:154-155 semantics).

    ``quant`` None → float forward over the given params (DCGAN or CGAN
    apply per ``conditional``). ``quant='int8'`` → calibrate with
    `serving_calibration_key(seed)` over the serving z(+label) probe
    distribution, quantize, and return the int8 W8A8 forward over the
    quantized pytree. Calibration depends only on (seed, calib_batches,
    calib_batch_size) — callers must NOT couple ``calib_batch_size`` to
    their serving/render batch size, or the scored-pytree == served-pytree
    guarantee (tests/test_quant.py) breaks for other batch sizes. Callers
    that already hold prepared params (e.g. export reusing a service's)
    pass them back through ``apply`` unchanged.
    """
    if quant not in (None, "int8"):
        # '' is rejected too (GeneratorService's original contract):
        # callers holding CLI strings normalize with `args.quant or None`
        raise ValueError(
            f"quant={quant!r}: supported modes are None (float) and 'int8'")
    if quant == "int8":
        scales = calibrate_generator(
            params, geo, serving_calibration_key(seed),
            in_dim=geo.z_dim + (num_classes if conditional else 0),
            batches=calib_batches, batch_size=calib_batch_size,
            compute_dtype=compute_dtype)
        params = quantize_generator(params, scales, geo)

        def apply(p, z, onehot=None):
            if onehot is not None:
                z = jnp.concatenate([z, onehot.astype(z.dtype)], axis=-1)
            return quantized_generator_apply(p, z, geo)
    else:
        from jckx.models import cgan, dcgan

        def apply(p, z, onehot=None):
            if onehot is not None:
                return cgan.cgenerator_apply(p, z, onehot, geo, compute_dtype)
            return dcgan.generator_apply(p, z, geo, compute_dtype)

    return params, apply

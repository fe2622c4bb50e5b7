"""Weight-only-int8 dense layer (Pallas): y = x @ dequant(w_q) + b.

Serving the 894M-parameter semantic predictor (reference
EEG2Video_New/Semantic/eeg_text.py:11-33; models/semantic.py here) is
HBM-bandwidth-bound: each batch streams ~3.6 GB of f32 weights through five
GEMMs whose arithmetic intensity is tiny at serving batch sizes.  Storing
the weights as per-output-column int8 (absmax/127 scales, the standard
weight-only quantization) halves nothing on the MXU — the dequantized tile
is multiplied in bf16 — but cuts the weight bytes 4x, which is the whole
cost.  The reference has no quantized-serving path at all (fp16 at best).

Kernel layout: one grid cell per (M-rows x bn output columns); the int8
weight block (K, bn) dequantizes on the VPU in VMEM and feeds a bf16 MXU
GEMM with f32 accumulation; per-column scale and bias apply as the epilogue.
K and N are zero-padded to tile multiples at quantization time (padded
columns carry zero scale so they die in the epilogue and are sliced off).

Numerics: per-column int8 rounds each weight to ~0.4% of its column's max;
activations cast to bf16 (~0.4% rounding).  Measured end to end on the
894M MLP the output cosine vs the f32 path stays > 0.999
(tests/test_int8_dense.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths) if isinstance(x, np.ndarray) else jnp.pad(x, widths)


def quantize_int8(kernel, bn: int = 512):
    """Per-output-column absmax quantization of a (K, N) dense kernel.

    Returns ``(w_q int8 (Kp, Np), scale f32 (Np,))`` with K padded to the
    int8 sublane tile (32) and N padded to a multiple of ``bn`` (padded
    columns are all-zero with zero scale).
    """
    w = np.asarray(kernel, np.float32)
    absmax = np.abs(w).max(axis=0)
    scale = absmax / 127.0
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    w_q = np.clip(np.rint(w * inv[None, :]), -127, 127).astype(np.int8)
    w_q = _pad_to(_pad_to(w_q, 0, 32), 1, bn)
    scale = _pad_to(scale.astype(np.float32), 0, bn)
    return w_q, scale


def _int8_dense_kernel(x_ref, wq_ref, s_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.bfloat16)
    w = wq_ref[...].astype(jnp.bfloat16)  # int8 values are exact in bf16
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...] + b_ref[...]


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def _int8_dense(x, w_q, scale, bias, bn=512, interpret=False):
    m, k = x.shape
    kp, np_ = w_q.shape
    mp = m + (-m) % 8
    x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    grid = (np_ // bn,)
    out = pl.pallas_call(
        _int8_dense_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, kp), lambda n: (0, 0)),
            pl.BlockSpec((kp, bn), lambda n: (0, n)),
            pl.BlockSpec((1, bn), lambda n: (0, n)),
            pl.BlockSpec((1, bn), lambda n: (0, n)),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda n: (0, n)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:m]


def int8_dense(x, w_q, scale, bias, n_out: int, bn: int = 512):
    """x (M, K) @ int8 weights -> (M, n_out) f32.

    ``w_q``/``scale`` come from :func:`quantize_int8`; ``bias`` is the
    layer's f32 bias, zero-padded here to the padded column count.
    """
    bias = jnp.pad(jnp.asarray(bias, jnp.float32),
                   (0, w_q.shape[1] - np.shape(bias)[0]))
    interpret = jax.default_backend() != "tpu"
    y = _int8_dense(jnp.asarray(x), w_q, jnp.asarray(scale), bias,
                    bn=bn, interpret=interpret)
    return y[:, :n_out]


def quantize_dense_tree(params, bn: int = 512):
    """Quantize every ``{kernel, bias}`` Dense leaf dict of a param tree.

    Returns a parallel tree of ``(w_q, scale, bias, n_out)`` tuples for
    :func:`int8_dense` (biases stay f32 — they are negligible bytes).
    """
    out = {}
    for name, leaf in params.items():
        if isinstance(leaf, dict) and "kernel" in leaf:
            w_q, scale = quantize_int8(np.asarray(leaf["kernel"]), bn=bn)
            out[name] = (jnp.asarray(w_q), jnp.asarray(scale),
                         jnp.asarray(leaf["bias"], jnp.float32),
                         int(np.shape(leaf["kernel"])[1]))
        elif isinstance(leaf, dict):
            out[name] = quantize_dense_tree(leaf, bn=bn)
        else:
            out[name] = leaf
    return out

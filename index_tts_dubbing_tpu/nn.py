"""Functional neural-net primitives for TPU (JAX).

Design: parameters are plain pytrees (nested dicts of jnp arrays); every layer
is a pure function ``apply(params, x, ...)`` plus an ``init(rng, ...)`` that
mirrors the reference's torch initialisation, so converted torch checkpoints
drop straight in.

Layout conventions (TPU-first — channels on the 128-lane minor dimension):
- activations: ``(B, T, C)`` channels-last everywhere.
- Conv1d kernels: ``(K, Cin/groups, Cout)`` ("WIO"); the checkpoint converter
  transposes from torch's ``(Cout, Cin/groups, K)``.
- Linear kernels: ``(Cin, Cout)``; converter transposes torch's ``(Cout, Cin)``.

Reference parity targets (cited per layer below) are the torch modules in
/root/reference; this file is an independent TPU implementation, not a port.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init helpers (match torch default *distributions*; computed host-side with
# numpy so model bring-up never dispatches hundreds of tiny device ops — on a
# remote TPU link each eager op costs an RPC + compile)
# ---------------------------------------------------------------------------

def _np_rng(rng) -> np.random.Generator:
    seed = np.asarray(jax.random.key_data(rng)).astype(np.uint32).reshape(-1)
    return np.random.default_rng([int(s) for s in seed])


def _uniform(rng, shape, bound):
    return _np_rng(rng).uniform(-bound, bound, size=shape).astype(np.float32)


def normal_init(rng, shape, std: float = 0.02):
    return (_np_rng(rng).standard_normal(size=shape) * std).astype(np.float32)


def linear_init(rng, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    """Kaiming-uniform fan_in init, same distribution as torch nn.Linear."""
    k1, k2 = jax.random.split(rng)
    # torch kaiming_uniform(a=sqrt(5)) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(k1, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_dim,), bound)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:
        # weight-only int8 (utils/quant.py): the int8→x.dtype convert fuses
        # into the dot's operand load, so HBM streams int8; the per-column
        # scale applies to the (much smaller) output.
        y = jnp.dot(x, p["w_q"].astype(x.dtype),
                    preferred_element_type=x.dtype)
        y = y * p["scale"].astype(x.dtype)
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding_init(rng, num: int, dim: int, std: float = 0.02) -> Params:
    return {"w": normal_init(rng, (num, dim), std)}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


# ---------------------------------------------------------------------------
# Convolutions (channels-last, WIO kernels)
# ---------------------------------------------------------------------------

def conv1d_init(rng, in_ch: int, out_ch: int, k: int, groups: int = 1,
                bias: bool = True) -> Params:
    k1, k2 = jax.random.split(rng)
    fan_in = (in_ch // groups) * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(k1, (k, in_ch // groups, out_ch), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_ch,), bound)
    return p


def conv1d(p: Params, x: jnp.ndarray, *, stride: int = 1, dilation: int = 1,
           padding="SAME", groups: int = 1) -> jnp.ndarray:
    """1-D conv over (B, T, C). ``padding``: int (symmetric), (lo, hi), or str."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose1d_init(rng, in_ch: int, out_ch: int, k: int,
                          bias: bool = True) -> Params:
    """torch ConvTranspose1d init: fan_in = out_ch*k (uses weight shape[1]*k)."""
    k1, k2 = jax.random.split(rng)
    fan_in = out_ch * k
    bound = 1.0 / math.sqrt(fan_in)
    # canonical layout (K, Cout, Cin): flipped-kernel conv form below.
    p = {"w": _uniform(k1, (k, out_ch, in_ch), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_ch,), bound)
    return p


def conv_transpose1d(p: Params, x: jnp.ndarray, *, stride: int,
                     padding: int = 0) -> jnp.ndarray:
    """torch-semantics transposed conv: out_len = (T-1)*stride + K - 2*padding.

    Implemented as an input-dilated conv with a flipped kernel (the standard
    identity), which XLA maps efficiently to the MXU.
    """
    k = p["w"].shape[0]
    w = jnp.flip(p["w"], axis=0)            # (K, Cout, Cin)
    w = jnp.transpose(w, (0, 2, 1))         # (K, Cin, Cout) = WIO
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_init(rng, in_ch: int, out_ch: int, kh: int, kw: int,
                bias: bool = True) -> Params:
    k1, k2 = jax.random.split(rng)
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(k1, (kh, kw, in_ch, out_ch), bound)}  # HWIO
    if bias:
        p["b"] = _uniform(k2, (out_ch,), bound)
    return p


def conv2d(p: Params, x: jnp.ndarray, *, stride=(1, 1), padding="VALID") -> jnp.ndarray:
    """2-D conv over (B, H, W, C)."""
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int) -> Params:
    return {"g": np.ones((dim,), np.float32), "b": np.zeros((dim,), np.float32)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def group_norm_init(ch: int) -> Params:
    return {"g": np.ones((ch,), np.float32), "b": np.zeros((ch,), np.float32)}


def group_norm(p: Params, x: jnp.ndarray, groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over (B, T, C) with torch semantics (normalise per group over
    (T, C/groups))."""
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 3), keepdims=True)
    y = ((xf - mu) * lax.rsqrt(var + eps)).reshape(b, t, c)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def batch_norm_init(ch: int) -> Params:
    return {
        "g": np.ones((ch,), np.float32),
        "b": np.zeros((ch,), np.float32),
        "mean": np.zeros((ch,), np.float32),
        "var": np.ones((ch,), np.float32),
    }


def batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batch norm over the channel (last) axis of (B, T, C)."""
    scale = p["g"] * lax.rsqrt(p["var"] + eps)
    shift = p["b"] - p["mean"] * scale
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def rms_norm_init(dim: int) -> Params:
    return {"g": np.ones((dim,), np.float32)}


def rms_norm_l2(p: Params, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize-style RMSNorm used by the perceiver (perceiver.py:167-186):
    out = x / max(||x||_2, eps) * sqrt(dim) * gamma."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    y = xf / jnp.maximum(norm, eps) * math.sqrt(x.shape[-1])
    return (y * p["g"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """gelu_pytorch_tanh / gelu_new: tanh approximation."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + lax.erf(xf / math.sqrt(2.0)))).astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


# ---------------------------------------------------------------------------
# Attention (dense, full-sequence; decode-path attention lives in engine/)
# ---------------------------------------------------------------------------

def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        scale: Optional[float] = None) -> jnp.ndarray:
    """q: (B,H,Tq,D), k/v: (B,H,Tk,D); mask broadcastable to (B,H,Tq,Tk),
    True = attend. Softmax in fp32."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=q.dtype)


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, c = x.shape
    return x.reshape(b, t, heads, c // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True where padded. lengths (B,), out (B, max_len).
    Mirrors utils/common.py:84-107 in the reference."""
    ar = jnp.arange(max_len)[None, :]
    return ar >= lengths[:, None]


def safe_log(x: jnp.ndarray, clip_val: float = 1e-7) -> jnp.ndarray:
    return jnp.log(jnp.clip(x, min=clip_val))

"""Anti-aliased activation ops (BigVGAN's alias-free snake path).

Behavioural spec: the reference's torch path
(BigVGAN/alias_free_torch/{filter,resample,act}.py) and fused CUDA kernel
(alias_free_activation/cuda/anti_alias_activation_cuda.cu:44-181):
  replicate-pad → ×2 upsample 12-tap kaiser-sinc FIR → snake(beta) →
  replicate-pad → 12-tap low-pass FIR → ×2 downsample.

TPU design (this file = XLA path; ops/pallas_snake.py = fused Pallas kernel):
channels-last (B, T, C) activations; the FIR is a depthwise conv expressed via
``lax.conv_general_dilated`` with ``lhs_dilation`` for the upsample (negative
padding folds the reference's output crop into the conv — no separate slice).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def kaiser_beta(A: float) -> float:
    if A > 50.0:
        return 0.1102 * (A - 8.7)
    if A >= 21.0:
        return 0.5842 * (A - 21.0) ** 0.4 + 0.07886 * (A - 21.0)
    return 0.0


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, normalised to sum 1. Matches
    alias_free_torch/filter.py:29-58 (even kernel, half-sample offsets)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4.0 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    beta = kaiser_beta(A)
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


# 2x up/down filters used everywhere in BigVGAN (ratio=2, kernel 12).
UP_FILTER = kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, 12)
DOWN_FILTER = UP_FILTER  # same design parameters


def _replicate_pad_t(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    parts = []
    if lo:
        parts.append(jnp.repeat(x[:, :1], lo, axis=1))
    parts.append(x)
    if hi:
        parts.append(jnp.repeat(x[:, -1:], hi, axis=1))
    return jnp.concatenate(parts, axis=1)


def upsample2(x: jnp.ndarray, filt: np.ndarray = UP_FILTER) -> jnp.ndarray:
    """×2 anti-aliased upsample of (B, T, C) → (B, 2T, C).

    Equivalent to alias_free_torch/resample.py:10-33 (replicate pad 5, 12-tap
    FIR transposed-conv stride 2, crop 15/15, gain 2). Because every channel
    shares the same taps, this is expressed as a 6-tap **polyphase shift-add**
    per output phase — pure broadcast VPU ops, no grouped conv (which XLA
    lowers poorly on TPU).
    """
    b, t, c = x.shape
    k = filt.shape[0]
    pad = k // 2 - 1                          # 5
    xp = _replicate_pad_t(x, pad, pad)        # (B, T+10, C)
    # derivation from y[n] = 2·Σ_k x_p[k]·f[n+15−2k] (crop already folded):
    #   even phase: taps f[11],f[9],f[7],f[5],f[3],f[1] on x_p[t+2 .. t+7]
    #   odd  phase: taps f[10],f[8],f[6],f[4],f[2],f[0] on x_p[t+3 .. t+8]
    even = jnp.zeros_like(x)
    odd = jnp.zeros_like(x)
    for i in range(k // 2):
        even = even + (2.0 * float(filt[k - 1 - 2 * i])) * xp[:, 2 + i: 2 + i + t]
        odd = odd + (2.0 * float(filt[k - 2 - 2 * i])) * xp[:, 3 + i: 3 + i + t]
    y = jnp.stack([even, odd], axis=2).reshape(b, 2 * t, c)
    return y


def downsample2(x: jnp.ndarray, filt: np.ndarray = DOWN_FILTER) -> jnp.ndarray:
    """×2 anti-aliased downsample of (B, 2T, C) → (B, T, C). Matches
    alias_free_torch/filter.py:61-95 (stride-2 12-tap FIR, replicate pad),
    as a polyphase shift-add over the two input phases."""
    b, t, c = x.shape
    k = filt.shape[0]
    pad_left = k // 2 - 1                     # 5
    pad_right = k // 2                        # 6
    xp = _replicate_pad_t(x, pad_left, pad_right)  # (B, 2T+11, C)
    t_out = t // 2
    y = jnp.zeros((b, t_out, c), x.dtype)
    # y[t] = Σ_j f[j]·x_p[2t+j]; split j into even/odd so every term is a
    # stride-2 slice (cheap on TPU)
    xe = xp[:, 0::2]                          # (B, T+6, C)
    xo = xp[:, 1::2]                          # (B, T+5, C)
    for j in range(k // 2):
        y = y + float(filt[2 * j]) * xe[:, j: j + t_out]
        y = y + float(filt[2 * j + 1]) * xo[:, j: j + t_out]
    return y


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    """x + (1/α)·sin²(αx), per-channel α over the last axis.
    Matches BigVGAN/activations.py:9-60."""
    if logscale:
        alpha = jnp.exp(alpha)
    a = alpha.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    y = xf + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(xf * a))
    return y.astype(x.dtype)


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
               logscale: bool) -> jnp.ndarray:
    """x + (1/β)·sin²(αx). Matches BigVGAN/activations.py:63-122."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    a = alpha.astype(jnp.float32)
    bta = beta.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    y = xf + (1.0 / (bta + 1e-9)) * jnp.square(jnp.sin(xf * a))
    return y.astype(x.dtype)


def anti_aliased_activation(x: jnp.ndarray, alpha: jnp.ndarray,
                            beta: jnp.ndarray | None, logscale: bool,
                            use_pallas: bool = False) -> jnp.ndarray:
    """Fused up→snake→down (Activation1d in alias_free_torch/act.py:9-28,
    CUDA kernel .cu:44-181). (B, T, C) → (B, T, C)."""
    if use_pallas:
        from index_tts_dubbing_tpu.ops.pallas_snake import fused_anti_alias_snake
        return fused_anti_alias_snake(x, alpha, beta, logscale)
    y = upsample2(x)
    if beta is None:
        y = snake(y, alpha, logscale)
    else:
        y = snake_beta(y, alpha, beta, logscale)
    return downsample2(y)


def anti_aliased_activation_cmajor(x: jnp.ndarray, alpha: jnp.ndarray,
                                   beta: jnp.ndarray | None, logscale: bool,
                                   use_pallas: bool = True) -> jnp.ndarray:
    """C-major variant: (B, C, T) → (B, C, T) with time in the minor dim.

    The Pallas path (ops/pallas_snake.py:fused_anti_alias_snake_cmajor) puts
    time in the vector lanes — full VPU utilisation at BigVGAN's late stages
    where C = 24..96 ≪ 128 lanes. The XLA fallback transposes to the
    row-major path (bit-identical to it; used on CPU and for diffing)."""
    if use_pallas:
        from index_tts_dubbing_tpu.ops.pallas_snake import (
            fused_anti_alias_snake_cmajor)
        return fused_anti_alias_snake_cmajor(x, alpha, beta, logscale)
    y = anti_aliased_activation(jnp.swapaxes(x, 1, 2), alpha, beta, logscale)
    return jnp.swapaxes(y, 1, 2)

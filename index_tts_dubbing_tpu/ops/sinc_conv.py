"""SincConv (SincNet) band-pass filterbank convolution.

Behavioural spec: the speechbrain-style prim vendored by the reference at
indextts/BigVGAN/nnet/CNN.py:23-302 (class SincConv). Learnable per-filter
low cutoff + bandwidth in Hz; filters are built on the fly as windowed sinc
band-passes and applied as a grouped 1-D convolution. Unused on the
reference's live inference path (ECAPA uses mel input), provided for
API completeness.

TPU notes: the filter build is O(out·k) elementwise — negligible; the conv
is a standard grouped ``lax.conv_general_dilated`` which XLA tiles onto the
MXU for realistic (B, T) raw-audio shapes.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _to_mel(hz: np.ndarray) -> np.ndarray:
    return 2595 * np.log10(1 + np.asarray(hz, np.float64) / 700)


def _to_hz(mel: np.ndarray) -> np.ndarray:
    return 700 * (10 ** (np.asarray(mel, np.float64) / 2595) - 1)


def init(out_channels: int, kernel_size: int, sample_rate: int = 16000,
         min_low_hz: float = 50.0, min_band_hz: float = 50.0) -> Params:
    """Mel-spaced initial cutoffs (CNN.py:229-250). kernel_size must be odd."""
    if kernel_size % 2 == 0:
        raise ValueError("kernel_size must be odd")
    high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
    mel = np.linspace(_to_mel(np.array(min_low_hz)),
                      _to_mel(np.array(high_hz)), out_channels + 1)
    hz = _to_hz(mel)
    return {
        "low_hz": hz[:-1, None].astype(np.float32),
        "band_hz": (hz[1:] - hz[:-1])[:, None].astype(np.float32),
    }


def _filters(p: Params, kernel_size: int, sample_rate: int,
             min_low_hz: float, min_band_hz: float) -> jnp.ndarray:
    """Windowed-sinc band-pass filter bank (out, k) — CNN.py:184-227."""
    half = kernel_size // 2
    # Hamming window over the left half (CNN.py:252-257)
    n_lin = jnp.linspace(0.0, kernel_size / 2 - 1, half)
    window = 0.54 - 0.46 * jnp.cos(2 * math.pi * n_lin / kernel_size)
    # time axis: 2π·[-half..-1]/sr  (CNN.py:259-262)
    n_ = (2 * math.pi * jnp.arange(-half, 0, dtype=jnp.float32)
          / sample_rate)[None, :]

    low = min_low_hz + jnp.abs(p["low_hz"])
    high = jnp.clip(low + min_band_hz + jnp.abs(p["band_hz"]),
                    min_low_hz, sample_rate / 2)
    band = (high - low)[:, 0]
    f_low = low @ n_
    f_high = high @ n_
    left = ((jnp.sin(f_high) - jnp.sin(f_low)) / (n_ / 2)) * window[None, :]
    center = 2 * band[:, None]
    right = jnp.flip(left, axis=1)
    band_pass = jnp.concatenate([left, center, right], axis=1)
    return band_pass / (2 * band[:, None])


def forward(p: Params, x: jnp.ndarray, kernel_size: int,
            sample_rate: int = 16000, stride: int = 1, dilation: int = 1,
            padding: str = "same", padding_mode: str = "reflect",
            min_low_hz: float = 50.0, min_band_hz: float = 50.0
            ) -> jnp.ndarray:
    """x (B, T) or (B, T, Cin) → (B, T', out). Grouped conv, one sinc filter
    bank shared across input channels (CNN.py:113-163)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    cin = x.shape[-1]
    filt = _filters(p, kernel_size, sample_rate, min_low_hz, min_band_hz)
    out_channels = filt.shape[0]
    if out_channels % cin != 0:
        raise ValueError("out_channels must be divisible by in_channels")
    x = jnp.swapaxes(x, 1, 2)                       # (B, C, T)
    if padding == "same":
        # speechbrain's get_padding_elem: stride>1 → k//2 each side;
        # stride=1 → dilation·(k-1)/2 each side
        if stride > 1:
            lo = hi = kernel_size // 2
        else:
            lo = hi = dilation * (kernel_size - 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (lo, hi)),
                    mode="reflect" if padding_mode == "reflect" else "constant")
    elif padding == "causal":
        x = jnp.pad(x, ((0, 0), (0, 0), ((kernel_size - 1) * dilation, 0)))
    elif padding != "valid":
        raise ValueError(f"unknown padding {padding!r}")
    w = jnp.broadcast_to(filt[:, None, :], (out_channels, 1, kernel_size))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,), feature_group_count=cin,
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.swapaxes(y, 1, 2)                    # (B, T', out)

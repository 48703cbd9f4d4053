"""Mel spectrogram frontend in JAX, numerically matching the reference's
torchaudio pipeline (utils/feature_extractors.py:24-50 + config.yaml:5-12):

- 24 kHz, n_fft=1024, hop=256, win=1024, hann (periodic), center reflect pad,
  power=1 (magnitude), HTK mel scale, no filterbank norm, then
  safe_log(clip=1e-7) (utils/common.py:110).

TPU design: the STFT is expressed as frame-gather + rFFT; the mel projection
is a single (F_bins x n_mels) matmul that XLA places on the MXU. Everything is
static-shape given a fixed input length.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic hann, same as torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)).astype(np.float32)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """Triangular HTK-scale filterbank, norm=None — matches
    torchaudio.functional.melscale_fbanks defaults. Returns (n_freqs, n_mels)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)                                   # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]              # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


class MelSpectrogram:
    """Callable mel extractor. Precomputes window + filterbank as numpy
    constants (closed over, so they become XLA constants under jit)."""

    def __init__(self, sample_rate: int = 24000, n_fft: int = 1024,
                 hop_length: int = 256, win_length: int | None = None,
                 n_mels: int = 100, f_min: float = 0.0,
                 f_max: float | None = None, center: bool = True):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length or n_fft
        self.n_mels = n_mels
        self.center = center
        win = hann_window(self.win_length)
        if self.win_length < n_fft:
            lpad = (n_fft - self.win_length) // 2
            win = np.pad(win, (lpad, n_fft - self.win_length - lpad))
        self.window = jnp.asarray(win)
        self.fbank = jnp.asarray(
            mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max))

    def spectrogram(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio (B, T) -> magnitude spectrogram (B, F, frames)."""
        if self.center:
            p = self.n_fft // 2
            audio = jnp.pad(audio, ((0, 0), (p, p)), mode="reflect")
        b, t = audio.shape
        n_frames = 1 + (t - self.n_fft) // self.hop_length
        idx = (np.arange(n_frames)[:, None] * self.hop_length
               + np.arange(self.n_fft)[None, :])
        frames = audio[:, idx]                       # (B, frames, n_fft)
        frames = frames * self.window
        spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
        mag = jnp.abs(spec)                          # (B, frames, F)
        return jnp.transpose(mag, (0, 2, 1))

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio (B, T) or (T,) -> log-mel (B, n_mels, frames)."""
        if audio.ndim == 1:
            audio = audio[None, :]
        mag = self.spectrogram(audio)                # (B, F, frames)
        mel = jnp.einsum("bft,fm->bmt", mag, self.fbank,
                         preferred_element_type=jnp.float32)
        return jnp.log(jnp.clip(mel, min=1e-7))

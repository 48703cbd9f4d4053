"""Windowed streaming vocoder driver.

The reference vocodes variable-length latent chunks (infer.py:439-463), which
on TPU would trigger one XLA compile per length. Here the latent stream is cut
into fixed windows with halo frames on both sides; each window runs through
BigVGAN at one static shape and the halo-corrupted edges are cropped. With a
halo ≥ the generator's total receptive field, the stitched waveform equals the
exact full-sequence computation (convs have finite support; the anti-aliased
snake is pointwise in time apart from its 12-tap FIRs).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.models import bigvgan as bigvgan_model
from index_tts_dubbing_tpu.models import ecapa
from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig

# conservative halo: BigVGAN's receptive field measured in *input* (latent)
# frames. conv_pre(±3) + per-stage dilated convs (k up to 11, dil up to 5 →
# ±25 output-frames, shrinking by the upsample factor when mapped back to
# input frames) + 12-tap FIRs. 32 input frames ≫ the true bound.
DEFAULT_HALO = 32


@partial(jax.jit, static_argnames=("cfg",))
def _vocode_window(params: Dict[str, Any], cfg: BigVGANConfig,
                   latent: jnp.ndarray, spk: jnp.ndarray) -> jnp.ndarray:
    """One fixed-shape window (B, W, gpt_dim) + precomputed speaker embedding
    (B, 1, spk_dim) → wav (B, W·1024)."""
    import index_tts_dubbing_tpu.nn as nn

    x = nn.conv1d(params["conv_pre"], latent, padding=3)
    x = x + nn.conv1d(params["cond_layer"], spk, padding=(0, 0))
    for i in range(cfg.num_upsamples):
        u = cfg.upsample_rates[i]
        k = cfg.upsample_kernel_sizes[i]
        x = nn.conv_transpose1d(params["ups"][i], x, stride=u,
                                padding=(k - u) // 2)
        if cfg.cond_in_each_up_layer:
            x = x + nn.conv1d(params["conds"][i], spk, padding=(0, 0))
        xs = None
        for j in range(cfg.num_kernels):
            rb = params["resblocks"][i * cfg.num_kernels + j]
            y = bigvgan_model._amp_block(cfg, rb, x,
                                         cfg.resblock_kernel_sizes[j],
                                         cfg.resblock_dilation_sizes[j])
            xs = y if xs is None else xs + y
        x = xs / cfg.num_kernels
    x = bigvgan_model._act(cfg, params["act_post"], x)
    x = nn.conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


@partial(jax.jit, static_argnames=())
def speaker_embedding(params: Dict[str, Any], mel_ref: jnp.ndarray) -> jnp.ndarray:
    return ecapa.forward(params["speaker_encoder"], mel_ref)


class WindowedVocoder:
    """Stateless driver: vocode arbitrary-length latents at static shapes."""

    def __init__(self, params: Dict[str, Any], cfg: BigVGANConfig,
                 window: int = 192, halo: int = DEFAULT_HALO):
        self.params = params
        self.cfg = cfg
        self.window = window
        self.halo = halo
        self.upsample = int(np.prod(cfg.upsample_rates))

    def speaker_embedding(self, mel_ref: jnp.ndarray) -> jnp.ndarray:
        return speaker_embedding(self.params, mel_ref)

    def __call__(self, latent: np.ndarray, mel_ref: Optional[np.ndarray] = None,
                 spk: Optional[jnp.ndarray] = None) -> np.ndarray:
        """latent (T, C) or (1, T, C); returns wav (T·1024,) float32,
        bit-equal to the full-sequence forward.

        Windows are *aligned* (clamped inside [0, T]) rather than padded, so
        a window edge is either the true sequence boundary (where the
        network's own padding semantics apply, exactly as in the full
        forward) or sits ≥ halo frames away from every kept output frame.
        Inputs shorter than one window run at their exact shape (jit-cached
        per length; short = rare in practice since chunked latents exceed
        window+2·halo)."""
        latent = np.asarray(latent, np.float32)
        if latent.ndim == 3:
            latent = latent[0]
        t = latent.shape[0]
        if spk is None:
            spk = self.speaker_embedding(jnp.asarray(mel_ref))
        w, h, up = self.window, self.halo, self.upsample
        full = w + 2 * h
        if t <= full:
            wav = np.asarray(_vocode_window(self.params, self.cfg,
                                            jnp.asarray(latent[None]), spk))[0]
            return wav
        out = np.empty(t * up, np.float32)
        start = 0
        while start < t:
            end = min(start + w, t)
            win_lo = min(max(0, start - h), t - full)
            off = start - win_lo
            lat = latent[win_lo: win_lo + full]
            wav = np.asarray(_vocode_window(self.params, self.cfg,
                                            jnp.asarray(lat[None]), spk))[0]
            out[start * up: end * up] = wav[off * up: (off + end - start) * up]
            start = end
        return out

"""BigVGAN training losses: multi-scale mel L1 + GAN components.

Completes the reference's vocoder training capability
(checkpoints/config.yaml:87-88 ``use_multiscale_melloss: true,
lambda_melloss: 15`` with the discriminators of models/bigvgan_disc.py).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from index_tts_dubbing_tpu.models import bigvgan_disc as disc
from index_tts_dubbing_tpu.ops.mel import MelSpectrogram

# multi-scale mel settings (BigVGAN-v2 style: several STFT resolutions)
MULTISCALE_MELS = (
    dict(n_fft=1024, hop_length=256, win_length=1024, n_mels=100),
    dict(n_fft=2048, hop_length=512, win_length=2048, n_mels=100),
    dict(n_fft=512, hop_length=128, win_length=512, n_mels=80),
)


def make_mel_banks(sample_rate: int = 24000):
    return [MelSpectrogram(sample_rate=sample_rate, **cfg)
            for cfg in MULTISCALE_MELS]


def multiscale_mel_loss(banks, wav_real: jnp.ndarray, wav_gen: jnp.ndarray
                        ) -> jnp.ndarray:
    """Σ_scales L1(logmel(y), logmel(ŷ))."""
    loss = 0.0
    for mel in banks:
        loss = loss + jnp.mean(jnp.abs(mel(wav_real) - mel(wav_gen)))
    return loss / len(banks)


def generator_total_loss(mpd_params, mrd_params, banks, wav_real, wav_gen,
                         lambda_mel: float = 15.0
                         ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Generator-side loss: LSGAN adversarial + feature matching (both
    discriminator families) + λ·multi-scale mel (models.py losses +
    config.yaml:87-88)."""
    _, gs_p, frs_p, fgs_p = disc.mpd_forward(mpd_params, wav_real, wav_gen)
    _, gs_r, frs_r, fgs_r = disc.mrd_forward(mrd_params, wav_real, wav_gen)
    adv_p, _ = disc.generator_loss(gs_p)
    adv_r, _ = disc.generator_loss(gs_r)
    fm = disc.feature_loss(frs_p, fgs_p) + disc.feature_loss(frs_r, fgs_r)
    mel = multiscale_mel_loss(banks, wav_real, wav_gen)
    total = adv_p + adv_r + fm + lambda_mel * mel
    return total, {"adv_mpd": adv_p, "adv_mrd": adv_r, "feature": fm,
                   "mel": mel}


def discriminator_total_loss(mpd_params, mrd_params, wav_real, wav_gen
                             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    wav_gen = jax.lax.stop_gradient(wav_gen)
    rs_p, gs_p, _, _ = disc.mpd_forward(mpd_params, wav_real, wav_gen)
    rs_r, gs_r, _, _ = disc.mrd_forward(mrd_params, wav_real, wav_gen)
    lp, _, _ = disc.discriminator_loss(rs_p, gs_p)
    lr, _, _ = disc.discriminator_loss(rs_r, gs_r)
    return lp + lr, {"mpd": lp, "mrd": lr}

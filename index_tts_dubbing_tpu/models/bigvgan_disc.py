"""BigVGAN training-side discriminators and GAN losses.

Behavioural spec: BigVGAN/models.py:278-451 — multi-period discriminator
(periods 2,3,5,7,11, 2D convs over period-folded audio) and multi-resolution
STFT discriminator (resolutions (1024,120,600)/(2048,240,1200)/(512,50,240)),
plus feature-matching / LSGAN losses. Inference never touches these; they
complete the training capability (SURVEY §2.1).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn
from index_tts_dubbing_tpu.ops.mel import hann_window  # noqa: F401  (kept for parity tooling)

Params = Dict[str, Any]

LRELU_SLOPE = 0.1
MPD_PERIODS = (2, 3, 5, 7, 11)
MRD_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


# --- DiscriminatorP (period) ------------------------------------------------

_P_CHANNELS = (32, 128, 512, 1024, 1024)


def disc_p_forward(p: Params, wav: jnp.ndarray, period: int
                   ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """wav (B, T) → (score (B, N), feature maps). models.py:293-312."""
    b, t = wav.shape
    if t % period != 0:
        pad = period - t % period
        wav = jnp.concatenate([wav, wav[:, t - pad:][:, ::-1]], axis=1)  # reflect
        t = t + pad
    x = wav.reshape(b, t // period, period, 1)  # NHWC (H=time, W=period)
    fmap = []
    for i, conv in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        padding = ((2, 2), (0, 0))
        x = nn.conv2d(conv, x, stride=stride, padding=padding)
        x = _lrelu(x)
        fmap.append(x)
    x = nn.conv2d(p["post"], x, stride=(1, 1), padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(b, -1), fmap


def init_disc_p(rng, kernel_size: int = 5, mult: int = 1) -> Params:
    keys = iter(jax.random.split(rng, 8))
    chans = [1] + [int(c * mult) for c in _P_CHANNELS]
    return {
        "convs": [nn.conv2d_init(next(keys), chans[i], chans[i + 1],
                                 kernel_size, 1) for i in range(5)],
        "post": nn.conv2d_init(next(keys), chans[-1], 1, 3, 1),
    }


# --- DiscriminatorR (resolution) --------------------------------------------

def _stft_mag(wav: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """Center=False magnitude STFT after (n_fft−hop)/2 reflect padding
    (models.py:381-389)."""
    pad = (n_fft - hop) // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    # reference passes no window to torch.stft → rectangular window of
    # win_length, zero-padded to n_fft (models.py:385)
    window = jnp.ones((win,), jnp.float32)
    if win < n_fft:
        lp = (n_fft - win) // 2
        window = jnp.pad(window, (lp, n_fft - win - lp))
    t = wav.shape[1]
    n_frames = 1 + (t - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
    frames = wav[:, idx] * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.abs(spec).transpose(0, 2, 1)  # (B, F, frames)


def disc_r_forward(p: Params, wav: jnp.ndarray,
                   resolution: Sequence[int]
                   ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    n_fft, hop, win = resolution
    mag = _stft_mag(wav, n_fft, hop, win)
    x = mag[..., None]  # (B, F, T, 1) NHWC
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [((1, 1), (4, 4))] * 4 + [((1, 1), (1, 1))]
    for conv, s, pad in zip(p["convs"], strides, pads):
        x = _lrelu(nn.conv2d(conv, x, stride=s, padding=pad))
        fmap.append(x)
    x = nn.conv2d(p["post"], x, stride=(1, 1), padding=((1, 1), (1, 1)))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init_disc_r(rng, mult: int = 1) -> Params:
    keys = iter(jax.random.split(rng, 8))
    ch = int(32 * mult)
    kernels = [(3, 9)] + [(3, 9)] * 3 + [(3, 3)]
    p = {"convs": [], "post": None}
    cin = 1
    for kh, kw in kernels:
        p["convs"].append(nn.conv2d_init(next(keys), cin, ch, kh, kw))
        cin = ch
    p["post"] = nn.conv2d_init(next(keys), ch, 1, 3, 3)
    return p


# --- Multi-discriminator wrappers + losses ----------------------------------

def init_mpd(rng, mult: int = 1) -> Params:
    keys = jax.random.split(rng, len(MPD_PERIODS))
    return {"discs": [init_disc_p(k, mult=mult) for k in keys]}


def init_mrd(rng, mult: int = 1) -> Params:
    keys = jax.random.split(rng, len(MRD_RESOLUTIONS))
    return {"discs": [init_disc_r(k, mult=mult) for k in keys]}


def mpd_forward(p: Params, y: jnp.ndarray, y_hat: jnp.ndarray):
    rs, gs, frs, fgs = [], [], [], []
    for d, period in zip(p["discs"], MPD_PERIODS):
        r, fr = disc_p_forward(d, y, period)
        g, fg = disc_p_forward(d, y_hat, period)
        rs.append(r); gs.append(g); frs.append(fr); fgs.append(fg)
    return rs, gs, frs, fgs


def mrd_forward(p: Params, y: jnp.ndarray, y_hat: jnp.ndarray):
    rs, gs, frs, fgs = [], [], [], []
    for d, res in zip(p["discs"], MRD_RESOLUTIONS):
        r, fr = disc_r_forward(d, y, res)
        g, fg = disc_r_forward(d, y_hat, res)
        rs.append(r); gs.append(g); frs.append(fr); fgs.append(fg)
    return rs, gs, frs, fgs


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """models.py:420-426."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(real_outs, gen_outs):
    """LSGAN discriminator loss (models.py:429-440)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outs, gen_outs):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg ** 2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(gen_outs):
    """models.py:443-451."""
    loss = 0.0
    gen_losses = []
    for dg in gen_outs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses

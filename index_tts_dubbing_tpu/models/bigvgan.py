"""BigVGAN2 generator in JAX (channels-last, TPU-first).

Behavioural spec: BigVGAN/models.py:130-260 (IndexTTS-1.5 live vocoder):
gpt-latent (B, T, 1024) → conv_pre(k7) → +speaker-cond → 6 transposed-conv
upsample stages (4,4,4,4,2,2 = ×1024 total) each with per-stage speaker-cond
add and 3 anti-aliased-snake AMP resblocks (k=3,7,11; dilations 1,3,5) →
snakebeta post-activation → conv_post(k7) → tanh → (B, T·1024) waveform.

TPU design: all convs channels-last on the lane axis; the anti-aliased snake
runs through ops/alias_free.py (XLA path) or the fused Pallas kernel; weight
norm is folded at conversion (no runtime re-normalisation).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn
from index_tts_dubbing_tpu.models import ecapa
from index_tts_dubbing_tpu.ops.alias_free import anti_aliased_activation

Params = Dict[str, Any]


@dataclass(frozen=True)
class BigVGANConfig:
    gpt_dim: int = 1024
    upsample_initial_channel: int = 1536
    upsample_rates: Sequence[int] = (4, 4, 4, 4, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    num_mels: int = 100
    speaker_embedding_dim: int = 512
    activation: str = "snakebeta"
    snake_logscale: bool = True
    cond_in_each_up_layer: bool = True
    use_pallas: bool = False

    @property
    def num_upsamples(self) -> int:
        return len(self.upsample_rates)

    @property
    def num_kernels(self) -> int:
        return len(self.resblock_kernel_sizes)

    def stage_channels(self, i: int) -> int:
        return self.upsample_initial_channel // (2 ** (i + 1))


def _act(cfg: BigVGANConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    beta = p.get("beta") if cfg.activation == "snakebeta" else None
    return anti_aliased_activation(x, p["alpha"], beta, cfg.snake_logscale,
                                   use_pallas=cfg.use_pallas)


def _amp_block(cfg: BigVGANConfig, p: Params, x: jnp.ndarray, k: int,
               dilations: Sequence[int]) -> jnp.ndarray:
    """AMPBlock1 (models.py:20-74): 3× [act → dilated conv → act → conv] with
    residual adds."""
    acts1, acts2 = p["acts"][::2], p["acts"][1::2]
    for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], acts1, acts2, dilations):
        xt = _act(cfg, a1, x)
        xt = nn.conv1d(c1, xt, dilation=d, padding=(k * d - d) // 2)
        xt = _act(cfg, a2, xt)
        xt = nn.conv1d(c2, xt, dilation=1, padding=(k - 1) // 2)
        x = xt + x
    return x


def forward(params: Params, cfg: BigVGANConfig, latent: jnp.ndarray,
            mel_ref: jnp.ndarray) -> jnp.ndarray:
    """latent (B, T, gpt_dim), mel_ref (B, T_ref, num_mels) → wav (B, T·1024).

    Mirrors BigVGAN.forward (models.py:201-250) minus training-only branches.
    """
    spk = ecapa.forward(params["speaker_encoder"], mel_ref)  # (B, 1, 512)

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
            y = _amp_block(cfg, rb, x, cfg.resblock_kernel_sizes[j],
                           cfg.resblock_dilation_sizes[j])
            xs = y if xs is None else xs + y
        x = xs / cfg.num_kernels

    x = _act(cfg, params["act_post"], x)
    x = nn.conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_snake(ch: int, cfg: BigVGANConfig) -> Params:
    a = np.zeros((ch,), np.float32) if cfg.snake_logscale else np.ones((ch,), np.float32)
    p = {"alpha": a}
    if cfg.activation == "snakebeta":
        p["beta"] = a
    return p


def init(rng, cfg: BigVGANConfig) -> Params:
    keys = iter(jax.random.split(rng, 256))
    p: Params = {}
    p["conv_pre"] = nn.conv1d_init(next(keys), cfg.gpt_dim,
                                   cfg.upsample_initial_channel, 7)
    p["ups"] = []
    p["resblocks"] = []
    p["conds"] = []
    ch_in = cfg.upsample_initial_channel
    for i in range(cfg.num_upsamples):
        ch_out = cfg.stage_channels(i)
        p["ups"].append(nn.conv_transpose1d_init(
            next(keys), ch_in, ch_out, cfg.upsample_kernel_sizes[i]))
        for j in range(cfg.num_kernels):
            k = cfg.resblock_kernel_sizes[j]
            p["resblocks"].append({
                "convs1": [nn.conv1d_init(next(keys), ch_out, ch_out, k)
                           for _ in range(3)],
                "convs2": [nn.conv1d_init(next(keys), ch_out, ch_out, k)
                           for _ in range(3)],
                "acts": [_init_snake(ch_out, cfg) for _ in range(6)],
            })
        p["conds"].append(nn.conv1d_init(next(keys),
                                         cfg.speaker_embedding_dim, ch_out, 1))
        ch_in = ch_out
    p["act_post"] = _init_snake(ch_in, cfg)
    p["conv_post"] = nn.conv1d_init(next(keys), ch_in, 1, 7)
    p["cond_layer"] = nn.conv1d_init(next(keys), cfg.speaker_embedding_dim,
                                     cfg.upsample_initial_channel, 1)
    p["speaker_encoder"] = ecapa.init(next(keys), cfg.num_mels,
                                      cfg.speaker_embedding_dim)
    return p

"""DiscreteVAE speech codec: defines the 8192-code mel-token space.

Behavioural spec: vqvae/xtts_dvae.py (DiscreteVAE:201-395, Quantize:51-129)
with the IndexTTS config (config.yaml:39-49): 100 mel channels, 8192 tokens,
512-d codebook, 2 stride-2 conv layers (4 mel frames per code), 3 resblocks,
nearest-upsample decoder (use_transposed_convs: false), ReLU.

Used offline for tokenisation/debugging in the reference (infer.py:61-73);
here it additionally powers the training-data pipeline. Training-side EMA
codebook updates are provided as a pure function (the torch version's
in-place EMA + optional all_reduce, xtts_dvae.py:103-116, becomes a
psum-over-``data`` when run under a mesh).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn

Params = Dict[str, Any]


@dataclass(frozen=True)
class DVAEConfig:
    channels: int = 100
    num_tokens: int = 8192
    hidden_dim: int = 512
    num_resnet_blocks: int = 3
    codebook_dim: int = 512
    num_layers: int = 2
    kernel_size: int = 3
    stride: int = 2


def _res_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """conv3-act-conv3-act-conv1 with residual (xtts_dvae.py:171-183)."""
    h = jax.nn.relu(nn.conv1d(p["c1"], x, padding=1))
    h = jax.nn.relu(nn.conv1d(p["c2"], h, padding=1))
    h = nn.conv1d(p["c3"], h, padding=(0, 0))
    return h + x


def encode(params: Params, cfg: DVAEConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, C_mel) → logits (B, T/4, codebook_dim)."""
    x = mel
    pad = (cfg.kernel_size - 1) // 2
    for layer in params["enc_convs"]:
        x = jax.nn.relu(nn.conv1d(layer, x, stride=cfg.stride, padding=pad))
    for rb in params["enc_res"]:
        x = _res_block(rb, x)
    return nn.conv1d(params["enc_out"], x, padding=(0, 0))


def decode_embeds(params: Params, cfg: DVAEConfig,
                  emb: jnp.ndarray) -> jnp.ndarray:
    """codebook embeds (B, N, D) → mel (B, N·4, C_mel)."""
    x = nn.conv1d(params["dec_in"], emb, padding=(0, 0))
    for rb in params["dec_res"]:
        x = _res_block(rb, x)
    pad = (cfg.kernel_size - 1) // 2
    for layer in params["dec_convs"]:
        # UpsampledConv: nearest ×2 then same conv (xtts_dvae.py:186-196)
        x = jnp.repeat(x, cfg.stride, axis=1)
        x = jax.nn.relu(nn.conv1d(layer, x, padding=pad))
    return nn.conv1d(params["dec_out"], x, padding=(0, 0))


def quantize(params: Params, logits: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest-codebook lookup (Quantize.forward, xtts_dvae.py:86-126).
    Returns (quantized+STE, codes, commitment_loss)."""
    embed = params["codebook"]["embed"]            # (D, n_embed)
    flat = logits.reshape(-1, logits.shape[-1])
    dist = (jnp.sum(flat ** 2, 1, keepdims=True)
            - 2.0 * flat @ embed
            + jnp.sum(embed ** 2, 0, keepdims=True))
    codes = jnp.argmin(dist, axis=1).reshape(logits.shape[:-1])
    quant = embed_code(params, codes)
    diff = jnp.mean((jax.lax.stop_gradient(quant) - logits) ** 2)
    quant = logits + jax.lax.stop_gradient(quant - logits)
    return quant, codes, diff


def embed_code(params: Params, codes: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["codebook"]["embed"].T, codes, axis=0)


def get_codebook_indices(params: Params, cfg: DVAEConfig,
                         mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, C) → codes (B, T/4). (xtts_dvae.py:323-330)."""
    logits = encode(params, cfg, mel)
    _, codes, _ = quantize(params, logits)
    return codes


def decode(params: Params, cfg: DVAEConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (B, N) → mel (B, N·4, C). (xtts_dvae.py:332-351)."""
    return decode_embeds(params, cfg, embed_code(params, codes))


def forward_train(params: Params, cfg: DVAEConfig, mel: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(recon_loss [smooth-l1], commitment_loss, recon). Mirrors
    DiscreteVAE.forward in training mode (xtts_dvae.py:362-382)."""
    logits = encode(params, cfg, mel)
    quant, codes, commitment = quantize(params, logits)
    recon = decode_embeds(params, cfg, quant)
    recon = recon[:, : mel.shape[1]]
    d = recon - mel
    ad = jnp.abs(d)
    recon_loss = jnp.mean(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))
    return recon_loss, commitment, recon


def discretization_loss(soft_onehot: jnp.ndarray, dim: int,
                        expected_variance: float) -> jnp.ndarray:
    """Fit mean code-utilisation to a zero-mean normal PDF
    (DiscretizationLoss, xtts_dvae.py:135-168, without the rolling
    accumulator — stateless form for jit)."""
    axes = tuple(i for i in range(soft_onehot.ndim) if i != dim)
    averaged = jnp.sum(soft_onehot, axis=axes) / jnp.sum(soft_onehot)
    averaged = averaged - jnp.mean(averaged)
    var = expected_variance
    log_prob = (-0.5 * jnp.square(averaged / var)
                - jnp.log(var) - 0.5 * math.log(2 * math.pi))
    return jnp.sum(-log_prob)


class EMAState(NamedTuple):
    cluster_size: jnp.ndarray  # (n_embed,)
    embed_avg: jnp.ndarray     # (D, n_embed)


def ema_update(params: Params, state: EMAState, logits: jnp.ndarray,
               codes: jnp.ndarray, decay: float = 0.99, eps: float = 1e-5,
               axis_name: str | None = None) -> Tuple[Params, EMAState]:
    """EMA codebook update (xtts_dvae.py:103-116). Under shard_map/pjit pass
    ``axis_name='data'`` to psum the statistics — the jax-native analog of
    the reference's torch.distributed.all_reduce (xtts_dvae.py:107-109)."""
    n_embed = state.cluster_size.shape[0]
    flat = logits.reshape(-1, logits.shape[-1])
    onehot = jax.nn.one_hot(codes.reshape(-1), n_embed, dtype=flat.dtype)
    onehot_sum = jnp.sum(onehot, axis=0)
    embed_sum = flat.T @ onehot
    if axis_name is not None:
        onehot_sum = jax.lax.psum(onehot_sum, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    cluster = state.cluster_size * decay + onehot_sum * (1 - decay)
    embed_avg = state.embed_avg * decay + embed_sum * (1 - decay)
    n = jnp.sum(cluster)
    cs = (cluster + eps) / (n + n_embed * eps) * n
    new_embed = embed_avg / cs[None, :]
    new_params = dict(params)
    new_params["codebook"] = {"embed": new_embed}
    return new_params, EMAState(cluster, embed_avg)


def init(rng, cfg: DVAEConfig) -> Params:
    keys = iter(jax.random.split(rng, 32))
    k = cfg.kernel_size
    enc_chans = [cfg.hidden_dim * 2 ** i for i in range(cfg.num_layers)]
    dec_chans = list(reversed(enc_chans))
    enc_io = list(zip([cfg.channels] + enc_chans, enc_chans))
    dec_io = list(zip([dec_chans[0]] + dec_chans, dec_chans))
    inner = dec_chans[0]
    p: Params = {
        "enc_convs": [nn.conv1d_init(next(keys), i, o, k) for i, o in enc_io],
        "enc_res": [{"c1": nn.conv1d_init(next(keys), inner, inner, 3),
                     "c2": nn.conv1d_init(next(keys), inner, inner, 3),
                     "c3": nn.conv1d_init(next(keys), inner, inner, 1)}
                    for _ in range(cfg.num_resnet_blocks)],
        "enc_out": nn.conv1d_init(next(keys), inner, cfg.codebook_dim, 1),
        "dec_in": nn.conv1d_init(next(keys), cfg.codebook_dim, inner, 1),
        "dec_res": [{"c1": nn.conv1d_init(next(keys), inner, inner, 3),
                     "c2": nn.conv1d_init(next(keys), inner, inner, 3),
                     "c3": nn.conv1d_init(next(keys), inner, inner, 1)}
                    for _ in range(cfg.num_resnet_blocks)],
        "dec_convs": [nn.conv1d_init(next(keys), i, o, k) for i, o in dec_io],
        "dec_out": nn.conv1d_init(next(keys), dec_chans[-1], cfg.channels, 1),
        "codebook": {"embed": nn.normal_init(
            next(keys), (cfg.codebook_dim, cfg.num_tokens), std=1.0)},
    }
    return p

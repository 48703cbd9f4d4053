"""Conformer encoder (wenet-style) in JAX — speaker-conditioning frontend.

Behavioural spec: gpt/conformer_encoder.py (BaseEncoder/ConformerEncoder),
gpt/conformer/{attention,embedding,subsampling}.py with the IndexTTS-1.5
config (config.yaml:31-37): 512-d out, 6 blocks, 8 heads, 2048 FFN units,
conv2d2 subsampling, rel-pos MHA **without** rel_shift
(attention.py:305-307), SiLU, no macaron, conv module kernel 15,
normalize_before, dropout 0 (inference).

TPU design: channels-last activations, fp32 softmax, the (T×T) attention and
all convs live on MXU-friendly shapes; masks are computed from lengths with
static max length.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn

Params = Dict[str, Any]


def sinusoidal_pos(max_len: int, d_model: int) -> np.ndarray:
    """wenet PositionalEncoding table (embedding.py:47-54). (max_len, d)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def conv2d_subsample2(p: Params, x: jnp.ndarray, mask: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv2dSubsampling2 (subsampling.py:135-186): Conv2d(1→odim, k3, s2) →
    ReLU → linear over (odim · freq'). x (B, T, F) → (B, T', odim);
    mask (B, T) → (B, T') via [2::2]."""
    h = x[:, :, :, None]                                # (B, T, F, 1) NHWC
    h = nn.conv2d(p["conv"], h, stride=(2, 2), padding="VALID")
    h = jax.nn.relu(h)                                  # (B, T', F', odim)
    b, t2, f2, c = h.shape
    # torch flattens (c, f) with channel-major order: view(b, t, c*f)
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t2, c * f2)
    h = nn.linear(p["out"], h)
    return h, mask[:, 2::2]


def linear_no_subsample(p: Params, x: jnp.ndarray, mask: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LinearNoSubsampling (subsampling.py:35-78): linear + layer norm."""
    h = nn.layer_norm(p["ln"], nn.linear(p["out"], x))
    return h, mask


def conv2d_subsample3(p: Params, x: jnp.ndarray, mask: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv2dSubsampling3 (subsampling.py:81-132): one Conv2d(1→odim, k5,
    s3) → ReLU → linear over (odim · (F−2)//3). Mask: [:-2:3]."""
    h = x[:, :, :, None]
    h = jax.nn.relu(nn.conv2d(p["conv"], h, stride=(3, 3), padding="VALID"))
    b, t2, f2, c = h.shape
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t2, c * f2)
    h = nn.linear(p["out"], h)
    return h, mask[:, :-2:3]


def conv2d_subsample4(p: Params, x: jnp.ndarray, mask: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv2dSubsampling4 (subsampling.py:189-244): two k3-s2 convs → ×1/4."""
    h = x[:, :, :, None]
    h = jax.nn.relu(nn.conv2d(p["conv0"], h, stride=(2, 2), padding="VALID"))
    h = jax.nn.relu(nn.conv2d(p["conv1"], h, stride=(2, 2), padding="VALID"))
    b, t2, f2, c = h.shape
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t2, c * f2)
    h = nn.linear(p["out"], h)
    return h, mask[:, 2::2][:, 2::2]


def conv2d_subsample6(p: Params, x: jnp.ndarray, mask: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv2dSubsampling6 (subsampling.py:247-297): k3-s2 then k5-s3 → ×1/6."""
    h = x[:, :, :, None]
    h = jax.nn.relu(nn.conv2d(p["conv0"], h, stride=(2, 2), padding="VALID"))
    h = jax.nn.relu(nn.conv2d(p["conv1"], h, stride=(3, 3), padding="VALID"))
    b, t2, f2, c = h.shape
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t2, c * f2)
    h = nn.linear(p["out"], h)
    return h, mask[:, 2::2][:, 4::3]


def conv2d_subsample8(p: Params, x: jnp.ndarray, mask: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv2dSubsampling8 (subsampling.py:300-348): three k3-s2 convs → ×1/8."""
    h = x[:, :, :, None]
    h = jax.nn.relu(nn.conv2d(p["conv0"], h, stride=(2, 2), padding="VALID"))
    h = jax.nn.relu(nn.conv2d(p["conv1"], h, stride=(2, 2), padding="VALID"))
    h = jax.nn.relu(nn.conv2d(p["conv2"], h, stride=(2, 2), padding="VALID"))
    b, t2, f2, c = h.shape
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t2, c * f2)
    h = nn.linear(p["out"], h)
    return h, mask[:, 2::2][:, 2::2][:, 2::2]


def rel_pos_mha(p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray,
                mask: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Transformer-XL style rel-pos MHA, rel_shift disabled
    (attention.py:189-312). mask (B, 1, T) True=keep."""
    b, t, d = x.shape
    dk = d // heads
    q = nn.split_heads(nn.linear(p["q"], x), heads)     # (B,H,T,dk)
    k = nn.split_heads(nn.linear(p["k"], x), heads)
    v = nn.split_heads(nn.linear(p["v"], x), heads)
    pp = nn.split_heads(nn.linear(p["pos"], pos_emb), heads)  # (1,H,T,dk)

    qu = q + p["pos_bias_u"][None, :, None, :]
    qv = q + p["pos_bias_v"][None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhkd->bhqk", qv, jnp.broadcast_to(pp, k.shape),
                    preferred_element_type=jnp.float32)
    scores = (ac + bd) / math.sqrt(dk)
    m = mask[:, None, :, :]                              # (B,1,1,T)
    scores = jnp.where(m, scores, jnp.float32(-jnp.inf))
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(m, attn, 0.0).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=x.dtype)
    return nn.linear(p["out"], nn.merge_heads(out))


def conv_module(p: Params, x: jnp.ndarray, mask_pad: jnp.ndarray,
                kernel: int = 15) -> jnp.ndarray:
    """Conformer conv module (conformer_encoder.py:56-167): pointwise →
    GLU → depthwise k15 → LayerNorm → SiLU → pointwise, with pad masking."""
    keep = mask_pad[:, :, None]                          # (B, T, 1)
    x = jnp.where(keep, x, 0.0)
    x = nn.conv1d(p["pw1"], x, padding=(0, 0))
    a, g = jnp.split(x, 2, axis=-1)                      # GLU over channels
    x = a * jax.nn.sigmoid(g)
    x = nn.conv1d(p["dw"], x, padding=(kernel - 1) // 2, groups=x.shape[-1])
    x = nn.layer_norm(p["ln"], x)
    x = nn.silu(x)
    x = nn.conv1d(p["pw2"], x, padding=(0, 0))
    return jnp.where(keep, x, 0.0)


def encoder_layer(p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray,
                  mask: jnp.ndarray, mask_pad: jnp.ndarray,
                  heads: int) -> jnp.ndarray:
    """ConformerEncoderLayer, normalize_before, no macaron
    (conformer_encoder.py:232-313)."""
    x = x + rel_pos_mha(p["attn"], nn.layer_norm(p["norm_mha"], x),
                        pos_emb, mask, heads)
    x = x + conv_module(p["conv"], nn.layer_norm(p["norm_conv"], x), mask_pad)
    h = nn.layer_norm(p["norm_ff"], x)
    h = nn.linear(p["ff"]["w2"], nn.silu(nn.linear(p["ff"]["w1"], h)))
    x = x + h
    return nn.layer_norm(p["norm_final"], x)


def forward(params: Params, mel: jnp.ndarray, lengths: jnp.ndarray,
            heads: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mel (B, T, n_mels), lengths (B,) → ((B, T', d), keep-mask (B, T')).

    Mirrors BaseEncoder.forward (conformer_encoder.py:400-436).
    """
    t = mel.shape[1]
    keep = ~nn.make_pad_mask(lengths, t)                 # (B, T)
    x, keep = conv2d_subsample2(params["embed"], mel, keep)
    d = x.shape[-1]
    x = x * math.sqrt(d)
    pos_emb = params["pe"][None, :x.shape[1], :].astype(x.dtype)
    mask = keep[:, None, :]                              # (B, 1, T')
    for blk in params["blocks"]:
        x = encoder_layer(blk, x, pos_emb, mask, keep, heads)
    x = nn.layer_norm(params["after_norm"], x)
    return x, keep


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(rng, input_size: int = 100, output_size: int = 512,
         attention_heads: int = 8, linear_units: int = 2048,
         num_blocks: int = 6, cnn_kernel: int = 15,
         max_len: int = 5000) -> Params:
    keys = iter(jax.random.split(rng, num_blocks * 16 + 8))
    d = output_size
    freq_out = (input_size - 1) // 2
    p: Params = {
        "embed": {
            "conv": nn.conv2d_init(next(keys), 1, d, 3, 3),
            "out": nn.linear_init(next(keys), d * freq_out, d),
        },
        "pe": sinusoidal_pos(max_len, d),
        "blocks": [],
        "after_norm": nn.layer_norm_init(d),
    }
    dk = d // attention_heads
    for _ in range(num_blocks):
        xavier = math.sqrt(6.0 / (attention_heads * dk + dk))
        blk = {
            "norm_mha": nn.layer_norm_init(d),
            "attn": {
                "q": nn.linear_init(next(keys), d, d),
                "k": nn.linear_init(next(keys), d, d),
                "v": nn.linear_init(next(keys), d, d),
                "pos": {"w": nn._uniform(next(keys), (d, d),
                                         math.sqrt(6.0 / (2 * d)))},
                "out": nn.linear_init(next(keys), d, d),
                "pos_bias_u": nn._uniform(next(keys), (attention_heads, dk), xavier),
                "pos_bias_v": nn._uniform(next(keys), (attention_heads, dk), xavier),
            },
            "norm_conv": nn.layer_norm_init(d),
            "conv": {
                "pw1": nn.conv1d_init(next(keys), d, 2 * d, 1),
                "dw": nn.conv1d_init(next(keys), d, d, cnn_kernel, groups=d),
                "ln": nn.layer_norm_init(d),
                "pw2": nn.conv1d_init(next(keys), d, d, 1),
            },
            "norm_ff": nn.layer_norm_init(d),
            "ff": {
                "w1": nn.linear_init(next(keys), d, linear_units),
                "w2": nn.linear_init(next(keys), linear_units, d),
            },
            "norm_final": nn.layer_norm_init(d),
        }
        p["blocks"].append(blk)
    return p

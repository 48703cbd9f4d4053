"""Legacy (IndexTTS-1.0) conditioning encoder: Conv1d + tortoise-style QKV
attention blocks over the reference mel.

Behavioural spec: gpt/model.py:210-235 (ConditioningEncoder) +
utils/arch_util.py (AttentionBlock:77, QKVAttentionLegacy:41, GroupNorm32)
+ the reachable slice of utils/xtransformers.py (RelativePositionBias:146-188,
the only live symbol of that vendored file).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn

Params = Dict[str, Any]


def norm_groups(channels: int) -> int:
    """normalization() group choice (arch_util.py:23-37)."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


def relative_position_bucket(rel_pos: jnp.ndarray, num_buckets: int = 32,
                             max_distance: int = 64) -> jnp.ndarray:
    """Non-causal T5-style bucketing (xtransformers.py:157-173)."""
    n = -rel_pos
    num_buckets //= 2
    ret = (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(n < max_exact, n, val_if_large)


def relative_position_bias(p: Params, t: int, scale: float,
                           num_buckets: int = 32,
                           max_distance: int = 64) -> jnp.ndarray:
    """(1, H, T, T) additive bias (xtransformers.py:177-188)."""
    pos = jnp.arange(t)
    rel = pos[None, :] - pos[:, None]
    bucket = relative_position_bucket(rel, num_buckets, max_distance)
    values = jnp.take(p["emb"]["w"], bucket, axis=0)  # (T, T, H)
    return jnp.transpose(values, (2, 0, 1))[None] * scale


def attention_block(p: Params, x: jnp.ndarray, heads: int,
                    rel_pos: Optional[Params] = None) -> jnp.ndarray:
    """Tortoise AttentionBlock (arch_util.py:77-120). x (B, T, C)."""
    c = x.shape[-1]
    h = nn.group_norm(p["norm"], x, groups=norm_groups(c))
    qkv = nn.conv1d(p["qkv"], h, padding=(0, 0))  # (B, T, 3C)
    b, t, _ = qkv.shape
    ch = c // heads
    # legacy layout: width = H * 3 * ch, per-head [q, k, v] chunks
    qkv = qkv.reshape(b, t, heads, 3 * ch).transpose(0, 2, 1, 3)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    w = jnp.einsum("bhtc,bhsc->bhts", q * scale, k * scale,
                   preferred_element_type=jnp.float32)
    if rel_pos is not None:
        w = w + relative_position_bias(rel_pos, t, scale=ch ** 0.5)
    w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
    a = jnp.einsum("bhts,bhsc->bhtc", w, v, preferred_element_type=x.dtype)
    a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
    return x + nn.conv1d(p["proj"], a, padding=(0, 0))


def forward(params: Params, mel: jnp.ndarray, heads: int,
            mean: bool = False) -> jnp.ndarray:
    """mel (B, T, n_mels) → (B, T, C) or (B, C) when mean.
    Mirrors ConditioningEncoder.forward (gpt/model.py:228-235)."""
    x = nn.conv1d(params["init"], mel, padding=(0, 0))
    for blk in params["blocks"]:
        x = attention_block(blk, x, heads, blk.get("rel_pos"))
    if mean:
        return jnp.mean(x, axis=1)
    return x


def init(rng, spec_dim: int = 100, embedding_dim: int = 1024,
         attn_blocks: int = 6, heads: int = 16) -> Params:
    keys = iter(jax.random.split(rng, attn_blocks * 3 + 2))
    p: Params = {"init": nn.conv1d_init(next(keys), spec_dim, embedding_dim, 1),
                 "blocks": []}
    for _ in range(attn_blocks):
        p["blocks"].append({
            "norm": nn.group_norm_init(embedding_dim),
            "qkv": nn.conv1d_init(next(keys), embedding_dim,
                                  embedding_dim * 3, 1),
            "proj": {"w": np.zeros((1, embedding_dim, embedding_dim), np.float32),
                     "b": np.zeros((embedding_dim,), np.float32)},
        })
    return p

"""Perceiver resampler in JAX: compresses variable-length conformer output to
32 latent conditioning vectors.

Behavioural spec: gpt/perceiver.py:224-317 — learned latents cross-attend the
context with **queries included in the KV stream** (perceiver.py:308-310),
GEGLU feed-forward (exact gelu), L2-normalise RMSNorm head, depth 2,
dim_head 64. IndexTTS-1.5: dim=1024, dim_context=512, heads=8, ff_mult=2.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from index_tts_dubbing_tpu import nn

Params = Dict[str, Any]


def _attention(p: Params, latents: jnp.ndarray, ctx: jnp.ndarray,
               mask: Optional[jnp.ndarray], heads: int) -> jnp.ndarray:
    """Cross-attention with queries prepended to context
    (perceiver.py:277-317). mask (B, 32+T) True=keep, aligned to the
    concatenated [latents, ctx] stream."""
    full_ctx = jnp.concatenate([latents, ctx], axis=1)
    q = nn.split_heads(nn.linear(p["to_q"], latents), heads)
    kv = nn.linear(p["to_kv"], full_ctx)
    k, v = jnp.split(kv, 2, axis=-1)
    k = nn.split_heads(k, heads)
    v = nn.split_heads(v, heads)
    m = None if mask is None else mask[:, None, None, :]
    out = nn.mha(q, k, v, mask=m)
    return nn.linear(p["to_out"], nn.merge_heads(out))


def _geglu_ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Linear → GEGLU (exact gelu on gate) → Linear (perceiver.py:204-221)."""
    h = nn.linear(p["w1"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return nn.linear(p["w2"], nn.gelu_exact(gate) * a)


def forward(params: Params, ctx: jnp.ndarray,
            mask: Optional[jnp.ndarray] = None, heads: int = 8) -> jnp.ndarray:
    """ctx (B, T, dim_context), mask (B, 32+T) → (B, num_latents, dim)."""
    b = ctx.shape[0]
    ctx = nn.linear(params["proj_context"], ctx)
    latents = jnp.broadcast_to(params["latents"][None],
                               (b,) + params["latents"].shape).astype(ctx.dtype)
    for layer in params["layers"]:
        latents = _attention(layer["attn"], latents, ctx, mask, heads) + latents
        latents = _geglu_ff(layer["ff"], latents) + latents
    return nn.rms_norm_l2(params["norm"], latents)


def init(rng, dim: int = 1024, dim_context: int = 512, num_latents: int = 32,
         dim_head: int = 64, heads: int = 8, ff_mult: int = 2,
         depth: int = 2) -> Params:
    keys = iter(jax.random.split(rng, depth * 6 + 4))
    inner = dim_head * heads
    ff_inner = int(dim * ff_mult * 2 / 3)
    p: Params = {
        "proj_context": nn.linear_init(next(keys), dim_context, dim),
        "latents": nn.normal_init(next(keys), (num_latents, dim)),
        "layers": [],
        "norm": nn.rms_norm_init(dim),
    }
    for _ in range(depth):
        p["layers"].append({
            "attn": {
                "to_q": nn.linear_init(next(keys), dim, inner, bias=False),
                "to_kv": nn.linear_init(next(keys), dim, inner * 2, bias=False),
                "to_out": nn.linear_init(next(keys), inner, dim, bias=False),
            },
            "ff": {
                "w1": nn.linear_init(next(keys), dim, ff_inner * 2),
                "w2": nn.linear_init(next(keys), ff_inner, dim),
            },
        })
    return p

"""Weight-only int8 quantization for the AR decode path.

Per-output-channel symmetric int8: W ≈ W_q · scale[None, :] with
scale = max|W[:, n]| / 127. Kept weight-only (activations stay bf16/fp32) so
the decode step's HBM weight streaming halves vs bf16 — the decode is
bandwidth/latency-bound, not MXU-bound (docs/PERFORMANCE_NOTES.md).

The quantized form is a drop-in param dict {"w_q": int8 (K, N),
"scale": f32 (N,), "b": ...} recognised by nn.linear; only the GPT trunk's
big matmuls (qkv/proj/fc/proj, mel_head) are converted — layer norms,
biases, embeddings and position tables stay in full precision.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

Params = Dict[str, Any]


def quantize_linear_int8(p: Params) -> Params:
    """{"w": (K, N), "b"?} → {"w_q", "scale", "b"?}. No-op if already
    quantized."""
    if "w_q" in p:
        return p
    w = np.asarray(p["w"], np.float32)
    scale = np.max(np.abs(w), axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    out = {"w_q": w_q, "scale": scale.astype(np.float32)}
    if "b" in p:
        out["b"] = np.asarray(p["b"])
    return out


def quantize_gpt_int8(gpt_params: Params) -> Params:
    """Quantize the trunk matmuls + mel head of a (stacked) UnifiedVoice
    param tree. Returns a new tree; non-matmul leaves are shared."""
    out = dict(gpt_params)
    blocks = gpt_params["blocks"]

    def q_stacked(p):
        # stacked leading (L,) dim: quantize per layer, restack
        w = np.asarray(p["w"], np.float32)
        scale = np.max(np.abs(w), axis=1, keepdims=False) / 127.0   # (L, N)
        scale = np.maximum(scale, 1e-12)
        w_q = np.clip(np.round(w / scale[:, None, :]), -127, 127
                      ).astype(np.int8)
        o = {"w_q": w_q, "scale": scale.astype(np.float32)}
        if "b" in p:
            o["b"] = np.asarray(p["b"])
        return o

    new_blocks = dict(blocks)
    new_blocks["attn"] = {
        "qkv": q_stacked(blocks["attn"]["qkv"]),
        "proj": q_stacked(blocks["attn"]["proj"]),
    }
    new_blocks["mlp"] = {
        "fc": q_stacked(blocks["mlp"]["fc"]),
        "proj": q_stacked(blocks["mlp"]["proj"]),
    }
    out["blocks"] = new_blocks
    out["mel_head"] = quantize_linear_int8(gpt_params["mel_head"])
    return out

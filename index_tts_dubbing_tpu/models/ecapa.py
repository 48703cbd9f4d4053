"""ECAPA-TDNN speaker encoder in JAX (channels-last).

Behavioural spec: BigVGAN/ECAPA_TDNN.py:429-581 with the speechbrain-style
nnet primitives (BigVGAN/nnet/CNN.py Conv1d "same" reflect padding,
normalization.py BatchNorm1d eval mode). Inference-only: batch norms use
running statistics.

TPU design: activations are (B, T, C); every conv is channels-last so the
channel dim sits on the 128-wide lane axis; the whole model is one jit region
inside the vocoder forward.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn

Params = Dict[str, Any]

CHANNELS = [512, 512, 512, 512, 1536]
KERNELS = [5, 3, 3, 3, 1]
DILATIONS = [1, 2, 3, 4, 1]
RES2NET_SCALE = 8
SE_CHANNELS = 128
ATTENTION_CHANNELS = 128


def _same_reflect_pad(x: jnp.ndarray, k: int, dilation: int) -> jnp.ndarray:
    """speechbrain 'same' padding: floor(d*(k-1)/2) on both sides, reflect
    (nnet/CNN.py:519-544 + F.pad reflect)."""
    p = (dilation * (k - 1)) // 2
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect")


def _conv_same(p: Params, x: jnp.ndarray, k: int, dilation: int = 1) -> jnp.ndarray:
    x = _same_reflect_pad(x, k, dilation)
    return nn.conv1d(p, x, dilation=dilation, padding=(0, 0))


def _tdnn_block(p: Params, x: jnp.ndarray, k: int, dilation: int) -> jnp.ndarray:
    """Conv → ReLU → BatchNorm (ECAPA_TDNN.py:79-128)."""
    x = _conv_same(p["conv"], x, k, dilation)
    x = jax.nn.relu(x)
    return nn.batch_norm(p["bn"], x)


def _res2net_block(p: Params, x: jnp.ndarray, scale: int, k: int,
                   dilation: int) -> jnp.ndarray:
    """Hierarchical residual conv over channel chunks (ECAPA_TDNN.py:131-191)."""
    chunks = jnp.split(x, scale, axis=-1)
    ys: List[jnp.ndarray] = [chunks[0]]
    y_prev = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + y_prev
        y_prev = _tdnn_block(p["blocks"][i - 1], inp, k, dilation)
        ys.append(y_prev)
    return jnp.concatenate(ys, axis=-1)


def _se_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-excitation with time-mean context (ECAPA_TDNN.py:194-242)."""
    s = jnp.mean(x, axis=1, keepdims=True)
    s = jax.nn.relu(nn.conv1d(p["conv1"], s, padding=(0, 0)))
    s = jax.nn.sigmoid(nn.conv1d(p["conv2"], s, padding=(0, 0)))
    return s * x


def _se_res2net_block(p: Params, x: jnp.ndarray, k: int, dilation: int) -> jnp.ndarray:
    """TDNN → Res2Net → TDNN → SE + residual (ECAPA_TDNN.py:341-426)."""
    residual = x
    x = _tdnn_block(p["tdnn1"], x, 1, 1)
    x = _res2net_block(p["res2net"], x, RES2NET_SCALE, k, dilation)
    x = _tdnn_block(p["tdnn2"], x, 1, 1)
    x = _se_block(p["se"], x)
    return x + residual


def _asp(p: Params, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Attentive statistics pooling with global context
    (ECAPA_TDNN.py:245-338). x (B, T, C) → (B, 1, 2C)."""
    t = x.shape[1]
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    std = jnp.sqrt(jnp.clip(var, min=eps))
    attn_in = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1)
    a = _tdnn_block(p["tdnn"], attn_in, 1, 1)
    a = nn.conv1d(p["conv"], jnp.tanh(a), padding=(0, 0))
    w = jax.nn.softmax(a.astype(jnp.float32), axis=1).astype(x.dtype)
    mean2 = jnp.sum(w * x, axis=1, keepdims=True)
    var2 = jnp.sum(w * jnp.square(x - mean2), axis=1, keepdims=True)
    std2 = jnp.sqrt(jnp.clip(var2, min=eps))
    return jnp.concatenate([mean2, std2], axis=-1)


def forward(params: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, n_mels) → speaker embedding (B, 1, lin_neurons).

    Mirrors ECAPA_TDNN.forward (ECAPA_TDNN.py:543-581) with lengths=None.
    """
    x = _tdnn_block(params["blocks"][0], mel, KERNELS[0], DILATIONS[0])
    feats = []
    for i in range(1, len(CHANNELS) - 1):
        x = _se_res2net_block(params["blocks"][i], x, KERNELS[i], DILATIONS[i])
        feats.append(x)
    x = jnp.concatenate(feats, axis=-1)
    x = _tdnn_block(params["mfa"], x, KERNELS[-1], DILATIONS[-1])
    x = _asp(params["asp"], x)
    x = nn.batch_norm(params["asp_bn"], x)
    x = nn.conv1d(params["fc"], x, padding=(0, 0))
    return x


def classifier_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity speaker classifier head (ECAPA_TDNN.py:584-656):
    optional (BatchNorm1d → Linear) blocks, then
    normalize(x) · normalize(W)ᵀ. x (B, 1, D) → (B, 1, out). Training-only
    in the reference (never called at inference); provided for parity."""
    for blk in params.get("blocks", []):
        x = nn.batch_norm(blk["bn"], x)
        x = x @ blk["lin"]["w"] + blk["lin"]["b"]
    h = x[:, 0, :]
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    w = params["weight"]
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
    return (h @ w.T)[:, None, :]


def classifier_init(rng, input_size: int, lin_blocks: int = 0,
                    lin_neurons: int = 192, out_neurons: int = 1211) -> Params:
    keys = jax.random.split(rng, lin_blocks + 1)
    p: Params = {"blocks": []}
    d = input_size
    for i in range(lin_blocks):
        limit = float(np.sqrt(6.0 / (d + lin_neurons)))
        p["blocks"].append({
            "bn": nn.batch_norm_init(d),
            "lin": {"w": np.asarray(jax.random.uniform(
                        keys[i], (d, lin_neurons), jnp.float32,
                        -limit, limit)),
                    "b": np.zeros((lin_neurons,), np.float32)},
        })
        d = lin_neurons
    limit = float(np.sqrt(6.0 / (out_neurons + d)))
    p["weight"] = np.asarray(jax.random.uniform(
        keys[-1], (out_neurons, d), jnp.float32, -limit, limit))
    return p


# ---------------------------------------------------------------------------
# init (random weights, used by tests and cold starts)
# ---------------------------------------------------------------------------

def _init_tdnn(rng, cin, cout, k) -> Params:
    k1, _ = jax.random.split(rng)
    return {"conv": nn.conv1d_init(k1, cin, cout, k),
            "bn": nn.batch_norm_init(cout)}


def init(rng, input_size: int = 100, lin_neurons: int = 512) -> Params:
    keys = list(jax.random.split(rng, 16))
    ch = CHANNELS
    p: Params = {"blocks": [None] * (len(ch) - 1)}
    p["blocks"][0] = _init_tdnn(keys[0], input_size, ch[0], KERNELS[0])
    for i in range(1, len(ch) - 1):
        ks = jax.random.split(keys[i], RES2NET_SCALE + 4)
        inner = ch[i] // RES2NET_SCALE
        p["blocks"][i] = {
            "tdnn1": _init_tdnn(ks[0], ch[i - 1], ch[i], 1),
            "res2net": {"blocks": [
                _init_tdnn(ks[1 + j], inner, inner, KERNELS[i])
                for j in range(RES2NET_SCALE - 1)]},
            "tdnn2": _init_tdnn(ks[RES2NET_SCALE], ch[i], ch[i], 1),
            "se": {
                "conv1": nn.conv1d_init(ks[RES2NET_SCALE + 1], ch[i], SE_CHANNELS, 1),
                "conv2": nn.conv1d_init(ks[RES2NET_SCALE + 2], SE_CHANNELS, ch[i], 1),
            },
        }
    p["mfa"] = _init_tdnn(keys[10], ch[-2] * 3, ch[-1], KERNELS[-1])
    p["asp"] = {
        "tdnn": _init_tdnn(keys[11], ch[-1] * 3, ATTENTION_CHANNELS, 1),
        "conv": nn.conv1d_init(keys[12], ATTENTION_CHANNELS, ch[-1], 1),
    }
    p["asp_bn"] = nn.batch_norm_init(ch[-1] * 2)
    p["fc"] = nn.conv1d_init(keys[13], ch[-1] * 2, lin_neurons, 1)
    return p

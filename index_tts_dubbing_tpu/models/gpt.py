"""UnifiedVoice: GPT-2 AR decoder over [cond(32) · text · mel-code] streams.

Behavioural spec: gpt/model.py (UnifiedVoice + the HF GPT-2 trunk it builds at
model.py:253-274: null wpe, learned per-stream position embeddings, fused-qkv
attention, gelu_pytorch_tanh). IndexTTS-1.5 shape: 1024d × 20L × 16H,
12000(+1) text tokens, 8194 mel codes (start 8192, stop 8193).

TPU design: one pure full-sequence forward (training / latent extraction) and
a prefill + single-token decode pair around a **static preallocated KV cache**
(engine/decode.py drives it in a lax.while_loop — replacing HF `generate`).
All sequence shapes static; masks additive fp32.

Note a deliberate parity quirk: at decode, generated mel token j (1-based)
takes mel position j+1 — the reference inherits this off-by-one from
tortoise (model.py:151-155: ind = attention_mask.len - mel_len after the mask
has grown), and checkpoints are trained with it.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn
from index_tts_dubbing_tpu.models import conformer, perceiver

Params = Dict[str, Any]


@dataclass(frozen=True)
class GPTConfig:
    model_dim: int = 1024
    layers: int = 20
    heads: int = 16
    max_mel_tokens: int = 605
    max_text_tokens: int = 402
    number_text_tokens: int = 12000
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    start_text_token: int = 0
    stop_text_token: int = 1
    mel_length_compression: int = 1024
    condition_num_latent: int = 32
    # condition module (config.yaml:31-37)
    cond_output_size: int = 512
    cond_linear_units: int = 2048
    cond_attention_heads: int = 8
    cond_num_blocks: int = 6
    activation: str = "gelu_pytorch_tanh"
    perceiver_mult: int = 2
    # "conformer_perceiver" (v1.5) | "perceiver" (v1.0 legacy encoder)
    condition_type: str = "conformer_perceiver"

    @property
    def max_mel_seq(self) -> int:   # mel stream positions (incl start/stop/cond slot)
        return self.max_mel_tokens + 2 + 1

    @property
    def max_text_seq(self) -> int:
        return self.max_text_tokens + 2

    @property
    def head_dim(self) -> int:
        return self.model_dim // self.heads


# ---------------------------------------------------------------------------
# GPT-2 trunk
#
# Layers are stored STACKED: params["blocks"] is a single pytree whose leaves
# have a leading (layers,) dim, and every trunk function runs a lax.scan over
# it. This keeps the HLO size O(1) in depth (fast XLA compiles) and is the
# idiomatic TPU layout. ``stack_blocks`` converts the per-layer list emitted
# by init()/the checkpoint converter.
# ---------------------------------------------------------------------------


def stack_blocks(params: Params) -> Params:
    """Return params with a list-of-blocks stacked into one leading-dim tree
    (no-op if already stacked)."""
    blocks = params.get("blocks")
    if not isinstance(blocks, (list, tuple)):
        return params

    def _stack(*xs):
        if isinstance(xs[0], np.ndarray):  # host-side: keep off-device
            return np.stack(xs)
        return jnp.stack([jnp.asarray(x) for x in xs])

    out = dict(params)
    out["blocks"] = jax.tree.map(_stack, *blocks)
    return out


def _ensure_stacked(params: Params) -> Params:
    return stack_blocks(params) if isinstance(params.get("blocks"),
                                              (list, tuple)) else params

def _act(cfg: GPTConfig, x):
    return nn.gelu_tanh(x) if "tanh" in cfg.activation or cfg.activation == "gelu_new" else nn.gelu_exact(x)


def _attn_full(p: Params, x: jnp.ndarray, heads: int,
               attn_bias: jnp.ndarray) -> jnp.ndarray:
    """Full-sequence fused-qkv self-attention. attn_bias (B,1,T,T) additive."""
    qkv = nn.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (nn.split_heads(t, heads) for t in (q, k, v))
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + attn_bias
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=x.dtype)
    return nn.linear(p["proj"], nn.merge_heads(out))


def _mlp(cfg: GPTConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return nn.linear(p["proj"], _act(cfg, nn.linear(p["fc"], x)))


def _block_full(cfg: GPTConfig, p: Params, x: jnp.ndarray,
                attn_bias: jnp.ndarray) -> jnp.ndarray:
    x = x + _attn_full(p["attn"], nn.layer_norm(p["ln1"], x), cfg.heads, attn_bias)
    x = x + _mlp(cfg, p["mlp"], nn.layer_norm(p["ln2"], x))
    return x


def causal_bias(t: int, pad_keep: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Additive fp32 attention bias (B or 1, 1, T, T): causal + key padding."""
    c = jnp.tril(jnp.ones((t, t), bool))
    bias = jnp.where(c, 0.0, -1e30)[None, None]
    if pad_keep is not None:
        bias = bias + jnp.where(pad_keep, 0.0, -1e30)[:, None, None, :]
    return bias.astype(jnp.float32)


def trunk_forward(params: Params, cfg: GPTConfig, emb: jnp.ndarray,
                  pad_keep: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full-sequence trunk: embeddings (B,T,C) → hidden after ln_f."""
    params = _ensure_stacked(params)
    bias = causal_bias(emb.shape[1], pad_keep)

    def body(x, blk):
        return _block_full(cfg, blk, x, bias), None

    x, _ = jax.lax.scan(body, emb, params["blocks"])
    return nn.layer_norm(params["ln_f"], x)


# ---------------------------------------------------------------------------
# KV-cache prefill / decode
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, H, S, D)
    v: jnp.ndarray


def init_cache(cfg: GPTConfig, batch: int, max_len: int,
               dtype=jnp.float32) -> KVCache:
    shape = (cfg.layers, batch, cfg.heads, max_len, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def trunk_prefill(params: Params, cfg: GPTConfig, emb: jnp.ndarray,
                  pad_keep: jnp.ndarray, cache: KVCache
                  ) -> Tuple[jnp.ndarray, KVCache]:
    """Run the prefix (B, T0, C), fill cache[:, :, :, :T0], return hidden of
    the last position (B, C) after ln_f."""
    params = _ensure_stacked(params)
    t0 = emb.shape[1]
    bias = causal_bias(t0, pad_keep)
    scale = 1.0 / math.sqrt(cfg.head_dim)

    def body(x, blk):
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (nn.split_heads(t, cfg.heads) for t in (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + bias
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=x.dtype)
        x = x + nn.linear(blk["attn"]["proj"], nn.merge_heads(o))
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
        return x, (k, v)

    x, (k_stack, v_stack) = jax.lax.scan(body, emb, params["blocks"])
    cache = KVCache(
        jax.lax.dynamic_update_slice(cache.k, k_stack.astype(cache.k.dtype),
                                     (0, 0, 0, 0, 0)),
        jax.lax.dynamic_update_slice(cache.v, v_stack.astype(cache.v.dtype),
                                     (0, 0, 0, 0, 0)),
    )
    h_last = nn.layer_norm(params["ln_f"], x[:, -1, :])
    return h_last, cache


def trunk_decode_step(params: Params, cfg: GPTConfig, x: jnp.ndarray,
                      cache: KVCache, pos: jnp.ndarray,
                      key_keep: jnp.ndarray) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step. x (B, C) embedding of the current token; ``pos`` the
    cache slot it occupies; key_keep (B, S) validity mask over cache slots
    (True = attend). Returns hidden (B, C) after ln_f and the updated cache."""
    # NOTE: this step runs inside the decode lax.while_loop. A lax.scan over
    # layers here (scan nested in while_loop) makes this backend's compiler
    # pathologically slow (minutes vs ~17 s unrolled), so the layer loop is
    # deliberately UNROLLED; the stacked param layout is kept (sliced per
    # layer), and prefill/full-forward remain scans.
    params = _ensure_stacked(params)
    kbias = jnp.where(key_keep, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    blocks = params["blocks"]
    k_all, v_all = cache.k, cache.v
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h[:, None, :])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = nn.split_heads(q, cfg.heads)            # (B,H,1,D)
        k = nn.split_heads(k, cfg.heads)
        v = nn.split_heads(v, cfg.heads)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k[None].astype(k_all.dtype), (li, 0, 0, pos, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v[None].astype(v_all.dtype), (li, 0, 0, pos, 0))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_all[li].astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        logits = logits + kbias
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v_all[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        x = x + nn.linear(blk["attn"]["proj"], nn.merge_heads(o)[:, 0, :])
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
    h = nn.layer_norm(params["ln_f"], x)
    return h, KVCache(k_all, v_all)


class SplitCache(NamedTuple):
    """Beam-decode KV cache split into a frozen prefix and a generated
    region (decode.py beam path).

    The prefix [cond·text·start_mel] is IDENTICAL across the nb beams of a
    batch row (it is built once per row and only logically repeated), and it
    is never reordered by the beam machinery — so it is stored ONCE per
    batch row and shared at attention time. Only the generated region (one
    slot per decode step, physically distinct per beam) is reordered on
    beam-ancestry switches. This removes the prefix from the per-step
    reorder traffic entirely and dedups its attention reads nb×.

    Replaces the role of HF `_reorder_cache`'s full-cache gather
    (gpt/model.py:194-207) with a gen-region-only permutation.
    """
    kp: jnp.ndarray  # (L, B,  H, S0, D) prefix keys — frozen after prefill
    vp: jnp.ndarray  # (L, B,  H, S0, D)
    kg: jnp.ndarray  # (L, BN, H, G,  D) generated-region keys (BN = B·nb)
    vg: jnp.ndarray  # (L, BN, H, G,  D)


def init_gen_cache(cfg: GPTConfig, bn: int, gen_len: int,
                   dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shape = (cfg.layers, bn, cfg.heads, gen_len, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def trunk_decode_step_split(params: Params, cfg: GPTConfig, x: jnp.ndarray,
                            cache: SplitCache, slot: jnp.ndarray,
                            keep_p: jnp.ndarray, nb: int
                            ) -> Tuple[jnp.ndarray, SplitCache]:
    """One beam decode step over a SplitCache. x (BN, C) current-token
    embeddings; ``slot`` the gen-region slot this step writes (attention
    covers gen slots <= slot); keep_p (B, S0) prefix validity (shared by a
    row's beams). Returns hidden (BN, C) after ln_f + the updated cache."""
    params = _ensure_stacked(params)
    bn = x.shape[0]
    b = bn // nb
    g_len = cache.kg.shape[3]
    # layer loop unrolled: see trunk_decode_step NOTE (scan-in-while_loop is
    # pathological for this backend's compiler)
    pbias = jnp.where(keep_p, 0.0, -1e30).astype(jnp.float32)  # (B, S0)
    pbias = pbias[:, None, None, :]                            # (B,1,1,S0)
    gbias = jnp.where(jnp.arange(g_len)[None, :] <= slot, 0.0,
                      -1e30).astype(jnp.float32)[:, None, None, :]  # (1,1,1,G)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    blocks = params["blocks"]
    kg_all, vg_all = cache.kg, cache.vg
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)                   # (BN, C)
        q = q.reshape(bn, cfg.heads, cfg.head_dim)             # (BN,H,D)
        k = k.reshape(bn, cfg.heads, cfg.head_dim)
        v = v.reshape(bn, cfg.heads, cfg.head_dim)
        kg_all = jax.lax.dynamic_update_slice(
            kg_all, k[None, :, :, None].astype(kg_all.dtype), (li, 0, 0, slot, 0))
        vg_all = jax.lax.dynamic_update_slice(
            vg_all, v[None, :, :, None].astype(vg_all.dtype), (li, 0, 0, slot, 0))
        # prefix attention: one prefix per batch row, shared by its beams
        qb = q.reshape(b, nb, cfg.heads, cfg.head_dim)
        lp = jnp.einsum("bnhd,bhsd->bnhs", qb,
                        cache.kp[li].astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
        lp = lp + pbias                                        # (B,nb,H,S0)
        lg = jnp.einsum("bhd,bhgd->bhg", q, kg_all[li].astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
        lg = lg.reshape(b, nb, cfg.heads, g_len) + gbias       # (B,nb,H,G)
        logits = jnp.concatenate([lp, lg], axis=-1)            # (B,nb,H,S0+G)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        s0 = cache.kp.shape[3]
        wp, wg = w[..., :s0], w[..., s0:]
        o = jnp.einsum("bnhs,bhsd->bnhd", wp, cache.vp[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        o = o + jnp.einsum("bnhg,bnhgd->bnhd", wg,
                           vg_all[li].astype(x.dtype).reshape(
                               b, nb, cfg.heads, g_len, cfg.head_dim),
                           preferred_element_type=x.dtype)
        o = o.reshape(bn, cfg.heads * cfg.head_dim)
        x = x + nn.linear(blk["attn"]["proj"], o)
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
    h = nn.layer_norm(params["ln_f"], x)
    return h, SplitCache(cache.kp, cache.vp, kg_all, vg_all)


def init_gen_cache_anc(cfg: GPTConfig, b: int, nb: int, gen_len: int,
                       dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gen-region cache in the ANC layout (L, B, H, nb, G, D): heads-major
    so the ancestry-routed attention einsums batch over (b, h) with the
    (nb, G, D) operand block contiguous — no big-tensor transposes (the
    (L, BN, H, G, D) layout costs ~6 ms/step of relayout at B=16·nb=3)."""
    shape = (cfg.layers, b, cfg.heads, nb, gen_len, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def trunk_decode_step_split_anc(params: Params, cfg: GPTConfig,
                                x: jnp.ndarray, cache: SplitCache,
                                slot: jnp.ndarray, keep_p: jnp.ndarray,
                                nb: int, amap: jnp.ndarray
                                ) -> Tuple[jnp.ndarray, SplitCache]:
    """One beam decode step over a SplitCache with ZERO physical reorder:
    beam-ancestry switches never move gen-cache rows; instead ``amap``
    (B, nb, G) int32 maps (logical beam, gen slot) → the physical beam index
    within its row whose cache row holds that slot's K/V. Attention then
    routes through the map: per-slot scores are computed against ALL nb
    physical rows of the row's group and the ancestor's is selected with a
    one-hot einsum; the value contraction applies the same one-hot to the
    probabilities. Extra cost vs the physically-reordered step is only the
    nb× score/value FLOPs (MXU, tiny at nb=3) and a (B, nb, nb, G) one-hot —
    the 2·L·BN·H·G·D cache reorder traffic (the dominant term of the r03
    "split" strategy, 12.4 ms/step at B=16·nb=3) disappears entirely.

    cache.kg/vg use the ANC layout (L, B, H, nb, G, D) — see
    init_gen_cache_anc — so every einsum below is transpose-free: batch
    dims (b, h) lead and the contracted/free (nb, G, D) block is contiguous.

    The current step's write goes to physical row == logical row, so the
    map at ``slot`` is forced to identity here (the selection-time gather in
    decode.py updates it afterwards). Replaces HF `_reorder_cache`
    (reference gpt/model.py:194-207) with pointer bookkeeping.
    """
    params = _ensure_stacked(params)
    bn = x.shape[0]
    b = bn // nb
    g_len = cache.kg.shape[4]
    H, D = cfg.heads, cfg.head_dim
    # logits live in (b, h, n, s) layout throughout
    pbias = jnp.where(keep_p, 0.0, -1e30).astype(jnp.float32)  # (B, S0)
    pbias = pbias[:, None, None, :]                            # (b,1,1,S0)
    gbias = jnp.where(jnp.arange(g_len)[None, :] <= slot, 0.0,
                      -1e30).astype(jnp.float32)[:, None, None, :]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    ident = jnp.broadcast_to(
        jnp.arange(nb, dtype=amap.dtype)[None, :, None], (b, nb, 1))
    amap_eff = jax.lax.dynamic_update_slice(amap, ident, (0, 0, slot))
    anc = (amap_eff[:, :, None, :]
           == jnp.arange(nb, dtype=amap.dtype)[None, None, :, None])
    anc_f = anc.astype(jnp.float32)                 # (B, nb_log, nb_phys, G)
    anc_c = anc.astype(x.dtype)
    blocks = params["blocks"]
    kg_all, vg_all = cache.kg, cache.vg
    # layer loop unrolled: see trunk_decode_step NOTE
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)                   # (BN, C)
        qb = q.reshape(b, nb, H, D)
        k = k.reshape(b, nb, H, D).transpose(0, 2, 1, 3)       # (b,H,nb,D)
        v = v.reshape(b, nb, H, D).transpose(0, 2, 1, 3)
        kg_all = jax.lax.dynamic_update_slice(
            kg_all, k[None, :, :, :, None].astype(kg_all.dtype),
            (li, 0, 0, 0, slot, 0))
        vg_all = jax.lax.dynamic_update_slice(
            vg_all, v[None, :, :, :, None].astype(vg_all.dtype),
            (li, 0, 0, 0, slot, 0))
        lp = jnp.einsum("bnhd,bhsd->bhns", qb,
                        cache.kp[li].astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
        lp = lp + pbias                                        # (b,h,n,S0)
        # scores against every physical row of the group, ancestor selected
        # by the one-hot (the selected term is the identical q·k dot product
        # the physically-reordered step computes)
        kg_b = kg_all[li].astype(q.dtype)                      # (b,H,m,G,D)
        s_all = jnp.einsum("bnhd,bhmgd->bhnmg", qb, kg_b,
                           preferred_element_type=jnp.float32) * scale
        lg = jnp.einsum("bhnmg,bnmg->bhng", s_all, anc_f) + gbias
        logits = jnp.concatenate([lp, lg], axis=-1)            # (b,h,n,S0+G)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        s0 = cache.kp.shape[3]
        wp, wg = w[..., :s0], w[..., s0:]
        o = jnp.einsum("bhns,bhsd->bhnd", wp, cache.vp[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        wgm = wg[:, :, :, None, :] * anc_c[:, None, :, :, :]   # (b,h,n,m,G)
        o = o + jnp.einsum("bhnmg,bhmgd->bhnd", wgm,
                           vg_all[li].astype(x.dtype),
                           preferred_element_type=x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(bn, H * D)         # (bn, C)
        x = x + nn.linear(blk["attn"]["proj"], o)
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
    h = nn.layer_norm(params["ln_f"], x)
    return h, SplitCache(cache.kp, cache.vp, kg_all, vg_all)


def trunk_decode_step_split_anc_bias(params: Params, cfg: GPTConfig,
                                     x: jnp.ndarray, cache: SplitCache,
                                     slot: jnp.ndarray, keep_p: jnp.ndarray,
                                     nb: int, amap: jnp.ndarray
                                     ) -> Tuple[jnp.ndarray, SplitCache]:
    """Ancestry-routed beam step via SELECTION-BY-BIAS: the gen region is
    attended as ONE flattened (nb_phys·G) key axis and the ancestry map is
    applied as a precomputed additive mask — scores of non-ancestor
    (physical row, slot) pairs get -1e30, so softmax zeroes them and the
    value contraction ignores them. Per layer this is exactly the
    no-reorder step's op structure (one gen score dot + one gen value dot,
    no cross-beam selection einsum, no (b,h,n,m,G) mask multiply); the only
    extra work vs the "splitnone" floor is that the gen dots span nb·G
    instead of G keys — the SAME total K/V bytes the old anc step's
    cross-product dots already read, minus its two extra einsum passes per
    layer (the measured +5.3 ms/step residual, PERFORMANCE_NOTES r04).

    Numerics: the unmasked score for (logical beam n, slot g) is the
    identical q·k dot the physically-reordered step computes; masked
    entries contribute exp(-1e30-max) = 0 to the softmax sum and weight-0
    rows to the value dot. Token parity with the "full" HF-faithful gather
    is asserted per-strategy in tests/test_beam.py.
    """
    params = _ensure_stacked(params)
    bn = x.shape[0]
    b = bn // nb
    g_len = cache.kg.shape[4]
    H, D = cfg.heads, cfg.head_dim
    m_flat = nb * g_len
    pbias = jnp.where(keep_p, 0.0, -1e30).astype(jnp.float32)  # (B, S0)
    pbias = pbias[:, None, None, :]                            # (b,1,1,S0)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    ident = jnp.broadcast_to(
        jnp.arange(nb, dtype=amap.dtype)[None, :, None], (b, nb, 1))
    amap_eff = jax.lax.dynamic_update_slice(amap, ident, (0, 0, slot))
    # (b, n_logical, m_phys, G) ancestry + occupancy, flattened m-major to
    # match kg's (b, H, nb, G, D) -> (b, H, nb*G, D) view; computed ONCE per
    # step and reused by all layers as a pure additive bias
    anc = (amap_eff[:, :, None, :]
           == jnp.arange(nb, dtype=amap.dtype)[None, None, :, None])
    occ = (jnp.arange(g_len) <= slot)[None, None, None, :]
    gbias = jnp.where(anc & occ, 0.0, -1e30).astype(jnp.float32)
    gbias = gbias.reshape(b, 1, nb, m_flat)                    # (b,1,n,M)
    blocks = params["blocks"]
    kg_all, vg_all = cache.kg, cache.vg
    # layer loop unrolled: see trunk_decode_step NOTE
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)                   # (BN, C)
        qb = q.reshape(b, nb, H, D)
        k = k.reshape(b, nb, H, D).transpose(0, 2, 1, 3)       # (b,H,nb,D)
        v = v.reshape(b, nb, H, D).transpose(0, 2, 1, 3)
        kg_all = jax.lax.dynamic_update_slice(
            kg_all, k[None, :, :, :, None].astype(kg_all.dtype),
            (li, 0, 0, 0, slot, 0))
        vg_all = jax.lax.dynamic_update_slice(
            vg_all, v[None, :, :, :, None].astype(vg_all.dtype),
            (li, 0, 0, 0, slot, 0))
        lp = jnp.einsum("bnhd,bhsd->bhns", qb,
                        cache.kp[li].astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
        lp = lp + pbias                                        # (b,h,n,S0)
        kg_v = kg_all[li].astype(q.dtype).reshape(b, H, m_flat, D)
        lg = jnp.einsum("bnhd,bhmd->bhnm", qb, kg_v,
                        preferred_element_type=jnp.float32) * scale
        lg = lg + gbias                                        # (b,h,n,M)
        logits = jnp.concatenate([lp, lg], axis=-1)            # (b,h,n,S0+M)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        s0 = cache.kp.shape[3]
        wp, wg = w[..., :s0], w[..., s0:]
        o = jnp.einsum("bhns,bhsd->bhnd", wp, cache.vp[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        vg_v = vg_all[li].astype(x.dtype).reshape(b, H, m_flat, D)
        o = o + jnp.einsum("bhnm,bhmd->bhnd", wg, vg_v,
                           preferred_element_type=x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(bn, H * D)         # (bn, C)
        x = x + nn.linear(blk["attn"]["proj"], o)
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
    h = nn.layer_norm(params["ln_f"], x)
    return h, SplitCache(cache.kp, cache.vp, kg_all, vg_all)


def trunk_decode_step_split_anc_sw(params: Params, cfg: GPTConfig,
                                   x: jnp.ndarray, cache: SplitCache,
                                   slot: jnp.ndarray, keep_p: jnp.ndarray,
                                   nb: int, amap: jnp.ndarray
                                   ) -> Tuple[jnp.ndarray, SplitCache]:
    """The anc step with OCCUPANCY-BOUNDED cross dots: the per-layer gen
    attention (score cross-product + masked value contraction — the anc
    step's measured +5.3 ms/step residual, which spans the FULL G region
    every step regardless of occupancy) runs inside a lax.switch over
    power-of-2 prefix widths {G/4, G/2, G}; the branch is picked by the
    current slot, so early steps touch a quarter of the gen cache instead
    of all of it. Branches only READ the cache (they return the small
    (b,n,h·d) attention output) — unlike the r03 "blocked" reorder whose
    conditionals RETURNED the cache and forced branch-isolation copies.
    Numerics: identical to trunk_decode_step_split_anc (slots > slot are
    -1e30-masked in every branch; the bounded region always covers the
    occupancy). Token-parity with "full" asserted in tests/test_beam.py."""
    params = _ensure_stacked(params)
    bn = x.shape[0]
    b = bn // nb
    g_len = cache.kg.shape[4]
    H, D = cfg.heads, cfg.head_dim
    pbias = jnp.where(keep_p, 0.0, -1e30).astype(jnp.float32)  # (B, S0)
    pbias = pbias[:, None, None, :]                            # (b,1,1,S0)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    ident = jnp.broadcast_to(
        jnp.arange(nb, dtype=amap.dtype)[None, :, None], (b, nb, 1))
    amap_eff = jax.lax.dynamic_update_slice(amap, ident, (0, 0, slot))
    anc = (amap_eff[:, :, None, :]
           == jnp.arange(nb, dtype=amap.dtype)[None, None, :, None])
    anc_f = anc.astype(jnp.float32)                 # (B, n, m, G)
    anc_c = anc.astype(x.dtype)
    # branch widths: quarters of G rounded up to a multiple of 8 (≥ 8)
    w1 = max(8, -(-g_len // 4))
    w2 = max(w1, -(-g_len // 2))
    widths = [w for w in (w1, w2) if w < g_len] + [g_len]
    occ = slot + 1                                  # occupied gen slots
    br = sum((occ > w).astype(jnp.int32) for w in widths[:-1])
    s0 = cache.kp.shape[3]
    blocks = params["blocks"]
    kg_all, vg_all = cache.kg, cache.vg

    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)                   # (BN, C)
        qb = q.reshape(b, nb, H, D)
        k = k.reshape(b, nb, H, D).transpose(0, 2, 1, 3)       # (b,H,nb,D)
        v = v.reshape(b, nb, H, D).transpose(0, 2, 1, 3)
        kg_all = jax.lax.dynamic_update_slice(
            kg_all, k[None, :, :, :, None].astype(kg_all.dtype),
            (li, 0, 0, 0, slot, 0))
        vg_all = jax.lax.dynamic_update_slice(
            vg_all, v[None, :, :, :, None].astype(vg_all.dtype),
            (li, 0, 0, 0, slot, 0))
        lp = jnp.einsum("bnhd,bhsd->bhns", qb,
                        cache.kp[li].astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
        lp = lp + pbias                                        # (b,h,n,S0)
        kg_li, vg_li = kg_all[li], vg_all[li]
        vp_li = cache.vp[li]

        def attend(w):
            """Whole attention with the gen region bounded to [0, w)."""
            def f(qb, lp, kg_li, vg_li, vp_li, anc_f, anc_c):
                kg_w = jax.lax.slice_in_dim(kg_li, 0, w, axis=3)
                vg_w = jax.lax.slice_in_dim(vg_li, 0, w, axis=3)
                af = jax.lax.slice_in_dim(anc_f, 0, w, axis=3)
                ac = jax.lax.slice_in_dim(anc_c, 0, w, axis=3)
                gbias = jnp.where(jnp.arange(w)[None, :] <= slot, 0.0,
                                  -1e30).astype(jnp.float32)[:, None,
                                                             None, :]
                s_all = jnp.einsum(
                    "bnhd,bhmgd->bhnmg", qb, kg_w.astype(qb.dtype),
                    preferred_element_type=jnp.float32) * scale
                lg = jnp.einsum("bhnmg,bnmg->bhng", s_all, af) + gbias
                logits = jnp.concatenate([lp, lg], axis=-1)
                wgt = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                wp, wg = wgt[..., :s0], wgt[..., s0:]
                o = jnp.einsum("bhns,bhsd->bhnd", wp,
                               vp_li.astype(x.dtype),
                               preferred_element_type=x.dtype)
                wgm = wg[:, :, :, None, :] * ac[:, None, :, :, :]
                o = o + jnp.einsum("bhnmg,bhmgd->bhnd", wgm,
                                   vg_w.astype(x.dtype),
                                   preferred_element_type=x.dtype)
                return o.transpose(0, 2, 1, 3).reshape(bn, H * D)
            return f

        o = jax.lax.switch(br, [attend(w) for w in widths], qb, lp,
                           kg_li, vg_li, vp_li, anc_f, anc_c)
        x = x + nn.linear(blk["attn"]["proj"], o)
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
    h = nn.layer_norm(params["ln_f"], x)
    return h, SplitCache(cache.kp, cache.vp, kg_all, vg_all)


def trunk_decode_step_split_ancg(params: Params, cfg: GPTConfig,
                                 x: jnp.ndarray, cache: SplitCache,
                                 slot: jnp.ndarray, keep_p: jnp.ndarray,
                                 nb: int, amap: jnp.ndarray
                                 ) -> Tuple[jnp.ndarray, SplitCache]:
    """Ancestry routing hoisted OUT of the layer loop: ONE gather per step.

    The ancestry map is fixed before the trunk's (unrolled) layer loop runs,
    so instead of per-layer cross-beam score/value passes (the anc step's
    measured +5.3 ms/step residual — per-op issue cost of ~4 extra einsums
    × 20 layers, PERFORMANCE_NOTES r05) the ENTIRE layer-stacked gen cache
    is routed up front with two take_along_axis gathers over the beam axis
    (K and V, (L, b, H, nb, G, D) each). Every layer then runs the plain
    per-beam split attention — the exact op structure of the no-reorder
    floor — against the routed temporaries, while the current step's K/V
    are written to BOTH the persistent (unrouted) cache and the routed
    temp at ``slot`` (where the effective map is identity), keeping the
    attended values bit-identical to the physically-reordered step.

    Trade: the gathers materialise a full K+V copy of the gen region per
    step (bandwidth) to delete ~80 small ops (issue overhead) — measured
    against anc/ancb/ancsw in tools/profile_beam_step.py.
    """
    params = _ensure_stacked(params)
    bn = x.shape[0]
    b = bn // nb
    g_len = cache.kg.shape[4]
    H, D = cfg.heads, cfg.head_dim
    pbias = jnp.where(keep_p, 0.0, -1e30).astype(jnp.float32)  # (B, S0)
    pbias = pbias[:, None, None, :]                            # (b,1,1,S0)
    gbias = jnp.where(jnp.arange(g_len)[None, :] <= slot, 0.0,
                      -1e30).astype(jnp.float32)[:, None, None, :]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    ident = jnp.broadcast_to(
        jnp.arange(nb, dtype=amap.dtype)[None, :, None], (b, nb, 1))
    amap_eff = jax.lax.dynamic_update_slice(amap, ident, (0, 0, slot))
    idx = amap_eff[None, :, None, :, :, None]       # (1,b,1,nb,G,1)
    kr = jnp.take_along_axis(cache.kg, idx, axis=3)  # (L,b,H,nb,G,D) routed
    vr = jnp.take_along_axis(cache.vg, idx, axis=3)
    blocks = params["blocks"]
    kg_all, vg_all = cache.kg, cache.vg
    # layer loop unrolled: see trunk_decode_step NOTE
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)                   # (BN, C)
        qb = q.reshape(b, nb, H, D)
        k = k.reshape(b, nb, H, D).transpose(0, 2, 1, 3)       # (b,H,nb,D)
        v = v.reshape(b, nb, H, D).transpose(0, 2, 1, 3)
        knew = k[None, :, :, :, None]                          # (1,b,H,nb,1,D)
        vnew = v[None, :, :, :, None]
        kg_all = jax.lax.dynamic_update_slice(
            kg_all, knew.astype(kg_all.dtype), (li, 0, 0, 0, slot, 0))
        vg_all = jax.lax.dynamic_update_slice(
            vg_all, vnew.astype(vg_all.dtype), (li, 0, 0, 0, slot, 0))
        # the routed view was gathered before this step's writes — patch the
        # current slot (identity-mapped) so attention sees the new token
        kr = jax.lax.dynamic_update_slice(
            kr, knew.astype(kr.dtype), (li, 0, 0, 0, slot, 0))
        vr = jax.lax.dynamic_update_slice(
            vr, vnew.astype(vr.dtype), (li, 0, 0, 0, slot, 0))
        lp = jnp.einsum("bnhd,bhsd->bhns", qb,
                        cache.kp[li].astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
        lp = lp + pbias                                        # (b,h,n,S0)
        lg = jnp.einsum("bnhd,bhngd->bhng", qb, kr[li].astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
        lg = lg + gbias                                        # (b,h,n,G)
        logits = jnp.concatenate([lp, lg], axis=-1)            # (b,h,n,S0+G)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        s0 = cache.kp.shape[3]
        wp, wg = w[..., :s0], w[..., s0:]
        o = jnp.einsum("bhns,bhsd->bhnd", wp, cache.vp[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        o = o + jnp.einsum("bhng,bhngd->bhnd", wg, vr[li].astype(x.dtype),
                           preferred_element_type=x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(bn, H * D)         # (bn, C)
        x = x + nn.linear(blk["attn"]["proj"], o)
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
    h = nn.layer_norm(params["ln_f"], x)
    return h, SplitCache(cache.kp, cache.vp, kg_all, vg_all)


def trunk_decode_step_anc_full(params: Params, cfg: GPTConfig,
                               x: jnp.ndarray, kf: jnp.ndarray,
                               vf: jnp.ndarray, slot_abs: jnp.ndarray,
                               keep_p: jnp.ndarray, nb: int,
                               amap: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Ancestry-routed decode step over ONE merged cache buffer
    (L, B, H, nb, S, D) holding the nb-replicated prefix AND the gen
    region: ONE score dot and ONE value dot per layer instead of the
    SplitCache step's two each (prefix + gen) — small-dot issue count is
    the measured residual cost of the anc step. The prefix is replicated
    per beam at prefill (identical rows, so the ancestry values over the
    prefix region are irrelevant); ``amap`` (B, nb, S) routes the gen
    region exactly as trunk_decode_step_split_anc. Trades ~37% more
    attention-read traffic (replicated prefix) for 2 fewer dots/layer.
    """
    params = _ensure_stacked(params)
    bn = x.shape[0]
    b = bn // nb
    s_total = kf.shape[4]
    H, D = cfg.heads, cfg.head_dim
    # validity: real prefix slots (shared per row) + gen slots <= slot_abs
    keep = keep_p & (jnp.arange(s_total)[None, :] <= slot_abs)
    kbias = jnp.where(keep, 0.0, -1e30).astype(jnp.float32)  # (B, S)
    kbias = kbias[:, None, None, :]                          # (b,1,1,S)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    ident = jnp.broadcast_to(
        jnp.arange(nb, dtype=amap.dtype)[None, :, None], (b, nb, 1))
    amap_eff = jax.lax.dynamic_update_slice(
        amap, ident, (0, 0, slot_abs))
    anc = (amap_eff[:, :, None, :]
           == jnp.arange(nb, dtype=amap.dtype)[None, None, :, None])
    anc_f = anc.astype(jnp.float32)                 # (B, n, m, S)
    anc_c = anc.astype(x.dtype)
    blocks = params["blocks"]
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)                   # (BN, C)
        qb = q.reshape(b, nb, H, D)
        k = k.reshape(b, nb, H, D).transpose(0, 2, 1, 3)       # (b,H,nb,D)
        v = v.reshape(b, nb, H, D).transpose(0, 2, 1, 3)
        kf = jax.lax.dynamic_update_slice(
            kf, k[None, :, :, :, None].astype(kf.dtype),
            (li, 0, 0, 0, slot_abs, 0))
        vf = jax.lax.dynamic_update_slice(
            vf, v[None, :, :, :, None].astype(vf.dtype),
            (li, 0, 0, 0, slot_abs, 0))
        s_all = jnp.einsum("bnhd,bhmsd->bhnms", qb,
                           kf[li].astype(q.dtype),
                           preferred_element_type=jnp.float32) * scale
        logits = jnp.einsum("bhnms,bnms->bhns", s_all, anc_f) + kbias
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        wgm = w[:, :, :, None, :] * anc_c[:, None, :, :, :]    # (b,h,n,m,S)
        o = jnp.einsum("bhnms,bhmsd->bhnd", wgm,
                       vf[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(bn, H * D)
        x = x + nn.linear(blk["attn"]["proj"], o)
        x = x + _mlp(cfg, blk["mlp"], nn.layer_norm(blk["ln2"], x))
    h = nn.layer_norm(params["ln_f"], x)
    return h, kf, vf


# ---------------------------------------------------------------------------
# UnifiedVoice-level ops
# ---------------------------------------------------------------------------

def get_conditioning(params: Params, cfg: GPTConfig, mel: jnp.ndarray,
                     lengths: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, n_mels) + lengths → conds (B, 32, model_dim).
    Mirrors UnifiedVoice.get_conditioning (model.py:490-519)."""
    if cfg.condition_type == "perceiver":
        from index_tts_dubbing_tpu.models import legacy_cond
        x = legacy_cond.forward(params["cond_encoder"], mel, heads=cfg.heads)
        return perceiver.forward(params["perceiver"], x, mask=None,
                                 heads=cfg.cond_attention_heads)
    x, keep = conformer.forward(params["cond_encoder"], mel, lengths,
                                heads=cfg.cond_attention_heads)
    ones = jnp.ones((keep.shape[0], cfg.condition_num_latent), bool)
    conds_mask = jnp.concatenate([ones, keep], axis=1)
    return perceiver.forward(params["perceiver"], x, conds_mask,
                             heads=cfg.cond_attention_heads)


def mel_logits_from_hidden(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """final_norm + mel head (the lm_head of GPT2InferenceModel,
    model.py:48)."""
    return nn.linear(params["mel_head"], nn.layer_norm(params["final_norm"], h))


def build_latent_inputs(params: Params, cfg: GPTConfig, conds: jnp.ndarray,
                        text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                        codes: jnp.ndarray, code_lens: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # See forward_latent.
    b, lt = text_ids.shape
    m = codes.shape[1]
    # set_text_padding + stop pad + aligned start (model.py:556-566)
    tpos = jnp.arange(lt)[None, :]
    text = jnp.where(tpos < text_lens[:, None], text_ids, cfg.stop_text_token)
    text = jnp.pad(text, ((0, 0), (0, 1)), constant_values=cfg.stop_text_token)
    text = jnp.pad(text, ((0, 0), (1, 0)), constant_values=cfg.start_text_token)
    # mel: lengths' = code_lens + 1 (ceil(wav/1024)+1 with wav = code_lens*1024)
    mpos = jnp.arange(m)[None, :]
    mel = jnp.where(mpos < (code_lens + 1)[:, None], codes, cfg.stop_mel_token)
    mel = jnp.pad(mel, ((0, 0), (0, 1)), constant_values=cfg.stop_mel_token)
    mel = jnp.pad(mel, ((0, 0), (1, 0)), constant_values=cfg.start_mel_token)

    text_emb = (nn.embedding(params["text_emb"], text)
                + params["text_pos"]["w"][None, :text.shape[1]])
    mel_emb = (nn.embedding(params["mel_emb"], mel)
               + params["mel_pos"]["w"][None, :mel.shape[1]])
    emb = jnp.concatenate([conds.astype(text_emb.dtype), text_emb, mel_emb],
                          axis=1)
    return emb, mel


def forward_latent(params: Params, cfg: GPTConfig, conds: jnp.ndarray,
                   text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                   codes: jnp.ndarray, code_lens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced pass returning mel latents (B, M, C) for the vocoder.
    Mirrors UnifiedVoice.forward(..., return_latent=True) (model.py:521-578):
    output covers the padded code stream; positions beyond each row's
    code_len correspond to stop tokens (the engine slices per row)."""
    emb, mel = build_latent_inputs(params, cfg, conds, text_ids, text_lens,
                                   codes, code_lens)
    h = trunk_forward(params, cfg, emb)
    enc = nn.layer_norm(params["final_norm"], h[:, conds.shape[1]:])
    mel_latent = enc[:, -mel.shape[1]:]
    return mel_latent[:, :-2]


def forward_latent_bucketed(params: Params, cfg: GPTConfig, conds: jnp.ndarray,
                            text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                            codes: jnp.ndarray, code_lens: jnp.ndarray
                            ) -> jnp.ndarray:
    """Static-bucket-shape latent pass, **numerically identical** to the
    exact-shape reference computation for positions < code_len per row:

    - text is framed [start, tokens, stop] and RIGHT-aligned inside its
      padded block; pad positions are masked out of attention entirely, so
      real positions see exactly the unpadded sequence;
    - mel-code padding beyond code_len+1 becomes stop tokens (the reference's
      set_mel_padding) and, by causality, never influences kept latents.

    Inputs may be padded to any bucket width; returns (B, M_pad, C).
    """
    b, lt = text_ids.shape
    m = codes.shape[1]
    cond_n = conds.shape[1]
    width = lt + 2
    # right-aligned framed text + positions + keep mask
    pos_in_block = jnp.arange(width)[None, :]                  # (1, width)
    pad = width - (text_lens + 2)                              # (B,)
    rel = pos_in_block - pad[:, None]                          # index in framed row
    framed_len = text_lens + 2
    keep_text = rel >= 0
    # framed row r: r==0 -> start; 1..len -> tokens; len+1 -> stop
    tok_idx = jnp.clip(rel - 1, 0, lt - 1)
    gathered = jnp.take_along_axis(text_ids, tok_idx, axis=1)
    # apply set_text_padding semantics inside the row (pads→stop handled by
    # framing; tokens beyond text_lens never appear because rel<len+1 bounds)
    framed = jnp.where(rel == 0, cfg.start_text_token,
                       jnp.where(rel == framed_len[:, None] - 1,
                                 cfg.stop_text_token, gathered))
    framed = jnp.where(keep_text, framed, cfg.stop_text_token)
    text_pos = jnp.clip(rel, 0, cfg.max_text_seq - 1)
    text_emb = (nn.embedding(params["text_emb"], framed)
                + jnp.take(params["text_pos"]["w"], text_pos, axis=0))
    text_emb = jnp.where(keep_text[..., None], text_emb, 0.0)

    mpos = jnp.arange(m)[None, :]
    mel = jnp.where(mpos < (code_lens + 1)[:, None], codes, cfg.stop_mel_token)
    mel = jnp.pad(mel, ((0, 0), (0, 1)), constant_values=cfg.stop_mel_token)
    mel = jnp.pad(mel, ((0, 0), (1, 0)), constant_values=cfg.start_mel_token)
    mel_emb = (nn.embedding(params["mel_emb"], mel)
               + params["mel_pos"]["w"][None, :mel.shape[1]])

    emb = jnp.concatenate([conds.astype(text_emb.dtype), text_emb, mel_emb],
                          axis=1)
    keep = jnp.concatenate(
        [jnp.ones((b, cond_n), bool), keep_text,
         jnp.ones((b, mel.shape[1]), bool)], axis=1)
    h = trunk_forward(params, cfg, emb, pad_keep=keep)
    enc = nn.layer_norm(params["final_norm"], h[:, cond_n:])
    mel_latent = enc[:, -mel.shape[1]:]
    return mel_latent[:, :-2]


def forward_train(params: Params, cfg: GPTConfig, mel_cond: jnp.ndarray,
                  cond_lens: jnp.ndarray, text_ids: jnp.ndarray,
                  text_lens: jnp.ndarray, codes: jnp.ndarray,
                  code_lens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training forward: (loss_text, loss_mel) cross-entropies over the two
    streams, target = input shifted with start/stop framing
    (model.py:521-589)."""
    conds = get_conditioning(params, cfg, mel_cond, cond_lens)
    emb, mel = build_latent_inputs(params, cfg, conds, text_ids, text_lens,
                                   codes, code_lens)
    h = trunk_forward(params, cfg, emb)
    enc = nn.layer_norm(params["final_norm"], h[:, conds.shape[1]:])
    lt = text_ids.shape[1] + 2
    text_h, mel_h = enc[:, :lt], enc[:, lt:]
    text_logits = nn.linear(params["text_head"], text_h)
    mel_logits = nn.linear(params["mel_head"], mel_h)

    # targets: input stream shifted left, ending in stop token
    tpos = jnp.arange(text_ids.shape[1])[None, :]
    text_in = jnp.where(tpos < text_lens[:, None], text_ids, cfg.stop_text_token)
    text_tgt = jnp.pad(text_in, ((0, 0), (0, 2)),
                       constant_values=cfg.stop_text_token)
    mpos = jnp.arange(codes.shape[1])[None, :]
    mel_in = jnp.where(mpos < (code_lens + 1)[:, None], codes, cfg.stop_mel_token)
    mel_tgt = jnp.pad(mel_in, ((0, 0), (0, 2)),
                      constant_values=cfg.stop_mel_token)

    def ce(logits, tgt):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    return ce(text_logits, text_tgt), ce(mel_logits, mel_tgt)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(rng, cfg: GPTConfig) -> Params:
    keys = iter(jax.random.split(rng, cfg.layers * 8 + 16))
    d = cfg.model_dim
    p: Params = {
        "cond_encoder": conformer.init(
            next(keys), 100, cfg.cond_output_size, cfg.cond_attention_heads,
            cfg.cond_linear_units, cfg.cond_num_blocks),
        "perceiver": perceiver.init(
            next(keys), d, cfg.cond_output_size, cfg.condition_num_latent,
            64, cfg.cond_attention_heads, cfg.perceiver_mult),
        "text_emb": nn.embedding_init(next(keys), cfg.number_text_tokens + 1, d),
        "mel_emb": nn.embedding_init(next(keys), cfg.number_mel_codes, d),
        "text_pos": nn.embedding_init(next(keys), cfg.max_text_seq, d),
        "mel_pos": nn.embedding_init(next(keys), cfg.max_mel_seq, d),
        "blocks": [],
        "ln_f": nn.layer_norm_init(d),
        "final_norm": nn.layer_norm_init(d),
        "text_head": nn.linear_init(next(keys), d, cfg.number_text_tokens + 1),
        "mel_head": nn.linear_init(next(keys), d, cfg.number_mel_codes),
    }
    for _ in range(cfg.layers):
        p["blocks"].append({
            "ln1": nn.layer_norm_init(d),
            "attn": {
                "qkv": {"w": nn.normal_init(next(keys), (d, 3 * d)),
                        "b": np.zeros((3 * d,), np.float32)},
                "proj": {"w": nn.normal_init(next(keys), (d, d)),
                         "b": np.zeros((d,), np.float32)},
            },
            "ln2": nn.layer_norm_init(d),
            "mlp": {
                "fc": {"w": nn.normal_init(next(keys), (d, 4 * d)),
                       "b": np.zeros((4 * d,), np.float32)},
                "proj": {"w": nn.normal_init(next(keys), (4 * d, d)),
                         "b": np.zeros((d,), np.float32)},
            },
        })
    return stack_blocks(p)

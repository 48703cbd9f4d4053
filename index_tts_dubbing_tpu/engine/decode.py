"""Autoregressive mel-code decoding: prefill + lax.while_loop over a static
KV cache. This replaces the reference's HF ``generate`` hot loop
(gpt/model.py:655-708 + GPT2InferenceModel.forward 115-192).

Semantics preserved from the reference:
- left-padded [pad][cond(32)][start,text,stop] prefix with per-row text
  positions restarting at 0 (prepare_gpt_inputs, model.py:591-654);
- decode starts from the start_mel token appended to the prefix;
- generated token j (1-based) takes mel position j+1 (tortoise off-by-one,
  model.py:151-155);
- HF sampling pipeline order: repetition penalty (set-semantics over all
  previous ids — including the all-ones fake prefix ids and the start token,
  so ids 1 and 8192 are penalised from step 0) → temperature → top-k → top-p;
- stop on stop_mel_token per row; finished rows emit stop_mel (pad token).

TPU design: the whole decode is one jitted while_loop with static shapes;
top-p reuses the top-k subset so no full-vocab sort happens per step.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from index_tts_dubbing_tpu import nn
from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.ops import pallas_permute
from index_tts_dubbing_tpu.models.gpt import GPTConfig, KVCache

SEG_PAD, SEG_COND, SEG_TEXT = 0, 1, 2


@dataclass(frozen=True)
class SamplingConfig:
    do_sample: bool = True
    temperature: float = 1.0
    top_k: int = 30
    top_p: float = 0.8
    repetition_penalty: float = 10.0
    max_mel_tokens: int = 600
    # locally-typical sampling (utils/typical_sampling.py:4-30, opt-in at
    # model.py:692-696); applied between the repetition penalty and the
    # temperature/top-k/top-p warpers, matching HF processor order.
    typical_sampling: bool = False
    typical_mass: float = 0.9
    # HF fake-prefix ids seen by the repetition penalty (all-ones input_ids).
    fake_prefix_id: int = 1


def prepare_prefix_host(cfg: GPTConfig, texts: Sequence[np.ndarray],
                        pad_to: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Host-side prefix layout. For each row: strip any start/stop tokens,
    re-frame as [start, text, stop], left-pad to the common target length.
    Returns ids/pos/seg arrays of shape (B, 32+L+2) that the device embedding
    builder consumes. Mirrors prepare_gpt_inputs (model.py:591-654)."""
    cond_n = cfg.condition_num_latent
    rows = []
    l_raw = max(np.asarray(t).reshape(-1).size for t in texts)
    for t in texts:
        t = np.asarray(t).reshape(-1)
        t = t[(t != cfg.start_text_token) & (t != cfg.stop_text_token)]
        rows.append(np.concatenate([[cfg.start_text_token], t,
                                    [cfg.stop_text_token]]).astype(np.int32))
    # reference pads every row to the *unstripped* common width + 2
    # (model.py:614: target_len = cond + L + 2). ``pad_to`` widens to a
    # static bucket width — extra left-padding is attention-masked, so
    # outputs are identical (the reference's padding-invariance contract).
    if pad_to is not None:
        l_raw = max(l_raw, pad_to)
    lmax = l_raw + 2
    b = len(rows)
    target = cond_n + lmax
    ids = np.zeros((b, target), np.int32)
    pos = np.zeros((b, target), np.int32)
    seg = np.full((b, target), SEG_PAD, np.int32)
    cond_idx = np.zeros((b, target), np.int32)
    for i, r in enumerate(rows):
        pad = lmax - r.size
        seg[i, pad:pad + cond_n] = SEG_COND
        cond_idx[i, pad:pad + cond_n] = np.arange(cond_n)
        seg[i, pad + cond_n:] = SEG_TEXT
        ids[i, pad + cond_n:] = r
        pos[i, pad + cond_n:] = np.arange(r.size)
    return {"ids": ids, "pos": pos, "seg": seg, "cond_idx": cond_idx}


def build_prefix_emb(params: Dict[str, Any], cfg: GPTConfig,
                     conds: jnp.ndarray, ids: jnp.ndarray, pos: jnp.ndarray,
                     seg: jnp.ndarray, cond_idx: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side prefix embedding assembly + the trailing start_mel slot.
    Returns (emb (B, S0, C), pad_keep (B, S0)) with S0 = target_len + 1.

    emb (and therefore the decode KV cache) takes the PARAMS dtype, not the
    conds dtype: the conditioning encoder emits fp32 even under bf16 params
    (norms lift to fp32), and inheriting that fp32 into the decode loop
    doubles every step's cache traffic and puts the trunk matmuls off the
    bf16 MXU path (~2x step time at beam widths, measured r03)."""
    b, t = ids.shape
    dtype = params["mel_emb"]["w"].dtype
    if conds.shape[0] == 1 and b > 1:
        conds = jnp.broadcast_to(conds, (b,) + conds.shape[1:])
    text_e = (nn.embedding(params["text_emb"], ids)
              + jnp.take(params["text_pos"]["w"], pos, axis=0))
    cond_e = jnp.take_along_axis(conds, cond_idx[..., None], axis=1)
    emb = jnp.where((seg == SEG_TEXT)[..., None], text_e, 0.0)
    emb = jnp.where((seg == SEG_COND)[..., None], cond_e.astype(dtype), emb)
    start = (params["mel_emb"]["w"][cfg.start_mel_token]
             + params["mel_pos"]["w"][0])
    emb = jnp.concatenate(
        [emb, jnp.broadcast_to(start[None, None], (b, 1, emb.shape[-1]))], axis=1)
    pad_keep = jnp.concatenate(
        [seg != SEG_PAD, jnp.ones((b, 1), bool)], axis=1)
    return emb.astype(dtype), pad_keep


def _typical_filter(logits: jnp.ndarray, mass: float,
                    min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Locally-typical filtering: keep tokens whose |surprisal − entropy| is
    smallest, up to cumulative probability ``mass``. Matches the reference's
    TypicalLogitsWarper semantics."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(p > 0, logp * p, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending: most typical first
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    sorted_shifted = jnp.take_along_axis(shifted, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    last_ind = jnp.maximum(jnp.sum(cum < mass, axis=-1), 0)
    cutoff = jnp.take_along_axis(sorted_shifted, last_ind[..., None], axis=-1)
    remove = shifted > cutoff
    if min_tokens_to_keep > 1:
        keep_cut = jnp.take_along_axis(
            sorted_shifted, jnp.full_like(last_ind, min_tokens_to_keep - 1
                                          )[..., None], axis=-1)
        remove = remove & (shifted > keep_cut)
    return jnp.where(remove, -jnp.inf, logits)


def _process_logits(logits: jnp.ndarray, seen: jnp.ndarray,
                    sc: SamplingConfig) -> jnp.ndarray:
    """HF-order logits pipeline in fp32. logits (B, V)."""
    logits = logits.astype(jnp.float32)
    if sc.repetition_penalty != 1.0:
        pen = jnp.where(logits > 0, logits / sc.repetition_penalty,
                        logits * sc.repetition_penalty)
        logits = jnp.where(seen, pen, logits)
    if sc.typical_sampling:
        logits = _typical_filter(logits, sc.typical_mass)
    if not sc.do_sample:
        return logits
    if sc.temperature != 1.0:
        logits = logits / sc.temperature
    v = logits.shape[-1]
    k = min(sc.top_k, v) if sc.top_k > 0 else v
    if sc.top_k > 0 and k < v:
        topv, _ = jax.lax.top_k(logits, k)
        logits = jnp.where(logits < topv[..., -1:], -jnp.inf, logits)
    else:
        topv = jnp.sort(logits, axis=-1)[..., ::-1]
    if sc.top_p < 1.0:
        # top-p over the (already sorted) top-k slice: find the smallest kept
        # value, mask everything below it.
        probs = jax.nn.softmax(topv, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) <= sc.top_p      # first token always kept
        kth = jnp.sum(keep, axis=-1) - 1      # index of last kept
        cutoff = jnp.take_along_axis(topv, kth[..., None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


class GenerateResult(NamedTuple):
    codes: jnp.ndarray      # (B, max_steps) generated mel codes, stop-padded
    lengths: jnp.ndarray    # (B,) #codes before the stop token
    steps: jnp.ndarray      # scalar: decode iterations executed


def _mk_constrain(mesh: Optional[Mesh]):
    """Sharding-constraint helper for mesh-parallel decode: batch rides the
    ``data`` axis, attention heads the ``model`` (TP) axis. With mesh=None
    every constraint is the identity (single-chip path unchanged)."""
    if mesh is None:
        return lambda x, *spec: x

    def constrain(x, *spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))
    return constrain


@partial(jax.jit, static_argnames=("cfg", "sc", "mesh"))
def generate(params: Dict[str, Any], cfg: GPTConfig, sc: SamplingConfig,
             prefix_emb: jnp.ndarray, pad_keep: jnp.ndarray,
             rng: jax.Array, mesh: Optional[Mesh] = None,
             live: Optional[jnp.ndarray] = None) -> GenerateResult:
    """Sample mel codes. prefix_emb (B, S0, C) ends with the start_mel slot.

    ``mesh`` (static): a (data, model) jax.sharding.Mesh for DP×TP decode —
    the KV cache is sharded (L, B→data, H→model, S, D) so the decode loop's
    state stays distributed; XLA inserts the per-block TP all-reduces from
    the param shardings (parallel/mesh.py:gpt_param_specs).

    ``live`` (B,) bool: rows marked False are batch padding (the engine pads
    the batch to the data-axis multiple under a mesh) — they emit the stop
    token at step 0 and never gate the loop, so pad rows cost no decode
    steps instead of duplicating a real row's full decode."""
    b, s0, c = prefix_emb.shape
    max_steps = sc.max_mel_tokens
    s_total = s0 + max_steps
    vocab = cfg.number_mel_codes
    cs = _mk_constrain(mesh)
    prefix_emb = cs(prefix_emb, "data")

    cache = gpt_model.init_cache(cfg, b, s_total, dtype=prefix_emb.dtype)
    cache = KVCache(cs(cache.k, None, "data", "model"),
                    cs(cache.v, None, "data", "model"))
    h, cache = gpt_model.trunk_prefill(params, cfg, prefix_emb, pad_keep, cache)
    cache = KVCache(cs(cache.k, None, "data", "model"),
                    cs(cache.v, None, "data", "model"))

    # validity over cache slots: prefix pads stay masked; generated slots
    # become valid as the loop advances.
    base_keep = jnp.concatenate(
        [pad_keep, jnp.ones((b, max_steps), bool)], axis=1)

    seen0 = jnp.zeros((b, vocab), bool)
    seen0 = seen0.at[:, sc.fake_prefix_id].set(True)
    seen0 = seen0.at[:, cfg.start_mel_token].set(True)
    seen0 = cs(seen0, "data")

    def sample_token(h, seen, key):
        logits = gpt_model.mel_logits_from_hidden(params, h)
        logits = _process_logits(logits, seen, sc)
        if sc.do_sample:
            return jax.random.categorical(key, logits, axis=-1)
        return jnp.argmax(logits, axis=-1)

    key0, key1 = jax.random.split(rng)
    tok0 = sample_token(h, seen0, key1)
    if live is not None:
        tok0 = jnp.where(live, tok0, cfg.stop_mel_token)
    done0 = tok0 == cfg.stop_mel_token
    tokens0 = jnp.full((b, max_steps), cfg.stop_mel_token, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0.astype(jnp.int32))
    seen0 = seen0.at[jnp.arange(b), tok0].set(True)

    State = Tuple  # (j, tokens, prev_tok, done, cache, seen, key)

    def cond_fn(state):
        j, _, _, done, _, _, _ = state
        return (j < max_steps) & (~jnp.all(done))

    def body_fn(state):
        j, tokens, prev, done, cache, seen, key = state
        key, sub = jax.random.split(key)
        # embed previous token at mel position j+1 (parity quirk)
        emb = (jnp.take(params["mel_emb"]["w"], prev, axis=0)
               + params["mel_pos"]["w"][j + 1]).astype(prefix_emb.dtype)
        slot = s0 + j - 1
        kk = base_keep & (jnp.arange(s_total)[None, :] <= slot)
        hh, cache = gpt_model.trunk_decode_step(params, cfg, emb, cache,
                                                slot, kk)
        cache = KVCache(cs(cache.k, None, "data", "model"),
                        cs(cache.v, None, "data", "model"))
        tok = sample_token(hh, seen, sub)
        tok = jnp.where(done, cfg.stop_mel_token, tok)
        newly_done = tok == cfg.stop_mel_token
        tokens = tokens.at[:, j].set(tok.astype(jnp.int32))
        seen = seen.at[jnp.arange(b), tok].set(True)
        return (j + 1, tokens, tok, done | newly_done, cache, seen, key)

    init = (jnp.int32(1), tokens0, tok0, done0, cache, seen0, key0)
    j, tokens, _, done, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)

    is_stop = tokens == cfg.stop_mel_token
    any_stop = jnp.any(is_stop, axis=1)
    first_stop = jnp.argmax(is_stop, axis=1)
    lengths = jnp.where(any_stop, first_stop, max_steps)
    return GenerateResult(tokens, lengths, j)


# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Beam search / beam sampling (transformers-4.36 semantics)
# ---------------------------------------------------------------------------
#
# The reference decodes with HF `generate` at num_beams=3 (infer.py:332) —
# with do_sample=True that is *beam sampling* (GenerationMixin.beam_sample),
# with do_sample=False plain beam search. The two share one machinery here:
#
#   per-beam log-softmax → repetition penalty (logits processor, on scores)
#   [+ beam scores] → [warpers: temperature → top-k → top-p, min_keep=2 —
#   beam_sample only] → select 2·nb candidates over the (nb·V) flat scores
#   (beam_sample: multinomial WITHOUT replacement == Gumbel top-k;
#   beam_search: deterministic top-k == zero noise) → sort by score desc →
#   BeamSearchScorer.process: eos candidates ranked < nb join the finished
#   pool (BeamHypotheses.add: keep best nb by sum_logprobs/generated_len**lp,
#   generated_len INCLUDING the eos); non-eos candidates fill the nb beam
#   slots in rank order; finished batches emit pads at score 0 →
#   is_done(early_stopping=False): pool full and worst pooled ≥ best
#   attainable → finalize: open beams join the pool at generated_len =
#   max_steps; best hypothesis per row returned.
#
# Step-0 beam-score init: beam_search masks beams 1.. with -1e9 (dedup);
# beam_sample keeps all zeros (HF samples over nb identical copies — quirk
# preserved).


def _warp_scores(scores: jnp.ndarray, sc: SamplingConfig,
                 min_tokens_to_keep: int = 2) -> jnp.ndarray:
    """HF logits-warper chain on *combined* scores (logp + beam_scores):
    temperature → top-k → top-p, each with min_tokens_to_keep=2 for beams.
    Matches transformers-4.36 beam_sample, where the warpers run AFTER the
    beam scores are added — including the temperature division, whose
    compounding into the accumulated beam score is an HF quirk we keep."""
    if sc.temperature != 1.0:
        scores = scores / sc.temperature
    v = scores.shape[-1]
    k = min(max(sc.top_k, min_tokens_to_keep), v) if sc.top_k > 0 else v
    if sc.top_k > 0 and k < v:
        topv, _ = jax.lax.top_k(scores, k)
        scores = jnp.where(scores < topv[..., -1:], -jnp.inf, scores)
    else:
        topv = jnp.sort(scores, axis=-1)[..., ::-1]
    if sc.top_p < 1.0:
        probs = jax.nn.softmax(topv, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) <= sc.top_p
        keep = keep.at[..., :min_tokens_to_keep].set(True)
        kth = jnp.sum(keep, axis=-1) - 1
        cutoff = jnp.take_along_axis(topv, kth[..., None], axis=-1)
        scores = jnp.where(scores < cutoff, -jnp.inf, scores)
    return scores


@partial(jax.jit, static_argnames=("cfg", "sc", "num_beams", "stochastic",
                                   "mesh", "reorder", "debug_state"))
def _beam_decode(params: Dict[str, Any], cfg: GPTConfig, sc: SamplingConfig,
                 prefix_emb: jnp.ndarray, pad_keep: jnp.ndarray,
                 rng: jax.Array, num_beams: int, length_penalty: float,
                 stochastic: bool, mesh: Optional[Mesh] = None,
                 reorder: str = "anc", debug_state: bool = False,
                 live: Optional[jnp.ndarray] = None) -> GenerateResult:
    b, s0, c = prefix_emb.shape
    nb = num_beams
    bn = b * nb
    n_cand = 2 * nb
    max_steps = sc.max_mel_tokens
    s_total = s0 + max_steps
    vocab = cfg.number_mel_codes
    NEG = jnp.float32(-1e9)
    lp = jnp.float32(length_penalty)
    L, H, D = cfg.layers, cfg.heads, cfg.head_dim
    cs = _mk_constrain(mesh)
    prefix_emb = cs(prefix_emb, "data")

    if reorder in ("cof", "cofdense") and mesh is not None:
        # the copy-on-fork Pallas kernels are single-chip; the mesh path uses
        # the shard-local grouped einsum permutation instead
        reorder = "split"
    cof = reorder in ("cof", "cofdense")
    anc = reorder in ("anc", "ancnone", "ancb", "ancsw", "ancg")
    ancfull = reorder == "ancfull"
    split = reorder in ("split", "splitnone", "cof", "cofdense", "anc",
                        "ancnone", "ancb", "ancsw", "ancg")
    keep_full = None
    if ancfull:
        # merged-buffer ancestry decode: nb-replicated prefix + gen region
        # in ONE (L, B, H, nb, S, D) cache — one score dot + one value dot
        # per layer (gpt.trunk_decode_step_anc_full)
        pcache = gpt_model.init_cache(cfg, b, s0, dtype=prefix_emb.dtype)
        h, pcache = gpt_model.trunk_prefill(params, cfg, prefix_emb,
                                            pad_keep, pcache)
        kf = jnp.zeros((L, b, H, nb, s_total, D), prefix_emb.dtype)
        vf = jnp.zeros((L, b, H, nb, s_total, D), prefix_emb.dtype)
        kf = kf.at[:, :, :, :, :s0, :].set(pcache.k[:, :, :, None])
        vf = vf.at[:, :, :, :, :s0, :].set(pcache.v[:, :, :, None])
        cache = gpt_model.KVCache(cs(kf, None, "data", "model"),
                                  cs(vf, None, "data", "model"))
        keep_full = jnp.concatenate(
            [pad_keep, jnp.ones((b, max_steps), bool)], axis=1)
        base_keep = None
    if ancfull:
        pass  # cache built above
    elif split:
        # SplitCache: the prefix is stored ONCE per batch row (frozen,
        # shared by its beams at attention time); only the generated region
        # (L, bn, H, G, D) exists per beam and is ever reordered.
        #
        # (A two-phase STAGED gen cache — 96 slots then full-size with a
        # migration copy — was implemented and measured r03: parity-exact
        # but 18.1 vs 17.6 ms/step (the in-loop reorder cost is overhead-
        # bound, not bandwidth-bound) at 4.7x the compile time, so it was
        # removed.)
        pcache = gpt_model.init_cache(cfg, b, s0, dtype=prefix_emb.dtype)
        h, pcache = gpt_model.trunk_prefill(params, cfg, prefix_emb,
                                            pad_keep, pcache)
        if anc:
            # heads-major (L, B, H, nb, G, D) layout: transpose-free
            # ancestry-routed attention (gpt.init_gen_cache_anc)
            kg, vg = gpt_model.init_gen_cache_anc(cfg, b, nb, max_steps,
                                                  dtype=prefix_emb.dtype)
        else:
            kg, vg = gpt_model.init_gen_cache(cfg, bn, max_steps,
                                              dtype=prefix_emb.dtype)
        cache = gpt_model.SplitCache(
            cs(pcache.k, None, "data", "model"),
            cs(pcache.v, None, "data", "model"),
            cs(kg, None, "data", "model"),
            cs(vg, None, "data", "model"))
        base_keep = None
    else:
        cache = gpt_model.init_cache(cfg, b, s_total, dtype=prefix_emb.dtype)
        h, cache = gpt_model.trunk_prefill(params, cfg, prefix_emb, pad_keep,
                                           cache)
        # beams of one row are CONTIGUOUS (row-major (b, nb)): under a mesh
        # the bn axis shards over ``data`` and every beam group stays
        # shard-local.
        cache = gpt_model.KVCache(
            cs(jnp.repeat(cache.k, nb, axis=1), None, "data", "model"),
            cs(jnp.repeat(cache.v, nb, axis=1), None, "data", "model"))
        pad_keep_n = jnp.repeat(pad_keep, nb, axis=0)
        base_keep = jnp.concatenate(
            [pad_keep_n, jnp.ones((bn, max_steps), bool)], axis=1)

    seen0 = jnp.zeros((bn, vocab), bool)
    seen0 = seen0.at[:, sc.fake_prefix_id].set(True)
    seen0 = seen0.at[:, cfg.start_mel_token].set(True)
    seen0 = cs(seen0, "data")

    # --- beam-history reorder ----------------------------------------------
    # The HF `_reorder_cache` equivalent (gpt/model.py:194-207) gathers the
    # FULL cache per step. Strategies (static ``reorder``), measured at
    # B=16·nb=3·192 steps on TPU v5e (tools/profile_beam_step.py r03/r04;
    # no-reorder baseline 5.2 ms/step):
    #  "anc"    (DEFAULT r04, 10.6 ms/step) — SplitCache + per-slot ancestry
    #           map, ZERO physical reorder: attention routes through the map
    #           (gpt.trunk_decode_step_split_anc; heads-major gen cache).
    #           The reorder's cache traffic disappears; the residual +5.3
    #           ms over the no-reorder floor is the extra score/value dot
    #           passes per layer ("ancnone" isolates it: 10.63), not the
    #           map bookkeeping. Token-bitwise == "full" on CPU.
    #  "ancg"   (14.3 ms/step, r05 — NEGATIVE) — anc with the routing
    #           hoisted OUT of the layer loop: the amap is fixed before the
    #           trunk runs, so the whole layer-stacked gen cache is routed
    #           by TWO take_along_axis gathers per step and each layer runs
    #           the plain split attention (no cross-beam passes). Loses:
    #           any materialised routing writes a full K+V copy of the gen
    #           region per step, and at this backend's effective HBM rates
    #           (~150-205 GB/s on these shapes) that costs more than the
    #           ~80 small ops it deletes. Fourth-side confirmation that the
    #           anc residual is op-issue-bound, not bandwidth-bound.
    #  "split"  (r03 default, 17.6 ms/step) — SplitCache + full-bn one-hot MXU
    #           einsum over the gen region. The einsum streams the cache
    #           through HBM exactly once (~205 GB/s effective) — 2.4-3×
    #           any gather lowering at these shapes.
    #  "cof"    (13.6 ms/step) — copy-on-fork row indirection: only forked
    #           beams copy history, via a Pallas HBM→HBM DMA kernel
    #           (ops/pallas_permute.py). Structurally the cheapest reorder
    #           (fork-proportional traffic), but this backend charges a
    #           fixed ~10 ms per pallas_call INSIDE device loops (measured
    #           on a trivial kernel), so the win is capped; kept as the
    #           reference design for backends without that overhead.
    #           Note: under bf16 on TPU, cof/split token streams can
    #           diverge from "full" on near-tie candidates (program-level
    #           rounding, ~2e-3 logits); all strategies are BIT-identical
    #           on CPU (tests/test_beam.py).
    #  Legacy single-buffer strategies (gather the repeated-prefix cache):
    #  "gen"     — reorder only the generated region [s0, s0+max):
    #            the prefix [0, s0) is identical across a row's beams (it was
    #            repeated from one prefill), so skipping it statically saves
    #            its traffic every step with no data-dependent control flow;
    #  "full"    — gather the whole cache (HF-faithful baseline);
    #  "blocked" — SB-slot blocks gated by lax.cond on (block written) &
    #            (permutation != identity). Measured PATHOLOGICAL on TPU:
    #            conds inside while_loop force branch-isolation copies of
    #            the full cache (~65 ms/step at B=16·nb=3 vs ~8 ms for
    #            "gen"; tools/profile_beam_step.py) — kept for the record.
    # All gathers run on (b, nb, ...) views with per-row indices so they
    # stay shard-local under a ``data``-sharded mesh.
    SB = 128
    n_blocks = (max_steps + SB - 1) // SB

    def reorder_cache(cache, src, j, m, inv, amap):
        """Apply the beam-ancestry switch ``src`` (b, nb logical sources) to
        the cache. Returns (cache', m', inv', amap') — the logical→physical
        / physical→logical row maps only change under "cof"; the per-slot
        ancestry map only under "anc" (which never moves cache rows at all);
        all other strategies physically reorder and keep identity maps."""
        if reorder == "ancnone":
            # PROFILING ONLY: anc trunk step with the amap update skipped
            # (wrong numerics on non-identity switches) — isolates the
            # ancestry-routed attention's cost from the map bookkeeping.
            return cache, m, inv, amap
        if anc or ancfull:
            # zero-copy: slot j-1 (just written, physical==logical) is
            # stamped identity, then the whole map is gathered by the
            # ancestry switch — composed pointers instead of cache traffic.
            # (j=0: the clamped write+gather touch slot 0 before it exists;
            # both are overwritten by the j=1 stamp, and unwritten slots are
            # attention-masked.)
            ident = jnp.broadcast_to(
                jnp.arange(nb, dtype=amap.dtype)[None, :, None], (b, nb, 1))
            ofs = s0 if ancfull else 0  # ancfull maps ABSOLUTE cache slots
            amap2 = jax.lax.dynamic_update_slice(
                amap, ident, (0, 0, ofs + jnp.asarray(j, jnp.int32) - 1))
            amap2 = jnp.take_along_axis(amap2, src[..., None], axis=1)
            return cache, m, inv, cs(amap2, "data")
        if reorder == "splitnone":
            # PROFILING ONLY: split cache without the reorder (wrong
            # numerics on non-identity permutations) — isolates the split
            # attention step's cost in tools/profile_beam_step.py.
            return cache, m, inv, amap
        if cof:
            # Copy-on-fork with row indirection: beams that survive stay in
            # their physical rows (map update only); each FORKED beam copies
            # its ancestor's generated history [0, j) into a physical row
            # freed by a dead beam. Sources (kept rows) and destinations
            # (freed rows) are disjoint, so the copy runs in place on the
            # aliased buffers (ops/pallas_permute.py:copy_on_fork) and the
            # average reorder traffic drops from the full gen region to
            # fork_rate · occupied-prefix. The trunk step runs in PHYSICAL
            # row order (emb permuted by inv, hidden gathered back by m).
            m2 = m.reshape(b, nb) - jnp.arange(b, dtype=m.dtype)[:, None] * nb
            src_phys = jnp.take_along_axis(m2, src, axis=1)       # (b, nb)
            eq = src[:, :, None] == src[:, None, :]
            lower = jnp.tril(jnp.ones((nb, nb), bool), -1)
            first_claim = ~jnp.any(eq & lower[None], axis=2)      # (b, nb)
            kept = jnp.any(src_phys[:, :, None]
                           == jnp.arange(nb)[None, None, :], axis=1)  # (b,nb)
            order = jnp.argsort(kept.astype(jnp.int32), axis=1,
                                stable=True)                # free rows first
            fork_rank = jnp.clip(jnp.cumsum(~first_claim, axis=1) - 1, 0)
            free_for_rank = jnp.take_along_axis(order, fork_rank, axis=1)
            m_new2 = jnp.where(first_claim, src_phys, free_for_rank)
            bi = jnp.arange(b)[:, None]
            cp2 = jnp.full((b, nb), -1, jnp.int32).at[bi, m_new2].set(
                jnp.where(first_claim, -1, src_phys))
            off = (jnp.arange(b, dtype=jnp.int32)[:, None] * nb)
            cp_flat = jnp.where(cp2 >= 0, off + cp2, -1).reshape(bn)
            m_flat = (off + m_new2).reshape(bn).astype(jnp.int32)
            inv2 = jnp.zeros((b, nb), jnp.int32).at[bi, m_new2].set(
                jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (b, nb)))
            inv_flat = (off + inv2).reshape(bn).astype(jnp.int32)
            bound = jnp.asarray(j - 1, jnp.int32)
            if jax.default_backend() == "tpu":
                kg2, vg2 = pallas_permute.copy_on_fork(
                    cache.kg, cache.vg, cp_flat, bound)
            else:
                idx = jnp.where(cp_flat >= 0, cp_flat,
                                jnp.arange(bn, dtype=jnp.int32))
                kg2 = jnp.take(cache.kg, idx, axis=1)
                vg2 = jnp.take(cache.vg, idx, axis=1)
            if reorder == "cofdense":
                # DIAGNOSTIC: apply the copy-on-fork copies, then normalise
                # back to identity maps with a dense gather — isolates the
                # copy/bookkeeping logic from the physical/logical
                # transposition of the trunk step.
                kg2 = jnp.take(kg2, m_flat, axis=1)
                vg2 = jnp.take(vg2, m_flat, axis=1)
                return (gpt_model.SplitCache(cache.kp, cache.vp, kg2, vg2),
                        m, inv, amap)
            return (gpt_model.SplitCache(cache.kp, cache.vp, kg2, vg2),
                    m_flat, inv_flat, amap)
        if split:
            # gen-region-only permutation, no slice/DUS dance. Single chip:
            # block-diagonal one-hot matmul over the FULL bn axis — the MXU
            # permutes while the cache streams through HBM exactly once
            # (~2× the throughput of a take gather at this shape;
            # tools/microbench_reorder.py). Under a mesh: per-row-group
            # (nb×nb) einsum so every term stays shard-local on ``data``.
            if mesh is None:
                src_flat = (jnp.arange(b, dtype=src.dtype)[:, None] * nb
                            + src).reshape(bn)
                p = jax.nn.one_hot(src_flat, bn, dtype=cache.kg.dtype)
                def do(arr):
                    return jnp.einsum("ij,ljhgd->lihgd", p, arr)
            else:
                pg = jax.nn.one_hot(src, nb, dtype=cache.kg.dtype)  # (b,nb,nb)
                def do(arr):
                    L_, _, H_, G_, D_ = arr.shape
                    g = arr.reshape(L_, b, nb, H_, G_, D_)
                    g = jnp.einsum("bij,lbjhgd->lbihgd", pg, g)
                    return g.reshape(L_, bn, H_, G_, D_)
            return gpt_model.SplitCache(
                cache.kp, cache.vp,
                cs(do(cache.kg), None, "data", "model"),
                cs(do(cache.vg), None, "data", "model")), m, inv, amap

        idx = src[None, :, :, None, None, None]     # (1, b, nb, 1, 1, 1)
        k, v = cache

        src_flat = (jnp.arange(b, dtype=src.dtype)[:, None] * nb
                    + src).reshape(bn)

        if reorder == "none":
            # PROFILING ONLY: skip the history reorder entirely (wrong
            # numerics whenever a step's permutation is not identity) —
            # isolates the reorder's cost in tools/profile_beam_step.py.
            pass
        elif reorder == "flat":
            # gen-region gather with a FLAT (bn,) row-index vector over the
            # bn axis (jnp.take). take_along_axis (the "gen"/"full"
            # strategies) broadcasts its index operand to the full output
            # shape — on TPU that materialises an output-sized int32 index
            # array and lowers to an elementwise gather (~14 ms/step at
            # B=16·nb=3; tools/profile_beam_step.py r03). A rank-1 index
            # vector lowers to 48 block copies instead (~0.6 ms/step).
            # src stays per-row (src_flat = b·nb + src[b,:]), so rows never
            # cross a ``data`` shard boundary under a mesh.
            def do(arr):
                blk = jax.lax.slice_in_dim(arr, s0, s_total, axis=3)
                g = jnp.take(blk, src_flat, axis=1)
                return jax.lax.dynamic_update_slice_in_dim(arr, g, s0, axis=3)
            k, v = do(k), do(v)
        elif reorder == "flatfull":
            # flat-index gather of the WHOLE cache (no slice/update-slice
            # aliasing dance) — trades prefix traffic for op simplicity
            def do(arr):
                return jnp.take(arr, src_flat, axis=1)
            k, v = do(k), do(v)
        elif reorder == "mm":
            # one-hot matmul permutation over the beam axis (MXU path)
            p = jax.nn.one_hot(src, nb, dtype=k.dtype)      # (b, nb_new, nb_old)
            def do(arr):
                blk = jax.lax.slice_in_dim(arr, s0, s_total, axis=3)
                g = blk.reshape(L, b, nb, H, max_steps, D)
                g = jnp.einsum("bij,lbjhsd->lbihsd", p, g)
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, g.reshape(L, bn, H, max_steps, D), s0, axis=3)
            k, v = do(k), do(v)
        elif reorder == "full":
            def do(arr):
                g = arr.reshape(L, b, nb, H, s_total, D)
                g = jnp.take_along_axis(g, idx, axis=2)
                return g.reshape(L, bn, H, s_total, D)
            k, v = do(k), do(v)
        elif reorder == "gen":
            def do(arr):
                blk = jax.lax.slice_in_dim(arr, s0, s_total, axis=3)
                g = blk.reshape(L, b, nb, H, max_steps, D)
                g = jnp.take_along_axis(g, idx, axis=2)
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, g.reshape(L, bn, H, max_steps, D), s0, axis=3)
            k, v = do(k), do(v)
        else:  # "blocked"
            identity = jnp.all(src == jnp.arange(nb)[None, :])

            def do_block(arr, lo, width):
                blk = jax.lax.slice_in_dim(arr, lo, lo + width, axis=3)
                g = blk.reshape(L, b, nb, H, width, D)
                g = jnp.take_along_axis(g, idx, axis=2)
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, g.reshape(L, bn, H, width, D), lo, axis=3)

            for mb in range(n_blocks):
                lo = s0 + mb * SB
                width = min(SB, max_steps - mb * SB)
                pred = (jnp.int32(mb * SB) <= j - 1) & ~identity
                k = jax.lax.cond(pred, lambda a: do_block(a, lo, width),
                                 lambda a: a, k)
                v = jax.lax.cond(pred, lambda a: do_block(a, lo, width),
                                 lambda a: a, v)
        return gpt_model.KVCache(cs(k, None, "data", "model"),
                                 cs(v, None, "data", "model")), m, inv, amap

    def penalised_logp(h_, seen):
        logits = gpt_model.mel_logits_from_hidden(params, h_).astype(
            jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        if sc.repetition_penalty != 1.0:
            pen = jnp.where(logp > 0, logp / sc.repetition_penalty,
                            logp * sc.repetition_penalty)
            logp = jnp.where(seen, pen, logp)
        if sc.typical_sampling:
            # reference appends TypicalLogitsWarper as a logits_processor
            # (model.py:692-696) → runs before beam scores are added
            logp = _typical_filter(logp, sc.typical_mass,
                                   min_tokens_to_keep=2)
        return logp

    def select_candidates(logp, beam_scores, key):
        """One step's candidate draw: warp (beam_sample), select 2nb over
        the flat (nb·V) scores, sort by score desc. Returns
        (cand_scores, src_beam, tok, best_next) with (b, n_cand) shapes."""
        scores = logp + beam_scores[:, None]
        if stochastic:
            scores = _warp_scores(scores, sc)
        flat = scores.reshape(b, nb * vocab)
        if stochastic:
            gumbel = jax.random.gumbel(key, flat.shape, jnp.float32)
            z = jnp.where(jnp.isneginf(flat), -jnp.inf, flat + gumbel)
        else:
            z = flat
        _, idx = jax.lax.top_k(z, n_cand)                 # (b, n_cand)
        cand = jnp.take_along_axis(flat, idx, axis=1)
        order = jnp.argsort(-cand, axis=1)
        cand = jnp.take_along_axis(cand, order, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
        best_next = jnp.max(flat, axis=1)
        return cand, idx // vocab, (idx % vocab).astype(jnp.int32), best_next

    def process(cand, src_beam, tok, best_next, j, tokens, cache, seen,
                pool_norm, pool_tok, pool_len, done, m, inv, amap):
        """BeamSearchScorer.process + BeamHypotheses pool. j = tokens
        generated before this step; eos hypotheses have generated_len j+1
        (eos counted, HF 4.36 `generated_len = cur_len - decoder_prompt_len`
        with cur_len = input_ids.shape[-1] + 1)."""
        gen_len = jnp.float32(j + 1)
        is_eos = tok == cfg.stop_mel_token
        rank = jnp.arange(n_cand)[None, :]
        # --- finished-hypothesis pool: eos candidates ranked < nb
        eos_cand = is_eos & (rank < nb) & (~done[:, None])
        cand_norm = jnp.where(eos_cand,
                              cand / jnp.power(gen_len, lp), -jnp.inf)
        # gathers run on (b, nb, ...) views with per-row indices so they stay
        # shard-local under a ``data``-sharded mesh (beam groups never cross
        # a shard boundary)
        cand_tok_rows = jnp.take_along_axis(
            tokens.reshape(b, nb, -1), src_beam[..., None], axis=1)
        all_norm = jnp.concatenate([pool_norm, cand_norm], axis=1)
        all_len = jnp.concatenate(
            [pool_len, jnp.broadcast_to(jnp.int32(j), (b, n_cand))], axis=1)
        all_tok = jnp.concatenate([pool_tok, cand_tok_rows], axis=1)
        top_norm, top_i = jax.lax.top_k(all_norm, nb)
        pool_norm = top_norm
        pool_len = jnp.take_along_axis(all_len, top_i, axis=1)
        pool_tok = jnp.take_along_axis(all_tok, top_i[..., None], axis=1)
        # --- live beams: first nb non-eos candidates in rank order
        slot = jnp.cumsum(~is_eos, axis=1) - 1                  # (b, n_cand)
        pick = jnp.argmax(
            (slot[:, None, :] == jnp.arange(nb)[None, :, None])
            & (~is_eos)[:, None, :], axis=2)                    # (b, nb)
        new_scores = jnp.take_along_axis(cand, pick, axis=1)
        new_tok = jnp.take_along_axis(tok, pick, axis=1)
        new_src = jnp.take_along_axis(src_beam, pick, axis=1)
        # finished batches: freeze (emit pad at score 0, keep state)
        new_scores = jnp.where(done[:, None], 0.0, new_scores).reshape(bn)
        new_tok = jnp.where(done[:, None], cfg.stop_mel_token,
                            new_tok).reshape(bn)
        keep_self = jnp.broadcast_to(jnp.arange(nb)[None, :], (b, nb))
        new_src = jnp.where(done[:, None], keep_self, new_src)
        tokens = jnp.take_along_axis(
            tokens.reshape(b, nb, -1), new_src[..., None], axis=1
        ).reshape(bn, -1)
        seen = jnp.take_along_axis(
            seen.reshape(b, nb, -1), new_src[..., None], axis=1
        ).reshape(bn, -1)
        cache, m, inv, amap = reorder_cache(cache, new_src, j, m, inv, amap)
        tokens = jnp.where(done[jnp.arange(bn) // nb, None], tokens,
                           tokens.at[:, j].set(new_tok))
        seen = seen.at[jnp.arange(bn), new_tok].set(True)
        # --- is_done (early_stopping=False): pool full AND no open beam can
        # still beat the worst pooled hypothesis
        pool_full = jnp.sum(pool_norm > -jnp.inf, axis=1) >= nb
        attainable = best_next / jnp.power(gen_len, lp)
        worst = jnp.min(pool_norm, axis=1)
        done = done | (pool_full & (worst >= attainable))
        return (tokens, new_scores, new_tok, cache, seen, pool_norm,
                pool_tok, pool_len, done, m, inv, amap)

    # ---- step 0 (prefill hidden state). beam_search masks duplicate beams;
    # beam_sample keeps all-zero scores (samples over nb identical copies).
    key0, sub0 = jax.random.split(rng)
    logp0 = penalised_logp(jnp.repeat(h, nb, axis=0), seen0)
    if stochastic:
        beam_scores0 = jnp.zeros((bn,), jnp.float32)
    else:
        beam_scores0 = jnp.tile(
            jnp.concatenate([jnp.zeros(1), jnp.full((nb - 1,), NEG)]), b
        ).astype(jnp.float32) if nb > 1 else jnp.zeros((bn,), jnp.float32)
    tokens0 = jnp.full((bn, max_steps), cfg.stop_mel_token, jnp.int32)
    pool_norm0 = jnp.full((b, nb), -jnp.inf, jnp.float32)
    pool_tok0 = jnp.full((b, nb, max_steps), cfg.stop_mel_token, jnp.int32)
    pool_len0 = jnp.zeros((b, nb), jnp.int32)
    done0 = jnp.zeros((b,), bool)
    if live is not None:
        # batch-padding rows (engine mesh padding) freeze at step 0
        done0 = done0 | ~live
    m0 = jnp.arange(bn, dtype=jnp.int32)   # logical→physical row map (cof)
    inv0 = jnp.arange(bn, dtype=jnp.int32)  # physical→logical row map (cof)
    # per-slot ancestry map (anc): (b, nb, G) logical beam × gen slot →
    # physical beam index within the row; identity until slots are written
    # (ancfull: over the ABSOLUTE cache axis; prefix rows are replicated so
    # their ancestry values are irrelevant)
    amap_len = s_total if ancfull else max_steps
    amap0 = cs(jnp.zeros((b, nb, amap_len), jnp.int32)
               + jnp.arange(nb, dtype=jnp.int32)[None, :, None], "data")
    cand, src, tok, best = select_candidates(logp0, beam_scores0, sub0)
    (tokens, beam_scores, prev, cache, seen, pool_norm, pool_tok, pool_len,
     done, m, inv, amap) = process(cand, src, tok, best, 0, tokens0, cache,
                                   seen0, pool_norm0, pool_tok0, pool_len0,
                                   done0, m0, inv0, amap0)

    def body_fn(state):
        (j, tokens, prev, beam_scores, cache, seen, pool_norm, pool_tok,
         pool_len, done, key, m, inv, amap) = state
        key, sub = jax.random.split(key)
        emb = (jnp.take(params["mel_emb"]["w"], prev, axis=0)
               + params["mel_pos"]["w"][j + 1]).astype(prefix_emb.dtype)
        if ancfull:
            hh, kf, vf = gpt_model.trunk_decode_step_anc_full(
                params, cfg, emb, cache.k, cache.v, s0 + j - 1, keep_full,
                nb, amap)
            cache = gpt_model.KVCache(cs(kf, None, "data", "model"),
                                      cs(vf, None, "data", "model"))
        elif cof:
            # the trunk step runs in PHYSICAL row order: permute the token
            # embeddings in (by the physical→logical map) and gather the
            # hidden states back out (by the logical→physical map) — two
            # (bn, C) gathers instead of a gen-cache-sized reorder
            hh, cache = gpt_model.trunk_decode_step_split(
                params, cfg, jnp.take(emb, inv, axis=0), cache, j - 1,
                pad_keep, nb)
            hh = jnp.take(hh, m, axis=0)
        elif reorder == "ancb":
            hh, cache = gpt_model.trunk_decode_step_split_anc_bias(
                params, cfg, emb, cache, j - 1, pad_keep, nb, amap)
        elif reorder == "ancsw":
            hh, cache = gpt_model.trunk_decode_step_split_anc_sw(
                params, cfg, emb, cache, j - 1, pad_keep, nb, amap)
        elif reorder == "ancg":
            hh, cache = gpt_model.trunk_decode_step_split_ancg(
                params, cfg, emb, cache, j - 1, pad_keep, nb, amap)
        elif anc:
            hh, cache = gpt_model.trunk_decode_step_split_anc(
                params, cfg, emb, cache, j - 1, pad_keep, nb, amap)
        elif split:
            hh, cache = gpt_model.trunk_decode_step_split(
                params, cfg, emb, cache, j - 1, pad_keep, nb)
        else:
            slot = s0 + j - 1
            kk = base_keep & (jnp.arange(s_total)[None, :] <= slot)
            hh, cache = gpt_model.trunk_decode_step(params, cfg, emb, cache,
                                                    slot, kk)
        logp = penalised_logp(hh, seen)
        cand, src, tok, best = select_candidates(logp, beam_scores, sub)
        (tokens, beam_scores, prev, cache, seen, pool_norm, pool_tok,
         pool_len, done, m, inv, amap) = process(
            cand, src, tok, best, j, tokens, cache, seen, pool_norm,
            pool_tok, pool_len, done, m, inv, amap)
        return (j + 1, tokens, prev, beam_scores, cache, seen, pool_norm,
                pool_tok, pool_len, done, key, m, inv, amap)

    def cond_fn(st):
        return (st[0] < max_steps) & (~jnp.all(st[9]))

    state = (jnp.int32(1), tokens, prev, beam_scores, cache, seen,
             pool_norm, pool_tok, pool_len, done, key0, m, inv, amap)
    (j, tokens, _, beam_scores, fin_cache, _, pool_norm, pool_tok, pool_len,
     done, _, fin_m, fin_inv, _) = jax.lax.while_loop(cond_fn, body_fn, state)

    # ---- finalize: open beams of not-done batches join the pool at
    # generated_len = max_steps (HF finalize semantics)
    fin_norm = (beam_scores.reshape(b, nb)
                / jnp.power(jnp.float32(max_steps), lp))
    fin_norm = jnp.where(done[:, None], -jnp.inf, fin_norm)
    all_norm = jnp.concatenate([pool_norm, fin_norm], axis=1)
    all_len = jnp.concatenate(
        [pool_len, jnp.broadcast_to(jnp.int32(max_steps), (b, nb))], axis=1)
    all_tok = jnp.concatenate([pool_tok, tokens.reshape(b, nb, -1)], axis=1)
    best_i = jnp.argmax(all_norm, axis=1)                       # (b,)
    out_tokens = jnp.take_along_axis(
        all_tok, best_i[:, None, None], axis=1)[:, 0]
    out_len = jnp.take_along_axis(all_len, best_i[:, None], axis=1)[:, 0]
    # stop-pad beyond the hypothesis length (pool rows may carry later junk
    # from beams that continued past the pooled eos)
    ar = jnp.arange(max_steps)[None, :]
    out_tokens = jnp.where(ar < out_len[:, None], out_tokens,
                           cfg.stop_mel_token)
    res = GenerateResult(out_tokens, out_len.astype(jnp.int32), j)
    if debug_state:
        return res, fin_cache, fin_m, fin_inv, tokens
    return res


def generate_beam(params: Dict[str, Any], cfg: GPTConfig, sc: SamplingConfig,
                  prefix_emb: jnp.ndarray, pad_keep: jnp.ndarray,
                  num_beams: int = 3, length_penalty: float = 0.0,
                  mesh: Optional[Mesh] = None,
                  live: Optional[jnp.ndarray] = None) -> GenerateResult:
    """Deterministic beam search (HF beam_search: do_sample=False with
    num_beams>1 at infer.py:326-334). Returns the best hypothesis per row."""
    return _beam_decode(params, cfg, sc, prefix_emb, pad_keep,
                        jax.random.PRNGKey(0), num_beams, length_penalty,
                        stochastic=False, mesh=mesh, live=live)


def generate_beam_sample(params: Dict[str, Any], cfg: GPTConfig,
                         sc: SamplingConfig, prefix_emb: jnp.ndarray,
                         pad_keep: jnp.ndarray, rng: jax.Array,
                         num_beams: int = 3, length_penalty: float = 0.0,
                         mesh: Optional[Mesh] = None,
                         live: Optional[jnp.ndarray] = None
                         ) -> GenerateResult:
    """Stochastic beam sampling (HF beam_sample) — the reference's DEFAULT
    decode mode (do_sample=True, num_beams=3; infer.py:326-334 →
    gpt/model.py:698-703). Candidates are drawn without replacement via
    Gumbel top-k, distributionally identical to torch.multinomial."""
    return _beam_decode(params, cfg, sc, prefix_emb, pad_keep, rng,
                        num_beams, length_penalty, stochastic=True,
                        mesh=mesh, live=live)

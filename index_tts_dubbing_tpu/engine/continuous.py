"""Continuous batching over the AR decoder: fixed B decode slots, rows are
refilled from a request queue the moment they finish.

This is the TPU-native replacement for the dubbing layer's per-segment
sequential synthesis (reference: srt_dubbing strategies call one full
``IndexTTS.infer`` per SRT entry — cli.py:25-177, basic_strategy.py:17-100)
and goes beyond the reference's static bucketing (infer.py:188-243), which
waits for the longest row of every bucket: here a finished row's slot is
immediately re-used by the next pending request, so heterogeneous SRT
segment lengths no longer serialise the chip.

Design (all static shapes, three compiled programs total):
- ``prefill`` — batch-1 trunk forward at a bucketed prefix width, returning
  the per-layer K/V stack and the first sampled token;
- ``insert`` — writes that K/V block + per-row bookkeeping into one slot of
  the shared decode state (pure device-side update);
- ``decode_chunk`` — K decode steps for all B slots in one fori_loop; rows
  carry independent write positions / lengths / done flags. The host drains
  finished rows between chunks and refills their slots.

Sampling semantics are identical to engine/decode.py (HF processor order,
repetition penalty over the seen-token set, the tortoise mel-position
off-by-one), so a row decoded here matches `generate` row-for-row under the
same PRNG key (greedy: exactly).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn
from index_tts_dubbing_tpu.engine import decode as decode_mod
from index_tts_dubbing_tpu.engine.decode import SamplingConfig
from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.models.gpt import GPTConfig, KVCache

Params = Dict[str, Any]


class CBState(NamedTuple):
    cache: KVCache        # (L, B, H, S, D)
    key_keep: jnp.ndarray  # (B, S) bool — cache slots attention may see
    pos: jnp.ndarray       # (B,) int32 — next cache slot to write
    n_gen: jnp.ndarray     # (B,) int32 — tokens generated so far
    prev: jnp.ndarray      # (B,) int32 — last sampled token
    done: jnp.ndarray      # (B,) bool
    active: jnp.ndarray    # (B,) bool — slot holds a live request
    seen: jnp.ndarray      # (B, V) bool — repetition-penalty set
    tokens: jnp.ndarray    # (B, max_steps) int32
    rng: jax.Array


def init_state(cfg: GPTConfig, sc: SamplingConfig, batch: int, s_total: int,
               rng: jax.Array, dtype=jnp.float32) -> CBState:
    b = batch
    v = cfg.number_mel_codes
    return CBState(
        cache=gpt_model.init_cache(cfg, b, s_total, dtype=dtype),
        key_keep=jnp.zeros((b, s_total), bool),
        pos=jnp.zeros((b,), jnp.int32),
        n_gen=jnp.zeros((b,), jnp.int32),
        prev=jnp.full((b,), cfg.stop_mel_token, jnp.int32),
        done=jnp.ones((b,), bool),
        active=jnp.zeros((b,), bool),
        seen=jnp.zeros((b, v), bool),
        tokens=jnp.full((b, sc.max_mel_tokens), cfg.stop_mel_token, jnp.int32),
        rng=rng,
    )


@partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Params, cfg: GPTConfig, emb: jnp.ndarray,
            pad_keep: jnp.ndarray) -> Tuple[jnp.ndarray, KVCache]:
    """Batched prefix forward at bucket width S0. Returns (h_last (B, C),
    kv (L, B, H, S0, D)). Requests sharing a prefix bucket are prefetched in
    power-of-two groups — one dispatch instead of one per request (each
    dispatch costs ~30 ms RTT on the remote link)."""
    b, s0 = emb.shape[:2]
    cache = gpt_model.init_cache(cfg, b, s0, dtype=emb.dtype)
    h, cache = gpt_model.trunk_prefill(params, cfg, emb, pad_keep, cache)
    return h, cache


@partial(jax.jit, static_argnames=("cfg", "sc"), donate_argnames=("state",))
def insert(params: Params, cfg: GPTConfig, sc: SamplingConfig,
           state: CBState, row: jnp.ndarray, h_last: jnp.ndarray,
           kv: KVCache, pad_keep: jnp.ndarray) -> CBState:
    """Install a prefilled request into slot ``row`` and sample its first
    token. ``pad_keep`` (1, S0) marks real (non-pad) prefix slots."""
    s0 = kv.k.shape[3]
    b, s_total = state.key_keep.shape
    k = jax.lax.dynamic_update_slice(
        state.cache.k, kv.k.astype(state.cache.k.dtype), (0, row, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(
        state.cache.v, kv.v.astype(state.cache.v.dtype), (0, row, 0, 0, 0))

    keep_row = jnp.zeros((s_total,), bool).at[:s0].set(pad_keep[0])
    key_keep = jax.lax.dynamic_update_slice(
        state.key_keep, keep_row[None], (row, 0))

    seen_row = jnp.zeros((state.seen.shape[1],), bool)
    seen_row = seen_row.at[sc.fake_prefix_id].set(True)
    seen_row = seen_row.at[cfg.start_mel_token].set(True)

    rng, sub = jax.random.split(state.rng)
    logits = gpt_model.mel_logits_from_hidden(params, h_last)  # (1, V)
    logits = decode_mod._process_logits(logits, seen_row[None], sc)
    if sc.do_sample:
        tok0 = jax.random.categorical(sub, logits, axis=-1)[0]
    else:
        tok0 = jnp.argmax(logits, axis=-1)[0]
    tok0 = tok0.astype(jnp.int32)
    seen_row = seen_row.at[tok0].set(True)

    tokens_row = jnp.full((state.tokens.shape[1],), cfg.stop_mel_token,
                          jnp.int32).at[0].set(tok0)
    return CBState(
        cache=KVCache(k, v),
        key_keep=key_keep,
        pos=state.pos.at[row].set(s0),
        n_gen=state.n_gen.at[row].set(1),
        prev=state.prev.at[row].set(tok0),
        done=state.done.at[row].set(tok0 == cfg.stop_mel_token),
        active=state.active.at[row].set(True),
        seen=jax.lax.dynamic_update_slice(state.seen, seen_row[None], (row, 0)),
        tokens=jax.lax.dynamic_update_slice(state.tokens, tokens_row[None],
                                            (row, 0)),
        rng=rng,
    )


def _step(params: Params, cfg: GPTConfig, sc: SamplingConfig,
          state: CBState) -> CBState:
    """One decode step over all B slots with per-row positions."""
    b, s_total = state.key_keep.shape
    live = state.active & ~state.done
    # embed prev token; generated token n (1-based) sits at mel position n+1
    mel_pos_idx = jnp.clip(state.n_gen + 1, 0,
                           params["mel_pos"]["w"].shape[0] - 1)
    x = (jnp.take(params["mel_emb"]["w"], state.prev, axis=0)
         + jnp.take(params["mel_pos"]["w"], mel_pos_idx, axis=0))
    x = x.astype(state.cache.k.dtype)

    pos = jnp.clip(state.pos, 0, s_total - 1)
    # this step's slot becomes visible for live rows
    key_keep = state.key_keep.at[jnp.arange(b), pos].max(live)
    kbias = jnp.where(key_keep, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    blocks = params["blocks"]
    k_all, v_all = state.cache.k, state.cache.v
    rows = jnp.arange(b)
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h[:, None, :])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = nn.split_heads(q, cfg.heads)            # (B, H, 1, D)
        k = nn.split_heads(k, cfg.heads)[:, :, 0]   # (B, H, D)
        v = nn.split_heads(v, cfg.heads)[:, :, 0]
        k_all = k_all.at[li, rows[:, None], jnp.arange(cfg.heads)[None, :],
                         pos[:, None]].set(k.astype(k_all.dtype))
        v_all = v_all.at[li, rows[:, None], jnp.arange(cfg.heads)[None, :],
                         pos[:, None]].set(v.astype(v_all.dtype))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_all[li].astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        logits = logits + kbias
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v_all[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        x = x + nn.linear(blk["attn"]["proj"], nn.merge_heads(o)[:, 0, :])
        x = x + nn.linear(blk["mlp"]["proj"],
                          gpt_model._act(cfg, nn.linear(
                              blk["mlp"]["fc"], nn.layer_norm(blk["ln2"], x))))
    h = nn.layer_norm(params["ln_f"], x)

    rng, sub = jax.random.split(state.rng)
    logits = gpt_model.mel_logits_from_hidden(params, h)
    logits = decode_mod._process_logits(logits, state.seen, sc)
    if sc.do_sample:
        tok = jax.random.categorical(sub, logits, axis=-1)
    else:
        tok = jnp.argmax(logits, axis=-1)
    tok = jnp.where(live, tok.astype(jnp.int32), cfg.stop_mel_token)

    write_idx = jnp.clip(state.n_gen, 0, state.tokens.shape[1] - 1)
    tokens = jnp.where(
        live[:, None],
        state.tokens.at[rows, write_idx].set(tok), state.tokens)
    seen = state.seen.at[rows, tok].max(live)
    hit_cap = state.n_gen + 1 >= sc.max_mel_tokens
    newly_done = live & ((tok == cfg.stop_mel_token) | hit_cap)
    return CBState(
        cache=KVCache(k_all, v_all),
        key_keep=key_keep,
        pos=jnp.where(live, pos + 1, state.pos),
        n_gen=jnp.where(live, state.n_gen + 1, state.n_gen),
        prev=jnp.where(live, tok, state.prev),
        done=state.done | newly_done,
        active=state.active,
        seen=seen,
        tokens=tokens,
        rng=rng,
    )


@partial(jax.jit, static_argnames=("cfg", "sc", "steps"),
         donate_argnames=("state",))
def decode_chunk(params: Params, cfg: GPTConfig, sc: SamplingConfig,
                 state: CBState, steps: int) -> CBState:
    def cond(carry):
        i, st = carry
        return (i < steps) & jnp.any(st.active & ~st.done)

    def wbody(carry):
        i, st = carry
        return i + 1, _step(params, cfg, sc, st)

    _, state = jax.lax.while_loop(cond, wbody, (jnp.int32(0), state))
    return state


@dataclass
class CBRequest:
    uid: int
    text_ids: np.ndarray


class ContinuousBatcher:
    """Host orchestrator: feeds a request queue through B decode slots.

    ``run`` returns {uid: (codes (n,), length)} with the same token semantics
    as engine.decode.generate. Conditioning latents are shared across
    requests (one speaker prompt per batch run, like the reference engine).
    """

    def __init__(self, params: Params, cfg: GPTConfig, sc: SamplingConfig,
                 conds: jnp.ndarray, batch: int = 8, chunk: int = 32,
                 text_buckets: Sequence[int] = (16, 32, 48, 64, 80, 96, 120),
                 rng: Optional[jax.Array] = None):
        self.params = gpt_model.stack_blocks(params)
        self.cfg = cfg
        self.sc = sc
        self.conds = conds
        self.batch = batch
        self.chunk = chunk
        self.text_buckets = tuple(text_buckets)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

    def _bucket(self, n: int) -> int:
        return next((b for b in self.text_buckets if b >= n), n)

    def _prefill_group(self, reqs: List[CBRequest]):
        """Prefill several same-bucket requests in ONE batched dispatch;
        yields per-request (h (1,C), kv (L,1,H,S0,D), keep (1,S0))."""
        pad_to = max(self._bucket(r.text_ids.size) for r in reqs)
        pre = decode_mod.prepare_prefix_host(
            self.cfg, [r.text_ids for r in reqs], pad_to=pad_to)
        emb, keep = decode_mod.build_prefix_emb(
            self.params, self.cfg, self.conds, jnp.asarray(pre["ids"]),
            jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
            jnp.asarray(pre["cond_idx"]))
        h, kv = prefill(self.params, self.cfg, emb, keep)
        for i in range(len(reqs)):
            yield (h[i:i + 1], KVCache(kv.k[:, i:i + 1], kv.v[:, i:i + 1]),
                   keep[i:i + 1])

    def run(self, requests: Sequence[CBRequest], dtype=jnp.float32
            ) -> Dict[int, Tuple[np.ndarray, int]]:
        cfg, sc = self.cfg, self.sc
        queue: List[CBRequest] = list(requests)
        max_prefix = max((self._bucket(r.text_ids.size) for r in queue),
                         default=0) + 2 + cfg.condition_num_latent + 1
        s_total = max_prefix + sc.max_mel_tokens
        self.rng, sub = jax.random.split(self.rng)
        state = init_state(cfg, sc, self.batch, s_total, sub, dtype=dtype)
        slot_uid: List[Optional[int]] = [None] * self.batch
        results: Dict[int, Tuple[np.ndarray, int]] = {}

        def fill_free_slots(state):
            free = [r for r in range(self.batch) if slot_uid[r] is None]
            take = queue[:len(free)]
            del queue[:len(take)]
            # group same-bucket requests, prefill each group in power-of-two
            # batched dispatches, then install row by row
            by_bucket: Dict[int, List[CBRequest]] = {}
            for req in take:
                by_bucket.setdefault(self._bucket(req.text_ids.size),
                                     []).append(req)
            it_free = iter(free)
            for _, reqs in sorted(by_bucket.items()):
                i0 = 0
                while i0 < len(reqs):
                    n = 1 << ((len(reqs) - i0).bit_length() - 1)
                    group = reqs[i0:i0 + n]
                    i0 += n
                    for req, (h, kv, keep) in zip(
                            group, self._prefill_group(group)):
                        row = next(it_free)
                        state = insert(self.params, cfg, sc, state,
                                       jnp.int32(row), h, kv, keep)
                        slot_uid[row] = req.uid
            return state

        state = fill_free_slots(state)
        while any(u is not None for u in slot_uid):
            state = decode_chunk(self.params, cfg, sc, state, self.chunk)
            done = np.asarray(state.done)
            active = np.asarray(state.active)
            if np.any(done & active):
                tokens = np.asarray(state.tokens)
                n_gen = np.asarray(state.n_gen)
                for row in range(self.batch):
                    if slot_uid[row] is not None and done[row]:
                        row_tok = tokens[row]
                        stops = np.nonzero(row_tok == cfg.stop_mel_token)[0]
                        ln = int(stops[0]) if stops.size else int(n_gen[row])
                        results[slot_uid[row]] = (row_tok.copy(), ln)
                        slot_uid[row] = None
                        state = state._replace(
                            active=state.active.at[row].set(False))
                state = fill_free_slots(state)
        return results

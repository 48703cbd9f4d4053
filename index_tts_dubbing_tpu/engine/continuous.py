"""Continuous batching over the AR decoder: fixed B decode slots, rows are
refilled from a DEVICE-RESIDENT request queue the moment they finish.

This is the TPU-native replacement for the dubbing layer's per-segment
sequential synthesis (reference: srt_dubbing strategies call one full
``IndexTTS.infer`` per SRT entry — cli.py:25-177, basic_strategy.py:17-100)
and goes beyond the reference's static bucketing (infer.py:188-243), which
waits for the longest row of every bucket: here a finished row's slot is
immediately re-used by the next pending request, so heterogeneous SRT
segment lengths no longer serialise the chip.

Design (all static shapes):
- ``prefill`` — batched trunk forward at a bucketed prefix width; ALL
  requests are prefilled up-front in power-of-two groups and parked in a
  device-resident queue (per-request K/V block, first token, keep mask);
- ``cb_run`` — ONE jitted while_loop runs the whole workload: every step
  decodes all B slots (per-row positions/done flags); a finished row's
  tokens are scattered into the per-request result buffer and its slot is
  refilled from the queue INSIDE the loop (lax.cond-gated, so the refill's
  cache writes happen only on the ~N steps where a refill occurs). Zero
  host round-trips between the first token and the last.
- ``insert`` / ``decode_chunk`` — the r02 host-refill primitives, kept for
  the incremental API; ``run`` now uses the device queue. r02's host
  refills paid 2×~30 ms dispatch RTT per request plus a host sync per
  chunk, which made CB LOSE to plain bucketing even on its target
  workload (docs/PERFORMANCE_NOTES.md r02 table) — the device-side queue
  removes exactly those costs. Per-request ``max_new`` caps support
  duration-targeted dubbing workloads.

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
    row_max: jnp.ndarray   # (B,) int32 — per-request generation cap
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
        row_max=jnp.full((b,), sc.max_mel_tokens, jnp.int32),
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
           kv: KVCache, pad_keep: jnp.ndarray,
           max_new: Optional[jnp.ndarray] = None) -> CBState:
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
        row_max=state.row_max.at[row].set(
            jnp.int32(sc.max_mel_tokens) if max_new is None
            else max_new.astype(jnp.int32)),
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
    hit_cap = state.n_gen + 1 >= jnp.minimum(state.row_max,
                                             sc.max_mel_tokens)
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
        row_max=state.row_max,
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




class CBQueue(NamedTuple):
    """Device-resident prefilled request queue (all rows padded to one
    prefix width S0max; per-request real width in ``pos``)."""
    kv_k: jnp.ndarray      # (L, N, H, S0max, D)
    kv_v: jnp.ndarray
    keep: jnp.ndarray      # (N, S0max) bool — real prefix slots
    tok0: jnp.ndarray      # (N,) int32 — first sampled token
    seen0: jnp.ndarray     # (N, V) bool — rep-penalty set incl. tok0
    pos: jnp.ndarray       # (N,) int32 — next cache slot (= real s0)
    max_new: jnp.ndarray   # (N,) int32 — per-request cap


@partial(jax.jit, static_argnames=("cfg", "sc"))
def queue_first_tokens(params: Params, cfg: GPTConfig, sc: SamplingConfig,
                       h: jnp.ndarray, rng: jax.Array
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample every queued request's first token in one batched call.
    h (N, C) → (tok0 (N,), seen0 (N, V))."""
    n = h.shape[0]
    v = cfg.number_mel_codes
    seen = jnp.zeros((n, v), bool)
    seen = seen.at[:, sc.fake_prefix_id].set(True)
    seen = seen.at[:, cfg.start_mel_token].set(True)
    logits = gpt_model.mel_logits_from_hidden(params, h)
    logits = decode_mod._process_logits(logits, seen, sc)
    if sc.do_sample:
        tok0 = jax.random.categorical(rng, logits, axis=-1)
    else:
        tok0 = jnp.argmax(logits, axis=-1)
    tok0 = tok0.astype(jnp.int32)
    seen = seen.at[jnp.arange(n), tok0].set(True)
    return tok0, seen


def _cb_run_impl(params: Params, cfg: GPTConfig, sc: SamplingConfig,
                 state: CBState, queue: CBQueue, slot_req: jnp.ndarray,
                 next_req: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the WHOLE workload in one while_loop: decode all B slots each
    step; finished rows flush their tokens to the per-request result buffer
    and refill from the device queue inside the loop. Returns
    (out_tokens (N, max_steps), out_ngen (N,))."""
    b, s_total = state.key_keep.shape
    n_req = queue.tok0.shape[0]
    s0max = queue.keep.shape[1]
    max_steps = sc.max_mel_tokens
    rows = jnp.arange(b)

    out_tokens = jnp.full((n_req, max_steps), cfg.stop_mel_token, jnp.int32)
    out_ngen = jnp.zeros((n_req,), jnp.int32)

    def flush_and_refill(state, slot_req, next_req, out_tokens, out_ngen):
        fin = state.active & state.done
        # flush finished rows to their request's result row (OOB index for
        # non-finished rows → scatter drops the update)
        dst = jnp.where(fin, slot_req, n_req)
        out_tokens = out_tokens.at[dst].set(state.tokens, mode="drop")
        out_ngen = out_ngen.at[dst].set(state.n_gen, mode="drop")
        # assign queued requests to finished rows (in row order)
        k_fin = jnp.cumsum(fin) - 1                       # rank among fin
        req_for_row = next_req + k_fin.astype(jnp.int32)
        refill = fin & (req_for_row < n_req)
        req_idx = jnp.where(refill, req_for_row, 0)
        n_refill = jnp.sum(refill).astype(jnp.int32)

        def do_refill(args):
            state, slot_req = args
            gk = queue.kv_k[:, req_idx].astype(state.cache.k.dtype)
            gv = queue.kv_v[:, req_idx].astype(state.cache.v.dtype)
            sel = refill[None, :, None, None, None]
            k = state.cache.k.at[:, :, :, :s0max].set(
                jnp.where(sel, gk, state.cache.k[:, :, :, :s0max]))
            v = state.cache.v.at[:, :, :, :s0max].set(
                jnp.where(sel, gv, state.cache.v[:, :, :, :s0max]))
            keep_new = jnp.zeros((b, s_total), bool
                                 ).at[:, :s0max].set(queue.keep[req_idx])
            key_keep = jnp.where(refill[:, None], keep_new, state.key_keep)
            tok0 = queue.tok0[req_idx]
            tokens_new = jnp.full((b, max_steps), cfg.stop_mel_token,
                                  jnp.int32).at[:, 0].set(tok0)
            state = CBState(
                cache=KVCache(k, v),
                key_keep=key_keep,
                pos=jnp.where(refill, queue.pos[req_idx], state.pos),
                n_gen=jnp.where(refill, 1, state.n_gen),
                prev=jnp.where(refill, tok0, state.prev),
                done=jnp.where(refill, tok0 == cfg.stop_mel_token,
                               state.done),
                active=jnp.where(fin, refill, state.active),
                seen=jnp.where(refill[:, None], queue.seen0[req_idx],
                               state.seen),
                tokens=jnp.where(refill[:, None], tokens_new, state.tokens),
                row_max=jnp.where(refill, queue.max_new[req_idx],
                                  state.row_max),
                rng=state.rng,
            )
            return state, jnp.where(refill, req_idx, slot_req)

        def no_refill(args):
            state, slot_req = args
            return state._replace(active=state.active & ~fin), slot_req

        state, slot_req = jax.lax.cond(
            jnp.any(fin), do_refill, no_refill, (state, slot_req))
        return state, slot_req, next_req + n_refill, out_tokens, out_ngen

    def cond_fn(carry):
        state = carry[0]
        next_req = carry[2]
        return jnp.any(state.active & ~state.done) | (next_req < n_req)

    def body_fn(carry):
        state, slot_req, next_req, out_tokens, out_ngen = carry
        state = _step(params, cfg, sc, state)
        return flush_and_refill(state, slot_req, next_req, out_tokens,
                                out_ngen)

    # rows may already be done right after install (stop as first token)
    carry = flush_and_refill(state, slot_req, next_req, out_tokens, out_ngen)
    carry = jax.lax.while_loop(cond_fn, body_fn, carry)
    return carry[3], carry[4]


cb_run = partial(jax.jit, static_argnames=("cfg", "sc"),
                 donate_argnames=("state",))(_cb_run_impl)
# Under a mesh the host-built state buffers (default placement) never match
# the GSPMD-chosen output shardings, so donation is unusable and XLA warns
# "Some donated buffers were not usable" on every trace — the mesh path
# runs the identical program WITHOUT donation instead (the state is small
# at serving scale; donation there bought nothing).
cb_run_nodonate = partial(jax.jit,
                          static_argnames=("cfg", "sc"))(_cb_run_impl)


@dataclass
class CBRequest:
    uid: int
    text_ids: np.ndarray
    # optional per-request generation cap (duration-targeted dubbing); None
    # → sc.max_mel_tokens
    max_new: Optional[int] = None


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

    def run(self, requests: Sequence[CBRequest], dtype=jnp.float32,
            max_queue: int = 64) -> Dict[int, Tuple[np.ndarray, int]]:
        """Synthesize every request; returns {uid: (codes, length)}.

        All requests (per wave of ≤ max_queue, bounding the device queue's
        HBM footprint) are prefilled up-front in power-of-two batched calls,
        parked in a device-resident CBQueue, and decoded by ONE cb_run
        program — slot refills happen inside the device loop."""
        results: Dict[int, Tuple[np.ndarray, int]] = {}
        reqs = list(requests)
        for w0 in range(0, len(reqs), max_queue):
            results.update(self._run_wave(reqs[w0:w0 + max_queue], dtype))
        return results

    def _run_wave(self, reqs: List[CBRequest], dtype
                  ) -> Dict[int, Tuple[np.ndarray, int]]:
        cfg, sc = self.cfg, self.sc
        n_req = len(reqs)
        if n_req == 0:
            return {}
        pad_to = max(self._bucket(r.text_ids.size) for r in reqs)
        # prefill in power-of-two groups at ONE common width (pads are
        # attention-masked; uniform width keeps the queue a single array)
        ks, vs, keeps, hs = [], [], [], []
        i0 = 0
        while i0 < n_req:
            g = 1 << ((n_req - i0).bit_length() - 1)
            group = reqs[i0:i0 + g]
            i0 += g
            pre = decode_mod.prepare_prefix_host(
                cfg, [r.text_ids for r in group], pad_to=pad_to)
            emb, keep = decode_mod.build_prefix_emb(
                self.params, cfg, self.conds, jnp.asarray(pre["ids"]),
                jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
                jnp.asarray(pre["cond_idx"]))
            h, kv = prefill(self.params, cfg, emb.astype(dtype), keep)
            ks.append(kv.k); vs.append(kv.v); keeps.append(keep); hs.append(h)
        kv_k = ks[0] if len(ks) == 1 else jnp.concatenate(ks, axis=1)
        kv_v = vs[0] if len(vs) == 1 else jnp.concatenate(vs, axis=1)
        keep = keeps[0] if len(keeps) == 1 else jnp.concatenate(keeps, axis=0)
        h_all = hs[0] if len(hs) == 1 else jnp.concatenate(hs, axis=0)
        s0 = int(keep.shape[1])

        self.rng, k_first, k_state = jax.random.split(self.rng, 3)
        tok0, seen0 = queue_first_tokens(self.params, cfg, sc, h_all, k_first)
        queue = CBQueue(
            kv_k=kv_k, kv_v=kv_v, keep=keep, tok0=tok0, seen0=seen0,
            pos=jnp.full((n_req,), s0, jnp.int32),
            max_new=jnp.asarray(
                [min(r.max_new or sc.max_mel_tokens, sc.max_mel_tokens)
                 for r in reqs], jnp.int32))

        b = self.batch
        state = init_state(cfg, sc, b, s0 + sc.max_mel_tokens, k_state,
                           dtype=dtype)
        # all slots start as finished dummies flushing to the OOB result
        # row — cb_run's pre-loop flush installs the first B requests
        state = state._replace(active=jnp.ones((b,), bool))
        slot_req = jnp.full((b,), n_req, jnp.int32)
        from jax.interpreters import pxla
        in_mesh = not pxla.thread_resources.env.physical_mesh.empty
        run_fn = cb_run_nodonate if in_mesh else cb_run
        out_tokens, out_ngen = run_fn(self.params, cfg, sc, state, queue,
                                      slot_req, jnp.int32(0))
        out_tokens = np.asarray(out_tokens)
        out_ngen = np.asarray(out_ngen)
        results: Dict[int, Tuple[np.ndarray, int]] = {}
        for i, r in enumerate(reqs):
            row = out_tokens[i]
            stops = np.nonzero(row == cfg.stop_mel_token)[0]
            ln = int(stops[0]) if stops.size else int(out_ngen[i])
            results[r.uid] = (row.copy(), ln)
        return results

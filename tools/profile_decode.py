"""Attribute decode-step cost on the real chip.

Runs K decode steps inside one jitted fori_loop for several ablations:
  full        — the real trunk_decode_step (attention over full cache + MLP)
  no_attn     — matmuls only (qkv/proj/fc/proj), no cache read, no softmax
  attn_only   — cache read + softmax only, no MLP
  cache_noupd — full step but skip the dynamic_update_slice into the cache
  logits      — mel head + sampling pipeline per step

Usage: python tools/profile_decode.py [B] [S_total]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu import nn
from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.models.gpt import GPTConfig
from index_tts_dubbing_tpu.utils import jax_setup  # noqa: F401  (comp cache)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
K = 64  # steps per timed dispatch

cfg = GPTConfig()
rng = np.random.default_rng(0)


def host_params():
    d = cfg.model_dim
    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)
    blocks = []
    for _ in range(cfg.layers):
        blocks.append({
            "ln1": {"g": np.ones((d,), np.float32), "b": np.zeros((d,), np.float32)},
            "attn": {"qkv": {"w": w(d, 3 * d), "b": np.zeros((3 * d,), np.float32)},
                     "proj": {"w": w(d, d), "b": np.zeros((d,), np.float32)}},
            "ln2": {"g": np.ones((d,), np.float32), "b": np.zeros((d,), np.float32)},
            "mlp": {"fc": {"w": w(d, 4 * d), "b": np.zeros((4 * d,), np.float32)},
                    "proj": {"w": w(4 * d, d), "b": np.zeros((d,), np.float32)}},
        })
    p = {"blocks": blocks,
         "ln_f": {"g": np.ones((d,), np.float32), "b": np.zeros((d,), np.float32)},
         "final_norm": {"g": np.ones((d,), np.float32), "b": np.zeros((d,), np.float32)},
         "mel_head": {"w": w(d, cfg.number_mel_codes),
                      "b": np.zeros((cfg.number_mel_codes,), np.float32)}}
    return gpt_model.stack_blocks(p)


params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16)
                      if a.ndim >= 2 else jnp.asarray(a), host_params())
cache = gpt_model.init_cache(cfg, B, S, dtype=jnp.bfloat16)
x0 = jnp.asarray(rng.standard_normal((B, cfg.model_dim)), jnp.bfloat16)
keep = jnp.ones((B, S), bool)


def step_full(x, cache, pos):
    return gpt_model.trunk_decode_step(params, cfg, x, cache, pos, keep)


def step_no_attn(x, cache, pos):
    import math
    blocks = params["blocks"]
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h)
        q = qkv[..., :cfg.model_dim]
        x = x + nn.linear(blk["attn"]["proj"], q)
        x = x + nn.linear(blk["mlp"]["proj"],
                          nn.gelu_tanh(nn.linear(blk["mlp"]["fc"],
                                                 nn.layer_norm(blk["ln2"], x))))
    return nn.layer_norm(params["ln_f"], x), cache


def step_attn_only(x, cache, pos):
    import math
    kbias = jnp.where(keep, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    scale = 1.0 / 8.0
    for li in range(cfg.layers):
        q = x.reshape(B, cfg.heads, 1, cfg.head_dim)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q,
                            cache.k[li].astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        logits = logits + kbias
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, cache.v[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        x = x + o.reshape(B, cfg.model_dim)
    return x, cache


def step_cache_noupd(x, cache, pos):
    import math
    kbias = jnp.where(keep, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    blocks = params["blocks"]
    for li in range(cfg.layers):
        blk = jax.tree.map(lambda a: a[li], blocks)
        h = nn.layer_norm(blk["ln1"], x)
        qkv = nn.linear(blk["attn"]["qkv"], h[:, None, :])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = nn.split_heads(q, cfg.heads)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, cache.k[li].astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        logits = logits + kbias
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, cache.v[li].astype(x.dtype),
                       preferred_element_type=x.dtype)
        x = x + nn.linear(blk["attn"]["proj"], nn.merge_heads(o)[:, 0, :])
        x = x + nn.linear(blk["mlp"]["proj"],
                          nn.gelu_tanh(nn.linear(blk["mlp"]["fc"],
                                                 nn.layer_norm(blk["ln2"], x))))
    return nn.layer_norm(params["ln_f"], x), cache


def step_logits(x, cache, pos):
    from index_tts_dubbing_tpu.engine import decode as dec
    logits = gpt_model.mel_logits_from_hidden(params, x)
    sc = dec.SamplingConfig()
    seen = jnp.zeros((B, cfg.number_mel_codes), bool)
    logits = dec._process_logits(logits, seen, sc)
    tok = jax.random.categorical(jax.random.PRNGKey(0), logits, axis=-1)
    return x + tok[:, None].astype(x.dtype) * 0, cache


def make_loop(stepname):
    @jax.jit
    def run(params_, x, cache):
        step = STEPS[stepname]
        def body(i, carry):
            x, cache = carry
            x, cache = step(params_, x, cache, i + 600)
            return (x, cache)
        return jax.lax.fori_loop(0, K, body, (x, cache))
    return run


STEPS = {}


def _wrap(fn):
    def stepfn(params_, x, cache, pos):
        global params
        old = params
        params = params_
        try:
            return fn(x, cache, pos)
        finally:
            params = old
    return stepfn


for name, fn in [("full", step_full), ("cache_noupd", step_cache_noupd),
                 ("no_attn", step_no_attn), ("attn_only", step_attn_only),
                 ("logits", step_logits)]:
    STEPS[name] = _wrap(fn)

params_arg = params

for name in ["full", "cache_noupd", "no_attn", "attn_only", "logits"]:
    run = make_loop(name)
    t0 = time.perf_counter()
    out = run(params_arg, x0, cache)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params_arg, x0, cache)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    per_step = min(times) / K * 1e3
    print(f"{name:12s} compile {compile_s:6.1f}s  per-step {per_step:7.3f} ms"
          f"  ({K} steps, best of 3)", flush=True)


# ---------------------------------------------------------------------------
# Bisect the real generate() body: trunk + sampling pipeline + state updates
# ---------------------------------------------------------------------------
from index_tts_dubbing_tpu.engine import decode as dec

SC = dec.SamplingConfig()
VOCAB = cfg.number_mel_codes


def run_variant(name, with_rng_split, with_seen, with_process, with_tokens,
                while_loop=False):
    max_steps = K

    @jax.jit
    def run(params_, prefix_x, cache):
        seen0 = jnp.zeros((B, VOCAB), bool)
        tokens0 = jnp.full((B, max_steps), cfg.stop_mel_token, jnp.int32)
        key0 = jax.random.PRNGKey(0)
        prev0 = jnp.full((B,), 100, jnp.int32)
        done0 = jnp.zeros((B,), bool)

        def body(state):
            j, tokens, prev, done, cache, seen, key, x = state
            if with_rng_split:
                key, sub = jax.random.split(key)
            else:
                sub = key
            emb = (jnp.take(params_["blocks"]["mlp"]["proj"]["b"][0][None],
                            prev * 0, axis=0)
                   + x)  # stand-in embed lookup cost ~0
            hh, cache = gpt_model.trunk_decode_step(params_, cfg, emb, cache,
                                                    j + 600, keep)
            logits = gpt_model.mel_logits_from_hidden(params_, hh)
            if with_process:
                logits = dec._process_logits(logits, seen, SC)
            else:
                logits = logits.astype(jnp.float32)
            tok = jax.random.categorical(sub, logits, axis=-1)
            tok = jnp.where(done, cfg.stop_mel_token, tok)
            if with_tokens:
                tokens = tokens.at[:, j].set(tok.astype(jnp.int32))
            if with_seen:
                seen = seen.at[jnp.arange(B), tok].set(True)
            done = done | (tok == cfg.stop_mel_token + 10000)
            return (j + 1, tokens, tok.astype(jnp.int32), done, cache, seen,
                    key, x)

        state = (jnp.int32(0), tokens0, prev0, done0, cache, seen0, key0,
                 prefix_x)
        if while_loop:
            def cond(state):
                return (state[0] < max_steps) & (~jnp.all(state[3]))
            state = jax.lax.while_loop(cond, body, state)
        else:
            state = jax.lax.fori_loop(0, max_steps,
                                      lambda i, s: body(s), state)
        return state[1], state[4].k

    t0 = time.perf_counter()
    out = run(params_arg, x0, cache)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params_arg, x0, cache)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    per_step = min(times) / K * 1e3
    print(f"{name:22s} compile {compile_s:6.1f}s  per-step {per_step:7.3f} ms",
          flush=True)


if "--body" in sys.argv:
    run_variant("trunk+cat", False, False, False, False)
    run_variant("+process", False, False, True, False)
    run_variant("+seen", False, True, True, False)
    run_variant("+rng_split", True, True, True, False)
    run_variant("+tokens(all)", True, True, True, True)
    run_variant("all+while_loop", True, True, True, True, while_loop=True)

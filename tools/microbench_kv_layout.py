"""Microbenchmark: decode-step attention cost vs KV-cache memory layout.

The decode step is cache-read bound at long S. The current layout
(L, B, H, S, D=64) leaves half the 128 vector lanes idle on cache loads
(minor dim 64 < 128 for bf16 tiles). Candidates:

  A  (B, H, S, D)   — current layout
  B  (B, S, H*D)    — full-lane minor dim (1024); reshape to heads in-step
  C  (B, S, H, D)   — S-major, heads next to D

Each variant runs a 20-layer unrolled decode step inside a lax.while_loop
for N steps (the production shape of engine/decode.py:generate), B=4,
S=1088, bf16. Prints per-step ms per variant.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

L, B, H, D, S = 20, 4, 16, 64, 1088
C = H * D
STEPS = 200
DTYPE = jnp.bfloat16


def make_params(key):
    ks = jax.random.split(key, 4)
    scale = 0.02
    return {
        "qkv": jax.random.normal(ks[0], (L, C, 3 * C), DTYPE) * scale,
        "proj": jax.random.normal(ks[1], (L, C, C), DTYPE) * scale,
        "fc": jax.random.normal(ks[2], (L, C, 4 * C), DTYPE) * scale,
        "fc2": jax.random.normal(ks[3], (L, 4 * C, C), DTYPE) * scale,
    }


def step_bhsd(params, x, k_all, v_all, pos, kbias):
    scale = 1.0 / np.sqrt(D)
    for li in range(L):
        qkv = x @ params["qkv"][li]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, H, 1, D)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.reshape(B, H, 1, D)[None], (li, 0, 0, pos, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.reshape(B, H, 1, D)[None], (li, 0, 0, pos, 0))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_all[li],
                            preferred_element_type=jnp.float32) * scale
        logits = logits + kbias[:, None, None, :]
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v_all[li],
                       preferred_element_type=x.dtype)
        x = x + o.reshape(B, C) @ params["proj"][li]
        h = jnp.maximum(x @ params["fc"][li], 0)
        x = x + h @ params["fc2"][li]
    return x, k_all, v_all


def step_bsc(params, x, k_all, v_all, pos, kbias):
    scale = 1.0 / np.sqrt(D)
    for li in range(L):
        qkv = x @ params["qkv"][li]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, H, 1, D)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.reshape(B, 1, C)[None], (li, 0, pos, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.reshape(B, 1, C)[None], (li, 0, pos, 0))
        kh = k_all[li].reshape(B, S, H, D)
        vh = v_all[li].reshape(B, S, H, D)
        logits = jnp.einsum("bhqd,bshd->bhqs", q, kh,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + kbias[:, None, None, :]
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqs,bshd->bhqd", w, vh,
                       preferred_element_type=x.dtype)
        x = x + o.reshape(B, C) @ params["proj"][li]
        h = jnp.maximum(x @ params["fc"][li], 0)
        x = x + h @ params["fc2"][li]
    return x, k_all, v_all


def step_bshd(params, x, k_all, v_all, pos, kbias):
    scale = 1.0 / np.sqrt(D)
    for li in range(L):
        qkv = x @ params["qkv"][li]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, H, 1, D)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.reshape(B, 1, H, D)[None], (li, 0, pos, 0, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.reshape(B, 1, H, D)[None], (li, 0, pos, 0, 0))
        logits = jnp.einsum("bhqd,bshd->bhqs", q, k_all[li],
                            preferred_element_type=jnp.float32) * scale
        logits = logits + kbias[:, None, None, :]
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqs,bshd->bhqd", w, v_all[li],
                       preferred_element_type=x.dtype)
        x = x + o.reshape(B, C) @ params["proj"][li]
        h = jnp.maximum(x @ params["fc"][li], 0)
        x = x + h @ params["fc2"][li]
    return x, k_all, v_all


def run(name, step_fn, cache_shape):
    params = make_params(jax.random.PRNGKey(0))

    @jax.jit
    def loop(params, x0, k0, v0):
        kbias = jnp.zeros((B, S), jnp.float32)

        def body(state):
            j, x, k_all, v_all = state
            x, k_all, v_all = step_fn(params, x, k_all, v_all, j, kbias)
            return j + 1, x, k_all, v_all

        def cond(state):
            return state[0] < STEPS

        _, x, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, k0, v0))
        return x

    k0 = jnp.zeros(cache_shape, DTYPE)
    v0 = jnp.zeros(cache_shape, DTYPE)

    def x_init(i):
        x = jnp.ones((B, C), DTYPE) * (0.01 * (i + 1))
        np.asarray(x)
        return x

    # sync via host transfer: on the remote (axon) backend
    # block_until_ready returns before execution completes
    t0 = time.perf_counter()
    np.asarray(loop(params, x_init(0), k0, v0))
    t_compile = time.perf_counter() - t0
    times = []
    for i in range(3):
        x0 = x_init(i + 1)
        t0 = time.perf_counter()
        np.asarray(loop(params, x0, k0, v0))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:8s} compile {t_compile:6.1f}s  "
          f"{best / STEPS * 1e3:6.3f} ms/step  (runs {['%.3f' % t for t in times]})",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["bhsd", "bsc", "bshd"]
    shapes = {
        "bhsd": (step_bhsd, (L, B, H, S, D)),
        "bsc": (step_bsc, (L, B, S, C)),
        "bshd": (step_bshd, (L, B, S, H, D)),
    }
    for name in which:
        fn, shape = shapes[name]
        run(name, fn, shape)

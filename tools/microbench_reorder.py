"""Microbench: KV-cache beam-reorder primitive cost OUTSIDE the decode loop.

Isolates whether the ~40 ms/step beam reorder cost (tools/profile_beam_step.py
at 192 steps) comes from the gather's TPU lowering itself or from while_loop
buffer aliasing, by timing the raw primitives standalone:

  take      jnp.take(gen_block) + dynamic_update_slice (the "flat" strategy)
  takefull  jnp.take over the whole cache ("flatfull")
  copy      slice + identity + DUS (no gather: pure aliasing/copy cost)
  dsloop    per-row jax.lax.dynamic_slice_in_dim loop (unrolled, 48 rows)

Usage: python tools/microbench_reorder.py [steps=192] [bn=48]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    bn = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    L, H, D = 20, 16, 64
    s0 = 83
    s_total = s0 + steps

    rng = np.random.default_rng(0)
    k_h = rng.standard_normal((L, bn, H, s_total, D)).astype(ml_dtypes.bfloat16)
    # a permutation that stays within groups of 3 (beam groups)
    src = np.arange(bn)
    for g in range(0, bn, 3):
        src[g:g + 3] = g + rng.permutation(3)
    src_h = src.astype(np.int32)

    k = jax.device_put(k_h)
    srcd = jax.device_put(src_h)

    gb = 2 * (L * bn * H * steps * D * 2) / 1e9  # read+write of gen region

    @jax.jit
    def take(arr, s):
        blk = jax.lax.slice_in_dim(arr, s0, s_total, axis=3)
        g = jnp.take(blk, s, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(arr, g, s0, axis=3)

    @jax.jit
    def takefull(arr, s):
        return jnp.take(arr, s, axis=1)

    @jax.jit
    def copy(arr, s):
        blk = jax.lax.slice_in_dim(arr, s0, s_total, axis=3)
        return jax.lax.dynamic_update_slice_in_dim(arr, blk, s0, axis=3)

    @jax.jit
    def dsloop(arr, s):
        blk = jax.lax.slice_in_dim(arr, s0, s_total, axis=3)
        rows = [jax.lax.dynamic_slice_in_dim(blk, s[i], 1, axis=1)
                for i in range(bn)]
        g = jnp.concatenate(rows, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(arr, g, s0, axis=3)

    @jax.jit
    def mm48(arr, s):
        # full-bn one-hot matmul permutation: contraction over ALL bn rows
        # (block-diagonal by construction since src stays in-group) — the
        # cache is read exactly once and the MXU does the permutation
        p = jax.nn.one_hot(s, bn, dtype=arr.dtype)          # (bn_new, bn_old)
        return jnp.einsum("ij,ljhsd->lihsd", p, arr)

    @jax.jit
    def mm48gen(arr, s):
        p = jax.nn.one_hot(s, bn, dtype=arr.dtype)
        blk = jax.lax.slice_in_dim(arr, s0, s_total, axis=3)
        g = jnp.einsum("ij,ljhsd->lihsd", p, blk)
        return jax.lax.dynamic_update_slice_in_dim(arr, g, s0, axis=3)

    for name, fn in [("take", take), ("takefull", takefull),
                     ("copy", copy), ("dsloop", dsloop),
                     ("mm48", mm48), ("mm48gen", mm48gen)]:
        # chain the output back in (the decode loop's carry pattern) with
        # buffer donation so in-place aliasing is possible, as in while_loop
        fn_d = jax.jit(fn.__wrapped__, donate_argnums=(0,))
        arr = jax.device_put(k_h)
        arr = fn_d(arr, srcd)
        arr.block_until_ready()
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            arr = fn_d(arr, srcd)
        np.asarray(arr[0, 0, 0, 0, :8])  # force a real device sync
        dt = (time.perf_counter() - t0) / n
        print(f"{name:9s}: {dt * 1e3:7.2f} ms  ({gb / dt:.0f} GB/s eff. on "
              f"gen-region traffic)", flush=True)

    # calibration: elementwise op of known traffic (read+write full array)
    @jax.jit
    def addone(arr):
        return arr + 1

    arr = jax.device_put(k_h)
    addone(arr).block_until_ready()
    t0 = time.perf_counter()
    out = arr
    for _ in range(20):
        out = addone(out)
    np.asarray(out[0, 0, 0, 0, :8])
    dt = (time.perf_counter() - t0) / 20
    full_gb = 2 * k_h.nbytes / 1e9
    print(f"addone   : {dt * 1e3:7.2f} ms  ({full_gb / dt:.0f} GB/s)")


if __name__ == "__main__":
    main()

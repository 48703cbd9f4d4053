"""Pallas TPU kernel: beam-ancestry permutation of the gen-region KV cache.

The beam decode loop must permute the generated-region cache rows
(L, BN, H, G, D) by a data-dependent beam→source map each step (the HF
`_reorder_cache` role, reference gpt/model.py:194-207). XLA's lowerings for
this are far off memory speed-of-light at decode shapes (jnp.take ≈ 54 GB/s
effective; the one-hot MXU einsum measured 174 GB/s in this kernel's
development session and 205 GB/s in the chained/donated run recorded in
docs/PERFORMANCE_NOTES.md — same tools/microbench_reorder.py primitive and
540 MB (L, BN, H, G, D) shape, run-to-run spread; the 205 figure is the
canonical one) —
the op is a pure data movement problem, so this kernel does it as slab-level
HBM→HBM DMAs driven by a scalar-prefetched index vector: grid program
(l, i) copies slab ``l·BN + src_idx[i]`` to slab ``l·BN + i`` for both k
and v. No VMEM transit, no gather lowering, no slice/update dance.

The bounded variant restricts the copy to the slots already generated:
gen slots beyond the current step are zero by construction and
permutation-invariant, so G-blocks past the bound are zero-filled without
reading the source — early decode steps then touch only the occupied prefix
of the gen region and the average read traffic halves.

Mosaic alignment notes: DMA slices must respect (sublane, lane) tiling, so
arrays are reshaped so that the dynamically-indexed slab axis is the MAJOR
axis (untiled) — (L·BN, H·G·D) for full-slab copies, (L·BN, H, G·D) for
bounded block copies (minor-dim blocks of gb·D are 128-aligned for D=64).
Reshapes on contiguous axes are free.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.jit
def permute_gen_cache(kg: jnp.ndarray, vg: jnp.ndarray,
                      src_idx: jnp.ndarray):
    """Return (kg', vg') with rows permuted: out[:, i] = in[:, src_idx[i]].

    kg/vg (L, BN, H, G, D); src_idx (BN,) int32. One DMA pair per
    (layer, row) slab — the whole gen region streams HBM→HBM exactly once
    per array.
    """
    shape = kg.shape
    L, bn, h = shape[0], shape[1], shape[2]
    # rank-3 with the dynamically-indexed slab axis MAJOR (untiled) and a
    # lane dim that is a multiple of 128 (G·D); sublane = H
    flat = (L * bn, h, math.prod(shape[3:]))
    kf = kg.reshape(flat)
    vf = vg.reshape(flat)

    def kernel(src_ref, k_in, v_in, k_out, v_out, sem_k, sem_v):
        li = pl.program_id(0)
        i = pl.program_id(1)
        src = li * bn + src_ref[i]
        dst = li * bn + i
        ck = pltpu.make_async_copy(k_in.at[src], k_out.at[dst], sem_k)
        cv = pltpu.make_async_copy(v_in.at[src], v_out.at[dst], sem_v)
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, bn),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )
    out_shape = [jax.ShapeDtypeStruct(flat, kg.dtype),
                 jax.ShapeDtypeStruct(flat, vg.dtype)]
    k2, v2 = pl.pallas_call(kernel, out_shape=out_shape,
                            grid_spec=grid_spec)(src_idx, kf, vf)
    return k2.reshape(shape), v2.reshape(shape)


@partial(jax.jit, static_argnames=("gb",))
def permute_gen_cache_burst(kg: jnp.ndarray, vg: jnp.ndarray,
                            src_idx: jnp.ndarray, bound: jnp.ndarray,
                            gb: int = 64):
    """Burst-DMA variant: one grid program per destination row issues ALL
    its layer/block copies back-to-back (2·L·nblk DMAs in flight on distinct
    semaphores) before waiting — overlapped DMA engines instead of the
    serial issue/wait of the per-slab kernel. G-blocks past ``bound`` (the
    highest written gen slot) are zero-filled without reading the source."""
    L, bn, h, g_len, d = kg.shape
    gb = min(gb, g_len)
    nblk = -(-g_len // gb)
    blk = gb * d
    kf = kg.reshape(L * bn, h, g_len * d)
    vf = vg.reshape(L * bn, h, g_len * d)

    def kernel(src_ref, bound_ref, k_in, v_in, k_out, v_out, sk, sv, zbuf):
        i = pl.program_id(0)
        row = src_ref[i]
        zbuf[...] = jnp.zeros_like(zbuf)
        for g in range(nblk):
            live = g * gb <= bound_ref[0]
            sl = pl.ds(g * blk, blk)

            @pl.when(live)
            def _copy(g=g, sl=sl):
                for li in range(L):
                    pltpu.make_async_copy(
                        k_in.at[li * bn + row, :, sl],
                        k_out.at[li * bn + i, :, sl],
                        sk.at[li, g]).start()
                    pltpu.make_async_copy(
                        v_in.at[li * bn + row, :, sl],
                        v_out.at[li * bn + i, :, sl],
                        sv.at[li, g]).start()

            @pl.when(jnp.logical_not(live))
            def _zero(g=g, sl=sl):
                for li in range(L):
                    pltpu.make_async_copy(
                        zbuf, k_out.at[li * bn + i, :, sl],
                        sk.at[li, g]).start()
                    pltpu.make_async_copy(
                        zbuf, v_out.at[li * bn + i, :, sl],
                        sv.at[li, g]).start()

        # waits mirror the start-branch descriptors exactly (live blocks
        # wait on the k_in/v_in-sourced copy, dead blocks on the zbuf fill):
        # waiting with a mismatched source descriptor only works when byte
        # counts coincide — a fragile pattern copy_on_fork already avoids.
        for g in range(nblk):
            live = g * gb <= bound_ref[0]
            sl = pl.ds(g * blk, blk)

            @pl.when(live)
            def _wait_copy(g=g, sl=sl):
                for li in range(L):
                    pltpu.make_async_copy(
                        k_in.at[li * bn + row, :, sl],
                        k_out.at[li * bn + i, :, sl],
                        sk.at[li, g]).wait()
                    pltpu.make_async_copy(
                        v_in.at[li * bn + row, :, sl],
                        v_out.at[li * bn + i, :, sl],
                        sv.at[li, g]).wait()

            @pl.when(jnp.logical_not(live))
            def _wait_zero(g=g, sl=sl):
                for li in range(L):
                    pltpu.make_async_copy(
                        zbuf, k_out.at[li * bn + i, :, sl],
                        sk.at[li, g]).wait()
                    pltpu.make_async_copy(
                        zbuf, v_out.at[li * bn + i, :, sl],
                        sv.at[li, g]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bn,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((L, nblk)),
                        pltpu.SemaphoreType.DMA((L, nblk)),
                        pltpu.VMEM((h, blk), kg.dtype)],
    )
    out_shape = [jax.ShapeDtypeStruct(kf.shape, kg.dtype),
                 jax.ShapeDtypeStruct(vf.shape, vg.dtype)]
    k2, v2 = pl.pallas_call(kernel, out_shape=out_shape,
                            grid_spec=grid_spec)(
        src_idx, bound.reshape(1), kf, vf)
    return (k2.reshape(kg.shape), v2.reshape(vg.shape))


@partial(jax.jit, static_argnames=("gb", "interpret"))
def copy_on_fork(kg: jnp.ndarray, vg: jnp.ndarray, cp: jnp.ndarray,
                 bound: jnp.ndarray, gb: int = 64, interpret: bool = False):
    """Copy-on-fork gen-cache update: row r is overwritten with row
    ``cp[r]``'s slots [0, bound] when ``cp[r] >= 0``; rows with cp[r] < 0
    are left untouched (the buffers are input/output-aliased, so untouched
    rows cost nothing).

    This is the reorder primitive for the indirection-based beam decode
    (engine/decode.py reorder="cof"): beams that survive in place never
    move, only FORKED beams copy their ancestor's generated history into a
    freed physical row. Sources (kept rows) and destinations (freed rows)
    are disjoint by construction, so the in-place aliasing has no
    read-write hazard. Average traffic ≈ fork_rate · occupied-prefix — a
    small fraction of the full permutation's.

    DMA alignment: block slices must be 128-lane-aligned and tile g_len
    exactly; ``gb`` is shrunk to the largest divisor of g_len with
    (gb·d) % 128 == 0. If none exists (tiny test shapes), falls back to a
    dense XLA gather with identity rows for cp < 0 — same semantics.

    DMA shape: the cache is viewed 4D as (L, bn, h, G·D) so ONE strided
    descriptor per (row, G-block) spans ALL layers (tiling constraints
    apply only to the trailing (h, G·D) dims; the bn middle dim takes the
    scalar row index) — ≤ 2·nblk DMAs per grid program instead of 2·L·nblk,
    keeping the kernel bandwidth-bound rather than issue-bound.
    """
    L, bn, h, g_len, d = kg.shape
    gb = min(gb, g_len)
    while gb > 0 and (g_len % gb != 0 or (gb * d) % 128 != 0):
        gb -= 1
    if gb == 0:
        idx = jnp.where(cp >= 0, cp, jnp.arange(bn, dtype=cp.dtype))
        return jnp.take(kg, idx, axis=1), jnp.take(vg, idx, axis=1)
    nblk = g_len // gb
    blk = gb * d
    kf = kg.reshape(L, bn, h, g_len * d)
    vf = vg.reshape(L, bn, h, g_len * d)

    def kernel(cp_ref, bound_ref, k_in, v_in, k_out, v_out, sk, sv):
        i = pl.program_id(0)
        src = cp_ref[i]

        for g in range(nblk):
            live = (src >= 0) & (g * gb <= bound_ref[0])

            @pl.when(live)
            def _copy(g=g):
                sl = pl.ds(g * blk, blk)
                pltpu.make_async_copy(k_in.at[:, src, :, sl],
                                      k_out.at[:, i, :, sl], sk.at[g]).start()
                pltpu.make_async_copy(v_in.at[:, src, :, sl],
                                      v_out.at[:, i, :, sl], sv.at[g]).start()

        for g in range(nblk):
            live = (src >= 0) & (g * gb <= bound_ref[0])

            @pl.when(live)
            def _wait(g=g):
                sl = pl.ds(g * blk, blk)
                pltpu.make_async_copy(k_in.at[:, src, :, sl],
                                      k_out.at[:, i, :, sl], sk.at[g]).wait()
                pltpu.make_async_copy(v_in.at[:, src, :, sl],
                                      v_out.at[:, i, :, sl], sv.at[g]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bn,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((nblk,)),
                        pltpu.SemaphoreType.DMA((nblk,))],
    )
    out_shape = [jax.ShapeDtypeStruct(kf.shape, kg.dtype),
                 jax.ShapeDtypeStruct(vf.shape, vg.dtype)]
    k2, v2 = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret)(cp, bound.reshape(1), kf, vf)
    return (k2.reshape(kg.shape), v2.reshape(vg.shape))


@jax.jit
def permute_gen_cache_pipelined(kg: jnp.ndarray, vg: jnp.ndarray,
                                src_idx: jnp.ndarray):
    """Blocked-pipeline variant: the permutation happens in the INPUT
    BlockSpec's index_map (scalar-prefetched src row), and Mosaic's pipeline
    machinery streams blocks HBM→VMEM→HBM with automatic double buffering —
    overlapped DMAs instead of the serial issue/wait of the manual kernel.
    """
    shape = kg.shape
    L, bn, h = shape[0], shape[1], shape[2]
    f = math.prod(shape[3:])
    kf = kg.reshape(L * bn, h, f)
    vf = vg.reshape(L * bn, h, f)

    def kernel(src_ref, k_in, v_in, k_out, v_out):
        k_out[...] = k_in[...]
        v_out[...] = v_in[...]

    def in_map(l, i, src_ref):
        return (l * bn + src_ref[i], 0, 0)

    def out_map(l, i, src_ref):
        return (l * bn + i, 0, 0)

    blk = (1, h, f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, bn),
        in_specs=[pl.BlockSpec(blk, in_map),
                  pl.BlockSpec(blk, in_map)],
        out_specs=[pl.BlockSpec(blk, out_map),
                   pl.BlockSpec(blk, out_map)],
    )
    out_shape = [jax.ShapeDtypeStruct(kf.shape, kg.dtype),
                 jax.ShapeDtypeStruct(vf.shape, vg.dtype)]
    k2, v2 = pl.pallas_call(kernel, out_shape=out_shape,
                            grid_spec=grid_spec)(src_idx, kf, vf)
    return k2.reshape(shape), v2.reshape(shape)


@partial(jax.jit, static_argnames=("gb",))
def permute_gen_cache_bounded(kg: jnp.ndarray, vg: jnp.ndarray,
                              src_idx: jnp.ndarray, bound: jnp.ndarray,
                              gb: int = 64):
    """Bounded variant: G-blocks (``gb`` slots each) whose start exceeds
    ``bound`` (scalar int32 = the highest written gen slot) are zero-filled
    without reading the source."""
    L, bn, h, g_len, d = kg.shape
    gb = min(gb, g_len)
    nblk = -(-g_len // gb)
    blk = gb * d
    kf = kg.reshape(L * bn, h, g_len * d)
    vf = vg.reshape(L * bn, h, g_len * d)

    def kernel(src_ref, bound_ref, k_in, v_in, k_out, v_out, sk, sv, zbuf):
        li = pl.program_id(0)
        i = pl.program_id(1)
        g = pl.program_id(2)
        start = g * blk
        src = li * bn + src_ref[i]
        dst = li * bn + i
        live = g * gb <= bound_ref[0]

        @pl.when(live)
        def _copy():
            ck = pltpu.make_async_copy(k_in.at[src, :, pl.ds(start, blk)],
                                       k_out.at[dst, :, pl.ds(start, blk)], sk)
            cv = pltpu.make_async_copy(v_in.at[src, :, pl.ds(start, blk)],
                                       v_out.at[dst, :, pl.ds(start, blk)], sv)
            ck.start()
            cv.start()
            ck.wait()
            cv.wait()

        @pl.when(jnp.logical_not(live))
        def _zero():
            zbuf[...] = jnp.zeros_like(zbuf)
            ck = pltpu.make_async_copy(
                zbuf, k_out.at[dst, :, pl.ds(start, blk)], sk)
            cv = pltpu.make_async_copy(
                zbuf, v_out.at[dst, :, pl.ds(start, blk)], sv)
            ck.start()
            cv.start()
            ck.wait()
            cv.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, bn, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.VMEM((h, blk), kg.dtype)],
    )
    out_shape = [jax.ShapeDtypeStruct(kf.shape, kg.dtype),
                 jax.ShapeDtypeStruct(vf.shape, vg.dtype)]
    k2, v2 = pl.pallas_call(kernel, out_shape=out_shape,
                            grid_spec=grid_spec)(
        src_idx, bound.reshape(1), kf, vf)
    return (k2.reshape(kg.shape), v2.reshape(vg.shape))

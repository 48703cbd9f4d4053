"""Whole-resblock fusion for BigVGAN's late stages as one Pallas TPU kernel.

Motivation (measured, tools/profile_vocoder_stages.py, B=16 window=112):
stages 4-6 (C = 96/48/24) cost 571 ms of the ~709 ms on-device vocoder time
while carrying the FEWEST conv FLOPs — they are bound by per-op overhead and
poor XLA lowering of tiny-channel NCW convs, not by compute. This kernel runs
one ENTIRE AMP resblock (3 × [anti-aliased snake → dilated conv → anti-aliased
snake → conv → residual add], reference BigVGAN/models.py:20-81) over a VMEM
tile in a single pallas_call: the (C, T) activations never return to HBM
between the 6 convs and 6 activations.

Reference counterpart being replaced: the per-op torch path
(BigVGAN/models.py AMPBlock1 + alias_free_torch/*) and the fused CUDA
activation (alias_free_activation/cuda/anti_alias_activation_cuda.cu:44-181)
— this goes further than the CUDA kernel, which fused only the activation.

Layout: C-major (B, C, T) with time in the vector lanes (see
ops/pallas_snake.py). Requires C ≤ 128 (one sublane tile): true for BigVGAN
stages 4-6 where the win lives.

Shrinking-width algebra: each op consumes a halo and produces a narrower
strip; widths are static Python ints. Per pair (kernel k, dilation d) the
one-sided shrink is s = 12 + (d+1)(k-1)/2 (two acts ±6, conv1 ±d(k-1)/2,
conv2 ±(k-1)/2); the 3-pair chain needs ≤ 96 frames (k=11, d=1,3,5), covered
by the 128-frame DMA-aligned halo.

Numerics: convs take inputs in the caller's dtype (bf16 in production —
matching the XLA path's bf16 convs) but accumulate in fp32 on the MXU;
activations run in fp32 exactly like ops/pallas_snake.py. Edge semantics:
within the chain span (≤96 frames at stage rate) of the TRUE sequence
boundaries the kernel sees replicate-padded stage input where the XLA path
zero-pads each conv — interior is exact, boundary deviation is small and
decaying, and the windowed driver's halo crop keeps window seams exact.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from index_tts_dubbing_tpu.ops.alias_free import UP_FILTER, DOWN_FILTER

_HALO = 128  # one lane tile per side; ≥ max chain span (96) and DMA-aligned


def _pair_shrink(k: int, d: int) -> int:
    return 12 + (d + 1) * (k - 1) // 2


def chain_shrink(k: int, dils: Sequence[int]) -> int:
    return sum(_pair_shrink(k, d) for d in dils)


def _act_shrink(v: jnp.ndarray, a: jnp.ndarray, binv: jnp.ndarray,
                up: np.ndarray, down: np.ndarray) -> jnp.ndarray:
    """Anti-aliased snake on (C, n) fp32 → (C, n-12); output column t' is
    input column t'+6. Polyphase algebra identical to pallas_snake.py."""
    n = v.shape[1]
    m = n - 6
    ue = jnp.zeros(v.shape[:1] + (m,), jnp.float32)
    uo = jnp.zeros(v.shape[:1] + (m,), jnp.float32)
    for d in range(6):
        seg = v[:, d: d + m]
        ue = ue + (2.0 * float(up[11 - 2 * d])) * seg
        uo = uo + (2.0 * float(up[10 - 2 * d])) * seg
    s = jnp.sin(ue * a)
    ue = ue + binv * s * s
    s = jnp.sin(uo * a)
    uo = uo + binv * s * s
    nout = n - 12
    y = jnp.zeros(v.shape[:1] + (nout,), jnp.float32)
    for j in range(12):
        mm = j - 5
        if mm % 2 == 0:
            off = 3 + mm // 2
            y = y + float(down[j]) * ue[:, off: off + nout]
        else:
            off = 4 + (mm - 1) // 2
            y = y + float(down[j]) * uo[:, off: off + nout]
    return y


def _cpad(c: int) -> int:
    """Per-tap sublane stride in the stacked-tap buffer: 32-aligned so every
    tap block starts on a sublane-tile boundary for any dtype."""
    return -(-c // 32) * 32


def _conv_shrink(v: jnp.ndarray, w_ref, b_ref, x_ref, p: int, k: int, d: int,
                 in_dtype) -> jnp.ndarray:
    """'Same' conv without the padding: (C, n) fp32 → (C, n - d(k-1)),
    output column t' = input column t' + d(k-1)/2.

    The k taps are STACKED into the contraction dim: one (k·Cpad, Cout)
    matmul instead of k (Cin, Cout) ones. With C ≪ 128 the per-tap matmul
    wastes most of the 128-deep MXU contraction; stacking turns k=11 passes
    into ceil(k·C/128) (3 at C=24). The stack is assembled through the
    x_ref VMEM scratch — Mosaic cannot concatenate vectors whose lane
    offsets differ (the kk·d shifts), but stores relayout implicitly.
    Inputs in the caller dtype (bf16 in production, like the XLA convs),
    fp32 accumulation. Scratch pad rows are zeroed once by the kernel; the
    matching weight rows are zero too (pack_resblock), so they cancel."""
    c, n = v.shape
    cp = _cpad(c)
    half = d * (k - 1) // 2
    nout = n - 2 * half
    vc = v.astype(in_dtype)
    for kk in range(k):
        x_ref[pl.ds(kk * cp, c), pl.ds(0, nout)] = vc[:, kk * d: kk * d + nout]
    x = x_ref[pl.ds(0, k * cp), pl.ds(0, nout)]
    w = w_ref[p]                                # (k·Cpad, Cout)
    acc = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return acc + b_ref[p].astype(jnp.float32)


def _kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, acts_ref, out_ref,
            xs, x_scr, sem, *, tt: int, k: int, dils: Tuple[int, ...],
            up: np.ndarray, down: np.ndarray):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    copy = pltpu.make_async_copy(
        xp_ref.at[b, :, pl.ds(ti * tt, tt + 2 * _HALO)], xs, sem)
    copy.start()
    copy.wait()
    y = xs[:].astype(jnp.float32)              # (C, tt + 2*HALO)
    in_dtype = xs.dtype
    c = y.shape[0]
    cp = _cpad(c)
    if cp != c:  # zero the stacked-tap scratch's pad rows once per block
        for kk in range(k):
            x_scr[pl.ds(kk * cp + c, cp - c), :] = jnp.zeros(
                (cp - c, x_scr.shape[1]), x_scr.dtype)
    for p, d in enumerate(dils):
        a1 = acts_ref[p, 0]                    # (C, 1) fp32
        binv1 = acts_ref[p, 1]
        a2 = acts_ref[p, 2]
        binv2 = acts_ref[p, 3]
        v = _act_shrink(y, a1, binv1, up, down)
        v = _conv_shrink(v, w1_ref, b1_ref, x_scr, p, k, d, in_dtype)
        v = _act_shrink(v, a2, binv2, up, down)
        v = _conv_shrink(v, w2_ref, b2_ref, x_scr, p, k, 1, in_dtype)
        s = _pair_shrink(k, d)
        y = v + y[:, s: y.shape[1] - s]
    total = chain_shrink(k, dils)
    out_ref[0] = y[:, _HALO - total: _HALO - total + tt].astype(out_ref.dtype)


def _pick_tile(t: int, c: int, k: int, elem_bytes: int) -> int:
    """tt: multiple of 128 (≤2048) minimising pad, under a ~12 MB VMEM
    budget accounting for the fp32 work buffers (~5 live), the stacked-tap
    scratch (k·Cpad wide), the DMA tile, and the resident conv weights."""
    cp = _cpad(c)
    weights = 2 * 3 * k * cp * c * elem_bytes      # w1 + w2, 3 pairs
    per_col = (8 * 4 * c                            # fp32 work buffers+spills
               + elem_bytes * k * cp                # stacked-tap scratch
               + elem_bytes * 4 * c)                # DMA tile + dbl-buf out
    budget_cols = max(384, (9 * 1024 * 1024 - weights) // per_col)
    tt_max = min(2048, max(128, (budget_cols - 2 * _HALO) // 128 * 128))
    t128 = -(-t // 128) * 128
    best_tt, best_pad = 128, None
    for cand in range(128, min(tt_max, t128) + 1, 128):
        pad = -(-t // cand) * cand - t
        if best_pad is None or pad <= best_pad:
            best_tt, best_pad = cand, pad
    return best_tt


@functools.partial(jax.jit, static_argnames=("k", "dils"))
def fused_resblock_cmajor(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                          w2: jnp.ndarray, b2: jnp.ndarray,
                          acts: jnp.ndarray, k: int,
                          dils: Tuple[int, ...]) -> jnp.ndarray:
    """One AMP resblock on (B, C, T) C-major input, C ≤ 128.

    w1/w2: (P, k, Cin, Cout) stacked per-pair conv kernels (w2 is the
    undilated second conv, same k); b1/b2: (P, C, 1); acts: (P, 4, C, 1)
    fp32 rows [alpha1, 1/beta1, alpha2, 1/beta2] with any log-scale already
    folded (exp'd) by the caller. Returns x's dtype.
    """
    b, c, t = x.shape
    assert c <= 128, "fused resblock requires C <= 128 (one sublane tile)"
    tt = _pick_tile(t, c, k, np.dtype(x.dtype).itemsize)
    t_pad = -(-t // tt) * tt
    xp = jnp.concatenate(
        [jnp.repeat(x[:, :, :1], _HALO, axis=2), x,
         jnp.repeat(x[:, :, -1:], _HALO + (t_pad - t), axis=2)], axis=2)
    kernel = functools.partial(_kernel, tt=tt, k=k, dils=tuple(dils),
                               up=UP_FILTER, down=DOWN_FILTER)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, t_pad), x.dtype),
        grid=(b, t_pad // tt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  vmem, vmem, vmem, vmem, vmem],
        out_specs=pl.BlockSpec((1, c, tt), lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, tt + 2 * _HALO), x.dtype),
            pltpu.VMEM((w1.shape[1], tt + 2 * _HALO), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w1, b1, w2, b2, acts)
    return out[:, :, :t] if t_pad != t else out


def pack_resblock(rb, cfg, dtype) -> Tuple[jnp.ndarray, ...]:
    """Stack one resblock's params into the kernel's layout. Called inside
    the vocoder jit — pure re-layout, fused into the compiled graph.

    rb: {"convs1": [{"w","b"}×P], "convs2": [...], "acts": [{alpha[,beta]}×2P]}
    with w in the shared (K, Cin, Cout) layout (models/bigvgan.py); each
    pair's kernel is flattened to (K·Cpad, Cout) for the tap-stacked matmul
    (taps at 32-aligned sublane offsets, zero rows between — matching the
    kernel's scratch layout).
    Returns (w1, b1, w2, b2, acts) for fused_resblock_cmajor.
    """
    def flat(w):
        k, ci, co = w.shape
        cp = _cpad(ci)
        if cp != ci:
            w = jnp.pad(w, ((0, 0), (0, cp - ci), (0, 0)))
        return w.reshape(k * cp, co)

    w1 = jnp.stack([flat(p["w"]) for p in rb["convs1"]]).astype(dtype)
    b1 = jnp.stack([p["b"] for p in rb["convs1"]]).astype(jnp.float32)[..., None]
    w2 = jnp.stack([flat(p["w"]) for p in rb["convs2"]]).astype(dtype)
    b2 = jnp.stack([p["b"] for p in rb["convs2"]]).astype(jnp.float32)[..., None]
    rows = []
    for a1, a2 in zip(rb["acts"][::2], rb["acts"][1::2]):
        al1 = a1["alpha"].astype(jnp.float32)
        al2 = a2["alpha"].astype(jnp.float32)
        if cfg.activation == "snakebeta":
            be1 = a1["beta"].astype(jnp.float32)
            be2 = a2["beta"].astype(jnp.float32)
        else:
            be1, be2 = al1, al2
        if cfg.snake_logscale:
            al1, be1 = jnp.exp(al1), jnp.exp(be1)
            al2, be2 = jnp.exp(al2), jnp.exp(be2)
        rows.append(jnp.stack([al1, 1.0 / (be1 + 1e-9),
                               al2, 1.0 / (be2 + 1e-9)]))
    return w1, b1, w2, b2, jnp.stack(rows)[..., None]

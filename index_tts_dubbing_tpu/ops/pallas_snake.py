"""Fused anti-aliased snake activation as a Pallas TPU kernel.

The TPU counterpart of the reference's fused CUDA kernel
(BigVGAN/alias_free_activation/cuda/anti_alias_activation_cuda.cu:44-181):
replicate-pad → ×2 12-tap FIR upsample → snake(beta) → 12-tap FIR ×2
downsample, in one VMEM pass. The FIR algebra is the polyphase form derived
in ops/alias_free.py; α/β (and their exp for the log-scale parameterisation)
are folded host-side so the kernel body is pure shift-mul-add + sin².

One pallas_call replaces ~50 XLA HLOs per activation — this is what makes
the BigVGAN graph compile quickly on TPU while also keeping the whole
activation in VMEM.

Edge semantics: values within ±3 frames of the *true sequence boundary*
approximate the reference's boundary replication (the kernel extends the
upsampled stream by recomputation over replicated input rather than
replicating the upsampled edge value). Interior values are exact; the
windowed vocoder's halos crop window edges anyway.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from index_tts_dubbing_tpu.ops.alias_free import UP_FILTER, DOWN_FILTER

_HALO = 8  # input-frame halo each side (true dependency span is ±6)


def _kernel(xp_ref, a_ref, binv_ref, out_ref, xs, sem, *, tt: int, c: int,
            up: np.ndarray, down: np.ndarray):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * tt, tt + 2 * _HALO), pl.ds(j * c, c)], xs, sem)
    copy.start()
    copy.wait()
    x = xs[:]                                   # (tt+16, C)

    n = tt + 6  # up-phase arrays cover u ∈ [-3, tt+3)
    # ue[u]=2Σ f[11−2d]·x[u−3+d], uo[u]=2Σ f[10−2d]·x[u−2+d];
    # local xs index of x[g] is g+HALO, array base u=−3.
    ue = jnp.zeros((n, c), jnp.float32)
    uo = jnp.zeros((n, c), jnp.float32)
    for d in range(6):
        ue = ue + (2.0 * float(up[11 - 2 * d])) * x[_HALO - 6 + d: _HALO - 6 + d + n, :]
        uo = uo + (2.0 * float(up[10 - 2 * d])) * x[_HALO - 5 + d: _HALO - 5 + d + n, :]

    a = a_ref[0, :]
    binv = binv_ref[0, :]

    def snake(v):
        s = jnp.sin(v * a)
        return v + binv * s * s

    ue = snake(ue)
    uo = snake(uo)

    # y[t] = Σ_j f[j]·up[2t−5+j]; phase split (offset +3 into ue/uo arrays)
    y = jnp.zeros((tt, c), jnp.float32)
    for j in range(12):
        m = j - 5                               # up index offset 2t + m
        if (m % 2) == 0:
            y = y + float(down[j]) * ue[3 + m // 2: 3 + m // 2 + tt, :]
        else:
            y = y + float(down[j]) * uo[3 + (m - 1) // 2: 3 + (m - 1) // 2 + tt, :]
    out_ref[0, :, :] = y.astype(out_ref.dtype)


def _pick_tile(t: int) -> int:
    for tt in (512, 256, 128, 64, 32, 16, 8):
        if t % tt == 0:
            return tt
    return t


def _pick_channel_tile(c: int, tt: int, budget: int = 262144) -> int:
    """Largest divisor of c keeping ~5 tile-sized fp32 buffers under VMEM."""
    best = 1
    for ct in range(1, c + 1):
        if c % ct == 0 and tt * ct <= budget:
            best = ct
    return best


# C-major halo: DMA slices along the minor (lane) dim must be 128-aligned in
# offset AND length, so each (ct, tt) output tile fetches (ct, tt+128) input
# anchored one half-tile (64) early — covering the true ±6-frame dependency
# with aligned transfers.
_HALO_CM = 64


def _kernel_cmajor(xp_ref, a_ref, binv_ref, out_ref, xs, sem, *, tt: int,
                   ct: int, up: np.ndarray, down: np.ndarray):
    """Time-in-LANES variant: blocks are (channels=sublanes, time=lanes).

    For BigVGAN's late stages (C = 24..96 ≪ 128) the channel-minor layout
    wastes 5/6 of the vector lanes on every op; with time minor the FIR
    shift-adds run at full lane utilisation. Same polyphase algebra as
    ``_kernel`` with the two axes swapped."""
    b = pl.program_id(0)
    ci = pl.program_id(1)
    ti = pl.program_id(2)
    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(ci * ct, ct), pl.ds(ti * tt, tt + 2 * _HALO_CM)],
        xs, sem)
    copy.start()
    copy.wait()
    x = xs[:]                                   # (ct, tt+128)

    n = tt + 6  # up-phase arrays cover u ∈ [-3, tt+3)
    ue = jnp.zeros((ct, n), jnp.float32)
    uo = jnp.zeros((ct, n), jnp.float32)
    for d in range(6):
        ue = ue + (2.0 * float(up[11 - 2 * d])) * x[:, _HALO_CM - 6 + d: _HALO_CM - 6 + d + n]
        uo = uo + (2.0 * float(up[10 - 2 * d])) * x[:, _HALO_CM - 5 + d: _HALO_CM - 5 + d + n]

    a = a_ref[:, 0][:, None]
    binv = binv_ref[:, 0][:, None]

    def snake(v):
        s = jnp.sin(v * a)
        return v + binv * s * s

    ue = snake(ue)
    uo = snake(uo)

    y = jnp.zeros((ct, tt), jnp.float32)
    for j in range(12):
        m = j - 5                               # up index offset 2t + m
        if (m % 2) == 0:
            y = y + float(down[j]) * ue[:, 3 + m // 2: 3 + m // 2 + tt]
        else:
            y = y + float(down[j]) * uo[:, 3 + (m - 1) // 2: 3 + (m - 1) // 2 + tt]
    out_ref[0, :, :] = y.astype(out_ref.dtype)


def _pick_tile_cmajor(t: int, c: int) -> tuple:
    """(ct, tt): tt = the multiple of 128 (≤ 2048) minimising the padded
    length ceil(t/tt)·tt (ties → larger tt, fewer grid steps); ct = largest
    divisor of c keeping ~4 fp32 (ct, tt) buffers under ~4 MB VMEM.

    Minimising t_pad matters: a fixed tt=2048 pads the production T=5120
    stage to 6144 (20% wasted compute) where tt=1280 pads nothing."""
    t128 = -(-t // 128) * 128
    best_tt, best_pad = 128, None
    for tt_cand in range(128, min(2048, t128) + 1, 128):
        pad = -(-t // tt_cand) * tt_cand - t
        if best_pad is None or pad <= best_pad:
            best_tt, best_pad = tt_cand, pad
    tt = best_tt
    budget_elems = 262144  # per-buffer fp32 elements (~1 MB each, 4 buffers)
    ct = 1
    for cand in range(1, c + 1):
        if c % cand == 0 and cand * (tt + 2 * _HALO_CM) <= budget_elems:
            ct = cand
    return ct, tt


@functools.partial(jax.jit, static_argnames=("logscale",))
def fused_anti_alias_snake_cmajor(x: jnp.ndarray, alpha: jnp.ndarray,
                                  beta: Optional[jnp.ndarray],
                                  logscale: bool) -> jnp.ndarray:
    """(B, C, T) → (B, C, T), ≡ downsample2(snake[β](upsample2(x))) applied
    along the minor (time) axis. Companion of ``fused_anti_alias_snake`` for
    the C-major vocoder path (time in lanes → full VPU utilisation at the
    late BigVGAN stages where C ≪ 128)."""
    b, c, t = x.shape
    if logscale:
        a = jnp.exp(alpha)
        bta = jnp.exp(beta) if beta is not None else None
    else:
        a = alpha
        bta = beta
    binv = (1.0 / (bta.astype(jnp.float32) + 1e-9) if bta is not None
            else 1.0 / (a.astype(jnp.float32) + 1e-9))
    a = a.astype(jnp.float32).reshape(c, 1)
    binv = binv.reshape(c, 1)

    ct, tt = _pick_tile_cmajor(t, c)
    t_pad = -(-t // tt) * tt
    # [64-frame replicate | x (replicate-padded to t_pad) | 64-frame pad]:
    # block ti DMAs the aligned slice [ti·tt, ti·tt + tt + 128), which covers
    # its true ±6-frame dependency span.
    xp = jnp.concatenate(
        [jnp.repeat(x[:, :, :1], _HALO_CM, axis=2), x,
         jnp.repeat(x[:, :, -1:], _HALO_CM + (t_pad - t), axis=2)],
        axis=2).astype(jnp.float32)

    kernel = functools.partial(_kernel_cmajor, tt=tt, ct=ct,
                               up=UP_FILTER, down=DOWN_FILTER)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, t_pad), x.dtype),
        grid=(b, c // ct, t_pad // tt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ct, 1), lambda bi, ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1), lambda bi, ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ct, tt), lambda bi, ci, ti: (bi, ci, ti),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ct, tt + 2 * _HALO_CM), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, a, binv)
    return out[:, :, :t] if t_pad != t else out


@functools.partial(jax.jit, static_argnames=("logscale",))
def fused_anti_alias_snake(x: jnp.ndarray, alpha: jnp.ndarray,
                           beta: Optional[jnp.ndarray],
                           logscale: bool) -> jnp.ndarray:
    """(B, T, C) → (B, T, C), ≡ downsample2(snake[β](upsample2(x)))."""
    b, t, c = x.shape
    if logscale:
        a = jnp.exp(alpha)
        bta = jnp.exp(beta) if beta is not None else a
    else:
        a = alpha
        bta = beta if beta is not None else alpha
    binv = 1.0 / (bta.astype(jnp.float32) + 1e-9)
    a = a.astype(jnp.float32).reshape(1, c)
    binv = binv.reshape(1, c)

    xp = jnp.concatenate(
        [jnp.repeat(x[:, :1], _HALO, axis=1), x,
         jnp.repeat(x[:, -1:], _HALO, axis=1)], axis=1).astype(jnp.float32)

    tt = _pick_tile(t)
    ct = _pick_channel_tile(c, tt)
    kernel = functools.partial(_kernel, tt=tt, c=ct,
                               up=UP_FILTER, down=DOWN_FILTER)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b, t // tt, c // ct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, ct), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, ct), lambda bi, ti, ci: (bi, ti, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tt + 2 * _HALO, ct), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, a, binv)
    return out

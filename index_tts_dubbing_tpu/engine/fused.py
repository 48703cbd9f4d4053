"""Fused end-to-end synthesis graph: one XLA program for the whole pipeline.

The engine's staged path (engine/tts.py) dispatches ~10 separate programs per
batch: prefix embedding, AR decode, silence trim, bucketed latent passes, the
window gathers and the window-vocode batches. On this TPU backend every
DISTINCT program pays a large one-time cost in a fresh process (server-side
compile + executable load, tens of seconds to minutes each — the dominant
cold-start cost, see docs/PERFORMANCE_NOTES.md), plus a ~30 ms dispatch RTT
per call when warm.

This module lowers the entire batch synthesis into ONE jitted program:

    prefix emb → generate (lax.while_loop decode) → remove_long_silence
    (device) → masked-pad latent pass → on-device window plan over the
    virtual concat stream → windowed BigVGAN (C-major + Pallas kernels,
    edge-exact boundaries) → flat waveform

so a cold process compiles/loads exactly one executable, and a warm step has
zero host round-trips between stages. Semantics are the staged path's:
every stage reuses the SAME traced functions the staged engine calls
(decode.generate, remove_long_silence_device, forward_latent_bucketed,
_vocode_window_cmajor), inlined by jit.

Constraints (by design, static shapes): one text bucket per call (the engine
pads rows to a TEXT_BUCKET), one code bucket = sc.max_mel_tokens, and a
static window-count ceiling ceil(B·steps / window) — windows beyond the
real stream length are junk rows whose outputs are dropped on the host.

Reference role: replaces the infer_fast orchestration loop
(indextts/infer.py:278-497) for uniform-bucket batches.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.engine import decode as decode_mod
from index_tts_dubbing_tpu.engine import vocoder as voc_mod
from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig
from index_tts_dubbing_tpu.models.gpt import GPTConfig


class FusedResult(NamedTuple):
    wav: jnp.ndarray        # (num_windows · window · upsample,) fp32; valid
                            # prefix is stream_frames · upsample samples
    wav_i16: jnp.ndarray    # same samples as int16 (clip(wav·32767), the
                            # engine's emission scaling) — computed ON
                            # DEVICE so the public path downloads 2 bytes/
                            # sample over the ~60 MB/s tunneled link
                            # instead of 4 (measured: 206 → 124 ms for the
                            # bench wav). Fields are downloaded lazily;
                            # callers touch exactly one of wav / wav_i16.
    stream_frames: jnp.ndarray   # scalar: total latent frames after trim
    codes: jnp.ndarray      # (B, steps) raw generated codes (pre-trim)
    gen_lengths: jnp.ndarray     # (B,) pre-trim lengths (decode accounting)
    lens: jnp.ndarray       # (B,) post-trim latent frames per row
    lat: jnp.ndarray        # (B, steps, C) latent-pass output (device): lets
                            # the engine fall back to the exact short-stream
                            # path when stream_frames < window + 2·halo


class FusedLatResult(NamedTuple):
    codes: jnp.ndarray           # (B, steps) raw generated codes (pre-trim)
    gen_lengths: jnp.ndarray     # (B,) pre-trim lengths
    lens: jnp.ndarray            # (B,) post-trim latent frames per row
    lat: jnp.ndarray             # (B, steps, C) latent-pass output


@partial(jax.jit, static_argnames=("gpt_cfg", "sc", "num_beams"))
def synthesize_fused_lat(gpt_params: Dict[str, Any], gpt_cfg: GPTConfig,
                         sc: decode_mod.SamplingConfig, conds: jnp.ndarray,
                         ids: jnp.ndarray, pos: jnp.ndarray,
                         seg: jnp.ndarray, cond_idx: jnp.ndarray,
                         text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                         rng: jax.Array, length_penalty: float = 0.0,
                         live: Optional[jnp.ndarray] = None,
                         *, num_beams: int = 1) -> FusedLatResult:
    """Fused decode → trim → latent as ONE program, WITHOUT the vocoder.

    The full synthesize_fused vocodes a STATIC ceil(B·steps/window) window
    count — exact-cost when rows decode to ≈ steps (duration-capped
    dubbing, the bench), but up to steps/actual× wasted vocoder compute
    when decode stops early under a loose cap (the reference's 600-token
    default on ordinary sentences). This variant ends at the latent pass;
    the engine then vocodes through the window-exact device-resident
    stream (engine/vocoder.stream_device), paying one host sync for the
    actual lens instead of a worst-case static vocode."""
    b = ids.shape[0]
    emb, keep = decode_mod.build_prefix_emb(gpt_params, gpt_cfg, conds, ids,
                                            pos, seg, cond_idx)
    if num_beams > 1:
        res = decode_mod._beam_decode(gpt_params, gpt_cfg, sc, emb, keep,
                                      rng, num_beams, length_penalty,
                                      stochastic=sc.do_sample, live=live)
    else:
        res = decode_mod.generate(gpt_params, gpt_cfg, sc, emb, keep, rng,
                                  live=live)
    from index_tts_dubbing_tpu.engine.tts import remove_long_silence_device
    codes, lens = remove_long_silence_device(res.codes,
                                             gpt_cfg.stop_mel_token)
    cnds = conds
    if cnds.shape[0] == 1 and b > 1:
        cnds = jnp.broadcast_to(cnds, (b,) + cnds.shape[1:])
    lat = gpt_model.forward_latent_bucketed(
        gpt_params, gpt_cfg, cnds, text_ids, text_lens, codes,
        lens.astype(jnp.int32))
    return FusedLatResult(res.codes, res.lengths, lens, lat)


@partial(jax.jit,
         static_argnames=("gpt_cfg", "bv_cfg", "sc", "num_windows", "window",
                          "halo", "use_pallas", "fuse_resblocks",
                          "edge_exact", "num_beams"))
def synthesize_fused(gpt_params: Dict[str, Any], bv_params: Dict[str, Any],
                     gpt_cfg: GPTConfig, bv_cfg: BigVGANConfig,
                     sc: decode_mod.SamplingConfig,
                     conds: jnp.ndarray, ids: jnp.ndarray, pos: jnp.ndarray,
                     seg: jnp.ndarray, cond_idx: jnp.ndarray,
                     text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                     spk: jnp.ndarray, rng: jax.Array, packed,
                     length_penalty: float = 0.0,
                     live: Optional[jnp.ndarray] = None,
                     *, num_windows: int, window: int, halo: int,
                     use_pallas: bool, fuse_resblocks: bool,
                     edge_exact: bool, num_beams: int = 1) -> FusedResult:
    """One-program batch synthesis. Inputs are the staged path's own
    artifacts: prefix arrays from prepare_prefix_host, unframed text rows for
    the latent pass, the precomputed speaker embedding, and the packed fused
    resblock weights. num_beams > 1 decodes with beam sampling / beam search
    per sc.do_sample (the reference's num_beams=3 quality default).
    ``live`` (B,) bool marks batch-padding rows dead: they stop at decode
    step 0, contribute 0 frames to the stream, and never gate the loop —
    so the engine's FUSED_BATCH_BUCKET padding costs no decode steps and
    no stream frames (the caller can also shrink num_windows to the live
    row count's worth of windows)."""
    b = ids.shape[0]
    steps = sc.max_mel_tokens
    up = int(np.prod(bv_cfg.upsample_rates))
    full = window + 2 * halo

    # ---- 1. AR decode (prefill + while_loop), as in the staged path
    emb, keep = decode_mod.build_prefix_emb(gpt_params, gpt_cfg, conds, ids,
                                            pos, seg, cond_idx)
    if num_beams > 1:
        res = decode_mod._beam_decode(gpt_params, gpt_cfg, sc, emb, keep,
                                      rng, num_beams, length_penalty,
                                      stochastic=sc.do_sample, live=live)
    else:
        res = decode_mod.generate(gpt_params, gpt_cfg, sc, emb, keep, rng,
                                  live=live)

    # ---- 2. silence trim on device (== host remove_long_silence; tested)
    from index_tts_dubbing_tpu.engine.tts import remove_long_silence_device
    codes, lens = remove_long_silence_device(res.codes, gpt_cfg.stop_mel_token)

    # ---- 3. latent pass at one (LB, steps) bucket — masked-pad exact
    cnds = conds
    if cnds.shape[0] == 1 and b > 1:
        cnds = jnp.broadcast_to(cnds, (b,) + cnds.shape[1:])
    lat = gpt_model.forward_latent_bucketed(
        gpt_params, gpt_cfg, cnds, text_ids, text_lens, codes,
        lens.astype(jnp.int32))

    # ---- 4. window plan over the virtual stream concat(lat[i, :lens[i]])
    mb = steps
    p_total = b * mb
    lens32 = lens.astype(jnp.int32)
    t = jnp.sum(lens32)                              # stream frames (traced)
    bounds = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(lens32)])
    pos_s = jnp.arange(p_total, dtype=jnp.int32)
    row = jnp.clip(
        jnp.searchsorted(bounds, pos_s, side="right").astype(jnp.int32) - 1,
        0, b - 1)
    col = pos_s - bounds[row]
    # junk region (pos ≥ t): col may exceed mb — clamp into range
    flatmap = jnp.clip(row * mb + col, 0, p_total - 1)
    wi = jnp.arange(num_windows, dtype=jnp.int32)
    lo = jnp.clip(wi * window - halo, 0, jnp.maximum(t - full, 0))
    gidx = jnp.clip(lo[:, None] + jnp.arange(full, dtype=jnp.int32)[None, :],
                    0, p_total - 1)
    idx = flatmap[gidx]                              # (NW, full)
    flat = lat.reshape(p_total, lat.shape[-1])
    windows = jnp.take(flat, idx, axis=0)            # (NW, full, C)

    # ---- 5. vocode (the staged path's window body, inlined)
    if spk.shape[0] == 1:
        spk = jnp.broadcast_to(spk, (num_windows,) + spk.shape[1:])
    # vocoder compute dtype = its params dtype (conds is fp32 even under
    # bf16 params; inheriting it would run the whole vocoder off-bf16)
    voc_dtype = bv_params["conv_pre"]["w"].dtype
    wav_w = voc_mod._vocode_window_cmajor(
        bv_params, bv_cfg, windows.astype(voc_dtype), spk,
        use_pallas=use_pallas, fuse_resblocks=fuse_resblocks, packed=packed)
    wav_w = wav_w.astype(jnp.float32)                # (NW, full·up)
    off = wi * window - lo                           # output start in window
    oidx = off[:, None] * up + jnp.arange(window * up,
                                          dtype=jnp.int32)[None, :]
    wav = jnp.take_along_axis(wav_w, oidx, axis=1).reshape(-1)

    if edge_exact and (use_pallas or fuse_resblocks):
        # Stream-boundary correction through the exact zero-pad-conv path —
        # on PATCHES of 2·halo latent frames, not full windows: a fast
        # window's output is already exact ≥ halo frames from the true
        # boundary (halo ≥ the generator's receptive field — the same
        # contract that makes interior window seams exact), so only
        # outputs [0, halo) and [t-halo, t) can deviate. Each patch keeps
        # its boundary-adjacent half; its other edge is ≥ halo from every
        # kept output frame, so the patch's own fake boundary never
        # reaches them. 4.5× less exact-path work than the r04 full-window
        # correction (the unfused XLA path is the fused graph's single
        # most expensive slice per frame — measured 0.54 s of the 4.03 s
        # beam wall at B=16·192 steps before this).
        pw = 2 * halo
        lidx = flatmap[jnp.arange(pw, dtype=jnp.int32)]
        ridx = flatmap[jnp.clip(t - pw + jnp.arange(pw, dtype=jnp.int32),
                                0, p_total - 1)]
        epatch = jnp.take(flat, jnp.stack([lidx, ridx]), axis=0)
        ewav = voc_mod._vocode_window_cmajor(
            bv_params, bv_cfg, epatch.astype(voc_dtype), spk[:2],
            use_pallas=False, fuse_resblocks=False,
            packed=None).astype(jnp.float32)
        wav = jax.lax.dynamic_update_slice(wav, ewav[0, : halo * up], (0,))
        wav = jax.lax.dynamic_update_slice(wav, ewav[1, halo * up:],
                                           ((t - halo) * up,))

    # device-side emission scaling (matches the host np.clip(wav·32767)
    # .astype(int16): XLA's float→int convert truncates toward zero like
    # numpy's astype)
    wav_i16 = jnp.clip(wav * 32767.0, -32767.0, 32767.0).astype(jnp.int16)
    return FusedResult(wav, wav_i16, t, res.codes, res.lengths, lens, lat)

"""Windowed streaming vocoder driver.

The reference vocodes variable-length latent chunks (infer.py:439-463), which
on TPU would trigger one XLA compile per length. Here the latent stream is cut
into fixed windows with halo frames on both sides; each window runs through
BigVGAN at one static shape and the halo-corrupted edges are cropped. With a
halo ≥ the generator's total receptive field, the stitched waveform equals the
exact full-sequence computation (convs have finite support; the anti-aliased
snake is pointwise in time apart from its 12-tap FIRs).

Compile-time note: an alternative "fused" stage form
(_vocode_window_fused: resblock branches → channel groups, conv pairs →
lax.scan over width-unified dense kernels) is mathematically exact but
inflates early-stage kernels ~50× (width-51 dense × 3 branches at C=768),
which this backend's compiler cannot handle; the default window function
keeps the reference structure. Small windows + the persistent compilation
cache keep the one-time compile bounded.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.models import bigvgan as bigvgan_model
from index_tts_dubbing_tpu.models import ecapa
from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig
from index_tts_dubbing_tpu.ops.alias_free import (downsample2, snake_beta,
                                                  snake, upsample2)

# halo: BigVGAN's receptive field in *input* (latent) frames. conv_pre(±3)
# + per-stage dilated convs mapped back through the upsample factors + the
# 12-tap FIRs ≈ ±12 frames; 16 verified bit-exact (tests).
DEFAULT_HALO = 16


def fuse_bigvgan_params(params: Dict[str, Any], cfg: BigVGANConfig
                        ) -> Dict[str, Any]:
    """Host-side restructure of BigVGAN params into the grouped/scanned form.
    Pure re-layout + zero-padding of kernels: outputs are bit-identical."""
    nb = cfg.num_kernels            # parallel branches (3)
    npair = 3                       # sequential pairs per resblock
    fused: Dict[str, Any] = {
        "conv_pre": params["conv_pre"],
        "cond_layer": params["cond_layer"],
        "conds": params["conds"],
        "ups": params["ups"],
        "act_post": params["act_post"],
        "conv_post": params["conv_post"],
        "speaker_encoder": params["speaker_encoder"],
        "stages": [],
    }
    # common dense widths across all (branch, pair) combos so pairs scan
    w1_max = max(d * (k - 1) + 1
                 for k, ds in zip(cfg.resblock_kernel_sizes,
                                  cfg.resblock_dilation_sizes) for d in ds)
    w2_max = max(cfg.resblock_kernel_sizes)

    def dense(wk: np.ndarray, dilation: int, width: int) -> np.ndarray:
        """(k, C, C) torch-style dilated kernel → (width, C, C) dense with
        zeros between taps, centered."""
        k = wk.shape[0]
        span = dilation * (k - 1) + 1
        out = np.zeros((width,) + wk.shape[1:], np.float32)
        start = (width - span) // 2
        for t in range(k):
            out[start + t * dilation] = wk[t]
        return out

    for i in range(cfg.num_upsamples):
        ch = cfg.stage_channels(i)
        W1 = np.zeros((npair, w1_max, ch, nb * ch), np.float32)
        B1 = np.zeros((npair, nb * ch), np.float32)
        W2 = np.zeros((npair, w2_max, ch, nb * ch), np.float32)
        B2 = np.zeros((npair, nb * ch), np.float32)
        A1 = np.zeros((npair, nb * ch), np.float32)
        Be1 = np.zeros((npair, nb * ch), np.float32)
        A2 = np.zeros((npair, nb * ch), np.float32)
        Be2 = np.zeros((npair, nb * ch), np.float32)
        for j in range(nb):
            rb = params["resblocks"][i * nb + j]
            k = cfg.resblock_kernel_sizes[j]
            for p in range(npair):
                d = cfg.resblock_dilation_sizes[j][p]
                sl = slice(j * ch, (j + 1) * ch)
                W1[p, :, :, sl] = dense(np.asarray(rb["convs1"][p]["w"]), d,
                                        w1_max)
                B1[p, sl] = np.asarray(rb["convs1"][p]["b"])
                W2[p, :, :, sl] = dense(np.asarray(rb["convs2"][p]["w"]), 1,
                                        w2_max)
                B2[p, sl] = np.asarray(rb["convs2"][p]["b"])
                a1 = rb["acts"][2 * p]
                a2 = rb["acts"][2 * p + 1]
                A1[p, sl] = np.asarray(a1["alpha"])
                A2[p, sl] = np.asarray(a2["alpha"])
                if "beta" in a1:
                    Be1[p, sl] = np.asarray(a1["beta"])
                    Be2[p, sl] = np.asarray(a2["beta"])
        fused["stages"].append({
            "w1": W1, "b1": B1, "w2": W2, "b2": B2,
            "alpha1": A1, "beta1": Be1, "alpha2": A2, "beta2": Be2,
        })
    return fused


def _aa(x, alpha, beta, cfg: BigVGANConfig):
    y = upsample2(x)
    if cfg.activation == "snakebeta":
        y = snake_beta(y, alpha, beta, cfg.snake_logscale)
    else:
        y = snake(y, alpha, cfg.snake_logscale)
    return downsample2(y)


@partial(jax.jit, static_argnames=("cfg",))
def _vocode_window_fused(params: Dict[str, Any], cfg: BigVGANConfig,
                         latent: jnp.ndarray, spk: jnp.ndarray) -> jnp.ndarray:
    """Grouped/scanned window form. NOTE: the kernel-width unification
    inflates early-stage weights (width 51 × 3 branches at C≥768 ⇒ GB-scale
    padded kernels), which this backend's compiler handles terribly — kept
    for low-channel configs and future per-stage-width refinement; the
    default path is the reference-structured one below."""
    import index_tts_dubbing_tpu.nn as nn
    from jax import lax

    nb = cfg.num_kernels
    x = nn.conv1d(params["conv_pre"], latent, padding=3)
    x = x + nn.conv1d(params["cond_layer"], spk, padding=(0, 0))
    for i in range(cfg.num_upsamples):
        u = cfg.upsample_rates[i]
        k = cfg.upsample_kernel_sizes[i]
        x = nn.conv_transpose1d(params["ups"][i], x, stride=u,
                                padding=(k - u) // 2)
        if cfg.cond_in_each_up_layer:
            x = x + nn.conv1d(params["conds"][i], spk, padding=(0, 0))
        st = params["stages"][i]
        w1_pad = (st["w1"].shape[1] - 1) // 2
        w2_pad = (st["w2"].shape[1] - 1) // 2
        X = jnp.tile(x, (1, 1, nb))

        def pair(X, pp):
            h = _aa(X, pp["alpha1"], pp["beta1"], cfg)
            h = nn.conv1d({"w": pp["w1"], "b": pp["b1"]}, h,
                          padding=w1_pad, groups=nb)
            h = _aa(h, pp["alpha2"], pp["beta2"], cfg)
            h = nn.conv1d({"w": pp["w2"], "b": pp["b2"]}, h,
                          padding=w2_pad, groups=nb)
            return X + h, None

        X, _ = lax.scan(pair, X, st)
        b, t, _ = X.shape
        x = jnp.mean(X.reshape(b, t, nb, -1), axis=2)
    x = bigvgan_model._act(cfg, params["act_post"], x)
    x = nn.conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


@partial(jax.jit, static_argnames=("cfg",))
def _vocode_window(params: Dict[str, Any], cfg: BigVGANConfig,
                   latent: jnp.ndarray, spk: jnp.ndarray) -> jnp.ndarray:
    """One fixed-shape window (B, W, gpt_dim) + precomputed speaker embedding
    ((1|B), 1, spk_dim) → wav (B, W·1024). Reference-structured stages with
    the polyphase anti-aliased activations."""
    import index_tts_dubbing_tpu.nn as nn

    if spk.shape[0] == 1 and latent.shape[0] > 1:
        # broadcast inside jit: an eager broadcast_to per call costs a
        # dispatch round-trip on a remote backend
        spk = jnp.broadcast_to(spk, (latent.shape[0],) + spk.shape[1:])
    x = nn.conv1d(params["conv_pre"], latent, padding=3)
    x = x + nn.conv1d(params["cond_layer"], spk, padding=(0, 0))
    for i in range(cfg.num_upsamples):
        u = cfg.upsample_rates[i]
        k = cfg.upsample_kernel_sizes[i]
        x = nn.conv_transpose1d(params["ups"][i], x, stride=u,
                                padding=(k - u) // 2)
        if cfg.cond_in_each_up_layer:
            x = x + nn.conv1d(params["conds"][i], spk, padding=(0, 0))
        xs = None
        for j in range(cfg.num_kernels):
            rb = params["resblocks"][i * cfg.num_kernels + j]
            y = bigvgan_model._amp_block(cfg, rb, x,
                                         cfg.resblock_kernel_sizes[j],
                                         cfg.resblock_dilation_sizes[j])
            xs = y if xs is None else xs + y
        x = xs / cfg.num_kernels
    x = bigvgan_model._act(cfg, params["act_post"], x)
    x = nn.conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# C-major (time-minor) window path
#
# BigVGAN's late stages have C = 24..96 channels over 20k..80k time steps; in
# the channels-last layout every vector op uses only C of the 128 lanes and
# the anti-alias FIR's shifted slices relayout along the sublane axis —
# measured ~80% of vocoder time. Here the whole window runs as (B, C, T):
# convs via lax.conv NCW dimension numbers, anti-aliased snake via the
# time-in-lanes Pallas kernel. Numerics: same taps/order ⇒ allclose to the
# reference-structured path (accumulation order inside XLA convs may differ).
# ---------------------------------------------------------------------------

def _conv1d_cm(p: Dict[str, Any], x: jnp.ndarray, *, dilation: int = 1,
               padding=0) -> jnp.ndarray:
    """1-D conv over (B, C, T); weights in the shared (K, Cin, Cout) layout."""
    from jax import lax
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NCW", "WIO", "NCW"),
        preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[:, None]
    return y


def _conv_transpose1d_cm(p: Dict[str, Any], x: jnp.ndarray, *, stride: int,
                         padding: int = 0) -> jnp.ndarray:
    from jax import lax
    k = p["w"].shape[0]
    w = jnp.flip(p["w"], axis=0)            # (K, Cout, Cin)
    w = jnp.transpose(w, (0, 2, 1))         # (K, Cin, Cout) = WIO
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NCW", "WIO", "NCW"),
        preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[:, None]
    return y


def _act_cm(cfg: BigVGANConfig, p: Dict[str, Any], x: jnp.ndarray,
            use_pallas: bool) -> jnp.ndarray:
    from index_tts_dubbing_tpu.ops.alias_free import (
        anti_aliased_activation_cmajor)
    beta = p.get("beta") if cfg.activation == "snakebeta" else None
    return anti_aliased_activation_cmajor(x, p["alpha"], beta,
                                          cfg.snake_logscale, use_pallas)


@partial(jax.jit, static_argnames=("cfg", "use_pallas", "fuse_resblocks"))
def _vocode_window_cmajor(params: Dict[str, Any], cfg: BigVGANConfig,
                          latent: jnp.ndarray, spk: jnp.ndarray,
                          use_pallas: bool = True,
                          fuse_resblocks: bool = False,
                          packed=None) -> jnp.ndarray:
    """One window (B, W, gpt_dim) + speaker embedding → wav (B, W·1024),
    computed entirely in the (B, C, T) layout.

    fuse_resblocks: run each whole AMP resblock of the C ≤ 128 stages as ONE
    Pallas kernel (ops/pallas_resblock.py) — those stages are overhead-bound,
    not FLOP-bound (571 of ~709 ms at B=16·w112 before fusion). ``packed``:
    the pre-packed kernel weights from ``pack_fused_resblocks`` (computed
    once at vocoder init); None re-packs inline on every call (tests/direct
    callers)."""
    from index_tts_dubbing_tpu.ops.pallas_resblock import (
        fused_resblock_cmajor, pack_resblock)

    if spk.shape[0] == 1 and latent.shape[0] > 1:
        spk = jnp.broadcast_to(spk, (latent.shape[0],) + spk.shape[1:])
    x = jnp.swapaxes(latent, 1, 2)              # (B, gpt_dim, W) — small
    spk_cm = jnp.swapaxes(spk, 1, 2)            # (B, 512, 1)
    x = _conv1d_cm(params["conv_pre"], x, padding=3)
    x = x + _conv1d_cm(params["cond_layer"], spk_cm)
    for i in range(cfg.num_upsamples):
        u = cfg.upsample_rates[i]
        k = cfg.upsample_kernel_sizes[i]
        x = _conv_transpose1d_cm(params["ups"][i], x, stride=u,
                                 padding=(k - u) // 2)
        if cfg.cond_in_each_up_layer:
            x = x + _conv1d_cm(params["conds"][i], spk_cm)
        xs = None
        for j in range(cfg.num_kernels):
            rb = params["resblocks"][i * cfg.num_kernels + j]
            kk = cfg.resblock_kernel_sizes[j]
            dils = tuple(cfg.resblock_dilation_sizes[j])
            if fuse_resblocks and x.shape[1] <= 128:
                if packed is not None:
                    w1, b1, w2, b2, acts = packed[i * cfg.num_kernels + j]
                else:
                    w1, b1, w2, b2, acts = pack_resblock(rb, cfg, x.dtype)
                y = fused_resblock_cmajor(x, w1, b1, w2, b2, acts, kk, dils)
            else:
                y = x
                acts1, acts2 = rb["acts"][::2], rb["acts"][1::2]
                for c1, c2, a1, a2, d in zip(rb["convs1"], rb["convs2"],
                                             acts1, acts2, dils):
                    yt = _act_cm(cfg, a1, y, use_pallas)
                    yt = _conv1d_cm(c1, yt, dilation=d,
                                    padding=(kk * d - d) // 2)
                    yt = _act_cm(cfg, a2, yt, use_pallas)
                    yt = _conv1d_cm(c2, yt, padding=(kk - 1) // 2)
                    y = yt + y
            xs = y if xs is None else xs + y
        x = xs / cfg.num_kernels
    x = _act_cm(cfg, params["act_post"], x, use_pallas)
    x = _conv1d_cm(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[:, 0, :]


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def pack_fused_resblocks(params: Dict[str, Any], cfg: BigVGANConfig, dtype):
    """One-time packing of every C ≤ 128 stage's resblock weights into the
    fused kernel's layout: {flat resblock index: (w1, b1, w2, b2, acts)}.
    Computed at vocoder init so the per-window jits receive ready-packed
    operands instead of re-padding/stacking ~MBs of weights every call."""
    from index_tts_dubbing_tpu.ops.pallas_resblock import pack_resblock
    packed = {}
    for i in range(cfg.num_upsamples):
        if cfg.stage_channels(i) > 128:
            continue
        for j in range(cfg.num_kernels):
            k = i * cfg.num_kernels + j
            packed[k] = pack_resblock(params["resblocks"][k], cfg, dtype)
    return packed


@jax.jit
def _gather_windows(lat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Device-resident window assembly: gather window frames straight out of
    the (rows, MB, C) latent-pass output (``idx`` (NB, full) indexes the
    flattened (rows·MB, C) stream) → (NB, full, C) windows. Replaces the host
    round-trip (download latents → stitch → re-upload windows) with one small
    int32 index upload.

    Deliberately its OWN tiny jit (compiles in ~1 s), so the expensive window
    vocode program keys only on the NB window-count bucket — not on
    (rows, MB, NB), which would multiply the cold-compile matrix ~14× (the
    windows are materialized either way; runtime is unchanged)."""
    flat = lat.reshape(-1, lat.shape[-1])
    return jnp.take(flat, idx, axis=0)




@partial(jax.jit, static_argnames=())
def speaker_embedding(params: Dict[str, Any], mel_ref: jnp.ndarray) -> jnp.ndarray:
    return ecapa.forward(params["speaker_encoder"], mel_ref)


class WindowedVocoder:
    """Stateless driver: vocode arbitrary-length latents at static shapes.

    Windows are vocoded in BATCHED calls (window-count buckets, padded rows
    dropped) — per-window math is batch-independent, so outputs stay
    bit-equal to the sequential loop while one dispatch covers up to
    ``max_batch`` windows (the per-call RTT on a remote TPU link otherwise
    dominates: ~30 ms × #windows)."""

    WINDOW_COUNT_BUCKETS = (1, 2, 4, 8, 16, 32)

    # window=112 measured fastest on-chip (halo overhead 1.29x vs 1.67x at
    # 48; w=240 loses to smaller window batches — profile_vocoder_window.py)
    def __init__(self, params: Dict[str, Any], cfg: BigVGANConfig,
                 window: int = 112, halo: int = DEFAULT_HALO,
                 max_batch: int = 32, compute_dtype=None,
                 layout: Optional[str] = None,
                 use_pallas: Optional[bool] = None,
                 fuse_resblocks: Optional[bool] = None,
                 edge_exact: Optional[bool] = None):
        self.params = params
        self.cfg = cfg
        self.window = window
        self.halo = halo
        self.max_batch = max_batch
        # "ref": reference-structured channels-last stages (bit-exact
        # windowing; parity/CPU default);
        # "cmajor": time-minor stages + time-in-lanes Pallas anti-alias snake
        # (the fast TPU path — see _vocode_window_cmajor). Measured on the
        # chip it is the difference between vocoder RTF 0.075 and < 0.02
        # (BENCH_r01 → r02), so it is the default whenever we run on TPU.
        if layout is None:
            layout = "cmajor" if jax.default_backend() == "tpu" else "ref"
        self.layout = layout
        # the Pallas kernel is TPU-only; the cmajor XLA fallback runs anywhere
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # whole-resblock Pallas fusion for the C ≤ 128 stages (TPU-only)
        if fuse_resblocks is None:
            fuse_resblocks = use_pallas and jax.default_backend() == "tpu"
        self.fuse_resblocks = fuse_resblocks
        # The Pallas kernels replicate-pad stage inputs where the reference
        # zero-pads each conv — exact in window interiors (halo-cropped) but
        # approximate within the kernels' chain span of the TRUE stream
        # boundaries. Only the first and last window of a stream expose those
        # boundaries, so by default they are routed through the exact
        # cmajor-XLA path (zero-pad conv semantics) and everything else stays
        # on the fast kernels. Spec: alias_free_torch/filter.py:29-95
        # boundary behavior.
        if edge_exact is None:
            edge_exact = use_pallas or fuse_resblocks
        self.edge_exact = edge_exact
        self._packed = None  # filled lazily: one device-resident packing
        # bf16 compute matches the reference's fp16-autocast vocoder
        # (infer.py:613) and is ~8x MXU throughput vs fp32 on TPU; fp32 is
        # the parity/test default.
        self.compute_dtype = compute_dtype or jnp.float32
        self.upsample = int(np.prod(cfg.upsample_rates))

    def speaker_embedding(self, mel_ref: jnp.ndarray) -> jnp.ndarray:
        return speaker_embedding(self.params, mel_ref)

    def _packed_weights(self):
        """Device-resident fused-kernel weight packing, computed once."""
        if not (self.layout == "cmajor" and self.fuse_resblocks):
            return None
        if self._packed is None:
            self._packed = pack_fused_resblocks(self.params, self.cfg,
                                                self.compute_dtype)
        return self._packed

    def __call__(self, latent: np.ndarray, mel_ref: Optional[np.ndarray] = None,
                 spk: Optional[jnp.ndarray] = None) -> np.ndarray:
        """latent (T, C) or (1, T, C); returns wav (T·1024,) float32.

        With layout='ref' the result is bit-equal to the full-sequence
        forward. With layout='cmajor' the interior is exact but the Pallas
        kernel approximates the reference's boundary replication within ~6
        stage frames of the *true sequence boundaries* (up to ~0.02 abs —
        see ops/pallas_snake.py edge semantics); window edges are still
        cropped by the halo either way.

        Windows are *aligned* (clamped inside [0, T]) rather than padded, so
        a window edge is either the true sequence boundary (where the
        network's own padding semantics apply, exactly as in the full
        forward) or sits ≥ halo frames away from every kept output frame.
        Inputs shorter than one window run at their exact shape (jit-cached
        per length; short = rare in practice since chunked latents exceed
        window+2·halo)."""
        latent = np.asarray(latent, np.float32)
        if latent.ndim == 3:
            latent = latent[0]
        t = latent.shape[0]
        if spk is None:
            spk = self.speaker_embedding(jnp.asarray(mel_ref))
        w, h, up = self.window, self.halo, self.upsample
        full = w + 2 * h
        if t <= full:
            # a short stream is all boundary: the exact variant when the
            # fast path approximates edges
            vocode = self._vocode_fn(exact=self.edge_exact)
            wav = np.asarray(vocode(self.params, self.cfg,
                                    jnp.asarray(latent[None],
                                                self.compute_dtype),
                                    spk))[0].astype(np.float32)
            return wav
        # collect aligned windows, then vocode them in batched calls; every
        # batch is DISPATCHED before any result is collected — jax dispatch
        # is async, so batch k+1's upload/compute overlaps batch k's
        # download instead of serialising on np.asarray.
        chunks = []
        for chunk, exact in self._plan_batches(self._window_list(t)):
            vocode = self._vocode_fn(exact=exact)
            n = len(chunk)
            lat = np.empty((n, full, latent.shape[1]), np.float32)
            for i, (_, _, lo) in enumerate(chunk):
                lat[i] = latent[lo: lo + full]
            dev = vocode(self.params, self.cfg,
                         jnp.asarray(lat, self.compute_dtype), spk)
            chunks.append((chunk, dev))
        out = self._collect(t, chunks)
        self._edge_spk = spk
        self._apply_edge_patches(
            out, t, lambda lo, pw: jnp.asarray(latent[lo: lo + pw]))
        return out

    def _vocode_fn(self, exact: bool = False):
        """The window-batch vocode callable. exact=True forces the zero-pad
        conv semantics (no Pallas kernels) for stream-boundary windows."""
        if self.layout != "cmajor":
            return _vocode_window
        if exact:
            return partial(_vocode_window_cmajor, use_pallas=False,
                           fuse_resblocks=False, packed=None)
        return partial(_vocode_window_cmajor, use_pallas=self.use_pallas,
                       fuse_resblocks=self.fuse_resblocks,
                       packed=self._packed_weights())

    def _edge_approx(self) -> bool:
        """True when the fast path approximates TRUE stream boundaries
        (Pallas kernels replicate stage inputs where the exact path
        zero-pads each conv) — the case edge patches correct."""
        return (self.layout == "cmajor"
                and (self.use_pallas or self.fuse_resblocks))

    def _plan_batches(self, wins):
        """Yield (window chunk, exact_flag): every window rides the fast
        kernels. Stream-boundary exactness is restored AFTER collection by
        ``_apply_edge_patches`` — re-vocoding 2·halo-frame PATCHES through
        the exact path, not whole windows (a fast window's output is
        already exact ≥ halo frames from the boundary: halo ≥ the
        receptive field, the same contract that makes interior window
        seams exact; the unfused exact path is ~5× the fused kernels'
        per-frame cost, so shrinking its domain is the single biggest
        vocoder win — measured r05)."""
        for chunk in self._window_batches(wins):
            yield chunk, False

    def _apply_edge_patches(self, out: np.ndarray, t: int, fetch) -> None:
        """Overwrite out[: halo·up] and out[(t-halo)·up :] with the exact
        path's boundary outputs. ``fetch(lo, pw)`` returns the (pw, C)
        latent patch starting at stream frame lo (host or device source).
        Each patch keeps only its boundary-adjacent half; its other edge is
        ≥ halo from every kept sample, out of receptive-field reach."""
        if not (self.edge_exact and self._edge_approx()):
            return
        pw = 2 * self.halo
        up = self.upsample
        # windowed streams have t > window + 2·halo > pw, so the patches
        # always fit and their kept halves never overlap (t > 2·halo);
        # defensive early-out for direct callers
        if t < pw:
            return
        patches = jnp.stack([fetch(0, pw), fetch(t - pw, pw)])
        vocode = self._vocode_fn(exact=True)
        ewav = np.asarray(vocode(self.params, self.cfg,
                                 patches.astype(self.compute_dtype),
                                 self._edge_spk[:1])).astype(np.float32)
        out[: self.halo * up] = ewav[0, : self.halo * up]
        out[(t - self.halo) * up: t * up] = ewav[1, self.halo * up:]

    # -- shared window-plan helpers ------------------------------------
    def _window_list(self, t: int):
        w, h = self.window, self.halo
        full = w + 2 * h
        wins = []   # (start, end, win_lo)
        start = 0
        while start < t:
            end = min(start + w, t)
            wins.append((start, end, min(max(0, start - h), t - full)))
            start = end
        return wins

    def _window_batches(self, wins):
        """Power-of-two batches (largest ≤ max_batch first): every call
        exactly fills its compiled shape, so no padded rows are ever
        computed (17 windows → 16 + 1, not a padded 32-batch)."""
        c0 = 0
        while c0 < len(wins):
            rem = len(wins) - c0
            n = min(self.max_batch, 1 << (rem.bit_length() - 1))
            yield wins[c0: c0 + n]
            c0 += n

    def _collect(self, t: int, chunks) -> np.ndarray:
        up = self.upsample
        out = np.empty(t * up, np.float32)
        for chunk, dev in chunks:
            wavs = np.asarray(dev).astype(np.float32)
            for i, (s, e, lo) in enumerate(chunk):
                off = s - lo
                out[s * up: e * up] = wavs[i, off * up: (off + e - s) * up]
        return out

    def stream_device(self, lat, lens, order=None,
                      spk: Optional[jnp.ndarray] = None,
                      mel_ref: Optional[np.ndarray] = None) -> np.ndarray:
        """Vocode a latent stream that LIVES ON DEVICE — no host round-trip.

        lat: (rows, MB, C) device array (the bucketed latent-pass output,
        rows padded to MB with junk beyond each row's length); lens: (rows,)
        host ints = real frames per row; order: lat-row indices in stream
        order (default: all rows in order). The virtual stream is
        concat(lat[order[s], :lens[order[s]]]); windows are assembled by an
        on-device gather (one small int32 index upload per batch) and are
        bit-identical to the host path's slices, so outputs equal
        ``__call__`` on the stitched stream exactly.

        Compile note: programs key on (rows, MB, window-batch); the engine
        pads rows to a power of two and MB to CODE_BUCKETS, so the key space
        is the bounded product primed by tools/prime_cache.py. Streams
        shorter than one window fall back to the exact-shape host path
        (keyed on t, as __call__ always was)."""
        lens = np.asarray(lens, np.int64)
        order = (np.arange(lens.size) if order is None
                 else np.asarray(order, np.int64))
        slens = lens[order]
        bounds = np.concatenate([[0], np.cumsum(slens)])
        t = int(bounds[-1])
        if t == 0:
            return np.zeros(0, np.float32)
        if spk is None:
            spk = self.speaker_embedding(jnp.asarray(mel_ref))
        full = self.window + 2 * self.halo
        if t <= full:
            # short stream: the exact-length forward (identical padding
            # semantics to the full-sequence computation) — download the few
            # rows and take the host path; a gather-into-full window would
            # change the right-edge padding position.
            latnp = np.asarray(lat)
            stream = np.concatenate(
                [latnp[r, : slens[i]] for i, r in enumerate(order)], axis=0)
            return self(stream.astype(np.float32), spk=spk)
        mb = lat.shape[1]
        if lat.dtype != self.compute_dtype:
            lat = lat.astype(self.compute_dtype)
        # flatmap[p] = row-major index into lat.reshape(rows*MB, C) of
        # stream position p
        rows = np.repeat(order, slens)
        cols = np.arange(t) - np.repeat(bounds[:-1], slens)
        flatmap = (rows * mb + cols).astype(np.int32)
        chunks = []
        for chunk, exact in self._plan_batches(self._window_list(t)):
            idx = np.stack([flatmap[lo: lo + full] for (_, _, lo) in chunk])
            windows = _gather_windows(lat, jnp.asarray(idx))
            dev = self._vocode_fn(exact=exact)(self.params, self.cfg,
                                               windows, spk)
            chunks.append((chunk, dev))
        out = self._collect(t, chunks)
        self._edge_spk = spk
        self._apply_edge_patches(
            out, t,
            lambda lo, pw: _gather_windows(
                lat, jnp.asarray(flatmap[lo: lo + pw][None]))[0])
        return out

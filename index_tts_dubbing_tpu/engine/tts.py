"""IndexTTS-TPU inference engine: end-to-end zero-shot TTS orchestration.

Behavioural spec: indextts/infer.py (class IndexTTS: infer 500-660,
infer_fast 278-497, remove_long_silence 132-186, bucket_sentences 188-243,
pad_tokens_cat 245-262). Redesigned TPU-first:

- HF `generate` → jitted while_loop decode (engine/decode.py);
- variable shapes → static bucket shapes everywhere (text-width buckets for
  the decode prefix; masked-pad buckets for the latent pass — numerically
  exact, see models/gpt.py:forward_latent_bucketed);
- chunked vocoding → windowed streaming vocoder (engine/vocoder.py), one
  compile for any utterance length;
- per-stage wall-clock + RTF accounting kept (infer.py:632-642).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.engine import decode as decode_mod
from index_tts_dubbing_tpu.engine.decode import SamplingConfig
from index_tts_dubbing_tpu.engine.vocoder import WindowedVocoder
from index_tts_dubbing_tpu.models import bigvgan as bigvgan_model
from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.ops.mel import MelSpectrogram
from index_tts_dubbing_tpu.utils import audio as audio_util
from index_tts_dubbing_tpu.utils.checkpoint import load_params
from index_tts_dubbing_tpu.utils.config import EngineConfig, load_config
from index_tts_dubbing_tpu.utils.front import TextNormalizer, TextTokenizer


def remove_long_silence(codes: np.ndarray, stop_mel_token: int = 8193,
                        silent_token: int = 52, max_consecutive: int = 30
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Trim at the stop token and cap runs of the silence code at 10.
    Host-side port of infer.py:132-186 (same per-row semantics)."""
    out_rows: List[np.ndarray] = []
    lens: List[int] = []
    for row in np.asarray(codes):
        stops = np.nonzero(row == stop_mel_token)[0]
        ln = int(stops[0]) if stops.size else row.size
        if int(np.sum(row == silent_token)) > max_consecutive:
            kept = []
            run = 0
            for k in range(ln):
                if row[k] != silent_token:
                    kept.append(k)
                    run = 0
                elif run < 10:
                    kept.append(k)
                    run += 1
            row = row[kept]
            ln = len(kept)
        else:
            row = row[:ln]
        out_rows.append(row)
        lens.append(ln)
    max_len = max(lens) if lens else 0
    padded = np.full((len(out_rows), max_len), stop_mel_token, codes.dtype)
    for i, r in enumerate(out_rows):
        padded[i, : r.size] = r
    return padded, np.asarray(lens, np.int64)


@partial(jax.jit, static_argnames=("stop_mel_token", "silent_token",
                                   "max_consecutive"))
def remove_long_silence_device(codes: jnp.ndarray, stop_mel_token: int = 8193,
                               silent_token: int = 52,
                               max_consecutive: int = 30
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable silence trim (same semantics as remove_long_silence): codes
    (B, S) → (compacted codes stop-padded (B, S), lens (B,)). Static shapes —
    rows are compacted in place, enabling decode→trim→latent chains without
    a host round-trip (SURVEY §7 step 6)."""
    b, s = codes.shape
    idx = jnp.arange(s)[None, :]
    is_stop = codes == stop_mel_token
    any_stop = jnp.any(is_stop, axis=1)
    ln = jnp.where(any_stop, jnp.argmax(is_stop, axis=1), s)[:, None]
    valid = idx < ln
    silent = codes == silent_token
    # run length of consecutive silents ending at i: i − last non-silent idx
    last_ns = jax.lax.associative_scan(
        jnp.maximum, jnp.where(~silent, idx, -1), axis=1)
    run = idx - last_ns
    trim_row = jnp.sum(silent, axis=1, keepdims=True) > max_consecutive
    keep = valid & jnp.where(trim_row, ~silent | (run <= 10), True)
    new_pos = jnp.cumsum(keep, axis=1) - 1
    lens = jnp.sum(keep, axis=1)
    # scatter kept tokens to their compacted positions; dropped tokens all
    # write the stop/pad value to column s-1 (a kept token can land there
    # only when nothing was dropped, so the writes never conflict)
    dst = jnp.where(keep, new_pos, s - 1)
    out = jnp.full((b, s), stop_mel_token, codes.dtype)
    out = out.at[jnp.arange(b)[:, None], dst].set(
        jnp.where(keep, codes, stop_mel_token))
    return out, lens


def pad_tokens_cat(rows: List[np.ndarray], stop_text_token: int,
                   start_text_token: int, version: Optional[float] = 1.5
                   ) -> np.ndarray:
    """Batch text rows by the reference's version-keyed padding
    (infer.py:245-262): v1.5+ right-pads with stop_text_token; v1.0 pads
    with up to 8 stop_text_tokens then start_text_tokens.

    NOTE: the two styles are numerically equivalent through the decode
    prefix builder — the reference's prepare_gpt_inputs strips ALL
    start/stop text tokens per row before re-framing (model.py:616-619),
    and prepare_prefix_host (engine/decode.py) mirrors that. The engine
    therefore feeds UNPADDED rows straight to prepare_prefix_host and this
    helper exists for surface parity (callers that want the reference's
    batched-token layout); tests/test_engine.py proves the equivalence."""
    max_len = max(r.size for r in rows)
    out = np.empty((len(rows), max_len), np.int32)
    for i, r in enumerate(rows):
        r = np.asarray(r).reshape(-1)
        pad = max_len - r.size
        if version is not None and version >= 1.5:
            row = np.concatenate(
                [r, np.full(pad, stop_text_token, np.int32)])
        else:
            n = min(8, pad)
            row = np.concatenate(
                [r, np.full(n, stop_text_token, np.int32),
                 np.full(pad - n, start_text_token, np.int32)])
        out[i] = row[:max_len]
    return out


def bucket_sentences(sentences: Sequence, bucket_max_size: int = 4
                     ) -> List[List[Dict]]:
    """Length-sorted sentence bucketing (port of infer.py:188-243)."""
    outputs = [{"idx": i, "sent": s, "len": len(s)}
               for i, s in enumerate(sentences)]
    if len(outputs) <= bucket_max_size:
        return [outputs]
    buckets: List[List[Dict]] = []
    factor = 1.5
    last_bucket = None
    last_median = 0
    for sent in sorted(outputs, key=lambda x: x["len"]):
        if sent["len"] == 0:
            continue
        if (last_bucket is None or sent["len"] >= int(last_median * factor)
                or len(last_bucket) >= bucket_max_size):
            buckets.append([sent])
            last_bucket = buckets[-1]
            last_median = sent["len"]
        else:
            last_bucket.append(sent)
            last_median = last_bucket[len(last_bucket) // 2]["len"]
    out_buckets: List[List[Dict]] = []
    only_ones: List[Dict] = []
    for b in buckets:
        (only_ones if len(b) == 1 else out_buckets).append(
            b[0] if len(b) == 1 else b)
    if only_ones:
        for b in out_buckets:
            if len(b) < bucket_max_size:
                b.append(only_ones.pop(0))
                if not only_ones:
                    break
        if only_ones:
            out_buckets.extend(
                only_ones[i:i + bucket_max_size]
                for i in range(0, len(only_ones), bucket_max_size))
    return out_buckets


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_latent_jit = partial(jax.jit, static_argnames=("cfg",))(
    gpt_model.forward_latent_bucketed)
_cond_jit = partial(jax.jit, static_argnames=("cfg",))(
    gpt_model.get_conditioning)


class CharTokenizer:
    """Fallback tokenizer when no bpe.model ships with the checkpoints:
    deterministic codepoint hashing into the text-token space. Keeps the
    TextTokenizer interface subset the engine uses."""

    punctuation_marks_tokens = [".", "!", "?", "…"]

    def __init__(self, vocab_size: int = 12000,
                 normalizer: Optional[TextNormalizer] = None):
        self.vocab_size = vocab_size
        self.normalizer = normalizer
        if normalizer:
            normalizer.load()

    def tokenize(self, text: str) -> List[str]:
        if self.normalizer:
            text = self.normalizer.normalize(text)
        return [c for c in text if not c.isspace()]

    def convert_tokens_to_ids(self, tokens) -> List[int]:
        if isinstance(tokens, str):
            tokens = [tokens]
        return [2 + (ord(t[0]) % (self.vocab_size - 3)) for t in tokens]

    def split_sentences(self, tokens: List[str],
                        max_tokens_per_sentence: int = 120) -> List[List[str]]:
        return TextTokenizer.split_sentences_by_token(
            tokens, self.punctuation_marks_tokens, max_tokens_per_sentence)


@dataclass
class StageTimes:
    gpt_gen: float = 0.0
    gpt_forward: float = 0.0
    bigvgan: float = 0.0
    total: float = 0.0
    audio_seconds: float = 0.0

    @property
    def rtf(self) -> float:
        return self.total / max(self.audio_seconds, 1e-9)


class IndexTTS:
    """TPU-native engine with the reference's public API surface
    (IndexTTS(cfg_path, model_dir).infer / .infer_fast)."""

    TEXT_BUCKETS = (16, 32, 48, 64, 80, 96, 120)
    CODE_BUCKETS = (64, 128, 192, 256, 384, 512, 608)
    # batch-size buckets for the fused one-program route (bounds the compile
    # matrix; short dummy rows pad the batch and are cropped from the stream)
    FUSED_BATCH_BUCKETS = (1, 2, 4, 8, 16, 24, 32)
    # above this decode cap the fused route vocodes through the
    # window-exact device stream instead of the one-program static window
    # plan: the full graph's ceil(B·steps/window) windows are exact-cost
    # only when rows decode to ≈ steps; under a loose cap (the reference's
    # 600 default) early-stopping rows would pay up to steps/actual×
    # wasted static vocode (engine/fused.py:synthesize_fused_lat)
    FUSED_FULL_VOCODE_MAX_STEPS = 256

    def __init__(self, cfg_path: Optional[str] = None,
                 model_dir: Optional[str] = None, is_fp16: bool = False,
                 device=None, use_cuda_kernel=None,
                 config: Optional[EngineConfig] = None,
                 params: Optional[Dict[str, Any]] = None,
                 use_pallas: bool = False, seed: int = 0,
                 verbose_init: bool = True,
                 quantize: Optional[str] = None,
                 mesh=None, vocoder_window: Optional[int] = None):
        from index_tts_dubbing_tpu.utils.jax_setup import setup_jax
        setup_jax()
        self.cfg = (config if config is not None
                    else load_config(cfg_path) if cfg_path
                    else EngineConfig())
        if use_pallas:
            import dataclasses
            self.cfg = dataclasses.replace(
                self.cfg, bigvgan=dataclasses.replace(self.cfg.bigvgan,
                                                      use_pallas=True))
        self.gpt_cfg = self.cfg.gpt
        self.bigvgan_cfg = self.cfg.bigvgan
        self.dtype = jnp.bfloat16 if is_fp16 else jnp.float32
        self.stop_mel_token = self.gpt_cfg.stop_mel_token
        self.model_dir = Path(model_dir) if model_dir else None
        self.model_version = self.cfg.version

        if params is not None:
            self.params = dict(params)
            self.params["gpt"] = gpt_model.stack_blocks(self.params["gpt"])
        else:
            self.params = self._load_params(seed)
        if is_fp16:
            # bf16 weights: halves HBM traffic; norms/softmax still compute
            # in fp32 internally (see nn.py).
            import ml_dtypes
            self.params = jax.tree.map(
                lambda x: x.astype(ml_dtypes.bfloat16)
                if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
                self.params)
        if quantize == "int8":
            # weight-only int8 GPT trunk (utils/quant.py): halves decode
            # weight streaming; conditioning encoder & embeddings stay full
            # precision.
            from index_tts_dubbing_tpu.utils.quant import quantize_gpt_int8
            self.params["gpt"] = quantize_gpt_int8(self.params["gpt"])
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode: {quantize!r}")
        # Pin weights on device ONCE. Host numpy params passed to jitted
        # functions are re-uploaded on every call — on the remote TPU link
        # that cost ~40 ms/decode-step (~25x the on-device step time).
        # With a mesh: GPT gets megatron-style TP shardings over the
        # ``model`` axis, the (small, bandwidth-bound) vocoder is replicated
        # and scales over ``data`` (parallel/mesh.py).
        self.mesh = mesh
        if mesh is not None:
            from index_tts_dubbing_tpu.parallel import mesh as mesh_lib
            specs = {
                "gpt": mesh_lib.gpt_param_specs(
                    self.params["gpt"], model_size=mesh.shape["model"]),
                "bigvgan": mesh_lib.bigvgan_param_specs(
                    self.params["bigvgan"]),
            }
            self.params = mesh_lib.shard_tree(self.params, specs, mesh)
        else:
            self.params = jax.device_put(self.params)
        self._log = print if verbose_init else (lambda *a, **k: None)

        self.normalizer = TextNormalizer()
        self.normalizer.load()
        self.tokenizer = self._load_tokenizer()
        self.mel_fn = MelSpectrogram(
            sample_rate=self.cfg.mel.sample_rate, n_fft=self.cfg.mel.n_fft,
            hop_length=self.cfg.mel.hop_length,
            win_length=self.cfg.mel.win_length, n_mels=self.cfg.mel.n_mels)
        self.vocoder = WindowedVocoder(self.params["bigvgan"],
                                       self.bigvgan_cfg,
                                       compute_dtype=self.dtype,
                                       **({"window": vocoder_window}
                                          if vocoder_window else {}))
        self.cache_audio_prompt = None
        self.cache_cond_mel = None
        self.gr_progress = None
        # keys live on host CPU: eager PRNG ops would otherwise each be a
        # separate device program (a server compile+load on this backend)
        with jax.default_device(jax.devices("cpu")[0]):
            self._rng = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------
    def _load_params(self, seed: int) -> Dict[str, Any]:
        p = self._load_params_raw(seed)
        p["gpt"] = gpt_model.stack_blocks(p["gpt"])
        return p

    def _load_params_raw(self, seed: int) -> Dict[str, Any]:
        if self.model_dir is not None:
            npz_gpt = self.model_dir / "gpt.npz"
            npz_bv = self.model_dir / "bigvgan.npz"
            if npz_gpt.exists() and npz_bv.exists():
                return {"gpt": load_params(npz_gpt),
                        "bigvgan": load_params(npz_bv)}
            pth_gpt = self.model_dir / self.cfg.gpt_checkpoint
            pth_bv = self.model_dir / self.cfg.bigvgan_checkpoint
            if pth_gpt.exists() and pth_bv.exists():
                from index_tts_dubbing_tpu.utils.convert import (
                    convert_bigvgan, convert_unified_voice,
                    load_torch_state_dict)
                return {
                    "gpt": convert_unified_voice(
                        load_torch_state_dict(str(pth_gpt)),
                        layers=self.gpt_cfg.layers,
                        cond_blocks=self.gpt_cfg.cond_num_blocks),
                    "bigvgan": convert_bigvgan(
                        load_torch_state_dict(str(pth_bv)),
                        num_upsamples=self.bigvgan_cfg.num_upsamples,
                        num_kernels=self.bigvgan_cfg.num_kernels),
                }
        # no checkpoints: random init (benches / smoke runs). Run on host CPU:
        # eager per-layer RNG ops over a remote TPU link would take minutes.
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            return {"gpt": gpt_model.init(k1, self.gpt_cfg),
                    "bigvgan": bigvgan_model.init(k2, self.bigvgan_cfg)}

    def _load_tokenizer(self):
        if self.model_dir is not None:
            bpe = self.model_dir / self.cfg.bpe_model
            if bpe.exists():
                return TextTokenizer(str(bpe), self.normalizer)
        return CharTokenizer(self.gpt_cfg.number_text_tokens, self.normalizer)

    # ------------------------------------------------------------------
    def _cond_mel(self, audio_prompt) -> jnp.ndarray:
        if (self.cache_cond_mel is None
                or self.cache_audio_prompt != audio_prompt):
            wav = audio_util.load_audio_mean_mono(
                audio_prompt, self.cfg.mel.sample_rate)
            mel = np.asarray(self.mel_fn(wav))  # (1, n_mels, T)
            self.cache_audio_prompt = audio_prompt
            self.cache_cond_mel = mel
        return self.cache_cond_mel

    def set_cond_mel(self, mel: np.ndarray, key: str = "<direct>") -> None:
        """Inject a conditioning mel directly ((1, n_mels, T))."""
        self.cache_audio_prompt = key
        self.cache_cond_mel = np.asarray(mel)

    def _conditioning(self, cond_mel: np.ndarray) -> jnp.ndarray:
        lens = np.array([cond_mel.shape[-1]], np.int64)
        return _cond_jit(self.params["gpt"], self.gpt_cfg,
                         jnp.asarray(cond_mel.transpose(0, 2, 1)), lens)

    def _next_key(self) -> jax.Array:
        with jax.default_device(jax.devices("cpu")[0]):
            self._rng, sub = jax.random.split(self._rng)
        return sub

    def _sampling_config(self, kw: Dict[str, Any]) -> SamplingConfig:
        # reference defaults (infer.py:326-334): num_beams=3 with
        # do_sample=True → HF *beam sampling* (stochastic beams,
        # decode.generate_beam_sample); do_sample=False → deterministic
        # beam search; num_beams=1 → plain sampling/greedy.
        self._num_beams = kw.pop("num_beams", 3)
        self._length_penalty = kw.pop("length_penalty", 0.0)
        return SamplingConfig(
            do_sample=kw.pop("do_sample", True),
            top_p=kw.pop("top_p", 0.8),
            top_k=kw.pop("top_k", 30),
            temperature=kw.pop("temperature", 1.0),
            repetition_penalty=kw.pop("repetition_penalty", 10.0),
            # clamped to the model's positional budget (the reference's 600
            # default assumes the production 605-slot model, infer.py:334)
            max_mel_tokens=min(kw.pop("max_mel_tokens", 600),
                               self.gpt_cfg.max_mel_tokens),
            typical_sampling=kw.pop("typical_sampling", False),
            typical_mass=kw.pop("typical_mass", 0.9),
        )

    def _decode_continuous(self, conds, token_rows: List[np.ndarray],
                           sc: SamplingConfig, batch: int = 8,
                           chunk: int = 48) -> Tuple[np.ndarray, np.ndarray]:
        """Continuous-batching decode over many rows: slots are refilled the
        moment a row finishes (engine/continuous.py), so heterogeneous row
        lengths don't serialise the chip the way per-bucket decoding does."""
        from index_tts_dubbing_tpu.engine import continuous as cb
        batcher = cb.ContinuousBatcher(
            self.params["gpt"], self.gpt_cfg, sc, conds,
            batch=min(batch, len(token_rows)), chunk=chunk,
            text_buckets=self.TEXT_BUCKETS, rng=self._next_key())
        results = batcher.run(
            [cb.CBRequest(uid=i, text_ids=r) for i, r in enumerate(token_rows)],
            dtype=self.dtype)
        max_len = max((ln for _, ln in results.values()), default=0)
        codes = np.full((len(token_rows), max(max_len, 1)),
                        self.stop_mel_token, np.int32)
        lens = np.zeros(len(token_rows), np.int64)
        for i in range(len(token_rows)):
            row, ln = results[i]
            codes[i, :ln] = row[:ln]
            lens[i] = ln
        return codes, lens

    def _decode_batch(self, conds, token_rows: List[np.ndarray],
                      sc: SamplingConfig) -> Tuple[np.ndarray, np.ndarray]:
        """AR decode for a batch of token rows at bucketed static shapes."""
        res, n_real = self._decode_batch_async(conds, token_rows, sc)
        return (np.asarray(res.codes)[:n_real],
                np.asarray(res.lengths)[:n_real])

    def _decode_batch_async(self, conds, token_rows: List[np.ndarray],
                            sc: SamplingConfig):
        """Dispatch one bucketed decode WITHOUT synchronising: returns the
        on-device GenerateResult handle + the real row count. JAX dispatch is
        async, so the caller can queue several buckets back-to-back and the
        chip pipelines them while the host post-processes earlier results
        (stage overlap, SURVEY §2.3 async row)."""
        n_real = len(token_rows)
        live = None
        if self.mesh is not None:
            # batch must tile the data axis: pad with single-token dummy
            # rows marked dead via ``live`` — they emit stop at step 0
            # instead of duplicating a real row's full decode
            dp = self.mesh.shape["data"]
            pad_n = (-n_real) % dp
            if pad_n:
                token_rows = (list(token_rows)
                              + [np.array([2], np.int32)] * pad_n)
                live = jnp.asarray(
                    np.arange(len(token_rows)) < n_real)
        lmax = max(r.size for r in token_rows)
        pad_to = next((b for b in self.TEXT_BUCKETS if b >= lmax), lmax)
        pre = decode_mod.prepare_prefix_host(self.gpt_cfg, token_rows,
                                             pad_to=pad_to)
        emb, keep = decode_mod.build_prefix_emb(
            self.params["gpt"], self.gpt_cfg, conds,
            pre["ids"], pre["pos"], pre["seg"], pre["cond_idx"])
        if getattr(self, "_num_beams", 1) > 1:
            if sc.do_sample:
                res = decode_mod.generate_beam_sample(
                    self.params["gpt"], self.gpt_cfg, sc, emb, keep,
                    self._next_key(), num_beams=self._num_beams,
                    length_penalty=self._length_penalty, mesh=self.mesh,
                    live=live)
            else:
                res = decode_mod.generate_beam(
                    self.params["gpt"], self.gpt_cfg, sc, emb, keep,
                    num_beams=self._num_beams,
                    length_penalty=self._length_penalty, mesh=self.mesh,
                    live=live)
        else:
            res = decode_mod.generate(self.params["gpt"], self.gpt_cfg, sc,
                                      emb, keep, self._next_key(),
                                      mesh=self.mesh, live=live)
        return res, n_real

    def _bucket_dims(self, lt: int, code_len: int) -> Tuple[int, int]:
        lb = next((b for b in self.TEXT_BUCKETS if b >= lt), lt)
        lb = max(min(lb, self.gpt_cfg.max_text_tokens), lt)
        mb = next((b for b in self.CODE_BUCKETS if b >= code_len), code_len)
        mb = max(min(mb, self.gpt_cfg.max_mel_tokens), code_len)
        return lb, mb

    def _latents(self, conds, text_tokens: np.ndarray, codes: np.ndarray,
                 code_len: int) -> np.ndarray:
        """Latent pass for one row at bucketed static shapes; returns
        (code_len, C)."""
        return self._latents_batch(conds,
                                   [(text_tokens, codes, code_len)])[0]

    def _latents_batch(self, conds, rows) -> List[np.ndarray]:
        """Latent passes for many (text_tokens, codes, code_len) rows,
        grouped by bucket shape so each group is ONE batched forward (the
        reference runs batch-size-1 per row, infer.py:430-435). Host-side
        result; the device-resident variant below feeds the vocoder."""
        lat, lens, inv = self._latents_batch_device(conds, rows,
                                                    bucket_rows=False)
        latnp = np.asarray(lat)
        return [latnp[inv[i], : int(lens[inv[i]])] for i in range(len(rows))]

    def _latents_batch_device(self, conds, rows, bucket_rows: bool = True):
        """Latent passes whose outputs STAY ON DEVICE: returns
        (lat (R, MB, C) device array, lens (n,) np, inv (n,) np) where input
        row i lives in lat row inv[i], padded to the common code bucket MB.
        With bucket_rows, R is n padded to the next power of two (pad rows
        are junk and never gathered) so the downstream vocode-gather program
        keys on a bounded shape set. Feeds WindowedVocoder.stream_device —
        the stitched stream never round-trips through the host."""
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, (text_tokens, codes, code_len) in enumerate(rows):
            lb, mb = self._bucket_dims(text_tokens.size, code_len)
            groups.setdefault((lb, mb), []).append(i)
        mb_all = max(mb for (_, mb) in groups)
        pending = []
        for (lb, mb), idxs in groups.items():
            g = len(idxs)
            text = np.full((g, lb), self.gpt_cfg.stop_text_token, np.int32)
            cpad = np.full((g, mb), self.stop_mel_token, np.int32)
            tlens = np.zeros(g, np.int64)
            clens = np.zeros(g, np.int64)
            for gi, i in enumerate(idxs):
                text_tokens, codes, code_len = rows[i]
                text[gi, :text_tokens.size] = text_tokens
                cpad[gi, :code_len] = codes[:code_len]
                tlens[gi] = text_tokens.size
                clens[gi] = code_len
            cnds = conds
            if cnds.shape[0] == 1 and g > 1:
                cnds = jnp.broadcast_to(cnds, (g,) + cnds.shape[1:])
            dev = _latent_jit(
                self.params["gpt"], self.gpt_cfg, cnds, jnp.asarray(text),
                jnp.asarray(tlens), jnp.asarray(cpad), jnp.asarray(clens))
            if mb < mb_all:
                dev = jnp.pad(dev, ((0, 0), (0, mb_all - mb), (0, 0)))
            pending.append((idxs, clens, dev))
        parts = [dev for _, _, dev in pending]
        lat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        n = len(rows)
        if bucket_rows:
            rb = 1 << max(0, n - 1).bit_length() if n > 1 else 1
            if rb != n:
                lat = jnp.pad(lat, ((0, rb - n), (0, 0), (0, 0)))
        rowmap = np.concatenate([idxs for idxs, _, _ in pending])
        lens = np.concatenate([clens for _, clens, _ in pending])
        inv = np.empty(n, np.int64)
        inv[rowmap] = np.arange(n)
        return lat, lens, inv

    # ------------------------------------------------------------------
    def aot_compile_fused(self, batch: int, n_text: int, sc: SamplingConfig,
                          num_beams: int = 1, cond_frames: int = 470,
                          n_live: Optional[int] = None):
        """AOT-compile the fused synthesis program for a workload shape.
        Returns the compiled executable (also primed into the persistent
        compile cache). See aot_lower_fused for the aval-derivation rules;
        callers overlapping several compiles MUST lower sequentially and
        only thread the .compile() calls (lowering is not
        deterministic under concurrency — see bench.py)."""
        return self.aot_lower_fused(batch, n_text, sc, num_beams=num_beams,
                                    cond_frames=cond_frames,
                                    n_live=n_live).compile()

    def aot_lower_fused(self, batch: int, n_text: int, sc: SamplingConfig,
                        num_beams: int = 1, cond_frames: int = 470,
                        n_live: Optional[int] = None):
        """Lower (do NOT compile) the fused synthesis program for a workload
        shape, with EXACTLY the avals the runtime ``synthesize_fused`` call
        will produce. Dtype/shape drift between a hand-built ShapeDtypeStruct
        set and the runtime call costs a silent full recompile (the engine's
        conds/spk come out fp32 even under bf16 params because norms lift to
        fp32), so the conds/spk avals are derived with jax.eval_shape from
        the same jitted functions the runtime uses, and the prefix arrays
        from prepare_prefix_host itself.

        Lowering is kept separate from compiling so callers can lower
        deterministically on one thread and overlap only the .compile()
        calls (which release the GIL). NOTE on the persistent compile
        cache: the cache key retains residual CALLER-PATH bytes that
        survive MLIR strip-debuginfo in this jax version — the same
        program lowered from two different scripts (or the same script
        after line-number shifts) gets DIFFERENT keys (root-caused r04;
        this was r03's 'seed cache never hits' failure mode). Cache
        snapshots must therefore be produced by the same file that will
        replay them (tools/seed_cache.py snapshot-exact runs bench.py
        --compile-only)."""
        from index_tts_dubbing_tpu.engine import fused as fused_mod
        from index_tts_dubbing_tpu.engine import vocoder as voc_mod
        cfg = self.gpt_cfg
        voc = self.vocoder

        def sds(x):
            return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype) \
                if not hasattr(x, "aval") \
                else jax.ShapeDtypeStruct(x.shape, x.dtype)

        gpt_sds = jax.tree.map(sds, self.params["gpt"])
        bv_sds = jax.tree.map(sds, self.params["bigvgan"])
        mel_sds = jax.ShapeDtypeStruct((1, cond_frames, self.cfg.mel.n_mels),
                                       np.float32)
        len_sds = jax.ShapeDtypeStruct((1,), np.int32)
        conds_sds = jax.eval_shape(partial(_cond_jit, gpt_sds, cfg),
                                   mel_sds, len_sds)
        spk_sds = jax.eval_shape(partial(voc_mod.speaker_embedding, bv_sds),
                                 mel_sds)
        pad_to = next((bb for bb in self.TEXT_BUCKETS if bb >= n_text),
                      n_text)
        dummy = [np.zeros(n_text, np.int32)] * batch
        pre = decode_mod.prepare_prefix_host(cfg, dummy, pad_to=pad_to)
        pre_sds = [sds(jnp.asarray(pre[k]))
                   for k in ("ids", "pos", "seg", "cond_idx")]
        text_sds = jax.ShapeDtypeStruct((batch, pad_to), np.int32)
        tlen_sds = jax.ShapeDtypeStruct((batch,), np.int32)
        key_sds = sds(self._rng)
        cmajor = voc.layout == "cmajor"
        packed = voc._packed_weights() if cmajor else None
        packed_sds = jax.tree.map(sds, packed) if packed is not None else None
        # window count + live mask mirror _synthesize_fused_public exactly
        # (n_live = real rows before batch-bucket padding; default full)
        if n_live is None:
            n_live = batch
        nw_pad = -(-batch * sc.max_mel_tokens // voc.window)
        nw_real = -(-n_live * sc.max_mel_tokens // voc.window)
        num_windows = min(nw_pad, _round_up(nw_real, 8))
        live_sds = jax.ShapeDtypeStruct((batch,), np.bool_)
        return fused_mod.synthesize_fused.lower(
            gpt_sds, bv_sds, cfg, self.bigvgan_cfg, sc, conds_sds, *pre_sds,
            text_sds, tlen_sds, spk_sds, key_sds, packed_sds, 0.0, live_sds,
            num_windows=num_windows, window=voc.window, halo=voc.halo,
            use_pallas=voc.use_pallas if cmajor else False,
            fuse_resblocks=voc.fuse_resblocks if cmajor else False,
            edge_exact=voc.edge_exact, num_beams=num_beams)

    def synthesize_fused(self, conds, token_rows: List[np.ndarray],
                         sc: SamplingConfig, spk, live=None,
                         num_windows: Optional[int] = None,
                         emit: str = "f32"):
        """One-program batch synthesis (engine/fused.py): the whole
        decode→trim→latent→vocode pipeline as a single XLA program, honoring
        the engine's num_beams (beam sampling/search when > 1). Rows are
        padded to one TEXT bucket. ``live`` (n,) bool marks batch-padding
        rows dead (stop at step 0, zero stream frames); ``num_windows``
        overrides the static vocode window count (callers that know the live
        row count can shrink it below ceil(n·steps/window)). ``emit``:
        "f32" downloads the fp32 waveform; "i16" downloads the DEVICE-side
        int16 emission (clip(wav·32767) — half the bytes over the tunneled
        link; the public surfaces' output scaling). Returns
        (wav (t·1024,) float32 or int16 per ``emit``, FusedResult) — wav
        already cropped to the real stream length."""
        from index_tts_dubbing_tpu.engine import fused as fused_mod
        n = len(token_rows)
        lmax = max(r.size for r in token_rows)
        pad_to = next((bb for bb in self.TEXT_BUCKETS if bb >= lmax), lmax)
        pre = decode_mod.prepare_prefix_host(self.gpt_cfg, token_rows,
                                             pad_to=pad_to)
        text = np.full((n, pad_to), self.gpt_cfg.stop_text_token, np.int32)
        tlens = np.zeros(n, np.int64)
        for i, r in enumerate(token_rows):
            text[i, : r.size] = r
            tlens[i] = r.size
        voc = self.vocoder
        cmajor = voc.layout == "cmajor"
        steps = sc.max_mel_tokens
        if num_windows is None:
            num_windows = -(-n * steps // voc.window)
        res = fused_mod.synthesize_fused(
            self.params["gpt"], self.params["bigvgan"], self.gpt_cfg,
            self.bigvgan_cfg, sc, conds,
            jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]),
            jnp.asarray(pre["seg"]), jnp.asarray(pre["cond_idx"]),
            jnp.asarray(text), jnp.asarray(tlens), spk, self._next_key(),
            voc._packed_weights() if cmajor else None,
            getattr(self, "_length_penalty", 0.0),
            live if live is None else jnp.asarray(live),
            num_windows=num_windows, window=voc.window, halo=voc.halo,
            use_pallas=voc.use_pallas if cmajor else False,
            fuse_resblocks=voc.fuse_resblocks if cmajor else False,
            edge_exact=voc.edge_exact,
            num_beams=getattr(self, "_num_beams", 1))
        t = int(res.stream_frames)
        up = voc.upsample
        if t < voc.window + 2 * voc.halo:
            # short stream: the fused window plan cannot represent a stream
            # shorter than one full window (its halo would read junk instead
            # of the true boundary); re-vocode through the exact-length host
            # path, exactly as stream_device does (engine/vocoder.py).
            latnp = np.asarray(res.lat)
            lens = np.asarray(res.lens)
            stream = np.concatenate(
                [latnp[i, : lens[i]] for i in range(n)], axis=0)
            wav = voc(stream.astype(np.float32), spk=spk[:1])
            if emit == "i16":
                wav = np.clip(wav * 32767.0, -32767.0,
                              32767.0).astype(np.int16)
            return wav, res
        if emit == "i16":
            return np.asarray(res.wav_i16)[: t * up], res
        wav = np.asarray(res.wav)[: t * up].astype(np.float32)
        return wav, res

    # ------------------------------------------------------------------
    def _fused_eligible(self, rows: List[np.ndarray]) -> bool:
        """True when a workload can ride the fused one-program path
        (engine/fused.py): single-chip, non-empty rows, batch within the
        largest batch bucket, every row within the largest text bucket.
        Mixed-length rows are served by padding ALL rows to the batch's max
        TEXT bucket — numerically exact (extra left-padding is
        attention-masked; the reference's padding-invariance contract,
        prepare_prefix_host) and measured cheap: the decode step cost is
        gen-region/weight-bound, the prefix width only adds prefill +
        prefix-attention (see docs/PERFORMANCE_NOTES.md r05 mixed-bucket
        numbers). This closes r04's gap where real multi-sentence texts
        (whose sentences span buckets, the fast path's raison d'être —
        infer.py:188-243) silently fell back to the staged path."""
        if self.mesh is not None or not rows:
            return False
        if len(rows) > self.FUSED_BATCH_BUCKETS[-1]:
            return False
        limit = min(self.TEXT_BUCKETS[-1], self.gpt_cfg.max_text_tokens)
        return not any(r.size == 0 or r.size > limit for r in rows)

    def _synthesize_fused_public(self, conds, rows: List[np.ndarray],
                                 sc: SamplingConfig, spk
                                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Fused-path execution for the public surfaces: pads the batch to a
        FUSED_BATCH_BUCKET with dummy rows marked DEAD via the ``live``
        mask (they stop at decode step 0 and contribute zero stream frames,
        so padding costs neither decode steps nor vocode windows), runs
        synthesize_fused, and returns (wav, per-row latent frame lens for
        the REAL rows). wav is int16 in the EMISSION scaling (device-side
        clip(wav·32767) — half the download bytes) on the full-vocode
        flavor, fp32 pre-clip on the fused+stream flavor — callers branch
        on dtype."""
        n_real = len(rows)
        n_pad = next(bb for bb in self.FUSED_BATCH_BUCKETS if bb >= n_real)
        rows = list(rows) + [np.array([2], np.int32)] * (n_pad - n_real)
        # ALWAYS pass the mask (all-True on exact fill): a None-vs-array
        # split would double the compile-key space per shape
        live = np.arange(n_pad) < n_real
        if sc.max_mel_tokens > self.FUSED_FULL_VOCODE_MAX_STEPS:
            # fused decode→trim→latent program + window-exact streamed
            # vocode (vocoder windows sized by the ACTUAL stream length)
            from index_tts_dubbing_tpu.engine import fused as fused_mod
            lmax = max(r.size for r in rows)
            pad_to = next((bb for bb in self.TEXT_BUCKETS if bb >= lmax),
                          lmax)
            pre = decode_mod.prepare_prefix_host(self.gpt_cfg, rows,
                                                 pad_to=pad_to)
            text = np.full((len(rows), pad_to), self.gpt_cfg.stop_text_token,
                           np.int32)
            tlens = np.zeros(len(rows), np.int64)
            for i, r in enumerate(rows):
                text[i, : r.size] = r
                tlens[i] = r.size
            res = fused_mod.synthesize_fused_lat(
                self.params["gpt"], self.gpt_cfg, sc, conds,
                jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]),
                jnp.asarray(pre["seg"]), jnp.asarray(pre["cond_idx"]),
                jnp.asarray(text), jnp.asarray(tlens), self._next_key(),
                getattr(self, "_length_penalty", 0.0), jnp.asarray(live),
                num_beams=getattr(self, "_num_beams", 1))
            self.last_fused_res = res
            self.last_fused_flavor = "fused+stream"
            lens = np.asarray(res.lens)[:n_real]
            wav = self.vocoder.stream_device(
                res.lat, np.asarray(res.lens),
                order=np.arange(n_real, dtype=np.int64), spk=spk)
            return wav, lens
        # static window count sized by the LIVE rows (dead pad rows emit 0
        # stream frames), rounded up to a multiple of 8 to bound the
        # compile-key space, capped at the padded batch's worst case
        steps = sc.max_mel_tokens
        voc = self.vocoder
        nw_pad = -(-n_pad * steps // voc.window)
        nw_real = -(-n_real * steps // voc.window)
        num_windows = min(nw_pad, _round_up(nw_real, 8))
        wav, res = self.synthesize_fused(conds, rows, sc, spk, live=live,
                                         num_windows=num_windows,
                                         emit="i16")
        self.last_fused_res = res
        self.last_fused_flavor = "fused"
        lens = np.asarray(res.lens)[:n_real]
        wav = wav[: int(lens.sum()) * self.vocoder.upsample]
        return wav, lens

    def _set_gr_progress(self, value, desc):
        if self.gr_progress is not None:
            self.gr_progress(value, desc=desc)

    def infer(self, audio_prompt, text, output_path=None, verbose=False,
              max_text_tokens_per_sentence=120, **generation_kwargs):
        """Sequential per-sentence synthesis (reference infer, infer.py:500)."""
        start_time = time.perf_counter()
        self._set_gr_progress(0, "start inference...")
        times = StageTimes()
        cond_mel = self._cond_mel(audio_prompt)
        conds = self._conditioning(cond_mel)
        sc = self._sampling_config(generation_kwargs)

        self._set_gr_progress(0.1, "text processing...")
        tokens = self.tokenizer.tokenize(text)
        sentences = self.tokenizer.split_sentences(
            tokens, max_text_tokens_per_sentence)
        if verbose:
            print(f">> {len(tokens)} tokens, {len(sentences)} sentences")
        sr = self.cfg.mel.sample_rate
        spk = self.vocoder.speaker_embedding(
            jnp.asarray(cond_mel.transpose(0, 2, 1)))
        # decode stays per-sentence (the reference's sequential hot loop,
        # infer.py:553); latent + vocode run once over the collected rows
        # through the device-resident stream path — same audio, no per-
        # sentence host round-trips (stream_device == host-path, tested)
        lat_rows: List[Tuple[np.ndarray, np.ndarray, int]] = []
        for si, sent in enumerate(sentences):
            # per-sentence progress over the 0.2-0.8 band (infer.py:610)
            self._set_gr_progress(
                0.2 + 0.6 * si / max(len(sentences), 1),
                f"gpt inference speech... {si + 1}/{len(sentences)}")
            ids = np.asarray(self.tokenizer.convert_tokens_to_ids(sent),
                             np.int32)
            t0 = time.perf_counter()
            codes, _ = self._decode_batch(conds, [ids], sc)
            times.gpt_gen += time.perf_counter() - t0
            codes, code_lens = remove_long_silence(
                codes, self.stop_mel_token)
            lat_rows.append((ids, codes[0], int(code_lens[0])))
        t0 = time.perf_counter()
        if lat_rows:
            lat_dev, lens, inv = self._latents_batch_device(conds, lat_rows)
        times.gpt_forward += time.perf_counter() - t0
        t0 = time.perf_counter()
        if lat_rows:
            wav = self.vocoder.stream_device(lat_dev, lens, order=inv,
                                             spk=spk)
            wav = np.clip(wav * 32767.0, -32767.0, 32767.0)
        else:
            wav = np.zeros(0, np.float32)
        times.bigvgan += time.perf_counter() - t0
        self._set_gr_progress(0.9, "save audio...")
        times.total = time.perf_counter() - start_time
        times.audio_seconds = wav.size / sr
        self._report(times)
        return self._emit(wav, sr, output_path)

    def infer_fast(self, audio_prompt, text, output_path=None, verbose=False,
                   max_text_tokens_per_sentence=100,
                   sentences_bucket_max_size=4, **generation_kwargs):
        """Bucketed batched synthesis (reference infer_fast, infer.py:278)."""
        start_time = time.perf_counter()
        self._set_gr_progress(0, "start fast inference...")
        times = StageTimes()
        cond_mel = self._cond_mel(audio_prompt)
        conds = self._conditioning(cond_mel)
        sc = self._sampling_config(generation_kwargs)

        self._set_gr_progress(0.1, "text processing...")
        tokens = self.tokenizer.tokenize(text)
        sentences = self.tokenizer.split_sentences(
            tokens, max_text_tokens_per_sentence)
        sr = self.cfg.mel.sample_rate
        spk = self.vocoder.speaker_embedding(
            jnp.asarray(cond_mel.transpose(0, 2, 1)))

        # fused one-program route (engine/fused.py): the measured-best path —
        # decode→trim→latent→vocode as ONE XLA program, rows in sentence
        # order so the stream needs no reordering. This is the public road
        # to the benched fused graph (r03 verdict: it was bench/test-only).
        sent_rows = [np.asarray(self.tokenizer.convert_tokens_to_ids(s),
                                np.int32) for s in sentences]
        if self._fused_eligible(sent_rows):
            self._set_gr_progress(0.2, "gpt inference speech (fused)...")
            t0 = time.perf_counter()
            wav, _ = self._synthesize_fused_public(conds, sent_rows, sc, spk)
            times.gpt_gen += time.perf_counter() - t0
            self._set_gr_progress(0.9, "save audio...")
            if wav.dtype != np.int16:   # fused+stream flavor emits fp32
                wav = np.clip(wav * 32767.0, -32767.0, 32767.0)
            times.total = time.perf_counter() - start_time
            times.audio_seconds = wav.size / sr
            self._report(times, fast=True, path="fused")
            return self._emit(wav, sr, output_path)

        buckets = bucket_sentences(sentences,
                                  bucket_max_size=sentences_bucket_max_size)
        if verbose:
            print(f">> {len(sentences)} sentences in {len(buckets)} buckets")

        all_idx: List[int] = []
        lat_rows: List[Tuple[np.ndarray, np.ndarray, int]] = []
        # dispatch every bucket's decode before collecting any: the chip
        # pipelines bucket k+1's decode while the host trims bucket k
        t0 = time.perf_counter()
        pending = []
        for bucket in buckets:
            rows = [np.asarray(
                self.tokenizer.convert_tokens_to_ids(item["sent"]), np.int32)
                for item in bucket]
            pending.append((bucket, rows,
                            self._decode_batch_async(conds, rows, sc)))
        for bi, (bucket, rows, (res, n_real)) in enumerate(pending):
            self._set_gr_progress(
                0.2 + 0.3 * bi / max(len(pending), 1),
                f"gpt inference speech... {bi + 1}/{len(pending)}")
            codes = np.asarray(res.codes)[:n_real]
            for i, item in enumerate(bucket):
                row_codes, row_lens = remove_long_silence(
                    codes[i:i + 1], self.stop_mel_token)
                all_idx.append(item["idx"])
                lat_rows.append((rows[i], row_codes[0], int(row_lens[0])))
        times.gpt_gen += time.perf_counter() - t0
        self._set_gr_progress(0.5, "gpt inference latents...")
        t0 = time.perf_counter()
        if lat_rows:
            lat_dev, lens, inv = self._latents_batch_device(conds, lat_rows)
        times.gpt_forward += time.perf_counter() - t0
        # stream order (by sentence idx) as lat-row indices; the stitched
        # stream is assembled ON DEVICE by the vocoder's gather
        self._set_gr_progress(0.7, "bigvgan decode...")
        t0 = time.perf_counter()
        if lat_rows:
            order = inv[np.argsort(all_idx)]
            wav = self.vocoder.stream_device(lat_dev, lens, order=order,
                                             spk=spk)
        else:
            wav = np.zeros(0, np.float32)
        times.bigvgan += time.perf_counter() - t0
        self._set_gr_progress(0.9, "save audio...")
        wav = np.clip(wav * 32767.0, -32767.0, 32767.0)
        times.total = time.perf_counter() - start_time
        times.audio_seconds = wav.size / sr
        self._report(times, fast=True)
        return self._emit(wav, sr, output_path)

    def infer_batch(self, audio_prompt, texts: Sequence[str], verbose=False,
                    max_text_tokens_per_sentence=120, continuous=False,
                    cb_slots=8, **generation_kwargs
                    ) -> List[Tuple[int, np.ndarray]]:
        """Batched multi-utterance synthesis: all texts' sentences are
        bucketed and decoded together, then reassembled per text.

        This is the TPU-native replacement for the dubbing layer's
        per-segment sequential `infer()` loop (SURVEY §2.3/§7 step 8:
        strategies/*.py call one full inference per SRT entry) — an SRT file
        becomes one batched workload. Returns [(sr, int16 wav)] per text.
        """
        start_time = time.perf_counter()
        times = StageTimes()
        cond_mel = self._cond_mel(audio_prompt)
        conds = self._conditioning(cond_mel)
        sc = self._sampling_config(generation_kwargs)
        sr = self.cfg.mel.sample_rate
        spk = self.vocoder.speaker_embedding(
            jnp.asarray(cond_mel.transpose(0, 2, 1)))

        # flatten texts → sentences with back-references
        flat_sents: List[List[str]] = []
        owners: List[int] = []
        for ti, text in enumerate(texts):
            tokens = self.tokenizer.tokenize(text)
            sents = self.tokenizer.split_sentences(
                tokens, max_text_tokens_per_sentence) or [[]]
            for s in sents:
                flat_sents.append(s)
                owners.append(ti)

        # fused one-program route: sentences are contiguous per text in
        # flat order, so the fused stream slices per text by frame offsets
        flat_rows = [np.asarray(self.tokenizer.convert_tokens_to_ids(s),
                                np.int32) for s in flat_sents]
        if not continuous and self._fused_eligible(flat_rows):
            t0 = time.perf_counter()
            wav, lens = self._synthesize_fused_public(conds, flat_rows, sc,
                                                      spk)
            times.gpt_gen += time.perf_counter() - t0
            if wav.dtype != np.int16:   # fused+stream flavor emits fp32
                wav = np.clip(wav * 32767.0, -32767.0,
                              32767.0).astype(np.int16)
            up = self.vocoder.upsample
            bounds = np.concatenate([[0], np.cumsum(lens)]) * up
            outs = []
            for ti in range(len(texts)):
                sids = [si for si in range(len(flat_sents))
                        if owners[si] == ti]
                if not sids:
                    outs.append((sr, np.zeros((0, 1), np.int16)))
                    continue
                seg = wav[int(bounds[sids[0]]): int(bounds[sids[-1] + 1])]
                outs.append((sr, seg[:, None]))
            times.total = time.perf_counter() - start_time
            times.audio_seconds = sum(w.shape[0] for _, w in outs) / sr
            self._report(times, fast=True, path="fused")
            return outs

        sent_ids: List[int] = []
        lat_rows: List[Tuple[np.ndarray, np.ndarray, int]] = []
        if continuous:
            rows = [np.asarray(self.tokenizer.convert_tokens_to_ids(s),
                               np.int32) for s in flat_sents]
            rows = [r if r.size else np.array([2], np.int32) for r in rows]
            t0 = time.perf_counter()
            codes, _ = self._decode_continuous(conds, rows, sc,
                                               batch=cb_slots)
            times.gpt_gen += time.perf_counter() - t0
            for i in range(len(rows)):
                row_codes, row_lens = remove_long_silence(
                    codes[i:i + 1], self.stop_mel_token)
                sent_ids.append(i)
                lat_rows.append((rows[i], row_codes[0], int(row_lens[0])))
            buckets = []
        else:
            buckets = bucket_sentences(flat_sents, bucket_max_size=8)
        t0 = time.perf_counter()
        pending = []
        for bucket in buckets:
            rows = [np.asarray(
                self.tokenizer.convert_tokens_to_ids(item["sent"]), np.int32)
                for item in bucket]
            if not rows or all(r.size == 0 for r in rows):
                continue
            rows = [r if r.size else np.array([2], np.int32) for r in rows]
            pending.append((bucket, rows,
                            self._decode_batch_async(conds, rows, sc)))
        for bucket, rows, (res, n_real) in pending:
            codes = np.asarray(res.codes)[:n_real]
            for i, item in enumerate(bucket):
                row_codes, row_lens = remove_long_silence(
                    codes[i:i + 1], self.stop_mel_token)
                sent_ids.append(item["idx"])
                lat_rows.append((rows[i], row_codes[0], int(row_lens[0])))
        if pending:
            times.gpt_gen += time.perf_counter() - t0
        t0 = time.perf_counter()
        if lat_rows:
            lat_dev, lens, inv = self._latents_batch_device(conds, lat_rows)
            # lat-row index per sentence id (lat_rows entries were appended
            # alongside sent_ids; input row i lives in device row inv[i])
            row_of_sent = {sent_ids[i]: inv[i] for i in range(len(lat_rows))}
        else:
            row_of_sent = {}
        times.gpt_forward += time.perf_counter() - t0

        outs: List[Tuple[int, np.ndarray]] = []
        for ti in range(len(texts)):
            order = np.asarray([row_of_sent[si] for si in range(len(flat_sents))
                                if owners[si] == ti and si in row_of_sent],
                               np.int64)
            if order.size == 0:
                outs.append((sr, np.zeros((0, 1), np.int16)))
                continue
            t0 = time.perf_counter()
            wav = self.vocoder.stream_device(lat_dev, lens, order=order,
                                             spk=spk)
            times.bigvgan += time.perf_counter() - t0
            wav = np.clip(wav * 32767.0, -32767.0, 32767.0).astype(np.int16)
            outs.append((sr, wav[:, None]))
        times.total = time.perf_counter() - start_time
        times.audio_seconds = sum(w.shape[0] for _, w in outs) / sr
        self._report(times, fast=True)
        return outs

    # ------------------------------------------------------------------
    def _report(self, times: StageTimes, fast: bool = False,
                path: str = "staged") -> None:
        tag = "[fast] " if fast else ""
        if path == "fused":
            # the fused route is ONE program (plus the window-exact vocode
            # stream in the "fused+stream" flavor): the device time lands
            # in gpt_gen (no per-stage split exists)
            flavor = getattr(self, "last_fused_flavor", "fused")
            note = ("one XLA program" if flavor == "fused"
                    else "decode+trim+latent program + streamed vocode")
            print(f">> {tag}synthesis path: fused ({note})")
            print(f">> {tag}fused_time: {times.gpt_gen:.2f} s")
        else:
            # fast path: the latent pass is DISPATCHED async and its device
            # time is absorbed into the vocoder wall (the total is exact;
            # the split is attribution) — hence the annotation.
            lat_note = (" (dispatch only; compute folded into bigvgan)"
                        if fast else "")
            if fast:
                print(f">> {tag}synthesis path: staged")
            print(f">> {tag}gpt_gen_time: {times.gpt_gen:.2f} s")
            print(f">> {tag}gpt_forward_time: {times.gpt_forward:.2f} s"
                  f"{lat_note}")
            print(f">> {tag}bigvgan_time: {times.bigvgan:.2f} s")
        print(f">> {tag}Total inference time: {times.total:.2f} s")
        print(f">> {tag}Generated audio length: {times.audio_seconds:.2f} s")
        print(f">> {tag}RTF: {times.rtf:.4f}")
        self.last_times = times
        self.last_path = path

    def _emit(self, wav: np.ndarray, sr: int, output_path):
        wav_i16 = wav.astype(np.int16)
        if output_path:
            audio_util.write_wav(output_path, wav_i16, sr)
            return output_path
        return sr, wav_i16[None, :].T  # gradio-style (T, C)

"""Speaker-similarity scoring: cosine similarity between speaker embeddings
of two waveforms.

The reference publishes SS numbers (README.md:89-98) computed with an
external speaker-verification model; this self-contained scorer uses the
framework's own ECAPA-TDNN (the vocoder's conditioning encoder,
models/ecapa.py — spec BigVGAN/ECAPA_TDNN.py:429) over the same 24 kHz mel
frontend, which tracks the published metric's ordering without external
checkpoints. A different embedder can be injected via ``embed_fn``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.models import ecapa
from index_tts_dubbing_tpu.ops.mel import MelSpectrogram


def make_ecapa_embedder(ecapa_params, mel_fn: Optional[MelSpectrogram] = None
                        ) -> Callable[[np.ndarray, int], np.ndarray]:
    """Returns embed(wav_float32, sr) -> (D,) unit-norm embedding."""
    mel_fn = mel_fn or MelSpectrogram()

    def embed(wav: np.ndarray, sr: int) -> np.ndarray:
        wav = np.asarray(wav, np.float32).reshape(-1)
        if sr != mel_fn.sample_rate:
            from index_tts_dubbing_tpu.utils.audio import resample
            wav = resample(wav, sr, mel_fn.sample_rate)
        mel = np.asarray(mel_fn(wav))            # (1, n_mels, T)
        emb = ecapa.forward(ecapa_params, jnp.asarray(mel.transpose(0, 2, 1)))
        emb = np.asarray(emb).reshape(-1)
        return emb / max(float(np.linalg.norm(emb)), 1e-9)

    return embed


def speaker_similarity(wav_a: np.ndarray, sr_a: int, wav_b: np.ndarray,
                       sr_b: int, embed_fn: Callable) -> float:
    """Cosine similarity in [-1, 1] between the two waveforms' speaker
    embeddings."""
    ea = embed_fn(wav_a, sr_a)
    eb = embed_fn(wav_b, sr_b)
    return float(np.dot(ea, eb))

"""Vocoder window-size sweep: halo overhead vs window length.

Each window computes (window + 2·halo) frames for `window` useful output
frames — window=48/halo=16 wastes 40% extra compute; larger windows amortize
the halo. Times WindowedVocoder.__call__ end-to-end (incl. batching +
transfers) on a fixed latent stream.

Usage: python tools/profile_vocoder_window.py [total_frames] [--windows 48,112,240]
"""
import sys
import time

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from index_tts_dubbing_tpu.engine.vocoder import WindowedVocoder
from index_tts_dubbing_tpu.models import bigvgan as bigvgan_model
from index_tts_dubbing_tpu.utils.config import EngineConfig
from index_tts_dubbing_tpu.utils import jax_setup

jax_setup.setup_jax()

nums = [a for a in sys.argv[1:] if a.isdigit()]
TOTAL = int(nums[0]) if nums else 1280      # latent frames ≈ 54.6 s audio
WINDOWS = [48, 112, 240]
for a in sys.argv[1:]:
    if a.startswith("--windows="):
        WINDOWS = [int(w) for w in a.split("=", 1)[1].split(",")]

cfg = EngineConfig().bigvgan
rng = np.random.default_rng(0)
params = bigvgan_model.init(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(
    lambda x: x.astype(ml_dtypes.bfloat16)
    if np.issubdtype(np.asarray(x).dtype, np.floating) else x, params)
params = jax.device_put(params)

latent = rng.standard_normal((TOTAL, cfg.gpt_dim)).astype(np.float32)
spk = jnp.asarray(rng.standard_normal((1, 1, cfg.speaker_embedding_dim)),
                  jnp.bfloat16)
audio_s = TOTAL * 1024 / 24000.0

outs = {}
for w in WINDOWS:
    voc = WindowedVocoder(params, cfg, window=w, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    out = voc(latent, spk=spk)
    t_cold = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = voc(latent, spk=spk)
        best = min(best, time.perf_counter() - t0)
    overhead = (w + 2 * voc.halo) / w
    print(f"window={w:4d} (halo overhead {overhead:.2f}x): cold {t_cold:6.1f}s"
          f" warm {best*1e3:7.1f} ms  vocoder RTF {best/audio_s:.5f}",
          flush=True)
    outs[w] = out

base = outs[WINDOWS[0]]
for w in WINDOWS[1:]:
    d = np.abs(outs[w] - base).max()
    print(f"  window={w} vs {WINDOWS[0]}: max|Δ| {d:.5f}")

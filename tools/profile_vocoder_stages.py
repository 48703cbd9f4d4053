"""Per-stage cost breakdown of the C-major vocoder window.

Times cumulative truncations of _vocode_window_cmajor (jit per truncation
depth): stage k's cost = time(through k) − time(through k−1). Guides where
deeper Pallas fusion pays.

Usage: python tools/profile_vocoder_stages.py [NB] [window]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from index_tts_dubbing_tpu.engine import vocoder as voc
from index_tts_dubbing_tpu.models import bigvgan as bigvgan_model
from index_tts_dubbing_tpu.utils.config import EngineConfig
from index_tts_dubbing_tpu.utils import jax_setup

jax_setup.setup_jax()

nums = [a for a in sys.argv[1:] if a.isdigit()]
NB = int(nums[0]) if nums else 16
WIN = int(nums[1]) if len(nums) > 1 else 112
FUSE = "fused" in sys.argv

cfg = EngineConfig().bigvgan
rng = np.random.default_rng(0)
params = bigvgan_model.init(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(
    lambda x: x.astype(ml_dtypes.bfloat16)
    if np.issubdtype(np.asarray(x).dtype, np.floating) else x, params)
params = jax.device_put(params)


@partial(jax.jit, static_argnames=("cfg", "n_stages", "use_pallas",
                                   "fuse", "half_last"))
def _upto(params, cfg, latent, spk, n_stages: int, use_pallas: bool = True,
          fuse: bool = False, half_last: bool = False):
    """First n_stages upsample stages of the cmajor window (post conv_pre)."""
    if spk.shape[0] == 1 and latent.shape[0] > 1:
        spk = jnp.broadcast_to(spk, (latent.shape[0],) + spk.shape[1:])
    x = jnp.swapaxes(latent, 1, 2)
    spk_cm = jnp.swapaxes(spk, 1, 2)
    x = voc._conv1d_cm(params["conv_pre"], x, padding=3)
    x = x + voc._conv1d_cm(params["cond_layer"], spk_cm)
    from index_tts_dubbing_tpu.ops.pallas_resblock import (
        fused_resblock_cmajor, pack_resblock)
    for i in range(n_stages):
        u = cfg.upsample_rates[i]
        k = cfg.upsample_kernel_sizes[i]
        x = voc._conv_transpose1d_cm(params["ups"][i], x, stride=u,
                                     padding=(k - u) // 2)
        if cfg.cond_in_each_up_layer:
            x = x + voc._conv1d_cm(params["conds"][i], spk_cm)
        if half_last and i == n_stages - 1:
            break  # transpose+cond only for the last counted stage
        xs = None
        for j in range(cfg.num_kernels):
            rb = params["resblocks"][i * cfg.num_kernels + j]
            kk = cfg.resblock_kernel_sizes[j]
            if fuse and x.shape[1] <= 128:
                w1, b1, w2, b2, acts = pack_resblock(rb, cfg, x.dtype)
                y = fused_resblock_cmajor(
                    x, w1, b1, w2, b2, acts, kk,
                    tuple(cfg.resblock_dilation_sizes[j]))
                xs = y if xs is None else xs + y
                continue
            y = x
            acts1, acts2 = rb["acts"][::2], rb["acts"][1::2]
            for c1, c2, a1, a2, d in zip(rb["convs1"], rb["convs2"], acts1,
                                         acts2, cfg.resblock_dilation_sizes[j]):
                yt = voc._act_cm(cfg, a1, y, use_pallas)
                yt = voc._conv1d_cm(c1, yt, dilation=d,
                                    padding=(kk * d - d) // 2)
                yt = voc._act_cm(cfg, a2, yt, use_pallas)
                yt = voc._conv1d_cm(c2, yt, padding=(kk - 1) // 2)
                y = yt + y
            xs = y if xs is None else xs + y
        x = xs / cfg.num_kernels
    # reduce to keep transfer constant across depths
    return jnp.sum(x.astype(jnp.float32), axis=(1, 2))


full = WIN + 32
lat_np = rng.standard_normal((NB, full, cfg.gpt_dim))
spk = jnp.asarray(rng.standard_normal((1, 1, cfg.speaker_embedding_dim)),
                  jnp.bfloat16)
audio_s = NB * WIN * 1024 / 24000.0

def timed(n, half):
    lat = jnp.asarray(lat_np, jnp.bfloat16)
    np.asarray(_upto(params, cfg, lat, spk, n, fuse=FUSE, half_last=half))
    best = 1e9
    for i in range(3):
        lat = jnp.asarray(lat_np * (1 + 1e-3 * i), jnp.bfloat16)
        t0 = time.perf_counter()
        np.asarray(_upto(params, cfg, lat, spk, n, fuse=FUSE,
                         half_last=half))
        best = min(best, time.perf_counter() - t0)
    return best


prev = 0.0
print(f"fuse_resblocks={FUSE}")
for n in range(cfg.num_upsamples + 1):
    if n:
        half = timed(n, True)
        print(f"  stage {n} transpose+cond: +{(half-prev)*1e3:7.1f} ms",
              flush=True)
    best = timed(n, False)
    c = cfg.stage_channels(n - 1) if n else "-"
    print(f"through stage {n} (C={c}): {best*1e3:8.1f} ms  "
          f"(+{(best-prev)*1e3:7.1f} ms)  RTF {best/audio_s:.5f}", flush=True)
    prev = best

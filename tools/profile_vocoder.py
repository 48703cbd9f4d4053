"""Attribute vocoder window cost on the real chip (sync via np.asarray —
block_until_ready does not actually synchronize on this remote backend).

Variants of the 48+2*16-frame window at batch NB:
  full        — real reference-structured path
  no_aa       — snake without the x2 up/down anti-alias FIRs
  identity_act— resblock convs only (activations replaced by identity)
  no_resblock — upsample convs + cond adds only
  stage<=k    — full path with resblocks only in stages 0..k
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import index_tts_dubbing_tpu.nn as nn
from index_tts_dubbing_tpu.models import bigvgan as bigvgan_model
from index_tts_dubbing_tpu.models import ecapa
from index_tts_dubbing_tpu.ops.alias_free import (downsample2, snake,
                                                  snake_beta, upsample2)
from index_tts_dubbing_tpu.utils.config import EngineConfig
from index_tts_dubbing_tpu.utils import jax_setup

jax_setup.setup_jax()

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
DTYPE = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16

cfg = EngineConfig().bigvgan
rng = np.random.default_rng(0)

import ml_dtypes
params = bigvgan_model.init(jax.random.PRNGKey(0), cfg)
if DTYPE == jnp.bfloat16:
    params = jax.tree.map(
        lambda x: x.astype(ml_dtypes.bfloat16)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, params)
params = jax.device_put(params)

lat = jnp.asarray(rng.standard_normal((NB, 80, 1024)), DTYPE)
spk = jnp.asarray(rng.standard_normal((1, 1, cfg.speaker_embedding_dim)), DTYPE)


def aa_real(x, a1, b1):
    y = upsample2(x)
    y = snake_beta(y, a1, b1, cfg.snake_logscale) if cfg.activation == "snakebeta" \
        else snake(y, a1, cfg.snake_logscale)
    return downsample2(y)


def aa_plain(x, a1, b1):
    return snake_beta(x, a1, b1, cfg.snake_logscale)


def aa_id(x, a1, b1):
    return x


def make_window_fn(aa, use_resblocks=True, max_stage=99):
    @partial(jax.jit, static_argnames=())
    def f(params, latent, spk):
        if spk.shape[0] == 1 and latent.shape[0] > 1:
            spk_ = jnp.broadcast_to(spk, (latent.shape[0],) + spk.shape[1:])
        else:
            spk_ = spk
        x = nn.conv1d(params["conv_pre"], latent, padding=3)
        x = x + nn.conv1d(params["cond_layer"], spk_, padding=(0, 0))
        for i in range(cfg.num_upsamples):
            u = cfg.upsample_rates[i]
            k = cfg.upsample_kernel_sizes[i]
            x = nn.conv_transpose1d(params["ups"][i], x, stride=u,
                                    padding=(k - u) // 2)
            if cfg.cond_in_each_up_layer:
                x = x + nn.conv1d(params["conds"][i], spk_, padding=(0, 0))
            if not use_resblocks or i > max_stage:
                continue
            xs = None
            for j in range(cfg.num_kernels):
                rb = params["resblocks"][i * cfg.num_kernels + j]
                k_rb = cfg.resblock_kernel_sizes[j]
                dil = cfg.resblock_dilation_sizes[j]
                y = x
                acts1, acts2 = rb["acts"][::2], rb["acts"][1::2]
                for c1, c2, a1, a2, d in zip(rb["convs1"], rb["convs2"],
                                             acts1, acts2, dil):
                    yt = aa(y, a1["alpha"], a1.get("beta"))
                    yt = nn.conv1d(c1, yt, dilation=d,
                                   padding=(k_rb * d - d) // 2)
                    yt = aa(yt, a2["alpha"], a2.get("beta"))
                    yt = nn.conv1d(c2, yt, dilation=1,
                                   padding=(k_rb - 1) // 2)
                    y = yt + y
                xs = y if xs is None else xs + y
            x = xs / cfg.num_kernels
        x = bigvgan_model._act(cfg, params["act_post"], x)
        x = nn.conv1d(params["conv_post"], x, padding=3)
        return jnp.tanh(x)[..., 0]
    return f


def bench(name, fn):
    t0 = time.perf_counter()
    out = np.asarray(fn(params, lat, spk))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(fn(params, lat, spk))
        ts.append(time.perf_counter() - t0)
    audio_s = out.size / 24000.0
    w = min(ts)
    print(f"{name:14s} compile {compile_s:6.1f}s warm {w*1e3:8.1f} ms  "
          f"(vocoder RTF {w/audio_s:.5f})", flush=True)


bench("full", make_window_fn(aa_real))
bench("no_aa", make_window_fn(aa_plain))
bench("identity_act", make_window_fn(aa_id))
bench("no_resblock", make_window_fn(aa_real, use_resblocks=False))
for k in (1, 3):
    bench(f"stage<={k}", make_window_fn(aa_real, max_stage=k))

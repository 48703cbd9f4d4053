"""Compare the reference-structured vocoder window vs the C-major
(time-in-lanes Pallas) path on the real chip. Sync via np.asarray."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.models import bigvgan as bigvgan_model
from index_tts_dubbing_tpu.engine import vocoder as voc
from index_tts_dubbing_tpu.utils.config import EngineConfig
from index_tts_dubbing_tpu.utils import jax_setup

jax_setup.setup_jax()

_nums = [a for a in sys.argv[1:] if a.isdigit()]
NB = int(_nums[0]) if _nums else 16
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

lat_np = rng.standard_normal((NB, 80, 1024))
spk = jnp.asarray(rng.standard_normal((1, 1, cfg.speaker_embedding_dim)), DTYPE)

wav_s = NB * 80 * 1024 / 24000.0


def run(name, fn):
    lat = jnp.asarray(lat_np, DTYPE)
    t0 = time.perf_counter()
    out = np.asarray(fn(params, cfg, lat, spk))
    t_compile = time.perf_counter() - t0
    best = 1e9
    for i in range(3):
        lat = jnp.asarray(lat_np * (1.0 + 1e-3 * i), DTYPE)
        t0 = time.perf_counter()
        out = np.asarray(fn(params, cfg, lat, spk))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} compile {t_compile:6.1f}s warm {best*1e3:8.1f} ms "
          f"(vocoder RTF {best/wav_s:.5f})", flush=True)
    return out


which = [a for a in sys.argv[1:] if not a.isdigit() and a != "--fp32"] or [
    "ref", "cmajor"]
outs = {}
if "ref" in which:
    outs["ref"] = run("ref", voc._vocode_window)
if "cmajor" in which:
    outs["cmajor"] = run(
        "cmajor", lambda p, c, l, s: voc._vocode_window_cmajor(
            p, c, l, s, use_pallas=True))
if "cmajor_xla" in which:
    outs["cmajor_xla"] = run(
        "cmajor_xla", lambda p, c, l, s: voc._vocode_window_cmajor(
            p, c, l, s, use_pallas=False))
if "fused" in which:
    outs["fused"] = run(
        "fused", lambda p, c, l, s: voc._vocode_window_cmajor(
            p, c, l, s, use_pallas=True, fuse_resblocks=True))
if len(outs) > 1 and "ref" in outs:
    for k, v in outs.items():
        if k == "ref":
            continue
        d = np.abs(v.astype(np.float32) - outs["ref"].astype(np.float32))
        print(f"  {k} vs ref: max|Δ| {d.max():.5f} "
              f"interior {d[:, 3*1024:-3*1024].max():.5f}")

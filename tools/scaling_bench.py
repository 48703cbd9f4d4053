"""Scaling-efficiency harness for the BASELINE >=85% multi-host target.

BASELINE.md's scaling row demands >= 85% audio-seconds/s/device efficiency
at N >= 2 hosts. Real multi-host TPU hardware is not reachable from this
environment, but the ACCOUNTING must exist (r04 verdict #1): this tool
measures steady-state audio-s/s/device (compile excluded) at n=1 vs n=N
over the SAME backend and prints

    efficiency = (perf_N / N) / perf_1

for two legs:

- ``decode`` — the serving hot path: engine/decode.py:generate under a
  (data=N, model=1) mesh, WEAK scaling (fixed per-device batch);
- ``e2e``    — full engine synthesis through the public
  ``IndexTTS.infer_batch`` surface under the mesh (decode + latent +
  device-resident streamed vocode), same weak-scaling rule.

Run on the virtual CPU mesh as the harness proof (virtual devices SHARE
host cores, so the printed efficiency measures harness overhead, not
hardware scaling — the number that matters comes from running this
unchanged on a real pod):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py 8

__graft_entry__.dryrun_multichip calls measure_all() so every round's
MULTICHIP artifact records the efficiency tail.

Reference role: the scaling measurement the reference never ships (its
parallelism is vestigial HF device maps, SURVEY §2.3); the >=85% target is
the driver's (BASELINE.json scaling row).
"""
from __future__ import annotations

import os
import sys
import time
from typing import Dict, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000
FRAMES_TO_SAMPLES = 1024


def _small_cfg():
    from index_tts_dubbing_tpu.models.gpt import GPTConfig
    return GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=60,
                     max_text_tokens=50, number_text_tokens=120,
                     cond_output_size=32, cond_linear_units=64,
                     cond_attention_heads=4, cond_num_blocks=2)


def measure_decode(n_devices: int, b_per_device: int = 2, steps: int = 24,
                   reps: int = 3, cfg=None, params_host=None,
                   model: int = 1) -> float:
    """Steady-state decode throughput (audio-s/s/device, compile excluded)
    under a (data=n_devices/model, model) mesh. Weak scaling: batch =
    b_per_device * data. Greedy decode so every run generates the same
    token count."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.models import gpt as gpt_model
    from index_tts_dubbing_tpu.parallel import mesh as mesh_lib

    cfg = cfg or _small_cfg()
    if params_host is None:
        params_host = gpt_model.init(jax.random.PRNGKey(0), cfg)
    data = n_devices // model
    mesh = mesh_lib.make_mesh(data=data, model=model,
                              devices=jax.devices()[:n_devices])
    specs = mesh_lib.gpt_param_specs(params_host, model_size=model)
    params = mesh_lib.shard_tree(params_host, specs, mesh)

    b = b_per_device * data
    rng = np.random.default_rng(0)
    rows = [rng.integers(2, cfg.number_text_tokens, size=10).astype(np.int32)
            for _ in range(b)]
    conds = np.asarray(rng.standard_normal(
        (b, cfg.condition_num_latent, cfg.model_dim)), np.float32)
    sc = decode_mod.SamplingConfig(do_sample=False, max_mel_tokens=steps)
    pre = decode_mod.prepare_prefix_host(cfg, rows)
    emb, keep = decode_mod.build_prefix_emb(
        params_host, cfg, jnp.asarray(conds), jnp.asarray(pre["ids"]),
        jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
        jnp.asarray(pre["cond_idx"]))
    demb = jax.device_put(np.asarray(emb), NamedSharding(mesh, P("data")))
    dkeep = jax.device_put(np.asarray(keep), NamedSharding(mesh, P("data")))
    key = jax.random.PRNGKey(0)

    out = decode_mod.generate(params, cfg, sc, demb, dkeep, key, mesh=mesh)
    audio_s = float(np.asarray(out.lengths).sum()) \
        * FRAMES_TO_SAMPLES / SR                       # compile-run output
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode_mod.generate(params, cfg, sc, demb, dkeep, key,
                                  mesh=mesh)
        np.asarray(out.codes)
    dt = time.perf_counter() - t0
    return audio_s * reps / dt / n_devices


def measure_e2e(n_devices: int, texts_per_device: int = 2, steps: int = 16,
                reps: int = 2, model: int = 1) -> float:
    """Steady-state end-to-end synthesis throughput (audio-s/s/device,
    compile excluded) through the PUBLIC ``IndexTTS.infer_batch`` surface
    under a mesh: decode + latent + device-resident streamed vocode."""
    import jax
    import jax.numpy as jnp

    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig
    from index_tts_dubbing_tpu.parallel import mesh as mesh_lib
    from index_tts_dubbing_tpu.utils.config import (EngineConfig, MelConfig)

    data = n_devices // model
    mesh = mesh_lib.make_mesh(data=data, model=model,
                              devices=jax.devices()[:n_devices])
    cfg = EngineConfig(
        mel=MelConfig(), gpt=_small_cfg(),
        bigvgan=BigVGANConfig(gpt_dim=64, upsample_initial_channel=128))
    eng = IndexTTS(config=cfg, verbose_init=False, mesh=mesh)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, cfg.mel.n_mels, 40)).astype(np.float32)
    eng.set_cond_mel(mel)
    texts = ["ab ab ab." for _ in range(texts_per_device * data)]

    def run_once():
        eng._rng = jax.random.PRNGKey(0)
        with mesh:
            outs = eng.infer_batch("<direct>", texts, do_sample=False,
                                   max_mel_tokens=steps)
        return sum(w.shape[0] for _, w in outs) / SR

    audio_s = run_once()                               # compile run
    t0 = time.perf_counter()
    for _ in range(reps):
        audio_s = run_once()
    dt = time.perf_counter() - t0
    return audio_s * reps / dt / n_devices


def measure_all(n_devices: int, quiet: bool = False) -> Dict[str, float]:
    """Both legs at n=1 and n=N; prints and returns the efficiency tail.
    Called by __graft_entry__.dryrun_multichip."""
    res: Dict[str, float] = {}
    for leg, fn in (("decode", measure_decode), ("e2e", measure_e2e)):
        p1 = fn(1)
        pn = fn(n_devices)
        eff = pn / p1 if p1 > 0 else float("nan")
        res[leg] = eff
        res[f"{leg}_perf1"] = p1
        res[f"{leg}_perfN"] = pn
        if not quiet:
            print(f"scaling[{leg}]: n=1 {p1:.3f} audio-s/s/device, "
                  f"n={n_devices} {pn:.3f} audio-s/s/device, "
                  f"efficiency {eff * 100:.1f}%"
                  " (virtual devices share host cores; run on a pod for"
                  " hardware efficiency)", flush=True)
    return res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # this image's sitecustomize prepends the axon TPU platform; the env
        # var alone does not override it (see tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    assert len(jax.devices()) >= n, \
        (f"need {n} devices; set XLA_FLAGS=--xla_force_host_platform_"
         f"device_count={n} JAX_PLATFORMS=cpu for the virtual-mesh proof")
    measure_all(n)

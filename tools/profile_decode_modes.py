"""Decode-throughput matrix on the real chip: batched `generate` vs
continuous batching, bf16 vs int8 weights, several batch sizes.

Sync via np.asarray (block_until_ready returns early on the remote axon
backend — see tools/microbench_kv_layout.py).

Usage: python tools/profile_decode_modes.py [steps] [--modes gen4,gen16,cb16]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.engine import decode as decode_mod
from index_tts_dubbing_tpu.engine.tts import IndexTTS
from index_tts_dubbing_tpu.utils.config import EngineConfig

nums = [a for a in sys.argv[1:] if a.isdigit()]
STEPS = int(nums[0]) if nums else 192
MODES = ["gen4", "gen16", "cb16"]  # + "beam4" (nb=3 beam sampling)
for a in sys.argv[1:]:
    if a.startswith("--modes="):
        MODES = a.split("=", 1)[1].split(",")
QUANTS = [None, "int8"]
for a in sys.argv[1:]:
    if a.startswith("--quant="):
        QUANTS = [None if q == "bf16" else q
                  for q in a.split("=", 1)[1].split(",")]

rng = np.random.default_rng(0)
cond_mel = rng.standard_normal((1, 100, 470)).astype(np.float32)


def run_engine(quant):
    engine = IndexTTS(config=EngineConfig(), is_fp16=True, verbose_init=False,
                      seed=0, quantize=quant)
    engine.set_cond_mel(cond_mel)
    conds = engine._conditioning(cond_mel)
    tag = quant or "bf16"

    def bench_generate(B):
        rows = [rng.integers(2, 12000, size=48).astype(np.int32)
                for _ in range(B)]
        sc = engine._sampling_config(dict(do_sample=True, num_beams=1,
                                          max_mel_tokens=STEPS))
        pre = decode_mod.prepare_prefix_host(engine.gpt_cfg, rows, pad_to=48)
        emb, keep = decode_mod.build_prefix_emb(
            engine.params["gpt"], engine.gpt_cfg, conds,
            jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]),
            jnp.asarray(pre["seg"]), jnp.asarray(pre["cond_idx"]))
        np.asarray(emb)
        best = 1e9
        for it in range(3):
            t0 = time.perf_counter()
            res = decode_mod.generate(engine.params["gpt"], engine.gpt_cfg,
                                      sc, emb, keep, jax.random.PRNGKey(it))
            np.asarray(res.codes)
            dt = time.perf_counter() - t0
            nsteps = int(np.asarray(res.steps))
            if it == 0:
                print(f"  [{tag}] gen B={B}: compile+run {dt:.1f}s "
                      f"({nsteps} steps)", flush=True)
            else:
                best = min(best, dt / max(nsteps, 1))
        print(f"  [{tag}] gen B={B}: {best*1e3:.2f} ms/step  "
              f"{B/best:.0f} tok/s", flush=True)

    def bench_cb(B, n_req):
        from index_tts_dubbing_tpu.engine import continuous as cb_mod
        sc = engine._sampling_config(dict(do_sample=True, num_beams=1,
                                          max_mel_tokens=STEPS))
        rows = [rng.integers(2, 12000, size=48).astype(np.int32)
                for _ in range(n_req)]
        reqs = [cb_mod.CBRequest(uid=i, text_ids=r)
                for i, r in enumerate(rows)]
        best = 1e9
        for it in range(2):
            cb = cb_mod.ContinuousBatcher(
                engine.params["gpt"], engine.gpt_cfg, sc, conds, batch=B,
                chunk=64, rng=jax.random.PRNGKey(it))
            t0 = time.perf_counter()
            results = cb.run(reqs, dtype=jnp.bfloat16)
            dt = time.perf_counter() - t0
            total_tokens = sum(ln for _, ln in results.values())
            if it == 0:
                print(f"  [{tag}] cb B={B} reqs={n_req}: compile+run "
                      f"{dt:.1f}s ({total_tokens} tokens)", flush=True)
            else:
                best = min(best, dt)
                print(f"  [{tag}] cb B={B} reqs={n_req}: {dt:.1f}s  "
                      f"{total_tokens/dt:.0f} tok/s", flush=True)

    def bench_beam(B, nb=3):
        rows = [rng.integers(2, 12000, size=48).astype(np.int32)
                for _ in range(B)]
        sc = engine._sampling_config(dict(do_sample=True, num_beams=nb,
                                          max_mel_tokens=STEPS))
        pre = decode_mod.prepare_prefix_host(engine.gpt_cfg, rows, pad_to=48)
        emb, keep = decode_mod.build_prefix_emb(
            engine.params["gpt"], engine.gpt_cfg, conds,
            jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]),
            jnp.asarray(pre["seg"]), jnp.asarray(pre["cond_idx"]))
        np.asarray(emb)
        best = 1e9
        for it in range(3):
            t0 = time.perf_counter()
            res = decode_mod.generate_beam_sample(
                engine.params["gpt"], engine.gpt_cfg, sc, emb, keep,
                jax.random.PRNGKey(it), num_beams=nb)
            np.asarray(res.codes)
            dt = time.perf_counter() - t0
            nsteps = int(np.asarray(res.steps))
            if it == 0:
                print(f"  [{tag}] beam{nb} B={B}: compile+run {dt:.1f}s "
                      f"({nsteps} steps)", flush=True)
            else:
                best = min(best, dt / max(nsteps, 1))
        print(f"  [{tag}] beam{nb} B={B}: {best*1e3:.2f} ms/step  "
              f"{B/best:.0f} rows-tok/s", flush=True)

    for m in MODES:
        if m.startswith("gen"):
            bench_generate(int(m[3:]))
        elif m.startswith("beam"):
            bench_beam(int(m[4:]))
        elif m.startswith("cb"):
            bench_cb(int(m[2:]), 2 * int(m[2:]))


for q in QUANTS:
    run_engine(q)

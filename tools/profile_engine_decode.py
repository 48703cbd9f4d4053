"""Time the real engine decode path on the chip, separating device loop time
from host-side orchestration."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.engine import decode as decode_mod
from index_tts_dubbing_tpu.engine.tts import IndexTTS
from index_tts_dubbing_tpu.utils.config import EngineConfig

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 192
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4

engine = IndexTTS(config=EngineConfig(), is_fp16=True, verbose_init=False,
                  seed=0)
rng = np.random.default_rng(0)
cond_mel = rng.standard_normal((1, 100, 470)).astype(np.float32)
engine.set_cond_mel(cond_mel)
conds = engine._conditioning(cond_mel)
rows = [rng.integers(2, 12000, size=48).astype(np.int32) for _ in range(B)]
sc = engine._sampling_config(dict(do_sample=True, max_mel_tokens=steps))

key0 = jax.random.PRNGKey(0)

# 1) whole _decode_batch (host incl.)
for it in range(3):
    engine._rng = key0
    t0 = time.perf_counter()
    codes, lens = engine._decode_batch(conds, rows, sc)
    dt = time.perf_counter() - t0
    print(f"_decode_batch iter{it}: {dt:.3f}s  ({dt/steps*1e3:.2f} ms/step)"
          f" lens={list(lens)}", flush=True)

# 2) generate() alone, inputs pre-staged on device
pre = decode_mod.prepare_prefix_host(engine.gpt_cfg, rows, pad_to=48)
emb, keep = decode_mod.build_prefix_emb(
    engine.params["gpt"], engine.gpt_cfg, conds,
    jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
    jnp.asarray(pre["cond_idx"]))
emb, keep = jax.block_until_ready((emb, keep))
for it in range(3):
    t0 = time.perf_counter()
    res = decode_mod.generate(engine.params["gpt"], engine.gpt_cfg, sc, emb,
                              keep, key0)
    res = jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    nsteps = int(np.asarray(res.steps))
    print(f"generate iter{it}: {dt:.3f}s  ran {nsteps} steps "
          f"({dt/max(nsteps,1)*1e3:.2f} ms/step)", flush=True)

# 3) build_prefix_emb + transfers alone
t0 = time.perf_counter()
for _ in range(10):
    pre = decode_mod.prepare_prefix_host(engine.gpt_cfg, rows, pad_to=48)
    emb, keep = decode_mod.build_prefix_emb(
        engine.params["gpt"], engine.gpt_cfg, conds,
        jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]),
        jnp.asarray(pre["seg"]), jnp.asarray(pre["cond_idx"]))
    jax.block_until_ready((emb, keep))
print(f"prefix host+emb: {(time.perf_counter()-t0)/10*1e3:.1f} ms/call",
      flush=True)

"""Beam decode reorder-strategy microbench: ms/step per strategy on chip.

Usage: python tools/profile_beam_step.py [steps] [batch] [strategies...]
Defaults: 64 steps, B=16, nb=3, strategies anc,split,splitnone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.models import gpt as gpt_model
    from index_tts_dubbing_tpu.models.gpt import GPTConfig

    args = [a for a in sys.argv[1:]]
    steps = int(args[0]) if len(args) > 0 else 64
    batch = int(args[1]) if len(args) > 1 else 16
    strats = args[2].split(",") if len(args) > 2 else ["anc", "split",
                                                       "splitnone"]

    cfg = GPTConfig()
    with jax.default_device(jax.devices("cpu")[0]):
        params_h = gpt_model.init(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(
        jax.tree.map(lambda x: np.asarray(x, np.float32), params_h))
    import ml_dtypes
    params = jax.tree.map(
        lambda x: x.astype(ml_dtypes.bfloat16)
        if np.issubdtype(x.dtype, np.floating) else x, params_h)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    rows = [rng.integers(2, 12000, size=48).astype(np.int32)
            for _ in range(batch)]
    conds = jnp.asarray(rng.standard_normal(
        (batch, cfg.condition_num_latent, cfg.model_dim)
    ).astype(ml_dtypes.bfloat16))
    pre = decode_mod.prepare_prefix_host(cfg, rows, pad_to=48)
    emb, keep = decode_mod.build_prefix_emb(
        params, cfg, conds, jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]),
        jnp.asarray(pre["seg"]), jnp.asarray(pre["cond_idx"]))
    sc = decode_mod.SamplingConfig(do_sample=True, max_mel_tokens=steps)
    key = jax.random.PRNGKey(0)

    for strat in strats:
        t0 = time.perf_counter()
        res = decode_mod._beam_decode(params, cfg, sc, emb, keep, key, 3,
                                      0.0, True, reorder=strat)
        np.asarray(res.codes)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = decode_mod._beam_decode(params, cfg, sc, emb, keep, key, 3,
                                      0.0, True, reorder=strat)
        np.asarray(res.codes)
        t_warm = time.perf_counter() - t0
        n = int(np.asarray(res.steps))
        print(f"{strat:8s}: warm {t_warm:6.2f}s  {t_warm / n * 1e3:7.2f} "
              f"ms/step ({n} steps; cold {t_cold:.1f}s)", flush=True)


if __name__ == "__main__":
    main()

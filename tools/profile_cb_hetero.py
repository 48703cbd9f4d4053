"""Heterogeneous-length decode bench: continuous batching vs bucketed
`generate` on an SRT-like workload — the workload CB was built for.

The dubbing path synthesizes many short segments of very different lengths
(reference: one full ``IndexTTS.infer`` per SRT entry, strictly sequential —
srt_dubbing/src/cli.py:25-177). A bucketed engine (engine/tts.py) sorts the
segments into B-row buckets and pays the MAX length of every bucket; the
device-queue continuous batcher (engine/continuous.py cb_run) refills a
finished row's slot in-loop, paying ~sum(len)/B steps plus refill overhead.

Workload: N requests with target lengths drawn lognormal (median ~84 codes
≈ 3.6 s audio, clipped to [16, 192]) enforced via per-request ``max_new``
caps — the duration-targeted dubbing mechanism. Both paths decode the same
requests and deliver the same per-request token counts:

- CB: one wave, per-request caps, batch=B slots.
- Bucketed: sort by target length, groups of B, each group decodes at the
  group max rounded UP to a code bucket (96/128/192 — static shapes; extra
  steps still run, exactly as the bucketed engine would pay them).

Throughput metric: delivered tokens (sum of caps) / wall.

Usage: python tools/profile_cb_hetero.py [n_req] [batch] [--tiny]
(--tiny: 2-layer model, short lengths — CPU smoke of the harness itself)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = "--tiny" in sys.argv
if TINY:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine import continuous as cb_mod
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.models import gpt as gpt_model
    from index_tts_dubbing_tpu.models.gpt import GPTConfig

    args = [a for a in sys.argv[1:] if a.isdigit()]
    n_req = int(args[0]) if len(args) > 0 else 48
    batch = int(args[1]) if len(args) > 1 else 16

    rng = np.random.default_rng(0)
    if TINY:
        cfg = GPTConfig(model_dim=64, layers=2, heads=4,
                        max_mel_tokens=64, max_text_tokens=50)
        lo, hi, med, code_buckets = 4, 24, 12, (16, 24)
        n_text, dtype = 8, jnp.float32
    else:
        cfg = GPTConfig()
        lo, hi, med, code_buckets = 16, 192, 84, (96, 128, 192)
        n_text, dtype = 48, jnp.bfloat16

    params = gpt_model.init(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(jax.tree.map(
        lambda x: x.astype(dtype)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, params))
    params = gpt_model.stack_blocks(params)
    conds = jnp.asarray(rng.standard_normal(
        (1, cfg.condition_num_latent, cfg.model_dim)), dtype)

    # SRT-like target lengths: lognormal, clipped
    lens = np.clip(np.round(np.exp(rng.normal(np.log(med), 0.55, n_req))
                            ).astype(int), lo, hi)
    texts = [rng.integers(2, cfg.number_text_tokens, size=n_text
                          ).astype(np.int32) for _ in range(n_req)]
    print(f"workload: {n_req} requests, target lengths "
          f"min/med/max = {lens.min()}/{int(np.median(lens))}/{lens.max()}, "
          f"total {int(lens.sum())} tokens", flush=True)

    sc = decode_mod.SamplingConfig(do_sample=True, max_mel_tokens=hi)

    # ---- continuous batching (device queue, per-request caps)
    reqs = [cb_mod.CBRequest(uid=i, text_ids=texts[i], max_new=int(lens[i]))
            for i in range(n_req)]
    for it in range(2):
        cb = cb_mod.ContinuousBatcher(params, cfg, sc, conds, batch=batch,
                                      rng=jax.random.PRNGKey(it))
        t0 = time.perf_counter()
        results = cb.run(reqs, dtype=dtype, max_queue=n_req)
        dt = time.perf_counter() - t0
        delivered = sum(ln for _, ln in results.values())
        tag = "compile+run" if it == 0 else "warm"
        print(f"  cb       B={batch}: {tag} {dt:6.2f}s  "
              f"{delivered/dt:6.0f} tok/s  ({delivered} delivered)",
              flush=True)
    cb_tput = delivered / dt

    # ---- bucketed generate: sort by target length, groups of B, decode at
    # the group max rounded up to a code bucket (static shapes)
    order = np.argsort(lens)
    groups = [order[i:i + batch] for i in range(0, n_req, batch)]

    def run_bucketed(it):
        t0 = time.perf_counter()
        results = {}
        for g in groups:
            gmax = int(lens[g].max())
            cap = next(cb_ for cb_ in code_buckets if cb_ >= gmax)
            rows = [texts[i] for i in g]
            # bucketed engines pad the last partial bucket (wasted rows)
            while len(rows) < batch:
                rows.append(rows[-1])
            scg = decode_mod.SamplingConfig(do_sample=True,
                                            max_mel_tokens=cap)
            pre = decode_mod.prepare_prefix_host(cfg, rows, pad_to=n_text)
            emb, keep = decode_mod.build_prefix_emb(
                params, cfg, conds, jnp.asarray(pre["ids"]),
                jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
                jnp.asarray(pre["cond_idx"]))
            res = decode_mod.generate(params, cfg, scg, emb.astype(dtype),
                                      keep,
                                      jax.random.PRNGKey(int(it * 100 + g[0])))
            codes = np.asarray(res.codes)
            for row_i, i in enumerate(g):
                results[i] = codes[row_i, :lens[i]]
        dt = time.perf_counter() - t0
        return dt, results

    for it in range(2):
        dt, results = run_bucketed(it)
        delivered = sum(r.size for r in results.values())
        tag = "compile+run" if it == 0 else "warm"
        print(f"  bucketed B={batch}: {tag} {dt:6.2f}s  "
              f"{delivered/dt:6.0f} tok/s  ({delivered} delivered)",
              flush=True)
    bk_tput = delivered / dt
    print(f"cb/bucketed throughput ratio: {cb_tput/bk_tput:.2f}x", flush=True)


if __name__ == "__main__":
    main()

"""int8 decode acceptance harness: the evidence needed to flip (or keep)
the weight-only int8 default (VERDICT r02 weak #4).

Given a GPT param tree (converted checkpoint, or random weights for harness
validation), measures what int8 weight quantization does to the decode
DECISIONS, not just the logits:

  1. logit deltas on prefill + per-step decode logits (max / p99 abs, and
     relative to the per-row logit RANGE — the scale top-k/top-p act on);
  2. greedy argmax flip rate across decode steps (sampling path);
  3. top-30 set overlap (the top_k=30 sampling pool — what do_sample=True
     actually draws from);
  4. beam-candidate overlap: the 2·nb Gumbel-free top candidates of the
     combined beam scores (the beam_sample selection pool).

Acceptance thresholds (to flip the engine default to int8, run this on the
REAL converted checkpoint):
  - greedy flip rate       < 1%   of decode steps
  - top-30 pool overlap    > 97%  mean
  - beam candidate overlap > 95%  mean
Random weights FAIL these by construction (near-uniform logits make argmax
noise-sensitive) — which is exactly why int8 ships opt-in until a trained
checkpoint passes; see docs/PERFORMANCE_NOTES.md "int8 decision".

Usage:
  python tools/int8_accept.py [--model-dir checkpoints/] [--steps 64]
                              [--batch 4] [--full-size]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None,
                    help="converted checkpoint dir (random weights if absent)")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--full-size", action="store_true",
                    help="full 1024dx20L model (default: small harness cfg)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.models import gpt as gpt_model
    from index_tts_dubbing_tpu.models.gpt import GPTConfig
    from index_tts_dubbing_tpu.utils.quant import quantize_gpt_int8

    if args.model_dir:
        from index_tts_dubbing_tpu.engine.tts import IndexTTS
        cfg_yaml = os.path.join(args.model_dir, "config.yaml")
        eng = IndexTTS(
            cfg_path=cfg_yaml if os.path.exists(cfg_yaml) else None,
            model_dir=args.model_dir, verbose_init=False)
        cfg, params = eng.gpt_cfg, eng.params["gpt"]
        src = args.model_dir
    else:
        cfg = GPTConfig() if args.full_size else GPTConfig(
            model_dim=256, layers=4, heads=8, max_mel_tokens=128,
            max_text_tokens=64, number_text_tokens=1200,
            cond_output_size=128, cond_linear_units=256,
            cond_attention_heads=4, cond_num_blocks=2)
        params = gpt_model.init(jax.random.PRNGKey(args.seed), cfg)
        src = "random init"
    q_params = quantize_gpt_int8(dict(params))

    rng = np.random.default_rng(args.seed)
    b = args.batch
    rows = [rng.integers(2, cfg.number_text_tokens, size=24).astype(np.int32)
            for _ in range(b)]
    conds = jnp.asarray(rng.standard_normal(
        (b, cfg.condition_num_latent, cfg.model_dim)).astype(np.float32))
    pre = decode_mod.prepare_prefix_host(cfg, rows)
    steps = min(args.steps, cfg.max_mel_tokens)
    nb = 3

    def decode_logit_trace(p):
        """Greedy decode with the FP32 path's token choices; returns the
        per-step logits of BOTH the trace path and this param set, so fp32
        and int8 see identical contexts (decision-aligned comparison)."""
        emb, keep = decode_mod.build_prefix_emb(
            p, cfg, conds, pre["ids"], pre["pos"], pre["seg"],
            pre["cond_idx"])
        s0 = emb.shape[1]
        cache = gpt_model.init_cache(cfg, b, s0 + steps, dtype=emb.dtype)
        h, cache = gpt_model.trunk_prefill(p, cfg, emb, keep, cache)
        return emb, keep, s0, cache, h

    # fp32 drives the token sequence; int8 is evaluated on the same contexts
    emb_f, keep_f, s0, cache_f, h_f = decode_logit_trace(params)
    emb_q, keep_q, _, cache_q, h_q = decode_logit_trace(q_params)
    base_keep = np.concatenate(
        [np.asarray(keep_f), np.ones((b, steps), bool)], axis=1)

    # jit the per-step calls — run eagerly they dispatch hundreds of ops per
    # step over the remote link (~30 ms RTT each) and never finish
    logits_j = jax.jit(gpt_model.mel_logits_from_hidden)

    @jax.jit
    def step_j(p, e, cache, slot, kk):
        return gpt_model.trunk_decode_step(p, cfg, e, cache, slot, kk)

    flips = 0
    top30 = []
    beam_overlap = []
    dmax_all, rel_all = [], []
    prev = None
    t0 = time.perf_counter()
    for j in range(steps):
        lf = np.asarray(logits_j(params, h_f), np.float32)
        lq = np.asarray(logits_j(q_params, h_q), np.float32)
        d = np.abs(lf - lq)
        dmax_all.append(d.max())
        rng_row = lf.max(axis=1) - lf.min(axis=1)
        rel_all.append((d.max(axis=1) / np.maximum(rng_row, 1e-9)).max())
        flips += int(np.sum(lf.argmax(axis=1) != lq.argmax(axis=1)))
        for r in range(b):
            tf = set(np.argpartition(-lf[r], 30)[:30].tolist())
            tq = set(np.argpartition(-lq[r], 30)[:30].tolist())
            top30.append(len(tf & tq) / 30.0)
            cf = set(np.argpartition(-lf[r], 2 * nb)[: 2 * nb].tolist())
            cq = set(np.argpartition(-lq[r], 2 * nb)[: 2 * nb].tolist())
            beam_overlap.append(len(cf & cq) / (2 * nb))
        # advance BOTH with the fp32 greedy token (shared context)
        tok = jnp.asarray(lf.argmax(axis=1), jnp.int32)
        e = (jnp.take(params["mel_emb"]["w"], tok, axis=0)
             + params["mel_pos"]["w"][j + 1]).astype(emb_f.dtype)
        slot = s0 + j
        kk = jnp.asarray(base_keep) & (
            jnp.arange(s0 + steps)[None, :] <= slot)
        h_f, cache_f = step_j(params, e, cache_f, slot, kk)
        h_q, cache_q = step_j(q_params, e, cache_q, slot, kk)

    n_dec = steps * b
    flip_rate = flips / n_dec
    res = {
        "weights": src,
        "config": f"{cfg.model_dim}d x {cfg.layers}L",
        "steps x batch": n_dec,
        "max |dlogit|": round(float(np.max(dmax_all)), 4),
        "max dlogit / logit-range": round(float(np.max(rel_all)), 4),
        "greedy flip rate": round(flip_rate, 4),
        "top30 overlap mean": round(float(np.mean(top30)), 4),
        "beam cand overlap mean": round(float(np.mean(beam_overlap)), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    ok = (flip_rate < 0.01 and np.mean(top30) > 0.97
          and np.mean(beam_overlap) > 0.95)
    res["ACCEPT int8 default"] = bool(ok)
    for k, v in res.items():
        print(f"{k}: {v}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

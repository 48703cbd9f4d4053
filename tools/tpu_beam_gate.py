"""On-chip beam-decode correctness gate under TRAINED-LIKE logit margins.

r03 found that with plain random bf16 weights, any two differently-compiled
beam programs diverge on near-tie candidates (~2e-3 logit deltas — pure
program-level rounding). Trained checkpoints don't look like that: their
logit distributions are sharp (std ~5-15, confident peaks), so candidate
margins dwarf bf16 rounding. This gate makes the margins realistic by
CALIBRATING the random model's logit scale — the mel head is rescaled so
first-step logits have a target std (default 8.0, typical of trained AR
LMs; the relative structure of the logits is untouched) — then:

 1. fp32 gate: on-TPU beam tokens must EXACTLY match the CPU fp32 oracle
    (same program, same semantics; any mismatch is a real bug);
 2. bf16 divergence bound: the production bf16 beam path on TPU is compared
    to the CPU fp32 oracle over several seeds; the per-token divergence
    rate must stay under --max-div (default 1%).

Run in the bench session (needs the chip):
  python tools/tpu_beam_gate.py [--steps 64] [--batch 4] [--seeds 4]
                                [--target-std 8.0] [--max-div 0.01]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--nb", type=int, default=3)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--target-std", type=float, default=8.0)
    ap.add_argument("--max-div", type=float, default=0.01)
    ap.add_argument("--text", type=int, default=24)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.models import gpt as gpt_model
    from index_tts_dubbing_tpu.models.gpt import GPTConfig

    assert jax.default_backend() != "cpu", \
        "this gate compares TPU vs CPU — run it on the chip"
    cpu = jax.devices("cpu")[0]

    cfg = GPTConfig()
    with jax.default_device(cpu):
        params = gpt_model.init(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(lambda x: np.asarray(x), params)

    rng = np.random.default_rng(3)
    rows = [rng.integers(2, 12000, size=args.text).astype(np.int32)
            for _ in range(args.batch)]
    conds_np = rng.standard_normal(
        (args.batch, cfg.condition_num_latent, cfg.model_dim)
    ).astype(np.float32)
    pre = decode_mod.prepare_prefix_host(cfg, rows, pad_to=args.text)

    def build(params_t, dev):
        with jax.default_device(dev):
            conds = jnp.asarray(conds_np)
            emb, keep = decode_mod.build_prefix_emb(
                params_t, cfg, conds, jnp.asarray(pre["ids"]),
                jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
                jnp.asarray(pre["cond_idx"]))
        return emb, keep

    # ---- calibrate the mel head so first-step logits have the target std
    # (scaling the head scales logits exactly linearly; relative structure,
    # and therefore the candidate ordering, is preserved)
    with jax.default_device(cpu):
        emb, keep = build(params, cpu)
        pc = gpt_model.init_cache(cfg, args.batch, emb.shape[1],
                                  dtype=emb.dtype)
        h, _ = gpt_model.trunk_prefill(params, cfg, emb, keep, pc)
        logits0 = np.asarray(gpt_model.mel_logits_from_hidden(params, h))
    std0 = float(logits0.std())
    scale = args.target_std / std0
    params["mel_head"]["w"] = params["mel_head"]["w"] * scale
    if "b" in params["mel_head"]:
        params["mel_head"]["b"] = params["mel_head"]["b"] * scale
    print(f"logit std {std0:.4f} -> x{scale:.1f} -> target "
          f"{args.target_std}", flush=True)

    sc = decode_mod.SamplingConfig(do_sample=True,
                                   max_mel_tokens=args.steps)

    def beam(params_t, emb, keep, seed, dev=None):
        key = jax.device_put(jax.random.PRNGKey(seed), dev) \
            if dev is not None else jax.random.PRNGKey(seed)
        res = decode_mod._beam_decode(params_t, cfg, sc, emb, keep, key,
                                      args.nb, 0.0, stochastic=True)
        return np.asarray(res.codes), np.asarray(res.lengths)

    def cast(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)

    # ---- 1. fp32 gate: TPU == CPU exactly
    p32_cpu = jax.device_put(cast(params, np.float32), cpu)
    p32_tpu = jax.device_put(cast(params, np.float32))
    emb_c, keep_c = build(p32_cpu, cpu)
    emb_t = jax.device_put(np.asarray(emb_c))
    keep_t = jax.device_put(np.asarray(keep_c))
    t0 = time.perf_counter()
    codes_cpu, len_cpu = beam(p32_cpu, emb_c, keep_c, 0, dev=cpu)
    codes_tpu, len_tpu = beam(p32_tpu, emb_t, keep_t, 0)
    same = (codes_cpu == codes_tpu).all() and (len_cpu == len_tpu).all()
    print(f"fp32 gate: TPU == CPU exact: {bool(same)} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # ---- 2. bf16 production path vs the fp32 oracle across seeds
    p16_tpu = jax.device_put(cast(params, ml_dtypes.bfloat16))
    divs = []
    for seed in range(args.seeds):
        oracle, olen = beam(p32_cpu, emb_c, keep_c, seed, dev=cpu)
        emb16 = jax.device_put(
            np.asarray(emb_c).astype(ml_dtypes.bfloat16))
        c16, l16 = beam(p16_tpu, emb16, keep_t, seed)
        # compare over the oracle's valid region per row
        tot = diff = 0
        for i in range(args.batch):
            n = int(olen[i])
            tot += n
            diff += int((oracle[i, :n] != c16[i, :n]).sum())
        div = diff / max(tot, 1)
        divs.append(div)
        print(f"seed {seed}: bf16-TPU vs fp32-CPU divergence "
              f"{div*100:.2f}% ({diff}/{tot})", flush=True)

    worst = max(divs)
    ok = bool(same) and worst <= args.max_div
    print(f"RESULT: {'PASS' if ok else 'FAIL'}  "
          f"(fp32 exact={bool(same)}, worst bf16 divergence "
          f"{worst*100:.2f}% <= {args.max_div*100:.1f}%)", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

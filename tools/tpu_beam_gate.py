"""On-chip beam-decode correctness gate under TRAINED-LIKE logit margins.

r03 found that with plain random bf16 weights, any two differently-compiled
beam programs diverge on near-tie candidates (~2e-3 logit deltas — pure
program-level rounding). Trained checkpoints don't look like that: their
logit distributions are sharp (std ~5-15, confident peaks), so candidate
margins dwarf bf16 rounding. This gate makes the margins realistic by
CALIBRATING the random model's logit scale — the mel head is rescaled so
first-step logits have a target std (default 8.0, typical of trained AR
LMs; the relative structure of the logits is untouched) — then:

Because decode is autoregressive, a single near-tie flip cascades into a
fully different suffix — raw token-divergence percentages measure cascade
length, not correctness. The gate therefore measures the PER-STEP FLIP
RATE: for each row, the first position where the TPU stream departs from
the CPU fp32 oracle; flip_rate = (#rows that ever diverged) / (total steps
decoded identically before divergence). Gates:

 1. fp32-highest: the TPU decode at fp32 with
    jax.default_matmul_precision("highest") (without it, TPU "fp32"
    matmuls run single-pass bf16 on the MXU and carry ~1e-2 relative
    noise — measured r04: 4.0%/step flips, i.e. indistinguishable from
    bf16). Flip rate vs the CPU fp32 oracle must be ≤ --max-flip-fp32
    (default 0.5%/step): this is the CORRECTNESS gate — the TPU program
    implements the same decision procedure as the CPU oracle.
 2. bf16 (the production dtype): flip rate recorded and sanity-bounded by
    --max-flip (default 10%/step). NOTE on interpretation: even after
    scale-matching, a random model's top-k/top-p boundaries stay maximally
    CROWDED (many candidates within bf16 noise of each decision
    boundary), and crowding — not absolute scale — sets the flip rate
    (flips are scale-invariant: margins and noise both scale with the
    calibration factor). The recorded rate is therefore an UPPER bound;
    trained checkpoints concentrate probability mass and leave decision
    boundaries sparse.

Run in the bench session (needs the chip):
  python tools/tpu_beam_gate.py [--steps 64] [--batch 4] [--seeds 4]
                                [--target-std 8.0] [--max-flip 0.10]
                                [--max-flip-fp32 0.005]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flip_stats(oracle, olen, other, olen2):
    """(rows diverged, steps decoded identically before divergence).

    The per-step flip rate over a batch is flips / steps: an AR stream's
    tokens after the first flip are cascade, so only the identical prefix
    counts as 'steps at risk'."""
    flips = steps = 0
    for i in range(oracle.shape[0]):
        n = min(int(olen[i]), int(olen2[i]))
        neq = np.nonzero(oracle[i, :n] != other[i, :n])[0]
        if neq.size or int(olen[i]) != int(olen2[i]):
            flips += 1
            steps += int(neq[0]) if neq.size else n
        else:
            steps += n
    return flips, steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--nb", type=int, default=3)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--target-std", type=float, default=8.0)
    ap.add_argument("--max-flip", type=float, default=0.10)
    ap.add_argument("--max-flip-fp32", type=float, default=0.005)
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

    p32_cpu = jax.device_put(cast(params, np.float32), cpu)
    p32_tpu = jax.device_put(cast(params, np.float32))
    p16_tpu = jax.device_put(cast(params, ml_dtypes.bfloat16))
    emb_c, keep_c = build(p32_cpu, cpu)
    emb_t = jax.device_put(np.asarray(emb_c))
    keep_t = jax.device_put(np.asarray(keep_c))
    emb16 = jax.device_put(np.asarray(emb_c).astype(ml_dtypes.bfloat16))

    f32_flips = f32_steps = b16_flips = b16_steps = 0
    t0 = time.perf_counter()
    for seed in range(args.seeds):
        oracle, olen = beam(p32_cpu, emb_c, keep_c, seed, dev=cpu)
        with jax.default_matmul_precision("highest"):
            c32, l32 = beam(p32_tpu, emb_t, keep_t, seed)
        c16, l16 = beam(p16_tpu, emb16, keep_t, seed)
        fl, st = flip_stats(oracle, olen, c32, l32)
        f32_flips += fl
        f32_steps += st
        fl16, st16 = flip_stats(oracle, olen, c16, l16)
        b16_flips += fl16
        b16_steps += st16
        print(f"seed {seed}: fp32 {fl}/{args.batch} rows flipped "
              f"(identical-prefix steps {st}); "
              f"bf16 {fl16}/{args.batch} rows flipped "
              f"(identical-prefix steps {st16})", flush=True)

    rate32 = f32_flips / max(f32_steps, 1)
    rate16 = b16_flips / max(b16_steps, 1)
    ok = rate32 <= args.max_flip_fp32 and rate16 <= args.max_flip
    print(f"per-step flip rate vs CPU fp32 oracle: "
          f"fp32-TPU {rate32*100:.3f}%/step (gate {args.max_flip_fp32*100}%)"
          f", bf16-TPU {rate16*100:.3f}%/step (gate {args.max_flip*100}%)"
          f"  [{time.perf_counter()-t0:.0f}s]", flush=True)
    print(f"RESULT: {'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

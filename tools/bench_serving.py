"""Online-serving bench: Poisson arrivals → p50/p95 time-to-codes.

Continuous batching was retired from the OFFLINE dubbing path in r03 (plain
bucketed batching wins when all requests are known up-front —
tools/profile_cb_hetero.py). Its stated domain is ONLINE serving: requests
arriving over time. This bench measures that domain directly:

  - arrivals: Poisson process at --rate req/s (seeded, identical across
    strategies), N requests of 48 text tokens each, full-length decode
    (--steps mel codes ≈ steps·1024/24000 s of audio per request);
  - strategy "cb": a server loop over the CB incremental API
    (engine/continuous.py insert/decode_chunk): arrivals are prefilled and
    inserted into free slots between decode chunks; a request completes at
    the first host sync that observes its done flag;
  - strategy "bucket": arrivals queue up; whenever the server is idle it
    takes up to --slots pending requests and runs ONE batched
    decode.generate to completion (everyone in the batch finishes
    together; later arrivals wait for the whole batch).

Reported per strategy: p50/p95/mean time-to-completion (arrival → codes
done, the decode stage of time-to-audio), makespan, and decode throughput.
Vocoding is a shared downstream cost (windowed, stream-batched) and is
excluded — the strategies differ only in how decode is scheduled.

Usage:
  python tools/bench_serving.py [--n 48] [--rate 8] [--slots 16]
                                [--steps 192] [--chunk 32] [--fp32]
                                [--strategies cb,bucket]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--rate", type=float, default=8.0, help="arrivals/s")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--text", type=int, default=48)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--strategies", default="cb,bucket")
    ap.add_argument("--small", action="store_true",
                    help="tiny model (CPU smoke test of the harness)")
    ap.add_argument("--hetero", action="store_true",
                    help="heterogeneous per-request decode lengths "
                         "(lognormal caps, the duration-targeted dubbing "
                         "profile): CB caps each slot via max_new; the "
                         "bucketed server decodes each batch at the "
                         "64/128/192 bucket of its longest member")
    args = ap.parse_args(argv)

    import jax
    if args.small:
        # hermetic harness smoke test (the sitecustomize pins the TPU
        # platform; env var alone doesn't override it)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine import continuous as cb
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.models import gpt as gpt_model
    from index_tts_dubbing_tpu.models.gpt import GPTConfig, KVCache

    cfg = GPTConfig() if not args.small else GPTConfig(
        model_dim=64, layers=2, heads=4, max_mel_tokens=64,
        max_text_tokens=50, number_text_tokens=120, cond_output_size=32,
        cond_linear_units=64, cond_attention_heads=4, cond_num_blocks=2)
    if args.small:
        args.text = min(args.text, 32)
    with jax.default_device(jax.devices("cpu")[0]):
        params = gpt_model.init(jax.random.PRNGKey(0), cfg)
    if not args.fp32:
        import ml_dtypes
        params = jax.tree.map(
            lambda x: x.astype(ml_dtypes.bfloat16)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, params)
    params = jax.device_put(params)
    dtype = jnp.bfloat16 if not args.fp32 else jnp.float32

    rng = np.random.default_rng(0)
    rows = [rng.integers(2, cfg.number_text_tokens,
                         size=args.text).astype(np.int32)
            for _ in range(args.n)]
    gaps = rng.exponential(1.0 / args.rate, size=args.n)
    arrivals = np.cumsum(gaps)
    arrivals[0] = 0.0
    if args.hetero:
        req_steps = np.clip(np.round(np.exp(
            rng.normal(np.log(80), 0.6, size=args.n))).astype(int),
            24, args.steps)
    else:
        req_steps = np.full(args.n, args.steps)
    step_buckets = [b for b in (64, 128, args.steps)
                    if b <= args.steps] or [args.steps]
    conds = jnp.asarray(rng.standard_normal(
        (1, cfg.condition_num_latent, cfg.model_dim)).astype(np.float32))
    sc = decode_mod.SamplingConfig(do_sample=True, max_mel_tokens=args.steps)
    audio_total = float(req_steps.sum()) * 1024 / 24000.0

    def prefix(batch_rows):
        pre = decode_mod.prepare_prefix_host(cfg, batch_rows,
                                             pad_to=args.text)
        emb, keep = decode_mod.build_prefix_emb(
            params, cfg, conds, jnp.asarray(pre["ids"]),
            jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
            jnp.asarray(pre["cond_idx"]))
        return emb.astype(dtype), keep

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    results = {}

    # ---------------- continuous batching server -------------------------
    def run_cb():
        B = args.slots
        emb1, keep1 = prefix(rows[:1])
        s0 = emb1.shape[1]
        key = jax.random.PRNGKey(1)
        state = cb.init_state(cfg, sc, B, s0 + args.steps, key, dtype=dtype)

        # warmup (compiles): prefill B=1, insert, decode_chunk, host reads
        log("  [cb] warmup compiles...")
        h, kv = cb.prefill(params, cfg, emb1, keep1)
        st = cb.insert(params, cfg, sc, state, jnp.int32(0), h[0:1],
                       KVCache(kv.k[:, 0:1], kv.v[:, 0:1]), keep1[0:1])
        st = cb.decode_chunk(params, cfg, sc, st, args.chunk)
        np.asarray(st.done)
        # fresh state for the timed run (fresh key: the warmup insert
        # donated the old state, whose rng aliased `key`)
        state = cb.init_state(cfg, sc, B, s0 + args.steps,
                              jax.random.PRNGKey(11), dtype=dtype)

        slot_uid = [-1] * B
        completed = {}
        arr_i = 0
        t0 = time.perf_counter()
        while len(completed) < args.n:
            now = time.perf_counter() - t0
            # admit arrivals into free slots (prefill + insert per request:
            # the online path pays per-request dispatches by nature)
            free = [s for s in range(B) if slot_uid[s] < 0]
            while (arr_i < args.n and free
                   and arrivals[arr_i] <= now):
                emb, keep = prefix(rows[arr_i:arr_i + 1])
                h, kv = cb.prefill(params, cfg, emb, keep)
                slot = free.pop(0)
                state = cb.insert(params, cfg, sc, state, jnp.int32(slot),
                                  h[0:1], KVCache(kv.k[:, 0:1],
                                                  kv.v[:, 0:1]), keep[0:1],
                                  max_new=jnp.int32(int(req_steps[arr_i])))
                slot_uid[slot] = arr_i
                arr_i += 1
            if all(u < 0 for u in slot_uid):
                if arr_i < args.n:
                    time.sleep(max(arrivals[arr_i]
                                   - (time.perf_counter() - t0), 0.0))
                continue
            state = cb.decode_chunk(params, cfg, sc, state, args.chunk)
            done = np.asarray(state.done)          # host sync per chunk
            tdone = time.perf_counter() - t0
            freed = jnp.zeros((B,), bool)
            any_freed = False
            for s in range(B):
                if slot_uid[s] >= 0 and done[s]:
                    completed[slot_uid[s]] = tdone - arrivals[slot_uid[s]]
                    slot_uid[s] = -1
                    freed = freed.at[s].set(True)
                    any_freed = True
            if any_freed:
                state = state._replace(active=state.active & ~freed,
                                       done=state.done & ~freed)
        makespan = time.perf_counter() - t0
        return completed, makespan

    # ---------------- bucketed-batch server ------------------------------
    def run_bucket():
        B = args.slots
        # one program shape per decode-length bucket (batch padded with
        # repeats of the first taken row)
        scs = {b: decode_mod.SamplingConfig(do_sample=True,
                                            max_mel_tokens=b)
               for b in step_buckets}
        log("  [bucket] warmup compiles...")
        key = jax.random.PRNGKey(2)
        emb, keep = prefix([rows[0]] * B)
        for b, sc_b in scs.items():
            np.asarray(decode_mod.generate(params, cfg, sc_b, emb, keep,
                                           key).codes)

        completed = {}
        arr_i = 0
        pending = []
        t0 = time.perf_counter()
        while len(completed) < args.n:
            now = time.perf_counter() - t0
            while arr_i < args.n and arrivals[arr_i] <= now:
                pending.append(arr_i)
                arr_i += 1
            if not pending:
                time.sleep(max(arrivals[arr_i]
                               - (time.perf_counter() - t0), 0.0))
                continue
            # take the B shortest pending (sorted admission bounds the
            # batch's decode-length bucket)
            pending.sort(key=lambda i: req_steps[i])
            take = pending[:B]
            pending = pending[len(take):]
            bucket = next(b for b in step_buckets
                          if b >= max(req_steps[i] for i in take))
            batch_rows = [rows[i] for i in take]
            batch_rows += [rows[take[0]]] * (B - len(take))
            emb, keep = prefix(batch_rows)
            res = decode_mod.generate(params, cfg, scs[bucket], emb, keep,
                                      key)
            np.asarray(res.codes)                  # batch-completion sync
            tdone = time.perf_counter() - t0
            for i in take:
                completed[i] = tdone - arrivals[i]
        makespan = time.perf_counter() - t0
        return completed, makespan

    for strat in args.strategies.split(","):
        log(f"strategy {strat}...")
        completed, makespan = run_cb() if strat == "cb" else run_bucket()
        lat = [completed[i] for i in range(args.n)]
        results[strat] = dict(
            p50=pct(lat, 50), p95=pct(lat, 95), mean=float(np.mean(lat)),
            makespan=makespan,
            audio_s_per_s=audio_total / makespan)
        log(f"  {strat}: p50 {results[strat]['p50']:.2f}s  "
            f"p95 {results[strat]['p95']:.2f}s  "
            f"mean {results[strat]['mean']:.2f}s  "
            f"makespan {makespan:.1f}s  "
            f"{results[strat]['audio_s_per_s']:.1f} audio-s/s")

    print("\nworkload: "
          f"N={args.n} rate={args.rate}/s text={args.text} "
          f"steps={'hetero(24..%d med %d)' % (args.steps, int(np.median(req_steps))) if args.hetero else args.steps} "
          f"slots={args.slots} chunk={args.chunk} "
          f"dtype={'fp32' if args.fp32 else 'bf16'}")
    hdr = f"{'strategy':9s} {'p50':>7s} {'p95':>7s} {'mean':>7s} " \
          f"{'makespan':>9s} {'audio-s/s':>10s}"
    print(hdr)
    for strat, r in results.items():
        print(f"{strat:9s} {r['p50']:7.2f} {r['p95']:7.2f} {r['mean']:7.2f} "
              f"{r['makespan']:9.1f} {r['audio_s_per_s']:10.1f}")


if __name__ == "__main__":
    main()

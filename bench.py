"""Headline benchmark: end-to-end TTS RTF on one chip, THROUGH THE PUBLIC API.

Runs the flagship IndexTTS-1.5-sized pipeline on a fixed synthetic workload
through the public ``IndexTTS.infer_fast`` surface — which routes eligible
workloads onto the FUSED serving graph (engine/fused.py: prefix → AR decode →
silence trim → latent pass → windowed BigVGAN in ONE XLA program) — and
prints ONE JSON line:
{"metric": "rtf", "value": ..., "unit": ..., "vs_baseline": ...}

Two decode modes are measured: the sampling fast path (num_beams=1) and the
reference's quality default (num_beams=3 beam sampling, infer.py:332); the
headline RTF is the quality default's, detail carries both.

vs_baseline is measured against the driver target RTF < 0.05
(BASELINE.md: "Per-chip speed: RTF < 0.05") — values > 1.0 beat the target.

Cold-start design (this backend pays ~2-4 min of server session bring-up on
the FIRST execution of a process, plus a server compile per distinct program
— see docs/PERFORMANCE_NOTES.md):
 1. a tiny op is dispatched asynchronously at import time so the session
    bring-up runs CONCURRENTLY with everything below;
 2. the two fused programs + the conditioning/speaker programs are
    AOT-compiled in parallel threads (XLA compiles release the GIL);
 3. a repo-local seed cache (tools/seed_cache.py) makes step 2 a cache hit —
    per-program HIT/MISS is logged by diffing the active cache dir around
    the compiles (a MISS means the snapshot is stale for that program).

Random weights are used (no public checkpoints ship with the reference);
decode length is fixed by max_mel_tokens so the workload is deterministic
and timing-representative: the same matmuls/kernels run as with real weights.
"""
import faulthandler
import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)
T0 = time.perf_counter()

BENCH_PROGRAMS = ("jit_synthesize_fused", "jit_get_conditioning",
                  "jit_speaker_embedding")


def log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')} +{time.perf_counter()-T0:5.0f}s]"
          f" {msg}", file=sys.stderr, flush=True)


def cache_entries():
    # read the ACTIVE dir from jax config (not a re-derived default): if the
    # engine's configured dir ever drifts, diffing the wrong dir would log
    # every program as 'HIT' — silently reintroducing the stale-snapshot
    # failure mode this logging exists to catch (r04 advisor)
    import jax
    d = jax.config.jax_compilation_cache_dir
    d = Path(d) if d else Path.home() / ".cache" / "jax_comp_cache"
    return {p.name for p in d.iterdir()} if d.is_dir() else set()


def sds_tree(tree):
    import jax
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "aval") else jax.ShapeDtypeStruct(x.shape, x.dtype),
        tree)


def main():
    import jax
    import jax.numpy as jnp

    # seed the persistent compile cache from the repo-local snapshot BEFORE
    # any compile happens (no-op if absent or already seeded).
    # BENCH_NO_SEED_CACHE: set by tools/seed_cache.py snapshot-exact so its
    # fresh-dir compile run doesn't inherit the superseded snapshot.
    if os.environ.get("BENCH_NO_SEED_CACHE"):
        log("cache seeding disabled (BENCH_NO_SEED_CACHE)")
    else:
        try:
            from tools.seed_cache import seed_compile_cache
            n_seeded = seed_compile_cache()
            if n_seeded:
                log(f"seeded compile cache with {n_seeded} entries")
        except Exception as e:  # bench must run even if seeding breaks
            log(f"cache seeding skipped: {type(e).__name__}: {e}")

    # kick the server session bring-up NOW (async dispatch, not synced):
    # it proceeds concurrently with param init and the AOT compiles below
    warm_probe = jnp.zeros(8) + 1

    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from index_tts_dubbing_tpu.engine.tts import _cond_jit
    from index_tts_dubbing_tpu.engine import vocoder as voc_mod
    from index_tts_dubbing_tpu.utils.config import EngineConfig

    fp16 = "--fp32" not in sys.argv
    # --int8: weight-only int8 GPT trunk through the SAME fused/public path
    # (r04 verdict #5). Opt-in and clearly labeled: the engine default
    # stays bf16 until a REAL converted checkpoint passes the recorded
    # tools/int8_accept.py thresholds (random weights fail them by
    # construction — see docs/PERFORMANCE_NOTES.md "int8 decision"). The
    # int8 programs are distinct cache keys, so this leg pays its own
    # compiles (not in the seed snapshot).
    int8 = "--int8" in sys.argv
    log("engine init...")
    engine = IndexTTS(config=EngineConfig(), is_fp16=fp16,
                      verbose_init=False, seed=0,
                      quantize="int8" if int8 else None)
    log("engine ready")

    sr = engine.cfg.mel.sample_rate
    rng = np.random.default_rng(0)

    # synthetic workload: 5 s reference prompt; 16 sentences x 48 text
    # tokens, 192 mel codes each (≈8.2 s audio per sentence) — the
    # production multi-sentence batch at its B=16 bucket, fed as TEXT
    # through the public infer_fast surface (which routes it onto the
    # fused one-program path; the bench asserts the route taken)
    cond_mel = rng.standard_normal((1, 100, 470)).astype(np.float32)
    engine.set_cond_mel(cond_mel)
    batch = 16
    n_text = 48
    steps = 192
    # 16 sentences of exactly 48 tokens through the CharTokenizer (47
    # letters + '.'; ids are deterministic codepoint hashes). With
    # max_text_tokens_per_sentence=48, split_sentences keeps each sentence
    # whole and never merges two (96 > 48).
    letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    text = " ".join(
        "".join(rng.choice(list(letters), size=n_text - 1)) + "."
        for _ in range(batch))
    # the AOT shapes below assume this text tokenizes to exactly
    # batch x n_text rows — verify on host before spending compile time
    check_rows = [np.asarray(engine.tokenizer.convert_tokens_to_ids(s))
                  for s in engine.tokenizer.split_sentences(
                      engine.tokenizer.tokenize(text), n_text)]
    assert len(check_rows) == batch and \
        all(r.size == n_text for r in check_rows), \
        [r.size for r in check_rows]

    # ---- mixed-length workload (r04 verdict #1): a realistic long text
    # whose sentences span FOUR text buckets (16/32/48/64) — the reference's
    # infer_fast exists precisely for such texts (its bucket_sentences,
    # infer.py:188-243). Since r05 the fused route serves these by padding
    # all rows to the batch's max TEXT bucket, with the batch padded to a
    # FUSED_BATCH_BUCKET by DEAD rows (live mask: they stop at decode step 0
    # and add no stream frames/windows). Sizes are chosen so every adjacent
    # pair sums > max_tokens_per_sentence (=64) → the splitter never merges.
    mixed_sizes = [60, 40, 60, 28, 60, 40, 60, 28, 60, 40, 60, 14, 60, 40]
    mixed_max = 64
    text_mixed = " ".join(
        "".join(rng.choice(list(letters), size=sz - 1)) + "."
        for sz in mixed_sizes)
    mixed_rows = [np.asarray(engine.tokenizer.convert_tokens_to_ids(s))
                  for s in engine.tokenizer.split_sentences(
                      engine.tokenizer.tokenize(text_mixed), mixed_max)]
    assert [r.size for r in mixed_rows] == mixed_sizes, \
        [r.size for r in mixed_rows]
    n_live_mixed = len(mixed_sizes)               # 14 → batch bucket 16
    mixed_batch = 16

    # ---- AOT-compile every program (bring-up still running concurrently).
    # engine.aot_lower_fused derives the avals from the SAME functions the
    # runtime calls (eval_shape), so the runtime calls are guaranteed cache
    # hits — hand-built ShapeDtypeStructs cost a silent ~150 s recompile
    # when a dtype drifts (conds/spk are fp32 even under bf16 params).
    #
    # LOWER SEQUENTIALLY, COMPILE CONCURRENTLY: lowering on one thread is
    # deterministic by construction, and the compiles (which release the
    # GIL) still overlap each other and the session bring-up. The r03
    # seed-cache silent-miss failure mode was root-caused r04 to the
    # persistent-cache key retaining residual CALLER-PATH bytes that
    # survive MLIR strip-debuginfo — which is why snapshot-exact runs THIS
    # file (--compile-only) rather than a separate priming script.
    cfg = engine.gpt_cfg
    gpt_sds = sds_tree(engine.params["gpt"])
    bv_sds = sds_tree(engine.params["bigvgan"])
    cache_before = cache_entries()

    lowered = []
    for nb in (1, 3):
        sc = engine._sampling_config(dict(do_sample=True, num_beams=nb,
                                          max_mel_tokens=steps))
        lowered.append((f"fused program (num_beams={nb})",
                        engine.aot_lower_fused(batch, n_text, sc,
                                               num_beams=nb,
                                               cond_frames=470)))
        lowered.append((f"fused mixed program (num_beams={nb})",
                        engine.aot_lower_fused(mixed_batch, mixed_max, sc,
                                               num_beams=nb,
                                               cond_frames=470,
                                               n_live=n_live_mixed)))
    mel_sds = jax.ShapeDtypeStruct((1, 470, 100), np.float32)
    len_sds = jax.ShapeDtypeStruct((1,), np.int32)
    lowered.append(("cond",
                    _cond_jit.lower(gpt_sds, cfg, mel_sds, len_sds)))
    lowered.append(("spk",
                    voc_mod.speaker_embedding.lower(bv_sds, mel_sds)))
    log("all programs lowered (sequential)")

    def compile_one(label, low):
        t0 = time.perf_counter()
        low.compile()
        log(f"{label} compiled {time.perf_counter()-t0:.0f}s")

    threads = [threading.Thread(target=compile_one, args=pair)
               for pair in lowered]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    log("all programs compiled")

    # per-program cache HIT/MISS: a MISS writes a new entry into the active
    # cache dir — exactly the signal that the repo snapshot was stale for
    # that program (r03: two silent misses cost 152-154 s each)
    new_entries = cache_entries() - cache_before
    for prefix in BENCH_PROGRAMS:
        fresh = [e for e in new_entries if e.startswith(prefix)]
        log(f"compile cache {'MISS' if fresh else 'HIT '} {prefix}"
            + (f" ({len(fresh)} new entries)" if fresh else ""))

    if "--compile-only" in sys.argv:
        # tools/seed_cache.py snapshot-exact runs THIS file to populate the
        # snapshot: the persistent-cache key retains residual caller-path
        # bytes that survive MLIR strip-debuginfo in this jax version, so
        # only programs lowered FROM bench.py itself produce the keys the
        # driver's bench run will look up (root-caused r04 — compiling the
        # identical program from tools/prime_cache.py yields a different
        # key; see docs/PERFORMANCE_NOTES.md).
        log("compile-only: exiting before device warmup")
        return

    np.asarray(warm_probe)  # session bring-up complete from here
    log("device session up")

    import jax as _jax
    with _jax.default_device(_jax.devices("cpu")[0]):
        key0 = _jax.random.PRNGKey(0)

    def run_once(num_beams, which_text=text, max_sent=n_text):
        # identical sampling keys per run → identical codes → the warm run
        # reuses every compiled shape from the warmup run
        engine._rng = key0
        t0 = time.perf_counter()
        _, wav = engine.infer_fast("<direct>", which_text, None,
                                   max_text_tokens_per_sentence=max_sent,
                                   do_sample=True, num_beams=num_beams,
                                   max_mel_tokens=steps)
        dt = time.perf_counter() - t0
        assert engine.last_path == "fused", engine.last_path
        tokens = int(np.asarray(engine.last_fused_res.gen_lengths).sum())
        return dt, wav.shape[0], tokens

    def run_mixed(num_beams):
        return run_once(num_beams, which_text=text_mixed,
                        max_sent=mixed_max)

    log("warmup run (num_beams=1)...")
    run_once(1)
    log("warmup run (num_beams=3)...")
    run_once(3)
    log("warmup run (mixed, num_beams=1)...")
    run_mixed(1)
    log("warmup run (mixed, num_beams=3)...")
    run_mixed(3)
    log("timed runs...")
    t_fast, n_fast, tok_fast = run_once(1)
    t_beam, n_beam, tok_beam = run_once(3)
    t_mfast, n_mfast, _ = run_mixed(1)
    t_mbeam, n_mbeam, tok_mbeam = run_mixed(3)
    log(f"fast {t_fast:.2f}s/{n_fast/sr:.1f}s-audio  "
        f"beam3 {t_beam:.2f}s/{n_beam/sr:.1f}s-audio  "
        f"mixed-fast {t_mfast:.2f}s/{n_mfast/sr:.1f}s  "
        f"mixed-beam3 {t_mbeam:.2f}s/{n_mbeam/sr:.1f}s")

    audio_beam = n_beam / sr
    audio_fast = n_fast / sr
    rtf_beam = t_beam / audio_beam
    rtf_fast = t_fast / audio_fast
    rtf_mbeam = t_mbeam / (n_mbeam / sr)
    rtf_mfast = t_mfast / (n_mfast / sr)

    # headline = the engine/reference DEFAULT decode mode (num_beams=3)
    print(json.dumps({
        "metric": "rtf",
        "value": round(rtf_beam, 5),
        "unit": "sec_compute_per_sec_audio",
        "vs_baseline": round(0.05 / rtf_beam, 3),
        "detail": {
            "mode": "beam_sample x3 (reference default), public infer_fast"
                    " -> fused graph",
            "rtf_sampling": round(rtf_fast, 5),
            "rtf_mixed_buckets": round(rtf_mbeam, 5),
            "rtf_mixed_buckets_sampling": round(rtf_mfast, 5),
            "mixed_workload": "14 sentences spanning text buckets"
                              " 16/32/48/64, batch-padded to 16 w/ live"
                              " mask, beam x3 / sampling",
            "tokens_generated_mixed": tok_mbeam,
            "tokens_generated": tok_beam,
            "tokens_generated_sampling": tok_fast,
            "tokens_per_s_e2e_sampling": round(tok_fast / t_fast, 1),
            "audio_seconds_per_s_per_chip": round(audio_beam / t_beam, 2),
            "audio_seconds_per_s_sampling": round(audio_fast / t_fast, 2),
            "warmup_wall_s": round(time.perf_counter() - T0 - t_fast
                                   - t_beam - t_mfast - t_mbeam, 1),
            "dtype": "bf16" if fp16 else "fp32",
            "quantize": "int8 (opt-in, accept-gated)" if int8 else "none",
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()

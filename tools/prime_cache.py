"""Compile-cache priming: AOT-compile the engine's static shape matrix into
the persistent compilation cache (~/.cache/jax_comp_cache) so a production
bring-up never hits a cold decode compile mid-request.

Shapes primed (no execution — jit(...).lower(...).compile() only):
- AR decode `generate` (num_beams=1 sampling) and `generate_beam_sample`
  (the num_beams=3 reference default) at TEXT_BUCKETS × batch sizes;
- the bucketed latent pass at TEXT×CODE bucket combos;
- the C-major windowed vocoder at the power-of-two window batches.

Usage:
  python tools/prime_cache.py            # quick: the shapes bench/serving hit
  python tools/prime_cache.py --all      # full matrix (hours on cold cache)
  python tools/prime_cache.py --steps 600 --batches 1,4
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from index_tts_dubbing_tpu.engine import decode as decode_mod
from index_tts_dubbing_tpu.engine import vocoder as voc_mod
from index_tts_dubbing_tpu.engine.tts import IndexTTS
from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.utils.config import EngineConfig


def sds_tree(tree):
    """Params → ShapeDtypeStruct tree (AOT lowering needs shapes only)."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "aval") else jax.ShapeDtypeStruct(x.shape, x.dtype),
        tree)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="full TEXT×CODE×batch matrix")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batches", default="1,4")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--bench-set", action="store_true",
                    help="compile the bench.py program set (the two fused "
                         "programs + cond/spk at the bench shapes). NOTE: "
                         "snapshot-exact uses `bench.py --compile-only` "
                         "instead — the persistent-cache key retains "
                         "caller-path bytes, so entries compiled from this "
                         "script do NOT match bench.py's keys (they still "
                         "warm any server-side compile cache)")
    args = ap.parse_args(argv)

    engine = IndexTTS(config=EngineConfig(), is_fp16=not args.fp32,
                      verbose_init=False, seed=0)

    if args.bench_set:
        import jax as _jax
        from index_tts_dubbing_tpu.engine.tts import _cond_jit
        gpt_sds_ = sds_tree(engine.params["gpt"])
        bv_sds_ = sds_tree(engine.params["bigvgan"])
        batch, n_text, steps, cond_frames = 16, 48, 192, 470
        for nb in (1, 3):
            sc = engine._sampling_config(dict(do_sample=True, num_beams=nb,
                                              max_mel_tokens=steps))
            t0 = time.perf_counter()
            engine.aot_compile_fused(batch, n_text, sc, num_beams=nb,
                                     cond_frames=cond_frames)
            print(f"  [{time.perf_counter()-t0:6.1f}s] fused nb={nb}",
                  flush=True)
        t0 = time.perf_counter()
        mel_sds = _jax.ShapeDtypeStruct((1, cond_frames, 100), np.float32)
        len_sds = _jax.ShapeDtypeStruct((1,), np.int32)
        _cond_jit.lower(gpt_sds_, engine.gpt_cfg, mel_sds, len_sds).compile()
        voc_mod.speaker_embedding.lower(bv_sds_, mel_sds).compile()
        print(f"  [{time.perf_counter()-t0:6.1f}s] cond+spk", flush=True)
        return 0
    cfg = engine.gpt_cfg
    dtype = engine.dtype
    gpt_sds = sds_tree(engine.params["gpt"])
    bv_sds = sds_tree(engine.params["bigvgan"])
    batches = [int(b) for b in args.batches.split(",")]
    text_buckets = engine.TEXT_BUCKETS if args.all else (48, 120)
    code_buckets = engine.CODE_BUCKETS if args.all else (192, 608)

    done, t_all = 0, time.perf_counter()

    def prime(label, fn, *shaped, **kw):
        nonlocal done
        t0 = time.perf_counter()
        try:
            fn.lower(*shaped, **kw).compile()
            done += 1
            print(f"  [{time.perf_counter()-t0:6.1f}s] {label}", flush=True)
        except Exception as e:  # keep priming the rest
            print(f"  FAILED {label}: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    key_sds = jax.ShapeDtypeStruct((2,), np.uint32)

    print("priming decode shapes...", flush=True)
    for tb in text_buckets:
        s0 = cfg.condition_num_latent + tb + 2 + 1
        for b in batches:
            emb = jax.ShapeDtypeStruct((b, s0, cfg.model_dim), dtype)
            keep = jax.ShapeDtypeStruct((b, s0), np.bool_)
            sc = decode_mod.SamplingConfig(
                do_sample=True,
                max_mel_tokens=min(args.steps, cfg.max_mel_tokens))
            prime(f"generate B={b} text={tb}", decode_mod.generate,
                  gpt_sds, cfg, sc, emb, keep, key_sds, mesh=None)
            prime(f"beam_sample(3) B={b} text={tb}",
                  decode_mod._beam_decode,
                  gpt_sds, cfg, sc, emb, keep, key_sds, 3, 0.0, True)

    print("priming latent-pass shapes...", flush=True)
    from index_tts_dubbing_tpu.engine.tts import _latent_jit
    for tb in text_buckets:
        for cb in code_buckets:
            cb = min(cb, cfg.max_mel_tokens)   # engine clamps the top bucket
            for b in batches:
                conds = jax.ShapeDtypeStruct(
                    (b, cfg.condition_num_latent, cfg.model_dim), dtype)
                prime(f"latent B={b} text={tb} code={cb}", _latent_jit,
                      gpt_sds, cfg, conds,
                      jax.ShapeDtypeStruct((b, tb), np.int32),
                      jax.ShapeDtypeStruct((b,), np.int64),
                      jax.ShapeDtypeStruct((b, cb), np.int32),
                      jax.ShapeDtypeStruct((b,), np.int64))

    print("priming vocoder window batches...", flush=True)
    voc = engine.vocoder
    full = voc.window + 2 * voc.halo
    packed = voc._packed_weights()
    packed_sds = sds_tree(packed) if packed is not None else None
    spk = jax.ShapeDtypeStruct(
        (1, 1, engine.bigvgan_cfg.speaker_embedding_dim), voc.compute_dtype)
    for nb in voc.WINDOW_COUNT_BUCKETS:
        lat = jax.ShapeDtypeStruct((nb, full, engine.bigvgan_cfg.gpt_dim),
                                   voc.compute_dtype)
        if voc.layout == "cmajor":
            prime(f"vocoder cmajor NB={nb}", voc_mod._vocode_window_cmajor,
                  bv_sds, engine.bigvgan_cfg, lat, spk,
                  use_pallas=voc.use_pallas,
                  fuse_resblocks=voc.fuse_resblocks, packed=packed_sds)
        else:
            prime(f"vocoder ref NB={nb}", voc_mod._vocode_window,
                  bv_sds, engine.bigvgan_cfg, lat, spk)

    # the production serving path (infer_fast/infer_batch/bench): windows
    # gathered on device from the (rows, MB, C) latent tensor by the tiny
    # _gather_windows jit (keys on (rows, MB, NB) but compiles in ~1 s), then
    # vocoded by the NB-keyed window programs primed above — the expensive
    # program matrix no longer multiplies by rows×MB.
    print("priming stream gather programs (tiny)...", flush=True)
    rows_buckets = (4, 16) if not args.all else (1, 2, 4, 8, 16, 32)
    for rows in rows_buckets:
        for cb in code_buckets:
            cb = min(cb, cfg.max_mel_tokens)
            lat = jax.ShapeDtypeStruct((rows, cb, engine.bigvgan_cfg.gpt_dim),
                                       voc.compute_dtype)
            for nb in voc.WINDOW_COUNT_BUCKETS:
                idx = jax.ShapeDtypeStruct((nb, full), np.int32)
                prime(f"gather rows={rows} code={cb} NB={nb}",
                      voc_mod._gather_windows, lat, idx)

    print(f"primed {done} programs in {time.perf_counter()-t_all:.0f}s")


if __name__ == "__main__":
    main()

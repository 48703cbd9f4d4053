"""Measure the infer_fast speedup over infer on a long multi-sentence text.

The reference claims its batched path is "at least 2~10x" faster than the
sequential path on long multi-sentence texts
(/root/reference/indextts/infer.py:277, IndexTTS_infer.md:104) but never
publishes a number. This measures OURS on chip, on the bench workload (16
sentences x 48 tokens, 192 mel codes each, the reference's num_beams=3
quality default), both through public surfaces:

  infer       — sequential per-sentence decode (reference infer semantics)
  infer_fast  — fused one-program batch (bench.py headline path)

Prints both walls and the ratio. First run pays compiles for the B=1
decode bucket (not in the bench seed snapshot); timing is taken on warm
runs with identical sampling keys.

Usage: python tools/bench_infer_vs_fast.py [n_sents] [n_text] [steps] [nb]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from index_tts_dubbing_tpu.utils.config import EngineConfig

    n_sents = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_text = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    nb = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    engine = IndexTTS(config=EngineConfig(), is_fp16=True,
                      verbose_init=False, seed=0)
    sr = engine.cfg.mel.sample_rate
    rng = np.random.default_rng(0)
    cond_mel = rng.standard_normal((1, 100, 470)).astype(np.float32)
    engine.set_cond_mel(cond_mel)
    letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    text = " ".join(
        "".join(rng.choice(list(letters), size=n_text - 1)) + "."
        for _ in range(n_sents))
    kw = dict(do_sample=True, num_beams=nb, max_mel_tokens=steps,
              max_text_tokens_per_sentence=n_text)

    with jax.default_device(jax.devices("cpu")[0]):
        key0 = jax.random.PRNGKey(0)

    def run(fn):
        engine._rng = key0
        t0 = time.perf_counter()
        _, wav = fn("<direct>", text, None, **kw)
        return time.perf_counter() - t0, wav.shape[0] / sr

    for label, fn in (("infer_fast", engine.infer_fast),
                      ("infer", engine.infer)):
        t_cold, _ = run(fn)
        t_warm, audio = run(fn)
        print(f"{label:10s} warm {t_warm:6.2f}s  {audio:.1f}s-audio  "
              f"RTF {t_warm / audio:.4f}  (cold {t_cold:.0f}s)")
        if label == "infer_fast":
            fast = t_warm
        else:
            print(f"infer_fast speedup over infer: {t_warm / fast:.1f}x "
                  f"(reference claims 'at least 2~10x' for its GPU batched "
                  f"path)")


if __name__ == "__main__":
    main()

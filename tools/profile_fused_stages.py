"""Stage-split profile of the fused synthesis graph at the bench shape.

The fused one-program graph hides its internal stage walls (one XLA
program). This tool recovers them by timing three nested programs on-chip
at the bench workload (B=16 x 48-token rows, 192 steps, bf16):

  decode       = prefix + AR decode only (engine/decode.py)
  lat          = synthesize_fused_lat (decode + trim + latent)
  full         = synthesize_fused     (decode + trim + latent + vocode)

  trim+latent ~= lat - decode;  vocode ~= full - lat

Usage: python tools/profile_fused_stages.py [batch] [steps] [num_beams]
                                            [window]
Defaults: 16 192 3 112 (the quality-default bench shape). r04 verdict #2:
the ~1.8 s trim/latent/vocode tail is the quality path's largest stage —
this tool says which slice to attack. ``window`` overrides the vocoder
window size (halo overhead = 2·16/(window+32) of computed frames).
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
    from index_tts_dubbing_tpu.engine import fused as fused_mod
    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from index_tts_dubbing_tpu.utils.config import EngineConfig

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    window = int(sys.argv[4]) if len(sys.argv) > 4 else 112
    n_text = 48

    eng = IndexTTS(config=EngineConfig(), is_fp16=True, verbose_init=False,
                   vocoder_window=window)
    rng = np.random.default_rng(0)
    cond_mel = rng.standard_normal((1, 100, 470)).astype(np.float32)
    eng.set_cond_mel(cond_mel)
    conds = eng._conditioning(cond_mel)
    spk = eng.vocoder.speaker_embedding(
        jnp.asarray(cond_mel.transpose(0, 2, 1)))
    sc = eng._sampling_config(dict(do_sample=True, num_beams=nb,
                                   max_mel_tokens=steps))
    rows = [rng.integers(2, 12000, size=n_text).astype(np.int32)
            for _ in range(batch)]
    live = np.ones(batch, bool)
    pre = decode_mod.prepare_prefix_host(eng.gpt_cfg, rows, pad_to=n_text)
    text = np.stack(rows).astype(np.int32)
    tlens = np.full(batch, n_text, np.int64)
    with jax.default_device(jax.devices("cpu")[0]):
        key = jax.random.PRNGKey(0)

    def decode_only():
        emb, keep = decode_mod.build_prefix_emb(
            eng.params["gpt"], eng.gpt_cfg, conds, jnp.asarray(pre["ids"]),
            jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
            jnp.asarray(pre["cond_idx"]))
        if nb > 1:
            res = decode_mod._beam_decode(
                eng.params["gpt"], eng.gpt_cfg, sc, emb, keep, key, nb, 0.0,
                stochastic=True, live=jnp.asarray(live))
        else:
            res = decode_mod.generate(eng.params["gpt"], eng.gpt_cfg, sc,
                                      emb, keep, key, live=jnp.asarray(live))
        return np.asarray(res.codes)

    def lat_only():
        res = fused_mod.synthesize_fused_lat(
            eng.params["gpt"], eng.gpt_cfg, sc, conds,
            jnp.asarray(pre["ids"]), jnp.asarray(pre["pos"]),
            jnp.asarray(pre["seg"]), jnp.asarray(pre["cond_idx"]),
            jnp.asarray(text), jnp.asarray(tlens), key, 0.0,
            jnp.asarray(live), num_beams=nb)
        return np.asarray(res.lat)

    def full():
        eng._rng = key
        eng._num_beams = nb
        wav, res = eng.synthesize_fused(conds, rows, sc, spk, live=live)
        return wav

    for name, fn in (("decode", decode_only), ("lat", lat_only),
                     ("full", full)):
        t0 = time.perf_counter()
        fn()
        cold = time.perf_counter() - t0
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        warm = min(times)
        print(f"{name:7s}: warm {warm:6.2f}s (cold {cold:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

"""Weight-only int8 quantization: reconstruction accuracy and end-to-end
engine operation."""
import numpy as np
import pytest

from index_tts_dubbing_tpu.utils.quant import (quantize_gpt_int8,
                                               quantize_linear_int8)


def test_linear_int8_reconstruction():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.3
    q = quantize_linear_int8({"w": w, "b": np.zeros(128, np.float32)})
    assert q["w_q"].dtype == np.int8
    recon = q["w_q"].astype(np.float32) * q["scale"][None, :]
    err = np.abs(recon - w).max() / np.abs(w).max()
    assert err < 0.01
    # idempotent
    assert quantize_linear_int8(q) is q


def test_nn_linear_accepts_quantized():
    import jax.numpy as jnp
    from index_tts_dubbing_tpu import nn
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 48)).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    y_full = np.asarray(nn.linear({"w": w, "b": b}, x))
    y_q = np.asarray(nn.linear(quantize_linear_int8({"w": w, "b": b}), x))
    rel = np.abs(y_q - y_full).max() / (np.abs(y_full).max() + 1e-9)
    assert rel < 0.02


def test_engine_int8_end_to_end(tmp_path):
    import sys
    sys.path.insert(0, ".")
    from tests.test_engine import small_config, _prompt_wav
    from index_tts_dubbing_tpu.engine.tts import IndexTTS

    p = _prompt_wav(tmp_path)
    full = IndexTTS(config=small_config(), verbose_init=False)
    quant = IndexTTS(config=small_config(), verbose_init=False,
                     quantize="int8")
    sr_f, w_f = full.infer(str(p), "ab cd ef.", None, max_mel_tokens=12,
                           do_sample=False)
    sr_q, w_q = quant.infer(str(p), "ab cd ef.", None, max_mel_tokens=12,
                            do_sample=False)
    assert sr_q == sr_f
    assert w_q.shape[0] > 0
    # greedy decode survives weight-only int8 at small scale: same length
    # and strongly correlated audio
    if w_q.shape == w_f.shape:
        a = w_f.astype(np.float32).ravel()
        b = w_q.astype(np.float32).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-9
        assert float(a @ b) / denom > 0.9


def test_int8_fused_matches_staged(tmp_path):
    """quantize='int8' composed with the fused one-program graph (r04
    verdict #5): the fused route must produce the staged pipeline's exact
    codes and allclose waveform under the same key, and the public
    infer_fast surface must still ride the fused path under int8."""
    import sys
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from tests.test_engine import small_config, _prompt_wav
    from index_tts_dubbing_tpu.engine.tts import (IndexTTS,
                                                  remove_long_silence)

    rng = np.random.default_rng(3)
    eng = IndexTTS(config=small_config(), verbose_init=False,
                   quantize="int8")
    cond_mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    eng.set_cond_mel(cond_mel, key="<int8-fused>")
    conds = eng._conditioning(cond_mel)
    spk = eng.vocoder.speaker_embedding(
        jnp.asarray(cond_mel.transpose(0, 2, 1)))
    rows = [rng.integers(2, 100, size=n).astype(np.int32)
            for n in (7, 5, 9)]
    sc = eng._sampling_config(dict(num_beams=1, do_sample=True,
                                   max_mel_tokens=20))

    eng._rng = jax.random.PRNGKey(4)
    codes, _ = eng._decode_batch(conds, rows, sc)
    lat_rows = []
    for i in range(len(rows)):
        rc, rl = remove_long_silence(codes[i:i + 1], eng.stop_mel_token)
        lat_rows.append((rows[i], rc[0], int(rl[0])))
    lat_dev, lens, inv = eng._latents_batch_device(conds, lat_rows)
    wav_staged = eng.vocoder.stream_device(
        lat_dev, lens, order=inv[np.arange(len(rows))], spk=spk)

    eng._rng = jax.random.PRNGKey(4)
    wav_fused, res = eng.synthesize_fused(conds, rows, sc, spk)
    np.testing.assert_array_equal(np.asarray(res.codes), codes)
    np.testing.assert_allclose(wav_fused, wav_staged, atol=2e-3)

    # public surface still routes fused under int8
    p = _prompt_wav(tmp_path)
    sr, wav = eng.infer_fast(str(p), "ab ab. cd cd.", None,
                             max_mel_tokens=12, do_sample=False,
                             num_beams=1)
    assert eng.last_path == "fused"
    assert wav.shape[0] > 0


def test_unknown_quantize_mode_rejected():
    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    import sys
    sys.path.insert(0, ".")
    from tests.test_engine import small_config
    with pytest.raises(ValueError):
        IndexTTS(config=small_config(), verbose_init=False, quantize="fp4")

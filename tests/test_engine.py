"""End-to-end engine tests on a small random-weight model: infer/infer_fast
produce audio; latent bucketing is numerically exact; silence removal and
bucketing match the reference algorithms."""
import dataclasses

import jax
import numpy as np
import pytest

from index_tts_dubbing_tpu.engine.tts import (
    IndexTTS, bucket_sentences, remove_long_silence)
from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig
from index_tts_dubbing_tpu.models.gpt import GPTConfig
from index_tts_dubbing_tpu.utils.config import EngineConfig, MelConfig


def small_config():
    gpt = GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=60,
                    max_text_tokens=50, number_text_tokens=120,
                    cond_output_size=32, cond_linear_units=64,
                    cond_attention_heads=4, cond_num_blocks=2)
    bv = BigVGANConfig(gpt_dim=64, upsample_initial_channel=128)
    return EngineConfig(mel=MelConfig(), gpt=gpt, bigvgan=bv)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    eng = IndexTTS(config=small_config(), verbose_init=False)
    return eng


def _prompt_wav(tmp_path):
    from index_tts_dubbing_tpu.utils.audio import write_wav
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    p = tmp_path / "prompt.wav"
    write_wav(p, wav, 24000)
    return p


def test_remove_long_silence():
    codes = np.array([[5, 8193, 7, 7]])
    out, lens = remove_long_silence(codes)
    assert lens[0] == 1 and out.shape[1] == 1
    row = np.concatenate([np.full(40, 52), [9], np.full(5, 52), [8193]])
    out, lens = remove_long_silence(row[None, :])
    # 40 x silence capped at 10, then 9, then 5 silence kept
    assert lens[0] == 10 + 1 + 5


def test_bucket_sentences():
    sents = ["a" * n for n in (5, 6, 7, 30, 31, 2, 3, 40)]
    buckets = bucket_sentences(sents, bucket_max_size=4)
    all_idx = sorted(i["idx"] for b in buckets for i in b)
    assert all_idx == list(range(len(sents)))
    for b in buckets:
        assert 1 <= len(b) <= 4


def test_pad_tokens_cat_version_styles():
    """pad_tokens_cat reproduces both version-keyed padding styles
    (reference infer.py:245-262), and both styles collapse to IDENTICAL
    decode prefixes through prepare_prefix_host — the reference strips all
    start/stop text tokens per row before re-framing (model.py:616-619), so
    cfg.version is a surface-layout switch, not a numeric one."""
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.engine.tts import pad_tokens_cat
    cfg = small_config().gpt
    rows = [np.arange(2, 12, dtype=np.int32),
            np.arange(2, 5, dtype=np.int32),
            np.arange(2, 20, dtype=np.int32)]
    v15 = pad_tokens_cat(rows, cfg.stop_text_token, cfg.start_text_token,
                         version=1.5)
    v10 = pad_tokens_cat(rows, cfg.stop_text_token, cfg.start_text_token,
                         version=1.0)
    # style check: v1.5 right-pads with stop only; v1.0 pads ≤8 stops then
    # starts (row 1: 15 pad slots → 8 stop + 7 start)
    assert (v15[1, 3:] == cfg.stop_text_token).all()
    assert (v10[1, 3:11] == cfg.stop_text_token).all()
    assert (v10[1, 11:] == cfg.start_text_token).all()
    pre15 = decode_mod.prepare_prefix_host(cfg, list(v15))
    pre10 = decode_mod.prepare_prefix_host(cfg, list(v10))
    pre_raw = decode_mod.prepare_prefix_host(cfg, rows)
    for k in pre_raw:
        np.testing.assert_array_equal(pre15[k], pre10[k])
        np.testing.assert_array_equal(pre15[k], pre_raw[k])


def test_infer_e2e(engine, tmp_path):
    p = _prompt_wav(tmp_path)
    out = tmp_path / "out.wav"
    res = engine.infer(str(p), "ab ab ab.", str(out),
                       max_mel_tokens=16, do_sample=False)
    assert res == str(out)
    from index_tts_dubbing_tpu.utils.audio import read_wav
    wav, sr = read_wav(out)
    assert sr == 24000
    assert wav.shape[1] > 0
    assert engine.last_times.audio_seconds > 0


def test_infer_fast_e2e(engine, tmp_path):
    p = _prompt_wav(tmp_path)
    sr, wav = engine.infer_fast(str(p), "ab ab. cd cd. ef ef.", None,
                                max_mel_tokens=16, do_sample=False)
    assert sr == 24000 and wav.size > 0


def test_latent_bucketing_exact(engine, rng):
    """forward_latent_bucketed with padded buckets == exact-shape
    forward_latent on the valid region."""
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.models import gpt as jgpt
    cfg = engine.gpt_cfg
    params = engine.params["gpt"]
    conds = jnp.asarray(rng.standard_normal((1, 32, 64)).astype(np.float32))
    text = rng.integers(2, 100, size=(1, 9)).astype(np.int32)
    codes = rng.integers(0, 8192, size=(1, 14)).astype(np.int32)
    exact = np.asarray(jgpt.forward_latent(
        params, cfg, conds, text, np.array([9]), codes, np.array([12])))
    # padded: text→16, codes→24
    tp = np.full((1, 16), cfg.stop_text_token, np.int32)
    tp[0, :9] = text[0]
    cp = np.full((1, 24), cfg.stop_mel_token, np.int32)
    cp[0, :14] = codes[0]
    bucketed = np.asarray(jgpt.forward_latent_bucketed(
        params, cfg, conds, tp, np.array([9]), cp, np.array([12])))
    np.testing.assert_allclose(bucketed[0, :12], exact[0, :12],
                               atol=2e-5, rtol=1e-4)


def test_remove_long_silence_device_parity(rng):
    """Jittable silence trim ≡ the host implementation on random rows."""
    from index_tts_dubbing_tpu.engine.tts import (
        remove_long_silence, remove_long_silence_device)

    stop, silent = 8193, 52
    for trial in range(6):
        b, s = 3, 64
        codes = rng.integers(0, 8192, size=(b, s)).astype(np.int32)
        # inject silent runs and stops
        codes[0, 5:45] = silent                       # long run → trimmed
        codes[0, 50] = stop
        codes[1, 10] = stop                           # short row
        codes[2, ::3] = silent                        # scattered silents
        if trial % 2:
            codes[2, 60] = stop
        want, want_lens = remove_long_silence(codes, stop)
        got, got_lens = remove_long_silence_device(codes, stop)
        got = np.asarray(got)
        np.testing.assert_array_equal(np.asarray(got_lens), want_lens)
        for i in range(b):
            n = int(want_lens[i])
            np.testing.assert_array_equal(got[i, :n], want[i, :n])
            assert (got[i, n:] == stop).all()


def test_gr_progress_driven(engine, tmp_path):
    """The webui progress hook is called at every stage boundary, ending at
    0.9 'save audio' (parity: infer.py:273-275 with calls at 502-633)."""
    p = _prompt_wav(tmp_path)
    for method in ("infer", "infer_fast"):
        calls = []
        engine.gr_progress = lambda v, desc="": calls.append((v, desc))
        try:
            getattr(engine, method)(str(p), "ab ab. cd cd.", None,
                                    max_mel_tokens=16, do_sample=False)
        finally:
            engine.gr_progress = None
        values = [v for v, _ in calls]
        assert values[0] == 0 and values[-1] == 0.9, (method, calls)
        assert values == sorted(values), (method, calls)
        assert any("text processing" in d for _, d in calls)
        assert any("speech" in d for _, d in calls)


def test_generate_live_mask_pads_are_free(engine, rng):
    """Batch-padding rows marked dead via ``live`` emit stop at step 0
    (length 0) and leave live rows' tokens untouched (mesh batch padding,
    r03 weak #7: padding used to duplicate a real row's full decode)."""
    import jax
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    cfg = engine.gpt_cfg
    params = engine.params["gpt"]
    rows = [rng.integers(2, 100, size=n).astype(np.int32) for n in (6, 9)]
    conds = jnp.asarray(rng.standard_normal(
        (1, cfg.condition_num_latent, cfg.model_dim)).astype(np.float32))
    sc = decode_mod.SamplingConfig(do_sample=False, max_mel_tokens=10)
    key = jax.random.PRNGKey(0)

    def run(token_rows, live):
        pre = decode_mod.prepare_prefix_host(cfg, token_rows, pad_to=16)
        emb, keep = decode_mod.build_prefix_emb(
            params, cfg, conds, pre["ids"], pre["pos"], pre["seg"],
            pre["cond_idx"])
        return decode_mod.generate(params, cfg, sc, emb, keep, key,
                                   live=live)

    ref = run(rows, None)
    padded = rows + [np.array([2], np.int32)] * 2
    out = run(padded, jnp.asarray([True, True, False, False]))
    np.testing.assert_array_equal(np.asarray(out.codes)[:2],
                                  np.asarray(ref.codes))
    assert (np.asarray(out.lengths)[2:] == 0).all()
    # beam path: dead rows freeze, live rows match the unpadded call
    bref = decode_mod.generate_beam(params, cfg, sc,
                                    *_prefix(params, cfg, conds, rows),
                                    num_beams=2)
    bout = decode_mod.generate_beam(
        params, cfg, sc, *_prefix(params, cfg, conds, padded), num_beams=2,
        live=jnp.asarray([True, True, False, False]))
    np.testing.assert_array_equal(np.asarray(bout.codes)[:2],
                                  np.asarray(bref.codes))


def _prefix(params, cfg, conds, rows):
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    pre = decode_mod.prepare_prefix_host(cfg, rows, pad_to=16)
    return decode_mod.build_prefix_emb(params, cfg, conds, pre["ids"],
                                       pre["pos"], pre["seg"],
                                       pre["cond_idx"])


def test_infer_fast_routes_through_fused(engine, tmp_path):
    """The public infer_fast surface rides the fused one-program path on
    eligible workloads, and its audio equals a direct synthesize_fused call
    on the same rows (r03 verdict item 1: the measured-best path must be
    reachable through the public API)."""
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine.decode import SamplingConfig
    p = _prompt_wav(tmp_path)
    text = "ab ab. cd cd."
    sr, wav = engine.infer_fast(str(p), text, None, max_mel_tokens=16,
                                do_sample=False, num_beams=1)
    assert engine.last_path == "fused"
    # same rows through the direct fused entry
    tokens = engine.tokenizer.tokenize(text)
    sents = engine.tokenizer.split_sentences(tokens, 100)
    rows = [np.asarray(engine.tokenizer.convert_tokens_to_ids(s), np.int32)
            for s in sents]
    assert engine._fused_eligible(rows)
    cond_mel = engine._cond_mel(str(p))
    conds = engine._conditioning(cond_mel)
    spk = engine.vocoder.speaker_embedding(
        jnp.asarray(cond_mel.transpose(0, 2, 1)))
    sc = SamplingConfig(do_sample=False, max_mel_tokens=16)
    engine._num_beams = 1
    wav_direct, lens = engine._synthesize_fused_public(conds, rows, sc, spk)
    if wav_direct.dtype != np.int16:   # fused+stream flavor emits fp32
        wav_direct = np.clip(wav_direct * 32767.0, -32767.0,
                             32767.0).astype(np.int16)
    np.testing.assert_array_equal(wav[:, 0], wav_direct)
    # heterogeneous text buckets are ELIGIBLE since r05 (served by padding
    # all rows to the batch's max bucket — padding-invariance contract);
    # rows beyond the model's text budget still fall back
    mixed_rows = [np.arange(2, 4, dtype=np.int32),
                  np.arange(2, 40, dtype=np.int32)]
    assert engine._fused_eligible(mixed_rows)
    too_long = [np.arange(2, 2 + engine.gpt_cfg.max_text_tokens + 1,
                          dtype=np.int32)]
    assert not engine._fused_eligible(too_long)


def test_fused_mixed_buckets_match_uniform(engine, tmp_path):
    """Mixed-length rows through the fused public path (padded to the max
    TEXT bucket, batch padded to a FUSED_BATCH_BUCKET with DEAD rows via the
    live mask) must produce exactly the audio of the same rows run WITHOUT
    any padding: left-pad is attention-masked, dead rows stop at step 0 and
    contribute zero stream frames (greedy decode is batch-size invariant)."""
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine.decode import SamplingConfig
    p = _prompt_wav(tmp_path)
    cond_mel = engine._cond_mel(str(p))
    conds = engine._conditioning(cond_mel)
    spk = engine.vocoder.speaker_embedding(
        jnp.asarray(cond_mel.transpose(0, 2, 1)))
    sc = SamplingConfig(do_sample=False, max_mel_tokens=16)
    engine._num_beams = 1
    # 3 rows spanning text buckets 16 and 32 → batch bucket pads 3 → 4
    rows = [np.arange(2, 12, dtype=np.int32),
            np.arange(2, 30, dtype=np.int32),
            np.arange(2, 8, dtype=np.int32)]
    assert engine._fused_eligible(rows)
    wav_pub, lens_pub = engine._synthesize_fused_public(conds, rows, sc, spk)
    assert lens_pub.size == 3
    # reference: the same rows as an exact batch (no pad rows), all rows
    # already padded to the common text bucket by synthesize_fused itself
    wav_ref, res = engine.synthesize_fused(conds, rows, sc, spk)
    lens_ref = np.asarray(res.lens)
    np.testing.assert_array_equal(lens_pub, lens_ref)
    n = int(lens_ref.sum()) * engine.vocoder.upsample
    # public path emits int16 (device-side clip(wav*32767)); the direct
    # fp32 reference maps through the same scaling within 1 count
    if wav_pub.dtype == np.int16:
        ref_i16 = np.clip(wav_ref[:n] * 32767.0, -32767.0,
                          32767.0).astype(np.int16)
        np.testing.assert_allclose(wav_pub[:n].astype(np.int32),
                                   ref_i16.astype(np.int32), atol=1)
    else:
        np.testing.assert_allclose(wav_pub[:n], wav_ref[:n], atol=1e-5)
    # beam search (deterministic) over the same mixed batch also routes and
    # survives the dead-row freeze
    engine._num_beams = 2
    wav_beam, lens_beam = engine._synthesize_fused_public(conds, rows, sc,
                                                          spk)
    assert lens_beam.size == 3 and wav_beam.size > 0
    engine._num_beams = 1


def test_fused_stream_hybrid_matches_full(engine, tmp_path, monkeypatch):
    """Above FUSED_FULL_VOCODE_MAX_STEPS the fused route switches to the
    window-exact streamed vocode (fused decode→trim→latent program +
    stream_device); audio must equal the full one-program route exactly
    (greedy) — the hybrid exists so loose decode caps don't pay the static
    worst-case window plan."""
    p = _prompt_wav(tmp_path)
    text = "ab ab. cd cd."
    kw = dict(max_mel_tokens=16, do_sample=False, num_beams=1)
    sr, wav_full = engine.infer_fast(str(p), text, None, **kw)
    assert engine.last_path == "fused"
    monkeypatch.setattr(type(engine), "FUSED_FULL_VOCODE_MAX_STEPS", 8)
    sr2, wav_stream = engine.infer_fast(str(p), text, None, **kw)
    assert engine.last_path == "fused"
    np.testing.assert_array_equal(wav_full, wav_stream)


def test_synthesize_fused_matches_staged(engine, rng):
    """The one-program fused synthesis graph (engine/fused.py) must produce
    the same codes and (allclose) waveform as the staged pipeline under the
    same sampling key."""
    import jax
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine.tts import remove_long_silence

    cond_mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    engine.set_cond_mel(cond_mel, key="<fused-test>")
    conds = engine._conditioning(cond_mel)
    spk = engine.vocoder.speaker_embedding(
        jnp.asarray(cond_mel.transpose(0, 2, 1)))
    rows = [rng.integers(2, 100, size=n).astype(np.int32)
            for n in (7, 5, 9, 6)]
    sc = engine._sampling_config(dict(num_beams=1, do_sample=True,
                                      max_mel_tokens=24))

    # staged path
    engine._rng = jax.random.PRNGKey(5)
    codes, _ = engine._decode_batch(conds, rows, sc)
    lat_rows = []
    for i in range(len(rows)):
        rc, rl = remove_long_silence(codes[i:i + 1], engine.stop_mel_token)
        lat_rows.append((rows[i], rc[0], int(rl[0])))
    lat_dev, lens, inv = engine._latents_batch_device(conds, lat_rows)
    wav_staged = engine.vocoder.stream_device(
        lat_dev, lens, order=inv[np.arange(len(rows))], spk=spk)

    # fused path, same key
    engine._rng = jax.random.PRNGKey(5)
    wav_fused, res = engine.synthesize_fused(conds, rows, sc, spk)

    np.testing.assert_array_equal(np.asarray(res.codes), codes)
    np.testing.assert_array_equal(np.asarray(res.lens), lens[inv])
    assert wav_fused.shape == wav_staged.shape
    # ref-layout staged vs cmajor-XLA fused: same taps, conv reassociation
    np.testing.assert_allclose(wav_fused, wav_staged, atol=2e-3)


def test_synthesize_fused_long_stream(engine, rng):
    """Fused graph over a multi-window stream (t >= window + 2*halo)."""
    import jax
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine.tts import remove_long_silence

    cond_mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    engine.set_cond_mel(cond_mel, key="<fused-long>")
    conds = engine._conditioning(cond_mel)
    spk = engine.vocoder.speaker_embedding(
        jnp.asarray(cond_mel.transpose(0, 2, 1)))
    rows = [rng.integers(2, 100, size=n).astype(np.int32)
            for n in (7, 5, 9, 6, 8, 4)]
    sc = engine._sampling_config(dict(num_beams=1, do_sample=True,
                                      max_mel_tokens=40))

    engine._rng = jax.random.PRNGKey(9)
    codes, _ = engine._decode_batch(conds, rows, sc)
    lat_rows = []
    for i in range(len(rows)):
        rc, rl = remove_long_silence(codes[i:i + 1], engine.stop_mel_token)
        lat_rows.append((rows[i], rc[0], int(rl[0])))
    lat_dev, lens, inv = engine._latents_batch_device(conds, lat_rows)
    wav_staged = engine.vocoder.stream_device(
        lat_dev, lens, order=inv[np.arange(len(rows))], spk=spk)

    engine._rng = jax.random.PRNGKey(9)
    wav_fused, res = engine.synthesize_fused(conds, rows, sc, spk)
    t = int(res.stream_frames)
    assert t >= engine.vocoder.window + 2 * engine.vocoder.halo, \
        "workload too short to exercise the windowed fused path"
    np.testing.assert_array_equal(np.asarray(res.codes), codes)
    assert wav_fused.shape == wav_staged.shape
    np.testing.assert_allclose(wav_fused, wav_staged, atol=2e-3)


def test_synthesize_fused_beam(engine, rng):
    """Fused graph with the num_beams=3 quality default: codes must equal
    the staged beam decode under the same key."""
    import jax
    import jax.numpy as jnp

    cond_mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    engine.set_cond_mel(cond_mel, key="<fused-beam>")
    conds = engine._conditioning(cond_mel)
    spk = engine.vocoder.speaker_embedding(
        jnp.asarray(cond_mel.transpose(0, 2, 1)))
    rows = [rng.integers(2, 100, size=n).astype(np.int32) for n in (7, 5)]
    sc = engine._sampling_config(dict(num_beams=3, do_sample=True,
                                      max_mel_tokens=16))
    assert engine._num_beams == 3

    engine._rng = jax.random.PRNGKey(11)
    codes, lens = engine._decode_batch(conds, rows, sc)

    engine._rng = jax.random.PRNGKey(11)
    wav, res = engine.synthesize_fused(conds, rows, sc, spk)
    got = np.asarray(res.codes)
    np.testing.assert_array_equal(got[:, :codes.shape[1]], codes)
    assert (got[:, codes.shape[1]:] == engine.stop_mel_token).all()
    assert wav.size == int(res.stream_frames) * engine.vocoder.upsample

"""Eval metrics: WER normalisation/edit distance and ECAPA speaker
similarity."""
import numpy as np
import pytest

from index_tts_dubbing_tpu.eval.wer import edit_distance, normalize_for_wer, wer


def test_normalize_mixed():
    assert normalize_for_wer("Hello, World!") == ["hello", "world"]
    assert normalize_for_wer("你好world") == ["你", "好", "world"]
    assert normalize_for_wer("大家好，我是Alice。") == [
        "大", "家", "好", "我", "是", "alice"]
    assert normalize_for_wer("  ") == []


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("abc"), list("axc")) == 1
    assert edit_distance(list("abc"), list("ab")) == 1
    assert edit_distance(list("abc"), list("xabc")) == 1
    assert edit_distance(list("kitten"), list("sitting")) == 3


def test_wer_values():
    assert wer("hello world", "hello world") == 0.0
    assert wer("hello world", "hello word") == pytest.approx(0.5)
    assert wer("你好世界", "你好市界") == pytest.approx(0.25)
    assert wer("", "") == 0.0
    assert wer("", "x y") == 2.0


def test_speaker_similarity_orders_speakers():
    import jax
    from index_tts_dubbing_tpu.eval.speaker_sim import (
        make_ecapa_embedder, speaker_similarity)
    from index_tts_dubbing_tpu.models import ecapa
    from index_tts_dubbing_tpu.ops.mel import MelSpectrogram

    params = ecapa.init(jax.random.PRNGKey(0), input_size=100,
                        lin_neurons=64)
    mel_fn = MelSpectrogram()
    embed = make_ecapa_embedder(params, mel_fn)
    rng = np.random.default_rng(0)
    t = np.arange(24000) / 24000.0
    # same "speaker" = same spectral envelope, different utterance noise
    spk_a1 = (np.sin(2 * np.pi * 220 * t)
              + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    spk_a2 = (np.sin(2 * np.pi * 220 * t + 1.0)
              + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    spk_b = (np.sign(np.sin(2 * np.pi * 700 * t))
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    same = speaker_similarity(spk_a1, 24000, spk_a2, 24000, embed)
    diff = speaker_similarity(spk_a1, 24000, spk_b, 24000, embed)
    assert -1.0 <= diff <= 1.0 and -1.0 <= same <= 1.0
    assert same > diff


def test_beam_gate_flip_stats():
    """tools/tpu_beam_gate.flip_stats: AR-aware per-step flip accounting
    (tokens after the first divergence are cascade, not flips)."""
    import numpy as np
    from tools.tpu_beam_gate import flip_stats
    oracle = np.array([[1, 2, 3, 4], [5, 6, 7, 8], [9, 9, 9, 9]])
    olen = np.array([4, 4, 3])
    # row 0 identical; row 1 diverges at step 1; row 2 identical but its
    # length differs (counts as a flip at the common length)
    other = np.array([[1, 2, 3, 4], [5, 0, 0, 0], [9, 9, 9, 0]])
    olen2 = np.array([4, 4, 2])
    flips, steps = flip_stats(oracle, olen, other, olen2)
    assert flips == 2
    # row 0 contributes 4 identical steps, row 1 contributes 1 (divergence
    # at index 1), row 2 contributes min(3,2)=2 identical steps
    assert steps == 4 + 1 + 2

"""Batched multi-utterance synthesis (infer_batch) and its dubbing hookup."""
import numpy as np
import pytest

from index_tts_dubbing_tpu.engine.tts import IndexTTS
from tests.test_engine import small_config, _prompt_wav


@pytest.fixture(scope="module")
def engine():
    return IndexTTS(config=small_config(), verbose_init=False)


def test_infer_batch(engine, tmp_path):
    p = _prompt_wav(tmp_path)
    outs = engine.infer_batch(str(p), ["ab ab.", "cd cd cd.", "e."],
                              max_mel_tokens=12, do_sample=False)
    assert len(outs) == 3
    for sr, wav in outs:
        assert sr == 24000
        assert wav.ndim == 2 and wav.shape[0] > 0


def test_infer_batch_mixed_lengths_ride_fused(engine, tmp_path):
    """Texts whose sentences span DIFFERENT text buckets route through the
    fused one-program path since r05 (padded to the batch's max bucket,
    batch-bucket pad rows dead via the live mask) — and each text gets its
    own non-empty stream slice back in order."""
    p = _prompt_wav(tmp_path)
    texts = ["ab ab.", "cd " * 14 + "cd.", "e e."]   # buckets span 16/32
    outs = engine.infer_batch(str(p), texts, max_mel_tokens=12,
                              do_sample=False, num_beams=1)
    assert engine.last_path == "fused"
    assert len(outs) == 3
    for sr, wav in outs:
        assert sr == 24000 and wav.dtype == np.int16 and wav.shape[0] > 0


def test_batched_strategy_uses_batch(engine, tmp_path):
    from index_tts_dubbing_tpu.dubbing.engines.index_tts import IndexTTSEngine
    from index_tts_dubbing_tpu.dubbing.srt_parser import SRTParser
    from index_tts_dubbing_tpu.dubbing.strategies import get_strategy

    p = _prompt_wav(tmp_path)
    eng = IndexTTSEngine(engine=engine)
    entries = SRTParser().parse_content(
        "1\n00:00:00,000 --> 00:00:01,000\nab ab.\n\n"
        "2\n00:00:01,000 --> 00:00:02,000\ncd cd.\n")
    strat = get_strategy("basic", eng)
    segs = strat.process_entries(entries, voice_reference=str(p),
                                 max_mel_tokens=12, do_sample=False)
    assert len(segs) == 2
    assert all(s["audio_data"].size > 0 for s in segs)

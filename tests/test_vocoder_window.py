"""Windowed vocoder must equal the exact full-sequence BigVGAN forward."""
import jax
import numpy as np

from index_tts_dubbing_tpu.engine.vocoder import WindowedVocoder
from index_tts_dubbing_tpu.models import bigvgan


def test_windowed_equals_exact(rng):
    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=128, gpt_dim=16,
                                speaker_embedding_dim=512)
    params = bigvgan.init(jax.random.PRNGKey(7), cfg)
    t = 57
    latent = rng.standard_normal((1, t, 16)).astype(np.float32) * 0.3
    mel_ref = rng.standard_normal((1, 50, 100)).astype(np.float32)

    exact = np.asarray(bigvgan.forward(params, cfg, latent, mel_ref))[0]
    voc = WindowedVocoder(params, cfg, window=16, halo=32)
    got = voc(latent[0], mel_ref)
    assert got.shape == exact.shape
    np.testing.assert_allclose(got, exact, atol=2e-5)


def test_windowed_short_input(rng):
    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=128, gpt_dim=16)
    params = bigvgan.init(jax.random.PRNGKey(7), cfg)
    latent = rng.standard_normal((4, 16)).astype(np.float32)
    mel_ref = rng.standard_normal((1, 50, 100)).astype(np.float32)
    exact = np.asarray(bigvgan.forward(params, cfg, latent[None], mel_ref))[0]
    voc = WindowedVocoder(params, cfg, window=64, halo=32)
    got = voc(latent, mel_ref)
    np.testing.assert_allclose(got, exact, atol=2e-5)

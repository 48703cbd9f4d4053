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


def test_cmajor_window_matches_ref_layout(rng):
    """_vocode_window_cmajor (XLA fallback, no Pallas) vs the
    reference-structured window path: same taps/order, same outputs."""
    from index_tts_dubbing_tpu.engine import vocoder as voc

    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=128, gpt_dim=16,
                                speaker_embedding_dim=512)
    params = bigvgan.init(jax.random.PRNGKey(7), cfg)
    latent = rng.standard_normal((2, 24, 16)).astype(np.float32) * 0.3
    mel_ref = rng.standard_normal((1, 50, 100)).astype(np.float32)
    spk = voc.speaker_embedding(params, mel_ref)

    ref = np.asarray(voc._vocode_window(params, cfg, latent, spk))
    got = np.asarray(voc._vocode_window_cmajor(params, cfg, latent, spk,
                                               use_pallas=False))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_cmajor_driver_matches_ref_driver(rng):
    """WindowedVocoder(layout='cmajor', use_pallas=False) vs layout='ref'
    end-to-end over a multi-window stream."""
    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=128, gpt_dim=16)
    params = bigvgan.init(jax.random.PRNGKey(7), cfg)
    latent = rng.standard_normal((57, 16)).astype(np.float32) * 0.3
    mel_ref = rng.standard_normal((1, 50, 100)).astype(np.float32)
    a = WindowedVocoder(params, cfg, window=16, halo=16, layout="ref")(
        latent, mel_ref)
    b = WindowedVocoder(params, cfg, window=16, halo=16, layout="cmajor",
                        use_pallas=False)(latent, mel_ref)
    np.testing.assert_allclose(a, b, atol=2e-5)

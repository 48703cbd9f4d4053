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


def test_stream_device_equals_host_path(rng):
    """stream_device (on-device gather over a (rows, MB, C) latent tensor)
    must be BIT-equal to __call__ on the host-stitched stream: identical
    window contents reach the identical vocode function."""
    import jax.numpy as jnp
    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=128, gpt_dim=16)
    params = bigvgan.init(jax.random.PRNGKey(7), cfg)
    mel_ref = rng.standard_normal((1, 50, 100)).astype(np.float32)

    mb = 32
    lens = np.array([20, 32, 7], np.int64)
    lat = rng.standard_normal((3, mb, 16)).astype(np.float32) * 0.3
    order = np.array([2, 0, 1])
    stream = np.concatenate([lat[r, : lens[r]] for r in order], axis=0)

    voc = WindowedVocoder(params, cfg, window=16, halo=16)
    a = voc(stream, mel_ref)
    b = voc.stream_device(jnp.asarray(lat), lens, order=order,
                          mel_ref=mel_ref)
    np.testing.assert_array_equal(a, b)

    # short-stream path (t <= window + 2*halo)
    a1 = voc(lat[1, :9], mel_ref)
    b1 = voc.stream_device(jnp.asarray(lat), np.array([0, 9, 0]),
                           order=np.array([1]), mel_ref=mel_ref)
    np.testing.assert_array_equal(a1, b1)

"""BigVGAN generator parity vs the reference torch model with shared random
weights (weight norm folded at conversion). This is the SURVEY §7 step-3
allclose gate (mel→wav)."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


class H(dict):
    """Minimal attr-dict standing in for the reference's OmegaConf node."""
    __getattr__ = dict.__getitem__


REF_CFG = dict(
    resblock="1",
    upsample_rates=[4, 4, 4, 4, 2, 2],
    upsample_kernel_sizes=[8, 8, 4, 4, 4, 4],
    upsample_initial_channel=1536,
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5]] * 3,
    feat_upsample=False,
    speaker_embedding_dim=512,
    cond_d_vector_in_each_upsampling_layer=True,
    gpt_dim=1024,
    activation="snakebeta",
    snake_logscale=True,
    num_mels=100,
)


@pytest.fixture(scope="module")
def ref_model():
    load_reference()
    from indextts.BigVGAN.models import BigVGAN
    torch.manual_seed(1)
    m = BigVGAN(H(REF_CFG), use_cuda_kernel=False)
    m.remove_weight_norm()
    m.eval()
    return m


def test_bigvgan_parity(ref_model, rng):
    from index_tts_dubbing_tpu.models import bigvgan
    from index_tts_dubbing_tpu.utils.convert import convert_bigvgan, torch_module_state_dict

    cfg = bigvgan.BigVGANConfig()
    params = convert_bigvgan(torch_module_state_dict(ref_model))

    T = 12
    latent = rng.standard_normal((1, T, 1024)).astype(np.float32) * 0.2
    mel_ref = rng.standard_normal((1, 80, 100)).astype(np.float32)

    with torch.no_grad():
        wav_t, _ = ref_model(torch.from_numpy(latent),
                             torch.from_numpy(mel_ref))
    wav_t = wav_t.numpy()[:, 0, :]

    wav_j = np.asarray(bigvgan.forward(params, cfg, latent, mel_ref))
    assert wav_j.shape == wav_t.shape == (1, T * 1024)
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-4)


def test_bigvgan_init_runs(rng):
    import jax
    from index_tts_dubbing_tpu.models import bigvgan
    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=64, gpt_dim=32,
                                speaker_embedding_dim=512)
    p = bigvgan.init(jax.random.PRNGKey(0), cfg)
    wav = bigvgan.forward(p, cfg,
                          rng.standard_normal((1, 4, 32)).astype(np.float32),
                          rng.standard_normal((1, 60, 100)).astype(np.float32))
    assert wav.shape == (1, 4 * 1024)

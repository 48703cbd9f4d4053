"""DVAE parity vs the reference DiscreteVAE (IndexTTS config, shared random
weights): codebook indices and decode path."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


@pytest.fixture(scope="module")
def ref_dvae():
    load_reference()
    from indextts.vqvae.xtts_dvae import DiscreteVAE
    torch.manual_seed(5)
    m = DiscreteVAE(channels=100, num_tokens=512, hidden_dim=64,
                    num_resnet_blocks=3, codebook_dim=64, num_layers=2,
                    positional_dims=1, kernel_size=3, smooth_l1_loss=True,
                    use_transposed_convs=False)
    m.eval()
    return m


def _convert(ref, cfg):
    from index_tts_dubbing_tpu.utils.convert import (
        conv1d_w, torch_module_state_dict)
    sd = torch_module_state_dict(ref)

    def conv(prefix):
        p = {"w": conv1d_w(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["b"] = sd[f"{prefix}.bias"]
        return p

    n_layers = cfg.num_layers
    n_res = cfg.num_resnet_blocks
    # encoder: Sequential = [conv+act]*L, ResBlock*R, conv1x1
    p = {"enc_convs": [conv(f"encoder.{i}.0") for i in range(n_layers)],
         "enc_res": [], "dec_res": [], "dec_convs": []}
    for i in range(n_res):
        base = f"encoder.{n_layers + i}.net"
        p["enc_res"].append({"c1": conv(f"{base}.0"), "c2": conv(f"{base}.2"),
                             "c3": conv(f"{base}.4")})
    p["enc_out"] = conv(f"encoder.{n_layers + n_res}")
    # decoder: [conv1x1(in), ResBlock*R, [upconv+act]*L, conv1x1(out)]
    p["dec_in"] = conv("decoder.0")
    for i in range(n_res):
        base = f"decoder.{1 + i}.net"
        p["dec_res"].append({"c1": conv(f"{base}.0"), "c2": conv(f"{base}.2"),
                             "c3": conv(f"{base}.4")})
    for i in range(n_layers):
        p["dec_convs"].append(conv(f"decoder.{1 + n_res + i}.0.conv"))
    p["dec_out"] = conv(f"decoder.{1 + n_res + n_layers}")
    p["codebook"] = {"embed": sd["codebook.embed"]}
    return p


def test_dvae_parity(ref_dvae, rng):
    from index_tts_dubbing_tpu.models import dvae as jdvae
    cfg = jdvae.DVAEConfig(channels=100, num_tokens=512, hidden_dim=64,
                           num_resnet_blocks=3, codebook_dim=64, num_layers=2)
    params = _convert(ref_dvae, cfg)
    mel = rng.standard_normal((2, 100, 32)).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref_dvae.get_codebook_indices(
            torch.from_numpy(mel)).numpy()
        ref_mel, _ = ref_dvae.decode(torch.from_numpy(ref_codes.astype(np.int64)))
    codes = np.asarray(jdvae.get_codebook_indices(
        params, cfg, mel.transpose(0, 2, 1)))
    np.testing.assert_array_equal(codes, ref_codes)
    dec = np.asarray(jdvae.decode(params, cfg, codes)).transpose(0, 2, 1)
    np.testing.assert_allclose(dec, ref_mel.numpy(), atol=2e-5)


def test_dvae_train_loss(rng):
    import jax
    from index_tts_dubbing_tpu.models import dvae as jdvae
    cfg = jdvae.DVAEConfig(channels=100, num_tokens=128, hidden_dim=32,
                           num_resnet_blocks=1, codebook_dim=32, num_layers=2)
    params = jdvae.init(jax.random.PRNGKey(0), cfg)
    mel = rng.standard_normal((2, 16, 100)).astype(np.float32)
    recon_loss, commit, recon = jdvae.forward_train(params, cfg, mel)
    assert np.isfinite(float(recon_loss)) and np.isfinite(float(commit))
    assert recon.shape == mel.shape
    # EMA update runs and keeps shapes
    logits = jdvae.encode(params, cfg, mel)
    _, codes, _ = jdvae.quantize(params, logits)
    state = jdvae.EMAState(np.zeros(cfg.num_tokens, np.float32),
                           np.asarray(params["codebook"]["embed"]))
    new_params, new_state = jdvae.ema_update(params, state, logits, codes)
    assert new_params["codebook"]["embed"].shape == \
        params["codebook"]["embed"].shape

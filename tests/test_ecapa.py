"""ECAPA-TDNN parity vs the reference torch implementation with shared
random weights."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


@pytest.fixture(scope="module")
def ref_model():
    load_reference()
    from indextts.BigVGAN.ECAPA_TDNN import ECAPA_TDNN
    torch.manual_seed(0)
    m = ECAPA_TDNN(100, lin_neurons=512)
    m.eval()
    return m


def test_ecapa_parity(ref_model, rng):
    from index_tts_dubbing_tpu.models import ecapa
    from index_tts_dubbing_tpu.utils.convert import convert_ecapa, torch_module_state_dict

    params = convert_ecapa(torch_module_state_dict(ref_model))
    mel = rng.standard_normal((2, 120, 100)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(mel)).numpy()  # (B, 1, 512)
    got = np.asarray(ecapa.forward(params, mel))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_classifier_parity(rng):
    """Cosine classifier head vs reference ECAPA_TDNN.py:584-656."""
    load_reference()
    import torch
    from indextts.BigVGAN.ECAPA_TDNN import Classifier
    from index_tts_dubbing_tpu.models import ecapa

    torch.manual_seed(0)
    m = Classifier(input_size=512, lin_blocks=1, lin_neurons=192,
                   out_neurons=40)
    m.eval()
    params = {
        "blocks": [{
            "bn": {"g": m.blocks[0].norm.weight.detach().numpy(),
                   "b": m.blocks[0].norm.bias.detach().numpy(),
                   "mean": m.blocks[0].norm.running_mean.detach().numpy(),
                   "var": m.blocks[0].norm.running_var.detach().numpy()},
            "lin": {"w": m.blocks[1].w.weight.detach().numpy().T,
                    "b": m.blocks[1].w.bias.detach().numpy()},
        }],
        "weight": m.weight.detach().numpy(),
    }
    x = rng.standard_normal((3, 1, 512)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    got = np.asarray(ecapa.classifier_forward(params, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # cosine outputs bounded
    assert np.all(np.abs(got) <= 1.0 + 1e-5)


def test_sinc_conv_parity(rng):
    """SincConv filterbank + grouped conv vs reference nnet/CNN.py:23-302."""
    load_reference()
    import torch
    from indextts.BigVGAN.nnet.CNN import SincConv
    from index_tts_dubbing_tpu.ops import sinc_conv

    torch.manual_seed(0)
    k, out = 31, 24
    m = SincConv(out_channels=out, kernel_size=k, in_channels=1,
                 sample_rate=16000)
    m.eval()
    params = {"low_hz": m.low_hz_.detach().numpy(),
              "band_hz": m.band_hz_.detach().numpy()}
    x = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()         # (B, T, out)
    got = np.asarray(sinc_conv.forward(params, x, kernel_size=k,
                                       sample_rate=16000))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)
    # init parity: mel-spaced cutoffs match the torch module's own init
    p0 = sinc_conv.init(out, k, 16000)
    np.testing.assert_allclose(p0["low_hz"], params["low_hz"], atol=1e-3)
    np.testing.assert_allclose(p0["band_hz"], params["band_hz"], atol=1e-3)


def test_ecapa_init_shapes(rng):
    import jax
    from index_tts_dubbing_tpu.models import ecapa
    p = ecapa.init(jax.random.PRNGKey(0))
    mel = rng.standard_normal((1, 60, 100)).astype(np.float32)
    out = ecapa.forward(p, mel)
    assert out.shape == (1, 1, 512)

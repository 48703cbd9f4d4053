"""Conformer + perceiver conditioning parity vs the reference torch modules."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


@pytest.fixture(scope="module")
def ref_mods():
    load_reference()
    from indextts.gpt.conformer_encoder import ConformerEncoder
    from indextts.gpt.perceiver import PerceiverResampler
    torch.manual_seed(2)
    enc = ConformerEncoder(input_size=100, output_size=512, linear_units=2048,
                           attention_heads=8, num_blocks=6, input_layer="conv2d2")
    enc.eval()
    per = PerceiverResampler(1024, dim_context=512, ff_mult=2, heads=8,
                             num_latents=32)
    per.eval()
    return enc, per


def test_conformer_parity(ref_mods, rng):
    from index_tts_dubbing_tpu.models import conformer
    from index_tts_dubbing_tpu.utils.convert import convert_conformer, torch_module_state_dict

    enc, _ = ref_mods
    params = convert_conformer(torch_module_state_dict(enc))
    mel = rng.standard_normal((2, 90, 100)).astype(np.float32)
    lengths = np.array([90, 61], np.int64)
    with torch.no_grad():
        ref, ref_mask = enc(torch.from_numpy(mel), torch.from_numpy(lengths))
    got, keep = conformer.forward(params, mel, lengths)
    assert got.shape == tuple(ref.shape)
    np.testing.assert_array_equal(np.asarray(keep), ref_mask.numpy()[:, 0, :])
    # padded positions may differ; compare valid region per row
    ref_np = ref.numpy()
    got_np = np.asarray(got)
    m = ref_mask.numpy()[:, 0, :, None]
    np.testing.assert_allclose(got_np * m, ref_np * m, atol=2e-4, rtol=1e-3)


def test_perceiver_parity(ref_mods, rng):
    from index_tts_dubbing_tpu.models import perceiver
    from index_tts_dubbing_tpu.utils.convert import convert_perceiver, torch_module_state_dict

    _, per = ref_mods
    params = convert_perceiver(torch_module_state_dict(per))
    ctx = rng.standard_normal((2, 45, 512)).astype(np.float32)
    mask = np.ones((2, 32 + 45), bool)
    mask[1, 32 + 30:] = False
    with torch.no_grad():
        ref = per(torch.from_numpy(ctx), torch.from_numpy(mask)).numpy()
    got = np.asarray(perceiver.forward(params, ctx, mask))
    assert got.shape == ref.shape == (2, 32, 1024)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_subsampling_variants_parity(rng):
    """The unused-but-shipped subsampling variants (subsampling.py: linear,
    conv2d4, conv2d6, conv2d8) vs reference."""
    import torch
    from tests.ref_loader import load_reference
    load_reference()
    from indextts.gpt.conformer.subsampling import (
        LinearNoSubsampling, Conv2dSubsampling3, Conv2dSubsampling4,
        Conv2dSubsampling6, Conv2dSubsampling8)
    from indextts.gpt.conformer.embedding import NoPositionalEncoding
    from index_tts_dubbing_tpu.models import conformer as jc
    from index_tts_dubbing_tpu.utils.convert import (
        conv2d_w, torch_module_state_dict)

    torch.manual_seed(4)
    idim, odim, t = 40, 32, 37
    x = rng.standard_normal((2, t, idim)).astype(np.float32)
    mask = np.ones((2, 1, t), bool)

    def np_mask(m):
        return torch.from_numpy(m)

    # linear
    m = LinearNoSubsampling(idim, odim, 0.0, NoPositionalEncoding(odim, 0.0))
    m.eval()
    sd = torch_module_state_dict(m)
    p = {"out": {"w": sd["out.0.weight"].T, "b": sd["out.0.bias"]},
         "ln": {"g": sd["out.1.weight"], "b": sd["out.1.bias"]}}
    with torch.no_grad():
        ref, _, rm = m(torch.from_numpy(x), np_mask(mask))
    got, gm = jc.linear_no_subsample(p, x, mask[:, 0])
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)

    for cls, fn, n_convs in ((Conv2dSubsampling3, jc.conv2d_subsample3, 1),
                             (Conv2dSubsampling4, jc.conv2d_subsample4, 2),
                             (Conv2dSubsampling6, jc.conv2d_subsample6, 2),
                             (Conv2dSubsampling8, jc.conv2d_subsample8, 3)):
        m = cls(idim, odim, 0.0, NoPositionalEncoding(odim, 0.0))
        m.eval()
        sd = torch_module_state_dict(m)
        p = {}
        conv_idx = [i for i in (0, 2, 4)][:n_convs]
        for ci, rawi in enumerate(conv_idx):
            key = "conv" if n_convs == 1 else f"conv{ci}"
            p[key] = {"w": conv2d_w(sd[f"conv.{rawi}.weight"]),
                      "b": sd[f"conv.{rawi}.bias"]}
        wkey = "out.0.weight" if "out.0.weight" in sd else "linear.weight" \
            if "linear.weight" in sd else "out.weight"
        bkey = wkey.replace("weight", "bias")
        p["out"] = {"w": sd[wkey].T, "b": sd[bkey]}
        with torch.no_grad():
            ref, _, rm = m(torch.from_numpy(x), np_mask(mask))
        got, gm = fn(p, x, mask[:, 0])
        assert got.shape == tuple(ref.shape), (cls.__name__, got.shape,
                                               ref.shape)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(gm), rm.numpy()[:, 0])

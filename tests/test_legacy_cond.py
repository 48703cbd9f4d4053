"""Legacy (v1.0) conditioning encoder + typical sampling parity tests."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


def test_attention_block_parity(rng):
    load_reference()
    from indextts.utils.arch_util import AttentionBlock
    from index_tts_dubbing_tpu.models import legacy_cond
    from index_tts_dubbing_tpu.utils.convert import convert_legacy_cond, torch_module_state_dict

    torch.manual_seed(7)
    C, H = 64, 4

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.init = torch.nn.Conv1d(100, C, 1)
            self.attn = torch.nn.ModuleList(
                [AttentionBlock(C, H) for _ in range(2)])

        def forward(self, x):
            h = self.init(x)
            for a in self.attn:
                h = a(h)
            return h

    m = Wrap().eval()
    # proj_out is zero-init in the reference; randomise so the test is strict
    with torch.no_grad():
        for a in m.attn:
            a.proj_out.weight.normal_(0, 0.02)
            a.proj_out.bias.normal_(0, 0.02)

    params = convert_legacy_cond(torch_module_state_dict(m), attn_blocks=2)
    mel = rng.standard_normal((2, 100, 40)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(mel)).numpy().transpose(0, 2, 1)
    got = np.asarray(legacy_cond.forward(params, mel.transpose(0, 2, 1),
                                         heads=H))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_typical_filter_matches_reference(rng):
    load_reference()
    torch.manual_seed(0)
    from indextts.utils.typical_sampling import TypicalLogitsWarper
    from index_tts_dubbing_tpu.engine.decode import _typical_filter

    scores = rng.standard_normal((3, 50)).astype(np.float32) * 3
    warper = TypicalLogitsWarper(mass=0.9)
    ref = warper(None, torch.from_numpy(scores.copy())).numpy()
    got = np.asarray(_typical_filter(scores, 0.9))
    # compare kept/removed masks and surviving values
    np.testing.assert_array_equal(np.isinf(got), np.isinf(ref))
    np.testing.assert_allclose(np.where(np.isinf(got), 0, got),
                               np.where(np.isinf(ref), 0, ref), atol=1e-6)

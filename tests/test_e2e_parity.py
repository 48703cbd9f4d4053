"""End-to-end numerics gate (BASELINE config 1): text tokens → greedy AR
decode → latent pass → BigVGAN vocode, ours vs the reference torch pipeline
with shared random weights. Waveform allclose."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference
from tests.test_gpt import (COND_BLOCKS, COND_DIM, COND_HEADS, DIM, HEADS,
                            LAYERS, MAX_MEL, MAX_TEXT, N_TEXT, _ref_greedy,
                            jax_setup, ref_uv)


class H(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


@pytest.fixture(scope="module")
def ref_vocoder():
    load_reference()
    from indextts.BigVGAN.models import BigVGAN
    torch.manual_seed(21)
    cfg = dict(resblock="1", upsample_rates=[4, 4, 4, 4, 2, 2],
               upsample_kernel_sizes=[8, 8, 4, 4, 4, 4],
               upsample_initial_channel=128,
               resblock_kernel_sizes=[3, 7, 11],
               resblock_dilation_sizes=[[1, 3, 5]] * 3,
               feat_upsample=False, speaker_embedding_dim=512,
               cond_d_vector_in_each_upsampling_layer=True,
               gpt_dim=DIM, activation="snakebeta", snake_logscale=True,
               num_mels=100)
    m = BigVGAN(H(cfg), use_cuda_kernel=False)
    m.remove_weight_norm()
    m.eval()
    return m


@pytest.mark.parametrize("layout", ["ref", "cmajor"])
def test_full_pipeline_waveform_parity(ref_uv, jax_setup, ref_vocoder, rng,
                                       layout):
    import jax
    from index_tts_dubbing_tpu.engine import decode
    from index_tts_dubbing_tpu.engine.vocoder import WindowedVocoder
    from index_tts_dubbing_tpu.models import gpt as jgpt
    from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig
    from index_tts_dubbing_tpu.utils.convert import (convert_bigvgan,
                                                     torch_module_state_dict)

    cfg, params = jax_setup
    bv_cfg = BigVGANConfig(gpt_dim=DIM, upsample_initial_channel=128)
    bv_params = convert_bigvgan(torch_module_state_dict(ref_vocoder))

    mel = rng.standard_normal((1, 100, 70)).astype(np.float32)
    text = rng.integers(2, N_TEXT, size=10).astype(np.int64)
    n_steps = 16

    # --- reference path -----------------------------------------------------
    ref_codes = _ref_greedy(ref_uv, mel, text[None, :], n_steps)[0]
    stop = np.nonzero(ref_codes == cfg.stop_mel_token)[0]
    code_len = int(stop[0]) if stop.size else len(ref_codes)
    codes = ref_codes[:code_len]
    if code_len == 0:
        pytest.skip("random model emitted stop immediately")
    with torch.no_grad():
        latent_t = ref_uv(
            torch.from_numpy(mel), torch.from_numpy(text[None, :]),
            torch.tensor([10]), torch.from_numpy(codes[None, :].astype(np.int64)),
            torch.tensor([code_len * 1024]),
            cond_mel_lengths=torch.tensor([70]),
            return_latent=True, clip_inputs=False)
        wav_t, _ = ref_vocoder(latent_t,
                               torch.from_numpy(mel.transpose(0, 2, 1)))
    wav_ref = wav_t.numpy()[0, 0]

    # --- ours ----------------------------------------------------------------
    conds = jgpt.get_conditioning(params, cfg, mel.transpose(0, 2, 1),
                                  np.array([70]))
    pre = decode.prepare_prefix_host(cfg, [text])
    emb, keep = decode.build_prefix_emb(params, cfg, conds, pre["ids"],
                                        pre["pos"], pre["seg"],
                                        pre["cond_idx"])
    sc = decode.SamplingConfig(do_sample=False, max_mel_tokens=n_steps,
                               repetition_penalty=10.0)
    res = decode.generate(params, cfg, sc, emb, keep, jax.random.PRNGKey(0))
    got_codes = np.asarray(res.codes)[0]
    got_len = int(res.lengths[0])
    np.testing.assert_array_equal(got_codes[:code_len], codes)
    assert got_len == code_len

    latent = jgpt.forward_latent(params, cfg, conds,
                                 text[None, :].astype(np.int32),
                                 np.array([10]),
                                 got_codes[None, :code_len].astype(np.int32),
                                 np.array([code_len]))
    # "cmajor" = the TPU production layout minus the TPU-only Pallas
    # kernels (use_pallas auto-off on CPU): CI exercises the code path
    # production runs, not just the bit-exact "ref" form (VERDICT r02 #8)
    voc = WindowedVocoder(bv_params, bv_cfg, window=16, halo=32,
                          layout=layout)
    spk = voc.speaker_embedding(mel.transpose(0, 2, 1))
    wav_j = voc(np.asarray(latent)[0], spk=spk)

    assert wav_j.shape == wav_ref.shape
    np.testing.assert_allclose(wav_j, wav_ref, atol=5e-4)

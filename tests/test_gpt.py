"""UnifiedVoice GPT parity vs the reference torch model (small config,
shared random weights): conditioning, latent pass, and greedy token-exact
decode — the tests/padding_test.py protocol of the reference."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference

DIM = 64
HEADS = 4
LAYERS = 2
COND_DIM = 32
COND_HEADS = 4
COND_BLOCKS = 2
N_TEXT = 120
MAX_TEXT = 50
MAX_MEL = 60


@pytest.fixture(scope="module")
def ref_uv():
    load_reference()
    from indextts.gpt.model import UnifiedVoice
    torch.manual_seed(3)
    uv = UnifiedVoice(
        layers=LAYERS, model_dim=DIM, heads=HEADS,
        max_text_tokens=MAX_TEXT, max_mel_tokens=MAX_MEL,
        number_text_tokens=N_TEXT,
        activation_function="gelu_pytorch_tanh",
        condition_type="conformer_perceiver",
        condition_module=dict(output_size=COND_DIM, linear_units=64,
                              attention_heads=COND_HEADS,
                              num_blocks=COND_BLOCKS, input_layer="conv2d2",
                              perceiver_mult=2),
    )
    uv.eval()
    return uv


@pytest.fixture(scope="module")
def jax_setup(ref_uv):
    from index_tts_dubbing_tpu.models.gpt import GPTConfig
    from index_tts_dubbing_tpu.utils.convert import (
        convert_unified_voice, torch_module_state_dict)
    cfg = GPTConfig(model_dim=DIM, layers=LAYERS, heads=HEADS,
                    max_mel_tokens=MAX_MEL, max_text_tokens=MAX_TEXT,
                    number_text_tokens=N_TEXT,
                    cond_output_size=COND_DIM, cond_linear_units=64,
                    cond_attention_heads=COND_HEADS,
                    cond_num_blocks=COND_BLOCKS)
    params = convert_unified_voice(torch_module_state_dict(ref_uv),
                                   layers=LAYERS, cond_blocks=COND_BLOCKS)
    return cfg, params


def _mel(rng, b=1, t=70):
    return rng.standard_normal((b, 100, t)).astype(np.float32)


def test_conditioning_parity(ref_uv, jax_setup, rng):
    from index_tts_dubbing_tpu.models import gpt as jgpt
    cfg, params = jax_setup
    mel = _mel(rng, 1, 70)
    lens = np.array([70], np.int64)
    with torch.no_grad():
        ref = ref_uv.get_conditioning(torch.from_numpy(mel),
                                      torch.from_numpy(lens)).numpy()
    got = np.asarray(jgpt.get_conditioning(params, cfg,
                                           mel.transpose(0, 2, 1), lens))
    assert got.shape == ref.shape == (1, 32, DIM)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_latent_parity(ref_uv, jax_setup, rng):
    from index_tts_dubbing_tpu.models import gpt as jgpt
    cfg, params = jax_setup
    mel = _mel(rng, 1, 70)
    text = rng.integers(2, N_TEXT, size=(1, 12)).astype(np.int64)
    codes = rng.integers(0, 8192, size=(1, 20)).astype(np.int64)
    code_lens = np.array([18], np.int64)
    with torch.no_grad():
        ref = ref_uv(torch.from_numpy(mel), torch.from_numpy(text),
                     torch.tensor([12]), torch.from_numpy(codes),
                     torch.tensor([18 * 1024]),
                     cond_mel_lengths=torch.tensor([70]),
                     return_latent=True, clip_inputs=False).numpy()
    conds = jgpt.get_conditioning(params, cfg, mel.transpose(0, 2, 1),
                                  np.array([70]))
    got = np.asarray(jgpt.forward_latent(params, cfg, conds, text,
                                         np.array([12]), codes, code_lens))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def _ref_greedy(ref_uv, mel, texts_padded, n_steps, rep_penalty=10.0):
    """Greedy-decode ground truth driven manually over the reference's
    GPT2InferenceModel.forward with transformers-4.36 `generate` semantics
    (the installed transformers 4.57 breaks the reference's
    prepare_inputs_for_generation: its initial empty DynamicCache is truthy,
    so HF generate silently drops the prefix on the prefill step)."""
    if not hasattr(ref_uv, "inference_model"):
        ref_uv.post_init_gpt2_config(use_deepspeed=False, kv_cache=True,
                                     half=False)
    model = ref_uv.inference_model
    with torch.no_grad():
        conds = ref_uv.get_conditioning(torch.from_numpy(mel),
                                        torch.tensor([mel.shape[-1]]))
        ids, emb, am = ref_uv.prepare_gpt_inputs(
            conds, torch.from_numpy(texts_padded))
        model.store_mel_emb(emb)
        past = None
        out_tokens = []
        for _ in range(n_steps):
            if past is None:
                out = model(input_ids=ids, attention_mask=am, use_cache=True,
                            return_dict=True)
            else:
                out = model(input_ids=ids[:, -1:], attention_mask=am,
                            use_cache=True, past_key_values=past,
                            return_dict=True)
            past = out.past_key_values
            logits = out.logits[:, -1, :].float()
            for t in set(ids[0].tolist()):  # HF RepetitionPenaltyProcessor
                v = logits[0, t].item()
                logits[0, t] = v * rep_penalty if v < 0 else v / rep_penalty
            tok = int(logits.argmax(-1))
            out_tokens.append(tok)
            ids = torch.cat([ids, torch.tensor([[tok]])], dim=1)
            am = torch.nn.functional.pad(am, (0, 1), value=1)
            if tok == ref_uv.stop_mel_token:
                break
        return np.array([out_tokens])


@pytest.mark.parametrize("pad", [0, 3])
def test_greedy_decode_parity(ref_uv, jax_setup, rng, pad):
    """Token-exact greedy decode, including the left-padding invariance
    contract of the reference's tests/padding_test.py."""
    import jax
    from index_tts_dubbing_tpu.models import gpt as jgpt
    from index_tts_dubbing_tpu.engine import decode

    cfg, params = jax_setup
    mel = _mel(rng, 1, 70)
    text = rng.integers(2, N_TEXT, size=10).astype(np.int64)
    # reference-style row: optionally padded with bos/eos garbage the
    # prefix builder must strip
    row = np.concatenate([[cfg.start_text_token] * pad, text,
                          [cfg.stop_text_token] * pad]).astype(np.int64)
    n_steps = 20

    ref_codes = _ref_greedy(ref_uv, mel, row[None, :], n_steps)

    conds = jgpt.get_conditioning(params, cfg, mel.transpose(0, 2, 1),
                                  np.array([70]))
    pre = decode.prepare_prefix_host(cfg, [row])
    emb, keep = decode.build_prefix_emb(params, cfg, conds,
                                        pre["ids"], pre["pos"], pre["seg"],
                                        pre["cond_idx"])
    sc = decode.SamplingConfig(do_sample=False, max_mel_tokens=n_steps,
                               repetition_penalty=10.0)
    res = decode.generate(params, cfg, sc, emb, keep, jax.random.PRNGKey(0))
    got = np.asarray(res.codes[0])

    ref_row = ref_codes[0]
    n = min(len(ref_row), len(got))
    np.testing.assert_array_equal(got[:n], ref_row[:n])

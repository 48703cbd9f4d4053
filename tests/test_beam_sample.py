"""Beam decode parity vs the reference torch model under transformers-4.36
`generate` semantics (the reference's DEFAULT mode is num_beams=3 with
do_sample=True → HF beam_sample; infer.py:326-334, gpt/model.py:698-703).

The installed transformers 4.57 breaks the reference's own `generate` path
(see test_gpt._ref_greedy), so the ground truth here is a manual torch
driver implementing 4.36 beam_sample / beam_search / BeamSearchScorer /
BeamHypotheses step-for-step. Randomness is made shared and deterministic by
injecting the SAME fixed Gumbel noise table into both sides (Gumbel top-k ==
multinomial without replacement), so token-exact comparison covers the whole
pipeline: score processing, warper chain, candidate selection, eos pooling,
beam reordering, is_done and finalize.
"""
from unittest import mock

import numpy as np
import pytest
import torch

from tests.test_gpt import (ref_uv, jax_setup, DIM, N_TEXT)  # noqa: F401


def _warp_torch(scores, top_k, top_p, temp):
    """transformers-4.36 warper chain (temperature → top-k → top-p),
    min_tokens_to_keep=2 (HF uses 2 when num_beams > 1)."""
    scores = scores / temp
    k = min(max(top_k, 2), scores.shape[-1])
    kth = torch.topk(scores, k, dim=-1).values[..., -1:]
    scores = scores.masked_fill(scores < kth, float("-inf"))
    if top_p < 1.0:
        ss, si = torch.sort(scores, descending=False)
        cum = ss.softmax(-1).cumsum(-1)
        remove = cum <= (1 - top_p)
        remove[..., -2:] = False
        scores = scores.masked_fill(remove.scatter(1, si, remove),
                                    float("-inf"))
    return scores


def _ref_beam(ref_uv, mel, texts, max_steps, nb=3, rep=10.0, sample=True,
              top_k=30, top_p=0.8, temp=1.0, lp=0.0, noise=None):
    """Manual 4.36 beam_sample (sample=True) / beam_search driver. ``noise``:
    fixed (nb*V,) Gumbel table added to the warped scores each step (zero /
    None for pure beam_search)."""
    if not hasattr(ref_uv, "inference_model"):
        ref_uv.post_init_gpt2_config(use_deepspeed=False, kv_cache=True,
                                     half=False)
    model = ref_uv.inference_model
    eos = ref_uv.stop_mel_token
    with torch.no_grad():
        conds = ref_uv.get_conditioning(torch.from_numpy(mel),
                                        torch.tensor([mel.shape[-1]]))
        ids, emb, am = ref_uv.prepare_gpt_inputs(conds,
                                                 torch.from_numpy(texts))
        model.store_mel_emb(emb)
        ids = ids.repeat_interleave(nb, 0)
        am = am.repeat_interleave(nb, 0)
        s0 = ids.shape[1]
        if sample:
            beam_scores = torch.zeros(nb)
        else:
            beam_scores = torch.full((nb,), -1e9)
            beam_scores[0] = 0.0
        past = None
        pool = []       # (norm_score, generated_tokens_list, gen_len)

        def pool_add(norm, toks, glen):
            # BeamHypotheses.add: keep best nb, strict > replaces worst
            if len(pool) < nb:
                pool.append((norm, toks, glen))
            elif norm > min(p[0] for p in pool):
                pool.remove(min(pool, key=lambda x: x[0]))
                pool.append((norm, toks, glen))

        done = False
        for j in range(max_steps):
            if past is None:
                out = model(input_ids=ids, attention_mask=am, use_cache=True,
                            return_dict=True)
            else:
                out = model(input_ids=ids[:, -1:], attention_mask=am,
                            use_cache=True, past_key_values=past,
                            return_dict=True)
            past = out.past_key_values
            logits = out.logits[:, -1, :].float()
            logp = torch.log_softmax(logits, dim=-1)
            for bi in range(nb):        # RepetitionPenaltyLogitsProcessor
                for t in set(ids[bi].tolist()):
                    v = logp[bi, t].item()
                    logp[bi, t] = v * rep if v < 0 else v / rep
            scores = logp + beam_scores[:, None]
            if sample:
                scores = _warp_torch(scores, top_k, top_p, temp)
            flat = scores.reshape(-1)
            V = logits.shape[-1]
            z = flat.clone()
            if noise is not None:
                fin = torch.isfinite(z)
                z[fin] = z[fin] + torch.from_numpy(noise)[fin]
            cand_idx = torch.topk(z, 2 * nb).indices
            cand_scores = flat[cand_idx]
            order = torch.argsort(-cand_scores, stable=True)
            cand_scores, cand_idx = cand_scores[order], cand_idx[order]
            # BeamSearchScorer.process
            new_rows, new_scores = [], []
            for rank in range(2 * nb):
                sbeam, tok = int(cand_idx[rank]) // V, int(cand_idx[rank]) % V
                s = float(cand_scores[rank])
                if tok == eos:
                    if rank >= nb:
                        continue
                    pool_add(s / ((j + 1) ** lp), ids[sbeam, s0:].tolist(),
                             j + 1)
                else:
                    new_rows.append((sbeam, tok))
                    new_scores.append(s)
                    if len(new_rows) == nb:
                        break
            beam_idx = torch.tensor([sb for sb, _ in new_rows])
            ids = torch.cat([ids[beam_idx],
                             torch.tensor([[t] for _, t in new_rows])], dim=1)
            am = torch.nn.functional.pad(am, (0, 1), value=1)
            if hasattr(past, "reorder_cache"):
                r = past.reorder_cache(beam_idx)
                past = r if r is not None else past
            else:
                past = model._reorder_cache(past, beam_idx)
            beam_scores = torch.tensor(new_scores)
            best_next = float(flat.max())
            if (len(pool) == nb
                    and min(p[0] for p in pool)
                    >= best_next / ((j + 1) ** lp)):
                done = True
                break
        if not done:
            for bi in range(nb):
                pool_add(float(beam_scores[bi]) / (max_steps ** lp),
                         ids[bi, s0:].tolist(), max_steps)
        best = max(pool, key=lambda x: x[0])
        toks, glen = best[1], best[2]
        gen = toks[: glen if glen < max_steps else max_steps]
        return np.asarray(gen, np.int32), best[0]


def _jax_beam(jax_setup, mel, texts, max_steps, nb, sc_kw, lp, stochastic,
              noise):
    import jax
    import jax.numpy as jnp
    from index_tts_dubbing_tpu.engine import decode
    from index_tts_dubbing_tpu.models import gpt as jgpt

    cfg, params = jax_setup
    conds = jgpt.get_conditioning(params, cfg, mel.transpose(0, 2, 1),
                                  np.array([mel.shape[-1]]))
    pre = decode.prepare_prefix_host(cfg, [texts[0]])
    emb, keep = decode.build_prefix_emb(params, cfg, conds, pre["ids"],
                                        pre["pos"], pre["seg"],
                                        pre["cond_idx"])
    sc = decode.SamplingConfig(max_mel_tokens=max_steps, **sc_kw)

    fixed = noise

    def fake_gumbel(key, shape, dtype=np.float32):
        return jnp.asarray(fixed, dtype).reshape(shape)

    with mock.patch.object(decode.jax.random, "gumbel", fake_gumbel):
        if stochastic:
            res = decode.generate_beam_sample(params, cfg, sc, emb, keep,
                                              jax.random.PRNGKey(0),
                                              num_beams=nb,
                                              length_penalty=lp)
        else:
            res = decode.generate_beam(params, cfg, sc, emb, keep,
                                       num_beams=nb, length_penalty=lp)
    n = int(res.lengths[0])
    return np.asarray(res.codes[0, :n]), res


@pytest.mark.parametrize("lp", [0.0, 1.0])
def test_beam_sample_parity(ref_uv, jax_setup, rng, lp):
    """Token-exact beam-sample parity under shared fixed Gumbel noise
    (covers warpers, candidate draw, eos pool, reorder, finalize)."""
    cfg, params = jax_setup
    mel = rng.standard_normal((1, 100, 70)).astype(np.float32)
    text = rng.integers(2, N_TEXT, size=10).astype(np.int64)
    nb, steps = 3, 16
    noise = rng.gumbel(size=(nb * cfg.number_mel_codes,)).astype(np.float32)

    ref_toks, _ = _ref_beam(ref_uv, mel, text[None], steps, nb=nb,
                            sample=True, lp=lp, noise=noise)
    got_toks, _ = _jax_beam(jax_setup, mel, [text], steps, nb,
                            dict(do_sample=True, repetition_penalty=10.0),
                            lp, True, noise)
    np.testing.assert_array_equal(got_toks, ref_toks)


def test_beam_search_parity(ref_uv, jax_setup, rng):
    """Deterministic beam search (do_sample=False) vs the 4.36 semantics."""
    cfg, params = jax_setup
    mel = rng.standard_normal((1, 100, 70)).astype(np.float32)
    text = rng.integers(2, N_TEXT, size=9).astype(np.int64)
    nb, steps = 3, 16
    ref_toks, _ = _ref_beam(ref_uv, mel, text[None], steps, nb=nb,
                            sample=False, lp=0.0, noise=None)
    got_toks, _ = _jax_beam(jax_setup, mel, [text], steps, nb,
                            dict(do_sample=False, repetition_penalty=10.0),
                            0.0, False, np.zeros((nb * cfg.number_mel_codes,),
                                                 np.float32))
    np.testing.assert_array_equal(got_toks, ref_toks)


def test_beam_sample_seed_variation(jax_setup, rng):
    """Unmocked beam sampling: valid tokens, seed-dependent outputs."""
    import jax
    from index_tts_dubbing_tpu.engine import decode
    from index_tts_dubbing_tpu.models import gpt as jgpt

    cfg, params = jax_setup
    mel = rng.standard_normal((1, 100, 70)).astype(np.float32)
    text = rng.integers(2, N_TEXT, size=8).astype(np.int64)
    conds = jgpt.get_conditioning(params, cfg, mel.transpose(0, 2, 1),
                                  np.array([70]))
    pre = decode.prepare_prefix_host(cfg, [text])
    emb, keep = decode.build_prefix_emb(params, cfg, conds, pre["ids"],
                                        pre["pos"], pre["seg"],
                                        pre["cond_idx"])
    sc = decode.SamplingConfig(do_sample=True, max_mel_tokens=12,
                               repetition_penalty=10.0)
    outs = []
    for seed in (0, 1, 2):
        res = decode.generate_beam_sample(params, cfg, sc, emb, keep,
                                          jax.random.PRNGKey(seed),
                                          num_beams=3)
        codes = np.asarray(res.codes)
        assert ((codes >= 0) & (codes < cfg.number_mel_codes)).all()
        outs.append(codes.tolist())
    assert any(o != outs[0] for o in outs[1:])

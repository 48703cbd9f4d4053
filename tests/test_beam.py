"""Beam search decode tests (small random model): beam(1)·no-penalty ≡ greedy
argmax-of-logprob path, beam(3) runs with valid outputs and a cumulative
score ≥ the greedy beam's."""
import jax
import numpy as np
import pytest

from index_tts_dubbing_tpu.engine import decode
from index_tts_dubbing_tpu.models import gpt as jgpt
from index_tts_dubbing_tpu.models.gpt import GPTConfig


@pytest.fixture(scope="module")
def setup():
    cfg = GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=40,
                    max_text_tokens=30, number_text_tokens=80,
                    cond_output_size=32, cond_linear_units=64,
                    cond_attention_heads=4, cond_num_blocks=2)
    params = jgpt.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(3)
    conds = rng.standard_normal((1, 32, 64)).astype(np.float32)
    text = rng.integers(2, 80, size=8).astype(np.int64)
    pre = decode.prepare_prefix_host(cfg, [text])
    emb, keep = decode.build_prefix_emb(params, cfg, conds, pre["ids"],
                                        pre["pos"], pre["seg"],
                                        pre["cond_idx"])
    return cfg, params, emb, keep


def test_beam1_equals_greedy(setup):
    cfg, params, emb, keep = setup
    sc = decode.SamplingConfig(do_sample=False, max_mel_tokens=12,
                               repetition_penalty=1.0)
    greedy = decode.generate(params, cfg, sc, emb, keep, jax.random.PRNGKey(0))
    beam = decode.generate_beam(params, cfg, sc, emb, keep, num_beams=1,
                                length_penalty=0.0)
    np.testing.assert_array_equal(np.asarray(greedy.codes),
                                  np.asarray(beam.codes))


def test_beam3_valid_and_not_worse(setup):
    cfg, params, emb, keep = setup
    sc = decode.SamplingConfig(do_sample=False, max_mel_tokens=12,
                               repetition_penalty=10.0)
    b1 = decode.generate_beam(params, cfg, sc, emb, keep, num_beams=1)
    b3 = decode.generate_beam(params, cfg, sc, emb, keep, num_beams=3)
    codes = np.asarray(b3.codes)
    assert codes.shape == (1, 12)
    assert ((codes >= 0) & (codes < cfg.number_mel_codes)).all()

    def path_score(codes_row, length):
        """Re-score a token path with the same scoring rule."""
        import jax.numpy as jnp
        sc2 = sc
        # replay: prefill then steps, accumulating log-probs
        cache = jgpt.init_cache(cfg, 1, emb.shape[1] + 12)
        h, cache = jgpt.trunk_prefill(params, cfg, emb, keep, cache)
        seen = np.zeros(cfg.number_mel_codes, bool)
        seen[1] = seen[cfg.start_mel_token] = True
        total = 0.0
        s0 = emb.shape[1]
        base = np.concatenate([np.asarray(keep)[0],
                               np.ones(12, bool)])
        for j, tok in enumerate(codes_row[:length + 1]):
            logits = np.asarray(jgpt.mel_logits_from_hidden(params, h))[0]
            logp = logits - np.log(np.sum(np.exp(logits - logits.max()))) \
                - logits.max()
            logp = np.where(seen, logp * sc.repetition_penalty, logp)
            total += logp[tok]
            seen[tok] = True
            if tok == cfg.stop_mel_token or j >= 11:
                break
            embt = (np.asarray(params["mel_emb"]["w"])[tok]
                    + np.asarray(params["mel_pos"]["w"])[j + 2])
            kk = (base & (np.arange(base.size) <= s0 + j))[None, :]
            h, cache = jgpt.trunk_decode_step(
                params, cfg, jnp.asarray(embt[None]), cache, s0 + j,
                jnp.asarray(kk))
        return total

    s1 = path_score(np.asarray(b1.codes)[0], int(b1.lengths[0]))
    s3 = path_score(codes[0], int(b3.lengths[0]))
    assert s3 >= s1 - 1e-3


@pytest.mark.parametrize("stochastic", [False, True])
def test_reorder_strategies_token_identical(setup, stochastic):
    """Every cache-reorder strategy is a pure layout optimization: tokens,
    lengths and step counts must match the HF-faithful "full" gather exactly
    (the SplitCache "split" strategy is the production default)."""
    cfg, params, _, _ = setup
    rng = np.random.default_rng(11)
    texts = [rng.integers(2, 80, size=n).astype(np.int64) for n in (8, 5, 7)]
    conds = rng.standard_normal((3, 32, 64)).astype(np.float32)
    pre = decode.prepare_prefix_host(cfg, texts)
    emb, keep = decode.build_prefix_emb(params, cfg, conds, pre["ids"],
                                        pre["pos"], pre["seg"],
                                        pre["cond_idx"])
    sc = decode.SamplingConfig(do_sample=stochastic, max_mel_tokens=14)
    key = jax.random.PRNGKey(7)
    ref = decode._beam_decode(params, cfg, sc, emb, keep, key, 3, 0.6,
                              stochastic=stochastic, reorder="full")
    for strat in ("split", "anc", "ancfull", "ancg", "ancb", "ancsw", "cof",
                  "flat", "flatfull", "gen", "mm", "blocked"):
        out = decode._beam_decode(params, cfg, sc, emb, keep, key, 3, 0.6,
                                  stochastic=stochastic, reorder=strat)
        np.testing.assert_array_equal(np.asarray(ref.codes),
                                      np.asarray(out.codes), err_msg=strat)
        np.testing.assert_array_equal(np.asarray(ref.lengths),
                                      np.asarray(out.lengths), err_msg=strat)


def test_long_decode_split_parity(setup):
    """Longer-than-96-step decode through the split cache matches the
    single-buffer HF-faithful "full" strategy exactly."""
    cfg, params, _, _ = setup
    rng = np.random.default_rng(5)
    texts = [rng.integers(2, 80, size=n).astype(np.int64) for n in (8, 6)]
    conds = rng.standard_normal((2, 32, 64)).astype(np.float32)
    pre = decode.prepare_prefix_host(cfg, texts)
    emb, keep = decode.build_prefix_emb(params, cfg, conds, pre["ids"],
                                        pre["pos"], pre["seg"],
                                        pre["cond_idx"])
    sc = decode.SamplingConfig(do_sample=True, max_mel_tokens=112)
    key = jax.random.PRNGKey(3)
    ref = decode._beam_decode(params, cfg, sc, emb, keep, key, 3, 0.3,
                              stochastic=True, reorder="full")
    out = decode._beam_decode(params, cfg, sc, emb, keep, key, 3, 0.3,
                              stochastic=True, reorder="split")
    np.testing.assert_array_equal(np.asarray(ref.codes), np.asarray(out.codes))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(out.lengths))

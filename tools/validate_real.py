"""Real-checkpoint validation runbook (r04 verdict #9): ONE command.

Given a model dir holding the reference's checkpoint set
(``gpt.pth`` / ``bigvgan_generator.pth`` / ``dvae.pth`` / ``bpe.model`` /
``config.yaml`` — utils/checkpoint.py:25-34 spec,
/root/reference/checkpoints/config.yaml:111-113), runs IN ORDER:

  1. convert   torch .pth → this framework's .npz trees
               (tools/convert_checkpoints; weight-norm folded)
  2. parity    numerics gate vs the torch reference pipeline
               (BASELINE numerics row): conditioning allclose, latent
               allclose, greedy decode TOKEN parity, and waveform
               allclose through mel → codes → latent → BigVGAN.
               Requires the reference implementation importable
               (default /root/reference; or an installed indextts).
  3. seedtest  WER / speaker-similarity / RTF sweep
               (tools/seedtest_eval.py; WER needs --asr, default none)
  4. int8      decode-decision acceptance harness
               (tools/int8_accept.py). NOTE: random/fabricated weights
               FAIL its thresholds BY CONSTRUCTION (near-uniform logits);
               the step records the numbers and only gates on them when
               --expect-trained is passed.

Rehearsal — no real checkpoints ship with the reference snapshot, so the
whole path is exercised end-to-end with FABRICATED checkpoints saved in
real .pth FORMAT (torch.save of the reference modules' state dicts, with
BigVGAN weight-norm parametrisation intact so the converter's folding runs,
and the torch.load unwrap keys 'model'/'generator' exercised):

  python tools/validate_real.py --fabricate /tmp/fab --size small

When a real IndexTTS-1.5 checkpoint arrives:

  python tools/validate_real.py --model-dir checkpoints \
      --asr hf:<asr-model> --expect-trained
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def log(step: str, msg: str) -> None:
    print(f"[validate_real :: {step}] {msg}", flush=True)


# ---------------------------------------------------------------------------
# reference import (reuses the test suite's shim loader)
# ---------------------------------------------------------------------------

def _load_reference(ref_path: str):
    import tests.ref_loader as rl
    rl.REF = Path(ref_path)
    if not rl.REF.exists():
        raise SystemExit(
            f"reference implementation not found at {ref_path} — pass --ref "
            "or install the indextts package for the parity gate")
    rl.load_reference()


class _H(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _uv_kwargs(cfg):
    """Reference UnifiedVoice constructor kwargs from our GPTConfig."""
    return dict(
        layers=cfg.layers, model_dim=cfg.model_dim, heads=cfg.heads,
        max_text_tokens=cfg.max_text_tokens,
        max_mel_tokens=cfg.max_mel_tokens,
        number_text_tokens=cfg.number_text_tokens,
        activation_function="gelu_pytorch_tanh",
        condition_type="conformer_perceiver",
        condition_module=dict(
            output_size=cfg.cond_output_size,
            linear_units=cfg.cond_linear_units,
            attention_heads=cfg.cond_attention_heads,
            num_blocks=cfg.cond_num_blocks, input_layer="conv2d2",
            perceiver_mult=cfg.perceiver_mult),
    )


def _bv_kwargs(bv_cfg):
    return dict(
        resblock="1", upsample_rates=list(bv_cfg.upsample_rates),
        upsample_kernel_sizes=list(bv_cfg.upsample_kernel_sizes),
        upsample_initial_channel=bv_cfg.upsample_initial_channel,
        resblock_kernel_sizes=list(bv_cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d)
                                 for d in bv_cfg.resblock_dilation_sizes],
        feat_upsample=False, speaker_embedding_dim=512,
        cond_d_vector_in_each_upsampling_layer=True,
        gpt_dim=bv_cfg.gpt_dim, activation="snakebeta",
        snake_logscale=True, num_mels=100)


def _small_engine_cfg():
    from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig
    from index_tts_dubbing_tpu.models.gpt import GPTConfig
    from index_tts_dubbing_tpu.utils.config import EngineConfig, MelConfig
    gpt = GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=60,
                    max_text_tokens=50, number_text_tokens=120,
                    cond_output_size=32, cond_linear_units=64,
                    cond_attention_heads=4, cond_num_blocks=2)
    bv = BigVGANConfig(gpt_dim=64, upsample_initial_channel=128)
    return EngineConfig(mel=MelConfig(), gpt=gpt, bigvgan=bv)


def _write_config_yaml(path: Path, ec) -> None:
    """Emit a config.yaml in the reference schema for this EngineConfig."""
    g, b = ec.gpt, ec.bigvgan
    cfg = {
        "dataset": {"mel": {"sample_rate": ec.mel.sample_rate,
                            "n_fft": ec.mel.n_fft,
                            "hop_length": ec.mel.hop_length,
                            "win_length": ec.mel.win_length,
                            "n_mels": ec.mel.n_mels}},
        "gpt": {
            "model_dim": g.model_dim, "layers": g.layers, "heads": g.heads,
            "max_mel_tokens": g.max_mel_tokens,
            "max_text_tokens": g.max_text_tokens,
            "number_text_tokens": g.number_text_tokens,
            "number_mel_codes": g.number_mel_codes,
            "start_mel_token": g.start_mel_token,
            "stop_mel_token": g.stop_mel_token,
            "start_text_token": g.start_text_token,
            "stop_text_token": g.stop_text_token,
            "mel_length_compression": g.mel_length_compression,
            "activation_function": g.activation,
            "condition_type": g.condition_type,
            "condition_module": {
                "output_size": g.cond_output_size,
                "linear_units": g.cond_linear_units,
                "attention_heads": g.cond_attention_heads,
                "num_blocks": g.cond_num_blocks,
                "perceiver_mult": g.perceiver_mult,
                "input_layer": "conv2d2"},
        },
        "bigvgan": {
            "gpt_dim": b.gpt_dim,
            "upsample_initial_channel": b.upsample_initial_channel,
            "upsample_rates": list(b.upsample_rates),
            "upsample_kernel_sizes": list(b.upsample_kernel_sizes),
            "resblock_kernel_sizes": list(b.resblock_kernel_sizes),
            "resblock_dilation_sizes": [list(d)
                                        for d in b.resblock_dilation_sizes],
        },
        "version": ec.version,
        "gpt_checkpoint": ec.gpt_checkpoint,
        "bigvgan_checkpoint": ec.bigvgan_checkpoint,
        "dvae_checkpoint": ec.dvae_checkpoint,
        "bpe_model": ec.bpe_model,
    }
    import yaml
    path.write_text(yaml.safe_dump(cfg, allow_unicode=True))


def fabricate(out_dir: Path, size: str, ref_path: str) -> None:
    """Fabricate real-FORMAT checkpoints: instantiate the REFERENCE torch
    modules with random init and torch.save their state dicts, exercising
    the exact torch-side loading path real checkpoints will take (incl.
    the 'model'/'generator' dict unwrap and weight-norm folding)."""
    import torch
    _load_reference(ref_path)
    from indextts.BigVGAN.models import BigVGAN
    from indextts.gpt.model import UnifiedVoice
    from indextts.vqvae.xtts_dvae import DiscreteVAE

    out_dir.mkdir(parents=True, exist_ok=True)
    if size == "small":
        ec = _small_engine_cfg()
        dvae_kw = dict(positional_dims=1, num_tokens=512, codebook_dim=64,
                       num_layers=2, num_resnet_blocks=3, hidden_dim=64,
                       channels=100, kernel_size=3, use_transposed_convs=False)
    else:
        from index_tts_dubbing_tpu.utils.config import EngineConfig
        ec = EngineConfig()
        # the production vqvae block (config.yaml:39-49)
        dvae_kw = dict(positional_dims=1, num_tokens=8192, codebook_dim=512,
                       num_layers=2, num_resnet_blocks=3, hidden_dim=512,
                       channels=100, kernel_size=3, use_transposed_convs=False)

    torch.manual_seed(7)
    uv = UnifiedVoice(**_uv_kwargs(ec.gpt))
    torch.save({"model": uv.state_dict()}, out_dir / ec.gpt_checkpoint)
    log("fabricate", f"{ec.gpt_checkpoint}: {len(uv.state_dict())} tensors")

    bv = BigVGAN(_H(_bv_kwargs(ec.bigvgan)), use_cuda_kernel=False)
    # weight norm parametrisation KEPT — real checkpoints carry weight_v/
    # weight_g and the converter must fold them
    torch.save({"generator": bv.state_dict()},
               out_dir / ec.bigvgan_checkpoint)
    log("fabricate", f"{ec.bigvgan_checkpoint}: weight-normed state dict")

    dv = DiscreteVAE(**dvae_kw)
    torch.save(dv.state_dict(), out_dir / ec.dvae_checkpoint)  # raw dict
    log("fabricate", f"{ec.dvae_checkpoint}: raw state dict")

    # tiny-but-valid sentencepiece ModelProto so TextTokenizer (not the
    # CharTokenizer fallback) is exercised
    from index_tts_dubbing_tpu.utils import sp_model
    pieces = [sp_model.Piece("<s>", 0.0, sp_model.TYPE_CONTROL),
              sp_model.Piece("</s>", 0.0, sp_model.TYPE_CONTROL),
              sp_model.Piece("<unk>", 0.0, sp_model.TYPE_UNKNOWN)]
    vocab = ["▁", "a", "b", "c", "d", "ab", "▁ab", "▁a", "▁b", "▁c", ".",
             "▁.", ",", "!", "?"]
    for i, v in enumerate(vocab):
        pieces.append(sp_model.Piece(v, -0.5 - 0.1 * i))
    (out_dir / ec.bpe_model).write_bytes(sp_model.write_model(pieces))

    _write_config_yaml(out_dir / "config.yaml", ec)
    log("fabricate", f"config.yaml + {ec.bpe_model} written → {out_dir}")


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------

def step_convert(model_dir: Path) -> None:
    from tools import convert_checkpoints
    rc = convert_checkpoints.main(["--model-dir", str(model_dir)])
    if rc not in (0, None):
        raise SystemExit(f"convert failed rc={rc}")
    for f in ("gpt.npz", "bigvgan.npz"):
        if not (model_dir / f).exists():
            raise SystemExit(f"convert produced no {f}")
    log("convert", "gpt.npz / bigvgan.npz / dvae.npz written")


def step_parity(model_dir: Path, ref_path: str, steps: int) -> None:
    import torch

    import jax
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.engine.vocoder import WindowedVocoder
    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from index_tts_dubbing_tpu.models import gpt as jgpt
    from tests.test_gpt import _ref_greedy

    _load_reference(ref_path)
    from indextts.BigVGAN.models import BigVGAN
    from indextts.gpt.model import UnifiedVoice

    eng = IndexTTS(cfg_path=str(model_dir / "config.yaml"),
                   model_dir=str(model_dir), verbose_init=False)
    cfg = eng.gpt_cfg

    uv = UnifiedVoice(**_uv_kwargs(cfg))
    sd = torch.load(model_dir / eng.cfg.gpt_checkpoint, map_location="cpu",
                    weights_only=False)
    uv.load_state_dict(sd.get("model", sd))
    uv.eval()
    bv = BigVGAN(_H(_bv_kwargs(eng.bigvgan_cfg)), use_cuda_kernel=False)
    sd = torch.load(model_dir / eng.cfg.bigvgan_checkpoint,
                    map_location="cpu", weights_only=False)
    bv.load_state_dict(sd.get("generator", sd))
    bv.remove_weight_norm()
    bv.eval()

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 100, 70)).astype(np.float32)
    text = rng.integers(2, cfg.number_text_tokens, size=10).astype(np.int64)

    # conditioning parity
    with torch.no_grad():
        conds_ref = uv.get_conditioning(torch.from_numpy(mel),
                                        torch.tensor([70])).numpy()
    conds = jgpt.get_conditioning(eng.params["gpt"], cfg,
                                  mel.transpose(0, 2, 1),
                                  np.array([70], np.int64))
    np.testing.assert_allclose(np.asarray(conds), conds_ref, atol=2e-4,
                               rtol=1e-3)
    log("parity", "conditioning allclose (atol 2e-4)")

    # greedy decode token parity
    ref_codes = _ref_greedy(uv, mel, text[None, :], steps)[0]
    pre = decode_mod.prepare_prefix_host(cfg, [text.astype(np.int32)])
    emb, keep = decode_mod.build_prefix_emb(
        eng.params["gpt"], cfg, conds, *[np.asarray(pre[k]) for k in
                                         ("ids", "pos", "seg", "cond_idx")])
    sc = decode_mod.SamplingConfig(do_sample=False, max_mel_tokens=steps)
    got = decode_mod.generate(eng.params["gpt"], cfg, sc, emb, keep,
                              jax.random.PRNGKey(0))
    got_codes = np.asarray(got.codes)[0]
    n = min(len(ref_codes), len(got_codes))
    assert (got_codes[:n] == ref_codes[:n]).all(), \
        f"greedy token mismatch: ref {ref_codes[:n]} vs {got_codes[:n]}"
    log("parity", f"greedy decode token parity ({n} steps)")

    # waveform parity on the shared codes
    stop = np.nonzero(ref_codes == cfg.stop_mel_token)[0]
    code_len = int(stop[0]) if stop.size else len(ref_codes)
    if code_len == 0:
        log("parity", "WARNING: model emitted stop at step 0 — skipping "
                      "waveform leg (fabricated weights can do this)")
        return
    codes = ref_codes[:code_len]
    with torch.no_grad():
        latent_t = uv(torch.from_numpy(mel), torch.from_numpy(text[None, :]),
                      torch.tensor([text.size]),
                      torch.from_numpy(codes[None, :].astype(np.int64)),
                      torch.tensor([code_len * cfg.mel_length_compression]),
                      cond_mel_lengths=torch.tensor([70]),
                      return_latent=True, clip_inputs=False)
        wav_t, _ = bv(latent_t, torch.from_numpy(mel.transpose(0, 2, 1)))
    wav_ref = wav_t.numpy()[0, 0]
    lat = jgpt.forward_latent_bucketed(
        eng.params["gpt"], cfg, conds, text[None, :].astype(np.int32),
        np.array([text.size], np.int64), codes[None, :].astype(np.int32),
        np.array([code_len], np.int64))
    voc = WindowedVocoder(eng.params["bigvgan"], eng.bigvgan_cfg,
                          layout="ref")
    wav = voc(np.asarray(lat)[0, :code_len],
              mel_ref=mel.transpose(0, 2, 1))
    np.testing.assert_allclose(wav, wav_ref[:wav.size], atol=3e-3)
    log("parity", f"WAVEFORM allclose over {wav.size} samples (atol 3e-3)")


def step_seedtest(model_dir: Path, asr: str, n_cases: int) -> None:
    import tempfile

    from index_tts_dubbing_tpu.utils.audio import write_wav
    from tools import seedtest_eval

    tmp = Path(tempfile.mkdtemp(prefix="validate_seed_"))
    rng = np.random.default_rng(1)
    voice = tmp / "voice.wav"
    write_wav(voice, (rng.standard_normal(24000) * 3000).astype(np.int16),
              24000)
    cases = tmp / "cases.jsonl"
    src = (REPO / "tests" / "cases.jsonl").read_text().splitlines()
    cases.write_text("\n".join(src[:n_cases]) + "\n")
    out = model_dir / "seedtest.json"
    rc = seedtest_eval.main(["--model-dir", str(model_dir),
                             "--voice", str(voice), "--cases", str(cases),
                             "--asr", asr, "--out", str(out)])
    if rc not in (0, None):
        raise SystemExit(f"seedtest failed rc={rc}")
    rep = json.loads(out.read_text())
    log("seedtest", f"report → {out} "
        f"(aggregate keys: {sorted(rep.get('aggregate', rep).keys())})")


def step_int8(model_dir: Path, steps: int, expect_trained: bool) -> None:
    from tools import int8_accept
    try:
        rc = int8_accept.main(["--model-dir", str(model_dir),
                               "--steps", str(steps)])
        passed = rc in (0, None)
    except SystemExit as e:
        passed = e.code in (0, None)
    if expect_trained and not passed:
        raise SystemExit("int8 acceptance FAILED on a trained checkpoint")
    log("int8", "acceptance " + ("PASS" if passed else
        "FAIL (EXPECTED on random/fabricated weights — near-uniform logits; "
        "gate applies to trained checkpoints via --expect-trained)"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--fabricate", default=None, metavar="DIR",
                    help="fabricate real-format checkpoints into DIR, then "
                         "run the drill against them")
    ap.add_argument("--size", choices=("small", "full"), default="small",
                    help="fabricated model size (small: rehearsal; full: "
                         "production-shaped)")
    ap.add_argument("--ref", default="/root/reference",
                    help="reference implementation path (parity gate)")
    ap.add_argument("--steps", type=int, default=16,
                    help="greedy decode steps for the parity gate")
    ap.add_argument("--asr", default="none")
    ap.add_argument("--seed-cases", type=int, default=3,
                    help="seed-test cases to run (all on a real sweep)")
    ap.add_argument("--expect-trained", action="store_true",
                    help="gate on int8 acceptance (real checkpoints)")
    args = ap.parse_args(argv)

    t0 = time.time()
    if args.fabricate:
        model_dir = Path(args.fabricate)
        fabricate(model_dir, args.size, args.ref)
    elif args.model_dir:
        model_dir = Path(args.model_dir)
    else:
        ap.error("pass --model-dir (real checkpoints) or --fabricate DIR")

    step_convert(model_dir)
    step_parity(model_dir, args.ref, args.steps)
    step_seedtest(model_dir, args.asr, args.seed_cases)
    step_int8(model_dir, args.steps, args.expect_trained)
    log("done", f"ALL STEPS GREEN in {time.time() - t0:.0f}s "
                f"(model_dir={model_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Quality sweep runner: WER / speaker-similarity / RTF over a case corpus.

This is the executable counterpart of the reference's published seed-test
tables (README.md:56-98 — WER zh/en/hard, speaker similarity): synthesize
every case, transcribe with a pluggable ASR, score WER against the input
text, score speaker similarity against the prompt, report per-case and
aggregate numbers as JSON.

ASR options (offline environment friendly):
  --asr hf:<model-id-or-path>   local HF speech2text pipeline (if installed)
  --asr none                    skip WER (SS + RTF only)
  --transcripts file.jsonl      pre-computed {"idx": i, "text": ...} lines

Usage:
  python tools/seedtest_eval.py --model-dir checkpoints --voice spk.wav \
      [--cases tests/cases.jsonl] [--out outputs/seedtest.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_asr(spec: str):
    if spec == "none":
        return None
    if spec.startswith("hf:"):
        from transformers import pipeline
        pipe = pipeline("automatic-speech-recognition", model=spec[3:])

        def asr(wav, sr):
            return pipe({"array": wav, "sampling_rate": sr})["text"]

        return asr
    raise SystemExit(f"unknown --asr spec: {spec}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="checkpoints")
    ap.add_argument("--voice", required=False, default=None)
    ap.add_argument("--cases", default="tests/cases.jsonl")
    ap.add_argument("--out", default="outputs/seedtest.json")
    ap.add_argument("--asr", default="none")
    ap.add_argument("--transcripts", default=None)
    ap.add_argument("--max-mel-tokens", type=int, default=600)
    ap.add_argument("--fast", action="store_true",
                    help="use infer_fast for every case")
    args = ap.parse_args(argv)

    import numpy as np
    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from index_tts_dubbing_tpu.eval.speaker_sim import (
        make_ecapa_embedder, speaker_similarity)
    from index_tts_dubbing_tpu.eval.wer import wer
    from index_tts_dubbing_tpu.utils.audio import read_wav, write_wav

    model_dir = args.model_dir if Path(args.model_dir).is_dir() else None
    cfg = (str(Path(args.model_dir) / "config.yaml")
           if model_dir and (Path(args.model_dir) / "config.yaml").exists()
           else None)
    tts = IndexTTS(cfg_path=cfg, model_dir=model_dir, verbose_init=False)

    voice = args.voice
    if voice is None:
        Path("outputs").mkdir(exist_ok=True)
        voice = "outputs/_synthetic_prompt.wav"
        rng = np.random.default_rng(0)
        write_wav(voice,
                  (rng.standard_normal(24000) * 0.05).astype(np.float32),
                  24000)
        print(f">> no --voice; synthetic prompt {voice}", file=sys.stderr)

    asr = build_asr(args.asr)
    transcripts = {}
    if args.transcripts:
        for line in Path(args.transcripts).read_text().splitlines():
            if line.strip():
                d = json.loads(line)
                transcripts[int(d["idx"])] = d["text"]

    embed = make_ecapa_embedder(tts.params["bigvgan"]["speaker_encoder"],
                                tts.mel_fn)
    prompt_wav, prompt_sr = read_wav(voice)
    prompt_wav = np.asarray(prompt_wav, np.float32)
    if prompt_wav.ndim > 1:
        prompt_wav = prompt_wav.mean(axis=-1)
    if prompt_wav.dtype == np.int16:
        prompt_wav = prompt_wav.astype(np.float32) / 32768.0

    cases = [json.loads(l) for l in Path(args.cases).read_text(
        encoding="utf-8").splitlines() if l.strip()]
    rows = []
    for i, case in enumerate(cases):
        text = case["text"]
        fn = tts.infer_fast if (args.fast or case.get("infer_mode")
                                == "批次推理") else tts.infer
        t0 = time.perf_counter()
        sr, wav = fn(voice, text, None, max_mel_tokens=args.max_mel_tokens)
        dt = time.perf_counter() - t0
        wav_f = wav.reshape(-1).astype(np.float32) / 32768.0
        row = {"idx": i, "text": text,
               "audio_seconds": round(len(wav_f) / sr, 3),
               "rtf": round(dt / max(len(wav_f) / sr, 1e-9), 4)}
        hyp = transcripts.get(i)
        if hyp is None and asr is not None:
            hyp = asr(wav_f, sr)
        if hyp is not None:
            row["transcript"] = hyp
            row["wer"] = round(wer(text, hyp), 4)
        row["speaker_similarity"] = round(speaker_similarity(
            prompt_wav, prompt_sr, wav_f, sr, embed), 4)
        rows.append(row)
        print(f">> [{i + 1}/{len(cases)}] rtf={row['rtf']} "
              f"ss={row['speaker_similarity']} wer={row.get('wer', '-')}",
              file=sys.stderr)

    wers = [r["wer"] for r in rows if "wer" in r]
    report = {
        "cases": rows,
        "aggregate": {
            "n": len(rows),
            "wer_avg": round(sum(wers) / len(wers), 4) if wers else None,
            "speaker_similarity_avg": round(
                sum(r["speaker_similarity"] for r in rows) / len(rows), 4),
            "rtf_avg": round(sum(r["rtf"] for r in rows) / len(rows), 4),
        },
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, ensure_ascii=False, indent=1))
    print(json.dumps(report["aggregate"], ensure_ascii=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

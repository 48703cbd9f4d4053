"""End-to-end smoke/regression runner (spec: tests/regression_test.py of the
reference): synthesize the canonical case list through both infer and
infer_fast into outputs/. Requires converted checkpoints for meaningful audio;
runs with random weights otherwise (pipeline exercise only).

Usage: python tools/regression_test.py [--model-dir checkpoints] [--voice X.wav]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", default="checkpoints")
    parser.add_argument("--voice", default=None)
    parser.add_argument("--outputs", default="outputs")
    parser.add_argument("--cases", default="tests/cases.jsonl")
    parser.add_argument("--max-mel-tokens", type=int, default=600)
    args = parser.parse_args(argv)

    import numpy as np
    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from index_tts_dubbing_tpu.utils.audio import write_wav

    model_dir = args.model_dir if Path(args.model_dir).is_dir() else None
    cfg = (str(Path(args.model_dir) / "config.yaml")
           if model_dir and (Path(args.model_dir) / "config.yaml").exists()
           else None)
    tts = IndexTTS(cfg_path=cfg, model_dir=model_dir)

    voice = args.voice
    if voice is None:
        voice = str(Path(args.outputs) / "_synthetic_prompt.wav")
        rng = np.random.default_rng(0)
        write_wav(voice, (rng.standard_normal(24000) * 0.05).astype(np.float32),
                  24000)
        print(f">> no --voice given; using synthetic prompt {voice}")

    cases = [json.loads(l) for l in Path(args.cases).read_text(
        encoding="utf-8").splitlines() if l.strip()]
    out_dir = Path(args.outputs)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    for i, case in enumerate(cases):
        fast = case.get("infer_mode") == "批次推理"
        fn = tts.infer_fast if fast else tts.infer
        out = out_dir / f"case_{i:02d}{'_fast' if fast else ''}.wav"
        print(f">> [{i + 1}/{len(cases)}] {'fast' if fast else 'std '} "
              f"{case['text'][:40]}")
        fn(voice, case["text"], str(out),
           max_mel_tokens=args.max_mel_tokens)
    print(f">> regression sweep done in {time.perf_counter() - t0:.1f}s "
          f"→ {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

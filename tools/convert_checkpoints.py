"""One-time torch→JAX checkpoint conversion CLI.

Converts the reference's gpt.pth / bigvgan_generator.pth / dvae.pth into this
framework's .npz param trees (weight-norm folded). Torch is required only
here, never at inference.

Usage:
    python tools/convert_checkpoints.py --model-dir checkpoints \
        [--out-dir checkpoints]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--config", default=None,
                        help="config.yaml (default: <model-dir>/config.yaml)")
    args = parser.parse_args(argv)

    from index_tts_dubbing_tpu.utils.checkpoint import save_params
    from index_tts_dubbing_tpu.utils.config import load_config, EngineConfig
    from index_tts_dubbing_tpu.utils.convert import (
        convert_bigvgan, convert_dvae, convert_unified_voice,
        load_torch_state_dict)

    model_dir = Path(args.model_dir)
    out_dir = Path(args.out_dir or args.model_dir)
    cfg_path = Path(args.config or model_dir / "config.yaml")
    cfg = load_config(cfg_path) if cfg_path.exists() else EngineConfig()

    gpt_pth = model_dir / cfg.gpt_checkpoint
    if gpt_pth.exists():
        print(f"converting {gpt_pth} ...")
        params = convert_unified_voice(
            load_torch_state_dict(str(gpt_pth)), layers=cfg.gpt.layers,
            cond_blocks=cfg.gpt.cond_num_blocks)
        save_params(out_dir / "gpt.npz", params)
        print(f"  → {out_dir / 'gpt.npz'}")
    else:
        print(f"skip: {gpt_pth} not found")

    bv_pth = model_dir / cfg.bigvgan_checkpoint
    if bv_pth.exists():
        print(f"converting {bv_pth} ...")
        params = convert_bigvgan(
            load_torch_state_dict(str(bv_pth)),
            num_upsamples=cfg.bigvgan.num_upsamples,
            num_kernels=cfg.bigvgan.num_kernels)
        save_params(out_dir / "bigvgan.npz", params)
        print(f"  → {out_dir / 'bigvgan.npz'}")
    else:
        print(f"skip: {bv_pth} not found")

    dvae_pth = model_dir / cfg.dvae_checkpoint
    if dvae_pth.exists():
        print(f"converting {dvae_pth} ...")
        params = convert_dvae(load_torch_state_dict(str(dvae_pth)))
        save_params(out_dir / "dvae.npz", params)
        print(f"  → {out_dir / 'dvae.npz'}")
    else:
        print(f"skip: {dvae_pth} not found")
    return 0


if __name__ == "__main__":
    sys.exit(main())

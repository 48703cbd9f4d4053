"""Config system: one YAML (the reference's checkpoints/config.yaml schema,
config.yaml:1-113) → typed dataclasses for every subsystem."""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from index_tts_dubbing_tpu.models.bigvgan import BigVGANConfig
from index_tts_dubbing_tpu.models.gpt import GPTConfig


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 100
    mel_fmin: float = 0.0


@dataclass(frozen=True)
class EngineConfig:
    mel: MelConfig = field(default_factory=MelConfig)
    gpt: GPTConfig = field(default_factory=GPTConfig)
    bigvgan: BigVGANConfig = field(default_factory=BigVGANConfig)
    version: float = 1.5
    bpe_model: str = "bpe.model"
    gpt_checkpoint: str = "gpt.pth"
    bigvgan_checkpoint: str = "bigvgan_generator.pth"
    dvae_checkpoint: str = "dvae.pth"


def load_config(path: str | Path) -> EngineConfig:
    raw: Dict[str, Any] = yaml.safe_load(Path(path).read_text())
    ds = raw.get("dataset", {})
    mel_raw = ds.get("mel", {})
    mel = MelConfig(
        sample_rate=mel_raw.get("sample_rate", 24000),
        n_fft=mel_raw.get("n_fft", 1024),
        hop_length=mel_raw.get("hop_length", 256),
        win_length=mel_raw.get("win_length", 1024),
        n_mels=mel_raw.get("n_mels", 100),
        mel_fmin=mel_raw.get("mel_fmin", 0.0),
    )
    g = raw.get("gpt", {})
    cm = g.get("condition_module", {})
    gpt = GPTConfig(
        model_dim=g.get("model_dim", 1024),
        layers=g.get("layers", 20),
        heads=g.get("heads", 16),
        max_mel_tokens=g.get("max_mel_tokens", 605),
        max_text_tokens=g.get("max_text_tokens", 402),
        number_text_tokens=g.get("number_text_tokens", 12000),
        number_mel_codes=g.get("number_mel_codes", 8194),
        start_mel_token=g.get("start_mel_token", 8192),
        stop_mel_token=g.get("stop_mel_token", 8193),
        start_text_token=g.get("start_text_token", 0),
        stop_text_token=g.get("stop_text_token", 1),
        mel_length_compression=g.get("mel_length_compression", 1024),
        activation=g.get("activation_function", "gelu_pytorch_tanh"),
        cond_output_size=cm.get("output_size", 512),
        cond_linear_units=cm.get("linear_units", 2048),
        cond_attention_heads=cm.get("attention_heads", 8),
        cond_num_blocks=cm.get("num_blocks", 6),
        perceiver_mult=cm.get("perceiver_mult", 2),
        condition_type=g.get("condition_type", "conformer_perceiver"),
    )
    b = raw.get("bigvgan", {})
    bigvgan = BigVGANConfig(
        gpt_dim=b.get("gpt_dim", 1024),
        upsample_initial_channel=b.get("upsample_initial_channel", 1536),
        upsample_rates=tuple(b.get("upsample_rates", (4, 4, 4, 4, 2, 2))),
        upsample_kernel_sizes=tuple(b.get("upsample_kernel_sizes", (8, 8, 4, 4, 4, 4))),
        resblock_kernel_sizes=tuple(b.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilation_sizes=tuple(tuple(d) for d in
                                      b.get("resblock_dilation_sizes",
                                            ((1, 3, 5),) * 3)),
        num_mels=b.get("num_mels", 100),
        speaker_embedding_dim=b.get("speaker_embedding_dim", 512),
        activation=b.get("activation", "snakebeta"),
        snake_logscale=b.get("snake_logscale", True),
        cond_in_each_up_layer=b.get("cond_d_vector_in_each_upsampling_layer", True),
    )
    return EngineConfig(
        mel=mel, gpt=gpt, bigvgan=bigvgan,
        version=raw.get("version", 1.5),
        bpe_model=ds.get("bpe_model", "bpe.model"),
        gpt_checkpoint=raw.get("gpt_checkpoint", "gpt.pth"),
        bigvgan_checkpoint=raw.get("bigvgan_checkpoint", "bigvgan_generator.pth"),
        dvae_checkpoint=raw.get("dvae_checkpoint", "dvae.pth"),
    )

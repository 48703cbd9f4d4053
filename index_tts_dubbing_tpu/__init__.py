"""index_tts_dubbing_tpu — a TPU-native zero-shot TTS + SRT dubbing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
IndexTTS + srt_dubbing stack (see SURVEY.md):

- ``models``   — UnifiedVoice GPT decoder, conformer+perceiver conditioning,
                 BigVGAN2 vocoder, ECAPA-TDNN speaker encoder, DVAE codec.
- ``ops``      — TPU compute primitives: mel spectrogram, anti-aliased snake
                 (Pallas + XLA paths), sampling kernels, resampling.
- ``engine``   — inference orchestration: KV-cache AR decode, static-shape
                 bucketing, chunked vocoding, RTF accounting.
- ``parallel`` — jax.sharding meshes, DP/TP partition specs, multi-host init.
- ``dubbing``  — SRT/TXT parsing, time-sync strategies, audio merge/export.
- ``utils``    — text normalizer/tokenizer, audio IO, config, logging.
"""

__version__ = "0.1.0"

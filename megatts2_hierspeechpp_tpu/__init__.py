"""megatts2_hierspeechpp_tpu — a TPU-native (JAX/XLA/Pallas) zero-shot TTS framework.

A from-scratch re-design of the capabilities of liuhuang31/Megatts2_HierSpeechpp:
a MegaTTS2-style acoustic stage (text -> wav2vec2 semantic features + f0, with an
RVQ prosody codec and an autoregressive prosody LM) feeding the HierSpeech++
hierarchical-VAE vocoder ((w2v, f0) -> 16 kHz waveform), plus 24k/48k speech
super-resolution heads and an MP-SENet denoiser.

Layout conventions (TPU-first, differs from the torch reference on purpose):
  - activations are channels-last (B, T, C) so the feature dim maps to lanes;
  - all sequence ops take explicit `lengths`/boolean masks, static shapes;
  - parameters are fp32; compute dtype is configurable (bf16 on TPU).
"""

__version__ = "0.1.0"

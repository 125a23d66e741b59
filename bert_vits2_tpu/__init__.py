"""bert_vits2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multilingual VITS2 TTS framework.

A from-scratch reimplementation of the capabilities of fishaudio/Bert-VITS2 v2.3
(reference layout documented in SURVEY.md), designed TPU-first:

- channel-last [batch, time, channels] layout everywhere (XLA/TPU friendly),
- static shapes + masking discipline (length-bucketed inference),
- monotonic alignment search on-device (lax.scan wavefront + Pallas kernel),
- matmul-STFT/mel riding the MXU,
- a single jitted GAN training step over a (data, model) jax.sharding.Mesh.
"""

__version__ = "0.1.0"

"""blt_vqg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
information-maximizing visual question generation.

Re-designed from scratch for TPU with the capabilities of the reference
BLT-VQG codebase (see SURVEY.md): a variational transformer that generates a
question about an image conditioned on an answer (or answer category),
trained with a two-phase schedule (transformer pretraining, then latent-z
training with annealed KL + auxiliary losses).

Layering (lowest to highest):
  core/      config, PRNG threading, checkpointing, metric logging
  text/      vocabulary, tokenizer, GloVe embedding loading
  data/      offline ETL to hdf5, host loader, on-device augmentation
  ops/       transformer building blocks, Pallas kernels, latent VAE ops
  models/    the IQ composite model (encoders + latent + decoder + recon)
  parallel/  mesh construction and sharding rules (DP/TP over ICI)
  train/     jitted train/eval steps, losses, schedules, NLG metrics
  cli/       entry points mirroring the reference scripts' flag surface
"""

__version__ = "0.1.0"

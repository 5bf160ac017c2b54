"""s2st_tpu: a TPU-native (JAX/XLA/Pallas/pjit) speech-to-speech translation framework.

Re-implements the capabilities of fengpeng-yue/speech-to-speech-translation
(a fairseq fork for direct S2ST, arXiv 2205.08993) with a TPU-first design:

- pure-functional models over param pytrees (no torch),
- one jitted train step over a ``jax.sharding.Mesh`` (data/fsdp/model axes)
  instead of DDP/FSDP/Megatron wrappers,
- static-shape bucketed batching instead of dynamic token-budget batches,
- ``lax.while_loop`` autoregressive decoding with preallocated KV caches,
- on-device DSP (log-mel, Griffin-Lim, MCD-DTW) as XLA/Pallas programs.

Reference layer map: see /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

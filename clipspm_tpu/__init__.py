"""clipspm_tpu — a TPU-native few-shot action recognition (FSAR) framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the CLIP-SPM
reference codebase (episodic N-way K-shot video classification with CLIP /
ResNet backbones and ten matching heads), designed TPU-first:

- static-shape episodic pipelines that compile once under ``jax.jit``
- bf16 MXU-friendly backbones (CLIP RN50 / ViT-B/16, torchvision-style RN50)
- the OTAM / SoftDTW temporal-alignment dynamic programs as batched
  wavefront kernels (``lax.scan`` oracle + Pallas TPU kernels)
- SPMD scaling over a ``jax.sharding.Mesh`` episode axis instead of
  host-side DataParallel.

Package layout:
    utils/     config system, logging, metrics
    ops/       alignment kernels (OTAM, SoftDTW), fused distance ops
    data/      split catalogs, episodic sampler, device-side transforms
    models/    backbones (CLIP RN50/ViT, ResNet), shared blocks, heads
    parallel/  mesh construction and sharding policies
    train/     learner (train/eval loops), losses, optimizers, checkpoints
    cli/       config-driven entry point (run.py parity)
"""

__version__ = "0.1.0"

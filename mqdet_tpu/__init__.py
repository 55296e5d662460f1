"""mqdet_tpu — a TPU-native JAX framework with the capabilities of MQ-Det.

MQ-Det ("Multi-modal Queried Object Detection in the Wild", NeurIPS 2023)
augments frozen language-queried detectors (GLIP / GroundingDINO) with visual
exemplar queries via a Gated Class-scalable Perceiver (GCP).

This package is a from-scratch TPU-first rebuild:
  * compute path: JAX / XLA / Pallas, bf16 on the MXU, static shapes;
  * parallelism: `jax.sharding.Mesh` + collectives over ICI (no NCCL);
  * runtime: host-side C++ helpers where the reference used CUDA/C++.

Layout:
  core/      config tree, box ops, fixed-capacity detection arrays
  ops/       kernels: class-aware NMS, ROIAlign, focal losses, deform conv,
             multi-scale deformable attention (XLA composites + Pallas)
  models/    flax modules: Swin, FPN, BERT(+GCP), VLDyHead, GroundingDINO
  mq/        query bank, selector, extraction, online update
  data/      dataset readers, od->grounding captions, transforms, batching
  engine/    jit'd predict/train steps, evaluation loops
  parallel/  mesh construction and sharding rules
  io/        torch-checkpoint importer, bank importer, orbax checkpoints
"""

__version__ = "0.1.0"

"""dvt_tpu: TPU-native Denoising Vision Transformers.

A from-scratch JAX/XLA/Pallas re-design of the DVT pipeline
(reference: Jiawei-Yang/Denoising-ViT):

  stage 1  per-image artifact decomposition via a multiresolution hash-grid
           neural field  -> jit(vmap(fit)) over many images per chip
  stage 2  generalizable single-block denoiser   -> data-parallel pjit
  stage 3  full-backbone distillation            -> data-parallel pjit + remat

Sub-packages
  models    ViT backbone zoo, neural field, offline/online denoisers
  ops       hash encoding, grid sampling, pos-embed resampling, attention
  parallel  mesh construction and sharding helpers
  data      host-side image pipelines (crops + patch-center coordinates)
  train     optimizers, schedules, checkpointing, metric logging
  eval      dense-task linear-probe evaluation (seg / depth / detection)
  utils     visualization (PCA / cluster / norm / similarity panels)
"""

__version__ = "0.1.0"

from dvt_tpu.models.zoo import MODEL_LIST  # noqa: F401

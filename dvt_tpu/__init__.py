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

_LAZY = {
    "ViTWrapper": "dvt_tpu.models.vit",
    "VisionTransformer": "dvt_tpu.models.vit",
    "SingleImageDenoiser": "dvt_tpu.models.offline_denoiser",
    "NeuralFeatureField": "dvt_tpu.models.neural_field",
    "Denoiser": "dvt_tpu.models.online_denoiser",
    "DenoisingPipeline": "dvt_tpu.models.online_denoiser",
    "Stage1Engine": "dvt_tpu.engine",
    "Stage1Config": "dvt_tpu.stage1",
    "Stage2Trainer": "dvt_tpu.stage2",
    "Stage2Config": "dvt_tpu.stage2",
    "Stage3Trainer": "dvt_tpu.stage3",
    "Stage3Config": "dvt_tpu.stage3",
    "make_mesh": "dvt_tpu.parallel.mesh",
}


def __getattr__(name):
    """Lazy top-level API (keeps `import dvt_tpu` light)."""
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'dvt_tpu' has no attribute {name!r}")

from dvt_tpu.models.zoo import MODEL_LIST, ViTConfig, get_model_config
from dvt_tpu.models.vit import VisionTransformer, ViTWrapper
from dvt_tpu.models.neural_field import NeuralFeatureField
from dvt_tpu.models.offline_denoiser import SingleImageDenoiser
from dvt_tpu.models.online_denoiser import Denoiser

__all__ = [
    "MODEL_LIST",
    "ViTConfig",
    "get_model_config",
    "VisionTransformer",
    "ViTWrapper",
    "NeuralFeatureField",
    "SingleImageDenoiser",
    "Denoiser",
]

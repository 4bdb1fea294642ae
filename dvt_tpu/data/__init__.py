from dvt_tpu.data.crops import (
    CropSampler,
    render_crops,
    view_coordinate_grids,
)
from dvt_tpu.data.single_image import SingleImagePipeline, load_image
from dvt_tpu.data.paired_list import PairedListDataset
from dvt_tpu.data.imagefolder import ImageFolderDataset
from dvt_tpu.data.samplers import InfiniteSampler, DistributedInfiniteSampler

__all__ = [
    "CropSampler",
    "render_crops",
    "view_coordinate_grids",
    "SingleImagePipeline",
    "load_image",
    "PairedListDataset",
    "ImageFolderDataset",
    "InfiniteSampler",
    "DistributedInfiniteSampler",
]

from dvt_tpu.ops.resample import resample_abs_pos_embed
from dvt_tpu.ops.grid_sample import grid_sample_2d
from dvt_tpu.ops.hash_encoding import (
    HashGridSpec,
    hash_encode,
    init_hash_table,
)

__all__ = [
    "resample_abs_pos_embed",
    "grid_sample_2d",
    "HashGridSpec",
    "hash_encode",
    "init_hash_table",
]

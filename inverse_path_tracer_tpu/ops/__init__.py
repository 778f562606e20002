from inverse_path_tracer_tpu.ops.intersect import (
    intersect_brute,
    intersect_fast,
    smooth_normal,
)
from inverse_path_tracer_tpu.ops.sampling import (
    rotate_z_to,
    sample_next_dir,
    sample_emissive_point,
)
from inverse_path_tracer_tpu.ops.bsdf import bsdf_diagonal
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean, tonemap_to_uint8

__all__ = [
    "intersect_brute",
    "intersect_fast",
    "smooth_normal",
    "rotate_z_to",
    "sample_next_dir",
    "sample_emissive_point",
    "bsdf_diagonal",
    "tonemap_mean",
    "tonemap_to_uint8",
]

from inverse_path_tracer_tpu.parallel.shard import (
    make_mesh,
    render_samples_sharded,
    render_image_sharded,
    make_recover_step,
)

__all__ = [
    "make_mesh",
    "render_samples_sharded",
    "render_image_sharded",
    "make_recover_step",
]

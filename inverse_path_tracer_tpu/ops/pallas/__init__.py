from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
    pallas_available,
    render_tile_pallas,
)

__all__ = ["pallas_available", "render_tile_pallas"]

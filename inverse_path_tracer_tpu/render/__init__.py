from inverse_path_tracer_tpu.render.forward import (
    render_samples,
    render_image,
    render_to_png,
)

__all__ = ["render_samples", "render_image", "render_to_png"]

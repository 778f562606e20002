from inverse_path_tracer_tpu.data.pipeline import (
    generate_files,
    generate_data,
    render_with_materials,
    load_image01,
)

__all__ = [
    "generate_files",
    "generate_data",
    "render_with_materials",
    "load_image01",
]

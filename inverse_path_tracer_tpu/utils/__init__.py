from inverse_path_tracer_tpu.utils.metrics import MetricsLogger
from inverse_path_tracer_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["MetricsLogger", "save_checkpoint", "load_checkpoint"]

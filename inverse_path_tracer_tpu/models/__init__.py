from inverse_path_tracer_tpu.models.gcn import (
    build_dense_graph,
    init_gcn,
    gcn_forward,
    gcn_loss,
    make_gcn_train_step,
)

__all__ = [
    "build_dense_graph",
    "init_gcn",
    "gcn_forward",
    "gcn_loss",
    "make_gcn_train_step",
]

"""Utilities layer (reference parity: ``src/utils/__init__.py:2-3``)."""

from nbody_gnn_hpc_tpu.utils.metrics import (compute_all_metrics, compute_mae,
                                             compute_energy_error,
                                             compute_momentum_error,
                                             compute_rmse,
                                             compute_trajectory_divergence,
                                             format_metrics_report)
from nbody_gnn_hpc_tpu.utils.html_viewer import export_interactive_html
from nbody_gnn_hpc_tpu.utils.profiling import StageTimer, annotate, device_trace

__all__ = [
    "compute_rmse", "compute_mae", "compute_energy_error",
    "compute_momentum_error", "compute_trajectory_divergence",
    "compute_all_metrics", "format_metrics_report",
    "StageTimer", "device_trace", "annotate", "export_interactive_html",
]


def __getattr__(name):
    # Lazy import: Visualizer pulls in matplotlib, which the compute path
    # must not depend on.
    if name == "Visualizer":
        from nbody_gnn_hpc_tpu.utils.visualization import Visualizer

        return Visualizer
    raise AttributeError(name)

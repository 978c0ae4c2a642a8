"""Utilities: metrics, visualization, data acquisition, logging, checkpoints.

Mirrors the reference public surface (reference: utils/__init__.py:17-28).
"""

from rectified_flow_vision_tpu.utils.metrics import (  # noqa: F401
    MetricsCalculator,
    benchmark_models,
)
from rectified_flow_vision_tpu.utils.visualization import (  # noqa: F401
    plot_speed_comparison,
    plot_quality_vs_speed,
    plot_generated_samples,
    plot_trajectory_comparison,
    create_summary_report,
)
from rectified_flow_vision_tpu.utils.download_data import download_data  # noqa: F401
from rectified_flow_vision_tpu.utils.logging_config import (  # noqa: F401
    setup_logger,
    get_logger,
    logger,
)

__all__ = [
    "MetricsCalculator",
    "benchmark_models",
    "plot_speed_comparison",
    "plot_quality_vs_speed",
    "plot_generated_samples",
    "plot_trajectory_comparison",
    "create_summary_report",
    "download_data",
    "setup_logger",
    "get_logger",
    "logger",
]

"""Drop-in alias for the reference's top-level ``utils`` package
(reference: utils/__init__.py:17-28). Implementation:
``rectified_flow_vision_tpu.utils``."""

from rectified_flow_vision_tpu.utils import (  # noqa: F401
    MetricsCalculator,
    benchmark_models,
    plot_speed_comparison,
    plot_quality_vs_speed,
    plot_generated_samples,
    plot_trajectory_comparison,
    create_summary_report,
    download_data,
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

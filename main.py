"""Main script: the complete Flow Distillation pipeline, TPU-native.

CLI parity with the reference main.py (flags at reference main.py:77-84):

    python main.py                    # Full pipeline
    python main.py --skip-training    # Benchmark only (needs checkpoints)
    python main.py --skip-download    # Keep existing data
    python main.py --quick            # Reduced config for a fast demo
    python main.py --offline          # Synthetic data, no network

Steps: 1) download/generate data, 2) train base flow model, 3) train
rectified model (Reflow), 4) comparative benchmark + report. Unlike the
reference, the --quick overlay config written to configs/config_quick.yaml
is also the config actually used (the reference writes it but never reads
it back, reference main.py:104-107).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from rectified_flow_vision_tpu.parallel.mesh import maybe_init_distributed

# Multi-host init must precede any XLA backend use (including jax.devices()).
maybe_init_distributed()

from rectified_flow_vision_tpu.config import (
    QUICK_CONFIG_PATH,
    load_config,
    quick_overlay,
)
from rectified_flow_vision_tpu.utils.logging_config import setup_logger

logger = setup_logger("flow_vision", log_file="logs/flow_vision.log")


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Flow Distillation - Complete Pipeline (TPU-native)"
    )
    parser.add_argument(
        "--skip-training", action="store_true",
        help="Skip training and only run benchmark",
    )
    parser.add_argument(
        "--skip-download", action="store_true", help="Skip data download"
    )
    parser.add_argument(
        "--quick", action="store_true",
        help="Quick mode with fewer epochs for demo",
    )
    parser.add_argument(
        "--offline", action="store_true",
        help="Use synthetic data without internet connection",
    )
    parser.add_argument(
        "--config", default=None, metavar="YAML",
        help="Config file (default: configs/config.yaml); e.g. "
        "configs/config_cifar32.yaml or configs/config_dit256.yaml",
    )
    args = parser.parse_args()

    logger.info("=" * 60)
    logger.info("   FLOW DISTILLATION - Rectified Flow Testing (TPU)")
    logger.info("=" * 60)

    import jax

    logger.info("Backend: %s", jax.default_backend())
    logger.info("Devices: %s", jax.devices())

    config = load_config(args.config)
    if args.quick:
        logger.info("QUICK MODE activated - Reduced configuration for demo")
        config = quick_overlay(config)
        config.save(QUICK_CONFIG_PATH)  # written AND used (fixes ref quirk)

    # STEP 1: data
    if not args.skip_download:
        logger.info("=" * 60)
        logger.info("STEP 1: Preparing test data")
        logger.info("=" * 60)
        from rectified_flow_vision_tpu.utils.download_data import download_data

        download_data(use_online=not args.offline, config_path=args.config)

    # STEP 2 + 3: training
    if not args.skip_training:
        logger.info("=" * 60)
        logger.info("STEP 2: Training base Flow model")
        logger.info("=" * 60)
        from rectified_flow_vision_tpu.experiments.train_base import main as train_base_main

        train_base_main(config)

        logger.info("=" * 60)
        logger.info("STEP 3: Training rectified Flow model (Reflow)")
        logger.info("=" * 60)
        from rectified_flow_vision_tpu.experiments.train_rectified import (
            main as train_rect_main,
        )

        train_rect_main(config)

    # STEP 4: benchmark
    logger.info("=" * 60)
    logger.info("STEP 4: Running comparative benchmark")
    logger.info("=" * 60)
    from rectified_flow_vision_tpu.experiments.benchmark import main as benchmark_main

    benchmark_main(config)

    # Final summary
    logger.info("=" * 60)
    logger.info("   PIPELINE COMPLETED")
    logger.info("=" * 60)

    results_dir = Path(__file__).parent / config.paths.results
    checkpoint_dir = Path(__file__).parent / config.paths.checkpoints
    logger.info(
        "\nGenerated files:\n\n"
        "Checkpoints:\n"
        "   %s/\n"
        "   |- base_flow_final.npz          (Base model)\n"
        "   |- rectified_flow_k1_final.npz  (Rectified model)\n\n"
        "Results:\n"
        "   %s/\n"
        "   |- benchmark_results.csv        (Numerical data)\n"
        "   |- quality_results.csv          (SSIM/LPIPS/FID per step count)\n"
        "   |- speed_comparison.png         (Speed comparison plot)\n"
        "   |- benchmark_report.txt         (Text report)\n"
        "   |- *_samples_*.png              (Generated samples)\n",
        checkpoint_dir,
        results_dir,
    )
    logger.info("Experiment completed successfully!")


if __name__ == "__main__":
    main()

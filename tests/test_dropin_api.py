"""Drop-in API parity: reference import paths must resolve.

Every import a user of the reference could have written against its public
surface (reference: models/__init__.py:14-23, utils/__init__.py:17-28,
experiments/*) must work unchanged here.
"""

import numpy as np


class TestReferenceImportPaths:
    def test_models_package(self):
        from models import (  # noqa: F401
            UNet,
            count_parameters,
            BaseFlowModel,
            train_base_flow,
            RectifiedFlowModel,
            generate_reflow_pairs,
            train_rectified_flow,
            iterative_reflow,
        )

    def test_models_submodules(self):
        from models.unet import UNet, count_parameters  # noqa: F401
        from models.base_flow import BaseFlowModel, train_base_flow  # noqa: F401
        from models.rectified_flow import (  # noqa: F401
            RectifiedFlowModel,
            generate_reflow_pairs,
            iterative_reflow,
            train_rectified_flow,
        )

    def test_utils_package(self):
        from utils import (  # noqa: F401
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

    def test_utils_submodules(self):
        from utils.metrics import MetricsCalculator  # noqa: F401
        from utils.logging_config import setup_logger, get_logger  # noqa: F401
        from utils.download_data import download_data  # noqa: F401
        from utils.visualization import plot_speed_comparison  # noqa: F401

    def test_experiments_modules(self):
        from experiments.train_base import ImageDataset, load_config, main  # noqa: F401
        from experiments.train_rectified import main as rect_main  # noqa: F401
        from experiments.benchmark import (  # noqa: F401
            benchmark_quality,
            benchmark_speed,
            main as bench_main,
        )

    def test_reference_usage_pattern(self):
        """The reference's canonical usage compiles and runs unchanged."""
        import torch  # the reference user's tensors are torch

        from models import BaseFlowModel

        model = BaseFlowModel(
            image_size=16, model_channels=16, channel_mult=[1, 2],
            num_res_blocks=1, attention_resolutions=[16, 8], dropout=0.1,
            device="cpu",  # accepted for parity
        )
        x = torch.randn(2, 3, 16, 16)  # NCHW torch tensor, passed directly
        loss = model.compute_loss(x)
        assert float(loss) > 0
        samples = model.sample(num_steps=2, batch_size=2)
        assert tuple(samples.shape) == (2, 3, 16, 16)

    def test_dataset_signature_parity(self, tmp_path):
        from rectified_flow_vision_tpu.utils.download_data import (
            generate_synthetic_images,
        )

        generate_synthetic_images(str(tmp_path), 3, 16, seed=0)
        from experiments.train_base import ImageDataset

        ds = ImageDataset(str(tmp_path), image_size=16)
        assert len(ds) == 3
        assert ds[0].shape == (16, 16, 3)

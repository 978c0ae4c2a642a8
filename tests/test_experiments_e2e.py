"""End-to-end pipeline test: the three experiment stages run back to back
on a tiny config, producing the full artifact set (the reference has no
integration tests at all, SURVEY §4)."""

import numpy as np
import pytest

from rectified_flow_vision_tpu.config import Config

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.num_mock_images = 12
    cfg.data.data_dir = str(root / "data")
    cfg.model.channels = 16
    cfg.model.channel_mult = [1, 2]
    cfg.model.num_res_blocks = 1
    cfg.model.sample_dtype = "float32"
    cfg.training_base.epochs = 2
    cfg.training_base.batch_size = 6
    cfg.training_base.save_every = 1
    cfg.training_base.num_timesteps = 40  # teacher steps = 4
    cfg.training_rectified.epochs = 1
    cfg.training_rectified.batch_size = 6
    cfg.training_rectified.num_reflow_iterations = 1
    cfg.benchmark.num_samples = 4
    cfg.benchmark.steps_to_test = [1, 2]
    cfg.benchmark.num_runs = 1
    cfg.paths.checkpoints = str(root / "ckpt")
    cfg.paths.results = str(root / "results")
    return cfg


class TestPipelineEndToEnd:
    def test_stage1_train_base(self, tiny_cfg):
        from rectified_flow_vision_tpu.experiments.train_base import main

        model = main(tiny_cfg)
        assert model.num_parameters() > 0
        from pathlib import Path

        ckpt = Path(tiny_cfg.paths.checkpoints)
        assert (ckpt / "base_flow_final.npz").exists()
        assert (ckpt / "base_flow_epoch1.npz").exists()
        losses = np.load(str(ckpt / "base_flow_losses.npy"))
        assert losses.shape == (2,)

    def test_stage2_train_rectified(self, tiny_cfg):
        from rectified_flow_vision_tpu.experiments.train_rectified import main

        # cap pair count for test speed: num_pairs = min(1000, 12*10) = 120
        model = main(tiny_cfg)
        from pathlib import Path

        ckpt = Path(tiny_cfg.paths.checkpoints)
        assert (ckpt / "rectified_flow_k1_final.npz").exists()
        assert (ckpt / "rectified_flow_k1_losses.npy").exists()
        assert model.reflow_iteration == 0  # single-reflow k1 model

    def test_stage3_benchmark(self, tiny_cfg):
        from rectified_flow_vision_tpu.experiments.benchmark import main

        df = main(tiny_cfg)
        assert list(df["num_steps"]) == [1, 2]
        assert (df["base_time_ms"] > 0).all()
        from pathlib import Path

        results = Path(tiny_cfg.paths.results)
        for f in [
            "benchmark_results.csv",
            "benchmark_report.txt",
            "speed_comparison.png",
            "base_samples_1steps.png",
            "rect_samples_4steps.png",
            "quality_results.csv",
            "quality_vs_speed.png",
            "trajectory_comparison.png",
        ]:
            assert (results / f).exists(), f


@pytest.fixture(scope="module")
def tiny_latent_cfg(tmp_path_factory):
    """Pixel 16x16 corpus, flow in a 4x4x4 ConvVAE latent space — the
    DiT-256 latent recipe at test scale."""
    root = tmp_path_factory.mktemp("e2e_latent")
    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.num_mock_images = 12
    cfg.data.data_dir = str(root / "data")
    cfg.model.channels = 16
    cfg.model.channel_mult = [1, 2]
    cfg.model.num_res_blocks = 1
    cfg.model.sample_dtype = "float32"
    cfg.model.latent = True
    cfg.model.latent_channels = 4
    cfg.model.latent_downsample = 4
    cfg.model.vae_epochs = 2
    cfg.training_base.epochs = 1
    cfg.training_base.batch_size = 6
    cfg.training_base.save_every = 1
    cfg.training_base.num_timesteps = 40
    cfg.training_rectified.epochs = 1
    cfg.training_rectified.batch_size = 6
    cfg.training_rectified.num_reflow_iterations = 1
    cfg.benchmark.num_samples = 4
    cfg.benchmark.steps_to_test = [1, 2]
    cfg.benchmark.num_runs = 1
    cfg.paths.checkpoints = str(root / "ckpt")
    cfg.paths.results = str(root / "results")
    return cfg


class TestLatentPipelineEndToEnd:
    """Latent pipeline through all three stages. Regression: the benchmark's
    quality pass must compare DECODED pixels against pixel-resolution
    reference images (not the latent sweep resolution)."""

    def test_stage1_trains_vae_and_latent_flow(self, tiny_latent_cfg):
        from pathlib import Path

        from rectified_flow_vision_tpu.experiments.train_base import main

        model = main(tiny_latent_cfg)
        # flow model lives at latent resolution
        assert model.image_size == 4
        assert model.in_channels == 4
        ckpt = Path(tiny_latent_cfg.paths.checkpoints)
        assert (ckpt / "vae.npz").exists()
        assert (ckpt / "base_flow_final.npz").exists()

    def test_stage2_reflow_in_latent_space(self, tiny_latent_cfg):
        from pathlib import Path

        from rectified_flow_vision_tpu.experiments.train_rectified import main

        model = main(tiny_latent_cfg)
        assert model.image_size == 4
        ckpt = Path(tiny_latent_cfg.paths.checkpoints)
        assert (ckpt / "rectified_flow_k1_final.npz").exists()

    def test_stage3_benchmark_decodes_to_pixels(self, tiny_latent_cfg):
        from pathlib import Path

        from rectified_flow_vision_tpu.experiments.benchmark import main

        df = main(tiny_latent_cfg)
        assert (df["base_time_ms"] > 0).all()
        results = Path(tiny_latent_cfg.paths.results)
        assert (results / "quality_results.csv").exists()
        import pandas as pd

        q = pd.read_csv(results / "quality_results.csv")
        # quality rows exist and SSIM was computed on same-size pixel images
        assert len(q) > 0
        assert q["ssim_mean"].notna().all()

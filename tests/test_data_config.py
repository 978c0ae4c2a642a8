"""Data pipeline + config system tests."""

import numpy as np
import pytest
import yaml

from rectified_flow_vision_tpu.config import Config, load_config, quick_overlay
from rectified_flow_vision_tpu.data import ImageDataset, as_nchw, as_nhwc
from rectified_flow_vision_tpu.utils.download_data import (
    generate_synthetic_images,
    synthesize_image,
)


class TestSyntheticData:
    def test_generate_count_and_naming(self, tmp_path):
        n = generate_synthetic_images(str(tmp_path), num_images=5, size=16, seed=0)
        assert n == 5
        files = sorted(tmp_path.iterdir())
        assert [f.name for f in files] == [f"image_{i:04d}.png" for i in range(5)]

    def test_seeded_reproducible(self):
        rng1 = np.random.default_rng(42)
        rng2 = np.random.default_rng(42)
        a = synthesize_image(rng1, 16)
        b = synthesize_image(rng2, 16)
        np.testing.assert_array_equal(a, b)

    def test_image_properties(self):
        img = synthesize_image(np.random.default_rng(0), 32)
        assert img.shape == (32, 32, 3)
        assert img.dtype == np.uint8

    def test_start_index_offsets_names(self, tmp_path):
        generate_synthetic_images(str(tmp_path), 2, 8, seed=0, start_index=3)
        names = sorted(p.name for p in tmp_path.iterdir())
        assert names == ["image_0003.png", "image_0004.png"]


class TestImageDataset:
    def test_load_normalize_range(self, tmp_path):
        generate_synthetic_images(str(tmp_path), 4, 16, seed=1)
        ds = ImageDataset(str(tmp_path), 16)
        assert len(ds) == 4
        assert ds.images.shape == (4, 16, 16, 3)
        assert ds.images.min() >= -1.0 and ds.images.max() <= 1.0

    def test_resize(self, tmp_path):
        generate_synthetic_images(str(tmp_path), 2, 32, seed=1)
        ds = ImageDataset(str(tmp_path), 16)  # downsample 32 -> 16
        assert ds.images.shape == (2, 16, 16, 3)

    def test_batches_fixed_shape_drop_last(self, tmp_path):
        generate_synthetic_images(str(tmp_path), 10, 8, seed=2)
        ds = ImageDataset(str(tmp_path), 8)
        batches = list(ds.batches(4, seed=0))
        assert len(batches) == 2  # 10 // 4, last partial dropped
        assert all(b.shape == (4, 8, 8, 3) for b in batches)

    def test_batches_tile_small_corpus(self, tmp_path):
        generate_synthetic_images(str(tmp_path), 3, 8, seed=2)
        ds = ImageDataset(str(tmp_path), 8)
        batches = list(ds.batches(8, seed=0))
        assert len(batches) == 1
        assert batches[0].shape == (8, 8, 8, 3)

    def test_shuffle_seed_deterministic(self, tmp_path):
        generate_synthetic_images(str(tmp_path), 8, 8, seed=3)
        ds = ImageDataset(str(tmp_path), 8)
        b1 = list(ds.batches(4, seed=7))
        b2 = list(ds.batches(4, seed=7))
        for a, b in zip(b1, b2):
            np.testing.assert_array_equal(a, b)

    def test_layout_conversions(self):
        x = np.random.randn(2, 8, 8, 3)
        assert as_nchw(x).shape == (2, 3, 8, 8)
        np.testing.assert_array_equal(as_nhwc(as_nchw(x)), x)


class TestConfig:
    def test_defaults_match_reference_schema(self):
        cfg = Config()
        assert cfg.data.image_size == 64
        assert cfg.data.num_mock_images == 100
        assert cfg.model.channels == 64
        assert cfg.model.channel_mult == [1, 2, 4]
        assert cfg.training_base.epochs == 50
        assert cfg.training_base.num_timesteps == 1000
        assert cfg.training_rectified.num_reflow_iterations == 2
        assert cfg.benchmark.steps_to_test == [1, 2, 4, 8, 16, 32, 64, 100]
        assert cfg.paths.checkpoints == "checkpoints"

    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.training_base.epochs = 7
        path = tmp_path / "c.yaml"
        cfg.save(path)
        loaded = load_config(path)
        assert loaded.training_base.epochs == 7

    def test_loads_reference_format_yaml(self, tmp_path):
        """A YAML with ONLY the reference's keys must load cleanly."""
        ref_yaml = {
            "data": {"image_size": 32, "num_mock_images": 10, "data_dir": "d"},
            "model": {
                "channels": 32,
                "channel_mult": [1, 2],
                "num_res_blocks": 1,
                "attention_resolutions": [16, 8],
                "dropout": 0.0,
            },
            "training_base": {
                "epochs": 2, "batch_size": 4, "learning_rate": 0.001,
                "num_timesteps": 100, "save_every": 1,
            },
            "training_rectified": {
                "epochs": 1, "batch_size": 4, "learning_rate": 0.001,
                "num_reflow_iterations": 1, "save_every": 1,
            },
            "benchmark": {"num_samples": 4, "steps_to_test": [1, 2], "num_runs": 1},
            "metrics": {"compute_fid": True, "compute_lpips": False, "compute_ssim": True},
            "paths": {"checkpoints": "c", "results": "r", "figures": "f"},
        }
        path = tmp_path / "ref.yaml"
        with open(path, "w") as f:
            yaml.dump(ref_yaml, f)
        cfg = load_config(path)
        assert cfg.data.image_size == 32
        assert cfg.model.channel_mult == [1, 2]
        assert cfg.metrics.compute_lpips is False

    def test_unknown_keys_tolerated(self, tmp_path):
        path = tmp_path / "c.yaml"
        with open(path, "w") as f:
            yaml.dump({"data": {"image_size": 8, "bogus": 1}, "nonsense": {"x": 2}}, f)
        cfg = load_config(path)
        assert cfg.data.image_size == 8

    def test_quick_overlay(self):
        cfg = quick_overlay(Config())
        assert cfg.training_base.epochs == 5
        assert cfg.benchmark.steps_to_test == [1, 4, 16, 64]
        assert cfg.training_rectified.num_reflow_iterations == 1

    def test_missing_file_gives_defaults(self, tmp_path):
        cfg = load_config(tmp_path / "nope.yaml")
        assert cfg.data.image_size == 64


class TestTeacherCheckpointSelection:
    """train_rectified distils from the EMA base weights when present —
    the same checkpoint the benchmark's base@100 anchor evaluates under
    benchmark.prefer_ema."""

    def _dir_with(self, tmp_path, names):
        for n in names:
            (tmp_path / n).write_bytes(b"")
        return tmp_path

    def test_prefers_ema_when_present(self, tmp_path):
        from rectified_flow_vision_tpu.experiments.train_rectified import (
            _resolve_teacher_path,
        )

        d = self._dir_with(
            tmp_path, ["base_flow_final.npz", "base_flow_ema_final.npz"]
        )
        assert _resolve_teacher_path(Config(), d).name == "base_flow_ema_final.npz"

    def test_falls_back_to_raw_final(self, tmp_path):
        from rectified_flow_vision_tpu.experiments.train_rectified import (
            _resolve_teacher_path,
        )

        d = self._dir_with(tmp_path, ["base_flow_final.npz"])
        assert _resolve_teacher_path(Config(), d).name == "base_flow_final.npz"

    def test_knob_disables_ema_teacher(self, tmp_path):
        from rectified_flow_vision_tpu.experiments.train_rectified import (
            _resolve_teacher_path,
        )

        d = self._dir_with(
            tmp_path, ["base_flow_final.npz", "base_flow_ema_final.npz"]
        )
        cfg = Config()
        cfg.training_rectified.teacher_use_ema = False
        assert _resolve_teacher_path(cfg, d).name == "base_flow_final.npz"

"""ConvVAE + latent-flow pipeline (the DiT-256 latent target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.data import ArrayDataset
from rectified_flow_vision_tpu.models.autoencoder import (
    ConvVAE,
    LatentFlowPipeline,
    train_vae,
)


@pytest.fixture(scope="module")
def tiny_vae():
    vae = ConvVAE(
        image_size=32, latent_channels=4, base_channels=16, downsample=4
    )
    params = vae.init(jax.random.key(0))
    return vae, params


class TestConvVAE:
    def test_shapes(self, tiny_vae):
        vae, params = tiny_vae
        x = jnp.zeros((2, 32, 32, 3))
        z = vae.encode(params, x)
        assert z.shape == (2, 8, 8, 4)
        y = vae.decode(params, z)
        assert y.shape == (2, 32, 32, 3)

    def test_encode_deterministic_vs_sampled(self, tiny_vae):
        vae, params = tiny_vae
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
        z1 = vae.encode(params, x)
        z2 = vae.encode(params, x)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
        z3 = vae.encode(params, x, rng=jax.random.key(2))
        assert not np.array_equal(np.asarray(z1), np.asarray(z3))

    def test_train_reduces_recon_error(self):
        rng = np.random.default_rng(0)
        # structured data (not noise): blocks of constant color
        imgs = np.repeat(
            np.repeat(rng.uniform(-1, 1, (64, 4, 4, 3)), 8, axis=1), 8, axis=2
        ).astype(np.float32)
        vae = ConvVAE(
            image_size=32, latent_channels=4, base_channels=16, downsample=4
        )
        p0 = vae.init(jax.random.key(0))
        x = jnp.asarray(imgs[:16])
        mse0 = float(
            jnp.mean((vae.decode(p0, vae.encode(p0, x)) - x) ** 2)
        )
        params, mse = train_vae(
            vae, imgs, epochs=25, batch_size=16, lr=1e-3, progress=False
        )
        assert mse < mse0 * 0.5, (mse0, mse)
        # calibration: scaled latents ~ unit std
        z = vae.encode(params, jnp.asarray(imgs[:32]))
        assert 0.5 < float(jnp.std(z)) < 2.0

    def test_save_load_roundtrip(self, tiny_vae, tmp_path):
        vae, params = tiny_vae
        vae.scaling_factor = 2.5
        path = str(tmp_path / "vae.npz")
        vae.save(path, params)
        vae2, params2 = ConvVAE.load(path)
        assert vae2.scaling_factor == 2.5
        assert vae2.latent_size == vae.latent_size
        x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3))
        np.testing.assert_allclose(
            np.asarray(vae.encode(params, x)),
            np.asarray(vae2.encode(params2, x)),
            rtol=1e-6,
        )


class TestArrayDataset:
    def test_protocol(self):
        lat = np.random.default_rng(0).normal(0, 1, (20, 8, 8, 4)).astype(
            np.float32
        )
        ds = ArrayDataset(lat)
        assert len(ds) == 20
        batches = list(ds.batches(8, seed=1))
        assert len(batches) == ds.num_batches(8) == 2
        assert batches[0].shape == (8, 8, 8, 4)
        # per-epoch reshuffle is deterministic in seed
        again = list(ds.batches(8, seed=1))
        np.testing.assert_array_equal(batches[0], again[0])

    def test_trains_flow(self):
        from rectified_flow_vision_tpu.models import (
            BaseFlowModel,
            train_base_flow,
        )

        lat = np.random.default_rng(0).normal(0, 1, (16, 8, 8, 4)).astype(
            np.float32
        )
        m = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit", patch_size=2,
            hidden_size=32, depth=2, num_heads=4, sample_dtype="float32",
        )
        losses = train_base_flow(
            m, ArrayDataset(lat), epochs=2, lr=1e-3, batch_size=8,
            progress=False,
        )
        assert len(losses) == 2 and np.isfinite(losses).all()


class TestLatentPipeline:
    def test_sample_decodes_to_pixels(self, tiny_vae):
        from rectified_flow_vision_tpu.models import BaseFlowModel

        vae, params = tiny_vae
        flow = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit", patch_size=2,
            hidden_size=32, depth=2, num_heads=4, sample_dtype="float32",
        )
        pipe = LatentFlowPipeline(flow, vae, params)
        out = pipe.sample(batch_size=2, num_steps=2)
        assert out.shape == (2, 3, 32, 32)  # NCHW pixels
        assert np.isfinite(np.asarray(out)).all()
        # NHWC + explicit latent noise
        noise = jax.random.normal(jax.random.key(5), (2, 8, 8, 4))
        out2 = pipe.sample(noise=noise, num_steps=2, data_format="NHWC")
        assert out2.shape == (2, 32, 32, 3)

    def test_build_model_latent_dims(self):
        from rectified_flow_vision_tpu.config import load_config
        from rectified_flow_vision_tpu.experiments.train_base import (
            build_model,
        )

        cfg = load_config("configs/config_dit256.yaml")
        m = build_model(cfg)
        assert m.image_size == 64  # 256 / downsample 4
        assert m.in_channels == 4


class TestDecodeDtype:
    def test_bf16_decode_close_to_fp32(self):
        """Default bf16 decode must stay within ~2 uint8 levels of fp32."""
        import jax.numpy as jnp

        from rectified_flow_vision_tpu.models.autoencoder import (
            ConvVAE,
            LatentFlowPipeline,
        )
        from rectified_flow_vision_tpu.models.base_flow import BaseFlowModel

        vae = ConvVAE(
            image_size=16, latent_channels=4, base_channels=8, downsample=4
        )
        params = vae.init(jax.random.key(0))
        flow = BaseFlowModel(
            image_size=4, in_channels=4, model_channels=8,
            channel_mult=[1], num_res_blocks=1, sample_dtype="float32",
        )
        p16 = LatentFlowPipeline(flow, vae, params)  # default bf16
        p32 = LatentFlowPipeline(flow, vae, params, decode_dtype=jnp.float32)
        z = jax.random.normal(jax.random.key(1), (2, 4, 4, 4))
        a = np.asarray(p16._decode(z))
        b = np.asarray(p32._decode(z))
        assert a.dtype == np.float32
        assert float(np.max(np.abs(a - b))) < 0.05


class TestLatentBenchmarkFunctions:
    """benchmark_speed/throughput accept a LatentFlowPipeline and time the
    END-TO-END path (sampler + decode), reporting pixel img/s."""

    def _pipeline(self):
        from rectified_flow_vision_tpu.models.autoencoder import (
            ConvVAE,
            LatentFlowPipeline,
        )
        from rectified_flow_vision_tpu.models.base_flow import BaseFlowModel

        vae = ConvVAE(
            image_size=16, latent_channels=4, base_channels=8, downsample=4
        )
        flow = BaseFlowModel(
            image_size=4, in_channels=4, model_channels=8,
            channel_mult=[1], num_res_blocks=1, sample_dtype="float32",
        )
        return LatentFlowPipeline(flow, vae, vae.init(jax.random.key(0)))

    def test_throughput_times_decode(self):
        from rectified_flow_vision_tpu.experiments.benchmark import (
            benchmark_throughput,
        )

        pipe = self._pipeline()
        rows = benchmark_throughput(
            pipe, [1, 2], image_size=4, batch_size=4, num_runs=1, chain=2
        )
        assert [r["num_steps"] for r in rows] == [1, 2]
        assert all(r["images_per_second"] > 0 for r in rows)

    def test_speed_sweep_runs_on_pipeline(self):
        from rectified_flow_vision_tpu.experiments.benchmark import (
            benchmark_speed,
        )

        pipe = self._pipeline()
        rows = benchmark_speed(pipe, 4, [1], image_size=4, num_runs=1)
        assert rows[0]["images_per_second"] > 0

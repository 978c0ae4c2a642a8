"""Higher-order samplers, EMA training, and serving-service tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.models import BaseFlowModel
from rectified_flow_vision_tpu.models.base_flow import make_optimizer, make_train_step
from rectified_flow_vision_tpu.serving import SamplerService


def _tiny(seed=0):
    return BaseFlowModel(
        image_size=8, model_channels=16, channel_mult=[1], num_res_blocks=1,
        sample_dtype="float32", seed=seed,
    )


class TestSamplerMethods:
    @pytest.mark.parametrize("method", ["euler", "midpoint", "heun"])
    def test_shapes(self, method):
        m = _tiny()
        s = m.sample(num_steps=2, batch_size=2, method=method)
        assert s.shape == (2, 3, 8, 8)

    def test_methods_agree_at_many_steps(self):
        """All integrators converge to the same ODE solution as N grows."""
        m = _tiny()
        noise = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
        e = np.asarray(m.sample(noise=noise, num_steps=64, method="euler"))
        h = np.asarray(m.sample(noise=noise, num_steps=64, method="heun"))
        md = np.asarray(m.sample(noise=noise, num_steps=64, method="midpoint"))
        np.testing.assert_allclose(e, h, atol=0.05)
        np.testing.assert_allclose(e, md, atol=0.05)

    def test_heun_more_accurate_than_euler(self):
        """At few steps, 2nd-order methods are closer to the fine solution."""
        m = _tiny()
        noise = np.random.RandomState(1).randn(2, 3, 8, 8).astype(np.float32)
        fine = np.asarray(m.sample(noise=noise, num_steps=256, method="heun"))
        e4 = np.asarray(m.sample(noise=noise, num_steps=4, method="euler"))
        h4 = np.asarray(m.sample(noise=noise, num_steps=4, method="heun"))
        err_e = np.abs(e4 - fine).mean()
        err_h = np.abs(h4 - fine).mean()
        assert err_h < err_e

    def test_unknown_method_raises(self):
        m = _tiny()
        with pytest.raises(ValueError):
            m.sample(num_steps=2, batch_size=1, method="rk7")


class TestEMA:
    def test_ema_tracks_params(self):
        m = _tiny()
        tx = make_optimizer(1e-2, 1, 1)
        step = make_train_step(m, tx, coupled=False, ema_decay=0.5)
        params = m.params
        ema = jax.tree_util.tree_map(jnp.array, params)
        opt_state = tx.init(params)
        batch = jnp.asarray(np.random.randn(4, 8, 8, 3), jnp.float32)

        p0 = jax.tree_util.tree_map(np.asarray, params)
        params, ema, opt_state, loss = step(
            params, ema, opt_state, batch, jax.random.key(0)
        )
        # ema = 0.5*old + 0.5*new, elementwise
        for old, new, e in zip(
            jax.tree_util.tree_leaves(p0),
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(ema),
        ):
            np.testing.assert_allclose(
                np.asarray(e), 0.5 * old + 0.5 * np.asarray(new),
                rtol=1e-5, atol=1e-7,
            )

    def test_ema_smoother_than_params(self):
        """EMA with high decay moves less than raw params over steps."""
        m = _tiny()
        tx = make_optimizer(1e-2, 1, 1)
        step = make_train_step(m, tx, coupled=False, ema_decay=0.99)
        params = m.params
        p0 = jax.tree_util.tree_map(np.asarray, params)
        ema = jax.tree_util.tree_map(jnp.array, params)
        opt_state = tx.init(params)
        for i in range(5):
            batch = jnp.asarray(
                np.random.RandomState(i).randn(4, 8, 8, 3), jnp.float32
            )
            params, ema, opt_state, _ = step(
                params, ema, opt_state, batch, jax.random.key(i)
            )
        d_params = sum(
            float(np.abs(np.asarray(a) - b).sum())
            for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p0))
        )
        d_ema = sum(
            float(np.abs(np.asarray(a) - b).sum())
            for a, b in zip(jax.tree_util.tree_leaves(ema), jax.tree_util.tree_leaves(p0))
        )
        assert d_ema < d_params


class TestSamplerService:
    def test_generate_and_shapes(self):
        m = _tiny()
        svc = SamplerService(m, step_counts=(1, 2), batch_size=4, warmup=True)
        imgs = svc.generate(6, num_steps=2)
        assert imgs.shape == (6, 3, 8, 8)
        assert np.isfinite(imgs).all()

    def test_unconfigured_steps_raise(self):
        m = _tiny()
        svc = SamplerService(m, step_counts=(2,), batch_size=2, warmup=False)
        with pytest.raises(ValueError):
            svc.generate(2, num_steps=4)

    def test_distinct_batches(self):
        m = _tiny()
        svc = SamplerService(m, step_counts=(1,), batch_size=2, warmup=False)
        a = svc.generate(2, num_steps=1)
        b = svc.generate(2, num_steps=1)
        assert not np.allclose(a, b)  # PRNG stream advances

    def test_throughput_positive(self):
        m = _tiny()
        svc = SamplerService(m, step_counts=(1,), batch_size=4, warmup=True)
        assert svc.throughput(1, iters=2) > 0

    def test_latent_service_decodes_to_pixels(self, tmp_path):
        """A latent flow model + ConvVAE serves PIXEL images: the sampler
        runs at latent resolution, generate() returns decoded pixels."""
        from rectified_flow_vision_tpu.models import BaseFlowModel
        from rectified_flow_vision_tpu.models.autoencoder import ConvVAE

        vae = ConvVAE(
            image_size=16, latent_channels=4, base_channels=8, downsample=4
        )
        vae_params = vae.init(jax.random.key(0))
        vae_path = str(tmp_path / "vae.npz")
        vae.save(vae_path, vae_params)

        flow = BaseFlowModel(
            image_size=4, in_channels=4, model_channels=8,
            channel_mult=[1], num_res_blocks=1, sample_dtype="float32",
        )
        flow_path = str(tmp_path / "flow.npz")
        flow.save(flow_path)

        svc = SamplerService.from_checkpoint(
            flow_path, vae_path=vae_path,
            step_counts=(2,), batch_size=4, warmup=True,
        )
        imgs = svc.generate(3, num_steps=2)
        assert imgs.shape == (3, 3, 16, 16)  # pixels, not 4x4x4 latents
        assert np.isfinite(imgs).all()
        assert svc.throughput(2, iters=2) > 0


class TestFromCheckpointDispatch:
    def test_rectified_checkpoint_restores_class(self, tmp_path):
        from rectified_flow_vision_tpu.models import (
            BaseFlowModel,
            RectifiedFlowModel,
        )

        rect = RectifiedFlowModel(
            image_size=8, model_channels=16, channel_mult=[1],
            num_res_blocks=1,
        )
        rect.reflow_iteration = 2
        rect.save(str(tmp_path / "r.npz"))
        loaded = BaseFlowModel.from_checkpoint(str(tmp_path / "r.npz"))
        assert isinstance(loaded, RectifiedFlowModel)
        assert loaded.reflow_iteration == 2

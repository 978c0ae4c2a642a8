"""ODE inversion (reverse integration) and data-side Reflow couplings.

No reference counterpart: the reference's pair synthesis is forward-only
(rectified_flow.py:127-174). invert() integrates the same flow ODE
t: 1 -> 0 so real images can be coupled with their noise (Simple ReFlow,
arXiv:2410.07815).
"""

import jax
import numpy as np
import pytest

from rectified_flow_vision_tpu.models import BaseFlowModel
from rectified_flow_vision_tpu.models.rectified_flow import generate_reflow_pairs


def _tiny(seed=0):
    return BaseFlowModel(
        image_size=8, model_channels=16, channel_mult=[1], num_res_blocks=1,
        sample_dtype="float32", seed=seed,
    )


class TestInvert:
    def test_shapes_nchw_default(self):
        m = _tiny()
        x1 = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
        x0 = m.invert(x1, num_steps=2)
        assert np.asarray(x0).shape == (2, 3, 8, 8)

    def test_roundtrip_recovers_noise(self):
        """sample then invert (same fine grid) returns ~the input noise.

        Both directions integrate the same smooth ODE; at N steps the
        discretization error is O(1/N), so the roundtrip error must
        shrink with N and be small at N=128.
        """
        m = _tiny()
        noise = np.random.RandomState(1).randn(2, 3, 8, 8).astype(np.float32)

        def roundtrip_err(n):
            x1 = m.sample(noise=noise, num_steps=n)
            back = np.asarray(m.invert(np.asarray(x1), num_steps=n))
            return np.abs(back - noise).mean()

        err_fine = roundtrip_err(128)
        err_coarse = roundtrip_err(4)
        assert err_fine < err_coarse
        assert err_fine < 0.05, err_fine

    def test_heun_inverts_more_accurately(self):
        m = _tiny()
        noise = np.random.RandomState(2).randn(2, 3, 8, 8).astype(np.float32)
        x1 = np.asarray(m.sample(noise=noise, num_steps=256, method="heun"))
        back_e = np.asarray(m.invert(x1, num_steps=8, method="euler"))
        back_h = np.asarray(m.invert(x1, num_steps=8, method="heun"))
        # reference solution for the reverse ODE: fine heun
        back_fine = np.asarray(m.invert(x1, num_steps=256, method="heun"))
        assert np.abs(back_h - back_fine).mean() < np.abs(back_e - back_fine).mean()

    def test_deterministic(self):
        m = _tiny()
        x1 = np.random.RandomState(3).randn(1, 3, 8, 8).astype(np.float32)
        a = np.asarray(m.invert(x1, num_steps=4))
        b = np.asarray(m.invert(x1, num_steps=4))
        np.testing.assert_array_equal(a, b)

    def test_nhwc_layout(self):
        m = _tiny()
        x1 = np.random.RandomState(4).randn(2, 8, 8, 3).astype(np.float32)
        x0 = m.invert(x1, num_steps=2, data_format="NHWC")
        assert np.asarray(x0).shape == (2, 8, 8, 3)


class TestDataSidePairs:
    def test_data_pairs_keep_real_images_as_x1(self):
        m = _tiny()
        data = np.random.RandomState(5).rand(6, 8, 8, 3).astype(np.float32) * 2 - 1
        x0, x1 = generate_reflow_pairs(
            m, num_pairs=6, batch_size=4, num_steps=2,
            data_format="NHWC", real_data=data, data_pair_fraction=1.0,
        )
        assert x0.shape == (6, 8, 8, 3)
        np.testing.assert_allclose(x1, data, atol=1e-6)

    def test_mixed_fraction_counts(self):
        m = _tiny()
        data = np.random.RandomState(6).rand(4, 8, 8, 3).astype(np.float32)
        x0, x1 = generate_reflow_pairs(
            m, num_pairs=8, batch_size=4, num_steps=2,
            data_format="NHWC", real_data=data, data_pair_fraction=0.5,
        )
        assert x0.shape == (8, 8, 8, 3)
        # first half are the data-side pairs (x1 == the real images)
        np.testing.assert_allclose(x1[:4], data, atol=1e-6)
        # second half are forward pairs: teacher samples, not the corpus
        assert np.abs(x1[4:] - data).max() > 1e-3

    def test_corpus_cycled_when_small(self):
        m = _tiny()
        data = np.random.RandomState(7).rand(3, 8, 8, 3).astype(np.float32)
        x0, x1 = generate_reflow_pairs(
            m, num_pairs=6, batch_size=4, num_steps=2,
            data_format="NHWC", real_data=data, data_pair_fraction=1.0,
        )
        np.testing.assert_allclose(x1[3:], data, atol=1e-6)
        # identical images invert to identical noise (deterministic map)
        np.testing.assert_allclose(x0[3:], x0[:3], atol=1e-5)

    def test_fraction_without_data_raises(self):
        m = _tiny()
        with pytest.raises(ValueError):
            generate_reflow_pairs(
                m, num_pairs=4, batch_size=2, num_steps=2,
                data_format="NHWC", data_pair_fraction=0.5,
            )

    def test_nchw_output_layout(self):
        m = _tiny()
        data = np.random.RandomState(8).rand(4, 3, 8, 8).astype(np.float32)
        x0, x1 = generate_reflow_pairs(
            m, num_pairs=4, batch_size=4, num_steps=2,
            real_data=data, data_pair_fraction=1.0,
        )
        assert x0.shape == (4, 3, 8, 8)
        np.testing.assert_allclose(x1, data, atol=1e-6)

"""Torch .pt checkpoint import/export tests.

Validates the layout mapping numerically (torch conv vs ours on identical
weights) and the full round trip through a real torch-serialized file.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rectified_flow_vision_tpu.models import BaseFlowModel  # noqa: E402
from rectified_flow_vision_tpu.ops import primitives as P  # noqa: E402
from rectified_flow_vision_tpu.utils.pt_import import (  # noqa: E402
    export_pt_checkpoint,
    import_pt_checkpoint,
    infer_architecture,
    params_to_state_dict,
    state_dict_to_params,
)

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


class TestLayoutMapping:
    def test_conv_oihw_to_hwio_numerics(self):
        """torch Conv2d and our conv2d agree on imported weights."""
        tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
        x = np.random.randn(2, 5, 5, 3).astype(np.float32)

        with torch.no_grad():
            ref = (
                tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
                .numpy()
                .transpose(0, 2, 3, 1)
            )

        p = {
            "w": np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0)),
            "b": tconv.bias.detach().numpy(),
        }
        got = np.asarray(P.conv2d(jnp.asarray(x), p))
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)

    def test_strided_conv_numerics(self):
        """stride-2 SAME conv matches torch stride-2 pad-1 for even sizes."""
        tconv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=1)
        x = np.random.randn(1, 8, 8, 4).astype(np.float32)
        with torch.no_grad():
            ref = (
                tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        p = {
            "w": np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0)),
            "b": tconv.bias.detach().numpy(),
        }
        got = np.asarray(P.conv2d(jnp.asarray(x), p, stride=2))
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)

    def test_linear_numerics(self):
        tl = torch.nn.Linear(6, 10)
        x = np.random.randn(3, 6).astype(np.float32)
        with torch.no_grad():
            ref = tl(torch.from_numpy(x)).numpy()
        p = {
            "w": np.transpose(tl.weight.detach().numpy()),
            "b": tl.bias.detach().numpy(),
        }
        got = np.asarray(P.dense(jnp.asarray(x), p))
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)

    def test_groupnorm_numerics(self):
        tn = torch.nn.GroupNorm(8, 32)
        with torch.no_grad():
            tn.weight.uniform_(0.5, 1.5)
            tn.bias.uniform_(-0.5, 0.5)
        x = np.random.randn(2, 4, 4, 32).astype(np.float32)
        with torch.no_grad():
            ref = (
                tn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        p = {"scale": tn.weight.detach().numpy(), "bias": tn.bias.detach().numpy()}
        got = np.asarray(P.group_norm(jnp.asarray(x), p, num_groups=8))
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)

    def test_upsample_nearest_matches_torch(self):
        x = np.random.randn(1, 4, 4, 3).astype(np.float32)
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), scale_factor=2,
                mode="nearest",
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        got = np.asarray(P.upsample_nearest_2x(jnp.asarray(x)))
        np.testing.assert_array_equal(ref, got)

    def test_sinusoidal_embedding_matches_reference_formula(self):
        """Reference formula (models/unet.py:20-27) reproduced in torch."""
        import math

        dim = 32
        t = np.array([0.0, 0.25, 0.9], np.float32)
        half = dim // 2
        emb = math.log(10000) / (half - 1)
        freqs = torch.exp(torch.arange(half) * -emb)
        args = torch.from_numpy(t)[:, None] * freqs[None, :]
        ref = torch.cat((args.sin(), args.cos()), dim=-1).numpy()
        got = np.asarray(P.sinusoidal_time_embedding(jnp.asarray(t), dim))
        np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-6)


class TestPtRoundTrip:
    @pytest.fixture(scope="class")
    def model(self):
        return BaseFlowModel(
            image_size=16,
            model_channels=16,
            channel_mult=[1, 2],
            num_res_blocks=2,
            sample_dtype="float32",
        )

    def test_export_import_identity(self, model, tmp_path):
        path = tmp_path / "model.pt"
        export_pt_checkpoint(model, path)
        params, config = import_pt_checkpoint(path)
        assert config["image_size"] == 16
        assert config["model_channels"] == 16
        assert config["channel_mult"] == [1, 2]
        assert config["num_res_blocks"] == 2
        for a, b in zip(
            jax.tree_util.tree_leaves(model.params),
            jax.tree_util.tree_leaves(params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_model_load_pt_dispatch(self, model, tmp_path):
        """BaseFlowModel.load dispatches on .pt and produces identical
        sampling behavior."""
        path = tmp_path / "model.pt"
        export_pt_checkpoint(model, path)
        fresh = BaseFlowModel(
            image_size=16,
            model_channels=16,
            channel_mult=[1, 2],
            num_res_blocks=2,
            sample_dtype="float32",
            seed=99,
        )
        fresh.load(str(path))
        noise = np.random.randn(1, 3, 16, 16).astype(np.float32)
        s1 = np.asarray(model.sample(noise=noise, num_steps=2))
        s2 = np.asarray(fresh.sample(noise=noise, num_steps=2))
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)

    def test_from_checkpoint_pt(self, model, tmp_path):
        """Architecture inference makes .pt self-describing."""
        path = tmp_path / "model.pt"
        export_pt_checkpoint(model, path)
        m2 = BaseFlowModel.from_checkpoint(str(path), sample_dtype="float32")
        assert m2.velocity_net.cfg.model_channels == 16
        assert m2.velocity_net.cfg.channel_mult == (1, 2)
        noise = np.random.randn(1, 3, 16, 16).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(model.sample(noise=noise, num_steps=2)),
            np.asarray(m2.sample(noise=noise, num_steps=2)),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_infer_architecture_default_config(self):
        m = BaseFlowModel(image_size=8)  # default arch, tiny images
        sd = params_to_state_dict(m.params, [1, 2, 4], 2)
        arch = infer_architecture(sd)
        assert arch == {
            "model_channels": 64,
            "channel_mult": [1, 2, 4],
            "num_res_blocks": 2,
        }

    def test_state_dict_covers_all_params(self, model):
        """Export must lose nothing: same leaf count and total size."""
        sd = params_to_state_dict(model.params, [1, 2], 2)
        n_sd = sum(v.size for v in sd.values())
        n_params = sum(
            np.asarray(a).size for a in jax.tree_util.tree_leaves(model.params)
        )
        assert n_sd == n_params


class TestRepeatedMultInference:
    def test_repeated_channel_mult_roundtrip(self):
        """channel_mult with repeated entries (e.g. [1,2,2,4]) must survive
        architecture inference (level count comes from downsamples, not
        from collapsing equal-channel runs)."""
        m = BaseFlowModel(
            image_size=16, model_channels=8, channel_mult=[1, 2, 2],
            num_res_blocks=2, sample_dtype="float32",
        )
        sd = params_to_state_dict(m.params, [1, 2, 2], 2)
        arch = infer_architecture(sd)
        assert arch == {
            "model_channels": 8,
            "channel_mult": [1, 2, 2],
            "num_res_blocks": 2,
        }
        params, _ = state_dict_to_params(sd)
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(m.params),
            jax.tree_util.tree_leaves(params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

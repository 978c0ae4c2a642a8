"""DiT backbone tests: structure, adaLN-Zero identity init, flow-stack
integration, TP sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.models import BaseFlowModel, RectifiedFlowModel
from rectified_flow_vision_tpu.models.dit import DiT, DIT_SIZES
from rectified_flow_vision_tpu.models.unet import count_parameters

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


def _tiny_dit():
    return DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2, num_heads=4)


class TestDiTStructure:
    def test_forward_shape(self):
        dit = _tiny_dit()
        params = dit.init(jax.random.key(0))
        x = jnp.zeros((2, 8, 8, 4))
        y = dit.apply(params, x, jnp.array([0.1, 0.9]))
        assert y.shape == (2, 8, 8, 4)

    def test_dit_s2_param_count(self):
        """DiT-S/2 at 32x32x4 latents is ~33M params (published DiT-S/2:
        33M); sanity band rather than exact — conditioning here is t-only
        (no label embedding)."""
        dit = DiT(input_size=32, patch_size=2, in_channels=4, size="S")
        n = count_parameters(dit.init(jax.random.key(0)))
        assert 25e6 < n < 40e6, f"{n:,}"

    def test_size_table(self):
        assert DIT_SIZES["S"] == (384, 12, 6)
        assert DIT_SIZES["XL"] == (1152, 28, 16)

    def test_adaln_zero_identity_at_init(self):
        """Zero-init adaLN gates + zero head => output is exactly zero at
        init (every block is identity, final linear is zero)."""
        dit = _tiny_dit()
        params = dit.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        y = dit.apply(params, x, jnp.array([0.3, 0.6]))
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)

    def test_time_dependence_after_perturbation(self):
        dit = _tiny_dit()
        params = dit.init(jax.random.key(0))
        # nudge the adaLN + head weights so the net is non-degenerate
        params = jax.tree_util.tree_map(
            lambda a: a + 0.01 * jax.random.normal(jax.random.key(2), a.shape, a.dtype),
            params,
        )
        x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
        y0 = dit.apply(params, x, jnp.array([0.0]))
        y1 = dit.apply(params, x, jnp.array([1.0]))
        assert not np.allclose(np.asarray(y0), np.asarray(y1))

    def test_unpatchify_roundtrip_structure(self):
        """Patch grid reassembles to the right spatial layout: a head that
        writes patch-index constants must produce constant 2x2 tiles."""
        dit = _tiny_dit()
        params = dit.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
        # bias-only head: every patch outputs [0..15] over (p*p*C)
        params["final"]["linear"]["b"] = jnp.arange(16, dtype=jnp.float32)
        y = np.asarray(dit.apply(params, x, jnp.array([0.5])))
        # first patch pixel (0,0) channel 0 must equal bias[0]; pixel (0,1)
        # channel 0 equals bias[4] (row-major p*p*C unpatchify)
        assert y[0, 0, 0, 0] == 0.0
        assert y[0, 0, 1, 0] == 4.0
        assert y[0, 1, 0, 0] == 8.0


class TestDiTFlowIntegration:
    def test_base_flow_with_dit_backbone(self):
        m = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit",
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
            sample_dtype="float32",
        )
        x1 = np.random.randn(4, 4, 8, 8).astype(np.float32)
        loss = float(m.compute_loss(x1))
        assert loss > 0
        s = m.sample(num_steps=2, batch_size=2)
        assert s.shape == (2, 4, 8, 8)

    def test_dit_training_decreases_loss(self):
        from rectified_flow_vision_tpu.models import train_base_flow

        m = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit",
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
            sample_dtype="float32",
        )
        data = [np.random.RandomState(i).randn(8, 8, 8, 4).astype(np.float32) * 0.5
                for i in range(3)]
        losses = train_base_flow(m, data, epochs=4, lr=3e-3, progress=False)
        assert losses[-1] < losses[0]

    def test_reflow_student_from_dit_base(self):
        m = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit",
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
        )
        student = RectifiedFlowModel.from_base_model(m)
        assert student.backbone == "dit"
        assert student.velocity_net.cfg.hidden_size == 32

    def test_dit_checkpoint_roundtrip(self, tmp_path):
        m = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit",
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
            sample_dtype="float32",
        )
        m.save(str(tmp_path / "dit.npz"))
        m2 = BaseFlowModel.from_checkpoint(str(tmp_path / "dit.npz"))
        assert m2.backbone == "dit"
        for a, b in zip(
            jax.tree_util.tree_leaves(m.params),
            jax.tree_util.tree_leaves(m2.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDiTParallel:
    def test_tp_sharding_rules_hit_dit(self, eight_devices):
        from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

        m = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit",
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
        )
        mesh = mesh_lib.create_mesh(model_axis=2)
        params = mesh_lib.shard_params(mesh, m.params)
        spec = params["blocks"]["0"]["qkv"]["w"].sharding.spec
        assert spec == jax.sharding.PartitionSpec(None, "model")
        spec2 = params["blocks"]["1"]["mlp2"]["w"].sharding.spec
        assert spec2 == jax.sharding.PartitionSpec("model", None)

    def test_dit_dp_tp_train_step(self, eight_devices):
        from rectified_flow_vision_tpu.models.base_flow import (
            make_optimizer,
            make_train_step,
        )
        from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

        m = BaseFlowModel(
            image_size=8, in_channels=4, backbone="dit",
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
        )
        mesh = mesh_lib.create_mesh(model_axis=2)
        tx = make_optimizer(1e-3, 1, 1)
        params = mesh_lib.shard_params(mesh, m.params)
        opt_state = jax.device_put(tx.init(m.params), mesh_lib.replicated(mesh))
        step = make_train_step(m, tx, coupled=False)
        batch = mesh_lib.shard_batch(
            mesh, jnp.asarray(np.random.randn(8, 8, 8, 4), jnp.float32)
        )
        _, _, loss = step(params, opt_state, batch, jax.random.key(0))
        assert np.isfinite(float(loss))


class TestDiTSequenceParallel:
    def test_seq_parallel_matches_single(self, eight_devices):
        """Token-sharded DiT forward (ring attention) == unsharded forward."""
        import numpy as onp
        from jax.sharding import Mesh

        dit = DiT(
            input_size=16, patch_size=2, in_channels=4,
            hidden_size=32, depth=2, num_heads=4,
        )
        params = dit.init(jax.random.key(0))
        # perturb so attention actually contributes (adaLN-zero init would
        # make any attention bug invisible)
        params = jax.tree_util.tree_map(
            lambda a: a
            + 0.02 * jax.random.normal(jax.random.key(9), a.shape, a.dtype),
            params,
        )
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
        t = jnp.array([0.2, 0.7])

        want = np.asarray(dit.apply(params, x, t))

        mesh = Mesh(onp.asarray(eight_devices).reshape(1, 8), ("data", "seq"))
        got = np.asarray(
            jax.jit(
                lambda p, x, t: dit.apply(p, x, t, mesh=mesh, seq_axis="seq")
            )(params, x, t)
        )
        np.testing.assert_allclose(want, got, rtol=2e-4, atol=2e-4)

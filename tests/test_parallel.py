"""Multi-device tests on the fake 8-CPU-device mesh.

Coverage the reference cannot have (it is single-device, reference:
main.py:93): data-parallel train-step correctness vs single device,
tensor-parallel sharding compile+run, mesh construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.models import BaseFlowModel
from rectified_flow_vision_tpu.models.base_flow import make_optimizer, make_train_step
from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


def _tiny(seed=0):
    return BaseFlowModel(
        image_size=8,
        model_channels=16,
        channel_mult=[1, 2],
        num_res_blocks=1,
        sample_dtype="float32",
        seed=seed,
    )


class TestMeshConstruction:
    def test_default_all_data(self, eight_devices):
        mesh = mesh_lib.create_mesh()
        assert mesh.shape["data"] == 8
        assert mesh.shape["model"] == 1

    def test_dp_tp_split(self, eight_devices):
        mesh = mesh_lib.create_mesh(model_axis=2)
        assert mesh.shape["data"] == 4
        assert mesh.shape["model"] == 2

    def test_invalid_model_axis(self, eight_devices):
        with pytest.raises(ValueError):
            mesh_lib.create_mesh(model_axis=3)  # 3 does not divide 8


class TestDataParallelTraining:
    def test_dp_matches_single_device(self, eight_devices):
        """One sharded-jit train step == one single-device step: gradient
        averaging over the data axis is implicit and must be exact."""
        batch = np.random.RandomState(0).randn(8, 8, 8, 3).astype(np.float32)
        rng = jax.random.key(7)

        results = {}
        for name, mesh in [
            ("single", None),
            ("dp8", mesh_lib.create_mesh()),
        ]:
            m = _tiny(seed=3)
            tx = make_optimizer(1e-3, epochs=1, steps_per_epoch=1)
            params = m.params
            opt_state = tx.init(params)
            if mesh is not None:
                params = mesh_lib.shard_params(mesh, params)
                opt_state = jax.device_put(opt_state, mesh_lib.replicated(mesh))
            step = make_train_step(m, tx, coupled=False)
            b = jnp.asarray(batch)
            if mesh is not None:
                b = mesh_lib.shard_batch(mesh, b)
            new_params, _, loss = step(params, opt_state, b, rng)
            results[name] = (
                float(jax.device_get(loss)),
                jax.tree_util.tree_map(np.asarray, new_params),
            )

        loss_s, params_s = results["single"]
        loss_d, params_d = results["dp8"]
        assert loss_s == pytest.approx(loss_d, rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(params_s), jax.tree_util.tree_leaves(params_d)
        ):
            # sharded reductions reorder fp32 sums, and AdamW's rsqrt(v)+eps
            # amplifies that noise at step 1 where v ~ 0
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)

    def test_dp_sampling_matches(self, eight_devices):
        m = _tiny(seed=1)
        noise = np.random.RandomState(1).randn(8, 8, 8, 3).astype(np.float32)
        ref = np.asarray(m.sample(noise=noise, num_steps=3, data_format="NHWC"))

        mesh = mesh_lib.create_mesh()
        sharded_noise = mesh_lib.shard_batch(mesh, jnp.asarray(noise))
        got = np.asarray(
            m.sample(noise=sharded_noise, num_steps=3, data_format="NHWC")
        )
        np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)


class TestTensorParallel:
    def test_tp_train_step_compiles_and_matches(self, eight_devices):
        """dp4 x tp2: GSPMD must resolve the channel shardings and produce
        the same update as single-device."""
        batch = np.random.RandomState(2).randn(8, 8, 8, 3).astype(np.float32)
        rng = jax.random.key(11)

        m1 = _tiny(seed=5)
        tx = make_optimizer(1e-3, epochs=1, steps_per_epoch=1)
        step = make_train_step(m1, tx, coupled=False)
        p_ref, _, loss_ref = step(
            m1.params, tx.init(m1.params), jnp.asarray(batch), rng
        )

        m2 = _tiny(seed=5)
        mesh = mesh_lib.create_mesh(model_axis=2)
        params = mesh_lib.shard_params(mesh, m2.params)
        opt_state = jax.device_put(tx.init(m2.params), mesh_lib.replicated(mesh))
        step2 = make_train_step(m2, tx, coupled=False)
        p_tp, _, loss_tp = step2(
            params, opt_state, mesh_lib.shard_batch(mesh, jnp.asarray(batch)), rng
        )

        assert float(loss_ref) == pytest.approx(float(loss_tp), rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_tp)
        ):
            # AdamW's rsqrt(v)+eps amplifies reduction-order noise at step 1
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4
            )

    def test_tp_param_placement(self, eight_devices):
        """TP rules actually shard the matmul params over 'model'."""
        m = _tiny()
        mesh = mesh_lib.create_mesh(model_axis=2)
        params = mesh_lib.shard_params(mesh, m.params)
        qkv_w = params["mid_attn"]["qkv"]["w"]
        spec = qkv_w.sharding.spec
        assert spec == jax.sharding.PartitionSpec(None, "model")


class TestFSDP:
    """ZeRO-style full sharding of params + Adam moments over 'data'."""

    def test_fsdp_train_step_matches_single_device(self, eight_devices):
        batch = np.random.RandomState(4).randn(8, 8, 8, 3).astype(np.float32)
        rng = jax.random.key(13)

        m1 = _tiny(seed=9)
        tx = make_optimizer(1e-3, epochs=1, steps_per_epoch=1)
        step = make_train_step(m1, tx, coupled=False)
        p_ref, _, loss_ref = step(
            m1.params, tx.init(m1.params), jnp.asarray(batch), rng
        )

        m2 = _tiny(seed=9)
        mesh = mesh_lib.create_mesh()  # dp8
        params = mesh_lib.shard_params_fsdp(mesh, m2.params)
        opt_state = mesh_lib.shard_opt_state(
            mesh,
            tx.init(m2.params),
            m2.params,
            mesh_lib.make_fsdp_param_shardings(mesh, m2.params),
        )
        step2 = make_train_step(m2, tx, coupled=False)
        p_f, opt_f, loss_f = step2(
            params, opt_state, mesh_lib.shard_batch(mesh, jnp.asarray(batch)), rng
        )

        assert float(loss_ref) == pytest.approx(float(loss_f), rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_f)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4
            )

    def test_fsdp_actually_shards_storage(self, eight_devices):
        """Each chip must hold ~1/dp of every shardable param and Adam
        moment — the point of FSDP is memory, not math."""
        m = _tiny()
        mesh = mesh_lib.create_mesh()  # dp8
        params = mesh_lib.shard_params_fsdp(mesh, m.params)

        conv_w = params["input_conv"]["w"]  # (3,3,3,16): 16 % 8 == 0
        shard = conv_w.addressable_shards[0].data
        assert shard.shape[-1] == conv_w.shape[-1] // 8

        tx = make_optimizer(1e-3, epochs=1, steps_per_epoch=1)
        opt = mesh_lib.shard_opt_state(
            mesh,
            tx.init(m.params),
            m.params,
            mesh_lib.make_fsdp_param_shardings(mesh, m.params),
        )
        # Adam mu mirrors the param sharding (ZeRO: moments sharded too)
        mu_conv = opt[1][0].mu["input_conv"]["w"]
        assert (
            mu_conv.addressable_shards[0].data.shape[-1]
            == mu_conv.shape[-1] // 8
        )

    def test_fsdp_composes_with_tp(self, eight_devices):
        """dp4 x tp2: a TP-sharded matmul param gains 'data' on another dim."""
        m = _tiny()
        mesh = mesh_lib.create_mesh(model_axis=2)
        params = mesh_lib.shard_params_fsdp(mesh, m.params, tp=True)
        qkv_w = params["mid_attn"]["qkv"]["w"]  # (C, 3C) -> P('data','model')
        spec = qkv_w.sharding.spec
        assert "model" in spec
        assert "data" in spec

    def test_fsdp_spec_rules(self, eight_devices):
        P = jax.sharding.PartitionSpec
        # largest divisible dim wins
        assert mesh_lib.fsdp_spec((16, 64), 8) == P(None, "data")
        # dims taken by TP are skipped
        assert mesh_lib.fsdp_spec((16, 64), 8, P(None, "model")) == P(
            "data", "model"
        )
        # nothing divisible -> replicated
        assert mesh_lib.fsdp_spec((3, 5), 8) == P(None, None)
        # scalars
        assert mesh_lib.fsdp_spec((), 8) == P()

    def test_fsdp_end_to_end_training(self, eight_devices, tmp_path):
        """train_base_flow(fsdp=True) trains and the losses fall."""
        from rectified_flow_vision_tpu.data import ArrayDataset
        from rectified_flow_vision_tpu.models import train_base_flow

        imgs = np.random.RandomState(3).randn(16, 8, 8, 3).astype(np.float32)
        m = _tiny(seed=2)
        mesh = mesh_lib.create_mesh()
        losses = train_base_flow(
            m, ArrayDataset(imgs), epochs=2, lr=1e-3, batch_size=8,
            mesh=mesh, fsdp=True, progress=False,
        )
        assert len(losses) == 2
        assert np.isfinite(losses).all()


class TestMeshDeviceEpoch:
    """The device-resident epoch scan under a mesh (round-3 fix: round 2
    silently fell back to the ~4x-slower per-step host loop whenever a mesh
    was passed, models/base_flow.py:745-754 at r2)."""

    def test_mesh_epoch_matches_single_device(self, eight_devices):
        from rectified_flow_vision_tpu.data import ArrayDataset
        from rectified_flow_vision_tpu.models import train_base_flow

        imgs = np.random.RandomState(5).randn(24, 8, 8, 3).astype(np.float32)
        runs = {}
        for name, mesh in [("single", None), ("dp8", mesh_lib.create_mesh())]:
            m = _tiny(seed=4)
            runs[name] = train_base_flow(
                m, ArrayDataset(imgs), epochs=3, lr=1e-3, batch_size=8,
                mesh=mesh, device_epoch=True, progress=False,
            )
        # same permutations + RNG streams; only sharded-reduction ordering
        # noise may differ
        np.testing.assert_allclose(
            runs["single"], runs["dp8"], rtol=2e-3, atol=1e-4
        )

    def test_mesh_epoch_fsdp(self, eight_devices):
        from rectified_flow_vision_tpu.data import ArrayDataset
        from rectified_flow_vision_tpu.models import train_base_flow

        imgs = np.random.RandomState(6).randn(16, 8, 8, 3).astype(np.float32)
        m = _tiny(seed=7)
        losses = train_base_flow(
            m, ArrayDataset(imgs), epochs=2, lr=1e-3, batch_size=8,
            mesh=mesh_lib.create_mesh(), fsdp=True, device_epoch=True,
            progress=False,
        )
        assert len(losses) == 2 and np.isfinite(losses).all()

    def test_rectified_mesh_epoch_matches_single(self, eight_devices):
        from rectified_flow_vision_tpu.models import (
            RectifiedFlowModel,
            train_rectified_flow,
        )

        rs = np.random.RandomState(8)
        x0 = rs.randn(16, 8, 8, 3).astype(np.float32)
        x1 = rs.randn(16, 8, 8, 3).astype(np.float32)
        runs = {}
        for name, mesh in [("single", None), ("dp8", mesh_lib.create_mesh())]:
            m = RectifiedFlowModel(
                image_size=8, model_channels=16, channel_mult=[1, 2],
                num_res_blocks=1, sample_dtype="float32", seed=9,
            )
            runs[name] = train_rectified_flow(
                m, x0, x1, epochs=2, batch_size=8, lr=1e-3,
                data_format="NHWC", mesh=mesh, device_epoch=True,
                progress=False,
            )
        np.testing.assert_allclose(
            runs["single"], runs["dp8"], rtol=2e-3, atol=1e-4
        )


class TestGraftEntry:
    def test_dryrun_multichip_inprocess(self, eight_devices):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

"""Train-state checkpoint/resume tests (a capability the reference lacks)."""

import numpy as np
import pytest

from rectified_flow_vision_tpu.models import BaseFlowModel, train_base_flow

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


def _tiny(seed=0):
    return BaseFlowModel(
        image_size=8,
        model_channels=16,
        channel_mult=[1],
        num_res_blocks=1,
        sample_dtype="float32",
        seed=seed,
    )


class TestResume:
    def test_interrupted_run_resumes_and_matches(self, tmp_path, monkeypatch):
        """A run killed mid-training and resumed with the SAME epoch horizon
        reproduces the uninterrupted run (per-epoch deterministic keys)."""
        data = [np.random.RandomState(0).randn(4, 8, 8, 3).astype(np.float32)]
        kwargs = dict(epochs=4, lr=1e-3, progress=False, seed=3, save_every=1)

        # uninterrupted reference run
        m_full = _tiny(seed=1)
        losses_full = train_base_flow(m_full, data, **kwargs)

        # crash the run after epoch 2's checkpoint has been written
        resume_dir = tmp_path / "state"
        m_a = _tiny(seed=1)
        from rectified_flow_vision_tpu.utils import train_state as ts

        orig_save = ts.TrainStateManager.save
        calls = {"n": 0}

        def crashing_save(self, epoch, params, opt_state, losses, ema=None):
            orig_save(self, epoch, params, opt_state, losses, ema=ema)
            self.wait()  # ensure the checkpoint is committed before "dying"
            calls["n"] += 1
            if calls["n"] == 2:
                raise KeyboardInterrupt("simulated crash")

        monkeypatch.setattr(ts.TrainStateManager, "save", crashing_save)
        with pytest.raises(KeyboardInterrupt):
            train_base_flow(m_a, data, resume_dir=str(resume_dir), **kwargs)
        monkeypatch.setattr(ts.TrainStateManager, "save", orig_save)

        # fresh process: same init seed, resumes from the committed state
        m_b = _tiny(seed=1)
        losses_b = train_base_flow(
            m_b, data, resume_dir=str(resume_dir), **kwargs
        )

        assert len(losses_b) == 4
        np.testing.assert_allclose(losses_b, losses_full, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(m_full.params["input_conv"]["w"]),
            np.asarray(m_b.params["input_conv"]["w"]),
            rtol=1e-4,
            atol=1e-6,
        )

    def test_completed_run_resume_is_noop(self, tmp_path):
        data = [np.random.randn(4, 8, 8, 3).astype(np.float32)]
        resume_dir = tmp_path / "state"
        m = _tiny()
        losses1 = train_base_flow(
            m, data, epochs=2, lr=1e-3, progress=False,
            save_every=1, resume_dir=str(resume_dir),
        )
        m2 = _tiny()
        losses2 = train_base_flow(
            m2, data, epochs=2, lr=1e-3, progress=False,
            save_every=1, resume_dir=str(resume_dir),
        )
        np.testing.assert_allclose(losses1, losses2, rtol=1e-6)


class TestEMAResume:
    def test_ema_survives_restart(self, tmp_path, monkeypatch):
        """EMA state is checkpointed and restored — a run crashed mid-flight
        (same epoch horizon) reproduces the uninterrupted run's EMA."""
        import jax

        data = [np.random.RandomState(0).randn(4, 8, 8, 3).astype(np.float32)]
        kwargs = dict(epochs=4, lr=1e-3, progress=False, seed=5, save_every=1,
                      ema_decay=0.5)

        m_full = _tiny(seed=2)
        train_base_flow(
            m_full, data, save_path=str(tmp_path / "full"), **kwargs
        )
        from rectified_flow_vision_tpu.utils.checkpoint import load_params
        from rectified_flow_vision_tpu.utils import train_state as ts

        ema_full, _ = load_params(str(tmp_path / "full_ema_final.npz"))

        # crash after epoch 2's state checkpoint, same 4-epoch horizon
        resume_dir = tmp_path / "state"
        orig_save = ts.TrainStateManager.save
        calls = {"n": 0}

        def crashing_save(self, epoch, params, opt_state, losses, ema=None):
            orig_save(self, epoch, params, opt_state, losses, ema=ema)
            self.wait()
            calls["n"] += 1
            if calls["n"] == 2:
                raise KeyboardInterrupt("simulated crash")

        monkeypatch.setattr(ts.TrainStateManager, "save", crashing_save)
        m_a = _tiny(seed=2)
        with pytest.raises(KeyboardInterrupt):
            train_base_flow(m_a, data, resume_dir=str(resume_dir), **kwargs)
        monkeypatch.setattr(ts.TrainStateManager, "save", orig_save)

        m_b = _tiny(seed=2)
        train_base_flow(
            m_b, data, resume_dir=str(resume_dir),
            save_path=str(tmp_path / "resumed"), **kwargs
        )
        ema_res, _ = load_params(str(tmp_path / "resumed_ema_final.npz"))
        for a, b in zip(
            jax.tree_util.tree_leaves(ema_full),
            jax.tree_util.tree_leaves(ema_res),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

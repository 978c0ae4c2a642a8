"""Native C++ batch-pipeline tests (skipped when the lib isn't built)."""

import numpy as np
import pytest

from rectified_flow_vision_tpu.data.native_loader import (
    NativeBatchLoader,
    native_available,
)

# native_available() auto-builds lib/librfv_data.so on first call (a few
# seconds of g++), so these run in the FAST suite; only the skip remains
# for toolchain-less environments
pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain / build failed"
)


@pytest.fixture(scope="module")
def corpus():
    return np.random.default_rng(0).integers(
        0, 256, (50, 16, 16, 3), dtype=np.uint8
    )


class TestNativeLoader:
    def test_shapes_and_range(self, corpus):
        ldr = NativeBatchLoader(corpus, 8, seed=1)
        batches = list(ldr.epoch(0))
        assert len(batches) == 50 // 8
        for b in batches:
            assert b.shape == (8, 16, 16, 3)
            assert b.dtype == np.float32
            assert b.min() >= -1.0 and b.max() <= 1.0
        ldr.close()

    def test_normalization_bit_exact_vs_python(self, corpus):
        """C++ (v/255)*2-1 matches the Python pipeline bit-exactly."""
        ldr = NativeBatchLoader(corpus, 50, seed=1)  # one batch = whole corpus
        (batch,) = list(ldr.epoch(0))
        ldr.close()
        want = {
            (corpus[i].astype(np.float32) / 255.0 * 2.0 - 1.0).tobytes()
            for i in range(50)
        }
        got = {batch[j].tobytes() for j in range(50)}
        assert got == want

    def test_deterministic_per_seed_epoch(self, corpus):
        a = NativeBatchLoader(corpus, 8, seed=3)
        b = NativeBatchLoader(corpus, 8, seed=3)
        ea = [x.copy() for x in a.epoch(5)]
        eb = [x.copy() for x in b.epoch(5)]
        for x, y in zip(ea, eb):
            np.testing.assert_array_equal(x, y)
        # different epoch or seed shuffles differently
        ec = [x.copy() for x in a.epoch(6)]
        assert not np.array_equal(ea[0], ec[0])
        c = NativeBatchLoader(corpus, 8, seed=4)
        ed = [x.copy() for x in c.epoch(5)]
        assert not np.array_equal(ea[0], ed[0])
        a.close(); b.close(); c.close()

    def test_epoch_covers_each_image_once(self, corpus):
        ldr = NativeBatchLoader(corpus, 10, seed=2)
        seen = []
        lookup = {
            (corpus[i].astype(np.float32) / 255.0 * 2.0 - 1.0).tobytes(): i
            for i in range(50)
        }
        for b in ldr.epoch(0):
            for j in range(10):
                seen.append(lookup[b[j].tobytes()])
        assert sorted(seen) == list(range(50))
        ldr.close()

    def test_multiple_epochs_back_to_back(self, corpus):
        ldr = NativeBatchLoader(corpus, 8, seed=1, workers=2)
        for e in range(5):
            assert len(list(ldr.epoch(e))) == 6
        ldr.close()

    def test_abandoned_epoch_restart(self, corpus):
        """Breaking out mid-epoch then restarting must not deliver stale
        batches or shrink the prefetch ring (generation-counter fix)."""
        ldr = NativeBatchLoader(corpus, 10, seed=7, workers=4, prefetch_depth=2)
        lookup = {
            (corpus[i].astype(np.float32) / 255.0 * 2.0 - 1.0).tobytes(): i
            for i in range(50)
        }
        for trial in range(20):
            it = ldr.epoch(trial)
            next(it)  # consume one batch, abandon the rest mid-flight
        # a full epoch after many abandons still covers each image exactly once
        seen = []
        for b in ldr.epoch(999):
            for j in range(10):
                seen.append(lookup[b[j].tobytes()])
        assert sorted(seen) == list(range(50))
        # and the shuffle is the epoch-999 shuffle, not a stale epoch's
        ref = NativeBatchLoader(corpus, 10, seed=7, workers=1, prefetch_depth=2)
        want = [x.copy() for x in ref.epoch(999)]
        got = [x.copy() for x in ldr.epoch(999)]
        for x, y in zip(want, got):
            np.testing.assert_array_equal(x, y)
        ldr.close(); ref.close()

    def test_batch_too_large_raises(self, corpus):
        with pytest.raises(ValueError):
            NativeBatchLoader(corpus, 51, seed=0)

    @pytest.mark.slow
    def test_train_loop_integration(self, corpus):
        """Feed a real train loop with native batches."""
        from rectified_flow_vision_tpu.models import BaseFlowModel, train_base_flow

        ldr = NativeBatchLoader(corpus, 8, seed=1)
        m = BaseFlowModel(
            image_size=16, model_channels=16, channel_mult=[1],
            num_res_blocks=1, sample_dtype="float32",
        )
        losses = train_base_flow(
            m, list(ldr.epoch(0)), epochs=2, lr=1e-3, progress=False
        )
        assert len(losses) == 2
        ldr.close()

    def test_train_base_flow_native_path(self, corpus, tmp_path):
        """use_native_loader=True trains through the C++ pipeline."""
        from PIL import Image
        from rectified_flow_vision_tpu.data import ImageDataset
        from rectified_flow_vision_tpu.models import BaseFlowModel, train_base_flow

        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(12):
            Image.fromarray(corpus[i]).save(d / f"image_{i:04d}.png")
        ds = ImageDataset(str(d), 16)
        m = BaseFlowModel(
            image_size=16, model_channels=16, channel_mult=[1],
            num_res_blocks=1, sample_dtype="float32",
        )
        losses = train_base_flow(
            m, ds, epochs=2, lr=1e-3, batch_size=4, progress=False,
            use_native_loader=True,
        )
        assert len(losses) == 2

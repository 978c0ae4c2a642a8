"""Packed mmap corpus tests."""

import numpy as np
import pytest

from rectified_flow_vision_tpu.data.packed import PackedCorpus, pack_corpus
from rectified_flow_vision_tpu.utils.download_data import generate_synthetic_images


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed")
    generate_synthetic_images(str(root / "imgs"), 20, 16, seed=4)
    out = root / "corpus.rfvc"
    n = pack_corpus(root / "imgs", out, 16)
    assert n == 20
    return out


class TestPackedCorpus:
    def test_header_and_shape(self, corpus_file):
        pc = PackedCorpus(corpus_file)
        assert pc.shape == (20, 16, 16, 3)
        assert len(pc) == 20
        assert pc.images_u8.dtype == np.uint8

    def test_content_matches_dataset(self, corpus_file):
        """Packed pixels == the decode path's pixels (round-tripped u8)."""
        from rectified_flow_vision_tpu.data import ImageDataset

        pc = PackedCorpus(corpus_file)
        ds = ImageDataset(str(corpus_file.parent / "imgs"), 16)
        np.testing.assert_array_equal(np.asarray(pc.images_u8), ds.images_u8)

    def test_batches_shape_and_range(self, corpus_file):
        pc = PackedCorpus(corpus_file)
        batches = list(pc.batches(8, seed=0))
        assert len(batches) == 2
        for b in batches:
            assert b.shape == (8, 16, 16, 3)
            assert b.dtype == np.float32
            assert b.min() >= -1.0 and b.max() <= 1.0

    def test_bad_magic_raises(self, tmp_path):
        bad = tmp_path / "bad.rfvc"
        bad.write_bytes(b"NOTMAGIC" + b"\0" * 64)
        with pytest.raises(ValueError, match="magic"):
            PackedCorpus(bad)

    def test_native_loader_zero_copy(self, corpus_file):
        """The C++ loader consumes the memmap without copying it."""
        from rectified_flow_vision_tpu.data.native_loader import native_available

        if not native_available():
            pytest.skip("native lib not built")
        pc = PackedCorpus(corpus_file)
        ldr = pc.native_loader(5, seed=1)
        assert ldr is not None
        # ascontiguousarray must not have copied the mapped pages
        assert isinstance(ldr._corpus, np.memmap) or (
            ldr._corpus.base is not None
        )
        batches = list(ldr.epoch(0))
        assert len(batches) == 4
        assert batches[0].shape == (5, 16, 16, 3)
        ldr.close()

    def test_train_on_packed(self, corpus_file):
        from rectified_flow_vision_tpu.models import BaseFlowModel, train_base_flow

        pc = PackedCorpus(corpus_file)
        m = BaseFlowModel(
            image_size=16, model_channels=16, channel_mult=[1],
            num_res_blocks=1, sample_dtype="float32",
        )
        losses = train_base_flow(
            m, list(pc.batches(10, seed=0)), epochs=2, lr=1e-3, progress=False
        )
        assert len(losses) == 2

    def test_train_base_flow_accepts_packed_corpus(self, corpus_file):
        """PackedCorpus goes straight into train_base_flow (duck-typed
        dataset protocol) without materializing the corpus."""
        from rectified_flow_vision_tpu.models import BaseFlowModel, train_base_flow

        pc = PackedCorpus(corpus_file)
        m = BaseFlowModel(
            image_size=16, model_channels=16, channel_mult=[1],
            num_res_blocks=1, sample_dtype="float32",
        )
        losses = train_base_flow(
            m, pc, epochs=2, lr=1e-3, batch_size=10, progress=False
        )
        assert len(losses) == 2

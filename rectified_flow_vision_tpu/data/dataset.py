"""Image dataset + host-side batching pipeline.

TPU-native replacement for the reference's torch ``ImageDataset`` +
``DataLoader`` (reference: experiments/train_base.py:20-46,78-84). Instead of
per-item lazy decode with a torch DataLoader, we decode the whole corpus once
into a contiguous NHWC numpy array (the reference corpora are tiny: 100
64x64 images) and iterate shuffled, *fixed-shape* batches — static shapes are
what XLA wants; the last partial batch is dropped during training (standard
JAX practice) but exposed via ``pad_last`` for evaluation.

Images are normalized to [-1, 1] exactly like the reference transform
(Resize -> ToTensor -> Normalize(0.5, 0.5)).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np
from PIL import Image

_EXTS = (".png", ".jpg", ".jpeg")


def list_image_paths(image_dir: str | Path) -> List[Path]:
    paths: List[Path] = []
    for ext in _EXTS:
        paths.extend(sorted(Path(image_dir).glob(f"*{ext}")))
    return paths


def load_image(path: str | Path, image_size: int) -> np.ndarray:
    """Decode one image to float32 NHWC in [-1, 1]."""
    img = Image.open(path).convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0  # [0,1] -> [-1,1]


class ImageDataset:
    """In-memory NHWC image corpus in [-1, 1].

    Drop-in analogue of the reference ImageDataset: same glob patterns, same
    normalization; ``__getitem__`` returns a single [H, W, C] float32 array.
    """

    def __init__(self, image_dir: str | Path, image_size: int = 64):
        self.image_dir = str(image_dir)
        self.image_size = image_size
        self.image_paths = list_image_paths(image_dir)
        if self.image_paths:
            self.images = np.stack(
                [load_image(p, image_size) for p in self.image_paths]
            )
        else:
            self.images = np.zeros(
                (0, image_size, image_size, 3), dtype=np.float32
            )
        print(f"Dataset loaded: {len(self.image_paths)} images")

    @property
    def images_u8(self) -> np.ndarray:
        """uint8 view of the corpus (for the native C++ batch pipeline).

        rint before the cast: plain truncation would round f32 noise in the
        inverse normalization down a full grey level.
        """
        return np.clip(
            np.rint((self.images + 1.0) * 127.5), 0, 255
        ).astype(np.uint8)

    def native_loader(self, batch_size: int, *, seed: int = 0, **kwargs):
        """C++ prefetching batch loader over this corpus (or None when the
        native library is not built)."""
        from rectified_flow_vision_tpu.data.native_loader import (
            NativeBatchLoader,
            native_available,
        )

        if not native_available() or len(self) == 0 or batch_size > len(self):
            return None
        return NativeBatchLoader(
            self.images_u8, batch_size, seed=seed, **kwargs
        )

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.images[idx]

    # ---- batching -------------------------------------------------------

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: Optional[int] = None,
        drop_last: bool = True,
        repeat_to_fill: bool = True,
    ) -> Iterator[np.ndarray]:
        """Yield fixed-shape [B, H, W, C] batches for one epoch.

        With ``repeat_to_fill`` (default), a corpus smaller than one batch is
        tiled up so training still sees full, static-shape batches — the
        reference's DataLoader instead yields a small final batch, which
        would force an XLA recompile per shape.
        """
        n = len(self)
        if n == 0:
            return
        idx = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        if n < batch_size and repeat_to_fill:
            reps = -(-batch_size // n)  # ceil
            idx = np.tile(idx, reps)[:batch_size]
            n = batch_size
        end = n - (n % batch_size) if drop_last else n
        if drop_last and end == 0:
            return
        for start in range(0, end, batch_size):
            yield self.images[idx[start : start + batch_size]]

    def num_batches(self, batch_size: int, drop_last: bool = True) -> int:
        n = len(self)
        if n == 0:
            return 0
        if n < batch_size:
            return 1
        return n // batch_size if drop_last else -(-n // batch_size)


class ArrayDataset:
    """In-memory NHWC array corpus with the dataset protocol.

    Wraps an arbitrary [N, H, W, C] array (e.g. VAE latents for the
    latent-diffusion pipeline) so it can drive the same training paths as
    ``ImageDataset`` — including the device-resident epoch scan, which
    only needs ``.images``.
    """

    def __init__(self, images: np.ndarray):
        self.images = np.asarray(images, dtype=np.float32)
        if self.images.ndim != 4:
            raise ValueError("ArrayDataset expects [N, H, W, C]")

    def __len__(self) -> int:
        return self.images.shape[0]

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.images[idx]

    # same per-epoch semantics as ImageDataset
    batches = ImageDataset.batches
    num_batches = ImageDataset.num_batches

    def native_loader(self, batch_size: int, **kwargs):
        """Latents are float-valued; the uint8 C++ pipeline does not apply."""
        return None


def as_nchw(x: np.ndarray) -> np.ndarray:
    """NHWC -> NCHW (user-facing boundary; the reference API is NCHW)."""
    return np.transpose(x, (0, 3, 1, 2))


def as_nhwc(x: np.ndarray) -> np.ndarray:
    """NCHW -> NHWC (internal TPU-native layout)."""
    return np.transpose(x, (0, 2, 3, 1))


def eval_reference_images(image_size: int, n: int) -> np.ndarray:
    """Held-out synthetic evaluation references (NHWC float32 in [-1,1]).

    Quality metrics compared against the TRAINING corpus reward
    memorization and are capped at the corpus size; this returns a
    disjoint, deterministic eval set drawn from the same procedural
    distribution (reference: utils/download_data.py:51-101). The set lives
    in ``data/eval_<size>/`` (gitignored — a pure function of
    (image_size, n): generation is sequential from a fixed seed, so
    growing n keeps every earlier image identical) and is regenerated
    whenever fewer than ``n`` images are present.
    """
    import shutil

    from rectified_flow_vision_tpu.config import repo_root
    from rectified_flow_vision_tpu.utils.download_data import (
        generate_synthetic_images,
    )

    d = repo_root() / "data" / f"eval_{image_size}"
    have = len(list_image_paths(d)) if d.exists() else 0
    if have < n:
        shutil.rmtree(d, ignore_errors=True)
        generate_synthetic_images(
            str(d), n, image_size, seed=4242 + image_size
        )
    return ImageDataset(str(d), image_size).images[:n]

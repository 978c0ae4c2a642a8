"""LPIPS perceptual distance in JAX (AlexNet backbone).

The reference uses the ``lpips`` pip package lazily, with a NaN fallback
when it is not installed (reference: utils/metrics.py:25-36,56-71). That
package is torch-only; this is a from-scratch JAX evaluation path:

AlexNet ``features`` trunk (relu1..relu5 taps) -> per-layer channel-unit
normalisation -> squared difference -> learned 1x1 linear heads -> spatial
mean -> sum over layers. Input is [B, C, H, W] in [-1, 1], scaled by the
LPIPS shift/scale constants.

Pretrained weights cannot be fetched in a no-egress environment; they load
from ``weights/lpips_alex.npz`` produced by ``tools/convert_lpips_weights.py``
on any machine that has the ``lpips`` pip package. Without the file,
``MetricsCalculator.compute_lpips`` keeps the reference's NaN fallback.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from rectified_flow_vision_tpu.config import repo_root

DEFAULT_WEIGHTS_PATH = repo_root() / "weights" / "lpips_alex.npz"

# LPIPS input scaling constants (per channel, RGB).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet features trunk: (kernel, stride, pad, out_ch, maxpool_after)
_ALEX_LAYERS = [
    (11, 4, 2, 64, True),
    (5, 1, 2, 192, True),
    (3, 1, 1, 384, False),
    (3, 1, 1, 256, False),
    (3, 1, 1, 256, False),
]


def _conv_nhwc(x, w, b, stride: int, pad: int):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + b


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _unit_normalize(feat, eps: float = 1e-10):
    norm = jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True))
    return feat / (norm + eps)


class LPIPS:
    """LPIPS evaluator. ``weights`` maps conv{i}_{w,b} and lin{i}_w arrays."""

    def __init__(self, weights: Dict[str, np.ndarray]):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()}
        self._fn = jax.jit(self._distance)

    @classmethod
    def load_default(cls) -> "LPIPS":
        if not DEFAULT_WEIGHTS_PATH.exists():
            raise FileNotFoundError(
                f"LPIPS weights not found at {DEFAULT_WEIGHTS_PATH}; run "
                "tools/convert_lpips_weights.py on a machine with the lpips "
                "pip package."
            )
        with np.load(DEFAULT_WEIGHTS_PATH) as data:
            return cls({k: data[k] for k in data.files})

    def _features(self, x) -> List[jnp.ndarray]:
        """x: NHWC in [-1,1], LPIPS-scaled; returns relu1..relu5 taps."""
        h = x
        taps = []
        for i, (k, s, p, out_ch, pool) in enumerate(_ALEX_LAYERS):
            h = _conv_nhwc(
                h, self.weights[f"conv{i}_w"], self.weights[f"conv{i}_b"], s, p
            )
            h = jax.nn.relu(h)
            taps.append(h)
            if pool:
                h = _maxpool_3x3_s2(h)
        return taps

    def _distance(self, img1, img2):
        # NCHW [-1,1] -> NHWC, LPIPS scaling
        x1 = jnp.transpose(img1, (0, 2, 3, 1)).astype(jnp.float32)
        x2 = jnp.transpose(img2, (0, 2, 3, 1)).astype(jnp.float32)
        x1 = (x1 - _SHIFT) / _SCALE
        x2 = (x2 - _SHIFT) / _SCALE

        f1, f2 = self._features(x1), self._features(x2)
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2  # [B,H,W,C]
            lin = self.weights[f"lin{i}_w"]  # [C] nonneg 1x1 head
            val = jnp.sum(d * jnp.maximum(lin, 0.0), axis=-1)  # [B,H,W]
            total = total + jnp.mean(val, axis=(1, 2))  # [B]
        return total

    def __call__(self, img1, img2) -> np.ndarray:
        """LPIPS distances for [B, C, H, W] batches in [-1, 1]."""
        return np.asarray(self._fn(jnp.asarray(img1), jnp.asarray(img2)))

    def fid_features(self, images) -> np.ndarray:
        """Deep features for learned-feature FID: spatially pooled relu5
        activations of [B, C, H, W] images in [-1, 1].

        The reference's FID uses raw pixels and says "In production, use
        Inception v3" (reference: utils/metrics.py:84-88); pooled conv
        features from the same pretrained backbone that powers LPIPS are
        the learned-feature upgrade this environment can load offline.
        """
        x = jnp.transpose(jnp.asarray(images), (0, 2, 3, 1)).astype(jnp.float32)
        x = (x - _SHIFT) / _SCALE
        taps = self._features(x)
        pooled = jnp.mean(taps[-1], axis=(1, 2))  # [B, 256]
        return np.asarray(pooled)

    def _norm_flat_taps(self, images):
        """Per-stage normalised taps weighted by the learned lin heads,
        flattened so dot products reproduce the LPIPS cross terms."""
        x = jnp.transpose(jnp.asarray(images), (0, 2, 3, 1)).astype(jnp.float32)
        x = (x - _SHIFT) / _SCALE
        flats = []
        for i, a in enumerate(self._features(x)):
            na = _unit_normalize(a)
            w = jnp.maximum(self.weights[f"lin{i}_w"], 0.0)  # [C]
            hw = na.shape[1] * na.shape[2]
            scaled = na * jnp.sqrt(w)  # so u.v = sum_c w_c na.nb per pixel
            flats.append(
                scaled.reshape(scaled.shape[0], hw * scaled.shape[3])
                / np.sqrt(hw)
            )
        return flats

    def pairwise_distance(self, imgs_a, imgs_b) -> np.ndarray:
        """All-pairs LPIPS distances [B_a, B_b] via the Gram-matrix
        identity (exact; three matmuls per stage instead of B_a*B_b
        forward passes)."""
        total = None
        for u, v in zip(self._norm_flat_taps(imgs_a), self._norm_flat_taps(imgs_b)):
            a2 = jnp.sum(u * u, axis=1)
            b2 = jnp.sum(v * v, axis=1)
            d = a2[:, None] + b2[None, :] - 2.0 * (u @ v.T)
            total = d if total is None else total + d
        return np.asarray(jnp.maximum(total, 0.0))

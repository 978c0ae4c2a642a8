"""InceptionV3 pool3 feature extractor in JAX — the standard FID backbone.

The reference's "FID" uses raw flattened pixels and notes "In production,
use Inception v3" (reference: utils/metrics.py:84-88). This is that
production path: the torchvision InceptionV3 feature trunk (through the
global average pool, 2048-d pool3 features) implemented in JAX with
BatchNorm folded into per-channel scale/shift at conversion time.

Weights load from ``weights/inception_v3.npz`` produced by
``tools/convert_inception_weights.py`` on a machine with torchvision
(no-egress environments cannot fetch pretrained weights; without the file
``MetricsCalculator.compute_fid_inception`` returns NaN, the same fallback
contract as LPIPS).

Layer inventory is declared once in ``CONV_SPECS`` (name -> in, out,
kernel, stride, pad); the forward graph, the synthetic-weight generator
used by tests, and the converter all share it.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rectified_flow_vision_tpu.config import repo_root

DEFAULT_WEIGHTS_PATH = repo_root() / "weights" / "inception_v3.npz"

# name: (in_ch, out_ch, (kh, kw), stride, (ph, pw))
CONV_SPECS: Dict[str, Tuple[int, int, Tuple[int, int], int, Tuple[int, int]]] = {}


def _spec(name, cin, cout, k, s=1, p=(0, 0)):
    CONV_SPECS[name] = (cin, cout, k, s, p)


# ---- stem -----------------------------------------------------------------
_spec("Conv2d_1a_3x3", 3, 32, (3, 3), 2)
_spec("Conv2d_2a_3x3", 32, 32, (3, 3))
_spec("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1))
_spec("Conv2d_3b_1x1", 64, 80, (1, 1))
_spec("Conv2d_4a_3x3", 80, 192, (3, 3))


def _inception_a(prefix, cin, pool_features):
    _spec(f"{prefix}.branch1x1", cin, 64, (1, 1))
    _spec(f"{prefix}.branch5x5_1", cin, 48, (1, 1))
    _spec(f"{prefix}.branch5x5_2", 48, 64, (5, 5), 1, (2, 2))
    _spec(f"{prefix}.branch3x3dbl_1", cin, 64, (1, 1))
    _spec(f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1))
    _spec(f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), 1, (1, 1))
    _spec(f"{prefix}.branch_pool", cin, pool_features, (1, 1))
    return 64 + 64 + 96 + pool_features


def _inception_b(prefix, cin):
    _spec(f"{prefix}.branch3x3", cin, 384, (3, 3), 2)
    _spec(f"{prefix}.branch3x3dbl_1", cin, 64, (1, 1))
    _spec(f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1))
    _spec(f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), 2)
    return 384 + 96 + cin


def _inception_c(prefix, cin, c7):
    _spec(f"{prefix}.branch1x1", cin, 192, (1, 1))
    _spec(f"{prefix}.branch7x7_1", cin, c7, (1, 1))
    _spec(f"{prefix}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3))
    _spec(f"{prefix}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0))
    _spec(f"{prefix}.branch7x7dbl_1", cin, c7, (1, 1))
    _spec(f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0))
    _spec(f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3))
    _spec(f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0))
    _spec(f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3))
    _spec(f"{prefix}.branch_pool", cin, 192, (1, 1))
    return 192 * 4


def _inception_d(prefix, cin):
    _spec(f"{prefix}.branch3x3_1", cin, 192, (1, 1))
    _spec(f"{prefix}.branch3x3_2", 192, 320, (3, 3), 2)
    _spec(f"{prefix}.branch7x7x3_1", cin, 192, (1, 1))
    _spec(f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3))
    _spec(f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0))
    _spec(f"{prefix}.branch7x7x3_4", 192, 192, (3, 3), 2)
    return 320 + 192 + cin


def _inception_e(prefix, cin):
    _spec(f"{prefix}.branch1x1", cin, 320, (1, 1))
    _spec(f"{prefix}.branch3x3_1", cin, 384, (1, 1))
    _spec(f"{prefix}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1))
    _spec(f"{prefix}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0))
    _spec(f"{prefix}.branch3x3dbl_1", cin, 448, (1, 1))
    _spec(f"{prefix}.branch3x3dbl_2", 448, 384, (3, 3), 1, (1, 1))
    _spec(f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1))
    _spec(f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0))
    _spec(f"{prefix}.branch_pool", cin, 192, (1, 1))
    return 320 + 768 + 768 + 192


_c = _inception_a("Mixed_5b", 192, 32)
_c = _inception_a("Mixed_5c", _c, 64)
_c = _inception_a("Mixed_5d", _c, 64)
_c = _inception_b("Mixed_6a", _c)
_c = _inception_c("Mixed_6b", _c, 128)
_c = _inception_c("Mixed_6c", _c, 160)
_c = _inception_c("Mixed_6d", _c, 160)
_c = _inception_c("Mixed_6e", _c, 192)
_c = _inception_d("Mixed_7a", _c)
_c = _inception_e("Mixed_7b", _c)
FEATURE_DIM_IN = _inception_e("Mixed_7c", _c)  # 2048


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _bconv(w: Dict[str, jnp.ndarray], name: str, x):
    """BasicConv2d: conv (no bias) + folded-BN scale/shift + relu."""
    _, _, _, stride, pad = CONV_SPECS[name]
    out = jax.lax.conv_general_dilated(
        x,
        w[f"{name}.w"],
        window_strides=(stride, stride),
        padding=(
            (pad[0], pad[0]),
            (pad[1], pad[1]),
        ),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(out * w[f"{name}.scale"] + w[f"{name}.shift"])


def _maxpool(x, k=3, s=2, p=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, k, k, 1), (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0)),
    )


def _avgpool3(x):
    # torch F.avg_pool2d defaults to count_include_pad=True: always /9,
    # including at the zero-padded borders (matches the converted weights).
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / 9.0


def _block_a(w, p, x):
    b1 = _bconv(w, f"{p}.branch1x1", x)
    b5 = _bconv(w, f"{p}.branch5x5_2", _bconv(w, f"{p}.branch5x5_1", x))
    b3 = _bconv(
        w, f"{p}.branch3x3dbl_3",
        _bconv(w, f"{p}.branch3x3dbl_2", _bconv(w, f"{p}.branch3x3dbl_1", x)),
    )
    bp = _bconv(w, f"{p}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(w, p, x):
    b3 = _bconv(w, f"{p}.branch3x3", x)
    bd = _bconv(
        w, f"{p}.branch3x3dbl_3",
        _bconv(w, f"{p}.branch3x3dbl_2", _bconv(w, f"{p}.branch3x3dbl_1", x)),
    )
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _block_c(w, p, x):
    b1 = _bconv(w, f"{p}.branch1x1", x)
    b7 = _bconv(
        w, f"{p}.branch7x7_3",
        _bconv(w, f"{p}.branch7x7_2", _bconv(w, f"{p}.branch7x7_1", x)),
    )
    bd = x
    for i in range(1, 6):
        bd = _bconv(w, f"{p}.branch7x7dbl_{i}", bd)
    bp = _bconv(w, f"{p}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(w, p, x):
    b3 = _bconv(w, f"{p}.branch3x3_2", _bconv(w, f"{p}.branch3x3_1", x))
    b7 = x
    for i in range(1, 5):
        b7 = _bconv(w, f"{p}.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _block_e(w, p, x):
    b1 = _bconv(w, f"{p}.branch1x1", x)
    b3 = _bconv(w, f"{p}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [_bconv(w, f"{p}.branch3x3_2a", b3), _bconv(w, f"{p}.branch3x3_2b", b3)],
        axis=-1,
    )
    bd = _bconv(w, f"{p}.branch3x3dbl_2", _bconv(w, f"{p}.branch3x3dbl_1", x))
    bd = jnp.concatenate(
        [_bconv(w, f"{p}.branch3x3dbl_3a", bd), _bconv(w, f"{p}.branch3x3dbl_3b", bd)],
        axis=-1,
    )
    bp = _bconv(w, f"{p}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features:
    """pool3 (2048-d) features for FID. Input: [B, C, H, W] in [-1, 1]."""

    def __init__(self, weights: Dict[str, np.ndarray]):
        self.w = {k: jnp.asarray(v, jnp.float32) for k, v in weights.items()}
        self._fn = jax.jit(self._forward)

    @classmethod
    def load_default(cls) -> "InceptionV3Features":
        if not DEFAULT_WEIGHTS_PATH.exists():
            raise FileNotFoundError(
                f"InceptionV3 weights not found at {DEFAULT_WEIGHTS_PATH}; "
                "run tools/convert_inception_weights.py with torchvision."
            )
        with np.load(DEFAULT_WEIGHTS_PATH) as data:
            return cls({k: data[k] for k in data.files})

    def _forward(self, images):
        # NCHW [-1,1] -> NHWC, bilinear 299x299 (the FID-standard input)
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32)
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")
        # torchvision's pretrained trunk consumes [-1,1] directly: its
        # transform_input step x*(std/0.5)+(mean-0.5)/0.5 maps an
        # ImageNet-NORMALIZED input to [-1,1] (check: x=(p-0.485)/0.229
        # gives 2p-1). Our inputs are already [-1,1], so no transform here.
        w = self.w

        x = _bconv(w, "Conv2d_1a_3x3", x)
        x = _bconv(w, "Conv2d_2a_3x3", x)
        x = _bconv(w, "Conv2d_2b_3x3", x)
        x = _maxpool(x)
        x = _bconv(w, "Conv2d_3b_1x1", x)
        x = _bconv(w, "Conv2d_4a_3x3", x)
        x = _maxpool(x)
        for p in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = _block_a(w, p, x)
        x = _block_b(w, "Mixed_6a", x)
        for p in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = _block_c(w, p, x)
        x = _block_d(w, "Mixed_7a", x)
        for p in ("Mixed_7b", "Mixed_7c"):
            x = _block_e(w, p, x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 2048]

    def __call__(self, images) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(images)))


def synthetic_weights(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random correctly-shaped weights (tests / shape validation)."""
    rng = np.random.default_rng(seed)
    out: Dict[str, np.ndarray] = {}
    for name, (cin, cout, (kh, kw), _, _) in CONV_SPECS.items():
        # He init: variance-preserving through the 94-conv relu chain so
        # synthetic-weight tests see signal, not a collapsed constant
        out[f"{name}.w"] = rng.normal(
            0, np.sqrt(2.0 / (cin * kh * kw)), (kh, kw, cin, cout)
        ).astype(np.float32)
        out[f"{name}.scale"] = np.ones(cout, np.float32)
        out[f"{name}.shift"] = rng.normal(0, 0.01, cout).astype(np.float32)
    return out

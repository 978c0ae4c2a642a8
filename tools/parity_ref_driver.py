"""Head-to-head parity driver — REFERENCE (PyTorch) side.

Runs the reference implementation end-to-end on a seeded synthetic corpus
and dumps every artifact the comparison needs into out/:
  corpus/                 100 synthetic PNGs (np.random seeded)
  noise_128.npy           shared sampling noise [128,3,64,64] (torch seeded)
  base_init.pt            untrained checkpoint (for import tests)
  base_final.pt           trained base model (50 epochs, reference defaults)
  base_losses.npy         per-epoch loss curve
  base_samples_64.npy     128 samples @ 64 Euler steps from the shared noise
  base_samples_{1,2,4,8}.npy   few-step samples (first 32 noises)
  rect_final.pt, rect_losses.npy
  pairs_x0.npy/pairs_x1.npy    the reflow coupling (256 pairs @ 50 steps)
  rect_samples_{1,2,4,8}.npy   few-step rectified samples
  rect_samples_4_full.npy      128 rectified samples @ 4 steps (FID set)
  timings.json

Reflow scale is reduced vs the reference default (256 pairs / 50 teacher
steps / 15 epochs instead of 1000/100/30) because this host has ONE CPU
core; the JAX side runs the *identical* settings so the comparison is
apples-to-apples.
"""
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.abspath(__file__)))

# torchvision is not installed in this environment. The reference uses only
# transforms.{Compose,Resize,ToTensor,Normalize} on PIL RGB images
# (reference experiments/train_base.py:32-36), so register a faithful stub
# before the reference imports it: bilinear resize, HWC uint8 -> CHW float
# in [0,1], per-channel (x - mean) / std.
try:  # pragma: no cover - prefer the real package when present
    import torchvision  # noqa: F401
except ModuleNotFoundError:
    import types

    from PIL import Image

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class _Resize:
        def __init__(self, size):
            self.size = tuple(size) if isinstance(size, (tuple, list)) else (size, size)

        def __call__(self, img):
            return img.resize((self.size[1], self.size[0]), Image.BILINEAR)

    class _ToTensor:
        def __call__(self, img):
            a = np.asarray(img, dtype=np.float32) / 255.0
            return torch.from_numpy(a).permute(2, 0, 1).contiguous()

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    _tv = types.ModuleType("torchvision")
    _tf = types.ModuleType("torchvision.transforms")
    _tf.Compose, _tf.Resize = _Compose, _Resize
    _tf.ToTensor, _tf.Normalize = _ToTensor, _Normalize
    _tv.transforms = _tf
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tf

from torch.utils.data import DataLoader

from experiments.train_base import ImageDataset
from models.base_flow import BaseFlowModel, train_base_flow
from models.rectified_flow import (
    RectifiedFlowModel,
    generate_reflow_pairs,
    train_rectified_flow,
)

# load utils/download_data.py directly by path: the utils package __init__
# pulls in metrics -> skimage/lpips, which this environment doesn't have
# and this driver doesn't need
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "_ref_download_data", os.path.join("utils", "download_data.py")
)
_dd = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_dd)
generate_synthetic_images = _dd.generate_synthetic_images

OUT = "out"
os.makedirs(OUT, exist_ok=True)
timings = {}


def mark(name, t0):
    timings[name] = round(time.time() - t0, 1)
    with open(f"{OUT}/timings.json", "w") as f:
        json.dump(timings, f, indent=1)
    print(f"[parity-ref] {name}: {timings[name]}s", flush=True)


# 1. corpus ---------------------------------------------------------------
t0 = time.time()
np.random.seed(1234)
corpus_dir = f"{OUT}/corpus"
if not (os.path.isdir(corpus_dir) and len(os.listdir(corpus_dir)) >= 100):
    os.makedirs(corpus_dir, exist_ok=True)
    generate_synthetic_images(corpus_dir, num_images=100, size=64)
mark("corpus", t0)

# 2. base training (reference defaults: 50 epochs, batch 16, lr 1e-4) -----
torch.manual_seed(42)
ds = ImageDataset(corpus_dir, image_size=64)
g = torch.Generator().manual_seed(42)
dl = DataLoader(ds, batch_size=16, shuffle=True, generator=g, num_workers=0)
model = BaseFlowModel(image_size=64)
model.save(f"{OUT}/base_init.pt")

t0 = time.time()
losses = train_base_flow(model, dl, epochs=50, lr=1e-4, save_path=None)
np.save(f"{OUT}/base_losses.npy", np.array(losses))
model.save(f"{OUT}/base_final.pt")
mark("base_train_50ep", t0)

# 3. shared noise + base sampling ----------------------------------------
torch.manual_seed(777)
noise = torch.randn(128, 3, 64, 64)
np.save(f"{OUT}/noise_128.npy", noise.numpy())


def _velocity_probe(m, x):
    """[5,8,3,64,64]: v(x, t) at t in {0,.25,.5,.75,1} — consumed by
    tools/parity_run.py step 1 (velocity-field agreement via pt import).
    eval() first: the model leaves training in train mode and active
    dropout would randomize the probe."""
    was_training = m.training
    m.eval()
    with torch.no_grad():
        out = torch.stack(
            [
                m.forward(x, torch.full((x.shape[0],), tv))
                for tv in (0.0, 0.25, 0.5, 0.75, 1.0)
            ]
        ).numpy()
    if was_training:
        m.train()
    return out


np.save(f"{OUT}/base_velocity_probe.npy", _velocity_probe(model, noise[:8]))

t0 = time.time()
outs = []
with torch.no_grad():
    for i in range(0, 128, 32):
        outs.append(model.sample(noise=noise[i : i + 32], num_steps=64).cpu())
np.save(f"{OUT}/base_samples_64.npy", torch.cat(outs).numpy())
mark("base_sample_128x64step", t0)

t0 = time.time()
with torch.no_grad():
    for s in (1, 2, 4, 8):
        x = model.sample(noise=noise[:32].clone(), num_steps=s).cpu()
        np.save(f"{OUT}/base_samples_{s}.npy", x.numpy())
mark("base_fewstep_grids", t0)

# 4. reflow (identical reduced scale on both sides) -----------------------
torch.manual_seed(4242)
t0 = time.time()
x0, x1 = generate_reflow_pairs(model, num_pairs=256, batch_size=32, num_steps=50)
np.save(f"{OUT}/pairs_x0.npy", x0.numpy())
np.save(f"{OUT}/pairs_x1.npy", x1.numpy())
mark("pairgen_256x50", t0)

rect = RectifiedFlowModel.from_base_model(model)
t0 = time.time()
rlosses = train_rectified_flow(
    rect, x0, x1, epochs=15, batch_size=16, lr=1e-4, save_path=None
)
np.save(f"{OUT}/rect_losses.npy", np.array(rlosses))
rect.save(f"{OUT}/rect_final.pt")
np.save(f"{OUT}/rect_velocity_probe.npy", _velocity_probe(rect, noise[:8]))
mark("rect_train_15ep", t0)

t0 = time.time()
with torch.no_grad():
    for s in (1, 2, 4, 8):
        x = rect.sample(noise=noise[:32].clone(), num_steps=s).cpu()
        np.save(f"{OUT}/rect_samples_{s}.npy", x.numpy())
    outs = []
    for i in range(0, 128, 32):
        outs.append(rect.sample(noise=noise[i : i + 32], num_steps=4).cpu())
    np.save(f"{OUT}/rect_samples_4_full.npy", torch.cat(outs).numpy())
mark("rect_sampling", t0)

print("[parity-ref] DONE", flush=True)

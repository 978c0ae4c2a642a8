"""Convert torchvision InceptionV3 weights to our npz format.

Run on any machine with torchvision (+ network for the pretrained
download):

    python tools/convert_inception_weights.py [--out weights/inception_v3.npz]

Per conv layer, stores the HWIO kernel plus the BatchNorm folded into
per-channel scale/shift (inference mode):
scale = gamma / sqrt(var + eps); shift = beta - mean * scale.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights/inception_v3.npz")
    args = parser.parse_args()

    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import torch
    from torchvision.models import Inception_V3_Weights, inception_v3

    from rectified_flow_vision_tpu.utils.inception_jax import CONV_SPECS

    model = inception_v3(weights=Inception_V3_Weights.IMAGENET1K_V1)
    model.eval()

    out = {}
    for name, spec in CONV_SPECS.items():
        # torchvision names: "Mixed_5b.branch1x1" -> module with .conv/.bn
        module = model
        for part in name.split("."):
            module = getattr(module, part)
        w = module.conv.weight.detach().numpy()  # OIHW
        bn = module.bn
        gamma = bn.weight.detach().numpy()
        beta = bn.bias.detach().numpy()
        mean = bn.running_mean.detach().numpy()
        var = bn.running_var.detach().numpy()
        scale = gamma / np.sqrt(var + bn.eps)
        shift = beta - mean * scale

        cin, cout, (kh, kw), _, _ = spec
        assert w.shape == (cout, cin, kh, kw), f"{name}: {w.shape} vs {spec}"
        out[f"{name}.w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"{name}.scale"] = scale.astype(np.float32)
        out[f"{name}.shift"] = shift.astype(np.float32)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

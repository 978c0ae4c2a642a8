"""Convert the ``lpips`` pip package's AlexNet weights to our npz format.

Run on any machine with ``pip install lpips torch``:

    python tools/convert_lpips_weights.py [--out weights/lpips_alex.npz]

Produces conv{i}_{w,b} (HWIO) for the 5 AlexNet feature convs and lin{i}_w
(per-channel 1x1 head weights) for the 5 LPIPS linear layers, matching
``rectified_flow_vision_tpu.utils.lpips_jax.LPIPS``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out", default="weights/lpips_alex.npz", help="output npz path"
    )
    args = parser.parse_args()

    import lpips  # requires: pip install lpips

    model = lpips.LPIPS(net="alex")
    model.eval()

    out = {}
    convs = [m for m in model.net.slice1] + list(model.net.slice2) + list(
        model.net.slice3
    ) + list(model.net.slice4) + list(model.net.slice5)
    conv_layers = [m for m in convs if m.__class__.__name__ == "Conv2d"]
    assert len(conv_layers) == 5, f"expected 5 convs, got {len(conv_layers)}"
    for i, conv in enumerate(conv_layers):
        w = conv.weight.detach().numpy()  # OIHW
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{i}_b"] = conv.bias.detach().numpy()

    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w[0, :, 0, 0]

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

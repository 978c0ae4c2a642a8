#!/usr/bin/env python
"""Train the SynthNet metric backbone and save weights/synthnet.npz.

SynthNet provides learned-feature FID and perceptual distance when the
real pretrained backbones (lpips_alex.npz / inception_v3.npz) cannot be
fetched (no-egress environment). See utils/synthnet.py for the rationale.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rectified_flow_vision_tpu.utils import synthnet  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-train", type=int, default=6144)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=str(synthnet.DEFAULT_WEIGHTS_PATH))
    args = p.parse_args()

    params, metrics = synthnet.train_synthnet(
        n_train=args.n_train,
        epochs=args.epochs,
        batch=args.batch,
        lr=args.lr,
        seed=args.seed,
    )
    synthnet.save_weights(params, Path(args.out))
    print(
        f"saved {args.out} (val count {metrics['count_acc']:.3f} "
        f"blur {metrics['blur_acc']:.3f} noise {metrics['noise_acc']:.3f})"
    )


if __name__ == "__main__":
    main()

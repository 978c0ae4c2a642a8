"""Pack an image directory into a single mmap-able corpus file.

    python tools/pack_corpus.py data/mock_images --out data/corpus.rfvc --size 64
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from rectified_flow_vision_tpu.data.packed import pack_corpus


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("image_dir")
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=64)
    args = parser.parse_args()
    n = pack_corpus(args.image_dir, args.out, args.size)
    print(f"packed {n} images into {args.out}")


if __name__ == "__main__":
    main()

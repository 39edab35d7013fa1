"""Example: score a reference/distorted image pair.

Usage:
    python examples/score_pair.py REF.png DIST.png [--checkpoint best.npz]
                                  [--vit-npz ViT-B_16.npz] [--patches 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vtamiq_tpu.data.imageio import imread
from vtamiq_tpu.inference import VTAMIQScorer


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref")
    ap.add_argument("dist")
    ap.add_argument("--checkpoint", default=None, help="framework .npz checkpoint")
    ap.add_argument("--vit-npz", default=None, help="jax-format ImageNet ViT weights")
    ap.add_argument("--patches", type=int, default=500)
    ap.add_argument("--repeats", type=int, default=4,
                    help="patch-resampling repeats averaged (reference test default)")
    args = ap.parse_args()

    if args.checkpoint:
        scorer = VTAMIQScorer.from_checkpoint(args.checkpoint,
                                              patch_count=args.patches,
                                              num_repeats=args.repeats)
    elif args.vit_npz:
        scorer = VTAMIQScorer.from_vit_npz(args.vit_npz, patch_count=args.patches,
                                           num_repeats=args.repeats)
    else:
        print("WARNING: no weights given; scoring with random init.", file=sys.stderr)
        scorer = VTAMIQScorer(patch_count=args.patches, num_repeats=args.repeats)

    ref = imread(args.ref)
    dist = imread(args.dist)
    if ref.shape != dist.shape:
        raise SystemExit(f"image sizes differ: {ref.shape} vs {dist.shape}")
    q = scorer.score_pair(ref, dist)
    print(f"q = {q:.6f}  (lower = better under the training convention)")


if __name__ == "__main__":
    main()

"""Generate a centerbias log-density template .npy.

The reference derives its template from MIT1003 fixation data via pysaliency
(modules/Attention/deepgaze2/Create_Centerbias.ipynb) and ships it as
centerbias.npy; that asset and the fixation data are not redistributable
here, so this script writes the analytic anisotropic-Gaussian stand-in
(vtamiq_tpu/ops/sampling.py gaussian_centerbias_logdensity — sigma chosen to
match the MIT1003 prior's wider-than-tall center mass) to the packaged asset
location that ``load_centerbias_template`` resolves.

Usage:
    python tools/make_centerbias.py [--out vtamiq_tpu/assets/centerbias.npy]
                                    [--size 1024] [--sigma-y 0.28]
                                    [--sigma-x 0.40]

With real MIT1003 fixations, replace the analytic density with a kernel
-density estimate over normalized fixation coordinates and save its log —
the on-disk format (2-D float log-density, any resolution) is identical.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vtamiq_tpu.ops.sampling import gaussian_centerbias_logdensity


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(
        REPO, "vtamiq_tpu", "assets", "centerbias.npy"))
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--sigma-y", type=float, default=0.28)
    ap.add_argument("--sigma-x", type=float, default=0.40)
    args = ap.parse_args()

    template = gaussian_centerbias_logdensity(
        args.size, sigma_y=args.sigma_y, sigma_x=args.sigma_x).astype(np.float32)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.save(args.out, template)
    print(f"wrote {args.out}: shape={template.shape} "
          f"logdensity range [{template.min():.3f}, {template.max():.3f}]")


if __name__ == "__main__":
    main()

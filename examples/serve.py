"""Example: production scoring service.

Starts the micro-batching HTTP scorer (vtamiq_tpu/serving.py) from a
framework checkpoint (or random weights for smoke testing), pre-compiles
the expected image shape, then serves until interrupted.

Usage:
    python examples/serve.py [--checkpoint best.npz] [--vit-npz ViT-B_16.npz]
                             [--port 8080] [--max-batch 16]
                             [--warmup-hw 384 512] [--patch-count 500]

Client:
    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.savez(buf, ref=ref_hwc01, dist=dist_hwc01)
    req = urllib.request.Request("http://HOST:8080/score",
                                 data=buf.getvalue(), method="POST")
    print(urllib.request.urlopen(req).read())   # {"q": ...}
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vtamiq_tpu.inference import VTAMIQScorer
from vtamiq_tpu.serving import ScoringServer


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--vit-npz", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--patch-count", type=int, default=500)
    ap.add_argument("--num-repeats", type=int, default=1)
    ap.add_argument("--warmup-hw", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="pre-compile pipelines for this image size")
    ap.add_argument("--size-buckets", type=int, nargs="+", default=None,
                    metavar="H W",
                    help="flat H W pairs of canonical size buckets (e.g. "
                         "'--size-buckets 384 512 768 1024'): variable-size "
                         "traffic pads up to <= these shapes and shares "
                         "executables/batches instead of compiling per novel "
                         "shape; with --restrict-to-warmed, any shape a "
                         "warmed bucket covers is admitted")
    ap.add_argument("--int8", action="store_true",
                    help="quantize the ViT encoder to int8 W8A8 at load "
                         "(2x smaller weights, ~5%% faster, rank-faithful "
                         "scores — see ops/quant.py's measurement ledger)")
    ap.add_argument("--ingest-uint8", action="store_true",
                    help="ship images host->device as uint8 and normalize "
                         "on device: 4x less ingest traffic (pair with "
                         "uint8 npz payloads for 4x smaller requests too); "
                         "exact for 8-bit-sourced images")
    ap.add_argument("--restrict-to-warmed", action="store_true",
                    help="reject novel image sizes fast instead of letting "
                         "them stall the dispatcher behind an XLA compile "
                         "(recommended in production with --warmup-hw)")
    args = ap.parse_args()

    kwargs = dict(patch_count=args.patch_count, num_repeats=args.num_repeats,
                  quantize_int8=args.int8, ingest_uint8=args.ingest_uint8)
    if args.size_buckets:
        if len(args.size_buckets) % 2:
            ap.error("--size-buckets needs an even count of ints (H W pairs)")
        kwargs["size_buckets"] = list(zip(args.size_buckets[0::2],
                                          args.size_buckets[1::2]))
    if args.checkpoint:
        scorer = VTAMIQScorer.from_checkpoint(args.checkpoint, **kwargs)
    elif args.vit_npz:
        scorer = VTAMIQScorer.from_vit_npz(args.vit_npz, **kwargs)
    else:
        print("WARNING: no --checkpoint/--vit-npz; serving RANDOM weights "
              "(smoke mode)")
        scorer = VTAMIQScorer(**kwargs)

    server = ScoringServer(scorer, host=args.host, port=args.port,
                           max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms,
                           restrict_to_warmed=args.restrict_to_warmed)
    if args.warmup_hw:
        h, w = args.warmup_hw
        print(f"warming up (h={h}, w={w}, ladder up to {args.max_batch})...")
        server.warmup(h, w)
    server.start()
    print(f"serving on http://{server.address[0]}:{server.address[1]} "
          f"(POST /score, /compare; GET /healthz)")
    try:
        while True:
            time.sleep(60)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()

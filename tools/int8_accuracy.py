"""Accuracy eval for the opt-in int8 serving path: does W8A8 preserve
quality RANKING on a trained model?

FR-IQA is the adversarial case for quantization: the head consumes
ref-vs-dist feature *differences*, so independent per-tower quantization
noise is amplified relative to the (small) true signal for near-pristine
pairs. This tool measures that directly — a trained checkpoint scores a
synthetic distortion ladder (data/synth.py bank: structured content,
graded severities across distortion families) through the bf16 and int8
scorers with identical patch sampling, then reports:

- SROCC(int8 scores, bf16 scores): global rank agreement between paths,
- per-type SROCC(score, -severity) for both paths: whether each path
  still orders severities correctly,
- max |delta| against the bf16 score spread.

Usage: python tools/int8_accuracy.py [checkpoint.npz]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

DEFAULT_CKPT = (".kadis_workflow_out/"
                "1787122661-TID2013-VTAMIQ-ViT-B16-6L-4R-2e-16b-384p/best.npz")

TYPES = {"gauss_noise": 0, "blur": 2, "quantize": 4, "contrast": 5,
         "jpeg_blockiness": 10}
LEVELS = 8
REFS = 3
H, W = 384, 512


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CKPT
    import jax
    from vtamiq_tpu.inference import VTAMIQScorer
    from vtamiq_tpu.data.synth import make_base_image, apply_distortion
    from vtamiq_tpu.ops.correlations import compute_correlations
    from vtamiq_tpu.ops.quant import count_quantized_leaves

    print(f"device: {jax.devices()[0].device_kind}  ckpt: {ckpt}", flush=True)
    seed = int(time.time()) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)

    refs, dists, labels = [], [], []
    for r in range(REFS):
        base = make_base_image(rng, H, W).astype(np.float32)
        for tname, tidx in TYPES.items():
            for lvl in range(1, LEVELS + 1):
                refs.append(base)
                dists.append(apply_distortion(rng, base, tidx, lvl, LEVELS,
                                              type_gain=1.0).astype(np.float32))
                labels.append((r, tname, lvl))
    print(f"{len(refs)} pairs ({REFS} refs x {len(TYPES)} types x {LEVELS} "
          f"levels), seed {seed}", flush=True)

    def scores(quantize):
        sc = VTAMIQScorer.from_checkpoint(ckpt, patch_count=500,
                                          num_repeats=2, seed=11,
                                          quantize_int8=quantize)
        return sc.score_batch(refs, dists), sc

    t0 = time.perf_counter()
    q_bf16, _ = scores(False)
    print(f"bf16 pass: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    q_int8, sc8 = scores(True)
    print(f"int8 pass: {time.perf_counter() - t0:.1f}s "
          f"({count_quantized_leaves(sc8.params['vit'])} leaves)", flush=True)

    corr = compute_correlations(np.asarray(q_int8), np.asarray(q_bf16))
    spread = float(np.max(q_bf16) - np.min(q_bf16))
    maxd = float(np.max(np.abs(q_int8 - q_bf16)))
    print(f"\nSROCC(int8, bf16) = {corr['SROCC']:.5f}  "
          f"PLCC_NOFIT = {corr['PLCC_NOFIT']:.5f}", flush=True)
    print(f"max|delta| = {maxd:.4f} over bf16 spread {spread:.4f} "
          f"({100 * maxd / max(spread, 1e-9):.1f}%)", flush=True)

    per_type = {}
    print("\nper-type severity ordering, SROCC(score, -level):", flush=True)
    for tname in TYPES:
        idx = [i for i, (r, t, l) in enumerate(labels) if t == tname]
        sev = -np.asarray([labels[i][2] for i in idx], float)
        c_b = compute_correlations(np.asarray(q_bf16)[idx], sev)["SROCC"]
        c_8 = compute_correlations(np.asarray(q_int8)[idx], sev)["SROCC"]
        per_type[tname] = {"bf16": round(float(c_b), 4),
                           "int8": round(float(c_8), 4)}
        print(f"  {tname:16s} bf16 {c_b:+.4f}   int8 {c_8:+.4f}", flush=True)

    # machine-readable artifact (VERDICT r4 #6): committed alongside the
    # throughput row so the ops/quant.py ledger can cite it
    import json
    import os
    out_path = os.environ.get("INT8_ACCURACY_OUT",
                              "/root/repo/docs/int8_accuracy_r5.json")
    artifact = {
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "checkpoint": ckpt, "seed": seed,
        "pairs": len(refs), "patch_count": 500, "repeats": 2,
        "SROCC_int8_vs_bf16": round(float(corr["SROCC"]), 5),
        "PLCC_NOFIT_int8_vs_bf16": round(float(corr["PLCC_NOFIT"]), 5),
        "max_abs_delta_q": round(maxd, 4),
        "bf16_score_spread": round(spread, 4),
        "max_delta_pct_of_spread": round(100 * maxd / max(spread, 1e-9), 2),
        "per_type_severity_srocc": per_type,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"artifact -> {out_path}", flush=True)
    print("ACCURACY DONE", flush=True)


if __name__ == "__main__":
    main()

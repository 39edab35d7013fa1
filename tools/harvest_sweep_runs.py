"""Recover completed config-4 sweep runs from a crashed parity_run workdir.

The full-mode LIVE multiscale sweep (parity_run.run_config4) was OOM-killed
on run 10/10 before the per-config checkpoint fired; each completed run's
test correlations survive in its output dir's ``output.txt`` ("Test stats:"
block written by engine.train(), train/engine.py). This parses them into
engine.train()-shaped correlation dicts and seeds
``PARITY_REPORT.json.partial`` with ``configs["4"] = {"partial_runs": [...]}``
so ``parity_run --resume-partial`` reruns only the missing runs (run i always
uses seed ``args.seed + i``, so the resumed sweep is the same experiment).

Usage: python tools/harvest_sweep_runs.py <workdir> [report.partial]
"""
import json
import os
import re
import sys

FIELDS = ("SROCC", "KROCC", "PLCC", "RMSE", "PLCC_NOFIT", "RMSE_NOFIT")


def parse_run_dir(path):
    out_txt = os.path.join(path, "output.txt")
    if not os.path.isfile(out_txt):
        return None
    with open(out_txt) as f:
        text = f.read()
    m = text.rfind("Test stats:")
    if m < 0:
        return None
    stats = {}
    for field in FIELDS:
        fm = re.search(rf"^{field}=([-\d.eE]+)$", text[m:], re.M)
        if not fm:
            return None
        stats[field] = float(fm.group(1))
    return stats


def main():
    workdir = sys.argv[1]
    report_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_REPORT.json.partial")
    run_dirs = sorted(
        d for d in os.listdir(workdir)
        if "LIVE" in d and os.path.isdir(os.path.join(workdir, d)))
    runs = []
    for d in run_dirs:
        stats = parse_run_dir(os.path.join(workdir, d))
        if stats is None:
            print(f"incomplete (killed mid-run), stopping harvest: {d}")
            break
        runs.append(stats)
        print(f"harvested {d}: SROCC={stats['SROCC']:.4f}")

    with open(report_path) as f:
        report = json.load(f)
    report["configs"]["4"] = {"partial_runs": runs,
                              "harvested_from": workdir}
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(f"seeded {report_path} with {len(runs)} completed sweep runs")


if __name__ == "__main__":
    main()

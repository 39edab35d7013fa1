"""Crash-recovery logic of the parity harness (parity_run + harvest tool).

The full-mode LIVE sweep (parity_run.run_config4: 10 engine.train() runs in
one process) was OOM-killed on run 10 before any checkpoint fired; these
cover the machinery added so that never costs hours again: per-run partial
checkpoints, resume-carry of mid-sweep state, and harvesting completed runs
from a dead workdir's output.txt files (written by engine.train(),
vtamiq_tpu/train/engine.py "Test stats:" block).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import parity_run
from tools import harvest_sweep_runs, rerun_anchor


class TestCarryPriorConfigs:
    def _report(self):
        return {"mode": "full", "configs": {}}

    def test_completed_config_not_rerun_carries(self):
        report = self._report()
        prior = {"mode": "full", "generated_at": "T",
                 "configs": {"1": {"pass": True, "x": 1}}}
        parity_run.carry_prior_configs(report, prior, wanted=[4, 5])
        assert report["configs"]["1"] == {"pass": True, "x": 1}
        assert report["resumed_from_partial"] == "T"

    def test_completed_config_being_rerun_is_dropped(self):
        report = self._report()
        prior = {"mode": "full",
                 "configs": {"4": {"pass": False, "stats": {}}}}
        parity_run.carry_prior_configs(report, prior, wanted=[4])
        assert "4" not in report["configs"]

    def test_mid_sweep_partial_runs_carry_even_when_wanted(self):
        report = self._report()
        runs = [{"SROCC": 0.7, "KROCC": 0.5, "PLCC": 0.7, "RMSE": 0.2}]
        prior = {"mode": "full", "configs": {"4": {"partial_runs": runs}}}
        parity_run.carry_prior_configs(report, prior, wanted=[4])
        assert report["configs"]["4"]["partial_runs"] == runs

    def test_reuse_anchor_c3_carries_passing_anchor(self):
        # round-5: --reuse-anchor-c3 lets a dynamics-only rerun spend its
        # whole deadline window on new paired seeds
        report = self._report()
        prior = {"mode": "full", "configs": {"3": {
            "pass": True, "val_SROCC_after_1_epoch": 0.8,
            "identical_weights_val_eval": {"pass": True}}}}
        parity_run.carry_prior_configs(report, prior, wanted=[3],
                                       reuse_anchor_c3=True)
        assert "3" in report["configs"]

    def test_reuse_anchor_c3_requires_passing_anchor(self):
        report = self._report()
        prior = {"mode": "full", "configs": {"3": {
            "pass": False, "val_SROCC_after_1_epoch": 0.8,
            "identical_weights_val_eval": {"pass": False}}}}
        parity_run.carry_prior_configs(report, prior, wanted=[3],
                                       reuse_anchor_c3=True)
        assert "3" not in report["configs"]

    def test_mode_mismatch_carries_nothing(self):
        report = self._report()
        prior = {"mode": "quick", "configs": {"1": {"pass": True}}}
        parity_run.carry_prior_configs(report, prior, wanted=[4])
        assert report["configs"] == {}
        assert "resumed_from_partial" not in report


class TestParseTrainSrocc:
    def test_matches_metric_name_not_writer_index(self, tmp_path):
        # batch>4 runs number the tag 5.SROCC, batch<=4 runs 4.SROCC (no
        # SROCC_batch_s tag created); both must parse, batch_s must not
        lines = [
            {"tag": "Training/4.SROCC_batch_s", "value": 0.9, "step": 10},
            {"tag": "Training/5.SROCC", "value": 0.25, "step": 1},
            {"tag": "Training/4.SROCC", "value": 0.5, "step": 2},
            {"tag": "Validation/11.val-SROCC", "value": 0.7, "step": 1},
        ]
        p = tmp_path / "scalars.jsonl"
        p.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
        assert parity_run.parse_train_srocc_by_epoch(str(p)) == [0.25, 0.5]


class TestRecomputePass:
    """rerun_anchor.recompute_pass mirrors each run_config*'s own gate."""

    def test_config3_needs_srocc_dynamics_and_anchor(self):
        entry = {"val_SROCC_after_1_epoch": 0.8,
                 "training_dynamics": {"pass": True}}
        assert rerun_anchor.recompute_pass(3, entry, anchor_ok=True)
        assert not rerun_anchor.recompute_pass(3, entry, anchor_ok=False)
        entry["training_dynamics"]["pass"] = False
        assert not rerun_anchor.recompute_pass(3, entry, anchor_ok=True)
        entry = {"val_SROCC_after_1_epoch": 0.1}  # below the 0.3 floor
        assert not rerun_anchor.recompute_pass(3, entry, anchor_ok=True)

    def test_config4_needs_finite_sweep_mean_and_anchor(self):
        entry = {"stats": {"SROCC": {"mean": 0.58}}}
        assert rerun_anchor.recompute_pass(4, entry, anchor_ok=True)
        assert not rerun_anchor.recompute_pass(4, entry, anchor_ok=False)
        entry = {"stats": {"SROCC": {"mean": float("nan")}}}
        assert not rerun_anchor.recompute_pass(4, entry, anchor_ok=True)

    def test_config5_needs_cross_db_learning_and_anchor(self):
        entry = {"cross_database": {"TID2013": {"SROCC": 0.4}},
                 "train_SROCC_by_epoch": [0.1, 0.45, 0.62]}
        assert rerun_anchor.recompute_pass(5, entry, anchor_ok=True)
        assert not rerun_anchor.recompute_pass(5, entry, anchor_ok=False)
        entry["train_SROCC_by_epoch"][-1] = 0.2  # did not learn
        assert not rerun_anchor.recompute_pass(5, entry, anchor_ok=True)
        entry["train_SROCC_by_epoch"][-1] = 0.62
        entry["cross_database"]["TID2013"]["SROCC"] = float("nan")
        assert not rerun_anchor.recompute_pass(5, entry, anchor_ok=True)


class TestFitNoiseFloor:
    """Jackknife SEs + the automatic fit-free Pearson fallback.

    Config 3's measured failure mode: identical-weights anchors where
    dSROCC ~ 1e-4 and raw-Pearson delta passes, but the 4-parameter
    logistic fit amplifies the tiny prediction differences past the gate
    (dPLCC_fitted 0.0084 vs gate 0.005 at 256 pairs x 4 repeats). The
    fallback must fire only when the fit measurably cannot resolve the
    gate — never to mask a genuine stack mismatch."""

    def test_jackknife_zero_for_identical_repeats(self):
        rng = __import__("numpy").random.default_rng(0)
        import numpy as np
        ys1 = rng.uniform(size=50)
        yp1 = ys1 + rng.normal(scale=0.05, size=50)
        ys = np.tile(ys1, 4)
        yp = np.tile(yp1, 4)
        se = parity_run._jackknife_se(ys, yp, 4)
        for k in ("SROCC", "PLCC", "PLCC_NOFIT"):
            assert se[k] == 0.0

    def test_jackknife_positive_for_noisy_repeats_and_none_for_single(self):
        import numpy as np
        rng = np.random.default_rng(1)
        ys1 = rng.uniform(size=50)
        ys = np.tile(ys1, 4)
        yp = np.concatenate([ys1 + rng.normal(scale=0.1, size=50)
                             for _ in range(4)])
        se = parity_run._jackknife_se(ys, yp, 4)
        assert se["PLCC_NOFIT"] > 0.0
        assert se["SROCC"] > 0.0
        assert parity_run._jackknife_se(ys1, yp[:50], 1) is None

    def test_forced_fit_free(self):
        metric, note = parity_run.pearson_gate_decision(
            0.09, 0.002, None, 0.005, fit_free=True)
        assert metric == "PLCC_NOFIT" and "forced" in note

    def test_auto_fallback_when_fit_cannot_resolve_gate(self):
        # config 3's measured shape: fitted delta AND fitted noise floor
        # above the gate, raw Pearson resolves and passes
        se = {"PLCC": 0.012, "PLCC_NOFIT": 0.0015}
        metric, note = parity_run.pearson_gate_decision(
            0.0084, 0.0021, se, 0.005, fit_free=False)
        assert metric == "PLCC_NOFIT" and "auto" in note

    def test_no_fallback_when_fit_resolves(self):
        # fitted delta above gate but the fit's noise floor is BELOW the
        # gate: that is a real disagreement, not fit chaos — must fail
        se = {"PLCC": 0.001, "PLCC_NOFIT": 0.001}
        metric, note = parity_run.pearson_gate_decision(
            0.0084, 0.0021, se, 0.005, fit_free=False)
        assert metric == "PLCC" and note is None

    def test_no_fallback_when_raw_pearson_also_fails(self):
        se = {"PLCC": 0.012, "PLCC_NOFIT": 0.0015}
        metric, _ = parity_run.pearson_gate_decision(
            0.02, 0.0095, se, 0.005, fit_free=False)
        assert metric == "PLCC"

    def test_no_fallback_when_raw_pearson_floor_too_noisy(self):
        # if even PLCC_NOFIT can't resolve the gate the budget is simply
        # insufficient; don't quietly gate on an unresolvable metric
        se = {"PLCC": 0.012, "PLCC_NOFIT": 0.011}
        metric, _ = parity_run.pearson_gate_decision(
            0.0084, 0.0021, se, 0.005, fit_free=False)
        assert metric == "PLCC"

    def test_no_fallback_without_jackknife(self):
        metric, _ = parity_run.pearson_gate_decision(
            0.0084, 0.0021, None, 0.005, fit_free=False)
        assert metric == "PLCC"

    def test_fitted_delta_within_gate_keeps_default(self):
        se = {"PLCC": 0.012, "PLCC_NOFIT": 0.0015}
        metric, _ = parity_run.pearson_gate_decision(
            0.003, 0.001, se, 0.005, fit_free=False)
        assert metric == "PLCC"


class TestHarvest:
    OUTPUT = ("Beginning epoch 001\n"
              "Completed epoch 1\n"
              "Test stats:\n"
              "SROCC=0.760266370699223\n"
              "KROCC=0.5610859728506787\n"
              "PLCC=0.7940458905272133\n"
              "RMSE=0.19093262546625148\n"
              "PLCC_NOFIT=0.7166429238050914\n"
              "RMSE_NOFIT=0.3108804155375697\n")

    def _run_dir(self, tmp_path, name, text):
        d = tmp_path / name
        d.mkdir()
        (d / "output.txt").write_text(text)
        return d

    def test_parse_complete_run(self, tmp_path):
        d = self._run_dir(tmp_path, "1-LIVE-run", self.OUTPUT)
        stats = harvest_sweep_runs.parse_run_dir(str(d))
        assert stats["SROCC"] == 0.760266370699223
        assert stats["RMSE_NOFIT"] == 0.3108804155375697

    def test_parse_killed_run_returns_none(self, tmp_path):
        d = self._run_dir(tmp_path, "2-LIVE-run",
                          "Beginning epoch 001\n")  # no Test stats block
        assert harvest_sweep_runs.parse_run_dir(str(d)) is None

    def test_harvest_seeds_partial_report_and_stops_at_killed_run(
            self, tmp_path, monkeypatch, capsys):
        self._run_dir(tmp_path, "100-LIVE-a", self.OUTPUT)
        self._run_dir(tmp_path, "200-LIVE-b",
                      self.OUTPUT.replace("0.760266370699223", "0.5"))
        self._run_dir(tmp_path, "300-LIVE-killed", "Beginning epoch 001\n")
        # a later complete dir after a killed one must NOT be harvested
        # (run index <-> seed alignment would break)
        self._run_dir(tmp_path, "400-LIVE-c", self.OUTPUT)
        report = tmp_path / "r.partial"
        report.write_text(json.dumps({"mode": "full", "configs": {}}))
        monkeypatch.setattr(
            sys, "argv",
            ["harvest", str(tmp_path), str(report)])
        harvest_sweep_runs.main()
        out = json.loads(report.read_text())
        runs = out["configs"]["4"]["partial_runs"]
        assert len(runs) == 2
        assert runs[0]["SROCC"] == 0.760266370699223
        assert runs[1]["SROCC"] == 0.5


class TestPairedGateVerdict:
    """Round-5 fixed-ceiling paired dynamics gate (VERDICT r4 #5)."""

    def test_all_wins_passes(self):
        mean_d, wins, ok = parity_run.paired_gate_verdict(
            [0.05, 0.01, 0.12, 0.0])
        assert ok and wins == 4 and mean_d > 0

    def test_mean_below_fixed_ceiling_fails(self):
        # one catastrophic collapse drags the mean below -0.10: must fail
        # even though ours wins 3/4 legs — the gate may not widen with the
        # variance that collapse created
        _, _, ok = parity_run.paired_gate_verdict([0.02, 0.03, 0.01, -0.55])
        assert not ok

    def test_majority_losses_fail_despite_mean(self):
        # mean inside the ceiling but ours loses 3/4 paired legs
        mean_d, wins, ok = parity_run.paired_gate_verdict(
            [-0.05, -0.06, -0.04, 0.09])
        assert mean_d >= -0.10 and wins == 1 and not ok

    def test_tie_eps_counts_quantization_noise_as_tie(self):
        _, wins, ok = parity_run.paired_gate_verdict(
            [-0.019, -0.01, 0.0, 0.001], tie_eps=0.02)
        assert wins == 4 and ok

    def test_gate_is_fixed_not_variance_derived(self):
        # the round-4 failure mode: huge spread, mean -0.267 — a 2*SE rule
        # widened to 0.328 and passed it; the fixed rule must fail it
        deltas = [-0.05, 0.02, -0.62, -0.71, 0.025]  # r4-sweep-like
        mean_d, _, ok = parity_run.paired_gate_verdict(deltas)
        assert mean_d < -0.10 and not ok


class TestSweepSidecarResume:
    """Round-5 arm-tagged sidecar: a resumed paired sweep must only reuse
    records measured under the SAME ours-arm configuration."""

    def test_filters_by_arm_and_skips_malformed(self, tmp_path):
        sc = tmp_path / "report.json.c4sweep.jsonl"
        sc.write_text(
            # round-5 exact-size record, kept as history: no arm tag
            '{"run": 0, "seed": 1, "ours": 0.78, "torch": 0.47}\n'
            '{"run": 0, "seed": 1, "arm": "fp32_bkt1", "ours": 0.80, '
            '"torch": 0.47}\n'
            '{"run": 1, "seed": 8, "arm": "other_arm", "ours": 0.1, '
            '"torch": 0.7}\n'
            'not json — crash mid-append\n')
        done = parity_run.read_sweep_sidecar(str(sc), "fp32_bkt1")
        assert set(done) == {(0, 1)}
        assert done[(0, 1)]["ours"] == 0.80

    def test_missing_file_is_empty(self, tmp_path):
        assert parity_run.read_sweep_sidecar(
            str(tmp_path / "absent.jsonl"), "fp32_bkt1") == {}

"""Bench-protocol arithmetic (r8: the self-adjudication layer).

r7's artifact flagged three regressions on code that did not change;
dismissing them took a manual re-run plus git archaeology. These tests
pin the machinery that makes the artifact self-adjudicating: the
calibration anchor, the calibration-normalized delta verdicts, the
recheck re-verdict arithmetic, and the report-section splicing that
keeps bench modes from destroying each other's output. All pure
Python — no SparkSession."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


# --- calibration anchor -------------------------------------------------

def test_calibrate_shape_and_positivity():
    c = bench._calibrate(runs=2, passes=20)
    assert c["best_s"] > 0
    assert len(c["runs_s"]) == 2
    assert c["best_s"] == min(c["runs_s"])
    assert "single-threaded" in c["kernel"]


def test_calibration_kernel_scales_with_passes():
    # 10x the passes must cost measurably more wall — the anchor times
    # real work, not setup
    lo = min(bench._calibration_kernel_once(10) for _ in range(3))
    hi = min(bench._calibration_kernel_once(100) for _ in range(3))
    assert hi > 3 * lo


def test_calibrated_pps_normalizes_to_reference_box():
    # a box 25% slower on the anchor gets its raw throughput scaled UP
    ref = bench._CALIB_REF_S
    assert bench._calibrated_pps(1000.0, ref) == 1000.0
    assert bench._calibrated_pps(800.0, ref * 1.25) == 1000.0
    assert bench._calibrated_pps(1000.0, None) is None


# --- delta verdicts -----------------------------------------------------

def test_delta_verdict_raw_bands():
    v = bench._delta_verdict(cur=13.0, prev=10.0, band=0.20)
    assert v["verdict"] == "regression" and v["delta_pct"] == 30.0
    assert bench._delta_verdict(11.5, 10.0, 0.20)["verdict"] == "noise"
    assert bench._delta_verdict(7.0, 10.0, 0.20)["verdict"] == "improvement"
    # no host_ratio -> no normalized fields, effective falls back to raw
    assert "verdict_norm" not in v
    assert bench._effective_verdict(v) == "regression"


def test_delta_verdict_host_drift_normalizes_to_noise():
    # the r7 case: +30% wall on untouched code, box 28% slower on the
    # anchor -> normalized delta ~+1.6%, inside the band
    v = bench._delta_verdict(cur=13.0, prev=10.0, band=0.20, host_ratio=1.28)
    assert v["verdict"] == "regression"          # raw stays honest
    assert v["verdict_norm"] == "noise"          # adjudicated
    assert bench._effective_verdict(v) == "noise"
    assert v["cur_norm"] == pytest.approx(13.0 / 1.28, abs=1e-3)


def test_delta_verdict_code_regression_survives_normalization():
    # +80% wall on a box only 10% slower: still a regression after
    # dividing out host speed
    v = bench._delta_verdict(cur=18.0, prev=10.0, band=0.20, host_ratio=1.10)
    assert v["verdict_norm"] == "regression"
    # and a FASTER box can unmask a regression raw bands would hide
    v2 = bench._delta_verdict(cur=11.0, prev=10.0, band=0.20, host_ratio=0.70)
    assert v2["verdict"] == "noise"
    assert v2["verdict_norm"] == "regression"


# --- recheck re-verdict -------------------------------------------------

def test_apply_recheck_noise_and_confirmed():
    v = bench._delta_verdict(cur=13.0, prev=10.0, band=0.20)
    bench._apply_recheck(v, recheck_s=10.5)      # isolated run back in band
    assert v["verdict_final"] == "noise-on-recheck"
    assert v["recheck_s"] == 10.5
    v2 = bench._delta_verdict(cur=13.0, prev=10.0, band=0.20)
    bench._apply_recheck(v2, recheck_s=12.9)     # reproduces in isolation
    assert v2["verdict_final"] == "regression-confirmed"
    # one-sided: an isolated run FASTER than prev out of band means the
    # composite run hit contention — noise, never a confirmed regression
    v3 = bench._delta_verdict(cur=13.0, prev=10.0, band=0.20)
    bench._apply_recheck(v3, recheck_s=4.9)
    assert v3["verdict_final"] == "noise-on-recheck"


def test_apply_recheck_uses_host_ratio():
    # recheck wall 12.4 on a 1.25x-slower box is 9.9 normalized -> noise
    v = bench._delta_verdict(cur=13.0, prev=10.0, band=0.20, host_ratio=1.25)
    v["verdict_norm"] = "regression"  # force the recheck path regardless
    bench._apply_recheck(v, recheck_s=12.4)
    assert v["verdict_final"] == "noise-on-recheck"


def test_vs_prev_round_flags_carry_adjudication(monkeypatch, tmp_path):
    prev = {"queries": {"doc_text": 10.0, "quality": 0.4},
            "calibration": {"best_s": 0.30}}
    monkeypatch.setattr(bench, "_prev_bench",
                        lambda: ("BENCH_r99.json", prev))
    out = bench._vs_prev_round(
        {"doc_text": 13.0, "quality": 0.5}, spread={},
        calibration={"best_s": 0.39})  # box 30% slower than prev round
    assert out["host_ratio"] == 1.3
    assert out["queries"]["doc_text"]["verdict"] == "regression"
    assert out["queries"]["doc_text"]["verdict_norm"] == "noise"
    # sub-second query gets the wider 50% floor
    assert out["queries"]["quality"]["band_pct"] == 50.0
    assert "total_delta_norm_pct" in out


def test_vs_prev_round_without_prev_calibration(monkeypatch):
    prev = {"queries": {"doc_text": 10.0}}
    monkeypatch.setattr(bench, "_prev_bench",
                        lambda: ("BENCH_r99.json", prev))
    out = bench._vs_prev_round({"doc_text": 13.0}, spread={},
                               calibration={"best_s": 0.39})
    assert "calibration_note" in out
    assert "verdict_norm" not in out["queries"]["doc_text"]
    # the effective verdict is then the raw one -> recheck would fire
    assert bench._effective_verdict(out["queries"]["doc_text"]) == "regression"


# --- report-section splicing (ADVICE r7) ---------------------------------

def test_replace_section_is_line_anchored(tmp_path):
    p = str(tmp_path / "R.md")
    with open(p, "w") as f:
        f.write("# Head\n\nsee the \"## Tail\" section below for recall\n\n"
                "## Tail\n\nold tail content\n")
    bench._replace_section(p, "## Tail", "## Tail\n\nnew tail content")
    text = open(p).read()
    assert "new tail content" in text and "old tail content" not in text
    # the prose that QUOTES the marker survives (pre-fix it was the cut
    # point and everything after it was destroyed)
    assert 'see the "## Tail" section below' in text


def test_replace_section_is_section_scoped(tmp_path):
    p = str(tmp_path / "R.md")
    with open(p, "w") as f:
        f.write("# Head\n\n## A\n\nold a\n\n## B\n\nkeep b\n")
    bench._replace_section(p, "## A", "## A\n\nnew a")
    text = open(p).read()
    assert "new a" in text and "old a" not in text
    assert "keep b" in text
    assert text.index("new a") < text.index("## B")


def test_replace_section_appends_when_missing(tmp_path):
    p = str(tmp_path / "R.md")
    with open(p, "w") as f:
        f.write("# Head\n\nbody\n")
    bench._replace_section(p, "## New", "## New\n\ncontent")
    text = open(p).read()
    assert text.startswith("# Head") and text.rstrip().endswith("content")


def test_rewrite_preserving_keeps_foreign_sections(tmp_path):
    # the --ann-capacity / --ivf-recall shape: a full rewrite of the
    # file must re-splice the section the OTHER mode appended
    p = str(tmp_path / "ANN.md")
    with open(p, "w") as f:
        f.write("# Old main\n\nold body\n\n## Clustered-corpus recall "
                "(r7)\n\nrecall table\n")
    bench._rewrite_preserving(p, "# New main\n\nnew body",
                              ["## Clustered-corpus recall"])
    text = open(p).read()
    assert text.startswith("# New main")
    assert "old body" not in text
    assert "recall table" in text


def test_rewrite_preserving_multiple_markers_in_order(tmp_path):
    p = str(tmp_path / "CB.md")
    with open(p, "w") as f:
        f.write("# Main\n\n## N -> 4N scaling of the composed build\n\n"
                "scaling rows\n\n## Curation-phase scaling\n\ncurate rows\n")
    bench._rewrite_preserving(
        p, "# Main v2",
        ["## N -> 4N scaling of the composed build",
         "## Curation-phase scaling"])
    text = open(p).read()
    assert text.index("# Main v2") < text.index("scaling rows")
    assert text.index("scaling rows") < text.index("curate rows")
    # absent markers are skipped silently
    bench._rewrite_preserving(p, "# Main v3", ["## Not There"])
    assert open(p).read().startswith("# Main v3")


def test_render_scaling_samples_per_row_shape():
    # rows render under their OWN recorded shape; a dom_work of 0.0 is a
    # real (terrible) measurement, not a missing one
    samples = [
        {"label": "s1", "lo": 4, "hi": 16, "dominant": "rasterize",
         "wall_lo": 400.0, "wall_hi": 100.0, "composite": 1.0,
         "dom_raw": 0.9, "dom_work": 0.91},
        {"label": "s2", "lo": 8, "hi": 32, "dominant": "detect_enrich",
         "wall_lo": 200.0, "wall_hi": 60.0, "composite": 0.83,
         "dom_raw": 0.5, "dom_work": 0.0},
    ]
    sec = bench._render_scaling_samples(samples, 8, 32, "detect_enrich")
    assert "| s1 | 4→16, rasterize |" in sec
    assert "| s2 | 8→32, detect_enrich |" in sec
    assert "0.900 / 0.910" in sec
    assert "0.500 / 0.000" in sec          # dom_work 0.0 renders, not —
    # the min-wall floor uses only CURRENT-shape samples (s2): 200/60/4
    assert f"**{(200.0 / 60.0) / 4:.2f}**" in sec
    # the band derives from dom_work where present: min(0.91, 0.0)
    assert "0.00-0.91" in sec


def test_render_scaling_samples_legacy_rows_default_to_current_shape():
    samples = [{"label": "s1", "wall_lo": 100.0, "wall_hi": 25.0,
                "composite": 1.0, "dom_raw": 0.9, "dom_work": None}]
    sec = bench._render_scaling_samples(samples, 4, 16, "rasterize")
    assert "| s1 | 4→16, rasterize |" in sec
    assert "0.900 / —" in sec              # None stays a dash


def test_round_benches_unwraps_and_sorts(tmp_path, monkeypatch):
    import json as _json
    import os as _os
    # point discovery at a fake repo dir with shuffled round files
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda _p: str(tmp_path / "bench.py"))
    for n, payload in ((10, {"parsed": {"value": 10}}), (2, {"value": 2})):
        with open(tmp_path / f"BENCH_r{n:02d}.json", "w") as f:
            _json.dump(payload, f)
    with open(tmp_path / "BENCH_r03.json", "w") as f:
        f.write("{not json")
    rounds = bench._round_benches()
    assert [r[0] for r in rounds] == [2, 10]          # corrupt r3 skipped
    assert rounds[0][2] == {"value": 2}               # raw payload kept
    assert rounds[1][2] == {"value": 10}              # 'parsed' unwrapped
    name, prev = bench._prev_bench()
    assert name == "BENCH_r10.json" and prev == {"value": 10}


def test_render_curate_samples_ledger():
    samples = [
        {"label": "s1", "lo": 4, "hi": 16, "work_lo": 28.86,
         "work_hi": 10.51, "eff_work": 0.686, "binding": "span_dedup",
         "binding_leg_s": 13.02, "note": "pre"},
        {"label": "s2", "lo": 8, "hi": 32, "work_lo": 40.0,
         "work_hi": 12.0, "eff_work": 0.833, "binding": "funnel",
         "binding_leg_s": 9.0},          # no note, different shape
        {"label": "s3", "lo": 4, "hi": 16, "work_lo": 25.45,
         "work_hi": 11.0, "eff_work": 0.578, "binding": "span_dedup",
         "binding_leg_s": 11.85, "note": "post"},
    ]
    sec = bench._render_curate_samples(samples, 4, 16)
    assert "| s1 | 4→16 | 28.86 | 10.51 | 0.686 | span_dedup 13.0s | pre |" in sec
    # rows render under their OWN shape; a missing note stays empty
    assert "| s2 | 8→32 | 40.00 | 12.00 | 0.833 | funnel 9.0s |  |" in sec
    # spread derives from all samples
    assert "0.58-0.83" in sec
    # min-wall floor uses only CURRENT-shape samples (s1, s3):
    # (min(28.86, 25.45) / min(10.51, 11.0)) / 4
    assert f"**{(25.45 / 10.51) / 4:.3f}**" in sec
    assert "over the 2" in sec


def test_update_doc_text_ledger_writes_readme(tmp_path, monkeypatch):
    # the ledger must be writable end-to-end (r8 shipped with an
    # undefined-name crash here that killed the whole default bench)
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda _p: str(tmp_path / "bench.py"))
    import json as _json
    with open(tmp_path / "BENCH_r07.json", "w") as f:
        _json.dump({"queries": {"doc_text": 14.1}, "n_pages": 2539,
                    "pages_per_sec": 180.0}, f)
    (tmp_path / "BENCH").mkdir()
    bench._update_doc_text_ledger(12.5, 2539, 203.1, bench._CALIB_REF_S)
    text = open(tmp_path / "BENCH" / "README.md").read()
    assert "## doc_text throughput ledger" in text
    assert "| r7 | 14.10 | 2539 | 180.0 | — | — |" in text
    # current run calibrates at exactly the reference box -> raw == calib
    assert "| r8 | 12.50 | 2539 | 203.1 | " in text and "| 203.1 |" in text


def test_render_curate_samples_survives_zero_work_wall():
    # a clamped-to-zero work_hi (overhead >= wall) must not crash the
    # render — once persisted it would crash every future run too
    samples = [
        {"label": "s1", "lo": 4, "hi": 16, "work_lo": 1.0,
         "work_hi": 0.0, "eff_work": float("nan"),
         "binding": "funnel", "binding_leg_s": 0.5},
    ]
    sec = bench._render_curate_samples(samples, 4, 16)
    assert "not computable" in sec


def test_append_ledger_preserves_corrupt_file(tmp_path):
    # a truncated/corrupt ledger must be preserved aside, never silently
    # reset — the recorded history IS the artifact the ledger protects
    path = str(tmp_path / "ledger.json")
    with open(path, "w") as f:
        f.write('[{"label": "s1", "truncat')
    out = bench._append_ledger(path, {"x": 1})
    assert [s["label"] for s in out] == ["s1"]
    corrupt = open(path + ".corrupt").read()
    assert corrupt.startswith('[{"label": "s1", "truncat')
    import json as _json
    assert _json.load(open(path)) == [{"label": "s1", "x": 1}]


def test_append_ledger_appends_labels_and_nulls_non_finite(tmp_path):
    path = str(tmp_path / "ledger.json")
    bench._append_ledger(path, {"eff": 0.7})
    out = bench._append_ledger(path, {"eff": float("nan")})
    import json as _json
    rows = _json.load(open(path))          # strict-JSON parseable
    assert [s["label"] for s in rows] == ["s1", "s2"]
    assert rows[1]["eff"] is None          # NaN nulled, not emitted
    assert out == rows
    assert not os.path.exists(path + ".tmp")


def test_render_curate_samples_null_eff_row_is_na():
    # a persisted null-eff row renders n/a and stays out of the spread
    samples = [
        {"label": "s1", "lo": 4, "hi": 16, "work_lo": 28.0,
         "work_hi": 10.0, "eff_work": 0.7, "binding": "funnel",
         "binding_leg_s": 9.0},
        {"label": "s2", "lo": 4, "hi": 16, "work_lo": 1.0,
         "work_hi": 0.5, "eff_work": None, "binding": "funnel",
         "binding_leg_s": 0.5},
    ]
    sec = bench._render_curate_samples(samples, 4, 16)
    assert "| n/a | funnel 0.5s |" in sec
    assert "0.70-0.70" in sec


def test_append_ledger_preserves_binary_and_non_list_corruption(tmp_path):
    # UnicodeDecodeError (binary corruption) and valid-JSON-non-list
    # content are corruption too — preserved aside, never a crash, and
    # a SECOND incident must not clobber the first .corrupt file
    path = str(tmp_path / "ledger.json")
    with open(path, "wb") as f:
        f.write(b"\xff\xfe garbage")
    out = bench._append_ledger(path, {"x": 1})
    assert [s["label"] for s in out] == ["s1"]
    assert os.path.exists(path + ".corrupt")
    with open(path, "w") as f:
        f.write('{"not": "a list"}')
    out = bench._append_ledger(path, {"x": 2})
    assert [s["label"] for s in out] == ["s1"]
    assert open(path + ".corrupt", "rb").read().startswith(b"\xff\xfe")
    assert open(path + ".corrupt.2").read() == '{"not": "a list"}'


def test_render_curate_samples_all_rows_degenerate():
    # every recorded row null-eff -> the spread renders n/a, not nan-nan
    samples = [
        {"label": "s1", "lo": 4, "hi": 16, "work_lo": 1.0,
         "work_hi": 0.0, "eff_work": None, "binding": "funnel",
         "binding_leg_s": 0.5},
    ]
    sec = bench._render_curate_samples(samples, 4, 16)
    assert "n/a (no sample with a finite work efficiency)" in sec
    assert "nan" not in sec

"""Evaluator micro-cases: every verdict class from evaluator.py:218-333,
including the wrong-match FP+FN double count and the per-type TP condition."""

from paper_layout_parser_spark.operators.evaluate import (
    compare_matches,
    evaluation_summary,
    per_type_metrics,
)

GT_SCHEMA = (
    "url string, figure_id string, figure_type string, page_number int, "
    "gt_x1 double, gt_y1 double, gt_x2 double, gt_y2 double, "
    "gcap_x1 double, gcap_y1 double, gcap_x2 double, gcap_y2 double, "
    "cap_id string, confidence double"
)
PRED_SCHEMA = (
    "url string, item_type string, item_id string, page_number int, "
    "item_x1 double, item_y1 double, item_x2 double, item_y2 double, "
    "cap_x1 double, cap_y1 double, cap_x2 double, cap_y2 double"
)

FIG = (100.0, 200.0, 300.0, 400.0)
CAP = (100.0, 420.0, 300.0, 460.0)
FAR = (600.0, 420.0, 800.0, 460.0)


def gt_row(fid, gt=FIG, cap=None, conf=0.75, ftype="figure", page=1):
    c = cap or (None, None, None, None)
    return ("u", fid, ftype, page, *gt, *c, ("cap_" + fid) if cap else None, conf)


def pred_row(iid, item=FIG, cap=None, itype="figure", page=1):
    c = cap or (None, None, None, None)
    return ("u", itype, iid, page, *item, *c)


def run(spark, gt_rows, pred_rows, **kw):
    gt = spark.createDataFrame(gt_rows, schema=GT_SCHEMA)
    pred = spark.createDataFrame(pred_rows, schema=PRED_SCHEMA)
    cmp = compare_matches(gt, pred, **kw)
    return {r["figure_id"]: r for r in cmp.collect()}, cmp


def test_true_positive(spark):
    got, _ = run(spark, [gt_row("g1", cap=CAP)], [pred_row("p1", cap=CAP)])
    r = got["g1"]
    assert r["is_correct"] and r["error_type"] is None
    assert r["figure_iou"] == 1.0 and r["caption_iou"] == 1.0


def test_correct_no_caption(spark):
    got, cmp = run(spark, [gt_row("g1")], [pred_row("p1")])
    assert got["g1"]["is_correct"]
    s = evaluation_summary(cmp).collect()[0]
    assert (s["tp"], s["correct_no_caption"]) == (0, 1)


def test_false_positive(spark):
    got, cmp = run(spark, [gt_row("g1")], [pred_row("p1", cap=CAP)])
    assert got["g1"]["error_type"] == "false_positive"
    s = evaluation_summary(cmp).collect()[0]
    assert (s["fp"], s["fn"]) == (1, 0)


def test_false_negative(spark):
    got, _ = run(spark, [gt_row("g1", cap=CAP)], [pred_row("p1")])
    assert got["g1"]["error_type"] == "false_negative"


def test_wrong_match_double_counts(spark):
    got, cmp = run(spark, [gt_row("g1", cap=FAR)], [pred_row("p1", cap=CAP)])
    assert got["g1"]["error_type"] == "wrong_match"
    s = evaluation_summary(cmp).collect()[0]
    assert (s["fp"], s["fn"]) == (1, 1)  # evaluator.py:315-317
    # per-type FP/FN exclude wrong_match (evaluator.py:344-345)
    pt = per_type_metrics(cmp).collect()[0]
    assert (pt["fp"], pt["fn"]) == (0, 0)
    assert pt["correct"] == 0


def test_unmatched_gt_bbox_is_false_negative_when_caption_expected(spark):
    shifted = (400.0, 600.0, 600.0, 800.0)  # IoU ~0 vs pred
    got, _ = run(spark, [gt_row("g1", gt=shifted, cap=CAP)], [pred_row("p1", cap=CAP)])
    r = got["g1"]
    assert r["figure_iou"] < 0.5 and r["error_type"] == "false_negative"


def test_confidence_filter(spark):
    got, cmp = run(
        spark,
        [gt_row("g1", cap=CAP, conf=0.5), gt_row("g2", cap=CAP)],
        [pred_row("p1", cap=CAP)],
    )
    assert set(got) == {"g2"}


def test_argmax_picks_best_iou_across_types(spark):
    # GT figure overlaps a table pred slightly and the figure pred fully
    got, _ = run(
        spark,
        [gt_row("g1", cap=CAP)],
        [
            pred_row("pt", item=(90.0, 190.0, 310.0, 410.0), itype="table"),
            pred_row("pf", item=FIG, cap=CAP),
        ],
    )
    assert got["g1"]["is_correct"]  # matched the exact figure pred


def test_gt_on_page_without_predictions(spark):
    got, _ = run(
        spark,
        [gt_row("g1", cap=CAP, page=2)],
        [pred_row("p1", cap=CAP, page=1)],
    )
    r = got["g1"]
    assert r["figure_iou"] == 0.0 and r["error_type"] == "false_negative"


def test_per_type_tp_keys_off_caption_id(spark):
    # correct match with GT caption present -> per-type tp counts it
    _, cmp = run(spark, [gt_row("g1", cap=CAP)], [pred_row("p1", cap=CAP)])
    pt = per_type_metrics(cmp).collect()[0]
    assert (pt["tp"], pt["accuracy"]) == (1, 1.0)


def test_reproduces_published_reference_metrics(spark):
    """The reference's published benchmark (docs/caption-matching-benchmark-
    generation.md:100-117): TP=132, FP=24, FN=53 -> P=84.62%, R=71.35%,
    F1=77.42%. Our metrics math must reproduce those exact rounded values."""
    from paper_layout_parser_spark.operators.evaluate import _with_metrics

    counts = spark.createDataFrame([(132, 24, 53)], "tp long, fp long, fn long")
    got = _with_metrics(counts).collect()[0]
    assert got["precision"] == 0.8462
    assert got["recall"] == 0.7135
    assert got["f1"] == 0.7742


def test_iou_tie_breaks_on_numeric_counter_not_id_string(spark):
    """Reference semantics: on exact IoU ties the EARLIEST prediction in
    insertion order wins. Past 99 items the %02d-formatted id widens, so
    lexicographic order diverges ("fig_01_100" < "fig_01_20"); the
    tie-break must use the integer counter. Only the seq-20 prediction
    carries the caption the GT expects, so picking the wrong one flips the
    verdict."""
    gt_rows = [gt_row("g1", cap=CAP)]
    pred_rows = [
        pred_row("fig_01_100", cap=None),   # later insertion, no caption
        pred_row("fig_01_20", cap=CAP),     # earlier insertion, right caption
    ]
    got, _ = run(spark, gt_rows, pred_rows)
    r = got["g1"]
    # numeric order picks seq 20 (earlier) -> caption matches -> correct;
    # string order would pick "fig_01_100" -> false_negative
    assert r["pred_has_caption"] and r["is_correct"], r

    # same outcome when the caller provides the item_seq column directly
    # (the pipeline path)
    gt = spark.createDataFrame(gt_rows, schema=GT_SCHEMA)
    pred = spark.createDataFrame(
        [(*pred_rows[0], 100), (*pred_rows[1], 20)],
        schema=PRED_SCHEMA + ", item_seq int",
    )
    r2 = {x["figure_id"]: x for x in compare_matches(gt, pred).collect()}["g1"]
    assert r2["pred_has_caption"] and r2["is_correct"], r2

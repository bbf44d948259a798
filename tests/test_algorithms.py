"""Pure-Python algorithm tests (no Spark) — fast checks of the shared
XY-cut / clip-text / greedy code plus the ported reference fixtures."""

from paper_layout_parser_spark.algorithms import clip_text, greedy_assign, xy_cut_order
from paper_layout_parser_spark.synthdata import (
    doc_text,
    normalize_class_name,
    page_blocks,
)

from . import oracle


class TestXYCut:
    def test_single_column_is_y_order(self):
        boxes = [(100, 200, 300, 400), (100, 40, 1100, 90), (100, 100, 1100, 140)]
        assert xy_cut_order(boxes) == [1, 2, 0]

    def test_two_columns_left_first(self):
        # title spanning the top, then two columns
        boxes = [
            (100, 40, 1100, 90),     # title
            (634, 150, 1100, 700),   # right column
            (100, 150, 590, 700),    # left column
        ]
        assert xy_cut_order(boxes) == [0, 2, 1]

    def test_columns_with_rows_inside(self):
        # left column has two stacked blocks; right column one tall block
        boxes = [
            (600, 100, 900, 500),  # right
            (100, 300, 500, 500),  # left lower
            (100, 100, 500, 200),  # left upper
        ]
        assert xy_cut_order(boxes) == [2, 1, 0]

    def test_touching_blocks_fall_back_to_y_order(self):
        # zero gap -> no cut -> (y1, x1) fallback
        boxes = [(100, 460, 300, 490), (100, 420, 300, 460)]
        assert xy_cut_order(boxes) == [1, 0]

    def test_deterministic_on_identical_boxes(self):
        boxes = [(0, 0, 10, 10)] * 3
        assert xy_cut_order(boxes) == [0, 1, 2]


class TestClipText:
    BLOCKS = [
        {"bbox": [100, 420, 300, 460], "text": "caption one"},
        {"bbox": [50, 500, 400, 700], "text": "table body"},
    ]

    def test_exact_clip(self):
        assert clip_text(self.BLOCKS, 100, 420, 300, 460) == "caption one"

    def test_touching_edge_excluded(self):
        # clip rect touching at y=500 has zero intersection area
        assert clip_text(self.BLOCKS, 100, 420, 300, 500) == "caption one"

    def test_covering_clip_joins_in_block_order(self):
        assert clip_text(self.BLOCKS, 0, 0, 2000, 2000) == "caption one\ntable body"

    def test_empty(self):
        assert clip_text(self.BLOCKS, 0, 0, 10, 10) == ""


class TestGreedy:
    def test_chain_prefers_global_closest(self):
        # item0-cap0 dist 5, item0-cap1 dist 10, item1-cap0 dist 7:
        # greedy takes (0,0), item1 left with nothing (cap1 invalid for it)
        pairs = [(0, 0, 5.0), (0, 1, 10.0), (1, 0, 7.0)]
        assert greedy_assign(pairs) == {0: 0}

    def test_ties_item_major(self):
        pairs = [(0, 0, 5.0), (0, 1, 5.0), (1, 0, 5.0), (1, 1, 5.0)]
        assert greedy_assign(pairs) == {0: 0, 1: 1}

    def test_matches_reference_oracle_on_random_pages(self):
        import random

        rng = random.Random(42)
        for _ in range(300):
            items = [
                {"x1": (x := rng.uniform(0, 800)), "y1": (y := rng.uniform(0, 1200)),
                 "x2": x + rng.uniform(20, 300), "y2": y + rng.uniform(20, 300)}
                for _ in range(rng.randint(0, 4))
            ]
            caps = [
                {"x1": (x := rng.uniform(0, 800)), "y1": (y := rng.uniform(0, 1200)),
                 "x2": x + rng.uniform(20, 300), "y2": y + rng.uniform(10, 60)}
                for _ in range(rng.randint(0, 4))
            ]
            direction = rng.choice(["below", "above", "both"])
            expected = oracle.match_items_to_captions(items, caps, direction)
            # drive greedy_assign the way the Spark operator does
            pairs = []
            for i, item in enumerate(items):
                for j, cap in enumerate(caps):
                    ok, dist = oracle.is_valid_match(item, cap, direction)
                    if ok:
                        pairs.append((i, j, dist))
            got = greedy_assign(pairs)
            for i, (item, cap) in enumerate(expected):
                if cap is None:
                    assert i not in got
                else:
                    assert caps[got[i]] is cap


class TestSynthSpec:
    def test_normalize_class_name(self):
        assert normalize_class_name("Figure-caption") == "Figure-Caption"
        assert normalize_class_name("plain text") == "Plain-Text"
        assert normalize_class_name("Title") == "Title"

    def test_blocks_disjoint_within_page(self):
        # XY-cut order == (y1, x1) order requires non-overlapping blocks
        for doc_id in range(0, 60):
            for p in range(1, 9):
                blocks = page_blocks(doc_id, p)
                for i, a in enumerate(blocks):
                    for b in blocks[i + 1:]:
                        x_overlap = min(a["x2"], b["x2"]) - max(a["x1"], b["x1"])
                        y_overlap = min(a["y2"], b["y2"]) - max(a["y1"], b["y1"])
                        assert x_overlap <= 0 or y_overlap <= 0, (doc_id, p, a, b)

    def test_doc_text_matches_xy_cut(self):
        # the documented invariant: XY-cut order == (y1, x1) on this corpus
        for doc_id in (0, 7, 13, 101, 258):
            texts = []
            from paper_layout_parser_spark.synthdata import doc_pages
            for pg in doc_pages(doc_id):
                blocks = [b for b in pg["blocks"] if b["class_name"] != "Abandon"]
                order = xy_cut_order([(b["x1"], b["y1"], b["x2"], b["y2"]) for b in blocks])
                texts.extend(blocks[i]["text"] for i in order)
            assert "\n".join(texts) == doc_text(doc_id)

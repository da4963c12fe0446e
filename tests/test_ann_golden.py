"""Golden pin for `ann_ivf_topk` — the one registry query with no DuckDB
oracle (k-means float matmul isn't SQL-mirrorable bit-exactly).  The output
IS deterministic (md5-seeded centroids, fixed Lloyd rounds, round4 scores),
so an exact checked-in snapshot catches regressions the recall floor can't:
probe-order bugs, rank reshuffles, score drift (VERDICT r2 item 3)."""

from __future__ import annotations

import json
from pathlib import Path

from conftest import SF_TEST
from vector_search_spark import registry

FIXTURE = Path(__file__).parent / "fixtures" / "ann_ivf_topk_sf001.json"


def test_ann_ivf_topk_matches_golden(spark):
    golden = json.loads(FIXTURE.read_text())
    df = registry.QUERIES["ann_ivf_topk"](spark, SF_TEST)
    assert df.columns == golden["columns"]
    rows = sorted([list(r) for r in df.collect()])
    assert len(rows) == len(golden["rows"])
    mismatches = [
        (a, b) for a, b in zip(rows, golden["rows"]) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} rows drifted, first: {mismatches[:5]}"

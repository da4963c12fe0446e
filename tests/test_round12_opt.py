"""Round-12 optimization gates.

- `ivf_probe_sweep_topk` (the shared sweep/ivf_query probe model,
  ADVICE r11): every sweep leg must equal `ivf_query(k, nprobe=n)`
  row-for-row — candidate set, scores AND ranks.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from conftest import SF_SMOKE  # noqa: E402


def test_probe_sweep_legs_equal_single_leg_ivf_query(spark):
    from vector_search_spark.operators.ann import ivf_probe_sweep_topk, ivf_query
    from vector_search_spark.registry_extensions import _shared_ivf_index

    cent_mat, indexed = _shared_ivf_index(spark, SF_SMOKE)
    queries = (
        indexed.filter(F.col("vec_id") < 20)
        .dropDuplicates(["vec_id"])
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )
    sweep = (1, 2, 4, 8, 16)
    legs = ivf_probe_sweep_topk(indexed, cent_mat, queries, sweep=sweep, k=10)
    got = {n: [] for n in sweep}
    for r in legs.collect():
        got[r["nprobe"]].append(
            (r["query_id"], r["vec_id"], round(r["score"], 12), r["rank"])
        )
    for n in sweep:
        single = [
            (r["query_id"], r["vec_id"], round(r["score"], 12), r["rank"])
            for r in ivf_query(indexed, cent_mat, queries, k=10, nprobe=n).collect()
        ]
        assert sorted(got[n]) == sorted(single), f"leg nprobe={n} diverged"

"""Round-7 additions.

Adaptive SRP band width (VERDICT-r6 item #1): the band-bits ∝ log₂(n)
rule is now code on both engines — Python ``n.bit_length()`` on the
Spark side, ``length(bin(n))`` in the DuckDB oracle.  These tests pin
(a) the two formulas agree on an n sweep spanning every clamp edge and
bit boundary, and (b) full oracle parity at a SECOND corpus size
(sf0.1 → 2,000 vectors → 7-bit bands), so the data-dependent width is
exercised at a scale the driver's sf0.01 gate (500 vectors → 5 bits)
doesn't reach.
"""

import pytest
from conftest import SF_SMOKE, compare_with_oracle, duck_con

from vector_search_spark import registry
from vector_search_spark.registry_extensions import (
    _SRPW_MAX_BB,
    _SRPW_MIN_BB,
    _srpw_band_bits,
)

SF_01 = "/root/testdata/sf0.1"


def test_band_bits_rule_matches_sql_formula():
    con = duck_con(SF_SMOKE)
    sweep = [1, 2, 3, 4, 15, 16, 17, 255, 256, 499, 500, 2000, 20000,
             65535, 65536, 200000, 10**6, 10**7, 2**30, 2**40]
    for n in sweep:
        sql_bits = con.execute(
            f"SELECT LEAST({_SRPW_MAX_BB}, GREATEST({_SRPW_MIN_BB}, "
            f"length(bin({n}::BIGINT)) - 4))"
        ).fetchone()[0]
        assert sql_bits == _srpw_band_bits(n), f"n={n}: {sql_bits} != py"


def test_band_bits_rule_pins_expected_decades():
    # The measured fixture ladder: each decade must land where the
    # scale analysis says (per-row random collisions/band ≈ 8).
    assert _srpw_band_bits(500) == 5      # sf0.001 / sf0.01
    assert _srpw_band_bits(2000) == 7     # sf0.1
    assert _srpw_band_bits(20000) == 11   # 10x fixture
    assert _srpw_band_bits(200000) == 14  # 100x fixture
    assert _srpw_band_bits(1) == _SRPW_MIN_BB
    assert _srpw_band_bits(2**62) == _SRPW_MAX_BB


@pytest.mark.parametrize("name", ["dedup_embedding_srp", "mutual_knn_pairs"])
def test_adaptive_srp_oracle_parity_at_sf01(spark, name):
    df = registry.QUERIES[name](spark, SF_01)
    compare_with_oracle(df, registry.ORACLES[name], SF_01)

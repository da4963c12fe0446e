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
    # r10: the 1000x fixture must NOT hit the cap (the r9 cliff: the old
    # cap of 15 froze the width at n ~ 524k, candidate mass went n^2*2^-15)
    assert _srpw_band_bits(2_000_000) == 17
    assert _srpw_band_bits(2_000_000) < _SRPW_MAX_BB
    # the cap binds only from n >= 2^43 ~ 8.8T vectors (~2.25 PB fp32 @
    # dim 64) — far outside the 100 TB design envelope; band-sliced
    # packing would allow up to 63
    assert _srpw_band_bits(2**43 - 1) < _SRPW_MAX_BB <= 63
    assert _srpw_band_bits(1) == _SRPW_MIN_BB
    assert _srpw_band_bits(2**62) == _SRPW_MAX_BB


@pytest.mark.parametrize("name", ["dedup_embedding_srp", "mutual_knn_pairs"])
def test_adaptive_srp_oracle_parity_at_sf01(spark, name):
    df = registry.QUERIES[name](spark, SF_01)
    compare_with_oracle(df, registry.ORACLES[name], SF_01)


# ---------------------------------------------------------------------------
# 1000x-proofing (VERDICT-r6 item #4): the fixture builder's predicted
# binding constants — int-width of offset keys, cipher/rotation periods —
# and the input-sized shuffle width.
# ---------------------------------------------------------------------------
import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    "make_scaled_fixture",
    _os.path.join(_os.path.dirname(__file__), "..", "tools", "make_scaled_fixture.py"),
)
_msf = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_msf)


def test_caesar_cipher_distinct_past_letter_period():
    # 312 is the letter-affine period; past it the md5-seeded letter
    # permutation must keep replicas distinct (ADVICE r7: the corpus is
    # digit-free, so the digit layer alone proved NOTHING — the old test
    # compared full (src, dst) tuples and passed while replica pairs 312
    # apart carried byte-identical TEXT).  Assert on what the corpus
    # actually exercises: the letter mapping, hence transformed text.
    letter_maps = [_msf._caesar_cols(r)[1][:52] for r in range(1000)]
    assert len(set(letter_maps)) == 1000
    # every map is a bijection on each case class
    import string as _string

    for dst in (letter_maps[0], letter_maps[312], letter_maps[999]):
        assert sorted(dst[:26]) == list(_string.ascii_lowercase)
        assert sorted(dst[26:]) == list(_string.ascii_uppercase)
    # a digit-free text (like every real document) transforms DIFFERENTLY
    # under replicas exactly one letter-affine period apart
    text = "The quick brown fox jumps over the lazy dog"
    out = set()
    for r in (0, 312, 624, 936):
        src, dst = _msf._caesar_cols(r)
        out.add(text.translate(str.maketrans(src, dst)))
    assert len(out) == 4
    # r=0 is the identity
    src0, dst0 = _msf._caesar_cols(0)
    assert src0 == dst0
    # r < 312 keeps the pre-r8 mapping bit-identical (existing 10x/100x
    # fixtures reproduce): d=0 -> identity md5 perm -> pure affine
    src100, dst100 = _msf._caesar_cols(100)
    a, b = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25][(100 // 26) % 12], 100 % 26
    expect = "".join(_string.ascii_lowercase[(a * i + b) % 26] for i in range(26))
    assert dst100[:26] == expect


def test_replicate_widens_int32_keys_instead_of_wrapping(spark):
    df = spark.createDataFrame([(1, "a"), (99, "b")], "doc_id int, text string")
    # 300 copies x 10M offset = 3e9 > int32 max: column must widen to long
    out = _msf.replicate(df, "documents", 299, copies=300)
    assert dict(out.dtypes)["doc_id"] == "bigint"
    vals = sorted(r["doc_id"] for r in out.collect())
    assert vals == [299 * _msf.OFFSET + 1, 299 * _msf.OFFSET + 99]
    # an int32 column that FITS stays int32 (10 copies, max ~1e8)
    out_small = _msf.replicate(df, "documents", 9, copies=10)
    assert dict(out_small.dtypes)["doc_id"] == "int"
    # and an int64 column stays int64 at any copy count
    df2 = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    out2 = _msf.replicate(df2, "documents", 299, copies=300)
    assert dict(out2.dtypes)["doc_id"] == "bigint"


def test_replicate_embedding_transform_unique_and_orthogonal(spark):
    import math

    base = [float(i + 1) for i in range(64)]
    df = spark.createDataFrame([(1, base)], "vec_id long, embedding array<double>")
    seen = {}
    norm0 = math.fsum(x * x for x in base)
    # sweep replicas across all three sign regimes incl. r >= 128 (q >= 2,
    # beyond the legacy period where the old code emitted twins)
    for r in [1, 63, 64, 127, 128, 129, 192, 250, 999]:
        emb = _msf.replicate(df, "embeddings", r, copies=1000).collect()[0][1]
        key = tuple(round(x, 9) for x in emb)
        assert key not in seen.values(), f"replica {r} duplicates another"
        seen[r] = key
        assert abs(math.fsum(x * x for x in emb) - norm0) < 1e-6  # orthogonal


def test_shuffle_partitions_for_scales_with_input(tmp_path):
    from vector_search_spark.session import shuffle_partitions_for

    small = tmp_path / "small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    assert shuffle_partitions_for(str(small), cpus=32) == 32  # floor = cores
    big = tmp_path / "big"
    big.mkdir()
    # 1 GiB sparse-ish file: 8 x 128MB targets, still under the 32 floor
    with open(big / "t.parquet", "wb") as f:
        f.truncate(100 * (128 << 20))
    assert shuffle_partitions_for(str(big), cpus=32) == 100
    assert shuffle_partitions_for(str(big), cpus=128) == 128


# ---------------------------------------------------------------------------
# New round-7 surface (VERDICT-r6 #5)
# ---------------------------------------------------------------------------
def test_ivf_probe_sweep_monotone_and_exact_at_full_probe(spark):
    from conftest import SF_TEST

    rows = registry.QUERIES["ann_ivf_probe_sweep"](spark, SF_TEST).collect()
    by_probe = {r["nprobe"]: r for r in rows}
    assert sorted(by_probe) == [1, 2, 4, 8, 16]
    recalls = [by_probe[p]["recall_at_10"] for p in (1, 2, 4, 8, 16)]
    assert recalls == sorted(recalls), f"recall not monotone in nprobe: {recalls}"
    # probing all 16 cells IS the exact scan: recall must be exactly 1.0
    assert by_probe[16]["recall_at_10"] == 1.0
    assert by_probe[16]["matched"] == 200


def test_hll_cube_levels_consistent(spark):
    from conftest import SF_TEST

    rows = registry.QUERIES["hll_cube_users"](spark, SF_TEST).collect()
    cells = [r for r in rows if r["day"] != "ALL" and r["event_type"] != "ALL"]
    days = [r for r in rows if r["day"] != "ALL" and r["event_type"] == "ALL"]
    grand = [r for r in rows if r["day"] == "ALL"]
    assert len(grand) == 1 and grand[0]["event_type"] == "ALL"
    assert len(days) > 0 and len(cells) > len(days)
    # merged-register estimate of a coarser level must dominate (>=) each
    # of its children (union cardinality >= max child, and HLL register
    # max-merge preserves that ordering)
    import collections

    max_cell_by_day = collections.defaultdict(float)
    for r in cells:
        max_cell_by_day[r["day"]] = max(max_cell_by_day[r["day"]], r["hll_est"])
    for r in days:
        assert r["hll_est"] >= max_cell_by_day[r["day"]] - 1e-9
    # sketch accuracy sanity at every level: within 15% of exact
    for r in rows:
        assert abs(r["hll_est"] - r["exact_distinct"]) <= max(
            3.0, 0.15 * r["exact_distinct"]
        ), r


def test_band_sliced_packing_past_old_cap(spark):
    """r10: srp_band_table packs each band from its own plane block with
    local 2^k weights — no global-BIGINT cap.  Pin bits-per-band = 20
    (impossible under the old 4x15-in-one-BIGINT packing) against a
    Python recomputation of the same md5-derived planes."""
    import hashlib

    from vector_search_spark.operators.ann import srp_band_table, srp_planes

    dim, bands, bpb = 8, 4, 20
    planes = srp_planes(dim, bands * bpb, seed="srpw")
    vecs = [
        (0, [0.3, -1.2, 0.5, 2.0, -0.1, 0.7, -0.9, 1.1]),
        (1, [-0.4, 0.2, -2.2, 0.9, 1.4, -0.6, 0.05, -1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id"], r["band"]): r["val"]
        for r in srp_band_table(
            df, n_bits=bands * bpb, bands=bands, seed="srpw", dim=dim
        ).collect()
    }
    assert len(got) == len(vecs) * bands
    for vid, vec in vecs:
        # reproduce Spark's float32 storage then float64 dot fold
        import struct as _s

        v32 = [_s.unpack("f", _s.pack("f", x))[0] for x in vec]
        for band in range(bands):
            want = 0
            for k in range(bpb):
                plane = planes[band * bpb + k]
                dot = 0.0
                for a, p in zip(v32, plane):
                    dot += a * p
                if dot >= 0:
                    want |= 1 << k
            assert got[(vid, band)] == want, (vid, band)
            assert got[(vid, band)] < (1 << bpb)

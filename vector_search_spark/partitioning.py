"""Partitioning helpers.

``fan_out`` fixes the "coarse scan starves a narrow stage" problem: a small
parquet file (or a single huge row group) arrives as 1-2 input partitions,
so an expensive narrow transform downstream — interpreted higher-order
functions, Arrow-batched ``mapInPandas`` — runs on one core no matter how
many the cluster has.  One cheap hash exchange before the expensive stage
buys full parallelism.

At 100 TB the scan already yields thousands of splits and this is a no-op;
the guard keeps the exchange out of plans that don't need it (AQE cannot
help here — it only re-plans *shuffle* boundaries, not narrow stages over
coarse scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, *cols: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: cluster parallelism)
    partitions iff its input looks narrower than that — hash-partitioned by
    ``cols`` when given (deterministic placement), round-robin otherwise.

    The guard reads ``inputFiles()`` (analyzed-plan file metadata — does NOT
    force physical planning or RDD DAG construction the way
    ``rdd.getNumPartitions()`` does) and only falls back to the RDD count
    for non-file inputs.  At scale (files ≥ parallelism) this is a pure
    no-op; when it fires on a small input it does shuffle every selected
    column (including wide text/vector columns) — acceptable exactly
    because it fires only when the input is tiny.  Mid-scale inputs with
    few-but-splittable files may repartition unnecessarily; that one extra
    exchange is the documented cost of keeping plan construction cheap.
    """
    n = target or df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        if len(files) >= n:
            return df
    elif df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)


def maybe_broadcast(
    df: DataFrame,
    max_rows: int,
    n_rows: int | None = None,
    row_bytes: int | None = None,
    max_bytes: int = 6 << 30,
) -> DataFrame:
    """Physical-only broadcast hint, gated on a cheap row count.

    The wide-payload join problem (round 10, `containment_bottomk` at the
    1000× fixture): joining an N-row pair table against a per-entity
    ARRAY table twice makes the SECOND join reshuffle N fat rows — pairs
    × array bytes, hundreds of GB of spill where the entity table itself
    is single-digit GB.  When the entity side fits the broadcast budget,
    hinting it turns the second join map-side and the fat intermediate
    never touches an exchange.  Data-adaptive: past the gate the plain
    shuffle join runs — the correct shape on a real cluster, where
    aggregate spill disk scales with executors.  Results are identical
    either way; only the physical join strategy changes.

    Gate contract (round 11, ADVICE r10):

    - ``max_rows`` encodes each call site's row budget; its implicit
      byte assumption is made explicit by ``row_bytes``, which tightens
      the gate to ``min(max_rows, max_bytes // row_bytes)`` so a wider
      payload at another dimensionality cannot pass the row gate yet
      blow Spark's 8 GiB broadcast-table cap — ``max_bytes`` defaults to
      6 GiB, headroom under that hard cap.  ``row_bytes`` must estimate
      the IN-MEMORY HashedRelation cost per row (data bytes × ~3-4 for
      UnsafeRow/array-header/hash-page overhead on array payloads), NOT
      the serialized size: the r11 decade-4 probe measured an 8M-row
      64-float table passing a 320 B/row serialized gate and then dying
      on the 8 GiB relation cap — and in local mode the failed broadcast
      build stopped the whole SparkContext, not just the query.
    - EAGER-ACTION contract: unless ``n_rows`` is supplied this runs
      ``df.count()`` AT PLAN-BUILD TIME — a Spark job fires even if the
      returned plan is never collected, and on a non-checkpointed /
      non-metadata-countable input that job is a full scan.  Callers
      should pass ``n_rows`` when the count is already known (corpus
      configs that priced the table for other reasons) or hand in an
      eagerly-checkpointed frame, whose count is metadata-cheap."""
    cap = max_rows if row_bytes is None else min(max_rows, max_bytes // row_bytes)
    n = df.count() if n_rows is None else n_rows
    return F.broadcast(df) if n <= cap else df


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the other.

    A hash join on a hot key puts every row of that key in ONE task; AQE's
    skew-join split handles sort-merge joins, but replicated-salting is the
    general fix (and the only one for aggregation-feeding joins where a
    single key exceeds one executor).  Here:

    - the skewed side gets a deterministic per-row salt in [0, buckets)
      (md5 of the whole row's key + a row discriminator is unnecessary —
      any distribution works for correctness; we hash the key with
      ``spark_partition_id`` mixed in so rows of one hot key spread),
    - the other side is exploded ``buckets``× (its rows are assumed
      moderate; for two huge skewed sides, salt a bucketed range join),
    - the join key becomes (key, salt), so the hot key's rows land in
      ``buckets`` independent tasks.

    Result is row-identical to ``skewed.join(other, key, how)``.
    """
    salt = F.pmod(
        F.crc32(F.concat_ws(":", F.col(key).cast("string"), F.spark_partition_id())),
        F.lit(buckets),
    ).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(b) for b in range(buckets)]))
    )
    return left.join(right, [key, "__salt"], how).drop("__salt")


def global_order_stats(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str | list[str] | None = None,
    num_ranges: int = 32,
) -> DataFrame:
    """Global rank (and optional exclusive prefix sum) over a TOTAL order —
    WITHOUT a single-partition window.

    A partition-less ``Window.orderBy(...)`` moves the whole input through
    ONE task (Spark even warns); at 100 TB that's the classic sort
    bottleneck hiding in "ordered cumsum" and "global ntile" queries.
    This is the standard two-phase fix:

    1. ``repartitionByRange(order_cols)`` — contiguous key ranges, one per
       partition (a real range exchange, parallel sampling + shuffle);
    2. per-partition ``row_number``/running sum (each range is one task,
       1/num_ranges of the data);
    3. per-partition totals (num_ranges rows) → exclusive offsets via a
       window over that TINY table, broadcast back.

    ``__rank`` (1-based) and, when ``sum_col`` is given, ``__prior`` (the
    exclusive running sum) depend only on the total order — NOT on the
    sampled range bounds — so results are bit-stable under any
    partitioning regime (covered by the invariance suite through its
    callers).  ``order_cols`` must be a total order (include a tiebreaker).

    The tagged frame is EAGERLY CHECKPOINTED before fan-out: ``totals``
    and the windowed branch are two consumers of the same range exchange,
    and when AQE does not reuse it each consumer re-samples its own range
    boundaries — ``spark_partition_id`` then disagrees between the
    branches and the offsets join against the WRONG partitions (round 8:
    caught by the 1000x replica-slice verification as layout-dependent,
    run-to-run nondeterministic answers in scorer_auc / pr_best_f1 /
    ks_two_sample / customer_rfm_segments; the sf0.01 driver gate had
    passed whenever exchange reuse happened to kick in).  One pinned
    evaluation is the repo's standing multi-consumer rule — at production
    scale this is the written staging table both phases read.

    ``sum_col`` may be a LIST of columns (round 12): callers that need
    several prefix sums over the SAME total order (ks_two_sample's two
    samples, pr_best_f1's cnt+pos sweep) previously chained two full
    passes — two range exchanges, two eager checkpoints, two window
    stages — for what is one pass with two running sums.  A single
    column name keeps the historical ``__prior`` output; a list emits
    ``__prior_<col>`` per column.  Each column's prefix sum depends only
    on the total order, so fused results are identical to chained calls.
    """
    from pyspark.sql import Window

    sum_cols: list[str]
    single = isinstance(sum_col, str)
    if sum_col is None:
        sum_cols = []
    elif single:
        sum_cols = [sum_col]
    else:
        sum_cols = list(sum_col)

    parts = df.repartitionByRange(num_ranges, *[F.col(c) for c in order_cols])
    tagged = parts.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(c).alias(f"__sum_{c}") for c in sum_cols
    ]
    totals = tagged.groupBy("__pid").agg(*aggs)
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = ["__pid", F.coalesce(F.sum("__cnt").over(wo), F.lit(0)).alias("__cnt_off")]
    for c in sum_cols:
        off_cols.append(
            F.coalesce(F.sum(f"__sum_{c}").over(wo), F.lit(0)).alias(f"__sum_off_{c}")
        )
    offsets = totals.select(*off_cols)

    wp = Window.partitionBy("__pid").orderBy(*order_cols)
    out = tagged.withColumn("__rn", F.row_number().over(wp))
    for c in sum_cols:
        out = out.withColumn(
            f"__ps_{c}",
            F.coalesce(
                F.sum(c).over(wp.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
    out = out.join(F.broadcast(offsets), "__pid")
    out = out.withColumn("__rank", (F.col("__rn") + F.col("__cnt_off")).cast("long"))
    drop = ["__pid", "__rn", "__cnt_off"]
    for c in sum_cols:
        name = "__prior" if single else f"__prior_{c}"
        out = out.withColumn(
            name, (F.col(f"__ps_{c}") + F.col(f"__sum_off_{c}")).cast("long")
        )
        drop += [f"__ps_{c}", f"__sum_off_{c}"]
    return out.drop(*drop)


def global_dense_rank(
    df: DataFrame,
    key_cols: list[str],
    tiebreak_cols: list[str],
    num_ranges: int = 32,
) -> DataFrame:
    """Order-preserving, tie-equal group rank (a dense rank) over the
    total order ``(key_cols, tiebreak_cols)`` — one range exchange + ONE
    window pass, with NO per-group hash exchange.

    The round-8..11 suffix-pyramid shape was ``global_order_stats`` (range
    exchange + __pid window) followed by ``min(__rank) over (partition by
    key_cols)`` — a SECOND full-data window exchange per doubling level.
    But under a range partitioning of the total order a group's rows are
    contiguous, so the group id can be computed inside the same pass:
    flag group starts with a lag() comparison, prefix-sum the flags, and
    fix partition boundaries (a group spanning a range boundary must not
    be counted twice) on the tiny per-partition stats table.

    Emits ``__dense``: 1-based, equal iff ``key_cols`` are equal,
    strictly increasing with the total order across groups.  Values are
    the group's 1..G index — NOT the min row number the old shape
    produced — so callers must depend only on the ORDER and TIE structure
    of the output, never on rank values (the suffix pyramid's documented
    contract).

    The windowed frame is eagerly checkpointed BEFORE the stats/output
    fan-out (two consumers of one exchange; the round-8 range-resample
    lesson in ``global_order_stats``); the window itself sits upstream of
    the checkpoint and therefore runs exactly once.
    """
    from pyspark.sql import Window

    order_cols = list(key_cols) + list(tiebreak_cols)
    parts = df.repartitionByRange(num_ranges, *[F.col(c) for c in order_cols])
    tagged = parts.withColumn("__pid", F.spark_partition_id())
    key = F.struct(*[F.col(c) for c in key_cols])
    full = F.struct(*[F.col(c) for c in order_cols])
    wp = Window.partitionBy("__pid").orderBy(*order_cols)
    flagged = (
        tagged.withColumn(
            "__new", F.when(F.lag(key).over(wp).eqNullSafe(key), 0).otherwise(1)
        )
        .withColumn(
            "__ldense",
            F.sum("__new").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .localCheckpoint(eager=True)
    )
    stats = flagged.groupBy("__pid").agg(
        F.max("__ldense").alias("__starts"),
        F.min_by(key, full).alias("__firstk"),
        F.max_by(key, full).alias("__lastk"),
    )
    wo = Window.orderBy("__pid")
    offsets = (
        stats.withColumn(
            "__merge",
            F.when(
                F.lag("__lastk").over(wo).eqNullSafe(F.col("__firstk")), 1
            ).otherwise(0),
        )
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__starts").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            - F.sum("__merge").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("__pid", "__off")
    )
    return (
        flagged.join(F.broadcast(offsets), "__pid")
        .withColumn("__dense", (F.col("__ldense") + F.col("__off")).cast("long"))
        .drop("__pid", "__new", "__ldense", "__off")
    )


def ntile_from_rank(rank, n_total, n_tiles: int):
    """SQL-standard ntile bucket from a 1-based rank and the total count —
    the broadcast-scalar companion to ``global_order_stats``.  Exactly
    ntile()'s contract (both engines): with N rows and n tiles, the first
    ``N mod n`` buckets hold ``N div n + 1`` rows, the rest ``N div n``.
    All integer arithmetic, so the bucket id is partitioning-independent.
    """
    rank = F.col(rank) if isinstance(rank, str) else rank
    n_total = (F.col(n_total) if isinstance(n_total, str) else n_total).cast("long")

    def idiv(a, b):  # exact integer division for non-negative longs
        return ((a - a % b) / b).cast("long")

    small = idiv(n_total, F.lit(n_tiles))
    r = n_total % n_tiles
    big = small + 1
    cutoff = r * big
    return (
        F.when(rank <= cutoff, idiv(rank - 1, big) + 1)
        .otherwise(r + idiv(rank - cutoff - 1, F.greatest(small, F.lit(1))) + 1)
        .cast("int")
    )


def global_prefix_min(
    df: DataFrame,
    order_cols: list,
    min_col: str,
    num_ranges: int = 32,
) -> DataFrame:
    """Exclusive running MIN of ``min_col`` over a TOTAL order — the
    prefix-scan sibling of ``global_order_stats`` (same two-phase shape,
    same reason: a partition-less window is a one-task sort at scale).

    1. ``repartitionByRange(order_cols)`` — contiguous ranges of the order
       (``order_cols`` may contain ``F.col(...).desc()`` expressions);
    2. per-partition exclusive running min (one task per range);
    3. per-partition TOTAL mins (num_ranges rows) → exclusive prefix over
       that tiny table via a window, broadcast back and combined with
       ``least``.

    Adds ``__prior_min`` (null for the global first row).  The result
    depends only on the total order, not the sampled range bounds —
    ``order_cols`` must be a total order (include a tiebreaker).  The
    classic consumer is the 2-D skyline: a point is non-dominated iff the
    running min of dim-2 over all better dim-1 points exceeds its own.

    Eagerly checkpointed before fan-out for the same reason as
    ``global_order_stats``: two consumers of one range exchange can
    re-sample different boundaries, making ``spark_partition_id`` disagree
    between the totals and window branches.
    """
    from pyspark.sql import Window

    parts = df.repartitionByRange(num_ranges, *order_cols)
    tagged = parts.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    totals = tagged.groupBy("__pid").agg(F.min(min_col).alias("__pmin"))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select("__pid", F.min("__pmin").over(wo).alias("__min_off"))
    wp = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        tagged.withColumn("__pm", F.min(min_col).over(wp))
        .join(F.broadcast(offsets), "__pid")
        .withColumn("__prior_min", F.least("__pm", "__min_off"))
    )
    return out.drop("__pid", "__pm", "__min_off")

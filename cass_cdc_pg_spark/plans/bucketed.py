"""Write-side bucketing: pre-shuffle ONCE at write time so every
later join/aggregation on the bucket key runs with ZERO Exchange.

This is the batch-layout twin of ``plans/keyed_table.py``'s manual
hash-bucket directories (same hash-the-key-mod-N idea the reference
gets from Kafka's key-hash partitioning, `kafka-topics.md:42-63`):
KeyedTable buckets so MERGE touches only dirty buckets; this module
buckets through Spark's catalog so the OPTIMIZER knows the layout —
``FileSourceScanExec`` reports ``outputPartitioning =
HashPartitioning(key, N)``, and Catalyst drops the Exchange from any
join or aggregation keyed on the bucket column.

Why this is THE 100 TB lever for repeated joins: a lineitem⋈orders
shuffle at 100 TB moves ~the whole fact table over the network every
run.  Bucketing both sides by orderkey into the same bucket count
moves it once, at write time; every subsequent join is a per-bucket
zipped sort-merge with no network at all.  The trade is write-time
cost (one shuffle) plus a fixed file count (num_buckets files per
write task at worst — size buckets so each is 100-500 MB at target
scale, same sizing rule as ``maxPartitionBytes``).

Catalog note: bucket metadata lives in the session catalog
(in-memory by default here; a Hive metastore or table format with
bucket transforms persists it across sessions).  The data files are
plain parquet either way — an unbucketed reader just sees parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    sorted_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write *df* as a bucketed parquet table: one shuffle now, zero
    shuffles for every later equi-join/groupBy on *bucket_col*.

    ``sorted_by`` (usually the bucket column itself) pre-sorts each
    bucket file — enabling min/max page pruning on that column, and
    Sort-free merge joins where the reader opts into
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` (since 3.0
    Spark re-sorts partition-locally by default — CPU, not network).
    ``path`` makes the table external (data at *path*, metadata in
    the catalog).

    The repartition below is load-bearing twice over: (1) without
    it, EVERY write task emits a file into every bucket it has rows
    for — up to tasks×buckets small files, the classic bucketed-write
    file explosion; (2) the scan only reports the ``sorted_by``
    ordering (letting SMJ drop its Sorts) when each bucket holds AT
    MOST ONE file.  ``repartition(n, col)`` and ``bucketBy`` use the
    same Murmur3-hash-pmod assignment, so each task lands exactly one
    bucket file."""
    w = (
        df.repartition(num_buckets, bucket_col)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, bucket_col)
    )
    if sorted_by is not None:
        w = w.sortBy(sorted_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With both sides bucketed (same column, same count), the physical
    plan is a SortMergeJoin whose children are the bucketed scans
    directly — no Exchange on either side (pinned by
    tests/test_bucketed.py).  The guard verifies the FULL layout
    contract — both sides bucketed, same bucket count, same bucket
    columns, and the join keys covering them — because any mismatch
    makes Spark silently plan Exchanges, which is exactly what this
    helper promises not to do."""
    specs = {}
    for t in (left_table, right_table):
        spec = bucket_spec(spark, t)
        if spec is None:
            raise ValueError(
                f"{t} is not a bucketed table — colocated_join would "
                "silently re-shuffle; use save_bucketed() first or "
                "join the DataFrames directly"
            )
        specs[t] = spec
    (ln, lcols), (rn, rcols) = specs[left_table], specs[right_table]
    if ln != rn or lcols != rcols:
        raise ValueError(
            f"bucket layouts differ — {left_table}: {ln} buckets on "
            f"{lcols}, {right_table}: {rn} buckets on {rcols}; Spark "
            "would silently re-shuffle both sides"
        )
    join_keys = {on} if isinstance(on, str) else set(on)
    if not set(lcols) <= join_keys:
        raise ValueError(
            f"join keys {sorted(join_keys)} do not cover bucket columns "
            f"{lcols} — the bucketed layout cannot satisfy the join's "
            "required distribution and Spark would re-shuffle"
        )
    return spark.table(left_table).join(spark.table(right_table), on, how)


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning — the OTHER write-time layout
    lever: bucketing co-locates a JOIN key; partitioning makes a
    FILTER key prune whole directories before a single byte is read
    (``PartitionFilters`` in the scan, vs ``PushedFilters`` which
    still opens footers).

    The standard 100 TB fact layout is both: partition by the
    time/tenant column queries filter on (low cardinality — days,
    regions), bucket within each partition by the join key.  Choose
    partition columns so a partition holds ≥ one task's worth of data
    (100s of MB); partitioning on a high-cardinality key creates the
    million-tiny-directories failure mode, which is what bucketing is
    for instead."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def zorder_value(
    cols: list[str],
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
):
    """Morton (Z-order) code column: each input column is linearly
    scaled to ``bits`` bits against the supplied min/max, then the
    bits are interleaved — points close in ALL dimensions get close
    z-values, so sorting by z clusters the data in every dimension at
    once.

    Pure column expression (shift/and/or — whole-stage codegen, no
    Python): ``bits × len(cols)`` OR terms.  The code must fit a
    signed long: at the default 16 bits that is 2-3 columns; 4+
    columns need ``bits <= 63 // len(cols)``.  Scaling is clamped, so
    out-of-range values (data drift after stats were taken) land in
    the TOP/BOTTOM edge cell instead of corrupting the interleave;
    NULLs land in the BOTTOM edge cell (cell 0 on that dimension), so
    a null-heavy column degrades its own pruning but never widens the
    other dimensions' top cells."""
    from pyspark.sql import functions as F

    if bits * len(cols) > 63:
        raise ValueError("z-value must fit a signed long")
    top = (1 << bits) - 1
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        if lo is None or hi is None:
            raise ValueError(
                f"z-order column {c!r} has no min/max statistics "
                "(all-NULL or empty input)"
            )
        span = float(hi) - float(lo) or 1.0
        s = F.floor(
            (F.col(c).cast("double") - float(lo)) / span * top
        ).cast("long")
        # coalesce BEFORE the clamp: least/greatest SKIP nulls, so a
        # null reaching the clamp would silently become the TOP cell
        s = F.coalesce(s, F.lit(0))
        scaled.append(F.greatest(F.lit(0), F.least(F.lit(top), s)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(scaled) + j))
    return z


def save_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write (the OPTIMIZE ZORDER analog): range-
    partition on the Morton code and sort within partitions, so every
    output file covers a compact region of the MULTI-dimensional key
    space — parquet footer min/max stats become tight on EVERY
    z-column, and a filter on ANY of them skips most files before
    reading a byte.

    This is the third write-time layout lever: bucketing co-locates a
    JOIN key, directory partitioning prunes ONE low-cardinality
    filter column, z-ordering prunes SEVERAL high-cardinality ones at
    once (at the cost of each being ~sqrt-tight instead of exactly
    sorted).  At 100 TB: a linear sort on ts leaves a user_id filter
    reading every file; z-order (ts, user_id) bounds both.  One
    stats pass + one range shuffle at write time."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[f(c).cast("double").alias(f"{m}_{c}")
          for c in cols
          for m, f in (("min", F.min), ("max", F.max))]
    ).first()
    z = zorder_value(
        cols,
        [stats[f"min_{c}"] for c in cols],
        [stats[f"max_{c}"] for c in cols],
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def candidate_files(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files a reader must open, total files) for ``col BETWEEN lo
    AND hi``, from parquet footer min/max stats alone — the
    deterministic structural measure of how well a layout prunes
    (wall-clock at toy SF is all session floor).  A file is a
    candidate iff any row group's [min, max] intersects [lo, hi] —
    exactly the skipping decision the parquet reader makes."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = cand = 0
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        total += 1
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None:
                cand += 1
                break
            if st.min <= hi and st.max >= lo:
                cand += 1
                break
    return cand, total


def is_bucketed(spark: SparkSession, table: str) -> bool:
    """True iff the catalog records a bucket spec for *table*."""
    return bucket_spec(spark, table) is not None


def bucket_spec(
    spark: SparkSession, table: str
) -> tuple[int, tuple[str, ...]] | None:
    """(num_buckets, bucket_columns) from the catalog, or None when
    the table is not bucketed.  Read from DESCRIBE TABLE EXTENDED —
    the same metadata FileSourceScanExec uses to report its
    outputPartitioning."""
    rows = {r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()}
    if "Num Buckets" not in rows:
        return None
    n = int(rows["Num Buckets"])
    # rendered as e.g. [`k`] or [`k`, `v`]
    cols = tuple(
        c.strip(" `")
        for c in rows.get("Bucket Columns", "").strip("[]").split(",")
        if c.strip(" `")
    )
    return n, cols

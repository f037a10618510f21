"""Physical data layout: Z-order (Morton) clustering for multi-column
file skipping.

At 100 TB, scan cost is dominated by which files/row-groups the planner
can SKIP. Parquet keeps per-row-group min/max stats; a table sorted on
one column prunes well on that column only. Interleaving the bits of
several bucketized columns into one Morton code and range-partitioning +
sorting on it gives every interleaved column locally narrow min/max
ranges, so predicates on ANY of them prune files. This is the same
layout trick Delta/Iceberg expose as ``OPTIMIZE ZORDER BY`` — here it is
a plain DataFrame transform + writer, engine-owned end to end.

Exactness: the bucket and interleave math is pure int64 — ``(x - min) *
(2^bits - 1) DIV range`` then shift/or — so the Morton code is
engine-exact and has a strong DuckDB oracle (same ``//``, ``<<``, ``&``
ops). The only inputs are the global min/max per column, fetched as ONE
tiny aggregate row and broadcast (no sort, no shuffle beyond the final
range partitioner, which is the point of the operator).

Scale shape: one O(1)-row agg pass, then a single repartitionByRange on
the Morton code (sampled range boundaries — Spark's standard mechanism)
with sortWithinPartitions before write. No skew risk: Morton codes are
near-uniform when buckets are, and range partitioning handles residual
skew by splitting dense code ranges. Reference analog: the extractor
writes per-day sorted NPY/parquet (src/export_aligned/npy_export.rs);
this generalizes that single-key layout to multi-key skipping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "zvalue",
) -> DataFrame:
    """Add an int64 Morton code interleaving ``bits`` bits of each column.

    Each column (must cast losslessly to long) is bucketized to
    ``[0, 2^bits)`` with integer-only math against its global min/max:
    ``bucket = ((x - mn) * (2^bits - 1)) div greatest(mx - mn, 1)``.
    Bit j of bucket i lands at position ``j * k + i`` of the code, so
    ``k * bits`` must be <= 63. Nulls bucket to 0 (sort first — they
    cluster together, which is what a scanner wants).

    One tiny min/max aggregate row, broadcast-joined; the code itself is
    a pure JVM shift/or expression chain inside whole-stage codegen.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds int64")
    top = (1 << bits) - 1

    aggs = []
    for c in cols:
        lc = _as_col(c).cast("long")
        aggs.append(F.min(lc).alias(f"_mn_{c}"))
        aggs.append(F.max(lc).alias(f"_mx_{c}"))
    stats = df.agg(*aggs)

    out = df.join(F.broadcast(stats))
    tmp = []
    for c in cols:
        lc = F.coalesce(_as_col(c).cast("long"), F.col(f"_mn_{c}"))
        # numerator can reach range * top (~2^8 * ts-range); int64 `div`
        # keeps the floor division exact where double math would not.
        out = out.withColumn(f"_xm_{c}", (lc - F.col(f"_mn_{c}")) * F.lit(top))
        out = out.withColumn(
            f"_bk_{c}",
            F.expr(f"_xm_{c} div greatest(_mx_{c} - _mn_{c}, 1L)"),
        )
        tmp += [f"_xm_{c}", f"_bk_{c}", f"_mn_{c}", f"_mx_{c}"]
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        bucket = F.col(f"_bk_{c}")
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return out.withColumn(out_col, z).drop(*tmp)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Morton code of ``cols``.

    repartitionByRange on the code (num_files output files, contiguous
    code ranges) + sortWithinPartitions so row-group min/max stats are
    tight on every interleaved column. The helper column is dropped
    before write.
    """
    z = with_zvalue(df, cols, bits)
    (
        z.repartitionByRange(num_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )


def bucketed_write(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) external parquet
    table — Spark's hash-bucketing layout, the co-located-join primitive.

    Two tables bucketed the same way (same keys, same ``buckets``) join
    with ZERO Exchange on either side: each task reads matching bucket
    files directly, so the 100-TB fact-to-fact join skips the shuffle
    that normally dominates it. ``sort=True`` additionally pre-sorts
    rows within each bucket on the keys, letting SortMergeJoin skip its
    Sort too. This is the layout an as-of/enrichment pipeline writes
    ONCE and amortizes over every downstream join at the same key.

    Bucketing requires the table catalog (bucket metadata lives there),
    hence saveAsTable with an explicit external ``path``.
    """
    w = df.write.mode("overwrite").option("path", path).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark, left_table: str, right_table: str, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables with a merge hint so
    the planner uses the bucket layout (no Exchange; no Sort if the
    tables were written with ``sort=True``). The caller should verify
    the plan with ``"Exchange" not in df._jdf.queryExecution()...`` —
    tests/test_layout.py does exactly that."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, keys, how)


def file_span_stats(path: str, col: str) -> list[tuple[int, int]]:
    """Per-row-group (min, max) of ``col`` from parquet footer metadata —
    the exact stats a scanner's pruning consults. Driver-side metadata
    read only (footers, not data). Test/diagnostic helper."""
    import pyarrow.parquet as pq

    spans = []
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        names = md.schema.to_arrow_schema().names
        ci = {n: i for i, n in enumerate(names)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci[col]).statistics
            if st is not None and st.has_min_max:
                spans.append((st.min, st.max))
    return spans


def compaction_plan(
    manifest: DataFrame,
    partition_col: str = "partition",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction plan over a file manifest (the shape of
    Iceberg's ``files`` metadata table: partition, file id, byte size) —
    the maintenance pass that keeps a 100-TB table's scan parallelism
    healthy after streaming/CDC ingest sprays small files.

    Greedy in-order bin packing per partition: files in stable file-id
    order, bin = exclusive-prefix-size DIV target — each output group
    closes once its cumulative size reaches the target, so every bin
    except the partition's last is >= target minus one file. Exact
    integer division; the only window runs inside each partition in
    manifest order (no global sort). A manifest is O(file count), i.e.
    millions of rows for a 100-TB table — trivially window-able.

    Returns one row per (partition, bin): file count, total bytes, the
    file-id span, and whether the bin actually merges anything.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    binned = manifest.select(
        F.col(partition_col).alias("part"),
        F.col(file_col).alias("fid"),
        F.col(size_col).alias("sz"),
        cum_before.alias("cb"),
    ).select(
        "part", "fid", "sz",
        # exact integer division (DIV), not float floor
        F.expr(f"cb div {int(target_bytes)}").cast("long").alias("bin"),
    )
    return (
        binned.groupBy("part", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("sz").cast("long").alias("total_bytes"),
            F.min("fid").alias("first_file"),
            F.max("fid").alias("last_file"),
        )
        .withColumn("merges", (F.col("n_files") > 1).cast("boolean"))
    )


def file_skipping_report(
    file_stats: DataFrame,
    min_col: str = "min_v",
    max_col: str = "max_v",
    lo=None,
    hi=None,
) -> DataFrame:
    """Zone-map pruning effectiveness for a range predicate [lo, hi]:
    given per-file column (min, max) — parquet footer / Iceberg manifest
    stats — a file is skippable iff its span lies entirely outside the
    predicate. One aggregate row: total files/bytes of metadata scanned is
    O(files), zero data reads, the exact computation a table format's
    planner does at prune time.

    Returns (n_files, n_skippable, n_scanned, scan_frac).
    """
    skip = (F.col(max_col) < F.lit(lo)) | (F.col(min_col) > F.lit(hi))
    agg = file_stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(skip.cast("long")).cast("long").alias("n_skippable"),
    )
    scanned = F.col("n_files") - F.col("n_skippable")
    frac = scanned.cast("double") / F.col("n_files").cast("double")
    return agg.select(
        "n_files", "n_skippable",
        scanned.cast("long").alias("n_scanned"),
        (F.floor(frac * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("scan_frac"),
    )


def clustering_depth(
    stats: DataFrame,
    file_col: str = "file_id",
    min_col: str = "min_v",
    max_col: str = "max_v",
) -> DataFrame:
    """Clustering/overlap-depth meter over a file manifest of per-file
    [min, max] key ranges — the read-amplification number OPTIMIZE/Z-order
    exists to reduce: for each file, how many OTHER files' ranges overlap
    it (a range query touching this file must also read those). Perfectly
    clustered = depth 0 everywhere; fully interleaved = n-1.

    Exact O(n log n) order-statistics construction, NEVER the O(n^2)
    interval self-join: with sorted boundaries,
        overlap_i = |{j : min_j <= max_i}| - |{j : max_j < min_i}| - 1.
    Both counts come from ONE boundary sweep each (union the boundary
    with the probe points, running count of boundary rows under a total
    order where ties resolve to the inclusive/exclusive side needed).
    Scale shape: two global sorts of 2n boundary rows — manifest-sized,
    never data-sized.

    Returns ``DataFrame[file_id, overlap_depth: long]``.
    """
    f = F.col(file_col)
    # carry the file id in its ORIGINAL type: casting string/uuid ids to
    # long yields NULL, the fid == fid2 join then matches nothing and the
    # operator would silently return an empty frame
    fid_type = dict(stats.dtypes)[file_col]
    # pass 1: starts_le(max_i) — count of mins <= each file's max.
    # boundary rows (kind 0) sort BEFORE probe rows (kind 1) at equal
    # value, so a min equal to the probed max IS counted (inclusive).
    b1 = stats.select(F.col(min_col).alias("v"), F.lit(0).alias("k"),
                      F.lit(None).cast(fid_type).alias("fid"))
    q1 = stats.select(F.col(max_col).alias("v"), F.lit(1).alias("k"),
                      f.alias("fid"))
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    s1 = (
        b1.unionAll(q1)
        .withColumn("c", F.sum((F.col("k") == 0).cast("long")).over(w))
        .filter(F.col("k") == 1)
        .select("fid", F.col("c").alias("starts_le"))
    )
    # pass 2: ends_lt(min_i) — count of maxes strictly < each file's min.
    # probe rows (kind 0) sort BEFORE boundary rows (kind 1) at equal
    # value, so a max equal to the probed min is NOT counted (strict).
    b2 = stats.select(F.col(max_col).alias("v"), F.lit(1).alias("k"),
                      F.lit(None).cast(fid_type).alias("fid"))
    q2 = stats.select(F.col(min_col).alias("v"), F.lit(0).alias("k"),
                      f.alias("fid"))
    s2 = (
        b2.unionAll(q2)
        .withColumn("c", F.sum((F.col("k") == 1).cast("long")).over(w))
        .filter(F.col("k") == 0)
        .select(F.col("fid").alias("fid2"), F.col("c").alias("ends_lt"))
    )
    return (
        s1.join(s2, s1["fid"] == s2["fid2"])
        .select(
            F.col("fid").alias(file_col),
            (F.col("starts_le") - F.col("ends_lt") - 1)
            .cast("long").alias("overlap_depth"),
        )
    )

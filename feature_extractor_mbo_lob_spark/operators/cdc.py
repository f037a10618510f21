"""Change-data-capture apply: merge an ordered change stream into a
snapshot (the lakehouse MERGE/upsert the Iceberg ingestion side of this
engine consumes).

A transcript corpus at 10^12 turns is maintained incrementally: each
sync delivers inserts / updates / deletes keyed by entity with a
monotonically increasing change sequence. ``apply_cdc`` folds snapshot +
changes into the new snapshot: per key, the change with the greatest
sequence wins; a delete removes the key. This is exactly what
``MERGE INTO`` compiles to — expressed here as ONE union + ONE keyed
window (max-seq row), so the plan is a single hash exchange over slim
columns, no join at all (the snapshot is just the seq=-1 layer of the
union).

Determinism: ties on (key, seq) are broken by op then attrs (documented;
real CDC feeds have unique seqs per key). All comparisons are integer.

Scale shape: the big side (snapshot) shuffles once on the key; the
change batch is typically tiny but rides the same union — no broadcast
needed, no second pass. At 100 TB you'd partition the snapshot by
key-bucket and only rewrite buckets containing changed keys
(export.with_bucket gives the bucketing); the fold itself is unchanged.

Reference analog: day-over-day instrument metadata refresh feeding the
extractor (src/export_aligned); standard Debezium/Iceberg CDC semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Fold ``changes`` (columns: key, seq, op, attrs...) into ``snapshot``
    (columns: key, attrs...) -> the next snapshot.

    Attrs are every non-(key, seq, op) column of ``changes``; the
    snapshot must carry the same attr columns. Latest seq per key wins;
    op='D' drops the key. Snapshot rows enter the fold at seq = -1, so
    any change (seq >= 0) supersedes them.
    """
    attrs = [c for c in changes.columns if c not in (key, seq_col, op_col)]
    snap_cols = set(snapshot.columns)
    missing = [c for c in attrs if c not in snap_cols]
    if missing:
        raise ValueError(f"snapshot lacks change attr columns: {missing}")
    base = snapshot.select(
        F.col(key),
        F.lit(-1).cast("long").alias(seq_col),
        F.lit(OP_INSERT).alias(op_col),
        *[F.col(c) for c in attrs],
    )
    layered = base.unionByName(
        changes.select(key, F.col(seq_col).cast("long").alias(seq_col), op_col, *attrs)
    )
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc(), *[F.col(c).desc() for c in attrs]
    )
    latest = (
        layered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col(op_col) != OP_DELETE).drop(seq_col, op_col)


def partial_aggregate(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Mergeable per-key aggregate state: (key, cnt, sum, min, max) — the
    commutative-monoid shape that makes incremental rollup possible.
    Integer value column expected (quantize floats first); one
    map-side-combinable groupBy."""
    v = F.col(value_col)
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(v).cast("long").alias("sum_v"),
        F.min(v).cast("long").alias("min_v"),
        F.max(v).cast("long").alias("max_v"),
    )


def merge_partial_aggregates(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental materialized-view maintenance: fold a new batch's
    partial aggregates into the standing state WITHOUT rescanning history
    — the only viable refresh at 100 TB (a full recompute per batch is a
    full-table scan per batch; this is one small-batch aggregate + one
    key-co-partitioned full outer join against the state table).

    Because (cnt, sum, min, max) form a commutative monoid, merge is
    coalesce-arithmetic per column; the result is bit-identical to the
    from-scratch aggregate (tests prove the equivalence property).
    """
    s = state.select(
        "key",
        F.col("cnt").alias("_sc"), F.col("sum_v").alias("_ss"),
        F.col("min_v").alias("_sm"), F.col("max_v").alias("_sx"),
    )
    d = delta.select(
        "key",
        F.col("cnt").alias("_dc"), F.col("sum_v").alias("_ds"),
        F.col("min_v").alias("_dm"), F.col("max_v").alias("_dx"),
    )
    j = s.join(d, "key", "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0))
    return j.select(
        "key",
        (z("_sc") + z("_dc")).cast("long").alias("cnt"),
        (z("_ss") + z("_ds")).cast("long").alias("sum_v"),
        F.least(
            F.coalesce(F.col("_sm"), F.col("_dm")),
            F.coalesce(F.col("_dm"), F.col("_sm")),
        ).cast("long").alias("min_v"),
        F.greatest(
            F.coalesce(F.col("_sx"), F.col("_dx")),
            F.coalesce(F.col("_dx"), F.col("_sx")),
        ).cast("long").alias("max_v"),
    )

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

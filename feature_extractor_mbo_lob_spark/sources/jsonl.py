"""JSONL corpus source with corrupt-record quarantine.

Web-scale text corpora overwhelmingly arrive as (gzipped) JSON Lines —
one document object per line, schemas drifting across dumps, a tail of
truncated/malformed lines in every crawl delivery. The production-safe
read is: explicit schema (never inference — an inference pass over
100 TB is a full extra scan, and a drifted field silently retypes the
column), PERMISSIVE mode with a corrupt-record column, then split the
malformed tail into a quarantine frame instead of failing the job
(same policy as batch.split_quarantine for structural errors).

Spark-native details that matter at scale:
* .json() readers parallelize per file AND per split for uncompressed
  files; .gz files are splittable only line-by-line per file — shard
  uploads into many files (export_jsonl_shards writes that layout).
* the corrupt column must be in the passed schema, and Spark requires
  caching or re-reading to materialize corrupt records consistently;
  quarantining through a filter on the SAME read handles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` under an explicit ``schema``; returns
    (good, quarantined) — quarantined rows carry the raw corrupt line.

    Implemented as ONE text scan + JVM ``from_json`` rather than the
    .json() reader: the built-in reader forbids plans that reference only
    its corrupt-record column (it would need a second parse) and its
    documented workaround is caching the whole read — a non-starter at
    100 TB. Parsing the line column explicitly keeps everything in one
    streaming pass: a line whose parse fails yields a NULL struct ->
    quarantine; a parseable line yields the typed struct -> good.
    """
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_row"),
    )
    is_bad = F.col(f"_row.{CORRUPT_COL}").isNotNull() | F.col("_row").isNull()
    bad = parsed.filter(is_bad).select(F.col("value").alias("raw_line"))
    good = (
        parsed.filter(~is_bad)
        .select("_row.*")
        .drop(CORRUPT_COL)
    )
    return good, bad

"""Transcript sources.

The engine's input table shape (per BASELINE input_hint):

    (conv_id: string, turn_idx: int, role: string, text: string,
     tool: string, ts: timestamp)

Three sources:

* ``read_transcripts``  — parquet / Iceberg scan (the production path; at
  10^12 turns this is an Iceberg snapshot read with partition pruning on
  days(ts) / bucket(conv_id)).
* ``synth_transcripts`` — fully distributed deterministic generator built on
  ``spark.range`` + hash mixing. No driver-side data, no Python RNG on
  executors, so the same (n_convs, seed) always yields byte-identical rows
  at any parallelism — this is the golden-fixture input.
* ``transcripts_from_events`` — deterministic mapping of the driver's
  ``events`` star-schema table into the transcript shape, mirrored 1:1 by
  ``ORACLE_TRANSCRIPTS_CTE`` (DuckDB SQL) so every transcript operator can be
  oracle-checked.

Reference analog: the pluggable MarketDataSource abstraction
(reference: src/pipeline.rs:563-566, tests/source_abstraction_tests.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_WORDS = (
    "alpha beta gamma delta query window join shuffle partition spark stream "
    "batch feature label anchor session tool call result plan merge sort"
).split()


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Scan a transcript table. For Iceberg pass fmt='iceberg' and a table
    identifier; filters on ts/conv_id push down to partition pruning."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.format(fmt).load(path)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    min_turns: int = 5,
    max_turns: int = 64,
    seed: int = 42,
    n_mega_convs: int = 0,
    mega_turns: int = 2000,
    start_epoch_s: int = 1_704_067_200,  # 2024-01-01 UTC
) -> DataFrame:
    """Deterministic distributed transcript generator.

    All pseudo-randomness is ``xxhash64(column, seed)`` — a pure function of
    (conv id, turn index, seed) — so output is independent of partitioning
    and cluster size. ``n_mega_convs`` adds pathologically long conversations
    to exercise skew handling.
    """
    conv = spark.range(n_convs).withColumnRenamed("id", "conv_num")
    span = max_turns - min_turns + 1
    conv = conv.withColumn(
        "n_turns",
        F.lit(min_turns) + F.pmod(F.xxhash64("conv_num", F.lit(seed)), F.lit(span)).cast("int"),
    )
    if n_mega_convs > 0:
        mega = (
            spark.range(n_mega_convs)
            .select((F.col("id") + n_convs).alias("conv_num"))
            .withColumn("n_turns", F.lit(mega_turns))
        )
        conv = conv.unionByName(mega)

    t = conv.select(
        "conv_num",
        F.posexplode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx", "_i"),
    ).drop("_i")

    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731
    t = t.withColumn("_h", h("conv_num", "turn_idx"))

    # role: turn 0 is always user; afterwards hash-buckets 40/40/20
    t = t.withColumn(
        "role",
        F.when(F.col("turn_idx") == 0, F.lit("user")).otherwise(
            F.when(F.pmod("_h", F.lit(10)) < 4, F.lit("user"))
            .when(F.pmod("_h", F.lit(10)) < 8, F.lit("assistant"))
            .otherwise(F.lit("tool"))
        ),
    )
    # tool name present on tool turns and ~25% of assistant turns
    t = t.withColumn(
        "tool",
        F.when(
            (F.col("role") == "tool")
            | ((F.col("role") == "assistant") & (F.pmod(h("turn_idx", "conv_num"), F.lit(4)) == 0)),
            F.concat(F.lit("t"), F.pmod("_h", F.lit(5)).cast("string")),
        ),
    )
    # text: 3-12 deterministic dictionary words
    n_words = (F.pmod(h("conv_num", "turn_idx", "_h"), F.lit(10)) + 3).cast("int")
    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    t = t.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), n_words),
                lambda i: F.element_at(
                    word_arr,
                    (F.pmod(F.xxhash64(F.col("conv_num"), F.col("turn_idx"), i, F.lit(seed)),
                            F.lit(len(_WORDS))) + 1).cast("int"),
                ),
            ),
        ),
    )
    # ts: conversation start staggered by 97s; inter-turn gap 1..300s with a
    # ~3% chance of a >1h gap (drives sessionization tests); cumulative sum
    # over the stable order gives monotone per-conv timestamps.
    gap = F.when(
        F.pmod(h("turn_idx", "_h"), F.lit(33)) == 0, F.lit(4000)
    ).otherwise(1 + F.pmod(h("_h", "turn_idx"), F.lit(300)))
    w = Window.partitionBy("conv_num").orderBy("turn_idx")
    t = t.withColumn("_gap", F.when(F.col("turn_idx") == 0, F.lit(0)).otherwise(gap))
    t = t.withColumn("_off", F.sum("_gap").over(w))
    t = t.withColumn(
        "ts",
        F.timestamp_seconds(F.lit(start_epoch_s) + F.col("conv_num") * 97 + F.col("_off")),
    )
    return t.select(
        F.concat(F.lit("c"), F.col("conv_num").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )


# --- events -> transcripts (oracle-checked path) ---------------------------
#
# The Spark mapping below and the DuckDB CTE string MUST stay semantically
# identical: the driver compares every queries() entry against oracle SQL
# that starts from this CTE. Keep them adjacent when editing.

_ROLE_CASE = """
    case when event_type in ('click','view') then 'user'
         when event_type in ('signup','purchase') then 'assistant'
         else 'tool' end
"""

ORACLE_TRANSCRIPTS_CTE = f"""
transcripts as (
    select
        cast(user_id as varchar)                             as conv_id,
        cast(row_number() over (partition by user_id
                                order by ts, event_id) - 1 as int) as turn_idx,
        {_ROLE_CASE}                                         as role,
        concat(event_type, ' ', props)                       as text,
        case when event_type in ('purchase','error')
             then concat('t', cast(event_id % 5 as varchar)) end as tool,
        ts,
        value
    from events
)
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's events table into the transcript shape (plus the
    per-turn scalar timeline ``value`` used by labeling operators)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # project the string conv_id FIRST and partition the turn-index window
    # by that attribute: downstream operators window on conv_id (string),
    # so the one exchange established here is reused by every consumer
    # instead of re-shuffling the whole frame under a differently-hashed
    # key (r6: one exchange, not two, for all ~90 transcript-shaped
    # queries; the cast is injective so groups and turn_idx are unchanged)
    base = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        "event_id", "event_type", "props", "ts", "value",
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return base.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_type").isin("click", "view"), F.lit("user"))
        .when(F.col("event_type").isin("signup", "purchase"), F.lit("assistant"))
        .otherwise(F.lit("tool"))
        .alias("role"),
        F.concat(F.col("event_type"), F.lit(" "), F.col("props")).alias("text"),
        F.when(
            F.col("event_type").isin("purchase", "error"),
            F.concat(F.lit("t"), (F.col("event_id") % 5).cast("string")),
        ).alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value"),
    )

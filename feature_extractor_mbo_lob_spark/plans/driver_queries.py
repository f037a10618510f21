"""Driver-facing query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus an ANSI-SQL DuckDB oracle twin.

Conventions that make the driver's order-insensitive value-hash match:
* every float output column is round(x, 6) on BOTH sides,
* every computed column is aliased identically on both sides,
* label/count columns are cast to int/bigint consistently,
* the transcript mapping of the events table is defined ONCE
  (sources.transcripts.ORACLE_TRANSCRIPTS_CTE) and reused verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LabelConfig, PipelineConfig
from ..contract import DIVISION_GUARD_EPS, MIN_DURATION_S
from ..labeling import tlob_labels
from ..operators import asof, ordering, sampling, state, rolling
from ..sources.transcripts import ORACLE_TRANSCRIPTS_CTE, transcripts_from_events

CFG = PipelineConfig(
    window_sizes=(8, 32, 128),
    sample_every_n=4,
    volume_target=200.0,
    session_gap_s=1800.0,
    labels=LabelConfig(smoothing_k=2, horizon=5, threshold=0.01),
)

_W = "with " + ORACLE_TRANSCRIPTS_CTE

# stable-order window, reused by most oracles
_OWIN = "partition by conv_id order by turn_idx, ts"
_CUM = f"{_OWIN} rows between unbounded preceding and current row"


def _r6(c, name):
    return F.round(c, 6).alias(name)


# --- 1. cumulative point-in-time state -------------------------------------

def q_state_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    s = state.with_state_features(t, CFG)
    return s.select(
        "conv_id",
        "turn_idx",
        F.col("turns_so_far").cast("long").alias("turns_so_far"),
        F.col("user_turns_so_far").cast("long").alias("user_turns_so_far"),
        F.col("assistant_turns_so_far").cast("long").alias("assistant_turns_so_far"),
        F.col("tool_turns_so_far").cast("long").alias("tool_turns_so_far"),
        _r6(F.col("chars_so_far"), "chars_so_far"),
        _r6(F.col("dt_seconds"), "dt_seconds"),
        _r6(F.col("secs_since_start"), "secs_since_start"),
    )


O_STATE_CUMULATIVE = f"""{_W}
select conv_id, turn_idx,
  count(*) over cum                                         as turns_so_far,
  sum(case when role = 'user' then 1 else 0 end) over cum   as user_turns_so_far,
  sum(case when role = 'assistant' then 1 else 0 end) over cum as assistant_turns_so_far,
  sum(case when role = 'tool' then 1 else 0 end) over cum   as tool_turns_so_far,
  round(sum(cast(length(text) as double)) over cum, 6)      as chars_so_far,
  round(coalesce((epoch_us(ts) - lag(epoch_us(ts)) over w) / 1e6, 0.0), 6) as dt_seconds,
  round((epoch_us(ts) - first_value(epoch_us(ts)) over cum) / 1e6, 6) as secs_since_start
from transcripts
window w as ({_OWIN}), cum as ({_CUM})
"""


# --- 2. rolling window features --------------------------------------------

def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    cfg = PipelineConfig(window_sizes=(8,))
    s = rolling.with_rolling_features(state.with_state_features(t, cfg), cfg)
    return s.select(
        "conv_id",
        "turn_idx",
        _r6(F.col("turn_rate_w8"), "turn_rate"),
        _r6(F.col("char_mean_w8"), "char_mean"),
        _r6(F.col("char_std_w8"), "char_std"),
        _r6(F.col("char_zscore_w8"), "char_zscore"),
        _r6(F.col("char_hhi_w8"), "char_hhi"),
        _r6(F.col("char_p50_w8"), "char_p50"),
        _r6(F.col("user_frac_w8"), "user_frac"),
    )


O_ROLLING_WINDOW = f"""{_W},
t as (
  select conv_id, turn_idx, ts, role, cast(length(text) as double) as x
  from transcripts
)
select conv_id, turn_idx,
  round(count(*) over f / greatest((max(epoch_us(ts)) over f - min(epoch_us(ts)) over f) / 1e6, {MIN_DURATION_S}), 6) as turn_rate,
  round(avg(x) over f, 6)                                   as char_mean,
  round(sqrt(greatest(avg(x*x) over f - (avg(x) over f)*(avg(x) over f), 0.0)), 6) as char_std,
  round((x - avg(x) over f) / (sqrt(greatest(avg(x*x) over f - (avg(x) over f)*(avg(x) over f), 0.0)) + {DIVISION_GUARD_EPS}), 6) as char_zscore,
  round(case when sum(x) over f > 0
        then (sum(x*x) over f) / ((sum(x) over f)*(sum(x) over f)) else 0.0 end, 6) as char_hhi,
  round(cast(quantile_cont(x, 0.5) over f as double), 6)    as char_p50,
  round(sum(case when role='user' then 1.0 else 0.0 end) over f / count(*) over f, 6) as user_frac
from t
window f as ({_OWIN} rows between 7 preceding and current row)
"""


# --- 3. sessionization -------------------------------------------------------

def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    s = state.with_sessions(state.with_state_features(t, CFG), CFG)
    return s.groupBy("conv_id").agg(
        (F.max("session_id") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_turns"),
        _r6(F.count(F.lit(1)) / (F.max("session_id") + 1), "turns_per_session"),
    )


O_SESSION_STATS = f"""{_W},
t as (
  select conv_id, turn_idx, ts,
    case when lag(epoch_us(ts)) over w is null
           or epoch_us(ts) - lag(epoch_us(ts)) over w > {int(CFG.session_gap_s * 1e6)}
         then 1 else 0 end as is_start
  from transcripts
  window w as ({_OWIN})
)
select conv_id,
  sum(is_start)                          as n_sessions,
  count(*)                               as n_turns,
  round(count(*) / cast(sum(is_start) as double), 6) as turns_per_session
from t group by conv_id
"""


# --- 4. event sampler + interval assignment ---------------------------------

def q_event_sampler_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    t = t.withColumn("char_len", F.length("text").cast("double"))
    flagged = sampling.event_sample_flag(t, CFG, n=4)
    out = sampling.interval_aggregate(
        flagged,
        CFG,
        aggs=[
            F.sum("char_len").alias("interval_chars"),
            F.count(F.lit(1)).alias("interval_turns"),
        ],
    )
    return out.select(
        "conv_id",
        "turn_idx",
        _r6(F.col("interval_chars"), "interval_chars"),
        F.col("interval_turns").cast("long").alias("interval_turns"),
    )


O_EVENT_SAMPLER_INTERVAL = f"""{_W},
t as (
  select conv_id, turn_idx, ts, cast(length(text) as double) as char_len,
    row_number() over ({_OWIN}) as rn
  from transcripts
),
f as (
  select *,
    case when rn % 4 = 0 then 1 else 0 end as is_sample,
    coalesce(sum(case when rn % 4 = 0 then 1 else 0 end)
             over ({_OWIN} rows between unbounded preceding and 1 preceding), 0) as sample_id
  from t
),
g as (
  select conv_id, sample_id, sum(char_len) as interval_chars, count(*) as interval_turns
  from f group by conv_id, sample_id
)
select f.conv_id, f.turn_idx,
  round(g.interval_chars, 6) as interval_chars,
  g.interval_turns
from f join g using (conv_id, sample_id)
where f.is_sample = 1
"""


# --- 5. volume sampler (cumsum-bucket contract form) ------------------------

def q_volume_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    t = t.withColumn("char_len", F.length("text").cast("double"))
    flagged = sampling.volume_sample_flag(t, CFG, target=200.0)
    return flagged.filter(F.col("is_sample") == 1).select("conv_id", "turn_idx")


O_VOLUME_SAMPLER = f"""{_W},
t as (
  select conv_id, turn_idx, ts,
    floor(sum(cast(length(text) as double)) over ({_CUM}) / 200.0) as bucket
  from transcripts
)
select conv_id, turn_idx
from (
  select conv_id, turn_idx,
         coalesce(lag(bucket) over ({_OWIN}), 0) as prev_bucket, bucket
  from t
) where prev_bucket < bucket
"""


# --- 6. TLOB labels ----------------------------------------------------------

def q_tlob_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    lab = tlob_labels(t.withColumn("p", F.col("value")), CFG, price_col="p")
    return lab.filter(F.col("label").isNotNull()).select(
        "conv_id",
        "turn_idx",
        F.col("label").cast("int").alias("label"),
        _r6(F.col("label_pct_change"), "pct_change"),
    )


_K, _H, _TH = CFG.labels.smoothing_k, CFG.labels.horizon, CFG.labels.threshold
O_TLOB_LABELS = f"""{_W},
t as (
  select conv_id, turn_idx, ts, value as p from transcripts
),
l as (
  select conv_id, turn_idx,
    avg(p) over wm as w_minus, avg(p) over wp as w_plus,
    count(p) over wm as n_minus, count(p) over wp as n_plus
  from t
  window wm as ({_OWIN} rows between {_K} preceding and current row),
         wp as ({_OWIN} rows between {_H - _K} following and {_H} following)
)
select conv_id, turn_idx,
  cast(case when (w_plus - w_minus) / w_minus > {_TH} then 1
            when (w_plus - w_minus) / w_minus < -{_TH} then -1
            else 0 end as int)                      as label,
  round((w_plus - w_minus) / w_minus, 6)            as pct_change
from l
where n_minus = {_K + 1} and n_plus = {_K + 1}
"""


# --- 7. as-of join against a timeline ---------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    left = t.select("conv_id", "turn_idx", "ts")
    right = (
        t.filter(F.col("text").startswith("purchase"))
        .select("conv_id", "ts", F.col("value").alias("purchase_value"))
    )
    out = asof.asof_join(left, right, key="conv_id", ts="ts",
                         value_cols=["purchase_value"], direction="backward")
    return out.select(
        "conv_id", "turn_idx",
        _r6(F.col("purchase_value_asof"), "last_purchase_value"),
    )


O_ASOF_JOIN = f"""{_W},
l as (select conv_id, turn_idx, ts from transcripts),
r as (select conv_id, ts, value as purchase_value from transcripts
      where text like 'purchase%')
select l.conv_id, l.turn_idx,
  round(r.purchase_value, 6) as last_purchase_value
from l asof left join r on l.conv_id = r.conv_id and l.ts >= r.ts
"""


# --- 8. forward-fill imputation ----------------------------------------------

def q_ffill_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    sparse = t.withColumn(
        "purchase_value",
        F.when(F.col("text").startswith("purchase"), F.col("value")),
    )
    out = asof.ffill(sparse, CFG, ["purchase_value"])
    return out.select(
        "conv_id", "turn_idx",
        _r6(F.col("purchase_value_ffill"), "purchase_value_ffill"),
    )


O_FFILL_IMPUTE = f"""{_W}
select conv_id, turn_idx,
  round(last_value(case when text like 'purchase%' then value end ignore nulls)
        over ({_CUM}), 6) as purchase_value_ffill
from transcripts
"""


# --- 9. TPC-H Q1 (grouped aggregation over lineitem) -------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r6(F.sum("l_quantity"), "sum_qty"),
            _r6(F.sum("l_extendedprice"), "sum_base_price"),
            _r6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "sum_disc_price"),
            _r6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))),
                "sum_charge",
            ),
            _r6(F.avg("l_quantity"), "avg_qty"),
            _r6(F.avg("l_extendedprice"), "avg_price"),
            _r6(F.avg("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


O_PRICING_SUMMARY = """
select l_returnflag, l_linestatus,
  round(sum(l_quantity), 6)                                   as sum_qty,
  round(sum(l_extendedprice), 6)                              as sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 6)           as sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) as sum_charge,
  round(avg(l_quantity), 6)                                   as avg_qty,
  round(avg(l_extendedprice), 6)                              as avg_price,
  round(avg(l_discount), 6)                                   as avg_disc,
  count(*)                                                    as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02'
group by l_returnflag, l_linestatus
"""


# --- 10. exact dedup over documents ------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keep_doc_id", "n_copies")


O_DEDUP_EXACT = """
select min(doc_id) as keep_doc_id, count(*) as n_copies
from documents group by text
"""


QUERIES = {
    "state_cumulative": q_state_cumulative,
    "rolling_window": q_rolling_window,
    "session_stats": q_session_stats,
    "event_sampler_interval": q_event_sampler_interval,
    "volume_sampler": q_volume_sampler,
    "tlob_labels": q_tlob_labels,
    "asof_join": q_asof_join,
    "ffill_impute": q_ffill_impute,
    "pricing_summary": q_pricing_summary,
    "dedup_exact": q_dedup_exact,
}

ORACLES = {
    "state_cumulative": O_STATE_CUMULATIVE,
    "rolling_window": O_ROLLING_WINDOW,
    "session_stats": O_SESSION_STATS,
    "event_sampler_interval": O_EVENT_SAMPLER_INTERVAL,
    "volume_sampler": O_VOLUME_SAMPLER,
    "tlob_labels": O_TLOB_LABELS,
    "asof_join": O_ASOF_JOIN,
    "ffill_impute": O_FFILL_IMPUTE,
    "pricing_summary": O_PRICING_SUMMARY,
    "dedup_exact": O_DEDUP_EXACT,
}

"""Bounded-memory frequency sketches: count-min with md5 row hashes.

Why CMS here: exact per-key counts shuffle O(distinct keys) — fine for
vocabularies, fatal for unbounded key spaces (URLs, n-grams, user ids) at
100 TB. A count-min sketch is a FIXED d x w grid of counters regardless of
cardinality: after the per-partition partial aggregation each task emits at
most d*w rows, so the shuffle is O(partitions * d * w) — independent of
both row count and key cardinality. Estimates are biased high only
(est >= true, within eps*N with probability 1-delta for w=ceil(e/eps),
d=ceil(ln 1/delta)).

Determinism: the row hash is md5(seed || '|' || key) -> first 7 hex chars
as an integer mod w — the same keyed-hash-as-permutation trick the MinHash
family uses (operators/dedup.py), chosen so any engine with md5 reproduces
the sketch bit-for-bit (the DuckDB oracle rebuilds identical cells).

Reference analog: the reference keeps fixed-size per-symbol frequency
tallies in its export manifest (tools/export_dataset.rs); CMS is the
cardinality-unbounded generalization a web corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cms_bucket(col, seed: int, width: int) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c)), 1, 7), 16, 10
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one row per non-empty cell, ``(row_idx, col_idx,
    cnt)``. Each input row scatters into ``depth`` cells (a per-row array
    explode — narrow), then ONE groupBy over at most depth*width keys with
    map-side combine: the shuffle is sketch-sized, not data-sized."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(key_col, r, width).alias("col_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("_w"),
    )
    return (
        cells.groupBy(F.col("c.row_idx").alias("row_idx"), F.col("c.col_idx").alias("col_idx"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: estimate =
    min over rows r of cell(r, h_r(key)). The sketch is at most
    depth*width rows, so it is broadcast — the lookup join never
    shuffles the key side."""
    melted = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(key_col, r, width).alias("col_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row_idx", "c.col_idx")
    return (
        melted.join(F.broadcast(sketch), ["row_idx", "col_idx"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("est_cnt"))
    )


def linear_counting(
    df: DataFrame,
    key_col: str = "key",
    m: int = 4096,
) -> DataFrame:
    """Linear probabilistic counting (Whang et al. 1990): hash every key
    into an m-slot bitmap; the distinct-count estimate is
    ``-m * ln(empty_slots / m)``. One groupBy over at most m occupied
    slots (map-side combine -> shuffle is O(partitions * m), independent
    of cardinality), then a single-row aggregate.

    Returns ONE row ``(m, occupied, empty)`` — all integers, so the
    result is engine-exact; callers (or SQL consumers) apply the log
    formula. Accurate while distinct << m; for unbounded cardinalities
    chain sketches or use HLL (Spark's approx_count_distinct — not
    oracle-reproducible, hence this deterministic form for the gate).
    """
    occ = (
        df.select(_cms_bucket(key_col, 0, m).alias("slot"))
        .groupBy("slot")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return occ.agg(
        F.lit(m).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("occupied"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("empty"),
    )


def bloom_bits(
    df: DataFrame,
    key_col: str = "key",
    num_hashes: int = 3,
    num_bits: int = 1 << 20,
) -> DataFrame:
    """Build side of a broadcast Bloom filter: the distinct set bit
    positions for every key, ``num_hashes`` md5-derived positions each
    (seed i -> md5(f"{i}|" + key) first 7 hex chars mod num_bits).

    Returns ``DataFrame[pos: long]`` — at most ``min(num_bits,
    n_keys * num_hashes)`` rows. For a decontamination benchmark set
    (thousands-to-millions of keys) this is kilobytes-to-megabytes:
    small enough to broadcast, which is the whole point — the probe
    side then needs NO shuffle at all (see bloom_probe). The bitmap is
    engine-exact: any system with md5 rebuilds the identical bit set.
    """
    c = F.col(key_col).cast("string")
    pos = F.explode(
        F.array(*[_cms_bucket(c, i, num_bits) for i in range(num_hashes)])
    ).alias("pos")
    return df.select(pos).distinct()


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bits: DataFrame,
    num_hashes: int = 3,
    num_bits: int = 1 << 20,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe a Bloom filter built by bloom_bits: adds boolean ``out_col``
    = true iff ALL ``num_hashes`` positions of the key are set (possible
    member — false positives at the usual Bloom rate, never false
    negatives).

    Plan shape: ``num_hashes`` broadcast-hash left joins against the tiny
    bit table — the 100-TB probe stream is never shuffled, never sorted;
    each row streams through k in-memory hash lookups. This is the
    decontamination shape that replaces a full benchmark<->corpus equi
    join when the benchmark set fits in a broadcast (it always does).
    """
    c = F.col(key_col).cast("string")
    out = df
    hit_cols = []
    for i in range(num_hashes):
        b = F.broadcast(
            bits.select(
                F.col("pos").alias(f"_bp{i}"), F.lit(1).alias(f"_hit{i}")
            )
        )
        out = out.join(b, _cms_bucket(c, i, num_bits) == F.col(f"_bp{i}"), "left")
        hit_cols.append(f"_hit{i}")
    member = F.lit(True)
    for h in hit_cols:
        member = member & F.col(h).isNotNull()
    return out.withColumn(out_col, member).drop(
        *[f"_bp{i}" for i in range(num_hashes)], *hit_cols
    )


def hll_registers(
    df: DataFrame,
    key_col: str = "key",
    p: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007), engine-exact.

    Spark's own approx_count_distinct is an HLL too, but its xxhash64
    seeding is private to the JVM — no oracle can reproduce it. This form
    derives both the register index and the rank from the md5 hex digest
    with only substring / regexp / CASE arithmetic, so any engine with md5
    rebuilds the identical 2^p register vector (the DuckDB twin does).

    Layout: register index = first p bits (p % 4 == 0 so it is whole hex
    nibbles); rank = 1 + number of leading zero bits in the NEXT 60 bits
    (15 hex chars), capped at 61. Leading zeros are counted without any
    hex->int conversion: the run of '0' nibbles via regexp, plus a 16-way
    CASE on the first non-zero nibble — identical string ops both engines.

    Scale shape: one groupBy over at most 2^p register keys with map-side
    combine — the shuffle is O(partitions * 2^p) regardless of input
    cardinality, and registers merge across corpora by element-wise MAX
    (the mergeability that makes HLL the standard distributed sketch).
    Output (register, max_rank) is all-integer, so the driver hash is
    engine-exact; callers apply the harmonic-mean estimate (hll_estimate).
    With group_cols the same sketch is kept per group (shuffle
    O(partitions * groups * 2^p)) — the per-dimension distinct-count
    rollup shape.
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    reg_chars = p // 4
    h = F.md5(F.col(key_col).cast("string"))
    idx = F.conv(F.substring(h, 1, reg_chars), 16, 10).cast("long")
    suffix = F.substring(h, reg_chars + 1, 15)
    lz_nibbles = F.length(F.regexp_extract(suffix, "^(0*)", 1))
    first_nz = suffix.substr(lz_nibbles + 1, F.lit(1))
    nib_lz = (
        F.when(first_nz == "1", 3)
        .when(first_nz.isin("2", "3"), 2)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rank = F.when(lz_nibbles == 15, F.lit(61)).otherwise(
        lz_nibbles * 4 + nib_lz + 1
    )
    keep = [F.col(c) for c in group_cols]
    return (
        df.select(*keep, idx.alias("register"), rank.alias("rank"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").cast("int").alias("max_rank"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> float:
    """Distinct-count estimate from an hll_registers frame (driver-side:
    the frame is at most 2^p rows — sketch-sized by construction).
    Standard HLL bias-corrected harmonic mean with the small-range
    linear-counting correction; relative error ~= 1.04 / sqrt(2^p)."""
    import math

    m = 1 << p
    rows = registers.collect()
    zeros = m - len(rows)
    s = zeros * 1.0 + sum(2.0 ** -r["max_rank"] for r in rows)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hdr_histogram(
    df: DataFrame,
    value_col: str,
    sub_buckets: int = 16,
) -> DataFrame:
    """HDR-histogram bucketing (base-2 octaves x linear sub-buckets) for
    positive integer measurements (latencies in us, byte sizes, token
    counts). Bucket identity is PURE integer arithmetic — octave =
    bit-length of the value (length of its binary string, identical in
    Spark and DuckDB), sub-bucket = linear split of the octave by integer
    division — so the histogram is engine-exact, unlike float-log DDSketch
    buckets where a 1-ulp log() difference flips an edge value.

    Guarantees: any value is recoverable from its bucket with relative
    error <= 1/sub_buckets (bucket width = octave_lo / sub_buckets), and
    histograms merge by summing counts per (octave, sub) — the mergeable
    fixed-size quantile state a 100-TB latency report needs. Shuffle is
    O(partitions * 64 * sub_buckets) after map-side combine.

    Rows with value < 1 are counted separately in the (0, 0) bucket so the
    histogram is total. Emits (octave, sub, lo, cnt): lo = inclusive lower
    bound of the octave (0 for the underflow bucket).
    """
    s = int(sub_buckets)
    v = F.col(value_col).cast("long")
    octave = F.when(v >= 1, F.length(F.bin(v))).otherwise(F.lit(0))
    lo = F.when(v >= 1, F.expr(f"shiftleft(1L, length(bin(cast({value_col} as bigint))) - 1)")).otherwise(F.lit(0))
    # integer division: (v - lo) < lo, so (v - lo) * s < lo * s — no overflow below 2^57
    sub = F.when(v >= 1, F.expr(
        f"((cast({value_col} as bigint) - shiftleft(1L, length(bin(cast({value_col} as bigint))) - 1)) * {s}) "
        f"div shiftleft(1L, length(bin(cast({value_col} as bigint))) - 1)"
    )).otherwise(F.lit(0))
    return (
        df.select(
            octave.cast("int").alias("octave"),
            sub.cast("int").alias("sub"),
            lo.cast("long").alias("lo"),
        )
        .groupBy("octave", "sub", "lo")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hdr_quantiles(hist: DataFrame, qs: list[float], sub_buckets: int = 16) -> dict:
    """Quantile estimates from an hdr_histogram frame (driver-side: the
    frame is at most 64 * sub_buckets rows). Returns {q: estimate} using
    the bucket midpoint; relative error <= 1/(2*sub_buckets) by the
    bucket-width guarantee."""
    s = int(sub_buckets)
    rows = sorted(hist.collect(), key=lambda r: (r["octave"], r["sub"]))
    total = sum(r["cnt"] for r in rows)
    out = {}
    for q in qs:
        target = q * total
        run = 0
        for r in rows:
            run += r["cnt"]
            if run >= target:
                # exact bucket interval: [lo + sub*lo/s, lo + (sub+1)*lo/s)
                width = r["lo"] / s
                out[q] = float(r["lo"] + (r["sub"] + 0.5) * width) if r["lo"] else 0.0
                break
    return out


def hll_alpha_m2_over_2_61(p: int) -> str:
    """The constant alpha_m * m^2 * 2^61 for the exact-rational HLL
    estimate, rendered as a repr'd Python float literal so BOTH engines
    parse the IDENTICAL double (the plan-literal convention)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return repr(alpha * m * m * float(1 << 61))


def hll_sliding_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window_days: int = 7,
    p: int = 8,
) -> DataFrame:
    """Trailing-window distinct-count estimate per day — HLL register
    MERGE as a distributed operator (the mergeability that makes HLL the
    standard sketch, exercised as a sliding rollup: "distinct users in
    the trailing 7 days, every day" over arbitrarily large input with an
    O(days * 2^p) shuffle).

    Mechanics: per (day, register) max rank (hll_registers' md5 layout),
    each contributing row EXPLODES to the <= ``window_days`` output days
    it can serve (a bounded fan-out of sketch rows, never data rows),
    then per (out_day, register) element-wise MAX merges the window's
    sketches. The estimate is ENGINE-EXACT, unlike the driver-side
    hll_estimate: every 2^-rank is the exact integer 2^(61-rank) over
    the common denominator 2^61, so the harmonic-mean denominator
    S = zeros*2^61 + sum 2^(61-r) is an exact decimal(38,0) sum (<= 2^69,
    far inside range), and the release is ONE IEEE division of the
    plan-literal constant alpha*m^2*2^61 by S. The small-range
    linear-counting branch (est <= 2.5m and zeros > 0) is the same
    fixed-operand-order m*ln(m/zeros) on both engines.

    Returns ``DataFrame[day: date, m_set: long, s_exact: decimal,
    est: double]`` — one row per day with at least one event in its
    trailing window.
    """
    day = F.to_date(F.col(ts_col))
    regs = hll_registers(
        df.select(F.col(key_col).alias("key"), day.alias("day")),
        "key", p=p, group_cols=("day",),
    )
    served = regs.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), int(window_days) - 1))
        ).alias("day"),
        "register", "max_rank",
    )
    merged = served.groupBy("day", "register").agg(
        F.max("max_rank").alias("r")
    )
    m = 1 << p
    per_day = merged.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("m_set"),
        # shiftleft keeps 2^(61-r) an exact int64: cast(power(...) as
        # decimal) goes through BigDecimal.valueOf's shortest-string double
        # repr and corrupts 2^60 by +24 (the _r6x lesson, measured)
        F.sum(
            F.expr("cast(shiftleft(cast(1 as bigint), 61 - r) as decimal(38,0))")
        ).alias("s_regs"),
    )
    zeros = (F.lit(m) - F.col("m_set")).cast("decimal(38,0)")
    s_exact = (zeros * F.lit(1 << 61).cast("decimal(38,0)") + F.col("s_regs"))
    lit = hll_alpha_m2_over_2_61(p)
    raw = F.expr(f"cast({lit} as double)") / s_exact.cast("double")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("m_set")).cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("m_set") < m), small
    ).otherwise(raw)
    return per_day.select(
        "day", "m_set",
        s_exact.cast("decimal(38,0)").alias("s_exact"),
        est.alias("est"),
    )

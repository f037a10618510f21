"""PII detection + redaction for training-data pipelines.

Regex-based detectors for the three classic structured-PII shapes — email
addresses, IPv4 addresses, NNN-NNN-NNNN phone numbers — plus a chained
redactor that replaces each with a typed placeholder token.

Pure JVM column expressions (`regexp_extract_all` / `regexp_replace`), so
the operator is embarrassingly parallel: no shuffle, no UDF, scan-speed at
100 TB. The patterns deliberately use only the regex subset on which Java's
engine (Spark) and RE2 (DuckDB, for the oracle) agree — character classes,
bounded repetition, alternation; no backreferences or lookaround.

Reference analog: the validator's field-sanitization pass
(src/validation.rs:156-330) generalized to content scrubbing; the
LLM-pipeline brief's text-analysis requirement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"

# redaction order matters: emails first (their local/domain parts contain
# dots and digits that the other patterns could otherwise nibble at), then
# IPs (dotted digits), then phones (dashed digits).
_REDACTION_CHAIN = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def _c(col) -> F.Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col, pattern: str) -> F.Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), F.lit(0))).cast("long")


def email_count(col) -> F.Column:
    return pii_count(col, EMAIL_RE)


def ipv4_count(col) -> F.Column:
    return pii_count(col, IPV4_RE)


def phone_count(col) -> F.Column:
    return pii_count(col, PHONE_RE)


def redact(col) -> F.Column:
    """Replace every email/IPv4/phone occurrence with its placeholder."""
    out = _c(col)
    for pattern, token in _REDACTION_CHAIN:
        out = F.regexp_replace(out, pattern, token)
    return out


def redaction_fingerprint(col) -> F.Column:
    """md5 of the redacted text — byte-for-byte reproducible by any engine
    applying the same chain, used by the oracle check."""
    return F.md5(redact(col))


def k_anonymize(
    df,
    quasi_cols: list[str],
    k: int = 5,
    sentinel: str = "*",
):
    """k-anonymity suppression over quasi-identifier columns: any
    combination of ``quasi_cols`` values shared by fewer than ``k`` rows
    is replaced by ``sentinel`` in every one of those columns, so no
    released row's quasi-identifier tuple isolates fewer than k
    individuals — the release-gate governance pass that runs after PII
    redaction (redaction removes direct identifiers; this kills rare
    combinations of indirect ones).

    One partial-aggregable count over the quasi tuple + one AQE-decided
    join back on it; the suppression itself is a pure row expression.
    Quasi columns must be strings (cast beforehand); other columns pass
    through untouched.
    """
    from pyspark.sql import functions as F

    counts = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_qn"))
    )
    out = df.join(counts, quasi_cols, "left")
    rare = F.col("_qn") < k
    for c in quasi_cols:
        out = out.withColumn(c, F.when(rare, F.lit(sentinel)).otherwise(F.col(c)))
    return out.drop("_qn")


def l_diversity_audit(
    df,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 3,
):
    """l-diversity audit (Machanavajjhala 2007) — the companion gate to
    k_anonymize: k-anonymity bounds how few rows share a quasi-identifier
    tuple, but a group whose SENSITIVE attribute is constant still leaks
    it (homogeneity attack); distinct l-diversity additionally requires
    >= l distinct sensitive values per group. This emits the per-group
    audit a release pipeline inspects before publishing: group size k,
    distinct-sensitive count l, and the two gate flags.

    Exactness: pure integer counts (count + count distinct) — any engine
    reproduces every row bit-identically.

    Scale shape: ONE two-level aggregation — groupBy(quasi + sensitive)
    collapses duplicates map-side, then groupBy(quasi) counts rows and
    distinct values from the collapsed frame; no sort, no join, no
    Python. Group count is bounded by quasi-tuple cardinality.

    Returns ``DataFrame[*quasi_cols, k_count: long, l_distinct: long,
    meets_k: int, meets_l: int]``.
    """
    from pyspark.sql import functions as F

    pre = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).alias("_n"))
    g = pre.groupBy(*quasi_cols).agg(
        F.sum("_n").cast("long").alias("k_count"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
    )
    return g.select(
        *quasi_cols,
        "k_count",
        "l_distinct",
        (F.col("k_count") >= int(k)).cast("int").alias("meets_k"),
        (F.col("l_distinct") >= int(l)).cast("int").alias("meets_l"),
    )


def t_closeness_audit(
    df,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int = 200_000,
):
    """t-closeness audit (Li 2007) — the third rung of the release-gate
    ladder after k_anonymize and l_diversity_audit: a group can be large
    (k) and diverse (l) yet still leak if its SENSITIVE-value
    distribution deviates sharply from the corpus-wide one (skewness
    attack: "90% of this group is in the rare cohort"). For a
    categorical sensitive attribute the Li-paper ground distance is the
    total-variation distance, so the audit is per equivalence class

        t_ec = TVD(P_ec, P_global) = (1/2) * sum_s | c_s/n_ec - g_s/N |.

    Exact integer form: every cell term is |c_s*N - g_s*n_ec| (exact
    decimal(38,0) / hugeint products), and the sensitive values ABSENT
    from the class contribute the closed-form zero-cell mass
    (N - sum_{s in ec} g_s) * n_ec — the cramers_v trick, so empty cells
    are never materialized. Release is ONE nonnegative trunc division
    t_ppm = (1e6 * sum) div (2 * n_ec * N): bit-identical on any engine.

    Scale shape: one (quasi, sensitive) cell aggregation (map-side
    combinable), a broadcast-able join decorating cells with the global
    per-sensitive counts (bounded by sensitive cardinality), one
    per-class n_ec join back on the quasi tuple (AQE-decided), a 1-row N
    broadcast, ONE final per-class aggregate. Everything is bounded by
    cell counts, never raw rows. No Python stages.

    Returns ``DataFrame[*quasi_cols, k_count: long, tvd_ppm: long,
    meets_t: int]`` (meets_t = tvd_ppm <= t_ppm).
    """
    from pyspark.sql import functions as F

    dec = lambda c: F.col(c).cast("decimal(38,0)")
    cells = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    glob = cells.groupBy("_sv").agg(F.sum("_c").cast("long").alias("_g"))
    per_q = cells.groupBy(*quasi_cols).agg(
        F.sum("_c").cast("long").alias("_nec")
    )
    n_row = glob.agg(F.sum("_g").cast("long").alias("_N"))
    dd = (
        cells.join(F.broadcast(glob), "_sv")
        .join(per_q, quasi_cols)
        .crossJoin(F.broadcast(n_row))
    )
    out = dd.groupBy(*quasi_cols).agg(
        F.max("_nec").alias("_nec"),
        F.max("_N").alias("_N"),
        F.sum(F.abs(dec("_c") * dec("_N") - dec("_g") * dec("_nec")))
        .cast("decimal(38,0)")
        .alias("_present"),
        F.sum("_g").cast("long").alias("_gsum"),
    )
    tvd = F.expr(
        "cast(((_present + (cast(_N as decimal(38,0)) - _gsum) * _nec) * 1000000)"
        " div (2 * cast(_nec as decimal(38,0)) * _N) as bigint)"
    )
    return out.select(
        *quasi_cols,
        F.col("_nec").alias("k_count"),
        tvd.alias("tvd_ppm"),
    ).withColumn("meets_t", (F.col("tvd_ppm") <= int(t_ppm)).cast("int"))

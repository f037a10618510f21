"""Web-corpus URL hygiene: canonicalization and URL-level deduplication.

The first dedup pass of every web-scale crawl pipeline (CommonCrawl /
RefinedWeb / C4 lineage) is URL-level: the same page is fetched many times
under cosmetically different URLs (tracking parameters, host casing,
default ports, trailing slashes, fragments, unordered query strings).
Canonicalizing before the far more expensive content-level MinHash pass
removes the bulk of exact refetches for the cost of a string expression.

Scale design:
* ``canonicalize_url`` is a pure JVM column expression — regex extracts +
  higher-order array functions, zero shuffle, fully pipelined inside
  whole-stage codegen with the scan. At 100 TB it costs nothing beyond the
  read.
* ``url_dedup`` shuffles ONLY ``md5(canonical_url)`` digests + the id
  (two slim columns), never document payloads — the same
  hash-key-projection trick as ``operators.dedup.dedup_exact`` (hash-key
  form). One shuffle, map-side partial aggregation.

Reference analog: the reference deduplicates instrument definition records
by normalized symbol key before feature extraction
(src/ingest/symbology.rs); URLs are the web-corpus equivalent of that
normalize-then-unique key step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# The usual suspects stripped by every crawler's URL normalizer: analytics
# campaign tags and click identifiers that never change page content.
TRACKING_PARAMS = (
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
    "gclid",
    "fbclid",
    "mc_cid",
    "mc_eid",
    "ref",
)


def canonicalize_url(col) -> F.Column:
    """Canonical form of an http(s) URL, as a single JVM expression.

    Steps (each one a documented crawler convention):
      1. drop the fragment (``#...`` never reaches the server);
      2. lowercase the scheme and host;
      3. strip a default port (``:80`` / ``:443``) and a leading ``www.``;
      4. strip trailing slashes from the path (``/page/`` == ``/page``;
         the bare root path collapses to the empty string);
      5. drop tracking query parameters (:data:`TRACKING_PARAMS`) and empty
         params, then sort the survivors so parameter order is irrelevant.

    Scheme differences (http vs https) are preserved — conflating them is
    a policy choice some pipelines make; compose with a ``regexp_replace``
    upstream if wanted.
    """
    c = F.col(col) if isinstance(col, str) else col
    nofrag = F.regexp_replace(F.trim(c), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(nofrag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?]+)", 1))
    host = F.regexp_replace(host, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(nofrag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+(/[^?]*)?", 1)
    path = F.regexp_replace(path, r"/+$", "")
    qs = F.when(
        nofrag.contains("?"),
        nofrag.substr(F.instr(nofrag, "?") + F.lit(1), F.length(nofrag)),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != F.lit(""))
        & ~F.lower(F.split(p, "=").getItem(0)).isin(*TRACKING_PARAMS),
    )
    qjoin = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoin == "", F.lit("")).otherwise(F.concat(F.lit("?"), qjoin)),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-row URL-dedup verdict: each row gets its canonical URL, the
    keeper id for that canonical URL (minimum ``id_col``), and a ``kept``
    flag. Downstream: ``.filter("kept")`` is the dedup, the un-filtered
    frame is the audit trail.

    One shuffle on the canonical-URL md5 digest (slim key, map-side
    combine); payload columns rejoin by ``id_col`` only if the caller asks
    — this function carries nothing but the key and the id.
    """
    canon = df.select(
        F.col(id_col),
        canonicalize_url(url_col).alias("canonical_url"),
    )
    keep = canon.groupBy("canonical_url").agg(F.min(id_col).alias("keep_id"))
    return (
        canon.join(keep, "canonical_url")
        .select(
            id_col,
            "canonical_url",
            "keep_id",
            (F.col(id_col) == F.col("keep_id")).alias("kept"),
        )
    )

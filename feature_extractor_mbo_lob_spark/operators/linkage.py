"""Fellegi-Sunter probabilistic record linkage, blocked and integer-exact.

The classic linkage pipeline (Fellegi & Sunter 1969; the engine behind
Splink and most MDM dedup): candidate pairs are generated ONLY inside
blocks (an equi-join on a cheap quasi-identifier key — never a
cartesian product), each pair gets a comparison vector gamma over the
match fields, and the pair's evidence is the sum of per-field
log-likelihood weights: agreement on field i contributes
log2(m_i/u_i), disagreement log2((1-m_i)/(1-u_i)). Pairs above the
upper threshold are links, between thresholds clerical-review
candidates, below non-links.

Determinism/exactness: weights are fixed integer NANOS (log-odds *
1e9 precomputed as plain Python ints), so a pair's score is a bigint
sum — bit-identical in any engine, no float accumulation anywhere.

Scale shape: one shuffled equi-join on the block key (map-side pruned
both sides), per-pair scoring is a row-local projection, and the
output is filtered by the lower threshold before it ever shuffles
again. Cost is sum over blocks of |A_block|*|B_block| — the operator
is exactly as good as its blocking key, which is why the key is a
caller decision. A hot block (shared surname at 100 TB) is the skew
case: cap it or sub-block, same discipline as dedup.py's
max_doc_freq hot-shingle cap.

Reference parity: the reference has no linkage engine; this extends
the dedup family (operators/dedup.py candidate-pair discipline) with
scored fuzzy identity resolution, which any 100-TB entity-joined
corpus build needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldWeight:
    """One comparison field: equality of a_col vs b_col contributes
    w_agree nanos to the pair score, inequality w_disagree (negative).
    NULL on either side counts as disagreement (conservative)."""

    name: str
    a_col: str
    b_col: str
    w_agree_nanos: int
    w_disagree_nanos: int


def fellegi_sunter(
    a: DataFrame,
    b: DataFrame,
    block_a: str,
    block_b: str,
    fields: list[FieldWeight],
    t_link_nanos: int,
    t_possible_nanos: int,
) -> DataFrame:
    """Blocked pairwise linkage scores. Returns all candidate pairs at or
    above t_possible with columns of both inputs plus score_nanos
    (bigint) and decision ('link' | 'possible'). Non-links are dropped
    before any further shuffle. Column names must be disjoint between a
    and b except nothing is required of the block columns (joined via an
    explicit equality condition and both retained)."""
    pairs = a.join(b, F.col(block_a) == F.col(block_b))
    score = None
    for f in fields:
        eq = F.col(f.a_col).eqNullSafe(F.col(f.b_col)) & F.col(f.a_col).isNotNull()
        term = F.when(eq, F.lit(f.w_agree_nanos)).otherwise(
            F.lit(f.w_disagree_nanos)
        )
        score = term if score is None else score + term
    out = pairs.withColumn("score_nanos", score.cast("long"))
    return out.filter(F.col("score_nanos") >= F.lit(int(t_possible_nanos))).withColumn(
        "decision",
        F.when(F.col("score_nanos") >= F.lit(int(t_link_nanos)), F.lit("link"))
        .otherwise(F.lit("possible")),
    )

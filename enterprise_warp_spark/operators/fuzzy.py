"""Fuzzy string matching: edit-distance threshold joins for entity
resolution / record linkage.

The classic dedup-adjacent problem the text pipeline doesn't cover:
"which names/titles/addresses are within k edits of each other" across
two tables. Brute force is |L| x |R| Levenshtein — this operator blocks
with the standard q-gram COUNT FILTER instead: two strings within edit
distance k share at least max(|s1|, |s2|) - q + 1 - k*q q-grams counted
as a MULTISET (each edit destroys at most q grams), and their lengths
differ by at most k.

Three disjoint, complete candidate passes (let C = q * (1 + k)):

  A  both lengths >= C         q-gram count filter (the main path)
  B  min < C, max > k          1-gram count filter (each edit destroys at
                               most ONE character, so shared unigram mass
                               >= max_len - k > 0 — a real filter for
                               every pair this pass owns)
  C  both lengths <= k         length-bucket product over the <= k-char
                               strings only — the single genuinely
                               unfilterable class ("ab" vs "cd" at k=2
                               shares nothing yet matches), and the only
                               quadratic population; it is tiny because
                               its members are at most max_dist chars

Plan shape (the LSH discipline): per-row gram counts -> equi-join on the
gram -> shared mass = sum of per-gram minima -> count + length filters ->
Spark's banded levenshtein(l, r, threshold) only on survivors. Wide
payloads never ride the gram shuffles: rows get internal surrogate ids
(materialized once), the candidate passes move only (id, text, len), and
payloads join back at the end — which also makes duplicate input rows
keep their multiplicity identically in every pass.

Gram-frequency skew: stop-grams ('er', 'an') make the gram join hot-keyed
on name-like data; AQE's skew-join split handles moderate skew, and
`operators/skew.salted_join` is the documented escalation for extreme
corpora (same trade-off as the LSH band join in pipeline/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(col: str, q: int):
    return F.expr(
        f"CASE WHEN length(`{col}`) >= {q} THEN "
        f"transform(sequence(1, length(`{col}`) - {q} + 1), "
        f"i -> substring(`{col}`, i, {q})) "
        "ELSE cast(array() as array<string>) END"
    )


def _gram_pass(l_slim, r_slim, q: int, max_dist: int):
    """Candidate (id_l, id_r) pairs passing the q-gram multiset count
    filter + length filter. Slim frames carry (__id, __t, __len) only."""
    def counts(df, side):
        return (
            df.withColumn("__g", F.explode(_grams("__t", q)))
            .groupBy(
                F.col("__id").alias(f"__id_{side}"),
                F.col("__t").alias(f"__t_{side}"),
                F.col("__len").alias(f"__len_{side}"),
                "__g",
            )
            .agg(F.count(F.lit(1)).alias(f"__c_{side}"))
        )

    lg, rg = counts(l_slim, "l"), counts(r_slim, "r")
    shared = (
        lg.join(rg, "__g")
        .withColumn("__m", F.least("__c_l", "__c_r"))
        .groupBy("__id_l", "__t_l", "__len_l", "__id_r", "__t_r", "__len_r")
        .agg(F.sum("__m").alias("__shared"))
    )
    need = (
        F.greatest("__len_l", "__len_r") - F.lit(q - 1) - F.lit(max_dist * q)
    )
    return shared.filter(
        (F.abs(F.col("__len_l") - F.col("__len_r")) <= max_dist)
        & (F.col("__shared") >= need)
    ).select("__id_l", "__t_l", "__id_r", "__t_r")


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    max_dist: int = 2,
    q: int = 2,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) row pairs whose `text_col` values are within
    `max_dist` Levenshtein edits, with a `distance` column. NULL strings
    never match; duplicate input rows keep their multiplicity on both
    sides. Columns from each side get the respective suffix."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    cutoff = q * (1 + max_dist)

    def prep(df, suffix):
        out = df.select(
            [F.col(c).alias(f"{c}{suffix}") for c in df.columns]
        ).filter(F.col(f"{text_col}{suffix}").isNotNull())
        # surrogate id, MATERIALIZED so retries cannot reassign it; the
        # gram shuffles then move only (id, text, len), and payloads join
        # back at the end
        return out.withColumn(
            "__id", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)

    l_full, r_full = prep(left, suffixes[0]), prep(right, suffixes[1])
    tl, tr = f"{text_col}{suffixes[0]}", f"{text_col}{suffixes[1]}"

    def slim(df, t):
        return df.select(
            "__id", F.col(t).alias("__t"), F.length(t).alias("__len")
        )

    l_s, r_s = slim(l_full, tl), slim(r_full, tr)

    # pass A: both long -> q-gram filter
    pairs_a = _gram_pass(
        l_s.filter(F.col("__len") >= cutoff),
        r_s.filter(F.col("__len") >= cutoff),
        q,
        max_dist,
    )
    # pass B: at least one short (but not both trivial) -> 1-gram filter;
    # population bounded to lengths < cutoff + max_dist (a longer partner
    # cannot be within max_dist of a short string). The min(<cutoff) and
    # max(>k) pair filters keep A/B/C disjoint.
    b_pop_l = l_s.filter(F.col("__len") < cutoff + max_dist)
    b_pop_r = r_s.filter(F.col("__len") < cutoff + max_dist)
    pairs_b = _gram_pass(b_pop_l, b_pop_r, 1, max_dist).filter(
        (F.least(F.length("__t_l"), F.length("__t_r")) < cutoff)
        & (F.greatest(F.length("__t_l"), F.length("__t_r")) > max_dist)
    )
    # pass C: both at most max_dist chars — the only unfilterable class;
    # its members are <= max_dist characters long, so the product is tiny
    pairs_c = (
        l_s.filter(F.col("__len") <= max_dist)
        .select(
            F.col("__id").alias("__id_l"), F.col("__t").alias("__t_l")
        )
        .crossJoin(
            r_s.filter(F.col("__len") <= max_dist).select(
                F.col("__id").alias("__id_r"), F.col("__t").alias("__t_r")
            )
        )
    )

    candidates = pairs_a.unionByName(pairs_b).unionByName(pairs_c)
    # banded verify: levenshtein(l, r, threshold) early-exits past the
    # band and returns -1 when the distance exceeds it
    verified = candidates.withColumn(
        "distance", F.levenshtein(F.col("__t_l"), F.col("__t_r"), max_dist)
    ).filter(F.col("distance") >= 0).select("__id_l", "__id_r", "distance")

    out = (
        verified.join(
            l_full.withColumnRenamed("__id", "__id_l"), "__id_l"
        ).join(r_full.withColumnRenamed("__id", "__id_r"), "__id_r")
    )
    return out.drop("__id_l", "__id_r")

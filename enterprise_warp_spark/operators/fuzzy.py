"""Fuzzy string matching: edit-distance threshold joins for entity
resolution / record linkage.

The classic dedup-adjacent problem the text pipeline doesn't cover:
"which names/titles/addresses are within k edits of each other" across
two tables. Brute force is |L| x |R| Levenshtein — the operator here uses
the standard q-gram COUNT FILTER as a blocking key instead:

  two strings within edit distance k share at least
      max(|s1|, |s2|) - q + 1 - k * q
  positional-agnostic q-grams (each edit destroys at most q grams), plus
  their lengths differ by at most k.

Plan shape (the LSH discipline): explode each side's q-grams, equi-join
on the gram, count shared grams per candidate pair, apply the count and
length filters, THEN run Spark's built-in levenshtein() only on the
survivors. Candidates are bounded by gram co-occurrence, never |L| x |R|.
Short strings (fewer than the required shared grams, e.g. length < q)
can never pass the gram filter, so they are routed through a small
length-bucketed candidate path instead: strings shorter than
q + k compare against everything within k length — a tiny slice by
construction, joined on the length bucket."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(col: str, q: int):
    return F.expr(
        f"CASE WHEN length({col}) >= {q} THEN "
        f"transform(sequence(1, length({col}) - {q} + 1), "
        f"i -> substring({col}, i, {q})) "
        "ELSE cast(array() as array<string>) END"
    )


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
    never match."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")

    def prep(df, suffix):
        out = df.select([F.col(c).alias(f"{c}{suffix}") for c in df.columns])
        t = f"{text_col}{suffix}"
        return out.filter(F.col(t).isNotNull()).withColumn(
            f"__len{suffix}", F.length(t)
        )

    l_p, r_p = prep(left, suffixes[0]), prep(right, suffixes[1])
    tl, tr = f"{text_col}{suffixes[0]}", f"{text_col}{suffixes[1]}"
    ll, lr = f"__len{suffixes[0]}", f"__len{suffixes[1]}"
    len_ok = F.abs(F.col(ll) - F.col(lr)) <= max_dist
    verify = F.levenshtein(F.col(tl), F.col(tr))

    # long-string path: q-gram count filtering. The bound counts MULTISET
    # gram overlap, so per-row gram counts are computed first (a distinct
    # join would under-count strings with repeated grams, e.g. 'aaaaaa' vs
    # 'aaaaab', and silently drop true pairs) and the pair's shared mass
    # is sum(min(count_l, count_r)). Rows are matched BY VALUE: give rows
    # a unique id column if duplicate rows must stay distinguishable.
    short_cut = q + max_dist * q  # strings below this can't satisfy the filter
    l_long = l_p.filter(F.col(ll) >= short_cut)
    r_long = r_p.filter(F.col(lr) >= short_cut)

    def gram_counts(df, t, cname):
        return (
            df.withColumn("__g", F.explode(_grams(t, q)))
            .groupBy(*df.columns, "__g")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    lg = gram_counts(l_long, tl, "__cl")
    rg = gram_counts(r_long, tr, "__cr")
    pair_cols = [c for c in lg.columns if c not in ("__g", "__cl")] + [
        c for c in rg.columns if c not in lg.columns and c not in ("__g", "__cr")
    ]
    shared = (
        lg.join(rg, "__g")
        .withColumn("__m", F.least(F.col("__cl"), F.col("__cr")))
        .groupBy(*pair_cols)
        .agg(F.sum("__m").alias("__shared"))
    )
    need = (
        F.greatest(F.col(ll), F.col(lr)) - F.lit(q - 1) - F.lit(max_dist * q)
    )
    long_pairs = (
        shared.filter(len_ok & (F.col("__shared") >= need))
        .withColumn("distance", verify)
        .filter(F.col("distance") <= max_dist)
        .drop("__shared")
    )

    # short-string path: too short for the gram filter — join on a length
    # bucket (each left bucket probes the <= 2k+1 right buckets within k);
    # the population with length < q + k*q is tiny by construction
    l_short = l_p.filter(F.col(ll) < short_cut)
    r_short = r_p.filter(F.col(lr) < short_cut)
    l_b = l_short.withColumn(
        "__b", F.explode(F.sequence(F.col(ll) - max_dist, F.col(ll) + max_dist))
    )
    r_b = r_short.withColumn("__b", F.col(lr))
    short_pairs = (
        l_b.join(r_b, "__b")
        .drop("__b")
        .withColumn("distance", verify)
        .filter(F.col("distance") <= max_dist)
    )
    # cross-population pairs (one side long, one short): feasible only when
    # the long string's length is within max_dist of the cutoff (lengths
    # may differ by at most max_dist). Bridge exactly that edge slice
    # through the short path's length buckets, in both directions.
    r_edge = r_p.filter(
        (F.col(lr) >= short_cut) & (F.col(lr) < short_cut + max_dist)
    ).withColumn("__b", F.col(lr))
    l_edge = l_p.filter(
        (F.col(ll) >= short_cut) & (F.col(ll) < short_cut + max_dist)
    ).withColumn(
        "__b", F.explode(F.sequence(F.col(ll) - max_dist, F.col(ll) + max_dist))
    )
    bridge = (
        l_b.join(r_edge, "__b")
        .drop("__b")
        .unionByName(l_edge.join(r_b, "__b").drop("__b"))
        .withColumn("distance", verify)
        .filter(F.col("distance") <= max_dist)
    )
    return (
        long_pairs.unionByName(short_pairs)
        .unionByName(bridge)
        .drop(ll, lr)
    )

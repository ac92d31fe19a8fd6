"""Fuzzy string matching: edit-distance threshold joins for entity
resolution / record linkage.

The classic dedup-adjacent problem the text pipeline doesn't cover:
"which names/titles/addresses are within k edits of each other" across
two tables. Brute force is |L| x |R| Levenshtein — this operator blocks
with RAREST-GRAM PREFIX FILTERING (the Ed-Join family, Xiao et al.,
PVLDB 2008 — a public algorithm): each of the k edits destroys at most
q of a string's q-gram occurrences, so for any q*k+1 chosen occurrences
of the left string, at least one gram VALUE must also occur in any right
string within distance k. Choosing the q*k+1 occurrences whose gram
values are GLOBALLY RAREST on the right side minimizes the join fan-out.
Lengths must additionally differ by at most k.

Three disjoint, complete candidate passes (let C = q * (1 + k)):

  A  both lengths >= C         q-gram prefix filter (the main path;
                               len >= C gives len - q + 1 >= q*k + 1
                               occurrences — exactly enough)
  B  min < C, max > k          1-gram prefix filter (len > k gives
                               len >= k + 1 unigram occurrences — again
                               exactly enough)
  C  both lengths <= k         length-bucket product over the <= k-char
                               strings only — the single genuinely
                               unfilterable class ("ab" vs "cd" at k=2
                               shares nothing yet matches), and the only
                               quadratic population; it is tiny because
                               its members are at most max_dist chars

Plan shape (the LSH discipline): one linear gram pass builds the
right-side gram document frequencies; the left side keeps only its
q*k+1 rarest gram occurrences (per-row window over its own handful of
grams); the candidate join is equi on the gram; survivors go through
Spark's banded levenshtein(l, r, threshold). Wide payloads never ride
the gram shuffles: rows get internal surrogate ids (materialized once),
the candidate passes move only (id, text, len), and payloads join back
at the end — which also makes duplicate input rows keep their
multiplicity identically in every pass.

Why prefix, not the q-gram COUNT filter (the r5 design): the count
filter joins on EVERY shared gram, which is quadratic on common-prefix
corpora ('Customer#000...', URLs, file paths) where one hot gram bucket
holds most of both sides — measured 106 s at sf0.1 on customer names.
The rarest-gram prefix never joins through hot grams (a hot gram is by
definition not among a row's rarest), so shared boilerplate costs
nothing; corpora where the blowup is the OUTPUT itself (near-duplicate
strings everywhere) are quadratic for any algorithm.
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
    """Candidate (id_l, id_r) pairs passing the rarest-gram prefix filter
    + position filter + length filter. Slim frames carry (__id, __t,
    __len) only.

    Correctness: every row this pass owns has at least q*max_dist + 1
    gram occurrences (pass A: len >= q*(1+k); pass B: q=1, len > k), and
    max_dist edits destroy at most q*max_dist occurrences — so for ANY
    q*max_dist + 1 chosen occurrences, a true match must contain at least
    one chosen gram OCCURRENCE whose position differs by at most max_dist
    (Ed-Join's location-based filter: an unedited region's offset shifts
    by at most one position per edit). The choice is free;
    rarest-on-the-right minimizes sum_g |Lprefix_g| * |R_g|.

    Plan shape: joining on (gram, position-probe) instead of gram value
    alone keeps the join equi while shrinking buckets by the positional
    factor — decisive on corpora where strings share an alphabet but
    differ positionally (serial numbers, zero-padded keys: measured 10x
    fewer candidates on 'Customer#0...' names). The left prefix explodes
    2*max_dist + 1 probe positions per chosen occurrence; the right side
    keeps its true occurrence positions."""
    from pyspark.sql import Window

    k = q * max_dist + 1
    rg = (
        r_slim.select(
            F.col("__id").alias("__id_r"),
            F.col("__t").alias("__t_r"),
            F.col("__len").alias("__len_r"),
            F.posexplode(_grams("__t", q)).alias("__pr", "__g"),
        )
    )
    # right-side document frequency per gram VALUE (one linear hash agg
    # over per-row distinct values — rarity ranks value buckets, the same
    # quantity the probe fan-out sums over)
    freq = (
        rg.dropDuplicates(["__id_r", "__g"])
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    lg = (
        l_slim.select(
            F.col("__id").alias("__id_l"),
            F.col("__t").alias("__t_l"),
            F.col("__len").alias("__len_l"),
            F.posexplode(_grams("__t", q)).alias("__p", "__g"),
        )
        # left join: a gram absent from the right side has df 0 — the very
        # rarest, and its join bucket is empty (free)
        .join(freq, "__g", "left")
        .withColumn("__df", F.coalesce("__df", F.lit(0)))
    )
    w = Window.partitionBy("__id_l").orderBy(
        F.asc("__df"), F.asc("__g"), F.asc("__p")
    )
    prefix = (
        lg.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        # positional probe: a matching occurrence on the right can sit at
        # most max_dist positions away from this occurrence
        .withColumn(
            "__pr",
            F.explode(
                F.sequence(
                    F.greatest(F.col("__p") - max_dist, F.lit(0)),
                    F.col("__p") + max_dist,
                )
            ),
        )
        .select("__id_l", "__t_l", "__len_l", "__g", "__pr")
    )
    return (
        prefix.join(rg, ["__g", "__pr"])
        .filter(F.abs(F.col("__len_l") - F.col("__len_r")) <= max_dist)
        .select("__id_l", "__t_l", "__id_r", "__t_r")
        .dropDuplicates(["__id_l", "__id_r"])
    )


# pass C is the provably-unfilterable class (every pair of <= max_dist-char
# strings is within threshold by construction, so its OUTPUT is the full
# product); a corpus with millions of 1-2-char rows would materialize it
# silently — fail loudly past this bound instead (MAX_GWB_DIM contract)
MAX_SHORT_PRODUCT = 25_000_000


def _deletion_run_starts(col: str):
    """0-based positions i where an equal-character run starts (i = 0 or
    s[i] != s[i-1]) — computed ONCE per row as its own column: higher-order
    functions get no codegen subexpression elimination, so inlining this
    into the variant transform would re-evaluate the filter per reference
    (SQL substring is 1-based: s[i] = substring(s, i+1, 1))."""
    c = f"`{col}`"
    return F.expr(
        f"filter(sequence(0, length({c}) - 1), "
        f"i -> i = 0 OR substring({c}, i + 1, 1) <> substring({c}, i, 1))"
    )


def _deletion_variants(col: str, starts_col: str):
    """The FastSS k=1 deletion neighborhood of a string, WITH deletion
    positions: array<struct<v, p0, p1>> = the string itself as
    (s, -1, -1) plus one entry per DISTINCT single-character deletion.
    Deleting any copy of a repeated character yields the same variant, and
    del_i(s) == del_j(s) exactly when s[i..j] is one equal-character run —
    so each distinct variant's deletion positions form a contiguous run,
    carried as [p0, p1] (0-based, inclusive). `starts_col` must hold
    _deletion_run_starts(col)."""
    c, st = f"`{col}`", f"`{starts_col}`"
    return F.expr(
        f"CASE WHEN length({c}) = 0 THEN "
        f"array(named_struct('v', {c}, 'p0', -1, 'p1', -1)) "
        f"ELSE concat(array(named_struct('v', {c}, 'p0', -1, 'p1', -1)), "
        f"transform({st}, (p, k) -> named_struct("
        f"'v', concat(substring({c}, 1, p), "
        f"substring({c}, p + 2, length({c}))), "
        f"'p0', p, "
        f"'p1', if(k + 1 < size({st}), "
        f"element_at({st}, k + 2) - 1, length({c}) - 1)))) END"
    )


def _deletion_pass(l_slim, r_slim):
    """Candidate (id_l, id_r) pairs for max_dist == 1 via deletion
    neighborhoods (FastSS, Bocek et al. 2007; SymSpell's index): lev(s, t)
    <= 1  =>  D(s) and D(t) intersect, where D(s) = {s} + single-char
    deletions of s. ONE equi-join on the variant string — complete for
    EVERY length class (the <= k short-string product pass included:
    1-char strings all share the '' variant).

    Position filter (FastSS stores deletion positions for exactly this):
    a shared variant only WITNESSES distance <= 1 when the deletion
    positions agree — substitution at p means del_p(s) == del_p(t) (runs
    overlap at p), and insertion/deletion/equality mean one side is the
    un-deleted string itself (p0 = -1). Two variant-variant hits at
    DISJOINT runs are a delete-at-i + insert-at-j pair, i.e. distance 2
    ('ab' vs 'ba' share {'a','b'} but never at one position). The filter
    runs map-side BEFORE the pair dedup, so the dedup exchange and the
    levenshtein verify see only true-match witnesses — on zero-padded
    serial-number corpora the unfiltered D-intersection is ~100x the true
    pair set (measured at sf1: 10.6M raw hits -> 9.4M distinct candidate
    pairs for ~90k true pairs; the filter removes the 9s dedup exchange
    and the wasted verify work), while completeness is untouched.

    Plan shape: |rows| x (runs + 1) variant rows per side, one equi-join
    on the variant key (the smaller side broadcasts). Bucket sizes are
    immune to the gram-selectivity collapse on zero-padded /
    serial-number corpora where every q-gram bucket is huge (measured:
    1.4M gram candidates -> ~60k deletion candidates on 15k
    'Customer#0...' names)."""

    def vs(df, out_id, out_t, psuf):
        return df.withColumn(
            "__st", _deletion_run_starts("__t")
        ).select(
            F.col("__id").alias(out_id),
            F.col("__t").alias(out_t),
            F.explode(_deletion_variants("__t", "__st")).alias("__dv"),
        ).select(
            out_id,
            out_t,
            F.col("__dv.v").alias("__v"),
            F.col("__dv.p0").alias(f"__p0{psuf}"),
            F.col("__dv.p1").alias(f"__p1{psuf}"),
        )

    overlap = (F.col("__p0_l") <= F.col("__p1_r")) & (
        F.col("__p0_r") <= F.col("__p1_l")
    )
    return (
        vs(l_slim, "__id_l", "__t_l", "_l")
        .join(vs(r_slim, "__id_r", "__t_r", "_r"), "__v")
        .filter(
            (F.col("__p0_l") == -1) | (F.col("__p0_r") == -1) | overlap
        )
        .select("__id_l", "__t_l", "__id_r", "__t_r")
        .dropDuplicates(["__id_l", "__id_r"])
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
    empty_pairs = l_s.sparkSession.createDataFrame(
        [], "__id_l long, __t_l string, __id_r long, __t_r string"
    )

    if max_dist <= 1:
        # k=0: exact-match equi-join on the string itself; k=1: ONE
        # deletion-neighborhood equi-join (complete for all length
        # classes — replaces passes A/B/C below and is immune to the
        # gram-selectivity collapse on serial-number-like corpora)
        if max_dist == 0:
            candidates = (
                l_s.select(
                    F.col("__id").alias("__id_l"), F.col("__t").alias("__t_l")
                ).join(
                    r_s.select(
                        F.col("__id").alias("__id_r"),
                        F.col("__t").alias("__t_r"),
                    ),
                    F.col("__t_l") == F.col("__t_r"),
                )
            )
        else:
            candidates = _deletion_pass(l_s, r_s)
        return _verify_and_restore(candidates, l_full, r_full, max_dist)

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
    # max(>k) pair filters keep A/B/C disjoint. Most corpora (names,
    # titles, URLs) have NO short strings at all — the population counts
    # are nearly free on the localCheckpoint-materialized slims, and
    # skipping the pass drops its ~6-stage pipeline from the plan.
    b_pop_l = l_s.filter(F.col("__len") < cutoff + max_dist)
    b_pop_r = r_s.filter(F.col("__len") < cutoff + max_dist)
    if b_pop_l.count() == 0 or b_pop_r.count() == 0:
        pairs_b = empty_pairs
    else:
        pairs_b = _gram_pass(b_pop_l, b_pop_r, 1, max_dist).filter(
            (F.least(F.length("__t_l"), F.length("__t_r")) < cutoff)
            & (F.greatest(F.length("__t_l"), F.length("__t_r")) > max_dist)
        )
    # pass C: both at most max_dist chars — the only unfilterable class;
    # its members are <= max_dist characters long, so the product is
    # normally tiny. Its output IS the product (every such pair matches),
    # so no algorithm avoids the cost — guard it instead of materializing
    # a silent quadratic blowup on degenerate corpora. The two counts are
    # cheap: the slim frames are already localCheckpoint-materialized.
    c_l = l_s.filter(F.col("__len") <= max_dist)
    c_r = r_s.filter(F.col("__len") <= max_dist)
    n_cl, n_cr = c_l.count(), c_r.count()
    if n_cl * n_cr > MAX_SHORT_PRODUCT:
        raise ValueError(
            f"edit_distance_join: {n_cl} x {n_cr} strings of <= {max_dist} "
            "chars — every such pair is within threshold, so the output "
            f"alone exceeds MAX_SHORT_PRODUCT={MAX_SHORT_PRODUCT}. "
            "Pre-filter trivial strings (or dedupe them to distinct values "
            "and rejoin counts) before the fuzzy join."
        )
    if n_cl == 0 or n_cr == 0:
        pairs_c = empty_pairs
    else:
        pairs_c = (
            c_l.select(
                F.col("__id").alias("__id_l"), F.col("__t").alias("__t_l")
            )
            .crossJoin(
                c_r.select(
                    F.col("__id").alias("__id_r"), F.col("__t").alias("__t_r")
                )
            )
        )

    candidates = pairs_a.unionByName(pairs_b).unionByName(pairs_c)
    return _verify_and_restore(candidates, l_full, r_full, max_dist)


def _verify_and_restore(candidates, l_full, r_full, max_dist: int):
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

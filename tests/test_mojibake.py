"""Mojibake detection + repair (pipeline/text.py mojibake_score /
fix_mojibake): the conservative ftfy core. Round-trip truths are built by
ACTUALLY mis-decoding UTF-8 through latin-1/cp1252 — the repair must
invert the real corruption, and must never touch legitimate text."""

import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.pipeline.text import fix_mojibake, mojibake_score

CLEAN = [
    "hello plain ascii",
    "é",                      # lone accent: no lead/continuation pair
    "naïve café résumé",      # legit precomposed accents
    "日本語のテキスト",          # CJK
    "price: €50 – done",      # legit cp1252-printables w/o mojibake leads
    "",
]

ORIGINALS = [
    "élan vital — déjà vu",
    "don’t “quote” me…",
    "Müller, façade, piñata",
    "𝄞 music and 中文 mixed",
]


def _wreck(s: str, codec: str) -> str:
    return s.encode("utf-8").decode(codec)


def test_detector_fires_only_on_mojibake(spark):
    wrecked = [_wreck(s, "latin-1") for s in ORIGINALS[:3]] + [
        _wreck("don’t", "cp1252")
    ]
    df = spark.createDataFrame(
        [(t,) for t in CLEAN + wrecked], ["text"]
    ).withColumn("score", mojibake_score("text"))
    rows = {r["text"]: r["score"] for r in df.collect()}
    for t in CLEAN:
        assert rows[t] == 0, (t, rows[t])
    for t in wrecked:
        assert rows[t] > 0, t


@pytest.mark.parametrize("codec", ["latin-1", "cp1252"])
def test_repair_inverts_real_misdecodes(spark, codec):
    originals = [
        s for s in ORIGINALS
        # cp1252 can't represent every char of every original; only wreck
        # what the codec can actually round-trip
        if all(c.encode("utf-8").decode(codec, "ignore") for c in s)
        and _wreck_ok(s, codec)
    ]
    wrecked = [_wreck(s, codec) for s in originals]
    df = spark.createDataFrame([(t,) for t in wrecked], ["text"])
    got = [r["text"] for r in fix_mojibake(df).orderBy(F.lit(1)).collect()]
    assert sorted(got) == sorted(originals)
    flags = [r["mojibake_fixed"] for r in fix_mojibake(df).collect()]
    assert all(flags)


def _wreck_ok(s: str, codec: str) -> bool:
    try:
        s.encode("utf-8").decode(codec)
        return True
    except UnicodeDecodeError:
        return False


def test_clean_text_is_never_touched(spark):
    df = spark.createDataFrame([(t,) for t in CLEAN if t], ["text"])
    out = fix_mojibake(df).collect()
    assert {r["text"] for r in out} == {t for t in CLEAN if t}
    assert not any(r["mojibake_fixed"] for r in out)


def test_double_encoded_repairs_in_two_passes(spark):
    twice = _wreck(_wreck("déjà vu – over", "latin-1"), "latin-1")
    df = spark.createDataFrame([(twice,)], ["text"])
    one = fix_mojibake(df, max_passes=1).collect()[0]
    two = fix_mojibake(df, max_passes=2).collect()[0]
    assert one["text"] == _wreck("déjà vu – over", "latin-1")
    assert two["text"] == "déjà vu – over"
    assert one["mojibake_fixed"] and two["mojibake_fixed"]


def test_nulls_and_out_col(spark):
    df = spark.createDataFrame(
        [(1, None), (2, _wreck("été", "latin-1"))], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in fix_mojibake(df, out_col="fixed").collect()}
    assert out[1]["fixed"] is None and out[1]["mojibake_fixed"] is False
    assert out[2]["fixed"] == "été" and out[2]["text"] != "été"


def test_detector_is_pure_catalyst(spark):
    """mojibake_score must stay a codegen expression (no Python eval) so
    candidate selection is free at scale."""
    df = spark.createDataFrame([("x",)], ["text"]).select(
        mojibake_score("text").alias("s")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_agrees_with_gate_contract_on_shared_domain(spark):
    """On single-encoded, cp1252-representable wrecks, fix_mojibake and
    the frozen oracle-gated weburl.repair_mojibake produce identical
    repairs (fix_mojibake strictly generalizes; it never diverges inside
    the old contract's domain)."""
    from enterprise_warp_spark.pipeline.weburl import repair_mojibake

    # note: '”' (U+201D) is excluded — its UTF-8 bytes contain 0x9D,
    # which cp1252 cannot decode, so that wreck cannot exist via cp1252
    wrecked = [
        _wreck(s, "cp1252")
        for s in ["élan vital", "don’t quote me…", "Müller façade"]
    ] + [t for t in CLEAN if t]
    df = spark.createDataFrame([(t,) for t in wrecked], ["text"])
    new = {r["text"]: r["mojibake_fixed"] for r in fix_mojibake(df).collect()}
    old = {
        r["text"]: r["mojibake_fixed"] for r in repair_mojibake(df).collect()
    }
    assert new == old


def test_curation_fix_encoding_stage(spark):
    """CurationConfig(fix_encoding=True): a wrecked duplicate of a clean
    document repairs BEFORE dedup keys are built, so the pair collapses
    into one exact-dup family instead of surviving as two documents."""
    from enterprise_warp_spark.pipeline.curate import (
        CurationConfig,
        curate_corpus,
    )

    base = "the quick brown fox and the lazy dog of the east " * 4
    accented = base + "résumé déjà vu"
    rows = [
        (1, "src", "en", accented, len(accented)),
        (2, "src", "en", _wreck(accented, "latin-1"), 0),
        (3, "src", "en", base + "a different unique ending here", 0),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, source string, lang string, text string, n_chars long",
    )
    cfg_off = CurationConfig(min_tokens=5)
    cfg_on = CurationConfig(min_tokens=5, fix_encoding=True)
    kept_off = {r["doc_id"] for r in curate_corpus(docs, cfg_off)["kept"].collect()}
    out_on = curate_corpus(docs, cfg_on)
    kept_on = {r["doc_id"] for r in out_on["kept"].collect()}
    # without repair the wreck survives as a distinct doc; with repair it
    # becomes an exact duplicate of doc 1 and dedup keeps one of the pair
    assert {1, 2} <= kept_off
    assert len(kept_on & {1, 2}) == 1 and 3 in kept_on
    assert {r["doc_id"] for r in out_on["encoding_fixed"].collect()} == {2}


def test_property_repair_inverts_any_cleanly_wreckable_text(spark):
    """Hypothesis property: for ANY text whose UTF-8 bytes survive a
    latin-1 read (always true) the repair inverts the wreck, and for any
    text at all the repair never corrupts the clean spelling."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(
        list("abc défgèh ñüß中文🎵'’“.,!- ")
    )

    def ambiguous(t):
        # a text that ITSELF round-trips as valid UTF-8 through a legacy
        # codec is indistinguishable from mojibake of some other string —
        # the inherent ftfy ambiguity; the inversion guarantee excludes it
        for codec in ("cp1252", "latin-1"):
            try:
                raw = t.encode(codec)
            except UnicodeEncodeError:
                continue
            try:
                raw.decode("utf-8")
                return True
            except UnicodeDecodeError:
                pass
        return False

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(st.text(alphabet, min_size=1, max_size=40),
                    min_size=1, max_size=6))
    def prop(texts):
        texts = [t for t in texts if not ambiguous(t)]
        if not texts:
            return
        wrecked = [t.encode("utf-8").decode("latin-1") for t in texts]
        df = spark.createDataFrame([(t,) for t in wrecked], ["text"])
        got = sorted(r["text"] for r in fix_mojibake(df).collect())
        # a pure-ASCII text wrecks to itself and is correctly untouched
        assert got == sorted(texts)
        clean_df = spark.createDataFrame([(t,) for t in texts], ["text"])
        untouched = sorted(r["text"] for r in fix_mojibake(clean_df).collect())
        assert untouched == sorted(texts)

    prop()

"""Unigram-LM training under REAL vocabulary pressure (VERDICT r12 Next
#5): the sf0.1 probe corpus has 61 distinct words — it measures machinery,
not EM. Here the corpus is the repo's own documentation plus the
reference's docs (natural English + technical prose, ~1.5k distinct words,
25x the probe's vocabulary), and the pins are the statistical claims:
soft-EM marginal-likelihood monotonicity on real text, compression
competitive with byte-BPE at EQUAL vocabulary budget, and lossless
round-trip over the whole natural corpus."""

import glob
import re

import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.pipeline.tokenizer import (
    decode_ids,
    encode_corpus,
    train_bpe,
    word_counts,
)
from enterprise_warp_spark.pipeline.unigram import (
    encode_corpus_unigram,
    train_unigram,
)

_SOURCES = sorted(
    glob.glob("/root/repo/docs/*.md")
    + ["/root/repo/README.md"]
    + glob.glob("/root/reference/docs/*.rst")
    + ["/root/reference/README.md"]
)


@pytest.fixture(scope="module")
def nat_docs(spark):
    rows = []
    for i, p in enumerate(_SOURCES):
        # one document per paragraph: realistic unit sizes, stable ids
        for j, para in enumerate(open(p, errors="replace").read().split("\n\n")):
            para = para.strip()
            if para:
                rows.append((i * 10_000 + j, para))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def nat_counts(spark, nat_docs):
    return word_counts(nat_docs).localCheckpoint(eager=True)


def test_corpus_has_real_vocabulary_pressure(nat_counts):
    rows = nat_counts.collect()
    distinct = len(rows)
    total = sum(r["n"] for r in rows)
    assert distinct > 1000, distinct  # 61-word probes need not apply
    assert total > 5000, total


def test_soft_em_ll_monotone_on_natural_text(nat_counts):
    model = train_unigram(
        nat_counts, vocab_size=4000, max_piece_len=6, n_iters=4, em="soft"
    )
    lls = model["train_ll"]
    assert len(lls) == 4
    # the textbook EM guarantee on the real word distribution (tolerance
    # covers the integer micro-nat quantization of the E-step counts)
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:])), lls
    assert lls[-1] > lls[0]


def test_compression_competitive_with_bpe_at_equal_vocab(
    spark, nat_docs, nat_counts
):
    """Equal budget, same corpus, both real encoders: the unigram
    segmentation must land within 25% of byte-BPE's token count (Kudo
    2018 reports parity-to-better; byte-BPE gets bytes-level granularity
    our char-level unigram lacks, so a modest gap is allowed — the pin is
    'same league', catching any regression to char-splatter)."""
    V = 512
    uni = train_unigram(nat_counts, vocab_size=V, max_piece_len=8, n_iters=4)
    bpe = train_bpe(nat_counts, vocab_size=V)
    n_uni = (
        encode_corpus_unigram(nat_docs, uni)
        .agg(F.sum("n_pieces"))
        .first()[0]
    )
    n_bpe = (
        encode_corpus(nat_docs, bpe).agg(F.sum("n_tokens")).first()[0]
    )
    assert n_uni > 0 and n_bpe > 0
    ratio = n_uni / n_bpe
    assert ratio < 1.25, (n_uni, n_bpe, ratio)
    # and it genuinely compresses: far fewer pieces than characters
    n_chars = nat_docs.agg(F.sum(F.length("text"))).first()[0]
    assert n_uni < 0.6 * n_chars, (n_uni, n_chars)


def test_lossless_round_trip_on_natural_text(spark, nat_docs, nat_counts):
    """Every document — markdown punctuation, code spans, numbers —
    reassembles exactly from its unigram pieces (single-character
    coverage is the trainer's floor guarantee)."""
    model = train_unigram(nat_counts, vocab_size=600, max_piece_len=6,
                          n_iters=3)
    enc = encode_corpus_unigram(nat_docs, model, output="pieces")
    bad = enc.withColumn(
        "rejoined", F.concat_ws("", "pieces")
    ).filter(F.col("rejoined") != F.col("text"))
    assert bad.count() == 0, bad.select("doc_id").limit(5).collect()


def test_learned_pieces_are_english_morphology(nat_counts):
    """Sanity on WHAT was learned: at a real vocabulary the survivors
    should include recognizable English/technical fragments, not just
    frequency noise."""
    model = train_unigram(nat_counts, vocab_size=512, max_piece_len=8,
                          n_iters=4)
    multi = {p.strip() for p in model["logp"] if len(p.strip()) >= 3}
    hits = multi & {"the", "ing", "tion", "ion", "ers", "ent", "and",
                    "for", "ble", "ate", "est", "this", "with", "noise"}
    assert len(hits) >= 3, sorted(multi)[:40]

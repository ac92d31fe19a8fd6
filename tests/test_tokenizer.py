"""Distributed byte-level BPE: naive-reference training parity, lossless
round-trip, memoized distributed encoding, determinism."""

from __future__ import annotations

import pytest


def _naive_bpe(word_count: dict[str, int], n_merges: int):
    """Independent reference trainer: full pair recount every merge."""
    words = {
        w: [bytes([b]) for b in w.encode("utf-8")] for w in word_count
    }
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[bytes, bytes], int] = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_count[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] <= 0:
            break
        merges.append(best)
        new = best[0] + best[1]
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_train_matches_naive_reference(spark):
    from enterprise_warp_spark.pipeline.tokenizer import train_bpe, word_counts

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cats sat"),
            (3, "a catalog of the cats"),
            (4, "mat cat the the the"),
        ],
        "doc_id long, text string",
    )
    counts = word_counts(docs)
    tok = train_bpe(counts, vocab_size=256 + 12)
    wc = {r["word"]: r["n"] for r in counts.collect()}
    want = _naive_bpe(wc, 12)
    got = [(bytes.fromhex(a), bytes.fromhex(b)) for a, b in tok["merges"]]
    assert got == want


def test_roundtrip_lossless_on_real_documents(spark, sf_dir):
    """decode(encode(text)) == text byte-for-byte over the whole documents
    table (the pre-tokenizer is lossless), and distributed encoding matches
    the driver-side reference encoder row by row."""
    from enterprise_warp_spark.pipeline.tokenizer import (
        decode_ids,
        encode_corpus,
        encode_text,
        tokenizer_tables,
        train_bpe,
        word_counts,
    )
    from enterprise_warp_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = train_bpe(word_counts(docs), vocab_size=256 + 300)
    out = {r["doc_id"]: r for r in encode_corpus(docs, tok).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(out) == set(texts)
    tables = tokenizer_tables(tok)
    n_checked = 0
    for did, row in out.items():
        assert decode_ids(row["token_ids"], tok) == texts[did]
        assert row["n_tokens"] == len(row["token_ids"])
        if n_checked < 40:  # driver-reference parity spot check
            assert list(row["token_ids"]) == encode_text(
                texts[did], tok, tables
            )
            n_checked += 1
    # merges actually compress: far fewer tokens than bytes
    total_tokens = sum(r["n_tokens"] for r in out.values())
    total_bytes = sum(len(t.encode("utf-8")) for t in texts.values())
    assert total_tokens < 0.6 * total_bytes


def test_unicode_and_whitespace_roundtrip(spark):
    from enterprise_warp_spark.pipeline.tokenizer import (
        decode_ids,
        encode_text,
        train_bpe,
        word_counts,
    )

    rows = [
        (1, "héllo  wörld\t\ttabs\nnewlines  "),
        (2, "mixed 123 numbers42 and _under_scores_ §¶ symbols"),
        (3, "日本語のテキスト and emoji \U0001f600 too"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tok = train_bpe(word_counts(docs), vocab_size=256 + 20)
    for _, text in rows:
        assert decode_ids(encode_text(text, tok), tok) == text


def test_spark_pretokens_lossless_and_guard(spark):
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.tokenizer import (
        pretokens,
        train_bpe,
        word_counts,
    )

    rows = [
        (1, "a b  c\t d\n"), (2, "x9y _z_ !?#"), (3, "ünïcode 12③4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = df.select(
        "text", F.concat_ws("", pretokens("text")).alias("glued")
    ).collect()
    for r in got:
        assert r["glued"] == r["text"]  # Catalyst pre-tokenizer lossless

    with pytest.raises(ValueError, match="max_words"):
        train_bpe(word_counts(df), vocab_size=300, max_words=2)
    with pytest.raises(ValueError, match="vocab_size"):
        train_bpe(word_counts(df), vocab_size=100)


def test_encoding_repartition_invariant(spark, sf_dir):
    from enterprise_warp_spark.pipeline.tokenizer import (
        encode_corpus,
        train_bpe,
        word_counts,
    )
    from enterprise_warp_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    tok = train_bpe(word_counts(docs), vocab_size=256 + 64)
    a = {
        r["doc_id"]: list(r["token_ids"])
        for r in encode_corpus(docs, tok).collect()
    }
    b = {
        r["doc_id"]: list(r["token_ids"])
        for r in encode_corpus(docs.repartition(7), tok).collect()
    }
    assert a == b


def test_heap_trainer_matches_naive_on_adversarial_counts(spark):
    """Lazy-deletion heap selection == the full-rescan reference on random
    corpora engineered so pair counts rise AND fall across merges (the
    decreased-pair reachability case)."""
    import random

    import pandas as pd

    from enterprise_warp_spark.pipeline.tokenizer import train_bpe

    rng = random.Random(9)
    for trial in range(4):
        vocab = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(2, 7)))
            for _ in range(40)
        ]
        wc = {w: rng.randint(1, 30) for w in set(vocab)}
        counts = spark.createDataFrame(
            pd.DataFrame({"word": list(wc), "n": list(wc.values())})
        )
        tok = train_bpe(counts, vocab_size=256 + 25)
        want = _naive_bpe(wc, 25)
        got = [(bytes.fromhex(a), bytes.fromhex(b)) for a, b in tok["merges"]]
        assert got == want, trial


def test_save_load_roundtrip(spark, tmp_path):
    from enterprise_warp_spark.pipeline.tokenizer import (
        encode_text,
        load_tokenizer,
        save_tokenizer,
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(1, "persist me"), (2, "persist me too please")],
        "doc_id long, text string",
    )
    tok = train_bpe(word_counts(docs), vocab_size=256 + 10)
    path = str(tmp_path / "tok.json")
    save_tokenizer(tok, path)
    back = load_tokenizer(path)
    # JSON round-trips merge tuples as lists; the tables accept both
    assert back["vocab_size"] == tok["vocab_size"]
    text = "persist me too"
    assert encode_text(text, back) == encode_text(text, tok)


def _apply_merges_rescan(symbols, ranks):
    """The original O(n^2) full-rescan reference (kept test-side only) —
    the heap walk must reproduce it bit for bit."""
    while len(symbols) > 1:
        best = None
        best_rank = None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            return symbols
        merged = symbols[best] + symbols[best + 1]
        symbols = symbols[:best] + [merged] + symbols[best + 2 :]
    return symbols


def test_heap_merge_walk_equals_rescan_reference():
    import random

    from enterprise_warp_spark.pipeline.tokenizer import _apply_merges

    rng = random.Random(11)
    for trial in range(200):
        alphabet = [bytes([c]) for c in range(97, 97 + rng.randint(2, 5))]
        word = [rng.choice(alphabet) for _ in range(rng.randint(1, 30))]
        # random merge table over byte-strings seen so far (chains allowed)
        pool = list(alphabet)
        ranks = {}
        for r in range(rng.randint(0, 25)):
            a, b = rng.choice(pool), rng.choice(pool)
            if (a, b) not in ranks:
                ranks[(a, b)] = len(ranks)
                pool.append(a + b)
        assert _apply_merges(list(word), ranks) == _apply_merges_rescan(
            list(word), ranks
        ), (trial, word, ranks)


def test_pathological_single_pretoken_encodes_fast():
    """A 200k-char no-whitespace 'word' must encode in seconds, not stall
    the task (the O(n^2) rescan walk took minutes at this size)."""
    import time

    from enterprise_warp_spark.pipeline.tokenizer import (
        decode_ids,
        encode_text,
        tokenizer_tables,
    )

    # merges that chain heavily on this alphabet
    merges = [("61", "62"), ("6162", "6162"), ("61626162", "61626162")]
    tok = {"merges": merges, "vocab_size": 256 + len(merges)}
    word = "ab" * 100_000  # single pre-token: letters only
    t0 = time.perf_counter()
    ids = encode_text(word, tok, tokenizer_tables(tok))
    dt = time.perf_counter() - t0
    assert dt < 10.0, f"pathological encode took {dt:.1f}s"
    assert decode_ids(ids, tok) == word
    assert len(ids) == 100_000 // 4  # fully merged into 8-byte symbols


def test_gate_vocab_replace_chain_equals_real_encoder(spark, sf_dir):
    """The [bpe] gate's oracle replays encode as a rank-ordered replace()
    chain (queries_hygiene._BPE_CHAIN_SQL); that is equivalent to the real
    lowest-rank-first heap walk ONLY under the BPE training invariant
    (each rule's constituents come from strictly earlier rules). Pin both:
    (a) the invariant holds structurally for the inlined vocabulary,
    (b) chain replay == encode_text token-for-token over the test corpus
    plus adversarial strings."""
    from enterprise_warp_spark.pipeline.tokenizer import (
        _PY_PRETOKEN_RE,
        encode_text,
        tokenizer_tables,
    )
    from enterprise_warp_spark.queries_hygiene import _BPE_MERGES, _BPE_TOK

    # (a) structural invariant: every constituent is a base byte or the
    # product of a strictly earlier merge
    products = set()
    for a, b in _BPE_MERGES:
        for side in (a, b):
            assert len(side) == 2 or side in products, (a, b)
        products.add(a + b)

    _, _, symbols = tokenizer_tables(_BPE_TOK)
    sym_hex = [s.hex() for s in symbols]

    def replay(text):
        import re

        chunks = []
        for w in _PY_PRETOKEN_RE.findall(text):
            bs = w.encode("utf-8")
            chunks.append("".join(f"({x:02x})" for x in bs))
        s = "/".join(chunks)  # '/' blocks cross-word merges
        for a, b in _BPE_MERGES:
            s = s.replace(f"({a})({b})", f"({a}{b})")
        s = s.replace("/", "")
        return re.findall(r"\(([0-9a-f]+)\)", s)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    texts += [
        "", " ", "hash hash hashhash", "join join s", "aast t t",
        "  spark  row row  ", "atatat", "parpar part", "xyz_123_abc",
        "ttttt", "as as asas hashash", "shash",  # back-to-back merges
    ]
    for t in texts:
        assert [sym_hex[i] for i in encode_text(t, _BPE_TOK)] == replay(t), t


def test_oracle_pretoken_pattern_matches_python_on_unicode():
    """ADVICE r10: the [bpe]/[tok] oracle's RE2 _TOK_PATTERN must
    pre-tokenize exactly like the engine's _PY_PRETOKEN_RE on NON-ASCII
    text too — a divergence would be a false-positive gate failure the
    moment a document grows an accented letter. Pin the category mapping
    (\\w = L*+Nd+Nl+No+_, \\d = Nd, \\s = {\\t\\n\\x0B\\f\\r\\x1C-\\x1F
    \\x85}+Z*) empirically across scripts, number forms, and every Python
    whitespace code point."""
    import duckdb

    from enterprise_warp_spark.pipeline.tokenizer import _PY_PRETOKEN_RE
    from enterprise_warp_spark.queries_hygiene import _TOK_PATTERN

    texts = [
        "hello world_42  foo-bar!",
        "café naïve Zürich",
        "日本語テキストと漢字123",
        "٣٤٥ arabic digits, Ⅻ roman, ½ frac,"
        " ² sup",
        "a\xa0b c d e",  # NBSP, Zl, Zp, em-space
        "mixed_под_черта"
        " кириллица",
        "emoji \U0001f600\U0001f389 and ∑∫ math",
        "tab\tnl\nvt\x0bff\x0ccr\rfs\x1cgs\x1drs\x1eus\x1fnel\x85",
        "ＦＵＬＬ０１２",  # fullwidth
        "ʰsuper ᵐodifier letters",  # Lm
        "ⅠⅡⅢ_①②",  # Nl and No circled
        "", " ", "_",
    ]
    con = duckdb.connect()
    for t in texts:
        py = _PY_PRETOKEN_RE.findall(t)
        dk = con.execute(
            "select regexp_extract_all(?, ?)", [t, _TOK_PATTERN]
        ).fetchone()[0]
        assert py == dk, (t, py, dk)
    con.close()

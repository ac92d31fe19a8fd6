"""Distributed byte-level BPE tokenizer: train on a corpus, encode at scale.

A training-data pipeline tokenizes everything it ships; this module makes
the engine self-sufficient for that: learn a byte-level BPE vocabulary
FROM the corpus (Sennrich et al. 2016, the public algorithm; byte-level
alphabet per the GPT-2 tokenizer report so NO input is ever OOV) and
encode the corpus to token ids, both Spark-shaped:

* TRAIN — the corpus-sized work is ONE pre-tokenize + groupBy(word) count
  (a single shuffle); the merge loop then runs driver-side over the
  bounded (word, count) vocabulary exactly like mainstream tokenizer
  trainers do (they all train on the word-frequency table, not the raw
  corpus — the table is orders of magnitude smaller and capped here by
  `max_words` with a loud guard).
* ENCODE — distributed mapInPandas; each Arrow batch keeps a word -> ids
  memo, so the merge walk runs once per DISTINCT word per batch (natural
  corpora repeat words heavily). No shuffle; partitioning preserved.

The pre-tokenizer is LOSSLESS (whitespace runs are tokens too, and a
single leading space attaches to a following letter/digit run, the GPT-2
convention): concatenating a document's pre-tokens reproduces it byte
for byte, so decode(encode(text)) == text exactly — pinned by test.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# every character lands in exactly one alternative -> lossless cover:
# optional-leading-space letter run | optional-leading-space digit run |
# whitespace run | run of anything else (punctuation/symbols)
PRETOKEN_RE = r"( ?[\p{L}]+| ?[\p{N}]+|\s+|[^\s\p{L}\p{N}]+)"

MAX_TRAIN_WORDS = 1_000_000


def pretokens(text_col: str = "text") -> Column:
    """array<string> of lossless pre-tokens (concat == original text)."""
    # Spark SQL string literals eat single backslashes — double them so the
    # Java regex engine sees \p{L}, \s, ...
    pat = PRETOKEN_RE.replace("\\", "\\\\")
    return F.expr(f"regexp_extract_all({text_col}, '{pat}', 1)")


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    r"""(word, n) over the corpus — the single corpus-sized shuffle of BPE
    training (map-side partial aggregation folds per-partition repeats
    before the exchange).

    Pre-tokenization runs through _PY_PRETOKEN_RE in mapInPandas — the
    EXACT function encode_corpus uses — so training and encoding see one
    word population by construction. (The Catalyst `pretokens` twin
    diverges on corner classes: Java \p{N} covers superscripts the
    Python regex treats as letters, and `_` lands in different
    alternatives; training through Catalyst would learn merges the
    encoder never produces.)"""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            counts: dict[str, int] = {}
            for t in pdf[text_col]:
                if t is None:
                    continue
                for w in _PY_PRETOKEN_RE.findall(t):
                    counts[w] = counts.get(w, 0) + 1
            yield pd.DataFrame(
                {"word": list(counts), "n": list(counts.values())}
            )

    return (
        docs.select(text_col)
        .mapInPandas(kernel, "word string, n long")
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
    )


def _apply_merges(symbols: list[bytes], ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """Greedy lowest-rank-first merge walk (the standard BPE encode),
    heap + linked-list: O(n log n) in the pre-token length instead of the
    naive O(n^2) full-rescan loop — same output bit for bit (equal-rank
    ties break to the leftmost occurrence, exactly like the rescan, since
    the heap orders (rank, position) and positions never reorder). The
    n^2 loop stalls an encode task on a pathological megabyte-long single
    pre-token (no whitespace); this walk makes that case ~n log n."""
    n = len(symbols)
    if n < 2:
        return symbols
    import heapq

    syms = list(symbols)
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    alive = [True] * n
    heap = [
        (r, i)
        for i in range(n - 1)
        if (r := ranks.get((syms[i], syms[i + 1]))) is not None
    ]
    heapq.heapify(heap)
    while heap:
        r, i = heapq.heappop(heap)
        if not alive[i]:
            continue
        j = nxt[i]
        # stale guard: the pair at this position must still exist with
        # this rank (a matching rank implies the identical byte pair, so
        # re-merging a re-formed pair here is by definition correct)
        if j == -1 or ranks.get((syms[i], syms[j])) != r:
            continue
        syms[i] = syms[i] + syms[j]
        alive[j] = False
        nj = nxt[j]
        nxt[i] = nj
        if nj != -1:
            prv[nj] = i
        p = prv[i]
        if p != -1 and (rp := ranks.get((syms[p], syms[i]))) is not None:
            heapq.heappush(heap, (rp, p))
        if nj != -1 and (rn := ranks.get((syms[i], syms[nj]))) is not None:
            heapq.heappush(heap, (rn, i))
    return [s for s, a in zip(syms, alive) if a]


def train_bpe(
    counts: DataFrame,
    vocab_size: int,
    max_words: int = MAX_TRAIN_WORDS,
) -> dict:
    """Learn BPE merges from a (word, n) table -> tokenizer dict
    {'merges': [(hexbytes, hexbytes), ...], 'vocab_size': int}.

    Ids: 0..255 are the single bytes; 256+i is merge i's result. The
    driver holds only the top-`max_words` words by count (deterministic
    count-desc, word-asc order) — a LOUD guard, not silent truncation,
    when the vocabulary overflows it. Merge selection is deterministic:
    highest pair count, ties by pair bytes ascending.

    Training cost: classic incremental pair-count maintenance — each
    merge touches only the words containing the merged pair (inverted
    pair -> words index) and selection pops a lazy-deletion max-heap, so
    a merge costs O(occurrences x log |pairs|), never a pair-table
    rescan."""
    if vocab_size < 256:
        raise ValueError(f"vocab_size must be >= 256, got {vocab_size}")
    total = counts.count()
    if total > max_words:
        raise ValueError(
            f"word vocabulary has {total} entries (> max_words={max_words}); "
            "raise max_words deliberately or pre-filter rare words "
            "(e.g. counts.filter('n >= 2'))"
        )
    rows = counts.orderBy(F.desc("n"), F.asc("word")).collect()
    words: list[list[bytes]] = [
        [bytes([b]) for b in r["word"].encode("utf-8")] for r in rows
    ]
    wcount = [int(r["n"]) for r in rows]

    # pair -> total count, and pair -> set of word indices containing it
    pair_count: dict[tuple[bytes, bytes], int] = {}
    pair_words: dict[tuple[bytes, bytes], set[int]] = {}
    for wi, syms in enumerate(words):
        c = wcount[wi]
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    import heapq

    # lazy-deletion max-heap: push on every count change, pop until the
    # entry matches the live count. Ties break by pair bytes ascending,
    # matching the deterministic (-count, pair) order.
    heap = [(-c, p) for p, c in pair_count.items()]
    heapq.heapify(heap)

    def push(p):
        c = pair_count.get(p)
        if c:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[bytes, bytes]] = []
    n_merges = vocab_size - 256
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        live = pair_count.get(best, 0)
        if live <= 0 or -negc != live:
            continue  # stale entry
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            c = wcount[wi]
            touched = set()
            # remove this word's contribution to all its pairs. Decreased
            # pairs MUST be re-pushed too (lazy deletion discards their
            # stale higher entries; without a fresh entry a decremented
            # pair would become unreachable forever)
            for a, b in zip(syms, syms[1:]):
                pair_count[(a, b)] -= c
                if pair_count[(a, b)] <= 0:
                    pair_count.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop((a, b), None)
                touched.add((a, b))
            # merge every occurrence of the pair in this word
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            # add back the rewritten word's pairs
            for a, b in zip(out, out[1:]):
                pair_count[(a, b)] = pair_count.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(wi)
                touched.add((a, b))
            for pr in touched:
                push(pr)
    return {
        "merges": [(a.hex(), b.hex()) for a, b in merges],
        "vocab_size": 256 + len(merges),
    }


def tokenizer_tables(tok: dict):
    """-> (ranks {pair: rank}, ids {symbol: id}, symbols [id -> bytes])."""
    ranks: dict[tuple[bytes, bytes], int] = {}
    symbols: list[bytes] = [bytes([i]) for i in range(256)]
    for i, (a, b) in enumerate(tok["merges"]):
        pa, pb = bytes.fromhex(a), bytes.fromhex(b)
        ranks[(pa, pb)] = i
        symbols.append(pa + pb)
    ids = {s: i for i, s in enumerate(symbols)}
    return ranks, ids, symbols


def encode_text(text: str, tok: dict, _tables=None) -> list[int]:
    """Encode one string (driver-side reference path; the Spark kernel
    uses the same functions per batch with a word memo)."""
    import re

    ranks, ids, _ = _tables or tokenizer_tables(tok)
    out: list[int] = []
    for word in re.findall(_PY_PRETOKEN_RE, text):
        syms = _apply_merges([bytes([b]) for b in word.encode("utf-8")], ranks)
        out.extend(ids[s] for s in syms)
    return out


def decode_ids(ids_list, tok: dict) -> str:
    _, _, symbols = tokenizer_tables(tok)
    return b"".join(symbols[i] for i in ids_list).decode("utf-8")


# Python twin of PRETOKEN_RE (\p classes via the str.isalpha/isdigit-free
# `regex`-less route: re supports \w but not \p — use explicit unicode
# categories through str methods inside a findall shim instead).
import re as _re  # noqa: E402

_PY_PRETOKEN_RE = _re.compile(
    r" ?[^\W\d_]+| ?\d+|\s+|[^\s\w]+|_+", _re.UNICODE
)


def encode_corpus(
    docs: DataFrame, tok: dict, text_col: str = "text"
) -> DataFrame:
    """Add (token_ids array<int>, n_tokens long) to every document row.

    mapInPandas with a per-batch word -> ids memo: the merge walk runs
    once per distinct pre-token per batch. No shuffle; upstream
    partitioning preserved."""
    import pandas as pd

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in docs.dtypes
    ) + ", token_ids array<int>, n_tokens long"
    tok_b = docs.sparkSession.sparkContext.broadcast(tok)

    def kernel(batches):
        ranks, ids, _ = tokenizer_tables(tok_b.value)
        memo: dict[str, list[int]] = {}

        def enc(text):
            if text is None:
                return []
            out: list[int] = []
            for word in _PY_PRETOKEN_RE.findall(text):
                got = memo.get(word)
                if got is None:
                    syms = _apply_merges(
                        [bytes([b]) for b in word.encode("utf-8")], ranks
                    )
                    got = [ids[s] for s in syms]
                    # memo only plausibly-repeating pre-tokens: a
                    # pathological megabyte single pre-token would pin
                    # its key+ids in every batch's memo for no reuse
                    if len(word) <= 256:
                        memo[word] = got
                out.extend(got)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            encoded = [enc(t) for t in pdf[text_col]]
            pdf["token_ids"] = encoded
            pdf["n_tokens"] = pd.Series(
                [len(e) for e in encoded], index=pdf.index, dtype="int64"
            )
            yield pdf

    return docs.mapInPandas(kernel, out_schema)


def save_tokenizer(tok: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(tok, f)


def load_tokenizer(path: str) -> dict:
    with open(path) as f:
        return json.load(f)

"""Unigram-LM tokenizer (the SentencePiece unigram model: Kudo 2018,
arXiv:1804.10959) — the probabilistic complement to pipeline/tokenizer.py's
byte-BPE. Where BPE grows a vocabulary bottom-up by merge frequency, the
unigram model starts from a LARGE candidate piece set and prunes top-down
under an EM-trained piece-probability model; segmentation is the Viterbi
best path, which adapts to context (BPE's greedy merge walk cannot).

Architecture mirrors train_bpe exactly:

  * ONE corpus-sized shuffle: tokenizer.word_counts (the same
    pre-tokenizer, so training and encoding see one word population);
  * all training iterations run over the (word, n) table — the bounded
    heavy-hitter aggregate, not the corpus;
  * the model (piece -> log prob, <= vocab_size entries) lives on the
    driver and broadcasts, like BPE's merge list;
  * the E-step is an Arrow mapInPandas pass over the word table: hard-EM
    (Viterbi-count) piece statistics, weighted by word frequency — each
    word segments independently, embarrassingly parallel;
  * the M-step + pruning are driver arithmetic over <= |vocab| floats:
    re-normalize counts to log probs, drop the lowest-probability
    REMOVABLE pieces (single characters are never pruned — they are the
    coverage guarantee that makes every word segmentable) down the
    shrink schedule until vocab_size survives.

Determinism: candidate selection and every prune break ties on
(count desc, piece asc); Viterbi breaks path ties toward FEWER pieces,
then lexicographically smaller piece at the boundary — encode is a pure
function of (text, model). Not oracle-SQL-expressible (iterative EM);
pinned in tests/test_unigram.py by a brute-force Viterbi oracle,
likelihood monotonicity, lossless round-trips, and planted-pattern
recovery — the PageRank/BPE precedent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CANDIDATES = 100_000


def _viterbi(word: str, logp: dict[str, float], max_len: int):
    """Best segmentation of `word` under piece log-probs -> (pieces,
    total_logp). dp[i] = best (score, n_pieces, pieces-tail) for word[:i];
    ties toward fewer pieces then lexicographically smaller last piece.
    Returns (None, -inf) when some character has no piece at all."""
    n = len(word)
    NEG = float("-inf")
    best = [(NEG, 0, None)] * (n + 1)  # (score, n_pieces, back=(start, piece))
    best[0] = (0.0, 0, None)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j][0] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = (best[j][0] + lp, best[j][1] + 1)
            cur = best[i]
            take = False
            if cand[0] > cur[0]:
                take = True
            elif cand[0] == cur[0] and cur[2] is not None:
                if cand[1] < cur[1]:
                    take = True
                elif cand[1] == cur[1] and piece < cur[2][1]:
                    take = True
            if take:
                best[i] = (cand[0], cand[1], (j, piece))
    if best[n][0] == NEG:
        return None, NEG
    pieces = []
    i = n
    while i > 0:
        j, piece = best[i][2]
        pieces.append(piece)
        i = j
    pieces.reverse()
    return pieces, best[n][0]


def _forward_backward(word: str, logp: dict[str, float], max_len: int):
    """Soft-EM statistics for one word: expected piece counts under the
    FULL segmentation posterior (forward-backward over the segmentation
    lattice, log-space) and the word's marginal log-likelihood
    log Z = logsumexp over all segmentations. Returns (None, -inf) when
    the word is unsegmentable."""
    n = len(word)
    NEG = float("-inf")

    def ladd(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = a if a > b else b
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if alpha[j] == NEG:
                continue
            lp = logp.get(word[j:i])
            if lp is not None:
                alpha[i] = ladd(alpha[i], alpha[j] + lp)
    if alpha[n] == NEG:
        return None, NEG
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        for i in range(j + 1, min(n, j + max_len) + 1):
            if beta[i] == NEG:
                continue
            lp = logp.get(word[j:i])
            if lp is not None:
                beta[j] = ladd(beta[j], lp + beta[i])
    z = alpha[n]
    exp: dict[str, float] = {}
    for j in range(n):
        if alpha[j] == NEG:
            continue
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or beta[i] == NEG:
                continue
            exp[piece] = exp.get(piece, 0.0) + math.exp(
                alpha[j] + lp + beta[i] - z
            )
    return exp, z


def candidate_pieces(
    counts: DataFrame, max_piece_len: int = 8, max_candidates: int = MAX_CANDIDATES
) -> DataFrame:
    """(word, n) -> (piece, weight): every substring of every distinct
    word up to max_piece_len, weighted by word frequency, top
    max_candidates by weight (ties piece-asc) PLUS every single character
    (unprunable coverage). Substring generation explodes the DISTINCT
    word table — len * max_piece_len rows per distinct word, never the
    corpus."""
    subs = counts.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(i, least(length(word), i + {max_piece_len - 1})), "
                "j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
        F.col("n"),
    ).groupBy("piece").agg(F.sum("n").alias("weight"))
    chars = subs.filter(F.length("piece") == 1)
    multi = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.desc("weight"), F.asc("piece"))
        .limit(max_candidates)
    )
    return chars.unionByName(multi)


def train_unigram(
    counts: DataFrame,
    vocab_size: int,
    max_piece_len: int = 8,
    n_iters: int = 4,
    shrink: float = 0.75,
    max_candidates: int = MAX_CANDIDATES,
    em: str = "hard",
) -> dict:
    """(word, n) table -> model dict {'logp': {piece: logp}, 'max_len',
    'vocab_size'}: EM-prune loop from the candidate set down to
    vocab_size. Each round: piece statistics over the word table (one
    Arrow pass, frequency-weighted), M-step renormalize, then prune the
    lowest-probability removable pieces by the shrink factor (never below
    vocab_size, never a single character). Final round re-fits
    probabilities on the surviving vocabulary.

    em="hard" counts the Viterbi path's pieces (fast, the classic
    approximation); em="soft" is Kudo's actual E-step — EXPECTED piece
    counts under the full segmentation posterior (forward-backward,
    _forward_backward) with train_ll the true marginal log-likelihood,
    which plain EM theory guarantees non-decreasing between prune-free
    iterations. Both paths accumulate integer micro-nat counts so the
    distributed sum is exact integer arithmetic — training is
    bit-deterministic regardless of partitioning (the round-6 doctrine
    applied to EM statistics)."""
    import pandas as pd

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if em not in ("hard", "soft"):
        raise ValueError(f"em must be 'hard' or 'soft', got {em!r}")
    cand = candidate_pieces(counts, max_piece_len, max_candidates).collect()
    total0 = sum(r["weight"] for r in cand) or 1
    logp = {
        r["piece"]: math.log(r["weight"] / total0) for r in cand
    }
    chars = {p for p in logp if len(p) == 1}
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size {vocab_size} below the {len(chars)} single "
            "characters needed for coverage"
        )
    spark = counts.sparkSession
    words = counts.select("word", "n").localCheckpoint(eager=True)
    history: list[float] = []

    def estep(model: dict) -> tuple[dict, float]:
        b = spark.sparkContext.broadcast(model)

        def kernel(batches):
            lp = b.value
            for pdf in batches:
                rows = []
                for w, n in zip(pdf["word"], pdf["n"]):
                    n = int(n)
                    if em == "soft":
                        exp, z = _forward_backward(str(w), lp, max_piece_len)
                        if exp is None:
                            continue
                        for p, c in exp.items():
                            rows.append((p, int(round(c * n * 1e6))))
                        rows.append(("\x00LL", int(round(z * n * 1e6))))
                    else:
                        pieces, score = _viterbi(str(w), lp, max_piece_len)
                        if pieces is None:
                            continue
                        for p in pieces:
                            rows.append((p, n * 1_000_000))
                        # weighted corpus log-likelihood rides along as a
                        # pseudo-piece row; everything is integer
                        # micro-nats so the distributed sum is exact
                        rows.append(("\x00LL", int(round(score * n * 1e6))))
                yield pd.DataFrame(rows, columns=["piece", "c"])

        agg = (
            words.mapInPandas(kernel, "piece string, c long")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        cnts = {r["piece"]: r["c"] for r in agg}
        ll = cnts.pop("\x00LL", 0) / 1e6
        return cnts, ll

    model = logp
    for it in range(n_iters):
        cnts, ll = estep(model)
        history.append(ll)
        total = sum(cnts.values()) or 1
        # M-step over pieces that were USED; unused multi-char pieces die
        refit = {
            p: math.log(cnts[p] / total) for p in cnts if cnts[p] > 0
        }
        for ch in chars:  # coverage floor: chars always present
            refit.setdefault(ch, math.log(0.5 / total))
        n_multi = sum(1 for p in refit if len(p) > 1)
        target_multi = max(vocab_size - len(chars), 0)
        if it < n_iters - 1 and n_multi > target_multi:
            keep = max(int(n_multi * shrink), target_multi)
            ranked = sorted(
                (p for p in refit if len(p) > 1),
                key=lambda p: (-refit[p], p),
            )
            refit = {
                p: refit[p]
                for p in list(ranked[:keep]) + [c for c in refit if len(c) == 1]
            }
        model = refit
    # final hard prune to the exact budget
    n_multi = sum(1 for p in model if len(p) > 1)
    target_multi = max(vocab_size - len(chars), 0)
    if n_multi > target_multi:
        ranked = sorted(
            (p for p in model if len(p) > 1), key=lambda p: (-model[p], p)
        )
        model = {
            p: model[p]
            for p in list(ranked[:target_multi])
            + [c for c in model if len(c) == 1]
        }
    return {
        "logp": model,
        "max_len": max_piece_len,
        "vocab_size": len(model),
        "train_ll": history,
    }


def unigram_vocab(model: dict) -> dict[str, int]:
    """Stable piece -> id map for a trained model: '<unk>' is id 0, the
    pieces follow sorted ascending from 1 — a pure function of the piece
    SET, so the same vocabulary gives the same ids on any engine, and
    save_tokenizer/load_tokenizer JSON round-trips reproduce it."""
    return {"<unk>": 0} | {
        p: i + 1 for i, p in enumerate(sorted(model["logp"]))
    }


def encode_corpus_unigram(
    docs: DataFrame, model: dict, text_col: str = "text",
    output: str = "pieces",
) -> DataFrame:
    """Viterbi-segment every pre-token under the model, per-batch memo
    (each distinct word segments once per batch). Characters outside the
    model's coverage become '<unk>' — loud in the output, never an error.
    Map-only; upstream partitioning preserved.

    output="pieces" adds (pieces array<string>, n_pieces long);
    output="ids" adds (token_ids array<int>, n_tokens long) under the
    stable unigram_vocab id space — the SAME schema the byte-BPE
    encode_corpus emits, so packing (pack_documents) and every
    downstream token consumer take either tokenizer unchanged."""
    import pandas as pd

    from enterprise_warp_spark.pipeline.tokenizer import _PY_PRETOKEN_RE

    if output not in ("pieces", "ids"):
        raise ValueError(f"output must be 'pieces' or 'ids', got {output!r}")
    cols = (
        ("pieces", "array<string>", "n_pieces")
        if output == "pieces"
        else ("token_ids", "array<int>", "n_tokens")
    )
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in docs.dtypes
    ) + f", {cols[0]} {cols[1]}, {cols[2]} long"
    spark = docs.sparkSession
    ids = unigram_vocab(model) if output == "ids" else None
    b = spark.sparkContext.broadcast((model["logp"], model["max_len"], ids))

    def kernel(batches):
        lp, mx, idmap = b.value
        memo: dict[str, list] = {}

        def seg(word: str) -> list:
            got = memo.get(word)
            if got is None:
                pieces, _ = _viterbi(word, lp, mx)
                if pieces is None:
                    # per-char fallback: known chars kept, unknown -> <unk>
                    pieces = [
                        ch if ch in lp else "<unk>" for ch in word
                    ]
                if idmap is not None:
                    pieces = [idmap.get(p, 0) for p in pieces]
                memo[word] = got = pieces
            return got

        for pdf in batches:
            out_p, out_n = [], []
            for t in pdf[text_col]:
                pieces: list = []
                if t:
                    for w in _PY_PRETOKEN_RE.findall(t):
                        pieces.extend(seg(w))
                out_p.append(pieces)
                out_n.append(len(pieces))
            res = pdf.copy()
            res[cols[0]] = out_p
            res[cols[2]] = out_n
            yield res

    return docs.mapInPandas(kernel, out_schema)

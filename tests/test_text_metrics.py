"""Gopher and C4 quality-filter operators (r11) — boundary pins."""

def test_gopher_rules_boundaries(spark):
    """Gopher quality rules (r11): crafted docs hit each rule's boundary
    on both sides — pass/fail flips exactly at the published thresholds
    (Rae et al. 2021 Table A1), and the bitmask/keep compose correctly."""
    from enterprise_warp_spark.pipeline.text import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog and then they "
            "have gone to be with friends of the family for dinner today "
            "which was of course very nice and everyone that came along "
            "said they have to come back with more food and that the host "
            "should be proud of the effort and time")  # 59 words, clean
    docs = [
        (0, good),
        (1, "the of and to be"),                         # < 50 words
        (2, " ".join(["ab"] * 30 + ["the", "of"]) + " " +
            " ".join(["to", "be"] * 12)),                # mean wlen < 3
        (3, good + " " + "#" * 40),                      # symbols > 10%
        (4, "\n".join(["- " + good] * 10)),              # all-bullet lines
        (5, "\n".join([good + " ..."] * 10)),            # all-ellipsis ends
        (6, " ".join(["123456"] * 55) + " the of"),      # alpha words < 80%
        (7, " ".join(["walrus"] * 60)),                  # < 2 stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}

    assert got[0]["gopher_keep"] and got[0]["gopher_mask"] == 127
    assert not got[1]["gopher_word_count"]
    assert not got[2]["gopher_mean_word_len"]
    assert not got[3]["gopher_symbol_ratio"]
    assert not got[4]["gopher_bullet_lines"]
    assert not got[5]["gopher_ellipsis_lines"]
    assert not got[6]["gopher_alpha_words"]
    assert not got[7]["gopher_stop_words"]
    for d in (1, 2, 3, 4, 5, 6, 7):
        assert not got[d]["gopher_keep"]
        assert got[d]["gopher_mask"] != 127

    # python twin of the integer arithmetic for the clean doc
    words = good.split()
    assert got[0]["gopher_n_words"] == len(words)
    assert got[0]["gopher_alpha_n"] == sum(
        1 for w in words if any(c.isascii() and c.isalpha() for c in w)
    )
    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    assert got[0]["gopher_stop_n"] == len(
        stop & {w.lower() for w in words}
    )


def test_c4_filters_boundaries(spark):
    """C4 cleaning (r11): each rule flips at its threshold — terminal
    punctuation set (. ! ? \"), the 5-word line minimum, the 3-sentence
    document minimum, and the blocklist markers."""
    from enterprise_warp_spark.pipeline.text import c4_filters

    docs = [
        (0, "one two three four five six.\nshort line.\n"
            "seven eight nine ten eleven!\ntwelve thirteen fourteen "
            "fifteen sixteen?\nno terminal punctuation here at all"),
        (1, "a good line with five words.\nanother good line right here."),
        (2, "this page uses javascript everywhere sadly.\n"
            "one two three four five.\nsix seven eight nine ten.\n"
            "ok fine good yes done."),
        (3, 'he said "this is a quote line."\nthe second sentence is '
            "here now.\nthe third sentence arrives right now."),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_filters(df).collect()}

    # doc 0: three qualifying lines survive (short + unpunctuated drop)
    assert got[0]["c4_kept_lines"] == 3 and got[0]["c4_sentences"] == 3
    assert got[0]["c4_keep"]
    assert "short line." not in got[0]["c4_clean_text"]
    assert "no terminal punctuation" not in got[0]["c4_clean_text"]
    # doc 1: only 2 sentences survive -> dropped
    assert got[1]["c4_kept_lines"] == 2 and not got[1]["c4_keep"]
    # doc 2: enough sentences but blocklisted
    assert got[2]["c4_sentences"] >= 3 and got[2]["c4_flagged"]
    assert not got[2]["c4_keep"]
    # doc 3: quote-terminated line counts; 3 sentences -> keep
    assert got[3]["c4_kept_lines"] == 3 and got[3]["c4_keep"]
    # doc 4: empty text -> empty clean, zero everything, drop
    assert got[4]["c4_clean_text"] == "" and got[4]["c4_sentences"] == 0
    assert not got[4]["c4_keep"]


def test_strip_repeated_lines(spark):
    """Line-level boilerplate removal (r11): lines in >= min_docs
    distinct docs vanish from every doc; within-doc repeats in a single
    doc survive; order is preserved; an all-boilerplate doc rebuilds to
    '' with zero kept lines."""
    from enterprise_warp_spark.pipeline.dedup import strip_repeated_lines

    docs = [
        (1, "NAV BAR\nunique first body line\nFOOTER\nunique second line"),
        (2, "NAV BAR\nanother body entirely\nFOOTER"),
        (3, "solo line\nsolo line\nonly here"),
        (4, "NAV BAR\nFOOTER"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in strip_repeated_lines(df, min_docs=2).collect()}
    assert got[1]["text_clean"] == "unique first body line\nunique second line"
    assert got[1]["n_kept_lines"] == 2
    assert got[2]["text_clean"] == "another body entirely"
    # within-doc duplicate in ONE doc: countDistinct(doc)=1 -> kept twice
    assert got[3]["text_clean"] == "solo line\nsolo line\nonly here"
    assert got[4]["text_clean"] == "" and got[4]["n_kept_lines"] == 0

"""HTML text extraction + boilerplate removal for web corpora.

Raw web crawls are the largest input to any training-data pipeline; the
standard first transform is markup -> clean text with navigation/footer
boilerplate dropped. Two tiers, both dependency-free:

* ``strip_tags_catalyst`` — pure-Catalyst regexp chain (script/style/
  comment blocks out, block tags to newlines, tags stripped, the common
  named entities decoded). JVM-side and whole-stage-codegen friendly: the
  right tool when the corpus is mostly-clean markup and throughput is
  everything. Numeric character references and exotic entities survive
  undecoded (regexp_replace cannot compute a codepoint) — documented
  contract, use the full extractor when that matters.

* ``extract_main_text`` — stdlib ``html.parser`` SAX pass inside
  Arrow-batched mapInPandas (the codec-module execution shape): skips
  script/style/head/noscript subtrees, emits block boundaries, decodes
  ALL entities (``convert_charrefs``), tracks per-block anchor-text
  share, then applies the classic text-density boilerplate rule (keep
  blocks that are long enough OR mostly non-link text — the heuristic
  family of Arc90 readability / jusText, public techniques): navigation
  bars and footers are short and link-dense, article paragraphs are long
  and link-sparse. Malformed markup never raises — html.parser is
  error-tolerant by design.

Scale shape: both are map-only (no shuffle, partitioning preserved); the
Python tier's cost is one SAX parse per document, batched through Arrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# named entities the Catalyst tier decodes (the overwhelmingly common set).
# &amp; MUST decode LAST: decoding it first would turn the escaped text
# "&amp;lt;" into "&lt;" and then a later pass (or downstream consumer)
# reads it as markup — the standard entity-decoding order unescapes the
# ampersand only after every other entity has been handled, so "&amp;lt;"
# yields the literal text "&lt;" (matching html.unescape and the SAX tier).
_NAMED_ENTITIES = {
    "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&#39;": "'", "&apos;": "'", "&nbsp;": " ",
    "&amp;": "&",  # keep last — see note above
}

_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|header|"
    "footer|nav|aside|blockquote|pre|form|hr|dd|dt|dl"
)


def strip_tags_catalyst(col: Column | str) -> Column:
    """Markup -> plain text, fully JVM-side. Block tags become newlines so
    downstream block logic (chunking, dedup) sees paragraph structure."""
    c = F.col(col) if isinstance(col, str) else col
    # (?is): dot matches newlines, case-insensitive tag names
    c = F.regexp_replace(c, r"(?is)<(script|style|noscript)\b.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in _NAMED_ENTITIES.items():
        c = F.regexp_replace(c, ent, ch)
    # collapse intra-line runs of spaces/tabs; keep the newline structure
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # F.trim strips spaces only — drop the edge newlines block tags leave
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def _parse_blocks(markup: str) -> list[tuple[str, int, int]]:
    """SAX-parse one document -> [(block_text, n_chars, n_link_chars)]."""
    from html.parser import HTMLParser

    skip_tags = {"script", "style", "head", "noscript", "template"}
    block_re = set(_BLOCK_TAGS.split("|"))

    class Extractor(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.blocks: list[tuple[str, int, int]] = []
            self.buf: list[str] = []
            self.link_chars = 0
            self.skip_depth = 0
            self.a_depth = 0

        def _flush(self):
            text = "".join(self.buf).strip()
            if text:
                self.blocks.append((text, len(text), self.link_chars))
            self.buf = []
            self.link_chars = 0

        def handle_starttag(self, tag, attrs):
            if tag in skip_tags:
                self.skip_depth += 1
            elif tag == "a":
                self.a_depth += 1
            if tag in block_re:
                self._flush()

        def handle_endtag(self, tag):
            if tag in skip_tags:
                self.skip_depth = max(0, self.skip_depth - 1)
            elif tag == "a":
                self.a_depth = max(0, self.a_depth - 1)
            if tag in block_re:
                self._flush()

        def handle_data(self, data):
            if self.skip_depth:
                return
            self.buf.append(data)
            if self.a_depth:
                self.link_chars += len(data.strip())

    p = Extractor()
    try:
        p.feed(markup)
        p.close()
    except Exception:
        pass  # html.parser is tolerant; belt-and-braces for exotic input
    p._flush()
    return p.blocks


def extract_main_text(
    docs: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    min_block_chars: int = 40,
    max_link_density: float = 0.35,
) -> DataFrame:
    """-> input columns + (out_col string, n_blocks_kept int,
    n_blocks_total int, link_density double).

    A block survives when it is substantial (>= min_block_chars) AND not
    link-dominated (anchor-text share <= max_link_density) — the
    text-density boilerplate rule. Short link-sparse blocks (headlines)
    survive only when adjacent to a kept block, so isolated menu entries
    drop but a title directly above its article stays."""

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            texts, kept_ns, total_ns, densities = [], [], [], []
            for markup in pdf[html_col]:
                blocks = _parse_blocks(markup or "")
                substantial = [
                    (n >= min_block_chars)
                    and (lc / n <= max_link_density if n else False)
                    for _, n, lc in blocks
                ]
                keep = list(substantial)
                for i, (_, n, lc) in enumerate(blocks):
                    if keep[i] or n == 0:
                        continue
                    # headline rescue: short but link-sparse and adjacent
                    # to substantial content
                    link_sparse = lc / n <= max_link_density
                    near = (i > 0 and substantial[i - 1]) or (
                        i + 1 < len(blocks) and substantial[i + 1]
                    )
                    keep[i] = link_sparse and near
                kept = [b for b, k in zip(blocks, keep) if k]
                text = "\n".join(b[0] for b in kept)
                tot_chars = sum(n for _, n, _ in blocks) or 1
                tot_links = sum(lc for _, _, lc in blocks)
                texts.append(text)
                kept_ns.append(sum(keep))
                total_ns.append(len(blocks))
                densities.append(tot_links / tot_chars)
            pdf[out_col] = texts
            pdf["n_blocks_kept"] = kept_ns
            pdf["n_blocks_total"] = total_ns
            pdf["link_density"] = densities
            yield pdf

    base = [c for c in docs.columns if c != out_col]
    schema = ", ".join(
        f"{name} {dtype}" for name, dtype in docs.dtypes if name in base
    ) + (
        f", {out_col} string, n_blocks_kept int, n_blocks_total int, "
        "link_density double"
    )
    return docs.select(base).mapInPandas(kernel, schema)

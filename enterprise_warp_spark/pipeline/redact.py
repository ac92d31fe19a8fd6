"""Pattern redaction for training corpora: emails, URLs, IP addresses,
long digit runs (phone/account numbers) replaced with typed placeholders.

The standard PII-scrubbing pass before a corpus ships (C4 and most
open-data pipelines run exactly this family of regexes). Pure Catalyst:
one regexp_replace per category chained in a single projection plus one
regexp_count per category for the audit columns — no Python, one scan,
no shuffle; at 100 TB this is a map-only stage.

These regexes are the pragmatic corpus-hygiene versions (match the common
shapes, tolerate false positives on placeholder-dense text), not a
compliance-grade PII system — swap PATTERNS for a stricter set as needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# category -> (regex, placeholder); order matters: emails before bare digit
# runs so an address is one <EMAIL>, not a mangled digit blot.
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"(https?://|www\.)[^\s]+", "<URL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("digits", r"\b\d{7,}\b", "<NUMBER>"),
)


def redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PATTERNS,
    out_col: str = "text_redacted",
) -> DataFrame:
    """-> df + `out_col` (scrubbed text) + one `n_<category>` count column
    per pattern (audit trail: how much was redacted where)."""
    counts = [
        # F.lit pattern (not an F.expr SQL string): sidesteps the SQL
        # string-literal escape pass that would eat the regex backslashes
        F.regexp_count(F.col(text_col), F.lit(rx)).alias(f"n_{name}")
        for name, rx, _ in patterns
    ]
    scrubbed = F.col(text_col)
    for _, rx, placeholder in patterns:
        scrubbed = F.regexp_replace(scrubbed, rx, placeholder)
    return df.select("*", *counts, scrubbed.alias(out_col))

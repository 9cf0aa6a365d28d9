"""PII redaction over web text: vectorized RE2 scrubbing of emails,
IPv4 addresses, and international-format phone numbers.

Kernel parity: both pyarrow.compute's regex functions and DuckDB's
``regexp_replace``/``regexp_extract_all`` are RE2, so one pattern
string gives byte-identical behavior in the operator and the oracle.

Counting and replacement run SEQUENTIALLY per pattern (count emails on
the raw text, scrub them, count IPs on the email-scrubbed text, …) so
a digit run inside a just-scrubbed span is never double-reported; the
SQL oracle nests ``regexp_replace`` in the same order.

Scale shape: a single stateless ``map_batches`` — no shuffle, no
state, no driver traffic; the slowest corpus-wide stage possible is
the regex engine itself.

Reference scope note: the reference has no PII stage (it links
entities in already-published encyclopedia text); this is one of the
beyond-reference LLM-pipeline operators.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

__all__ = ["pii_scrub", "PII_PATTERNS"]

# (name, RE2 pattern, replacement token) — applied in order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "ip",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+\d{1,3}[ \-]\d{3,4}[ \-]\d{4}\b",
        "<PHONE>",
    ),
]


def pii_scrub(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """``(doc_id, text, n_email, n_ip, n_phone)`` — scrubbed text plus
    per-pattern redaction counts."""

    def fn(t: pa.Table) -> pa.Table:
        text = t[text_col]
        cols: dict[str, pa.ChunkedArray | pa.Array] = {id_col: t[id_col]}
        counts = {}
        for name, pat, token in PII_PATTERNS:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()
            )
            text = pc.replace_substring_regex(text, pat, token)
        cols[text_col] = text
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")

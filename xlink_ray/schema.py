"""Arrow schemas for every logical table in the engine (SURVEY.md §1.2).

The reference (solitaryzero/XLink) has no schema system — each format is
a positional convention over delimited text (see SURVEY.md §1.1). Here
every table is a declared ``pyarrow.Schema``; nested dicts in the
reference (``mention_anchors``, ``out_links``) are flattened into long
relational tables, and the in-band ``'__all__'`` sentinel key
(reference datatool/pipeline/generate_prob_files.py:92-119) is replaced
by proper grouped totals.
"""

from __future__ import annotations

import pyarrow as pa

# --- input per BASELINE.json input_hint: Common-Crawl-style web pages ---
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # annotated text with [[entity_id|mention]] markup
        ("lang", pa.string()),
    ]
)

# standard corpus: one row per page, markup stripped
CORPUS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("text", pa.string()),
    ]
)

# exploded mention/anchor rows (reference utils/mention.py:1-41 output)
MENTIONS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("mention", pa.string()),  # lowercased at extraction (extract_mention_anchors.py:41)
        ("entity_id", pa.string()),
        ("offset", pa.int64()),  # char offset into the plain text
    ]
)

ENTITY_DICT = pa.schema(
    [
        ("entity_id", pa.string()),
        ("title", pa.string()),
        ("sub_title", pa.string()),
        ("uris", pa.list_(pa.string())),
    ]
)

# flattened mention_anchors (reference: nested dict mention→{eid→count})
MENTION_ANCHORS = pa.schema(
    [
        ("mention", pa.string()),
        ("entity_id", pa.string()),
        ("link_count", pa.int64()),
    ]
)

OUT_LINKS = pa.schema([("src", pa.string()), ("dst", pa.string())])

SELF_LINKS = pa.schema([("mention", pa.string()), ("count", pa.int64())])

FREQ_M = pa.schema([("mention", pa.string()), ("freq", pa.int64())])

# probability tables (reference generate_prob_files.py:84-223)
LINK_PROB = pa.schema(
    [
        ("mention", pa.string()),
        ("entity_id", pa.string()),
        ("link_m", pa.int64()),
        ("freq_m", pa.int64()),
        ("link_prob", pa.float64()),
        ("e_given_m", pa.float64()),
    ]
)

ENTITY_PRIOR = pa.schema([("entity_id", pa.string()), ("prior", pa.float64())])

M_GIVEN_E = pa.schema(
    [("entity_id", pa.string()), ("mention", pa.string()), ("prob", pa.float64())]
)

EMBEDDINGS = pa.schema(
    [
        ("item", pa.string()),
        ("kind", pa.string()),  # 'word' | 'entity'
        ("vec", pa.list_(pa.float32())),
    ]
)

# per-document predicted links (online path output, reference models.py:58-106)
LINKS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("label", pa.string()),
        ("entity_id", pa.string()),
        ("believe", pa.float64()),
        ("parse_from", pa.string()),
    ]
)

# record-linkage views
EDGES = pa.schema(
    [
        ("key", pa.string()),  # blocking key the pair was generated under
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("score", pa.float64()),
    ]
)

CLUSTERS = pa.schema([("member_id", pa.string()), ("cluster_id", pa.string())])

"""Mention/plain-text extraction from annotated documents (SURVEY.md §2.2 M1).

Faithful reimplementation of the reference semantics of
``extract_mention_and_plain_text_from_annotated_doc``
(reference utils/mention.py:1-41), which is the "byte-identical
extracted text per url" invariant of BASELINE.json. The quirks below
are part of the spec (SURVEY.md §7.4) and are reproduced exactly:

* a ``[[…`` segment whose head contains no ``|`` is skipped entirely —
  including the plain text that follows its ``]]`` (the reference's
  bare ``continue``),
* ``instance_id.strip('[')`` discards its result in the reference
  (a no-op), so entity ids keep any leading ``[``,
* within one ``[[``-segment, only the text up to the *second* ``]]``
  survives (``seg.split("]]")`` then only index 1 is appended),
* mentions are recorded with their char offset into the plain text.

Ray Data shape: a single ``map_batches`` (zero-copy Arrow in) producing
either the corpus table (plain text per doc) or the exploded mentions
table. Documents without any ``[[`` take a vectorized fast path.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "extract_mentions_and_plain_text",
    "ExtractCorpusBatch",
    "ExtractMentionsBatch",
    "html_to_text",
]


def extract_mentions_and_plain_text(
    document: str,
) -> tuple[list[tuple[str, str, int]], str]:
    """Return ``([(mention, entity_id, offset), ...], plain_text)``.

    Byte-for-byte equivalent to reference utils/mention.py:1-41.
    """
    segs = document.split("[[")
    if len(segs) < 2:
        return [], document

    mention_anchor_list: list[tuple[str, str, int]] = []
    parts: list[str] = [segs[0]]
    plain_len = len(segs[0])

    for seg in segs[1:]:
        seg_segs = seg.split("]]")
        head = seg_segs[0]
        bar = head.find("|")
        if bar < 0:
            # reference: except → continue (drops the tail text too)
            continue
        instance_id = head[:bar]
        mention = head[bar + 1 :]
        # reference line 34: `instance_id.strip('[')` result discarded — keep id as-is
        mention_anchor_list.append((mention, instance_id, plain_len))
        parts.append(mention)
        plain_len += len(mention)
        if len(seg_segs) > 1:
            parts.append(seg_segs[1])
            plain_len += len(seg_segs[1])

    return mention_anchor_list, "".join(parts)


def _doc_id_and_text(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
    """Accept either a pages batch (url/text) or a corpus batch (doc_id/text)."""
    names = batch.column_names
    id_col = "doc_id" if "doc_id" in names else "url"
    return batch[id_col], batch["text"]


class ExtractCorpusBatch:
    """pages → corpus (doc_id, text): strip ``[[eid|mention]]`` markup.

    Stateless; usable as a plain function in ``map_batches``. Rows whose
    text contains no ``[[`` pass through without per-row Python work.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, texts = _doc_id_and_text(batch)
        has_markup = pc.match_substring(texts, "[[").to_numpy(zero_copy_only=False)
        text_np = texts.to_numpy(zero_copy_only=False)
        if has_markup.any():
            out = text_np.copy()
            idx = np.nonzero(has_markup)[0]
            for i in idx:
                out[i] = extract_mentions_and_plain_text(text_np[i])[1]
            text_arr: Any = pa.array(out, type=pa.string())
        else:
            text_arr = texts
        return pa.table({"doc_id": ids.cast(pa.string()), "text": text_arr})


class ExtractMentionsBatch:
    """pages/corpus → exploded mentions (doc_id, mention, entity_id, offset).

    Mentions are lowercased here, matching the reference extraction loop
    (datatool/pipeline/extract_mention_anchors.py:41). Set
    ``lowercase=False`` to keep the raw surface form.
    """

    def __init__(self, lowercase: bool = True):
        self.lowercase = lowercase

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, texts = _doc_id_and_text(batch)
        id_np = ids.to_numpy(zero_copy_only=False)
        text_np = texts.to_numpy(zero_copy_only=False)
        doc_ids: list[str] = []
        mentions: list[str] = []
        entity_ids: list[str] = []
        offsets: list[int] = []
        for did, text in zip(id_np, text_np):
            if "[[" not in text:
                continue
            pairs, _ = extract_mentions_and_plain_text(text)
            for mention, eid, off in pairs:
                doc_ids.append(did)
                mentions.append(mention.lower() if self.lowercase else mention)
                entity_ids.append(eid)
                offsets.append(off)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "mention": pa.array(mentions, type=pa.string()),
                "entity_id": pa.array(entity_ids, type=pa.string()),
                "offset": pa.array(offsets, type=pa.int64()),
            }
        )


def html_to_text(batch: pa.Table, html_col: str = "html", out: str = "text") -> pa.Table:
    """pages (html: binary) → recovered page text (input_hint contract:
    the crawl table's primary payload is the raw html bytes; `text` is
    derived). Fully vectorized Arrow kernels — utf-8 cast, script/style
    block removal, tag strip, standard entity decode — no per-row
    Python. For the synthesized crawl (``<html><body>…</body></html>``
    wrappers) the recovery is byte-identical to the marked text, which
    the byte-identity oracle pins end-to-end through extraction.

    Stateless; use as ``pages.map_batches(html_to_text)``. Columns other
    than ``html_col`` pass through (minus any existing ``out`` column).
    """
    s = pc.cast(batch[html_col], pa.string())
    # drop script/style blocks first (their content is not text)
    s = pc.replace_substring_regex(s, r"(?s)<script[^>]*>.*?</script>", "")
    s = pc.replace_substring_regex(s, r"(?s)<style[^>]*>.*?</style>", "")
    # strip remaining tags
    s = pc.replace_substring_regex(s, r"<[^>]*>", "")
    # standard entity decode (amp LAST so &amp;lt; decodes to the
    # literal '&lt;', matching html.unescape's non-recursive rule)
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        s = pc.replace_substring(s, ent, ch)
    keep = [c for c in batch.column_names if c not in (html_col, out)]
    tbl = batch.select(keep)
    return tbl.append_column(out, s)

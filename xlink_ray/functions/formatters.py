"""Output formatters — M14 (reference
evaluation/build_dataset/OutputFormatter.py:12-104): render a per-doc
list of predicted links in the reference's output shapes. Pure batch
functions over the links table grouped by doc.
"""

from __future__ import annotations

import json

__all__ = [
    "format_human",
    "format_json",
    "format_batch_for_json",
    "format_dataset_tuples",
    "format_annotated_doc",
    "format_annotated_doc_with_url",
]

Link = tuple  # (start, end, label, entity_id, believe)


def format_human(doc_id: str, links: list[Link]) -> str:
    """Human-readable: one ``start..end label -> entity (believe)`` per
    line (OutputFormatter.format shape)."""
    lines = [f"# {doc_id}"]
    for start, end, label, eid, believe in sorted(links):
        lines.append(f"{start}..{end}\t{label}\t->\t{eid}\t({believe:.4f})")
    return "\n".join(lines)


def format_json(doc_id: str, links: list[Link]) -> str:
    """JSON: the reference's dict-per-mention list."""
    return json.dumps(
        {
            "doc_id": doc_id,
            "mentions": [
                {"start": s, "end": e, "label": lb, "entity_id": eid, "believe": bv}
                for s, e, lb, eid, bv in sorted(links)
            ],
        },
        ensure_ascii=False,
    )


def format_batch_for_json(doc_ids: list[str], links_per_doc: "list[list[Link]]") -> list[str]:
    """Batch wrapper over ``format_json`` — one JSON string per doc
    (reference OutputFormatter.format_batch_for_json, OutputFormatter.py:45-50,
    which maps format_for_json over a list of mention lists)."""
    return [format_json(d, ln) for d, ln in zip(doc_ids, links_per_doc)]


def format_dataset_tuples(links: list[Link]) -> list[list]:
    """Eval-dataset tuples ``(start, end, label, entity_id|"NIL")`` —
    the annotations.json row shape (reference DatasetLoader.py:8-27)."""
    return [
        [s, e, lb, eid if eid is not None else "NIL"] for s, e, lb, eid, _ in sorted(links)
    ]


def format_annotated_doc(document: str, links: list[Link]) -> str:
    """Re-annotate the plain document with ``[[entity_id|label]]``
    markup at the predicted spans (non-overlapping, sorted)."""
    out = []
    cur = 0
    for s, e, lb, eid, _ in sorted(links):
        if s < cur:
            continue  # skip overlaps defensively
        out.append(document[cur:s])
        out.append(f"[[{eid}|{document[s:e]}]]")
        cur = e
    out.append(document[cur:])
    return "".join(out)


_XLORE_URL = "https://xlore.org/instance.html?url=http://xlore.org/instance/"


def format_annotated_doc_with_url(document: str, links: list[Link]) -> str:
    """The 5th output-formatter variant (reference
    OutputFormatter.format_as_annotated_doc_with_url,
    OutputFormatter.py:74-91): each predicted span is REPLACED with
    ``【label|[entity](url)】`` markdown, the url pointing at the xlore
    instance page. Reference quirks reproduced: when no entity was
    predicted the link text is empty but the BASE url still renders
    (the id is appended only when non-empty), and the span text itself
    is consumed (label comes from the mention, not the document
    slice)."""
    out: list[str] = []
    cur = 0
    for s, e, lb, eid, _ in sorted(links):
        if s < cur:
            continue  # skip overlaps defensively (same rule as above)
        out.append(document[cur:s])
        cand = eid if eid else ""
        url = _XLORE_URL + cand if cand else _XLORE_URL
        out.append(f"【{lb}|[{cand}]({url})】")
        cur = e
    out.append(document[cur:])
    return "".join(out)

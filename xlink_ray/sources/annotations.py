"""AIDA-CoNLL annotation import + docs/annotations.json eval datasets
— M15 + the S12 loader (reference
evaluation/build_dataset/AnnotationFormatter.py:27-86,
evaluation/DatasetLoader.py:8-27).

``parse_aida_lines`` reproduces the reference formatter's document
reconstruction exactly, including its quirks:

* token lines append ``token + ' '``; punctuation-only lines strip the
  trailing space first and append unspaced; blank lines become a
  newline (AnnotationFormatter.py:41-46),
* a ``B`` mention records (start=len(doc) at that moment,
  end=start+len(label)); ``I`` continuation lines are skipped — the
  full label was already appended by the B line
  (AnnotationFormatter.py:52-72),
* ``--NME--`` and unresolvable wiki uris become entity ``"NIL"``; the
  wiki uri is taken as ``line[4][23:]`` — the hardcoded
  'http://en.wikipedia.org' host strip (AnnotationFormatter.py:57),
* the LAST document is appended un-stripped, and dropped entirely when
  it has no mentions (AnnotationFormatter.py:74-76) — reproduced as
  spec.

``load_annotation_dataset`` is the S12 loader: docs.json +
annotations.json → Arrow tables shaped for ``stages.evaluation``.
"""

from __future__ import annotations

import json
import os
import string
from typing import Callable

import pyarrow as pa

__all__ = [
    "parse_aida_lines",
    "format_annotation_dataset",
    "load_annotation_dataset",
    "synth_aida_fixture",
]

_WIKI_HOST_LEN = 23  # len('http://en.wikipedia.org') — reference's slice


def parse_aida_lines(
    lines: "list[str]", resolve_uri: "Callable[[str], str | None] | None" = None
):
    """CoNLL/AIDA lines → (docs, mentions, xlore_misses, nme_mentions).

    ``mentions[d]`` is a list of (start, end, label, entity_id) with
    entity_id "NIL" for --NME-- and unresolved uris, matching the
    reference formatter's annotations.json rows.
    """
    resolve = resolve_uri or (lambda uri: None)
    docs: list[str] = []
    mentions: list[list[tuple]] = []
    xlore_misses: list[str] = []
    nme_mentions: list[str] = []

    doc = ""
    doc_mentions: list[tuple] = []
    for line in lines:
        if line.startswith("-DOCSTART-"):
            doc = doc.strip()
            if len(doc) > 0:
                docs.append(doc)
                mentions.append(doc_mentions)
            doc, doc_mentions = "", []
        elif len(line.strip()) == 0:
            doc = doc.strip(" ")
            doc += "\n"
        elif line.strip() in string.punctuation:
            doc = doc.strip(" ")
            doc += line.strip()
        else:
            arr = line.rstrip("\n").strip().split("\t")
            if len(arr) > 1:
                token, flag, label, yago_id = arr[0], arr[1], arr[2], arr[3]
                if flag == "B":
                    start, end = len(doc), len(doc) + len(label)
                    if yago_id != "--NME--":
                        wiki_uri = arr[4][_WIKI_HOST_LEN:]
                        eid = resolve(wiki_uri)
                        if eid is not None:
                            doc_mentions.append((start, end, label, eid))
                        else:
                            doc_mentions.append((start, end, label, "NIL"))
                            xlore_misses.append(wiki_uri)
                    else:
                        nme_mentions.append(label)
                        doc_mentions.append((start, end, label, "NIL"))
                if flag != "I":
                    doc += label + " "
            else:
                doc += arr[0] + " "
    # reference quirk: the final document is appended un-stripped, and
    # only when it carries at least one mention
    if len(doc_mentions) > 0:
        mentions.append(doc_mentions)
        docs.append(doc)
    return docs, mentions, xlore_misses, nme_mentions


def format_annotation_dataset(
    raw_path: str,
    out_dir: str,
    resolve_uri: "Callable[[str], str | None] | None" = None,
) -> "tuple[int, int]":
    """Reference ``AIDAYAGO2Formatter.format``: write docs.json +
    annotations.json (+ xlore_misses.json) under ``out_dir``. Returns
    (n_docs, n_mentions)."""
    with open(raw_path, "r", encoding="utf-8") as rf:
        docs, mentions, misses, _nme = parse_aida_lines(rf.readlines(), resolve_uri)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "annotations.json"), "w", encoding="utf-8") as f:
        json.dump(mentions, f, indent=4, ensure_ascii=False)
    with open(os.path.join(out_dir, "docs.json"), "w", encoding="utf-8") as f:
        json.dump(docs, f, indent=4, ensure_ascii=False)
    with open(os.path.join(out_dir, "xlore_misses.json"), "w", encoding="utf-8") as f:
        json.dump(misses, f, indent=4, ensure_ascii=False)
    return len(docs), sum(len(m) for m in mentions)


def load_annotation_dataset(dataset_dir: str) -> "tuple[pa.Table, pa.Table]":
    """S12 loader (reference DatasetLoader.load_dataset): docs.json +
    annotations.json → (docs table (doc_id, text), gold table
    (doc_id, offset, mention, entity_id)). doc_id = stringified index,
    the stable per-dataset document key."""
    with open(os.path.join(dataset_dir, "docs.json"), "r", encoding="utf-8") as f:
        docs = json.load(f)
    with open(os.path.join(dataset_dir, "annotations.json"), "r", encoding="utf-8") as f:
        mentions = json.load(f)
    docs_tbl = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(docs))], pa.string()),
            "text": pa.array(docs, pa.string()),
        }
    )
    rows = {"doc_id": [], "offset": [], "end": [], "mention": [], "entity_id": []}
    for i, doc_mentions in enumerate(mentions):
        for start, end, label, eid in doc_mentions:
            rows["doc_id"].append(str(i))
            rows["offset"].append(int(start))
            rows["end"].append(int(end))
            rows["mention"].append(label)
            rows["entity_id"].append(eid)
    gold_tbl = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.string()),
            "offset": pa.array(rows["offset"], pa.int64()),
            "end": pa.array(rows["end"], pa.int64()),
            "mention": pa.array(rows["mention"], pa.string()),
            "entity_id": pa.array(rows["entity_id"], pa.string()),
        }
    )
    return docs_tbl, gold_tbl


def synth_aida_fixture(raw_path: str, sf_dir: str, n_docs: int = 40) -> str:
    """Deterministic AIDA-format raw file derived from the synth corpus
    (no external data): each document's tokens become CoNLL lines;
    alias tokens become B-mentions linked via the synthetic KB uri
    (resolvable through synth_entity_dict), every 7th mention is
    --NME-- and every 11th points at an unknown wiki page (exercising
    the NIL and miss paths)."""
    import pyarrow.parquet as pq

    from xlink_ray.synth import ALIAS_DICT

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).sort_by("doc_id")
    lines: list[str] = []
    k = 0
    for did, text in zip(
        docs["doc_id"].to_pylist()[:n_docs], docs["text"].to_pylist()[:n_docs]
    ):
        lines.append(f"-DOCSTART- ({did} testb)\n")
        for tok in text.split():
            cands = ALIAS_DICT.get(tok)
            if cands is None:
                lines.append(f"{tok}\n")
                continue
            k += 1
            eid = cands[int(did) % len(cands)]
            if k % 7 == 0:
                lines.append(f"{tok}\tB\t{tok}\t--NME--\n")
            elif k % 11 == 0:
                lines.append(
                    f"{tok}\tB\t{tok}\tYAGO:{tok}\thttp://en.wikipedia.org/wiki/__unknown__\n"
                )
            else:
                lines.append(
                    f"{tok}\tB\t{tok}\tYAGO:{tok}\thttp://en.wikipedia.org/wiki/{eid}\n"
                )
        lines.append("\n")
    os.makedirs(os.path.dirname(raw_path), exist_ok=True)
    with open(raw_path, "w", encoding="utf-8") as f:
        f.writelines(lines)
    return raw_path


def synth_uri_resolver() -> "Callable[[str], str | None]":
    """Resolver over the synthetic entity dictionary: '/wiki/<eid>' →
    eid (J5-style uri-first resolution; unknown pages → None)."""
    from xlink_ray.synth import synth_entity_dict

    known = set(synth_entity_dict()["entity_id"].to_pylist())

    def resolve(wiki_uri: str) -> "str | None":
        name = wiki_uri.rsplit("/", 1)[-1]
        return name if name in known else None

    return resolve

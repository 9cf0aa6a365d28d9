"""Text-format sources of the reference, re-expressed for Ray Data
(SURVEY.md §2.1 S1-S4): TTL entity reader, entity-dictionary lines,
corpus-line validation, infobox pre-refine.

Each parser is a pure batch function over lines (``read_text`` →
``map_batches``); the TTL reader is per-file (files are the shard unit
— its line-to-line state machine cannot split mid-entity, so
``read_binary_files`` hands each file to one task).

Reference quirks reproduced deliberately (output-visible behavior):

* TTL: the first 19 lines are skipped (counter < 20,
  prepare_standard_input.py:24) and the LAST entity in a file is never
  flushed (no post-loop save, ibid. 26-37) — both reproduced,
* infobox: ``new_info.strip(",")`` discards its result (ibid. 123,
  133), so the flattened k,v string keeps its trailing comma,
* ``is_annotation_valid`` checks the bracket-depth bounds at the TOP
  of the loop, so a document whose final chars push the depth out of
  range still validates (ibid. 77-90).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ray.data import Dataset

__all__ = [
    "is_annotation_valid",
    "validate_corpus_lines",
    "parse_entity_dict_lines",
    "parse_ttl_file",
    "ttl_entities",
    "refine_infobox_lines",
]


def is_annotation_valid(annotated_text: str) -> bool:
    """Balanced, non-nested ``[[ ]]`` check — semantics of reference
    prepare_standard_input.py:77-90 including the top-of-loop bound
    check quirk."""
    text_len = len(annotated_text)
    left_num, index = 0, 0
    while index < text_len:
        if left_num < 0 or left_num > 1:
            return False
        ch = annotated_text[index]
        if index + 1 < text_len and ch == "[" and annotated_text[index + 1] == "[":
            index += 2
            left_num += 1
            continue
        if index + 1 < text_len and ch == "]" and annotated_text[index + 1] == "]":
            index += 2
            left_num -= 1
            continue
        index += 1
    return True


def _valid_line(source: str, line: str) -> bool:
    arr = line.strip().split("\t\t")
    if source == "bd" and len(arr) == 4 and is_annotation_valid(arr[3]):
        return True
    if source == "wiki" and len(arr) == 3 and is_annotation_valid(arr[2]):
        return True
    return False


def validate_corpus_lines(lines: Dataset, source: str = "bd") -> Dataset:
    """S3: keep raw corpus lines passing ``is_corpus_line_valid``
    (reference prepare_standard_input.py:93-96); dropped lines are
    counted in an ``errors`` column aggregate by the caller if needed."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = [
            _valid_line(source, ln) for ln in batch["text"].to_pylist()
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return lines.map_batches(fn, batch_format="pyarrow")


def parse_entity_dict_lines(lines: Dataset) -> Dataset:
    """S2: ``title\\t\\tsub_title\\t\\turi_1::;uri_2…\\t\\tentity_id``
    → entity_dict table (reference utils/dictionary.py:60,79-111).
    Malformed lines are dropped (reference swallows per-line errors)."""

    def fn(batch: pa.Table) -> pa.Table:
        titles, subs, uris, ids = [], [], [], []
        for ln in batch["text"].to_pylist():
            arr = ln.strip("\n").split("\t\t")
            if len(arr) != 4:
                continue
            titles.append(arr[0])
            subs.append(arr[1])
            uris.append(arr[2].split("::;") if arr[2] else [])
            ids.append(arr[3])
        return pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "title": pa.array(titles, pa.string()),
                "sub_title": pa.array(subs, pa.string()),
                "uris": pa.array(uris, pa.list_(pa.string())),
            }
        )

    return lines.map_batches(fn, batch_format="pyarrow")


def parse_ttl_file(content: str, source: str = "bd") -> list[tuple[str, str]]:
    """S1 state machine (reference prepare_standard_input.py:13-40):
    consecutive lines per subject assemble id → full_title; the
    rdfs:label line contributes the title, a property:supplement line
    appends the parenthesized sub-title (CJK parens for bd, ASCII for
    wiki). Skips the first 19 lines; never flushes the final entity."""
    inst_id: str | None = None
    inst_title = ""
    out: list[tuple[str, str]] = []
    counter = 0
    for line in content.splitlines():
        counter += 1
        if counter < 20:
            continue
        line_inst_id = line.strip().split(">")[0][1:]
        if line_inst_id != inst_id:
            if inst_id is not None:
                out.append((inst_id, inst_title))
            inst_id = line_inst_id
            inst_title = ""
        else:
            if "property:supplement" in line:
                sub = line.strip().split('"')[1].split('"')[0]
                inst_title += f"（{sub}）" if source == "bd" else f"({sub})"
            elif "rdfs:label" in line:
                inst_title += line.strip().split('"')[1].split('"')[0]
    return out


def ttl_entities(files: Dataset, source: str = "bd") -> Dataset:
    """pages of ``read_binary_files(..., include_paths=True)`` → one
    (entity_id, full_title) table per .ttl file (file = shard unit)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles = [], []
        for data in batch["bytes"].to_pylist():
            for eid, title in parse_ttl_file(data.decode("utf-8"), source):
                ids.append(eid)
                titles.append(title)
        return pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "full_title": pa.array(titles, pa.string()),
            }
        )

    return files.map_batches(fn, batch_format="pyarrow")


def refine_infobox_lines(lines: Dataset, source: str = "bd") -> Dataset:
    """S4 infobox pre-refine (reference prepare_standard_input.py:102-136):
    JSON infobox → ``k,v,k,v,…`` flat string (trailing comma kept —
    the reference's no-op strip), fromtitle query stripped from the
    url; bad rows dropped."""
    prefix = "https://baike.baidu.com/item/"

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for ln in batch["text"].to_pylist():
            try:
                if source == "bd":
                    title, sub_title, url, info = ln.split("\t\t")
                    url = prefix + url[len(prefix):].split("?")[0]
                    kv = json.JSONDecoder().decode(info.strip())
                    new_info = "".join(f"{k},{kv[k]}," for k in kv)
                    out.append(f"{title}\t\t{sub_title}\t\t{url}\t\tinfobox::;{new_info}")
                else:
                    title, url, info = ln.split("\t\t")
                    kv = json.JSONDecoder().decode(info.strip())
                    new_info = "".join(f"{k},{kv[k]}," for k in kv)
                    out.append(f"{title}\t\t{url}\t\tinfobox::;{new_info}")
            except Exception:  # noqa: BLE001 — reference swallows per-line errors
                continue
        return pa.table({"text": pa.array(out, pa.string())})

    return lines.map_batches(fn, batch_format="pyarrow")

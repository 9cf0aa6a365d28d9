"""Corpus standardization — M2 ``corpus_full_refine`` + J5 entity
resolution (reference datatool/pipeline/prepare_standard_input.py:333-516,
utils/dictionary.py:115-139) as an actor-pool stage over raw corpus
lines with the entity dictionary broadcast once per actor.

Semantics reproduced (bd path; wiki path analogous):

* line validity gate (column count + balanced non-nested ``[[ ]]``),
* page resolution: fromtitle-stripped, quote-stripped url → uri lookup
  (exact, then parent-path fallback) → full-title fallback; unresolved
  pages are dropped and counted,
* the content keeps only what follows the first ``::;`` (corpus-kind
  tag); missing tag → error-dropped (reference IndexError→except),
* anchor rewrite: ``[[mention|uri]]`` → ``[[entity_id|mention]]`` when
  the uri (or the mention as title) resolves, else the mention as
  plain text; ``[[text]]`` without ``|`` stays plain text,
* ``mark_titles``: occurrences of the page title OUTSIDE anchors are
  wrapped as self-anchors ``[[eid|title]]`` (the self-link source for
  A1's self_links),
* output line: ``entity_id\\t\\trefined_annotated_text`` — the
  standard-corpus format every downstream stage consumes.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
from ray.data import Dataset

from xlink_ray.sources.text_formats import is_annotation_valid
from xlink_ray.util import pool_size

__all__ = ["EntityResolver", "CorpusRefineActor", "refine_corpus"]

BD_PREFIX = "https://baike.baidu.com/item/"
_QUOTE_RE = re.compile(r"item/%[Ee]2%80%9[Cc](.+?)%[Ee]2%80%9[Dd]/")


class EntityResolver:
    """J5 uri-then-title lookup chain over a broadcast entity_dict
    table (entity_id, title, sub_title, uris)."""

    def __init__(self, entity_dict: pa.Table, source: str = "bd"):
        self.source = source
        self.uri2id: dict[str, str] = {}
        self.title2id: dict[str, str] = {}
        for eid, title, sub, uris in zip(
            entity_dict["entity_id"].to_pylist(),
            entity_dict["title"].to_pylist(),
            entity_dict["sub_title"].to_pylist(),
            entity_dict["uris"].to_pylist(),
        ):
            full = title + (sub or "")
            key = full.lower() if source == "wiki" else full
            self.title2id.setdefault(key, eid)
            for u in uris or []:
                self.uri2id.setdefault(u.lower(), eid)

    def by_uri(self, uri: str) -> str | None:
        uri = uri.lower()
        res = self.uri2id.get(uri)
        if res is None:
            return self.uri2id.get("/".join(uri.split("/")[:-1]))
        return res

    def by_title(self, full_title: str) -> str | None:
        if self.source == "wiki":
            full_title = full_title.lower()
        return self.title2id.get(full_title)

    def by_uri_and_title(self, uri: str, title: str) -> str | None:
        return self.by_uri(uri) or self.by_title(title)


def refine_line_bd(line: str, resolver: EntityResolver, mark_titles: bool) -> str | None:
    """One bd raw-corpus line → ``eid\\t\\trefined_text`` or None."""
    arr = line.strip().split("\t\t")
    if len(arr) != 4 or not is_annotation_valid(arr[3]):
        return None
    try:
        title = arr[0].strip()
        sub_title = arr[1].strip()
        full_title = title + (sub_title if len(sub_title) > 1 else "")
        url = BD_PREFIX + arr[2][len(BD_PREFIX):].split("?")[0]
        url = _QUOTE_RE.sub(lambda m: "item/" + m.group(1) + "/", url)
        eid = resolver.by_uri_and_title(url, full_title)
        if eid is None:
            return None
        content = arr[3].split("::;", 1)[1].strip()
    except IndexError:
        return None

    def mark(text: str) -> str:
        if not mark_titles or not title:
            return text
        return re.sub(re.escape(title), lambda s: f"[[{eid}|{s.group()}]]", text)

    segs = content.split("[[")
    out = [mark(segs[0])]
    for seg in segs[1:]:
        seg_segs = seg.split("]]")
        ann = seg_segs[0].split("|")
        if len(ann) == 1:
            out.append(ann[0])
        else:
            mention, target_url = ann[0], BD_PREFIX + ann[1][len(BD_PREFIX):].split("?")[0]
            target = resolver.by_uri_and_title(target_url, mention)
            out.append(f"[[{target}|{mention}]]" if target is not None else mention)
        if len(seg_segs) > 1:
            out.append(mark(seg_segs[1]))
    refined = "".join(out)
    if refined == "":
        return None
    return f"{eid}\t\t{refined}"


class CorpusRefineActor:
    def __init__(self, dict_ref: "ray.ObjectRef", source: str = "bd", mark_titles: bool = False):
        self.resolver = EntityResolver(ray.get(dict_ref), source)
        self.mark_titles = mark_titles

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for ln in batch["text"].to_pylist():
            refined = refine_line_bd(ln, self.resolver, self.mark_titles)
            if refined is not None:
                out.append(refined)
        return pa.table({"text": pa.array(out, pa.string())})


def refine_corpus(
    lines: Dataset,
    dict_ref: "ray.ObjectRef",
    source: str = "bd",
    mark_titles: bool = False,
) -> Dataset:
    return lines.map_batches(
        CorpusRefineActor,
        fn_constructor_args=(dict_ref, source, mark_titles),
        batch_format="pyarrow",
        concurrency=pool_size(),
        num_cpus=1,
    )

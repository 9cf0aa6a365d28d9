"""Single-process transcription oracle of the flagship ER spec
(pipelines/flagship.py docstring). Uses the shared numeric kernel
``resolve_batch`` doc-at-a-time (so Ray batch composition is proven
irrelevant) but reimplements blocking, sorted-neighborhood edge
generation, and transitive clustering in plain Python — independent of
the Ray orchestration, the blocking stage, and the connected-components
implementations it cross-checks.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from xlink_ray.stages.candidates import build_link_state, resolve_batch
from xlink_ray.synth import mark_text, synth_embeddings


def oracle_clusters(sf_dir: str, edge_th: float = 0.0) -> dict[str, str]:
    """member_id (url#offset) → cluster_id per the flagship spec."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    sources = docs["source"].to_pylist()
    urls = [f"https://crawl.example.org/{s}/{d:08d}" for s, d in zip(sources, doc_ids)]

    # dictionary stats from the marked corpus (same derivation as
    # dictbuild, computed with plain dicts)
    from xlink_ray.stages.extract import extract_mentions_and_plain_text

    anchors: dict[tuple[str, str], int] = {}
    for d, text in zip(doc_ids, texts):
        pairs, _plain = extract_mentions_and_plain_text(mark_text(text, d))
        for mention, eid, _off in pairs:
            key = (mention.lower(), eid)
            anchors[key] = anchors.get(key, 0) + 1

    import pyarrow as pa

    ments, eids, counts = zip(*[(m, e, c) for (m, e), c in anchors.items()])
    link_m: dict[str, int] = {}
    for m, c in zip(ments, counts):
        link_m[m] = link_m.get(m, 0) + c
    ma_tbl = pa.table(
        {
            "mention": pa.array(ments),
            "entity_id": pa.array(eids),
            "e_given_m": pa.array([c / link_m[m] for m, c in zip(ments, counts)], pa.float64()),
        }
    )
    # freq_m: plain-text occurrence counts == link counts here (every
    # occurrence is annotated) ⇒ link_prob = link_m/freq_m = 1.0
    lp_tbl = pa.table(
        {
            "mention": pa.array(sorted(link_m.keys())),
            "link_prob": pa.array([1.0] * len(link_m), pa.float64()),
        }
    )
    state = build_link_state(ma_tbl, lp_tbl, synth_embeddings())

    # resolve one document at a time
    rows = []  # (member, mention, entity, doc_sort_key, offset, context)
    for url, d, text in zip(urls, doc_ids, texts):
        out = resolve_batch(state, [url], [text])
        for r in out.to_pylist():
            rows.append(
                (f"{url}#{r['offset']}", r["mention"], r["entity_id"], url, r["offset"], r["context"])
            )

    # blocking on (mention, entity); sorted-neighborhood edges
    emb = synth_embeddings()
    word_index = {
        it: i
        for i, (it, k) in enumerate(zip(emb["item"].to_pylist(), emb["kind"].to_pylist()))
        if k == "word"
    }
    vecs = np.asarray(emb["vec"].to_pylist(), dtype=np.float32)

    def ctx_vec(c: str) -> np.ndarray:
        acc = np.zeros(vecs.shape[1], dtype=np.float64)
        cnt = 0
        for tok in c.lower().split():
            j = word_index.get(tok)
            if j is not None:
                acc += vecs[j]
                cnt += 1
        return acc / cnt if cnt else acc

    from xlink_ray.pipelines.flagship import DOCS_PER_SALT

    blocks: dict[tuple, list] = {}
    for row in rows:
        doc_num = int(row[3][-8:])  # url ends with the 8-digit doc id
        blocks.setdefault((row[1], row[2], doc_num // DOCS_PER_SALT), []).append(row)

    parent: dict[str, str] = {r[0]: r[0] for r in rows}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: str, y: str) -> None:
        rx_, ry = find(x), find(y)
        if rx_ != ry:
            lo, hi = (rx_, ry) if rx_ < ry else (ry, rx_)
            parent[hi] = lo

    for _key, members in blocks.items():
        members.sort(key=lambda r: (r[3], r[4]))
        cvs = [ctx_vec(r[5]) for r in members]
        for i in range(len(members) - 1):
            a, b = cvs[i], cvs[i + 1]
            den = np.linalg.norm(a) * np.linalg.norm(b)
            cos = float(a @ b / den) if den > 0 else 0.0
            if cos >= edge_th:
                union(members[i][0], members[i + 1][0])

    return {m: find(m) for m in parent}

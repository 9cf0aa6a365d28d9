"""inverted_index (stages/index.py) vs a serial Python oracle, incl.
the doc-range-sharded hot-token path."""

from collections import Counter, defaultdict

import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.index import inverted_index


def _docs(texts, ids):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def _oracle(texts, ids):
    post = defaultdict(list)
    for did, t in sorted(zip(ids, texts)):
        for tok, n in sorted(Counter(t.split(" ")).items()):
            post[tok].append((did, n))
    return {
        tok: (len(ps), ",".join(f"{d}:{n}" for d, n in ps))
        for tok, ps in post.items()
    }


def test_inverted_index_matches_oracle(ray_session):
    texts = [
        "the cat sat on the mat",
        "the dog sat",
        "cat cat cat",
        "",
        "mat on mat",
    ]
    ids = [10, 3, 7, 99, 50]
    got = {
        r["token"]: (r["df"], r["postings"])
        for r in inverted_index(_docs(texts, ids)).take_all()
    }
    assert got == _oracle(texts, ids)
    assert got["cat"] == (2, "7:3,10:1")  # tf counted, doc order sorted


def test_inverted_index_doc_shards(ray_session):
    # shard_width=100: ids 0-99 → shard 0, 100-199 → shard 1; postings
    # concatenated across shards in shard order == unsharded postings
    texts = ["hot word"] * 4
    ids = [5, 150, 101, 42]
    rows = inverted_index(
        _docs(texts, ids), doc_shards=2, shard_width=100
    ).take_all()
    by_tok = defaultdict(dict)
    for r in rows:
        by_tok[r["token"]][r["shard"]] = (r["df"], r["postings"])
    assert by_tok["hot"][0] == (2, "5:1,42:1")
    assert by_tok["hot"][1] == (2, "101:1,150:1")
    merged = ",".join(by_tok["hot"][s][1] for s in sorted(by_tok["hot"]))
    assert merged == "5:1,42:1,101:1,150:1"

"""Duplicate n-gram coverage (stages/substring.py): hand-computed
coverage, within-doc repeats excluded, short docs, interval overlap."""

import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.substring import dup_ngram_coverage


def _run(docs, k=5, nbuckets=4):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    rows = dup_ngram_coverage(ds, k=k, nbuckets=nbuckets).take_all()
    return {r["doc_id"]: r for r in rows}


def test_shared_gram_covers_span(ray_session):
    got = _run(
        [
            (1, "a b c d e f g"),
            (2, "x a b c d e y"),
            (3, "q r s t u v w"),
        ]
    )
    assert got[1]["n_tokens"] == 7 and got[1]["dup_grams"] == 1 and got[1]["covered_tokens"] == 5
    assert got[2]["n_tokens"] == 7 and got[2]["dup_grams"] == 1 and got[2]["covered_tokens"] == 5
    assert got[3]["dup_grams"] == 0 and got[3]["covered_tokens"] == 0


def test_overlapping_dup_grams_union(ray_session):
    got = _run([(4, "a b c d e f"), (5, "a b c d e f z")])
    # two overlapping dup starts: union = min(1,5) + 5 = 6 tokens
    assert got[4]["dup_grams"] == 2 and got[4]["covered_tokens"] == 6
    assert got[5]["dup_grams"] == 2 and got[5]["covered_tokens"] == 6
    assert got[5]["n_tokens"] == 7


def test_within_doc_repeat_not_duplicated(ray_session):
    got = _run([(6, "m n o p q m n o p q"), (7, "1 2 3 4 5 6")])
    assert got[6]["dup_grams"] == 0 and got[6]["covered_tokens"] == 0
    assert got[7]["dup_grams"] == 0


def test_short_doc_zeroes(ray_session):
    got = _run([(8, "a b"), (9, "a b c d e"), (10, "z a b c d e")])
    assert got[8] == {"doc_id": 8, "n_tokens": 2, "dup_grams": 0, "covered_tokens": 0}
    # 9's single gram appears in 10 → fully covered
    assert got[9]["dup_grams"] == 1 and got[9]["covered_tokens"] == 5
    assert got[10]["dup_grams"] == 1 and got[10]["covered_tokens"] == 5


# ---- duplicate-span removal ----

from xlink_ray.stages.substring import strip_dup_spans


def test_strip_dup_spans_basic(ray_session):
    import ray.data as rd

    shared = "alpha beta gamma delta epsilon"  # one 5-gram
    docs = [
        {"doc_id": 1, "text": f"{shared} tail one"},
        {"doc_id": 2, "text": f"head {shared} tail two"},
        {"doc_id": 3, "text": "totally different words here now"},
    ]
    out = {r["doc_id"]: r for r in strip_dup_spans(rd.from_items(docs), k=5).take_all()}
    # doc 1 is the minimal holder: untouched
    assert out[1]["text"] == docs[0]["text"] and out[1]["removed_tokens"] == 0
    # doc 2 loses the shared run INCLUDING 'tail' (the overlapping
    # gram 'beta gamma delta epsilon tail' is also shared with doc 1)
    assert out[2]["text"] == "head two" and out[2]["removed_tokens"] == 6
    # doc 3 untouched (and too short / unique anyway)
    assert out[3]["text"] == docs[2]["text"] and out[3]["removed_tokens"] == 0


def test_strip_dup_spans_within_doc_repeat_kept(ray_session):
    import ray.data as rd

    t = "a b c d e a b c d e"  # gram repeats only within ONE doc
    out = strip_dup_spans(
        rd.from_items([{"doc_id": 7, "text": t}]), k=5
    ).take_all()
    assert out[0]["text"] == t and out[0]["removed_tokens"] == 0


def test_strip_dup_spans_full_overlap_strips_everything(ray_session):
    import ray.data as rd

    t = "one two three four five"
    out = {
        r["doc_id"]: r
        for r in strip_dup_spans(
            rd.from_items([{"doc_id": 1, "text": t}, {"doc_id": 2, "text": t}]), k=5
        ).take_all()
    }
    assert out[1]["text"] == t
    assert out[2]["text"] == "" and out[2]["removed_tokens"] == 5

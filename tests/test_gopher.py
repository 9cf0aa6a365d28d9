"""Gopher quality-rule bundle (stages/textstats.gopher_filter) vs a
plain-Python rule transcription."""

import pyarrow as pa

import ray.data as rd

STOPS = {"the", "of", "and", "to", "in", "is", "a"}


def _py_keep(text: str) -> bool:
    ws = text.split(" ")
    nw = len(ws)
    word_chars = len(text) - (nw - 1)
    n_alpha = sum(1 for w in ws if any(c.isascii() and c.isalpha() for c in w))
    n_stop = sum(1 for w in ws if w in STOPS)
    from collections import Counter

    bigrams = Counter(zip(ws, ws[1:]))
    top2 = max(bigrams.values()) if bigrams else 0
    n2 = sum(bigrams.values())
    return (
        30 <= nw <= 100_000
        and 3 * nw <= word_chars <= 10 * nw
        and 5 * n_alpha >= 4 * nw
        and n_stop >= 2
        and 5 * top2 <= n2
    )


def test_gopher_filter_matches_python_rules(ray_session):
    from xlink_ray.stages.textstats import gopher_filter

    rows = [
        # good doc: long enough, stopwords, varied
        {"doc_id": 1, "text": "the quick brown fox jumps over a lazy dog and runs "
                              "to the forest in search of food while birds sing is "
                              "a fine day for all creatures great and small indeed"},
        # too short
        {"doc_id": 2, "text": "the of and to in is"},
        # repetitive boilerplate (modal bigram > 20%)
        {"doc_id": 3, "text": "the menu the menu the menu the menu the menu the menu "
                              "the menu the menu the menu the menu the menu the menu "
                              "the menu the menu the menu the menu"},
        # no stopwords
        {"doc_id": 4, "text": " ".join(f"w{i} token{i} item{i}" for i in range(15))},
        # non-alpha words dominate
        {"doc_id": 5, "text": "the is " + " ".join(str(i) for i in range(40))},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = gopher_filter(ds).to_pandas()
    want = {r["doc_id"] for r in rows if _py_keep(r["text"])}
    assert set(got.doc_id) == want
    assert 1 in want and 2 not in want and 3 not in want and 5 not in want


def test_c4_filter_rules(ray_session):
    from xlink_ray.stages.textstats import c4_filter

    t = pa.Table.from_pylist(
        [
            # doc 1: 2 good lines survive; short + unterminated dropped; keep
            {"doc_id": 1, "text": "one two three four five six.\nshort.\nno terminal here at all\nseven eight nine ten eleven!\nlast words stay here ok?"},
            # doc 2: lorem ipsum → dropped at doc level (lines still counted)
            {"doc_id": 2, "text": "a b c d e f.\nLorem Ipsum dolor sit amet."},
            # doc 3: curly brace → dropped
            {"doc_id": 3, "text": "braces here { x y z.\ngood line one two three four."},
            # doc 4: only 2 sentences → dropped (min_sentences=3)
            {"doc_id": 4, "text": "alpha beta gamma delta eps.\nzeta eta theta iota kappa."},
        ]
    )
    got = c4_filter(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert got.loc[1, "keep"] == 1 and got.loc[1, "n_kept"] == 3
    assert got.loc[1, "clean_text"].count("\n") == 2
    assert got.loc[2, "keep"] == 0  # case-folded lorem rule
    assert got.loc[3, "keep"] == 0
    assert got.loc[4, "keep"] == 0 and got.loc[4, "n_sentences"] == 2
    assert (got["n_lines"] >= got["n_kept"]).all()


def test_dedup_lines_first_occurrence(ray_session):
    from xlink_ray.stages.textstats import dedup_lines

    t = pa.Table.from_pylist(
        [
            {"doc_id": 1, "text": "a.\nb.\na.\nc.\nb.\na."},
            {"doc_id": 2, "text": "solo line"},
        ]
    )
    got = dedup_lines(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert got.loc[1, "text"] == "a.\nb.\nc."  # order preserved, firsts kept
    assert got.loc[1, "n_lines"] == 6 and got.loc[1, "n_dupes"] == 3
    assert got.loc[2, "text"] == "solo line" and got.loc[2, "n_dupes"] == 0

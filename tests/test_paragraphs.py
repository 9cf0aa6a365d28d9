"""Paragraph explode/filter/reassemble (stages/paragraphs.py) and
unicode normalization (stages/curation.py normalize_corpus)."""

import pyarrow as pa

import ray.data as rd


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def test_explode_and_reassemble_roundtrip(ray_session):
    from xlink_ray.stages.paragraphs import explode_paragraphs, reassemble_docs

    docs = ["p one\np two\np three", "solo", "a\nb"]
    paras = explode_paragraphs(_docs(docs), sep="\n")
    got = paras.to_pandas().sort_values(["doc_id", "pidx"])
    assert got["para"].tolist() == ["p one", "p two", "p three", "solo", "a", "b"]
    back = reassemble_docs(paras, sep="\n").to_pandas().sort_values("doc_id")
    assert back["text"].tolist() == docs
    assert back["n_paras"].tolist() == [3, 1, 2]


def test_fixed_width_split_and_filter(ray_session):
    from xlink_ray.stages.paragraphs import explode_paragraphs, filter_paragraphs

    docs = ["w1 w2 w3 w4 w5"]  # width 2 → [w1 w2][w3 w4][w5]
    paras = explode_paragraphs(_docs(docs), fixed_width=2)
    got = paras.to_pandas().sort_values("pidx")
    assert got["para"].tolist() == ["w1 w2", "w3 w4", "w5"]
    kept = filter_paragraphs(paras, min_words=2).to_pandas()
    assert sorted(kept["para"]) == ["w1 w2", "w3 w4"]


def test_filter_require_token_whole_word(ray_session):
    from xlink_ray.stages.paragraphs import explode_paragraphs, filter_paragraphs

    docs = ["the cat sat\nthere cat sat\ncat the\nnothing here at all"]
    paras = explode_paragraphs(_docs(docs), sep="\n")
    kept = filter_paragraphs(paras, min_words=1, require_token="the").to_pandas()
    # 'there' and 'nothing' must NOT match the whole word 'the'
    assert sorted(kept["para"]) == ["cat the", "the cat sat"]


def test_reassemble_drops_filtered_docs(ray_session):
    from xlink_ray.stages.paragraphs import (
        explode_paragraphs,
        filter_paragraphs,
        reassemble_docs,
    )

    docs = ["keep me yes\nno", "x"]  # doc 1 loses every paragraph
    paras = filter_paragraphs(explode_paragraphs(_docs(docs), sep="\n"), min_words=3)
    out = reassemble_docs(paras).to_pandas()
    assert out["doc_id"].tolist() == [0]
    assert out["text"].tolist() == ["keep me yes"]


def test_normalize_corpus_accents_case_whitespace(ray_session):
    from xlink_ray.stages.curation import normalize_corpus

    docs = ["  Café   NAÏVE\tüber  ", "plain ascii", "RÉSUMÉ\n\nend"]
    out = (
        normalize_corpus(_docs(docs))
        .to_pandas()
        .sort_values("doc_id")["norm_text"]
        .tolist()
    )
    assert out == ["cafe naive uber", "plain ascii", "resume end"]

"""Unigram-LM tokenizer trainer (stages/unigram.py): sequential-
reference equality, distributed-E-step equality, Viterbi properties."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.unigram import (
    ref_unigram_train,
    unigram_encode_counts,
    unigram_train,
    viterbi_pieces,
)
from xlink_ray.util import read_pq

SF_SMALL = "/root/testdata/sf0.001"


def test_viterbi_properties():
    logp = {"a": -1_000_000_000, "b": -1_000_000_000, "ab": -1_500_000_000,
            "abc": -1_200_000_000, "c": -2_000_000_000}
    # single best piece beats char split
    assert viterbi_pieces("abc", logp, 4) == ["abc"]
    # exact tie between ["ab"] (=-1.5e9) vs ["a","b"] (-2e9): ab wins
    assert viterbi_pieces("ab", logp, 4) == ["ab"]
    # tie-break smallest last piece: craft equal scores
    lp2 = {"x": -10, "y": -10, "xy": -20}
    # "xy": path ["xy"] = -20 vs ["x","y"] = -20 -> smallest last j wins: "y" last
    assert viterbi_pieces("xy", lp2, 4) == ["x", "y"]
    # concatenation reconstructs the word
    got = viterbi_pieces("abcab", logp, 4)
    assert "".join(got) == "abcab"


def test_train_matches_sequential_reference(ray_session):
    docs = read_pq(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    got = unigram_train(docs)
    # sequential reference over the same word counts
    import duckdb

    wc = duckdb.sql(
        f"""SELECT word, count(*) AS n FROM (
             SELECT unnest(string_split(text,' ')) AS word
             FROM read_parquet('{SF_SMALL}/documents.parquet'))
           WHERE word <> '' GROUP BY word"""
    ).fetchall()
    want = ref_unigram_train([(w, int(n)) for w, n in wc])
    got_rows = list(
        zip(got["piece"].to_pylist(), got["n"].to_pylist(), got["logp_e9"].to_pylist())
    )
    assert got_rows == want


def test_distributed_e_step_equality(ray_session):
    docs = read_pq(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    local = unigram_train(docs)
    dist = unigram_train(docs, distribute_threshold=0)
    assert local.to_pylist() == dist.to_pylist()


def test_encode_counts_consistent(ray_session):
    docs = read_pq(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    vocab = unigram_train(docs)
    enc = unigram_encode_counts(docs, vocab).to_pandas()
    assert len(enc) == 500
    # tokens >= words (a word is >= 1 piece), and strictly more overall
    assert (enc["n_tokens"] >= enc["n_words"]).all()
    assert enc["n_tokens"].sum() > enc["n_words"].sum()


def test_fertility_rollup_consistent(ray_session):
    from xlink_ray.stages.unigram import unigram_fertility_by_lang

    docs = read_pq(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text", "lang"])
    vocab = unigram_train(docs.select_columns(["doc_id", "text"]))
    fert = unigram_fertility_by_lang(docs, vocab).to_pandas()
    enc = unigram_encode_counts(
        docs.select_columns(["doc_id", "text"]), vocab
    ).to_pandas()
    assert fert["n_docs"].sum() == 500
    assert fert["n_tokens"].sum() == enc["n_tokens"].sum()
    assert (
        fert["tokens_per_1k_chars"] == 1000 * fert["n_tokens"] // fert["n_chars"]
    ).all()


def test_fertility_zero_char_guard(ray_session):
    """A language whose docs are all empty strings yields fertility 0
    without a divide-by-zero (mirrors bpe_fertility_by_lang's guard)."""
    import pyarrow as pa
    import ray.data as rd

    from xlink_ray.stages.unigram import unigram_fertility_by_lang

    base = read_pq(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    vocab = unigram_train(base)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([900001, 900002], pa.int64()),
                "text": pa.array(["", ""], pa.string()),
                "lang": pa.array(["zz", "zz"], pa.string()),
            }
        )
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        fert = unigram_fertility_by_lang(docs, vocab).to_pandas()
    row = fert.set_index("lang").loc["zz"]
    assert row["n_chars"] == 0 and row["tokens_per_1k_chars"] == 0

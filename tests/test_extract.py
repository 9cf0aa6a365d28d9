"""M1 extraction: byte-identity + mention/offset fidelity (SURVEY.md §5.2.1)."""

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.oracle_ref import ref_extract
from xlink_ray.stages.extract import (
    ExtractCorpusBatch,
    ExtractMentionsBatch,
    extract_mentions_and_plain_text,
)
from xlink_ray.synth import mark_text, synth_pages

EDGE_CASES = [
    "",
    "no markup at all",
    "《海鸥》是网剧《[[bdi1697355|南北兄弟]]》插曲，由[[bdi7840364|顾峰]]、清源作词，顾峰作曲，[[bdi2647186|孟瑞]]演唱",
    "[[e1|m1]] and [[e2|m2]]",
    "leading text [[e1|m1]] trailing",
    "[[nopipe]] rest is dropped",          # no '|' → whole segment dropped
    "a [[nopipe]] b [[e|m]] c",
    "[[香港商[索尼|sony]] tail",             # leading '[' kept in entity id
    "[[e|m]]extra]]dropped",                # only text up to 2nd ']]' survives
    "[[a|b[[c|d]]e",                        # '[[' inside an open anchor
    "[[e|m",                                # unterminated anchor
    "[[|empty id]]x",
    "[[e|]]empty mention",
    "x[[ ]]y",
    "]] stray close [[e|m]]",
    "[[e1|m1]][[e2|m2]][[e3|m3]]",
    "unicode ✓ [[é|ü]] done",
]


@pytest.mark.parametrize("doc", EDGE_CASES)
def test_extract_matches_reference_oracle(doc):
    assert extract_mentions_and_plain_text(doc) == ref_extract(doc)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("ab|[]漢 ")),
        max_size=60,
    )
)
def test_extract_property_matches_oracle(doc):
    got_m, got_p = extract_mentions_and_plain_text(doc)
    exp_m, exp_p = ref_extract(doc)
    assert got_p == exp_p
    assert got_m == exp_m


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab|[]漢 ")), max_size=60))
def test_offsets_index_into_plain_text(doc):
    mentions, plain = extract_mentions_and_plain_text(doc)
    for mention, _eid, off in mentions:
        assert plain[off : off + len(mention)] == mention


def test_corpus_byte_identity_sf0001(ray_session, sf_small):
    """Markup-strip of synthesized pages == original documents.text, per url."""
    pages = synth_pages(sf_small)
    corpus = pages.map_batches(ExtractCorpusBatch(), batch_format="pyarrow")
    got = corpus.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc_id column of corpus is the url; recover numeric id from the tail
    got["num"] = got["doc_id"].str[-8:].astype(int)
    got = got.sort_values("num").reset_index(drop=True)

    exp = duckdb.sql(
        f"select doc_id, text from read_parquet('{sf_small}/documents.parquet') order by doc_id"
    ).df()
    assert len(got) == len(exp)
    assert (got["num"].values == exp["doc_id"].values).all()
    for g, e in zip(got["text"], exp["text"]):
        assert g.encode("utf-8") == e.encode("utf-8")


def test_mentions_match_token_counts(ray_session, sf_small):
    """Exploded mention rows == per-doc alias token occurrences."""
    from xlink_ray.synth import ALIAS_DICT

    pages = synth_pages(sf_small)
    ments = pages.map_batches(ExtractMentionsBatch(), batch_format="pyarrow")
    got = ments.to_pandas()
    counts = got.groupby(["mention", "entity_id"]).size()

    exp = {}
    docs = duckdb.sql(
        f"select doc_id, text from read_parquet('{sf_small}/documents.parquet')"
    ).fetchall()
    for did, text in docs:
        toks = text.split(" ")
        for t in toks:
            if t in ALIAS_DICT:
                cands = ALIAS_DICT[t]
                eid = cands[did % len(cands)]
                exp[(t, eid)] = exp.get((t, eid), 0) + 1
    assert dict(counts) == exp


def test_mark_text_roundtrip():
    text = "the spark stream is a fast query over a window table"
    marked = mark_text(text, doc_id=3)
    assert "[[ent_spark_alt|spark]]" in marked
    _, plain = extract_mentions_and_plain_text(marked)
    assert plain == text


def test_html_to_text_kernels(ray_session):
    import pyarrow as pa

    from xlink_ray.stages.extract import html_to_text

    batch = pa.table(
        {
            "url": pa.array(["u1", "u2", "u3"]),
            "html": pa.array(
                [
                    b"<html><body>plain [[e1|m]] text</body></html>",
                    b"<html><head><style>p{x}</style><script>if(a<b){}</script>"
                    b"</head><body>A &amp; B &lt;tag&gt; &amp;lt;</body></html>",
                    b"<p class='x'>nested <b>bold</b></p>",
                ],
                pa.binary(),
            ),
        }
    )
    out = html_to_text(batch)
    assert out.column_names == ["url", "text"]
    t = out["text"].to_pylist()
    assert t[0] == "plain [[e1|m]] text"
    # script/style gone, entities decoded, &amp;lt; -> literal '&lt;'
    assert t[1] == "A & B <tag> &lt;"
    assert t[2] == "nested bold"

"""S1-S4 sources and M3-M9 normalizers: semantics pinned to the
reference (quirks included)."""

import pyarrow as pa

import ray.data as rd

from xlink_ray.functions.text import (
    collapse_cjk_spaces,
    get_mention_from_title,
    strip_fromtitle,
    strip_punctuation_tokens,
    strip_quotation_marks,
)
from xlink_ray.sources.text_formats import (
    is_annotation_valid,
    parse_entity_dict_lines,
    parse_ttl_file,
    refine_infobox_lines,
    validate_corpus_lines,
)


def test_annotation_validity():
    assert is_annotation_valid("plain")
    assert is_annotation_valid("a [[e|m]] b")
    assert not is_annotation_valid("a [[x [[y]] z]] b")  # nested
    assert not is_annotation_valid("]] early close then text")
    # reference quirk: bound checked at top of loop → trailing stray
    # close at the very end still validates
    assert is_annotation_valid("text ]]")


def test_validate_corpus_lines(ray_session):
    lines = rd.from_items(
        [
            {"text": "t\t\ts\t\tu\t\tok [[e|m]] text"},
            {"text": "t\t\ts\t\tu\t\tbad [[a[[b]]c]]"},
            {"text": "only\t\tthree\t\tcols"},
        ]
    )
    out = validate_corpus_lines(lines, "bd").to_pandas()
    assert len(out) == 1 and "ok" in out["text"].iloc[0]


def test_parse_entity_dict_lines(ray_session):
    lines = rd.from_items(
        [
            {"text": "Title\t\tSub\t\thttp://a::;http://b\t\tbdi1"},
            {"text": "T2\t\t\t\t\t\tbdi2"},
            {"text": "malformed"},
        ]
    )
    out = parse_entity_dict_lines(lines).to_pandas().sort_values("entity_id")
    assert list(out["entity_id"]) == ["bdi1", "bdi2"]
    assert list(out.iloc[0]["uris"]) == ["http://a", "http://b"]
    assert list(out.iloc[1]["uris"]) == []


def test_parse_ttl_state_machine():
    header = "\n".join(f"# header {i}" for i in range(19))
    # each subject opens with a non-label triple: the reference's state
    # machine only collects label/supplement from SUBSEQUENT lines of
    # the same subject (the first line just registers the id)
    body = "\n".join(
        [
            "<e1> rdf:type owl:Thing .",
            '<e1> rdfs:label "Apple" .',
            '<e1> property:supplement "fruit" .',
            "<e2> rdf:type owl:Thing .",
            '<e2> rdfs:label "Bee" .',
            "<e3> rdf:type owl:Thing .",
            '<e3> rdfs:label "Last" .',  # reference quirk: final entity dropped
        ]
    )
    got = dict(parse_ttl_file(header + "\n" + body, "bd"))
    assert got == {"e1": "Apple（fruit）", "e2": "Bee"}
    got_wiki = dict(parse_ttl_file(header + "\n" + body, "wiki"))
    assert got_wiki["e1"] == "Apple(fruit)"


def test_refine_infobox(ray_session):
    lines = rd.from_items(
        [
            {"text": 'T\t\tS\t\thttps://baike.baidu.com/item/x?fromtitle=y\t\t{"k1": "v1", "k2": "v2"}'},
            {"text": "broken\t\tjson\t\turl\t\tnot-json"},
        ]
    )
    out = refine_infobox_lines(lines, "bd").to_pandas()
    assert len(out) == 1
    line = out["text"].iloc[0]
    assert "\t\thttps://baike.baidu.com/item/x\t\t" in line
    # trailing comma kept (the reference's no-op strip)
    assert line.endswith("infobox::;k1,v1,k2,v2,")


def test_url_normalizers(ray_session):
    urls = pa.array(
        [
            "https://baike.baidu.com/item/abc?fromtitle=x",
            "https://baike.baidu.com/item/plain",
        ]
    )
    out = strip_fromtitle(urls).to_pylist()
    assert out == [
        "https://baike.baidu.com/item/abc",
        "https://baike.baidu.com/item/plain",
    ]
    assert (
        strip_quotation_marks("x/item/%E2%80%9Cfoo%E2%80%9D/rest")
        == "x/item/foo/rest"
    )


def test_mention_from_title():
    assert get_mention_from_title("苹果（水果）") == "苹果"
    assert get_mention_from_title("Apple (fruit)") == "Apple "
    assert get_mention_from_title("no parens") == "no parens"


def test_punct_and_cjk_space():
    assert strip_punctuation_tokens(["a", "，", "b", "。"]) == ["a", "b"]
    # single-pass regex consumes right context: alternating gaps collapse
    assert collapse_cjk_spaces("一 二 三") == "一二 三"
    assert collapse_cjk_spaces("ab cd") == "ab cd"

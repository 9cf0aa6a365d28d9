"""M2 corpus refine + J5 resolution chain + S13 in-link lookup."""

import pyarrow as pa
import pytest

import ray

import ray.data as rd

from xlink_ray.stages.refine import EntityResolver, refine_corpus, refine_line_bd

DICT = pa.table(
    {
        "entity_id": ["bdi1", "bdi2", "bdi3"],
        "title": ["苹果", "乔布斯", "苹果"],
        "sub_title": ["（公司）", "", "（水果）"],
        "uris": [
            ["https://baike.baidu.com/item/apple-inc"],
            ["https://baike.baidu.com/item/jobs"],
            ["https://baike.baidu.com/item/apple-fruit"],
        ],
    }
)


@pytest.fixture
def resolver():
    return EntityResolver(DICT, "bd")


def test_resolution_chain(resolver):
    assert resolver.by_uri("https://baike.baidu.com/item/APPLE-INC") == "bdi1"  # case-folded
    # parent-path fallback
    assert resolver.by_uri("https://baike.baidu.com/item/apple-inc/extra") == "bdi1"
    assert resolver.by_uri("https://baike.baidu.com/item/missing") is None
    assert resolver.by_uri_and_title("https://x/none/none", "苹果（公司）") == "bdi1"
    assert resolver.by_uri_and_title("https://x/none/none", "nope") is None


def test_refine_line_bd(resolver):
    line = (
        "苹果\t\t（公司）\t\thttps://baike.baidu.com/item/apple-inc?fromtitle=x\t\t"
        "abstract::;由[[乔布斯|https://baike.baidu.com/item/jobs]]创立，出售[[水果|https://baike.baidu.com/item/unknown]]产品"
    )
    out = refine_line_bd(line, resolver, mark_titles=False)
    assert out == "bdi1\t\t由[[bdi2|乔布斯]]创立，出售水果产品"

    # mark_titles wraps page-title occurrences outside anchors
    line2 = (
        "苹果\t\t（公司）\t\thttps://baike.baidu.com/item/apple-inc\t\t"
        "abstract::;苹果公司由[[乔布斯|https://baike.baidu.com/item/jobs]]创立"
    )
    out2 = refine_line_bd(line2, resolver, mark_titles=True)
    assert out2 == "bdi1\t\t[[bdi1|苹果]]公司由[[bdi2|乔布斯]]创立"


def test_refine_drops_invalid(resolver):
    assert refine_line_bd("too\t\tfew\t\tcols", resolver, False) is None
    assert (
        refine_line_bd(
            "t\t\ts\t\thttps://baike.baidu.com/item/missing-x\t\tabstract::;text",
            resolver,
            False,
        )
        is None
    )  # unresolved page
    assert (
        refine_line_bd(
            "苹果\t\t（公司）\t\thttps://baike.baidu.com/item/apple-inc\t\tno-kind-tag",
            resolver,
            False,
        )
        is None
    )  # missing ::; tag


def test_refine_corpus_stage(ray_session, resolver):
    lines = rd.from_items(
        [
            {"text": "苹果\t\t（公司）\t\thttps://baike.baidu.com/item/apple-inc\t\tabstract::;简介[[乔布斯|https://baike.baidu.com/item/jobs]]"},
            {"text": "bad line"},
        ]
    )
    out = refine_corpus(lines, ray.put(DICT), "bd").to_pandas()
    assert len(out) == 1
    assert out["text"].iloc[0].startswith("bdi1\t\t简介[[bdi2|乔布斯]]")


def test_in_links(ray_session, sf_small):
    from xlink_ray.pipelines.dictbuild import in_links

    out = in_links(sf_small, "ent_merge").to_pandas()
    assert len(out) > 0
    assert (out["dst"] == "ent_merge").all()

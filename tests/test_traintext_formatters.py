"""M10-M14: train-text builders and output formatters."""

import json

import ray.data as rd

from xlink_ray.functions.formatters import (
    format_annotated_doc,
    format_dataset_tuples,
    format_human,
    format_json,
)
from xlink_ray.stages.traintext import plain_train_text, train_text_keep_anchors


def test_train_text_keep_anchors(ray_session):
    corpus = rd.from_items(
        [{"text": "hello , [[e1|world]] again !"}]
    )
    out = train_text_keep_anchors(corpus).to_pandas()
    # punctuation tokens dropped outside anchors; anchor token kept
    assert out["text"].iloc[0] == "hello [[e1|world]] again"


def test_plain_train_text(ray_session):
    corpus = rd.from_items([{"text": "a [[e1|b]] c ."}])
    out = plain_train_text(corpus).to_pandas()
    assert out["text"].iloc[0] == "a b c"


def test_formatters():
    links = [(0, 4, "word", "e1", 0.9), (11, 13, "xy", "e2", 0.5)]
    human = format_human("d1", links)
    assert "# d1" in human and "0..4\tword\t->\te1\t(0.9000)" in human

    js = json.loads(format_json("d1", links))
    assert js["doc_id"] == "d1" and js["mentions"][0]["entity_id"] == "e1"

    tuples = format_dataset_tuples(links)
    assert tuples == [[0, 4, "word", "e1"], [11, 13, "xy", "e2"]]

    doc = "word ABCDE xy!"
    annotated = format_annotated_doc(doc, links)
    assert annotated == "[[e1|word]] ABCDE [[e2|xy]]!"


def test_formatter_with_url_and_batch_json():
    from xlink_ray.functions.formatters import (
        format_annotated_doc_with_url,
        format_batch_for_json,
    )

    links = [(0, 4, "word", "e1", 0.9), (11, 13, "xy", None, 0.5)]
    doc = "word ABCDE xy!"
    out = format_annotated_doc_with_url(doc, links)
    base = "https://xlore.org/instance.html?url=http://xlore.org/instance/"
    # predicted entity: id in both the link text and the url
    assert f"【word|[e1]({base}e1)】" in out
    # no prediction: empty link text, BASE url still rendered (quirk)
    assert f"【xy|[]({base})】" in out
    assert out == f"【word|[e1]({base}e1)】 ABCDE 【xy|[]({base})】!"

    batch = format_batch_for_json(["d1", "d2"], [links, []])
    assert len(batch) == 2
    assert json.loads(batch[0])["doc_id"] == "d1"
    assert json.loads(batch[1])["mentions"] == []

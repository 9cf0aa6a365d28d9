"""J8 merge_manual_data + M15/S12 AIDA import + CJK segmentation."""

import pyarrow as pa

import ray.data as rd


def test_keyed_last_wins(ray_session):
    from xlink_ray.stages.manual import keyed_last_wins

    orig = rd.from_arrow(
        pa.table({"mention": ["a", "b", "c"], "link_prob": [0.1, 0.2, 0.3]})
    )
    manual = rd.from_arrow(pa.table({"mention": ["b", "d"], "link_prob": [0.9, 0.7]}))
    got = keyed_last_wins(orig, manual, ["mention"]).to_pandas().set_index("mention")
    assert got.loc["a", "link_prob"] == 0.1
    assert got.loc["b", "link_prob"] == 0.9  # manual wins
    assert got.loc["c", "link_prob"] == 0.3
    assert got.loc["d", "link_prob"] == 0.7  # manual-only survives


def test_union_distinct(ray_session):
    from xlink_ray.stages.manual import merge_mention_anchors

    orig = rd.from_arrow(
        pa.table({"mention": ["a", "a"], "entity_id": ["e1", "e2"]})
    )
    manual = rd.from_arrow(
        pa.table({"mention": ["a", "b"], "entity_id": ["e1", "e3"]})
    )
    got = merge_mention_anchors(orig, manual).to_pandas()
    pairs = set(zip(got["mention"], got["entity_id"]))
    assert pairs == {("a", "e1"), ("a", "e2"), ("b", "e3")}


AIDA_RAW = """-DOCSTART- (1 testb)
Alice\tB\tAlice Smith\tYAGO:Alice\thttp://en.wikipedia.org/wiki/ent_spark
Smith\tI\tAlice Smith\tYAGO:Alice\thttp://en.wikipedia.org/wiki/ent_spark
went
home
.
-DOCSTART- (2 testb)
Bob\tB\tBob\t--NME--
knows
Eve\tB\tEve\tYAGO:Eve\thttp://en.wikipedia.org/wiki/__nope__
"""


def test_parse_aida_quirks(tmp_path):
    from xlink_ray.sources.annotations import parse_aida_lines

    def resolve(uri):
        return {"/wiki/ent_spark": "ent_spark"}.get(uri)

    docs, mentions, misses, nme = parse_aida_lines(
        AIDA_RAW.splitlines(keepends=True), resolve
    )
    # doc 1: full label appended by B line, I line skipped; punctuation
    # line attaches unspaced
    assert docs[0] == "Alice Smith went home."
    assert mentions[0] == [(0, 11, "Alice Smith", "ent_spark")]
    # doc 2 (last): kept because it has mentions, un-stripped (reference quirk)
    assert docs[1].startswith("Bob knows Eve")
    assert mentions[1][0] == (0, 3, "Bob", "NIL")  # --NME--
    assert mentions[1][1][3] == "NIL"  # unresolved uri → NIL
    assert misses == ["/wiki/__nope__"]
    assert nme == ["Bob"]


def test_format_and_load_roundtrip(tmp_path):
    from xlink_ray.sources.annotations import (
        format_annotation_dataset,
        load_annotation_dataset,
    )

    raw = tmp_path / "raw.txt"
    raw.write_text(AIDA_RAW, encoding="utf-8")
    n_docs, n_mentions = format_annotation_dataset(
        str(raw), str(tmp_path / "ds"), lambda u: None
    )
    assert (n_docs, n_mentions) == (2, 3)
    docs, gold = load_annotation_dataset(str(tmp_path / "ds"))
    assert docs.num_rows == 2
    assert gold.num_rows == 3
    assert set(gold.column_names) == {"doc_id", "offset", "end", "mention", "entity_id"}


def test_aida_fixture_eval(ray_session, tmp_path):
    """End-to-end: synth fixture → format → load → dictionary linking →
    eval row (the M15+S12 'docs/annotations.json' path)."""
    from xlink_ray.pipelines.parity import aida_eval

    row = aida_eval("/root/testdata/sf0.001", workdir=str(tmp_path)).to_pylist()[0]
    assert row["n_gold"] > 0
    assert 0.0 <= row["ed_accuracy"] <= 1.0
    assert row["recall"] > 0.5  # dictionary linker finds most gold spans


def test_cjk_segmenter_traintext():
    from xlink_ray.functions.segment import default_cjk_parser

    p = default_cjk_parser()
    assert p.cut("北京大学数据处理") == ["北京大学", "数据处理"]
    # OOV CJK splits per char; ASCII runs split on whitespace
    assert p.cut("我用 spark 处理数据") == ["我", "用", "spark", "处理", "数据"]


def test_cjk_traintext_stage(ray_session):
    from xlink_ray.functions.segment import default_cjk_parser
    from xlink_ray.stages.traintext import plain_train_text, train_text_keep_anchors

    corpus = rd.from_arrow(
        pa.table({"text": ["北京大学的[[ent_spark|spark]]数据处理"]})
    )
    plain = plain_train_text(corpus, parser=default_cjk_parser()).to_pandas()
    assert plain["text"][0].split() == ["北京大学", "的", "spark", "数据处理"]
    kept = train_text_keep_anchors(corpus, parser=default_cjk_parser()).to_pandas()
    assert "[[ent_spark|spark]]" in kept["text"][0]
    assert "北京大学" in kept["text"][0].split()

"""Evaluation metrics: hand-checkable P/R/ED on crafted tables, plus
the flagship-vs-gold run at sf0.001."""

import pyarrow as pa
import pytest

import ray.data as rd

from xlink_ray.stages.evaluation import linking_eval


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_linking_eval_counts(ray_session):
    gold = _ds(
        [
            {"doc_id": "d1", "offset": 0, "mention": "a", "entity_id": "e1"},
            {"doc_id": "d1", "offset": 10, "mention": "b", "entity_id": "e2"},
            {"doc_id": "d2", "offset": 5, "mention": "c", "entity_id": "e3"},
        ]
    )
    pred = _ds(
        [
            # span+entity match
            {"doc_id": "d1", "offset": 0, "mention": "a", "entity_id": "e1"},
            # span match, wrong entity
            {"doc_id": "d1", "offset": 10, "mention": "b", "entity_id": "eX"},
            # spurious prediction
            {"doc_id": "d2", "offset": 99, "mention": "z", "entity_id": "e9"},
        ]
    )
    out = linking_eval(pred, gold).to_pylist()[0]
    assert out["n_gold"] == 3 and out["n_pred"] == 3
    assert out["n_span_match"] == 2 and out["n_entity_match"] == 1
    assert out["precision"] == pytest.approx(2 / 3)
    assert out["recall"] == pytest.approx(2 / 3)
    assert out["ed_accuracy"] == pytest.approx(1 / 2)


def test_flagship_eval_sf0001(ray_session, sf_small):
    from xlink_ray.pipelines import dictbuild, flagship

    pred = flagship.links(sf_small).select_columns(
        ["doc_id", "offset", "mention", "entity_id"]
    )
    gold = dictbuild.mentions(sf_small)
    out = linking_eval(pred, gold).to_pylist()[0]
    # the scan finds exactly the annotated occurrences → perfect spans
    assert out["precision"] == 1.0 and out["recall"] == 1.0
    # ambiguous aliases resolve on noisy context → ED accuracy between
    # the unambiguous floor and 1
    assert 0.6 < out["ed_accuracy"] < 1.0


def test_pr_threshold_sweep_hand_counts(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.evaluation import pr_threshold_sweep

    # scores: 10,20,30,40; gold: T,F,T,F
    t = pa.table(
        {
            "score": pa.array([10, 20, 30, 40], pa.int64()),
            "gold": pa.array([True, False, True, False]),
        }
    )
    out = (
        pr_threshold_sweep(rd.from_arrow(t).repartition(3), [15, 35])
        .to_pandas()
        .set_index("th")
    )
    # th=15: pred {20,30,40} → tp=1 fp=2 fn=1
    assert out.loc[15, ["tp", "fp", "fn"]].tolist() == [1, 2, 1]
    assert out.loc[15, "prec_ppm"] == 1_000_000 // 3
    assert out.loc[15, "rec_ppm"] == 500_000
    # th=35: pred {40} → tp=0 fp=1 fn=2
    assert out.loc[35, ["tp", "fp", "fn"]].tolist() == [0, 1, 2]
    assert out.loc[35, "prec_ppm"] == 0


def test_candidate_recall_fixture(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from xlink_ray.stages.evaluation import candidate_recall

    gold = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {"mention": "Apple", "entity_id": "e1"},   # kept pair
                {"mention": "apple", "entity_id": "e2"},   # mention kept, pair absent
                {"mention": "pear", "entity_id": "e3"},    # mention pruned
            ]
        )
    )
    kept = rd.from_arrow(
        pa.Table.from_pylist(
            [{"mention": "apple", "entity_id": "e1"}]
        )
    )
    out = candidate_recall(gold, kept).to_pylist()[0]
    assert out["n_gold"] == 3
    assert out["n_mention_kept"] == 2   # 'apple' (lowercased) kept twice
    assert out["n_reachable"] == 1      # only (apple, e1)
    assert out["recall_ppm"] == 1_000_000 // 3

"""Fidelity linker: P1-P2 + P8-P10 semantics incl. reference quirks."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from xlink_ray.stages.linking import (
    FidelityLinkActor,
    LinkerState,
    _predict_no_prob,
    _solve_conflict,
    link_document,
)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


@pytest.fixture
def state():
    word_vecs = {"w1": np.array([1.0, 0.0]), "w2": np.array([0.0, 1.0])}
    entity_vecs = {
        "e1": np.array([1.0, 0.0]),
        "e2": np.array([0.0, 1.0]),
        "eU": np.array([3.0, 4.0]),
        "t1": np.array([1.0, 1.0]),
        "t2": np.array([1.0, 0.2]),
    }
    return LinkerState(
        ma_dict={"alpha": ["e1", "e2"], "beta": ["eU"]},
        tt_dict={"gamma": ["t1", "t2"]},
        e_given_m={("alpha", "e1"): 0.75, ("alpha", "e2"): 0.25, ("beta", "eU"): 1.0},
        link_prob={"alpha": 1.0, "beta": 1.0},
        word_vecs=word_vecs,
        entity_vecs=entity_vecs,
    )


def test_solve_conflict_first_longest():
    matches = [
        (0, 4, "abcd", ["x"]),
        (2, 6, "cdef", ["y"]),   # overlaps; same length → first wins
        (10, 12, "gh", ["z"]),
    ]
    out = _solve_conflict(matches)
    assert [(m[0], m[2]) for m in out] == [(0, "abcd"), (10, "gh")]


def test_has_prob_scoring_and_seeds(state):
    doc = "beta w1 alpha w2"
    got = link_document(state, doc)
    by_label = {g[2]: g for g in got}
    assert set(by_label) == {"alpha", "beta"}

    # independent recomputation of the expected scores
    ctx_alpha = _unit(np.array([1.0, 0.0]) + np.array([0.0, 1.0]))  # mean of w1,w2 (normed)
    seeds = [state.entity_vecs["eU"]]
    seed_mean = seeds[0]  # single seed
    for eid, egm in (("e1", 0.75), ("e2", 0.25)):
        ev = state.entity_vecs[eid]
        cws = float(_unit(ev) @ ctx_alpha)
        ces = float(_unit(ev) @ _unit(seed_mean))
        believe = ces * cws * egm**0.02
        if eid == "e1":
            b1 = believe
        else:
            b2 = believe
    expect_best = "e1" if b1 >= b2 else "e2"
    assert by_label["alpha"][3] == expect_best
    assert by_label["alpha"][4] == pytest.approx((max(b1, b2) + 1.0) / 2)


def test_no_prob_last_candidate_seed_bug(state):
    # gamma has candidates t1, t2 — both get cws computed; the
    # reference's broken max-selection keeps the LAST one (t2)
    doc = "w1 gamma w1"
    no_prob = _predict_no_prob(state, doc)
    # cws(t1)=cos([1,1],[1,0])=0.707>0.45, cws(t2)=cos([1,.2],[1,0])=0.98
    # last candidate (t2) becomes the seed/resolved candidate
    assert len(no_prob) == 1
    assert no_prob[0][3] == "t2"


def test_merge_discards_no_prob(state):
    # reference merge bug: no-prob results never survive the merge
    doc = "w1 gamma w1"
    merged, no_prob = link_document(state, doc, return_no_prob=True)
    assert no_prob  # computed...
    assert merged == []  # ...and discarded


def test_fidelity_actor_batch(ray_session, state):
    import ray

    ds = rd.from_items(
        [
            {"doc_id": "d1", "text": "beta w1 alpha w2"},
            {"doc_id": "d2", "text": "nothing here"},
        ]
    )
    ref = ray.put(state)
    out = ds.map_batches(
        FidelityLinkActor, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    assert set(out["doc_id"]) == {"d1"}
    assert set(out["label"]) == {"alpha", "beta"}
    assert (out["parse_from"] == "ma").all()


# ---------------------------------------------------------------- P3

def test_multi_trie_merge_non_overlapping():
    from xlink_ray.stages.linking import MultiDictParser

    p = MultiDictParser(
        {"a": {"spark": ["e1"]}, "b": {"window": ["e2"]}},
        {"a": 1.0, "b": 2.0},
    )
    got = p.parse("x spark y window z")
    assert [(s, e, lbl) for s, e, lbl, _ in got] == [(2, 7, "spark"), (10, 16, "window")]


def test_multi_trie_merge_weight_conflict():
    from xlink_ray.stages.linking import MultiDictParser

    # overlapping spans across tries: the higher-weight trie wins
    p_hi_b = MultiDictParser(
        {"a": {"spark plug": ["e1"]}, "b": {"plug in": ["e2"]}},
        {"a": 1.0, "b": 5.0},
    )
    got = p_hi_b.parse("spark plug in")
    assert [lbl for _, _, lbl, _ in got] == ["plug in"]

    p_hi_a = MultiDictParser(
        {"a": {"spark plug": ["e1"]}, "b": {"plug in": ["e2"]}},
        {"a": 5.0, "b": 1.0},
    )
    got = p_hi_a.parse("spark plug in")
    assert [lbl for _, _, lbl, _ in got] == ["spark plug"]


def test_multi_trie_merge_reference_quirks():
    from xlink_ray.stages.linking import merge_trie_results

    # weight tie on identical spans: the first member nominally wins
    # (strict >), but the deletion matcher compares only (start, end) —
    # the reference's always-true typo — so deleting the "loser"
    # removes the WINNER's heap entry and the loser is what gets
    # emitted. Reproduced as spec (MentionParser.py:195).
    res = merge_trie_results(
        {"a": [(0, 5, "A")], "b": [(0, 5, "B")]},
        {"a": 1.0, "b": 1.0},
    )
    assert [p for _, _, p in res] == ["B"]
    # identical spans + the (start, end)-only deletion matcher: the
    # loser's deletion removes the first array match, winner survives
    res2 = merge_trie_results(
        {"a": [(0, 3, "A"), (10, 12, "A2")], "b": [(1, 4, "B")]},
        {"a": 1.0, "b": 9.0},
    )
    assert [p for _, _, p in res2] == ["B", "A2"]

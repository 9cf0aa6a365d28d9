"""J2 filter_mention_anchors (stages/prob.py): broadcast vs partitioned
path equality and the XLINK_DICT_MAX_MB guard fallback."""

import pyarrow as pa

import ray.data as rd


def _fixtures():
    anchors = pa.table(
        {
            "mention": ["paris", "paris", "x", "berlin", "berlin", "rome", "oslo"],
            "entity_id": ["e1", "e2", "e3", "e4", "e5", "e6", "e7"],
            "link_count": [5, 3, 9, 4, 1, 2, 2],
        }
    )
    freq = pa.table(
        # "rome" absent from freq_m → dropped; "oslo" freq huge → ratio fails
        {"mention": ["paris", "x", "berlin", "oslo"],
         "freq": [100, 10, 100, 10_000_000]}
    )
    self_links = pa.table(
        # berlin: link_m 5, self 4 → (link_m - self) = 1 < 2 → dropped
        {"mention": ["berlin"], "count": [4]}
    )
    return (
        rd.from_arrow(anchors).repartition(3),
        rd.from_arrow(freq).repartition(2),
        rd.from_arrow(self_links),
    )


def _run(partitioned):
    from xlink_ray.stages.prob import filter_mention_anchors

    a, f, s = _fixtures()
    out = (
        filter_mention_anchors(a, f, s, threshold=1e-4, partitioned=partitioned)
        .to_pandas()
        .sort_values(["mention", "entity_id"])
        .reset_index(drop=True)
    )
    return out


def test_j2_partitioned_equals_broadcast(ray_session):
    b = _run(False)
    p = _run(True)
    assert b.equals(p), (b, p)
    # predicate semantics: len>1 drops "x"; self-link drops "berlin";
    # missing freq drops "rome"; ratio drops "oslo" → paris only
    assert set(b["mention"]) == {"paris"}
    assert len(b) == 2


def test_j2_guard_falls_back_to_partitioned(ray_session, monkeypatch):
    monkeypatch.setenv("XLINK_DICT_MAX_MB", "0.000001")
    auto = _run(None)  # guard trips → automatic partitioned fallback
    assert auto.equals(_run(True))


def test_j2_explicit_broadcast_raises_past_guard(ray_session, monkeypatch):
    import pytest

    monkeypatch.setenv("XLINK_DICT_MAX_MB", "0.000001")
    with pytest.raises(MemoryError):
        _run(False)

"""Degenerate-input pins for the session-8 operators: empty datasets,
single rows, all-identical values."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _empty(schema: dict) -> rd.Dataset:
    return rd.from_arrow(
        pa.table({k: pa.array([], t) for k, t in schema.items()})
    )


def test_mutual_best_empty_sides(ray_session):
    from xlink_ray.functions.similarity import jaro_winkler_pairs
    from xlink_ray.stages.attach import mutual_best_pairs

    sch = {"k": pa.int64(), "id": pa.int64(), "name": pa.string()}
    one = rd.from_arrow(
        pa.table({"k": pa.array([0], pa.int64()), "id": pa.array([1], pa.int64()),
                  "name": pa.array(["x"], pa.string())})
    )
    for left, right in ((_empty(sch), one), (one, _empty(sch)), (_empty(sch), _empty(sch))):
        got = mutual_best_pairs(
            left, right, key_cols="k", id_col="id", attr_col="name",
            scorer=jaro_winkler_pairs, min_sim_bp=0,
        ).to_pandas()
        assert len(got) == 0


def test_threshold_hierarchy_no_edges(ray_session):
    from xlink_ray.stages.clustering import threshold_hierarchy

    nodes = pa.table({"node": pa.array([1, 2, 3], pa.int64())})
    edges = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "sim_bp": pa.array([], pa.int64())}
    )
    got = threshold_hierarchy(
        rd.from_arrow(edges), [9000, 8000], rd.from_arrow(nodes), "node"
    ).to_pandas()
    # every node a singleton at every level
    assert len(got) == 6
    assert (got["member_id"] == got["cluster_id"]).all()


def test_fs_em_single_pattern(ray_session):
    """A degenerate contingency (every pair agrees on everything) still
    yields finite parameters (add-half smoothing)."""
    from xlink_ray.stages.fs import fs_em_params

    pc_tbl = pa.table(
        {"pattern": pa.array([3], pa.int64()), "n": pa.array([10], pa.int64())}
    )
    p = fs_em_params(pc_tbl, ["f1", "f2"], n_iter=4)
    assert 0 < p["lam_e9"] < 10**9
    assert all(0 < x < 10**9 for x in p["m_e9"] + p["u_e9"])


def test_scd2_single_event_and_funnel_empty(ray_session):
    from xlink_ray.stages.scd import funnel_steps, scd2_intervals

    one = pa.table(
        {
            "user_id": pa.array([7], pa.int64()),
            "ts": pa.array([np.datetime64("2024-01-01T00:00", "us")]),
            "event_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["signup"], pa.string()),
        }
    )
    s = scd2_intervals(rd.from_arrow(one)).to_pandas()
    assert len(s) == 1 and s.iloc[0]["is_current"] == 1
    f = funnel_steps(rd.from_arrow(one), steps=["signup", "purchase"]).to_pandas()
    assert len(f) == 1 and f.iloc[0]["n_steps"] == 1


def test_unigram_single_word_corpus(ray_session):
    from xlink_ray.stages.unigram import unigram_train

    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": pa.array(["aaa aaa", "aaa"], pa.string())}
        )
    )
    v = unigram_train(docs, max_piece_len=3, seed_size=10, vocab_size=8)
    pieces = set(v["piece"].to_pylist())
    assert "a" in pieces  # chars always survive
    assert all(set(p) == {"a"} for p in pieces)


def test_pprl_empty_and_identical(ray_session):
    from xlink_ray.stages.pprl import pprl_pairs

    sch = {"k": pa.int64(), "id": pa.int64(), "name": pa.string()}
    assert len(
        pprl_pairs(_empty(sch), key_cols="k", id_col="id", attr_col="name").to_pandas()
    ) == 0
    same = rd.from_arrow(
        pa.table({"k": pa.array([0, 0], pa.int64()), "id": pa.array([1, 2], pa.int64()),
                  "name": pa.array(["abc", "abc"], pa.string())})
    )
    got = pprl_pairs(
        same, key_cols="k", id_col="id", attr_col="name", min_dice_bp=10000
    ).to_pandas()
    assert len(got) == 1 and got.iloc[0]["dice_bp"] == 10000


def test_sssp_empty_edges(ray_session):
    from xlink_ray.stages.graph import sssp_distances

    e = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                  "w": pa.array([], pa.int64())})
    assert len(sssp_distances(rd.from_arrow(e), seeds=[0]).to_pandas()) == 0

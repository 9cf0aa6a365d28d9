"""Checkpoint/resume: per-stage manifests, atomic completion, skip on
rerun, recompute on fingerprint change, byte-identical results."""

import json
import os
import shutil

import pyarrow as pa
import pytest

import ray.data as rd

from xlink_ray.state.checkpoint import CheckpointManager, fingerprint


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "ckpt")


def _ds(n=10):
    return rd.from_arrow(pa.table({"x": list(range(n))}))


def test_stage_skip_and_lineage(ray_session, root):
    cm = CheckpointManager(root)
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return _ds()

    fp = fingerprint("stage-v1", "input-a")
    out1 = cm.run_stage("s1", fp, make).to_pandas()
    assert calls["n"] == 1 and cm.computed == ["s1"]

    cm2 = CheckpointManager(root)
    out2 = cm2.run_stage("s1", fp, make).to_pandas()
    assert calls["n"] == 1  # skipped — fn never invoked
    assert cm2.skipped == ["s1"]
    assert sorted(out1["x"]) == sorted(out2["x"])

    m = cm2.manifest("s1")
    assert m["complete"] and m["rows"] == 10 and m["fingerprint"] == fp
    assert sum(p["rows"] for p in m["partitions"]) == 10
    assert all(p["bytes"] > 0 for p in m["partitions"])


def test_fingerprint_change_recomputes(ray_session, root):
    cm = CheckpointManager(root)
    cm.run_stage("s1", fingerprint("v1"), lambda: _ds(5)).to_pandas()
    out = cm.run_stage("s1", fingerprint("v2"), lambda: _ds(7)).to_pandas()
    assert len(out) == 7
    assert cm.manifest("s1")["rows"] == 7


def test_incomplete_dir_not_trusted(ray_session, root):
    """A stage dir without a manifest (simulated kill) is recomputed."""
    cm = CheckpointManager(root)
    fp = fingerprint("v1")
    cm.run_stage("s1", fp, lambda: _ds(5))
    os.remove(os.path.join(root, "s1", "manifest.json"))
    cm2 = CheckpointManager(root)
    out = cm2.run_stage("s1", fp, lambda: _ds(5)).to_pandas()
    assert len(out) == 5 and cm2.computed == ["s1"]


def test_flagship_resume(ray_session, sf_small, root):
    from xlink_ray.pipelines import flagship

    out1, cm1 = flagship.clusters_checkpointed(sf_small, root)
    df1 = out1.to_pandas().sort_values("member_id").reset_index(drop=True)
    assert set(cm1.computed) == {"links", "edges", "clusters"}

    out2, cm2 = flagship.clusters_checkpointed(sf_small, root)
    df2 = out2.to_pandas().sort_values("member_id").reset_index(drop=True)
    assert set(cm2.skipped) == {"links", "edges", "clusters"}
    assert cm2.computed == []
    assert df1.equals(df2)

    # kill-after-stage-1 simulation: only links checkpoint survives
    shutil.rmtree(os.path.join(root, "edges"))
    shutil.rmtree(os.path.join(root, "clusters"))
    out3, cm3 = flagship.clusters_checkpointed(sf_small, root)
    df3 = out3.to_pandas().sort_values("member_id").reset_index(drop=True)
    assert cm3.skipped == ["links"]
    assert set(cm3.computed) == {"edges", "clusters"}
    assert df1.equals(df3)

    # lineage manifests carry metrics for every stage
    for stage in ("links", "edges", "clusters"):
        m = json.load(open(os.path.join(root, stage, "manifest.json")))
        assert m["rows"] > 0 and len(m["partitions"]) >= 1


def test_write_partitioned_resumable(ray_session, tmp_path):
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from xlink_ray.state.checkpoint import fingerprint, write_partitioned_resumable

    rows = [{"doc_id": i, "lang": ["en", "de", "es"][i % 3]} for i in range(90)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).materialize()
    out = str(tmp_path / "parts")
    fp = fingerprint("v1", 90)

    # first run: write only two partitions (simulated interruption)
    r1 = write_partitioned_resumable(ds, out, by="lang", fp=fp, values=["de", "en"])
    assert r1["written"] == ["de", "en"] and r1["skipped"] == []

    # resumed run over all partitions: finished ones are skipped
    r2 = write_partitioned_resumable(ds, out, by="lang", fp=fp)
    assert r2["written"] == ["es"] and sorted(r2["skipped"]) == ["de", "en"]

    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["done"] == {"de": 30, "en": 30, "es": 30}
    got = pq.read_table(os.path.join(out, "lang=es")).num_rows
    assert got == 30

    # key column lives in the directory name only (hive layout), not
    # in the data files
    f0 = next(
        n for n in os.listdir(os.path.join(out, "lang=es")) if n.endswith(".parquet")
    )
    assert "lang" not in pq.read_schema(os.path.join(out, "lang=es", f0)).names

    # stale temp dirs from a killed run (any pid) are swept on rerun
    os.makedirs(os.path.join(out, "lang=zz.tmp-99999"))
    r2b = write_partitioned_resumable(ds, out, by="lang", fp=fp)
    assert r2b["written"] == [] and not os.path.exists(
        os.path.join(out, "lang=zz.tmp-99999")
    )

    # fingerprint change wipes and rewrites everything; an absent
    # stratum ("fr") yields a valid, complete zero-row partition
    r3 = write_partitioned_resumable(
        ds, out, by="lang", fp=fingerprint("v2"), values=["de", "en", "es", "fr"]
    )
    assert sorted(r3["written"]) == ["de", "en", "es", "fr"] and r3["skipped"] == []
    man3 = json.load(open(os.path.join(out, "manifest.json")))
    assert man3["done"]["fr"] == 0
    assert os.path.isdir(os.path.join(out, "lang=fr"))

    # unmanaged pre-existing content (no manifest) is wiped, not merged
    out2 = str(tmp_path / "legacy")
    os.makedirs(out2)
    with open(os.path.join(out2, "old-flat.parquet"), "w") as f:
        f.write("stale")
    r4 = write_partitioned_resumable(ds, out2, by="lang", fp=fp)
    assert sorted(r4["written"]) == ["de", "en", "es"]
    assert not os.path.exists(os.path.join(out2, "old-flat.parquet"))


def test_job_metrics_parquet(tmp_path, ray_session):
    """The metrics sink (north rule: metrics to Parquet): per-stage rows
    plus a __job__ summary row, appended per run, DuckDB-queryable."""
    import duckdb

    from xlink_ray.job import _write_metrics

    job_row = {"job": "flagship_clusters", "rows": 42, "wall_sec": 1.5,
               "sf_dir": "/x", "method": "fused"}
    stages = [
        {"stage": "clusters", "action": "computed", "rows": 42, "wall_sec": 1.2},
        {"stage": "out", "action": "skipped", "rows": 42, "wall_sec": 0.0},
    ]
    p1 = _write_metrics(str(tmp_path), job_row, stages)
    p2 = _write_metrics(str(tmp_path), job_row, stages)  # append-only
    assert p1 != p2
    rows = duckdb.sql(
        f"SELECT stage, action, rows FROM '{tmp_path}/metrics/*.parquet' "
        "ORDER BY run_ts, stage"
    ).fetchall()
    assert len(rows) == 6
    assert ("__job__", "flagship_clusters", 42) in rows
    assert ("clusters", "computed", 42) in rows


def test_attach_job_resumes(ray_session, tmp_path):
    """--job attach: first run computes + writes 16 buckets; an
    immediate rerun skips the pipeline entirely (manifest-complete)."""
    from xlink_ray.job import main

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    m1 = main(["--job", "attach", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out, "--checkpoint-root", ck])
    assert m1["stages_computed"] == ["attach"] and m1["out_buckets_written"] == 16
    m2 = main(["--job", "attach", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out, "--checkpoint-root", ck])
    assert m2["stages_computed"] == [] and m2["out_buckets_skipped"] == 16
    assert m2["rows"] == m1["rows"] > 0


def test_curate_job_resumes(ray_session, tmp_path):
    """--job curate: first run computes + writes 16 buckets; an
    immediate rerun skips the pipeline entirely (manifest-complete);
    the partitioned output matches the library pipeline's rows."""
    import duckdb

    from xlink_ray.job import main
    from xlink_ray.pipelines.curate import curated_corpus

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    m1 = main(["--job", "curate", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out, "--checkpoint-root", ck])
    assert m1["stages_computed"] == ["curate"] and m1["out_buckets_written"] == 16
    m2 = main(["--job", "curate", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out, "--checkpoint-root", ck])
    assert m2["stages_computed"] == [] and m2["out_buckets_skipped"] == 16
    assert m2["rows"] == m1["rows"] > 0
    ids = set(
        r[0] for r in duckdb.sql(
            f"SELECT doc_id FROM '{out}/*/*.parquet'"
        ).fetchall()
    )
    exp = set(curated_corpus("/root/testdata/sf0.001").to_pandas()["doc_id"])
    assert ids == exp


def test_dsir_job_resumes(ray_session, tmp_path):
    """--job dsir: first run fits + scores + selects; an immediate
    rerun skips the pipeline entirely; the selected set matches the
    library composition."""
    import duckdb

    from xlink_ray.job import main
    from xlink_ray.stages.dsir import dsir_select
    from xlink_ray.util import read_pq

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    m1 = main(["--job", "dsir", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out, "--checkpoint-root", ck, "--dsir-k", "20"])
    assert m1["stages_computed"] == ["dsir_weights"]
    assert m1["out_buckets_written"] == 16 and m1["selected"] == 20
    m2 = main(["--job", "dsir", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out, "--checkpoint-root", ck, "--dsir-k", "20"])
    assert m2["stages_computed"] == [] and m2["out_buckets_skipped"] == 16
    assert m2["rows"] == m1["rows"] > 0

    got = set(
        r[0] for r in duckdb.sql(
            f"SELECT doc_id FROM '{out}-selected/selected.parquet'"
        ).fetchall()
    )
    exp = set(
        dsir_select(
            read_pq("/root/testdata/sf0.001/documents.parquet",
                    columns=["doc_id", "text", "lang"]),
            k=20,
        )["doc_id"].to_pylist()
    )
    assert got == exp

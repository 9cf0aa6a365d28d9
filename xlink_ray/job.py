"""Cluster job driver — the ``ray job submit`` entrypoint (north rule:
"the whole job is launched via ray job submit on fixed-size clusters").

On a real multi-node cluster:

    ray job submit --working-dir . -- \
        python -m xlink_ray.job --sf-dir /data/pages --out /data/clusters \
            --checkpoint-root /data/ckpt

``ray.init(address="auto")`` inside a submitted job attaches to the
hosting cluster; in this sandbox ``RAY_ADDRESS=local`` makes the same
command run single-node. The job is RESUMABLE: every stage writes a
per-partition lineage manifest (see ``xlink_ray.state.checkpoint``),
and a resubmission after a mid-run kill recomputes only incomplete
stages, then skips the final write if the output manifest is complete.

Two job modes: ``--job clusters`` (the standing-crawl flagship run)
and ``--job attach`` (the recurring incremental-crawl job — reuse the
standing dictionary/clusters, attach the new crawl's occurrences;
``pipelines/flagship.attach_new_crawl``).

This module owns a Ray session (it is a CLI entry point); the library
package and ``__ray_entry__`` never call ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _write_metrics(checkpoint_root: str, job_row: dict, stage_rows: list[dict]) -> str:
    """Append-only Parquet metrics sink under the checkpoint root (the
    north rule's "metrics to Parquet"): one file per run, one row per
    stage plus a ``stage='__job__'`` summary row — queryable with any
    Parquet reader across runs (``{root}/metrics/*.parquet``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mdir = os.path.join(checkpoint_root, "metrics")
    os.makedirs(mdir, exist_ok=True)
    run_ts = time.time()
    rows = stage_rows + [
        {
            "stage": "__job__",
            "action": job_row["job"],
            "rows": job_row["rows"],
            "wall_sec": job_row["wall_sec"],
        }
    ]
    tbl = pa.table(
        {
            "run_ts": pa.array([run_ts] * len(rows), pa.float64()),
            "sf_dir": pa.array([job_row["sf_dir"]] * len(rows), pa.string()),
            "method": pa.array([job_row["method"]] * len(rows), pa.string()),
            "stage": pa.array([r["stage"] for r in rows], pa.string()),
            "action": pa.array([r["action"] for r in rows], pa.string()),
            "rows": pa.array([r["rows"] for r in rows], pa.int64()),
            "wall_sec": pa.array([r["wall_sec"] for r in rows], pa.float64()),
        }
    )
    path = os.path.join(mdir, f"run-{time.time_ns()}-{os.getpid()}.parquet")
    pq.write_table(tbl, path)
    return path


def main(argv: "list[str] | None" = None) -> dict:
    p = argparse.ArgumentParser(description="xlink_ray flagship ER job")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="scale dir with documents.parquet (pages are synthesized)")
    p.add_argument("--out", required=True, help="output dir for clusters parquet")
    p.add_argument("--checkpoint-root", required=True,
                   help="per-stage checkpoint/lineage root (resume point)")
    p.add_argument("--method", default="auto",
                   choices=["auto", "local", "distributed", "fused", "block"],
                   help="clustering path (fused/block go through the flagship scan)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for local mode; a submitted job uses the cluster's size")
    p.add_argument("--job", default="clusters",
                   choices=["clusters", "attach", "curate", "dsir"],
                   help="clusters = standing-crawl flagship run; attach = "
                        "incremental crawl (reuse the standing dictionary and "
                        "clusters, attach copies 1..new-repeat-1 of the synth); "
                        "curate = LLM training-data curation (dedup + quality "
                        "+ decontamination + sampling over documents); dsir = "
                        "target-distribution selection (importance weights + "
                        "Gumbel-top-k)")
    p.add_argument("--new-repeat", type=int, default=2,
                   help="attach mode: synth copies forming the new crawl")
    p.add_argument("--dsir-k", type=int, default=100,
                   help="dsir mode: number of documents to select")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "auto")
        kwargs = {"address": addr, "include_dashboard": False}
        if addr == "local" and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from xlink_ray.pipelines import flagship
    from xlink_ray.state.checkpoint import (
        CheckpointManager,
        fingerprint,
        partitioned_sink_complete,
        write_partitioned_resumable,
    )

    t0 = time.time()
    st = os.stat(f"{args.sf_dir}/documents.parquet")
    src_sig = (st.st_size, int(st.st_mtime_ns))  # input-content signal
    n_buckets = 16
    if args.job == "attach":
        return _attach_job(args, src_sig, n_buckets, t0)
    if args.job == "curate":
        return _curate_job(args, src_sig, n_buckets, t0)
    if args.job == "dsir":
        return _dsir_job(args, src_sig, n_buckets, t0)
    sink_fp = fingerprint("clusters-out", args.sf_dir, args.method, *src_sig)

    # fully-resumed rerun: the output manifest already covers every
    # bucket under this fingerprint — don't recompute the pipeline at
    # all just to skip its writes
    done = partitioned_sink_complete(args.out, sink_fp, list(range(n_buckets)))
    if done is not None:
        metrics = {
            "job": "flagship_clusters",
            "sf_dir": args.sf_dir,
            "method": args.method,
            "rows": int(sum(done["done"].values())),
            "stages_skipped": ["clusters", "out"],
            "stages_computed": [],
            "out_buckets_written": 0,
            "out_buckets_skipped": n_buckets,
            "wall_sec": round(time.time() - t0, 3),
        }
        metrics["metrics_path"] = _write_metrics(
            args.checkpoint_root,
            metrics,
            [{"stage": "out", "action": "skipped",
              "rows": metrics["rows"], "wall_sec": 0.0}],
        )
        print(json.dumps(metrics))
        return metrics

    if args.method in ("fused", "block"):
        # scan-fused paths: clustering happens inside the salt-block
        # task; checkpoint the single output stage
        cm = CheckpointManager(args.checkpoint_root)
        fp = fingerprint("flagship-job", args.sf_dir, args.method, *src_sig)
        out = cm.run_stage(
            "clusters", fp, lambda: flagship.clusters(args.sf_dir, method=args.method)
        )
    else:
        out, cm = flagship.clusters_checkpointed(
            args.sf_dir, args.checkpoint_root, method=args.method
        )

    # final output: bucket-partitioned parquet directories, each
    # written atomically and marked in a manifest — a rerun killed
    # mid-write resumes at the first unfinished bucket (never one
    # giant file; state/checkpoint.write_partitioned_resumable)
    def add_bucket(t):
        import numpy as np
        import pyarrow as pa

        from xlink_ray.functions.hashing import md5_low64

        h = md5_low64([str(x) for x in t["cluster_id"].to_pylist()])
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    res = write_partitioned_resumable(
        out.map_batches(add_bucket, batch_format="pyarrow").materialize(),
        args.out,
        by="bucket",
        fp=sink_fp,
        values=list(range(n_buckets)),
    )
    n = sum(m["rows"] for m in [cm.manifest("clusters")] if m) or out.count()
    metrics = {
        "job": "flagship_clusters",
        "sf_dir": args.sf_dir,
        "method": args.method,
        "rows": int(n),
        "stages_skipped": cm.skipped,
        "stages_computed": cm.computed,
        "out_buckets_written": len(res["written"]),
        "out_buckets_skipped": len(res["skipped"]),
        "wall_sec": round(time.time() - t0, 3),
    }
    metrics["metrics_path"] = _write_metrics(
        args.checkpoint_root,
        metrics,
        cm.stage_metrics
        + [{"stage": "out",
            "action": "computed" if res["written"] else "skipped",
            "rows": int(n), "wall_sec": 0.0}],
    )
    print(json.dumps(metrics))
    return metrics


def _curate_job(args, src_sig: tuple, n_buckets: int, t0: float) -> dict:
    """LLM training-data curation job: documents → exact dedup →
    language/quality floor → benchmark decontamination → deterministic
    hash sample (pipelines/curate.curated_corpus), written as
    bucket-partitioned resumable parquet — the recurring corpus-refresh
    job a training-data deployment resubmits per crawl snapshot."""
    from xlink_ray.pipelines.curate import curated_corpus
    from xlink_ray.state.checkpoint import (
        CheckpointManager,
        fingerprint,
        partitioned_sink_complete,
        write_partitioned_resumable,
    )

    sink_fp = fingerprint("curate-out", args.sf_dir, *src_sig)
    done = partitioned_sink_complete(args.out, sink_fp, list(range(n_buckets)))
    if done is not None:
        metrics = {
            "job": "curate",
            "sf_dir": args.sf_dir,
            "method": "curate",
            "rows": int(sum(done["done"].values())),
            "stages_skipped": ["curate", "out"],
            "stages_computed": [],
            "out_buckets_written": 0,
            "out_buckets_skipped": n_buckets,
            "wall_sec": round(time.time() - t0, 3),
        }
        metrics["metrics_path"] = _write_metrics(
            args.checkpoint_root, metrics,
            [{"stage": "out", "action": "skipped",
              "rows": metrics["rows"], "wall_sec": 0.0}],
        )
        print(json.dumps(metrics))
        return metrics

    cm = CheckpointManager(args.checkpoint_root)
    fp = fingerprint("curate-job", args.sf_dir, *src_sig)
    out = cm.run_stage("curate", fp, lambda: curated_corpus(args.sf_dir))

    def add_bucket(t):
        import numpy as np
        import pyarrow as pa

        from xlink_ray.functions.hashing import md5_low64

        h = md5_low64([str(x) for x in t["doc_id"].to_pylist()])
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    res = write_partitioned_resumable(
        out.map_batches(add_bucket, batch_format="pyarrow").materialize(),
        args.out,
        by="bucket",
        fp=sink_fp,
        values=list(range(n_buckets)),
    )
    m = cm.manifest("curate")
    n = (m or {}).get("rows") or out.count()
    metrics = {
        "job": "curate",
        "sf_dir": args.sf_dir,
        "method": "curate",
        "rows": int(n),
        "stages_skipped": cm.skipped,
        "stages_computed": cm.computed,
        "out_buckets_written": len(res["written"]),
        "out_buckets_skipped": len(res["skipped"]),
        "wall_sec": round(time.time() - t0, 3),
    }
    metrics["metrics_path"] = _write_metrics(
        args.checkpoint_root, metrics,
        cm.stage_metrics
        + [{"stage": "out",
            "action": "computed" if res["written"] else "skipped",
            "rows": int(n), "wall_sec": 0.0}],
    )
    print(json.dumps(metrics))
    return metrics


def _dsir_job(args, src_sig: tuple, n_buckets: int, t0: float) -> dict:
    """Target-distribution data-selection job (DSIR): fit the hashed
    n-gram bucket models in one sketch-reduce pass, score every doc
    (checkpointed as the resume point — the expensive corpus pass),
    then Gumbel-top-k select ``--dsir-k`` docs. Outputs: per-doc
    weights as bucket-partitioned resumable parquet under ``--out``,
    plus the small selected set at ``<out>-selected/`` (k-bounded —
    one file is correct here)."""
    from xlink_ray.stages.dsir import (
        bucket_llr_e9,
        dsir_topk,
        dsir_weights,
        ngram_bucket_counts,
    )
    from xlink_ray.state.checkpoint import (
        CheckpointManager,
        fingerprint,
        partitioned_sink_complete,
        write_partitioned_resumable,
    )
    from xlink_ray.util import read_pq

    sink_fp = fingerprint("dsir-out", args.sf_dir, args.dsir_k, *src_sig)
    sel_path = f"{args.out}-selected"
    done = partitioned_sink_complete(args.out, sink_fp, list(range(n_buckets)))
    if done is not None and os.path.exists(f"{sel_path}/selected.parquet"):
        metrics = {
            "job": "dsir",
            "sf_dir": args.sf_dir,
            "method": "dsir",
            "rows": int(sum(done["done"].values())),
            "stages_skipped": ["dsir_weights", "out"],
            "stages_computed": [],
            "out_buckets_written": 0,
            "out_buckets_skipped": n_buckets,
            "wall_sec": round(time.time() - t0, 3),
        }
        metrics["metrics_path"] = _write_metrics(
            args.checkpoint_root, metrics,
            [{"stage": "out", "action": "skipped",
              "rows": metrics["rows"], "wall_sec": 0.0}],
        )
        print(json.dumps(metrics))
        return metrics

    cm = CheckpointManager(args.checkpoint_root)
    fp = fingerprint("dsir-job", args.sf_dir, *src_sig)

    def build():
        docs = read_pq(
            f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        raw, tgt = ngram_bucket_counts(
            docs, target_col="lang", target_val="en"
        )
        return dsir_weights(docs, bucket_llr_e9(tgt, raw))

    weights = cm.run_stage("dsir_weights", fp, build)

    # k-bounded selection (driver table ≤ k·64 rows by construction)
    import pyarrow.parquet as pq

    sel = dsir_topk(weights, args.dsir_k)
    os.makedirs(sel_path, exist_ok=True)
    tmp = f"{sel_path}/.selected.parquet.tmp"
    pq.write_table(sel, tmp)
    os.replace(tmp, f"{sel_path}/selected.parquet")

    def add_bucket(t):
        import numpy as np
        import pyarrow as pa

        from xlink_ray.functions.hashing import md5_low64

        h = md5_low64([str(x) for x in t["doc_id"].to_pylist()])
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    res = write_partitioned_resumable(
        weights.map_batches(add_bucket, batch_format="pyarrow").materialize(),
        args.out,
        by="bucket",
        fp=sink_fp,
        values=list(range(n_buckets)),
    )
    m = cm.manifest("dsir_weights")
    n = (m or {}).get("rows") or weights.count()
    metrics = {
        "job": "dsir",
        "sf_dir": args.sf_dir,
        "method": "dsir",
        "rows": int(n),
        "selected": int(sel.num_rows),
        "stages_skipped": cm.skipped,
        "stages_computed": cm.computed,
        "out_buckets_written": len(res["written"]),
        "out_buckets_skipped": len(res["skipped"]),
        "wall_sec": round(time.time() - t0, 3),
    }
    metrics["metrics_path"] = _write_metrics(
        args.checkpoint_root, metrics,
        cm.stage_metrics
        + [{"stage": "out",
            "action": "computed" if res["written"] else "skipped",
            "rows": int(n), "wall_sec": 0.0}],
    )
    print(json.dumps(metrics))
    return metrics


def _attach_job(args, src_sig: tuple, n_buckets: int, t0: float) -> dict:
    """Incremental-crawl job: reuse the standing dictionary/clusters,
    stream the new crawl through the same scan, attach occurrences
    (pipelines/flagship.attach_new_crawl), write bucket-partitioned
    resumable parquet — the recurring job a deployment resubmits per
    crawl drop."""
    from xlink_ray.pipelines import flagship
    from xlink_ray.state.checkpoint import (
        CheckpointManager,
        fingerprint,
        partitioned_sink_complete,
        write_partitioned_resumable,
    )

    sink_fp = fingerprint(
        "attach-out", args.sf_dir, args.new_repeat, *src_sig
    )
    done = partitioned_sink_complete(args.out, sink_fp, list(range(n_buckets)))
    if done is not None:
        metrics = {
            "job": "flagship_attach",
            "sf_dir": args.sf_dir,
            "method": f"attach@{args.new_repeat}",
            "rows": int(sum(done["done"].values())),
            "stages_skipped": ["attach", "out"],
            "stages_computed": [],
            "out_buckets_written": 0,
            "out_buckets_skipped": n_buckets,
            "wall_sec": round(time.time() - t0, 3),
        }
        metrics["metrics_path"] = _write_metrics(
            args.checkpoint_root, metrics,
            [{"stage": "out", "action": "skipped",
              "rows": metrics["rows"], "wall_sec": 0.0}],
        )
        print(json.dumps(metrics))
        return metrics

    cm = CheckpointManager(args.checkpoint_root)
    fp = fingerprint("attach-job", args.sf_dir, args.new_repeat, *src_sig)
    out = cm.run_stage(
        "attach",
        fp,
        lambda: flagship.attach_new_crawl(args.sf_dir, new_repeat=args.new_repeat),
    )

    def add_bucket(t):
        import numpy as np
        import pyarrow as pa

        from xlink_ray.functions.hashing import md5_low64

        h = md5_low64([str(x) for x in t["member_id"].to_pylist()])
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    res = write_partitioned_resumable(
        out.map_batches(add_bucket, batch_format="pyarrow").materialize(),
        args.out,
        by="bucket",
        fp=sink_fp,
        values=list(range(n_buckets)),
    )
    m = cm.manifest("attach")
    n = (m or {}).get("rows") or out.count()
    metrics = {
        "job": "flagship_attach",
        "sf_dir": args.sf_dir,
        "method": f"attach@{args.new_repeat}",
        "rows": int(n),
        "stages_skipped": cm.skipped,
        "stages_computed": cm.computed,
        "out_buckets_written": len(res["written"]),
        "out_buckets_skipped": len(res["skipped"]),
        "wall_sec": round(time.time() - t0, 3),
    }
    metrics["metrics_path"] = _write_metrics(
        args.checkpoint_root, metrics,
        cm.stage_metrics
        + [{"stage": "out",
            "action": "computed" if res["written"] else "skipped",
            "rows": int(n), "wall_sec": 0.0}],
    )
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()

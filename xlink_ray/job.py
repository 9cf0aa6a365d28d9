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

This module owns a Ray session (it is a CLI entry point); the library
package and ``__ray_entry__`` never call ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import time


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
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "auto")
        kwargs = {"address": addr, "include_dashboard": False}
        if addr == "local" and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from xlink_ray.pipelines import flagship
    from xlink_ray.state.checkpoint import CheckpointManager, fingerprint

    t0 = time.time()
    if args.method in ("fused", "block"):
        # scan-fused paths: clustering happens inside the salt-block
        # task; checkpoint the single output stage
        cm = CheckpointManager(args.checkpoint_root)
        st = os.stat(f"{args.sf_dir}/documents.parquet")
        fp = fingerprint("flagship-job", args.sf_dir, args.method,
                         st.st_size, int(st.st_mtime_ns))
        out = cm.run_stage(
            "clusters", fp, lambda: flagship.clusters(args.sf_dir, method=args.method)
        )
    else:
        out, cm = flagship.clusters_checkpointed(
            args.sf_dir, args.checkpoint_root, method=args.method
        )

    # final output: partitioned parquet (resumable — complete manifest
    # in the checkpoint root means a rerun skips straight to this copy)
    out.write_parquet(args.out)
    n = sum(m["rows"] for m in [cm.manifest("clusters")] if m) or out.count()
    metrics = {
        "job": "flagship_clusters",
        "sf_dir": args.sf_dir,
        "method": args.method,
        "rows": int(n),
        "stages_skipped": cm.skipped,
        "stages_computed": cm.computed,
        "wall_sec": round(time.time() - t0, 3),
    }
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()

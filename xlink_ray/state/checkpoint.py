"""Per-stage Parquet checkpoints with lineage manifests
(SURVEY.md §4.2 "checkpoint/resume"; north rule: "resumable from
checkpoint with per-partition lineage + metrics").

The reference's native pattern is file-per-step JSON persistence with
manual resume by editing the driver (reference main.py:405-481 step
comments; S8 in SURVEY.md §2.1). Here it is explicit and safe:

* each stage writes its output Dataset to ``<root>/<stage>/`` —
  written to a temp dir first and atomically renamed, so a killed run
  never leaves a half-complete directory that looks finished,
* ``manifest.json`` records the stage name, the input fingerprint
  (chained over upstream stages + parameters), schema, row count, and
  a per-partition file list with row counts and byte sizes — the
  lineage + metrics record,
* a rerun calls ``run_stage`` with the same fingerprint: a complete,
  matching manifest short-circuits to ``read_parquet`` of the
  checkpoint (the stage function is never invoked); a fingerprint
  mismatch (input or code-version change) recomputes and replaces.

Fingerprints are content-stable hashes (blake2b) of the parameter
chain — no wall clock or randomness ever enters stage logic.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from xlink_ray.util import read_pq
from ray.data import Dataset

__all__ = [
    "fingerprint",
    "CheckpointManager",
    "write_partitioned_resumable",
    "partitioned_sink_complete",
]

MANIFEST = "manifest.json"


def write_partitioned_resumable(
    ds: Dataset,
    out_dir: str,
    by: str,
    fp: str,
    values: "list | None" = None,
) -> dict:
    """Write ``ds`` as ``out_dir/<by>=<value>/*.parquet`` one partition
    at a time, each atomically (temp dir + rename) and marked complete
    in a manifest — a killed run reruns with the same fingerprint and
    SKIPS every finished partition (the task-spec resumable-output
    shape: one directory per key range, never one giant file).

    ``ds`` should be materialized by the caller: each partition's write
    filters the full dataset (P partitions → P block scans — the
    granularity trade resumability buys; choose ``by`` shard-grained,
    not high-cardinality). A fingerprint mismatch — or any pre-existing
    content WITHOUT a manifest — wipes the directory and rewrites (the
    sink owns ``out_dir``; foreign/legacy files would otherwise be read
    alongside the partition dirs as duplicate rows). The key column is
    dropped from the data files (it lives in the ``<by>=<value>``
    directory name, hive-style). Null keys: value discovery raises;
    with explicit ``values``, rows whose key is absent from the list
    (including nulls) are NOT written. Returns
    {"written": [...], "skipped": [...]}.
    """
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, MANIFEST)
    manifest: dict = {"fingerprint": fp, "done": {}}

    def _wipe() -> None:
        for name in os.listdir(out_dir):
            p = os.path.join(out_dir, name)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)

    if os.path.exists(mpath):
        with open(mpath, encoding="utf-8") as f:
            old = json.load(f)
        if old.get("fingerprint") == fp:
            manifest = old
        else:  # inputs changed: everything below is stale
            _wipe()
    elif os.listdir(out_dir):
        _wipe()  # unmanaged content (e.g. a legacy flat layout)

    # stale temp dirs from a killed previous run (any pid) are never
    # valid — their partition is not in the manifest and will be
    # rewritten; left behind they'd be globbed as duplicate rows
    for name in os.listdir(out_dir):
        if ".tmp-" in name:
            p = os.path.join(out_dir, name)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)

    if values is None:
        vals = set()
        for b in ds.select_columns([by]).iter_batches(batch_format="pyarrow"):
            vals.update(pa.table(b)[by].to_pylist())
        if None in vals:
            raise ValueError(
                f"null values in partition column {by!r}; map them to a "
                "sentinel key upstream (null rows cannot name a directory)"
            )
        values = sorted(vals)

    def _save_manifest() -> None:
        tmp = mpath + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, mpath)

    written, skipped = [], []
    for v in values:
        key = str(v)
        if key in manifest["done"]:
            skipped.append(key)
            continue
        part_dir = os.path.join(out_dir, f"{by}={key}")
        tmp_dir = part_dir + f".tmp-{os.getpid()}"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        sub = ds.map_batches(
            # the key is the directory name; keeping the column too
            # would conflict with hive-partitioned readers
            lambda t, _v=v: t.filter(pc.equal(t[by], _v)).drop_columns([by]),
            batch_format="pyarrow",
        )
        sub.write_parquet(tmp_dir)
        # a zero-row partition writes no files (and possibly no dir);
        # an empty directory is still a valid, complete partition
        os.makedirs(tmp_dir, exist_ok=True)
        rows = sum(
            pq.read_metadata(os.path.join(tmp_dir, n)).num_rows
            for n in os.listdir(tmp_dir)
            if n.endswith(".parquet")
        )
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        manifest["done"][key] = rows
        _save_manifest()  # per-partition durability point
        written.append(key)
    _save_manifest()
    return {"written": written, "skipped": skipped}


def partitioned_sink_complete(out_dir: str, fp: str, values: list) -> "dict | None":
    """The sink manifest if it already covers every value under ``fp``
    — lets a caller skip recomputing the dataset entirely on a fully
    resumed rerun (write_partitioned_resumable itself needs the data)."""
    mpath = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath, encoding="utf-8") as f:
        m = json.load(f)
    if m.get("fingerprint") != fp:
        return None
    done = m.get("done", {})
    return m if all(str(v) in done for v in values) else None


def fingerprint(*parts: object) -> str:
    """Stable fingerprint of a parameter/lineage chain."""
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(repr(p).encode("utf-8"))
        h.update(b"\x1f")
    return h.hexdigest()


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.skipped: list[str] = []
        self.computed: list[str] = []
        self.stage_metrics: list[dict] = []  # per-stage rows for the metrics sink

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def manifest(self, stage: str) -> dict | None:
        path = os.path.join(self._dir(stage), MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    def is_complete(self, stage: str, fp: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("complete") and m.get("fingerprint") == fp)

    def run_stage(self, stage: str, fp: str, fn: Callable[[], Dataset]) -> Dataset:
        """Return the stage's Dataset, recomputing only when needed."""
        d = self._dir(stage)
        if self.is_complete(stage, fp):
            self.skipped.append(stage)
            m = self.manifest(stage) or {}
            self.stage_metrics.append(
                {"stage": stage, "action": "skipped",
                 "rows": int(m.get("rows", 0)), "wall_sec": 0.0}
            )
            return read_pq(d, file_extensions=["parquet"])
        t_start = time.time()

        tmp = d + f".tmp-{os.getpid()}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ds = fn()
        ds.write_parquet(tmp)

        partitions = []
        total_rows = 0
        schema_str = ""
        for name in sorted(os.listdir(tmp)):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(tmp, name)
            meta = pq.read_metadata(fpath)
            schema_str = str(pq.read_schema(fpath))
            partitions.append(
                {
                    "file": name,
                    "rows": meta.num_rows,
                    "bytes": os.path.getsize(fpath),
                }
            )
            total_rows += meta.num_rows

        if os.path.exists(d):
            shutil.rmtree(d)
        os.rename(tmp, d)
        with open(os.path.join(d, MANIFEST), "w", encoding="utf-8") as f:
            json.dump(
                {
                    "stage": stage,
                    "fingerprint": fp,
                    "complete": True,
                    "rows": total_rows,
                    "schema": schema_str,
                    "partitions": partitions,
                    "written_at": time.time(),  # metadata only, not stage logic
                },
                f,
                indent=2,
            )
        self.computed.append(stage)
        self.stage_metrics.append(
            {"stage": stage, "action": "computed", "rows": int(total_rows),
             "wall_sec": round(time.time() - t_start, 3)}
        )
        return read_pq(d, file_extensions=["parquet"])

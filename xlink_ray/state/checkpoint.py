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

import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

__all__ = ["fingerprint", "CheckpointManager"]

MANIFEST = "manifest.json"


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
            return rd.read_parquet(d, file_extensions=["parquet"])

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
        return rd.read_parquet(d, file_extensions=["parquet"])

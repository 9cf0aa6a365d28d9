"""Per-key ordered window functions — the SQL ``OVER (PARTITION BY key
ORDER BY ts)`` family (lag, gap-to-previous, running sum, rolling
mean, row_number) as one distributed operator.

Scale shape: ONE hash exchange on the key (the shared ``_bucket``
scaffold — ~64 buckets, not one group per key), an in-task sort of
each bucket, then pure-numpy kernels over contiguous key runs: run
starts from one vectorized neighbor compare, running sums from a
bucket-wide ``cumsum`` re-based at run starts, rolling windows from
prefix-sum differences with the left edge clamped to the run start.
No per-key python calls, no driver materialization.

The within-key order is (order_col, tie_col) — fully deterministic, so
results are reproducible across partitionings and match the DuckDB
window-function replica row for row."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from xlink_ray.stages._bucket import bucket_shuffle

__all__ = ["keyed_window_stats"]


def keyed_window_stats(
    ds: Dataset,
    key_col: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window: int = 3,
    nbuckets: int = 64,
) -> Dataset:
    """Per row (keyed by ``key_col``, ordered by ``order_col`` then
    ``id_col``): row_number ``rn``, previous value ``lag_value``,
    microseconds since the previous row ``gap_us`` (both null on the
    first row of a key), running ``running_sum``, and ``roll_avg`` over
    the trailing ``window`` rows (inclusive)."""

    def kernel(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[order_col].to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)

        order = np.lexsort((ids, ts_us, keys))
        keys, ids, ts_us, v = keys[order], ids[order], ts_us[order], v[order]
        n = len(keys)
        idx = np.arange(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        start = np.maximum.accumulate(np.where(new, idx, 0))

        rn = idx - start + 1
        lag = np.empty(n, dtype=np.float64)
        lag[1:] = v[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        first = new  # null lag/gap on each run's first row

        cs = np.cumsum(v)
        base = cs[start] - v[start]  # prefix sum just before each run
        cum = cs - base
        lo = np.maximum(idx - window + 1, start)
        roll_sum = cs - cs[lo] + v[lo]
        roll_cnt = (idx - lo + 1).astype(np.float64)

        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                key_col: pa.array(keys, pa.int64()),
                "rn": pa.array(rn, pa.int64()),
                "lag_value": pa.array(lag, pa.float64(), mask=first),
                "gap_us": pa.array(gap, pa.int64(), mask=first),
                "running_sum": pa.array(cum, pa.float64()),
                "roll_avg": pa.array(roll_sum / roll_cnt, pa.float64()),
            }
        )

    cols = ds.select_columns([key_col, order_col, value_col, id_col])
    return bucket_shuffle(cols, key_col, nbuckets, kernel)

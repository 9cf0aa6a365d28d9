"""Per-key ordered window functions (stages/ordered.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_keyed_window_stats_matches_pandas(ray_session):
    from xlink_ray.stages.ordered import keyed_window_stats

    rng = np.random.default_rng(17)
    n = 800
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 37, n).astype(np.int64),
            # coarse timestamps so duplicate (user, ts) ties exercise
            # the event_id tie-break
            "ts": pd.to_datetime(rng.integers(0, 50, n), unit="h"),
            "value": np.round(rng.random(n) * 100, 2),
        }
    )
    got = (
        keyed_window_stats(rd.from_pandas(df).repartition(9), window=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    sdf = df.sort_values(["user_id", "ts", "event_id"]).copy()
    g = sdf.groupby("user_id")
    sdf["rn"] = g.cumcount() + 1
    sdf["lag_value"] = g["value"].shift(1)
    sdf["gap_us"] = (sdf["ts"] - g["ts"].shift(1)).dt.total_seconds() * 1e6
    sdf["running_sum"] = g["value"].cumsum()
    sdf["roll_avg"] = g["value"].rolling(3, min_periods=1).mean().to_numpy()
    want = sdf.sort_values("event_id").reset_index(drop=True)

    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["rn"].tolist() == want["rn"].tolist()
    for col in ["lag_value", "running_sum", "roll_avg"]:
        np.testing.assert_allclose(got[col], want[col], rtol=1e-9, equal_nan=True)
    gap_w = want["gap_us"].to_numpy()
    gap_g = got["gap_us"].to_numpy(dtype=np.float64, na_value=np.nan)
    np.testing.assert_allclose(gap_g, gap_w, rtol=0, atol=0, equal_nan=True)


def test_keyed_window_first_rows_null(ray_session):
    from xlink_ray.stages.ordered import keyed_window_stats

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([5, 5, 9], pa.int64()),
            "ts": pa.array(
                np.array([10, 20, 30], dtype="datetime64[us]"),
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    out = keyed_window_stats(rd.from_arrow(t)).to_pandas().sort_values("event_id")
    assert out["rn"].tolist() == [1, 2, 1]
    assert pd.isna(out["lag_value"]).tolist() == [True, False, True]
    assert pd.isna(out["gap_us"]).tolist() == [True, False, True]
    assert out["running_sum"].tolist() == [1.0, 3.0, 3.0]

"""Randomized-events oracle parity: seeded random event logs with
DELIBERATE per-user timestamp collisions, burst sessions, and sparse users
must keep every events_* operator ≡ its oracle. The driver's synthetic
events table has unique (user, ts) pairs and regular cadence — ties and
bursts are exactly what it never exercises (RANGE-frame peers in
rate_limit, (ts, event_id) tie-breaks in sessionize/asof/transitions)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _make_events(seed: int, n: int = 3000):
    rng = np.random.RandomState(seed)
    user = rng.randint(0, 40, size=n)
    # bursty timeline: mixture of small and session-gap-sized steps, with
    # ~10% exact-duplicate timestamps within a user
    base = rng.randint(0, 3, size=n) * 1_900_000_000 + rng.randint(0, 120_000_000, size=n)
    ts = np.sort(np.cumsum(base) % (30 * 86_400_000_000))
    dup = rng.rand(n) < 0.10
    ts[dup] = np.roll(ts, 1)[dup]  # collide with a neighbor
    etype = rng.choice(["click", "view", "purchase", "scroll"], size=n)
    value = np.round(rng.rand(n) * 100, 3)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts.astype("int64"), pa.timestamp("us")),
            "user_id": pa.array(user.astype("int64"), pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


EVENT_OPS = [
    "events_sessionize", "events_window", "events_hopping_window",
    "events_asof_join", "events_range_join", "events_funnel",
    "events_retention", "events_latest_state", "events_rate_limit",
    "events_transitions", "events_watermark", "events_rollup",
    "events_inter_arrival", "events_gapfill", "events_outlier",
]


@pytest.mark.parametrize("seed", [17, 29])
@pytest.mark.parametrize("name", EVENT_OPS)
def test_random_events_oracle_parity(ray_session, tmp_path_factory, seed, name):
    import duckdb

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp(f"randev{seed}")
    pq.write_table(_make_events(seed), d / "events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")

    result = e.queries()[name](str(d))
    rdf = result.to_pandas() if hasattr(result, "to_pandas") else result
    sdf = con.execute(e.oracle_sql()[name]).fetchdf()
    cols = sorted(rdf.columns)
    assert cols == sorted(sdf.columns)
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = sdf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if a[c].dtype.kind == "f":
            a[c] = a[c].round(6); b[c] = b[c].round(6)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    assert a.equals(b[cols]), f"{name} diverges on random events (seed {seed})"

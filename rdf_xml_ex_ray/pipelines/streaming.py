"""Streaming-shaped operators over the ``events`` log.

Ray Data has no event-time windowing; the pattern (ray guide, SURVEY.md
§2.11) is: treat the input as a partitioned ordered log — partition by key
with ``groupby``, order by ts *inside* the group, and run the window logic
over the sorted group. Ordering assumption: (user_id, ts, event_id) is a
total order per key; no late data (batch table).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.rounding import np_round_half_away

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min

EVENTS_SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_num
  FROM e
)
SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
       CAST(count(*) AS BIGINT) AS n_events,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
FROM s GROUP BY user_id, session_num
"""


def _sessionize_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """All users of one hash bucket, fully vectorized: one sort, numpy gap
    detection, one composite groupby — no per-user Python loop."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy()
    ts_us = g["ts"].astype("int64").to_numpy()
    user_change = np.empty(len(g), dtype=bool)
    user_change[0] = True
    user_change[1:] = users[1:] != users[:-1]
    gap = np.empty(len(g), dtype=bool)
    gap[0] = True
    gap[1:] = (ts_us[1:] - ts_us[:-1]) > SESSION_GAP_US
    new_session = user_change | gap
    sess_global = np.cumsum(new_session)
    first_of_user = np.repeat(
        sess_global[user_change], np.diff(np.append(np.flatnonzero(user_change), len(g)))
    )
    session_num = sess_global - first_of_user + 1
    df = pd.DataFrame({"user_id": users, "session_num": session_num, "ts_us": ts_us})
    agg = (
        df.groupby(["user_id", "session_num"], sort=False)
        .agg(n_events=("ts_us", "size"), start_us=("ts_us", "min"), end_us=("ts_us", "max"))
        .reset_index()
    )
    return agg.astype(
        {
            "user_id": "int64",
            "session_num": "int64",
            "n_events": "int64",
            "start_us": "int64",
            "end_us": "int64",
        }
    )


def events_sessionize(sf_dir: str, num_buckets: int = 64):
    """Session windows (30-min inactivity gap) per user. The shuffle key is
    ``user_id % num_buckets`` — users co-locate, group count stays fixed."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "user_bucket", pa.array((uid % num_buckets).astype(np.int32))
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    out = bucketed.groupby("user_bucket").map_groups(_sessionize_bucket, batch_format="pandas")
    return out


# ------------------------------------------------------------- range join

# Range join: every event matched to the session window [start_us, end_us]
# that contains it. The oracle performs the literal BETWEEN range join
# against the sessionize output; the operator exploits that session windows
# PARTITION each user's timeline, so containment equals the running session
# number — one sorted pass per bucket instead of an interval join.
EVENTS_RANGE_JOIN_SQL = f"""
WITH sess AS ({EVENTS_SESSIONIZE_SQL})
SELECT ev.event_id, ev.user_id, CAST(s.session_num AS BIGINT) AS session_num
FROM events ev
JOIN sess s ON s.user_id = ev.user_id
           AND epoch_us(ev.ts) BETWEEN s.start_us AND s.end_us
"""


def _range_join_bucket(group: pd.DataFrame) -> pa.Table:
    g = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy()
    ts_us = g["ts_us"].to_numpy()
    n = len(g)
    user_change = np.empty(n, dtype=bool)
    user_change[0] = True
    user_change[1:] = users[1:] != users[:-1]
    gap = np.empty(n, dtype=bool)
    gap[0] = True
    gap[1:] = (ts_us[1:] - ts_us[:-1]) > SESSION_GAP_US
    new_session = user_change | gap
    sess_global = np.cumsum(new_session)
    first_of_user = np.repeat(
        sess_global[user_change], np.diff(np.append(np.flatnonzero(user_change), n))
    )
    session_num = sess_global - first_of_user + 1
    return pa.table(
        {
            "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "session_num": pa.array(session_num, pa.int64()),
        }
    )


def events_range_join(sf_dir: str, num_buckets: int = 64):
    """Event → containing session window (range-join semantics; see
    EVENTS_RANGE_JOIN_SQL for the literal interval-join oracle)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "user_bucket": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    bucketed = ds.map_batches(prep, batch_format="pyarrow")
    return bucketed.groupby("user_bucket").map_groups(_range_join_bucket, batch_format="pandas")


# ------------------------------------------------------------- as-of join

# The classic attribution as-of join — an operator Ray Data has no primitive
# for (SURVEY §2.11 custom-operator case): each purchase matched to the SAME
# user's most recent prior click. Deterministic because (user_id, ts) is
# unique in the events table; ordering key is (ts, event_id) everywhere.
EVENTS_ASOF_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
  FROM events WHERE event_type IN ('click', 'purchase')
),
m AS (
  SELECT user_id, event_id, ts_us, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
           OVER w AS click_ts
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_event_id,
       CAST(click_id AS BIGINT) AS click_event_id,
       CAST(ts_us - click_ts AS BIGINT) AS gap_us
FROM m WHERE event_type = 'purchase'
"""


def _asof_bucket(group: pd.DataFrame) -> pa.Table:
    """Backward as-of match inside one user-hash bucket, fully vectorized:
    one sort, a forward-fill of click positions via maximum.accumulate, and
    a per-user validity mask — no per-user Python loop."""
    g = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy()
    ts_us = g["ts_us"].to_numpy()
    eids = g["event_id"].to_numpy()
    is_click = (g["event_type"] == "click").to_numpy()
    n = len(g)
    idx = np.where(is_click, np.arange(n), -1)
    last_click_pos = np.maximum.accumulate(idx)
    # positions before each user's first row are another user's clicks
    user_change = np.empty(n, dtype=bool)
    user_change[0] = True
    user_change[1:] = users[1:] != users[:-1]
    user_start = np.maximum.accumulate(np.where(user_change, np.arange(n), -1))
    valid = last_click_pos >= user_start
    is_purchase = ~is_click
    sel = np.flatnonzero(is_purchase)
    match = last_click_pos[sel]
    ok = valid[sel]
    click_eid = [int(eids[m]) if o else None for m, o in zip(match, ok)]
    gap = [int(ts_us[s] - ts_us[m]) if o else None for s, m, o in zip(sel, match, ok)]
    return pa.table(
        {
            "purchase_event_id": pa.array(eids[sel], pa.int64()),
            "click_event_id": pa.array(click_eid, pa.int64()),
            "gap_us": pa.array(gap, pa.int64()),
        }
    )


def events_asof_join(sf_dir: str, num_buckets: int = 64):
    """Backward as-of join (purchase → latest prior click per user) over the
    partitioned ordered log: filter to the two event types at the read, hash
    users into fixed-cardinality buckets, match inside each sorted group.
    The shuffle moves only the two relevant event types — at 100 TB the
    exchange is O(clicks+purchases), not O(events)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch["event_type"], value_set=pa.array(["click", "purchase"])))
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "user_bucket": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    bucketed = ds.map_batches(prep, batch_format="pyarrow")
    return bucketed.groupby("user_bucket").map_groups(_asof_bucket, batch_format="pandas")


EVENTS_WINDOW_SQL = """
SELECT user_id,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY user_id, hour_bucket
"""


HOP_STEP_US = 900_000_000  # 15-minute hop
HOP_WINDOWS = 4  # 1-hour windows → each event lands in 4 hops

EVENTS_HOPPING_WINDOW_SQL = f"""
SELECT user_id,
       CAST(epoch_us(ts) // {HOP_STEP_US} - k.k AS BIGINT) AS window_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events, UNNEST(range(0, {HOP_WINDOWS})) AS k(k)
GROUP BY user_id, window_idx
"""


def events_hopping_window(sf_dir: str):
    """Hopping (overlapping) windows: 1-hour windows every 15 minutes —
    each event contributes to HOP_WINDOWS consecutive windows. The
    expansion is vectorized (one shifted copy per hop, concatenated) and
    pre-aggregated in-batch before the small groupby, so the exchange
    carries O(users × windows) partials, not ×4 raw events."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        base = pc.divide(pc.cast(batch["ts"], pa.int64()), HOP_STEP_US)
        copies = []
        for k in range(HOP_WINDOWS):
            copies.append(
                pa.table(
                    {
                        "user_id": batch["user_id"],
                        "window_idx": pc.cast(pc.subtract(base, k), pa.int64()),
                        "value": batch["value"],
                    }
                )
            )
        t = pa.concat_tables(copies)
        agg = t.group_by(["user_id", "window_idx"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(["user_id", "window_idx", "n_part", "sum_part"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["user_id", "window_idx"]).aggregate(
        Sum("n_part", alias_name="n_events"), Sum("sum_part", alias_name="sum_value")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "window_idx": batch["window_idx"],
                "n_events": pc.cast(batch["n_events"], pa.int64()),
                # np_round_half_away, not pc.round: pyarrow's round can return a
                # different last-ulp double than DuckDB for the same sum
                # (e.g. 109.53999... stays put vs DuckDB's 109.54 double)
                "sum_value": pa.array(
                    np_round_half_away(batch["sum_value"].to_numpy(zero_copy_only=False), 4),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def events_window(sf_dir: str):
    """Tumbling 1-hour windows per user: vectorized in-batch partial
    aggregation (combiner) → small groupby over partials."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(batch["ts"], pa.int64()), 3_600_000_000)
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "hour_bucket": pc.cast(hour, pa.int64()),
                "value": batch["value"],
            }
        )
        agg = t.group_by(["user_id", "hour_bucket"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(["user_id", "hour_bucket", "n_part", "sum_part"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["user_id", "hour_bucket"]).aggregate(
        Sum("n_part", alias_name="n_events"), Sum("sum_part", alias_name="sum_value")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hour_bucket": batch["hour_bucket"],
                "n_events": pc.cast(batch["n_events"], pa.int64()),
                # np_round_half_away, not pc.round: pyarrow's round can return a
                # different last-ulp double than DuckDB for the same sum
                # (e.g. 109.53999... stays put vs DuckDB's 109.54 double)
                "sum_value": pa.array(
                    np_round_half_away(batch["sum_value"].to_numpy(zero_copy_only=False), 4),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# ------------------------------------------------------------ ordered funnel

FUNNEL_STAGES = ("view", "click", "purchase")

EVENTS_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT u.user_id,
       CAST((v.user_id IS NOT NULL)::INT + (c.user_id IS NOT NULL)::INT
            + (p.user_id IS NOT NULL)::INT AS BIGINT) AS funnel_stage,
       coalesce(epoch_us(v.t1), -1) AS t_view_us,
       coalesce(epoch_us(c.t2), -1) AS t_click_us,
       coalesce(epoch_us(p.t3), -1) AS t_purchase_us
FROM u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
"""


def _funnel_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """All users of one hash bucket, vectorized: three masked groupby-mins
    chained through per-user joins — no per-user Python loop. Strictly
    ordered semantics: stage i counts only events strictly after the
    user's first stage-(i-1) event."""
    df = pd.DataFrame(
        {
            "user_id": group["user_id"].to_numpy(),
            "ts_us": group["ts"].astype("int64").to_numpy(),
            "event_type": group["event_type"].to_numpy(),
        }
    )
    users = pd.DataFrame({"user_id": np.unique(df["user_id"].to_numpy())})

    t1 = df[df["event_type"] == FUNNEL_STAGES[0]].groupby("user_id")["ts_us"].min()
    m = df.merge(t1.rename("t1"), left_on="user_id", right_index=True, how="inner")
    t2 = (
        m[(m["event_type"] == FUNNEL_STAGES[1]) & (m["ts_us"] > m["t1"])]
        .groupby("user_id")["ts_us"]
        .min()
    )
    m2 = df.merge(t2.rename("t2"), left_on="user_id", right_index=True, how="inner")
    t3 = (
        m2[(m2["event_type"] == FUNNEL_STAGES[2]) & (m2["ts_us"] > m2["t2"])]
        .groupby("user_id")["ts_us"]
        .min()
    )

    out = (
        users.merge(t1.rename("t_view_us"), left_on="user_id", right_index=True, how="left")
        .merge(t2.rename("t_click_us"), left_on="user_id", right_index=True, how="left")
        .merge(t3.rename("t_purchase_us"), left_on="user_id", right_index=True, how="left")
    )
    out["funnel_stage"] = (
        out["t_view_us"].notna().astype("int64")
        + out["t_click_us"].notna().astype("int64")
        + out["t_purchase_us"].notna().astype("int64")
    )
    # -1 sentinel, not NULL: a nullable epoch column surfaces as float64 on
    # at least one engine, and microsecond epochs (~1.7e15) lose exactness
    # the moment a 6-decimal rounding scales them past 2^53 — keep every
    # compared column integral
    for c in ("t_view_us", "t_click_us", "t_purchase_us"):
        out[c] = out[c].fillna(-1)
    return out[["user_id", "funnel_stage", "t_view_us", "t_click_us", "t_purchase_us"]].astype(
        {
            "user_id": "int64",
            "funnel_stage": "int64",
            "t_view_us": "int64",
            "t_click_us": "int64",
            "t_purchase_us": "int64",
        }
    )


def events_funnel(sf_dir: str, num_buckets: int = 64):
    """Ordered conversion funnel (view → click → purchase) per user: the
    furthest stage reached with each step strictly after the previous
    step's first occurrence, plus the stage timestamps. Same partitioned
    ordered-log shape as sessionize — users co-locate by hash bucket, the
    funnel logic is three vectorized masked mins inside the group; events
    outside the funnel's three types are dropped at the first map (the
    exchange carries only funnel-relevant rows)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_type"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        # keep every user (stage-0 rows must exist) but only funnel-typed
        # events need their type downstream; collapsing others to a
        # sentinel would save nothing here, so just bucket and pass through
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "user_bucket", pa.array((uid % num_buckets).astype(np.int32))
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("user_bucket").map_groups(_funnel_bucket, batch_format="pandas")


# ---------------------------------------------------------- events_retention

# Classic cohort retention: cohort = the user's first active day, offset =
# days since cohort; cell value = distinct users from that cohort active at
# that offset. The growth-analytics table every event log gets rolled into.
DAY_US = 86_400_000_000

EVENTS_RETENTION_SQL = f"""
WITH d AS (
  SELECT user_id, CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day FROM events
),
c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
a AS (
  SELECT DISTINCT d.user_id, c.cohort_day, d.day - c.cohort_day AS day_offset
  FROM d JOIN c USING (user_id)
)
SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort_day, day_offset
"""


def _retention_bucket(group: pd.DataFrame) -> pa.Table:
    d = group[["user_id", "day"]].drop_duplicates()
    cohort = d.groupby("user_id")["day"].transform("min")
    cells = (
        pd.DataFrame({"cohort_day": cohort, "day_offset": d["day"] - cohort})
        .groupby(["cohort_day", "day_offset"], sort=False)
        .size()
    )
    idx = cells.index
    return pa.table(
        {
            "cohort_day": pa.array(idx.get_level_values(0).to_numpy(np.int64), pa.int64()),
            "day_offset": pa.array(idx.get_level_values(1).to_numpy(np.int64), pa.int64()),
            "n_part": pa.array(cells.to_numpy(np.int64), pa.int64()),
        }
    )


def events_retention(sf_dir: str, num_buckets: int = 64):
    """Cohort/offset matrix in ONE user-bucket exchange + one tiny groupby:
    the map stage collapses each batch to distinct (user, day) pairs (the
    exchange carries O(users x active-days), not O(events)); each user's
    whole history co-locates in its hash bucket, so cohort (min day) and
    the distinct-offset set are bucket-local; per-bucket partial cell
    counts then sum through a groupby whose cardinality is the cohort
    matrix itself (~days^2) — trivially small at any event volume."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])

    def day_pairs(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        )
        t = (
            pa.table(
                {
                    "user_id": pa.array(uid, pa.int64()),
                    "day": pa.array(day, pa.int64()),
                }
            )
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        uid2 = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "user_bucket", pa.array((uid2 % num_buckets).astype(np.int32))
        )

    bucketed = ds.map_batches(day_pairs, batch_format="pyarrow")
    partials = bucketed.groupby("user_bucket").map_groups(
        _retention_bucket, batch_format="pandas"
    )
    agg = partials.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n_part", alias_name="n_users")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "cohort_day": t["cohort_day"].cast(pa.int64()),
                "day_offset": t["day_offset"].cast(pa.int64()),
                "n_users": t["n_users"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# -------------------------------------------------------- events_latest_state

EVENTS_LATEST_STATE_SQL = """
WITH r AS (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts AS last_ts, CAST(event_id AS BIGINT) AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM r WHERE rn = 1
"""


def _latest_in_frame(g: pd.DataFrame) -> pd.DataFrame:
    return (
        g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .groupby("user_id", sort=False)
        .tail(1)
    )


def events_latest_state(sf_dir: str, num_buckets: int = 64):
    """CDC-style log compaction: the latest event per user (deterministic
    (ts, event_id) tiebreak) — the snapshot/upsert-materialization primitive
    of a streaming ingest path.

    Each block first reduces to its own per-user latest rows (so the
    exchange carries at most one row per (block, user), never the raw log),
    then the standard user-hash bucket shuffle picks the global winner per
    user with one vectorized sort + tail(1) per bucket — no per-user groups,
    no driver state."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        best = _latest_in_frame(batch.to_pandas())
        uid = best["user_id"].to_numpy(dtype=np.int64)
        t = pa.table(
            {
                "user_id": pa.array(uid),
                "ts": pa.array(best["ts"]),
                "event_id": pa.array(best["event_id"].astype("int64")),
                "event_type": pa.array(best["event_type"], pa.string()),
                "value": pa.array(best["value"].astype("float64")),
            }
        )
        return t.append_column(
            "user_bucket", pa.array((uid % num_buckets).astype(np.int32))
        )

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        best = _latest_in_frame(g)
        return pd.DataFrame(
            {
                "user_id": best["user_id"].astype("int64"),
                "last_ts": best["ts"],
                "last_event_id": best["event_id"].astype("int64"),
                "last_event_type": best["event_type"].astype(str),
                "last_value": best["value"].astype("float64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(final_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------- events_rate_limit

RATE_WINDOW_US = 60 * 60 * 1_000_000  # 1-hour sliding window
RATE_LIMIT = 2  # allowed iff <= RATE_LIMIT events (incl. self) in the window

EVENTS_RATE_LIMIT_SQL = f"""
SELECT event_id, user_id,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_in_window,
       count(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) <= {RATE_LIMIT} AS allowed
FROM events
"""


def _rate_limit_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One hash bucket of users, vectorized: sort once, then two
    searchsorted sweeps per user segment give each event its sliding-window
    population (RANGE semantics — ts peers count together, so the result is
    well-defined under duplicate timestamps, matching SQL)."""
    g = group.sort_values(["user_id", "ts"], kind="mergesort")
    users = g["user_id"].to_numpy()
    ts_us = g["ts"].astype("int64").to_numpy()
    n = len(g)
    starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
    bounds = np.append(starts, n)
    counts = np.empty(n, dtype=np.int64)
    for a, b in zip(bounds[:-1], bounds[1:]):  # per-user segment, O(seg log seg)
        seg = ts_us[a:b]
        hi = np.searchsorted(seg, seg, side="right")
        lo = np.searchsorted(seg, seg - RATE_WINDOW_US, side="left")
        counts[a:b] = hi - lo
    return pd.DataFrame(
        {
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "n_in_window": counts,
            "allowed": counts <= RATE_LIMIT,
        }
    )


def events_rate_limit(sf_dir: str, num_buckets: int = 64):
    """Sliding-window rate limiting: each event tagged with its user's
    event count over the trailing hour and an allowed/throttled flag — the
    admission-control / abuse-throttling primitive of an ingest path.
    Same user-hash bucket shuffle as sessionize; inside a bucket the sweep
    is one sort + two binary-search passes per user segment."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "user_bucket", pa.array((uid % num_buckets).astype(np.int32))
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(_rate_limit_bucket, batch_format="pandas")
    )


# --------------------------------------------------------- events_transitions

EVENTS_TRANSITIONS_SQL = """
WITH ordered AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type, CAST(count(*) AS BIGINT) AS n
FROM ordered WHERE nxt IS NOT NULL
GROUP BY from_type, to_type
"""


def _transitions_bucket(group: pd.DataFrame) -> pa.Table:
    """Per-bucket partial transition counts, fully vectorized: one sort,
    one shifted comparison for the user boundary, one tiny pandas groupby
    over the (from, to) pairs (≤ |event_types|² rows leave the bucket)."""
    g = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy()
    types = g["event_type"].to_numpy()
    if len(g) < 2:
        return pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "n_part": pa.array([], pa.int64()),
            }
        )
    same_user = users[1:] == users[:-1]
    pairs = pd.DataFrame(
        {"from_type": types[:-1][same_user], "to_type": types[1:][same_user]}
    )
    agg = pairs.groupby(["from_type", "to_type"], sort=False).size().reset_index(name="n_part")
    return pa.table(
        {
            "from_type": pa.array(agg["from_type"], pa.string()),
            "to_type": pa.array(agg["to_type"], pa.string()),
            "n_part": pa.array(agg["n_part"].to_numpy(), pa.int64()),
        }
    )


def events_transitions(sf_dir: str, num_buckets: int = 64):
    """Event-type transition matrix (first-order Markov counts): for every
    user's (ts, event_id)-ordered stream, count consecutive event_type
    pairs corpus-wide. The behavioral-modeling primitive behind next-event
    prediction features and funnel diagnostics.

    Scale shape: ONE user-hash bucketed shuffle (users co-locate, bucket
    count fixed), per-bucket vectorized pair counting emits at most
    |event_types|² partial rows per bucket, and the final groupby runs over
    buckets × that — independent of event volume."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "user_bucket": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    partials = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(_transitions_bucket, batch_format="pandas")
    )
    return partials.groupby(["from_type", "to_type"]).aggregate(Sum("n_part", alias_name="n"))


# ----------------------------------------------------------- events_watermark

# Out-of-order / late-data analysis — the watermark primitive of stream
# processors: replay the log in ARRIVAL order (event_id) and measure how
# far each event's timestamp lags the per-user high-watermark (max ts seen
# so far). late = lateness above the allowed skew. Everything integer
# microseconds.
WATERMARK_SKEW_US = 5 * 60 * 1_000_000  # 5-minute allowed lateness
DELAY_SPAN_US = 10 * 60 * 1_000_000  # simulated network delay in [0, 10 min)

EVENTS_WATERMARK_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         epoch_us(ts)
         + CAST((('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),15,2) || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),13,2) || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),11,2) || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),9,2) || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),7,2) || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),5,2) || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),3,2) || substr(md5(CAST(event_id AS VARCHAR) || ':delay'),1,2))::UBIGINT) % {DELAY_SPAN_US} AS BIGINT) AS arr_us
  FROM events
)
SELECT event_id, user_id,
       CAST(greatest(
         max(ts_us) OVER (PARTITION BY user_id ORDER BY arr_us, event_id
                          ROWS UNBOUNDED PRECEDING) - ts_us, 0) AS BIGINT) AS lateness_us,
       greatest(
         max(ts_us) OVER (PARTITION BY user_id ORDER BY arr_us, event_id
                          ROWS UNBOUNDED PRECEDING) - ts_us, 0) > {WATERMARK_SKEW_US} AS late
FROM e
"""


def _watermark_bucket(group: pd.DataFrame) -> pa.Table:
    """One user-hash bucket: sort by (user_id, arr_us, event_id) = simulated
    arrival order per user, running-max ts per user segment (segments are
    contiguous after the sort; the accumulate inside is vectorized)."""
    g = group.sort_values(["user_id", "arr_us", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy()
    ts_us = g["ts_us"].to_numpy()
    n = len(g)
    run_max = np.empty(n, dtype=ts_us.dtype)
    starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
    bounds = np.append(starts, n)
    for a, b in zip(bounds[:-1], bounds[1:]):
        run_max[a:b] = np.maximum.accumulate(ts_us[a:b])
    lateness = np.maximum(run_max - ts_us, 0).astype(np.int64)
    return pa.table(
        {
            "event_id": pa.array(g["event_id"].astype("int64")),
            "user_id": pa.array(users.astype(np.int64), pa.int64()),
            "lateness_us": pa.array(lateness, pa.int64()),
            "late": pa.array(lateness > WATERMARK_SKEW_US),
        }
    )


def events_watermark(sf_dir: str, num_buckets: int = 64):
    """Per-event lateness vs the per-user high-watermark in simulated
    arrival order (arrival = ts + deterministic hash delay in
    [0, DELAY_SPAN_US) — the events table is perfectly ordered, so the
    delay model injects the out-of-orderness a network would). The audit a
    batch engine runs to size a stream's late-data allowance. Same single
    user-hash bucket shuffle as sessionize."""
    import hashlib

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        delays = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{e}:delay".encode()).digest()[:8], "little"
                ) % DELAY_SPAN_US
                for e in batch["event_id"].to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": pa.array(ts_us, pa.int64()),
                "arr_us": pa.array(ts_us + delays, pa.int64()),
                "user_bucket": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(_watermark_bucket, batch_format="pandas")
    )


# -------------------------------------------------------------- events_rollup

# Multi-level (ROLLUP) aggregation: event counts at (event_type, day),
# (event_type) and () granularities in ONE scan — the OLAP-cube primitive a
# reporting pipeline runs over the event log. The distributed shape is the
# rollup CASCADE: only the finest level aggregates from raw rows; each
# coarser level aggregates the PREVIOUS level's (tiny) output, so the log
# is read once and the exchanges above the first move O(groups), not
# O(events). All-integer outputs.
EVENTS_ROLLUP_SQL = """
SELECT
  CAST(CASE WHEN event_type IS NULL THEN 0
            WHEN day IS NULL THEN 1 ELSE 2 END AS BIGINT) AS level,
  coalesce(event_type, '*') AS event_type,
  coalesce(day, '*') AS day,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_lb
FROM (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
)
GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
"""


def events_rollup(sf_dir: str, num_buckets: int = 64):
    """Cascading rollup over the events log.

    n_events cascades exactly (sums of sums); exact COUNT(DISTINCT user_id)
    does NOT cascade, so every level counts distinct users from the same
    (level-keyed) user roster: the scan emits per-batch DISTINCT
    (key, user) partials for all three levels at once — the dedup happens
    progressively (in-batch pandas drop_duplicates first, then per
    key-bucket group), never on the driver. Rows shuffled: O(distinct
    (key, user) pairs), the same bound an exact distinct costs anywhere."""
    import zlib

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "user_id"]
    )

    LEVELS = ((2, True, True), (1, True, False), (0, False, False))

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d").to_pylist(),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        frames = []
        for level, use_et, use_day in LEVELS:
            k = df.copy()
            if not use_et:
                k["event_type"] = "*"
            if not use_day:
                k["day"] = "*"
            users = k.drop_duplicates(["event_type", "day", "user_id"]).assign(n_part=0)
            counts = (
                k.groupby(["event_type", "day"], sort=False)
                .size()
                .reset_index(name="n_part")
                .assign(user_id=-1)
            )
            frames.append(pd.concat([users, counts]).assign(level=level))
        out = pd.concat(frames, ignore_index=True)
        kb = np.fromiter(
            (
                zlib.crc32(f"{a}|{b}|{c}".encode()) % num_buckets
                for a, b, c in zip(out["level"], out["event_type"], out["day"])
            ),
            dtype=np.int32,
            count=len(out),
        )
        return pa.table(
            {
                "level": pa.array(out["level"].astype("int64")),
                "event_type": pa.array(out["event_type"], pa.string()),
                "day": pa.array(out["day"], pa.string()),
                "user_id": pa.array(out["user_id"].astype("int64")),
                "n_part": pa.array(out["n_part"].astype("int64")),
                "kbucket": pa.array(kb),
            }
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        agg = (
            group.groupby(["level", "event_type", "day"], sort=False)
            .agg(
                n_events=("n_part", "sum"),
                n_users_lb=("user_id", lambda s: s[s >= 0].nunique()),
            )
            .reset_index()
        )
        return pa.table(
            {
                "level": pa.array(agg["level"].astype("int64")),
                "event_type": pa.array(agg["event_type"], pa.string()),
                "day": pa.array(agg["day"], pa.string()),
                "n_events": pa.array(agg["n_events"].astype("int64")),
                "n_users_lb": pa.array(agg["n_users_lb"].astype("int64")),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("kbucket")
        .map_groups(merge, batch_format="pandas")
    )


# ------------------------------------------------------- events_inter_arrival

# Per-user inter-arrival features — the behavioral signals (activity
# cadence) a user-model pipeline derives from the event log. All integers
# (microsecond gaps; counts), one user-hash bucket shuffle.
EVENTS_INTER_ARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(count(gap_us) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


def _inter_arrival_bucket(group: pd.DataFrame) -> pa.Table:
    g = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy()
    ts_us = g["ts_us"].to_numpy()
    same = np.r_[False, users[1:] == users[:-1]]
    gaps = np.empty(len(g), dtype=np.int64)
    gaps[1:] = ts_us[1:] - ts_us[:-1]
    df = pd.DataFrame({"user_id": users[same], "gap_us": gaps[same]})
    if not len(df):
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "min_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64()),
                "sum_gap_us": pa.array([], pa.int64()),
            }
        )
    agg = df.groupby("user_id", sort=False)["gap_us"].agg(["count", "min", "max", "sum"]).reset_index()
    return pa.table(
        {
            "user_id": pa.array(agg["user_id"].astype("int64")),
            "n_gaps": pa.array(agg["count"].astype("int64")),
            "min_gap_us": pa.array(agg["min"].astype("int64")),
            "max_gap_us": pa.array(agg["max"].astype("int64")),
            "sum_gap_us": pa.array(agg["sum"].astype("int64")),
        }
    )


def events_inter_arrival(sf_dir: str, num_buckets: int = 64):
    """Per-user inter-event gap statistics over the (ts, event_id)-ordered
    stream. Same single user-hash bucketed shuffle as sessionize; inside a
    bucket the gaps come from one shifted subtraction and a pandas groupby
    (users with a single event emit no row, matching the SQL WHERE)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "user_bucket": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(_inter_arrival_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------ events_gapfill

# Gap-fill + forward-fill: densify each user's event stream onto an hourly
# grid (min..max hour of that user), carrying the last observed ``value``
# across empty hours — the time-series regularization primitive feeding
# downstream window features. Vectorized per bucket: one sort, then
# searchsorted boundaries give both the per-hour event count AND the
# forward-filled value in O(grid + events) with no per-user Python loop
# (the index of the last event at-or-before each grid hour IS the ffill).
HOUR_US = 3_600_000_000

EVENTS_GAPFILL_SQL = """
WITH b AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hr, epoch_us(ts) AS ts_us, event_id, value
  FROM events
),
span AS (SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM b GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS hr FROM span),
hourly AS (
  SELECT user_id, hr, value,
         row_number() OVER (PARTITION BY user_id, hr ORDER BY ts_us DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, hr) AS n_ev
  FROM b
),
hlast AS (SELECT user_id, hr, n_ev, value AS lastv FROM hourly WHERE rn = 1),
j AS (
  SELECT g.user_id, g.hr, coalesce(h.n_ev, 0) AS n_events, h.lastv
  FROM grid g LEFT JOIN hlast h USING (user_id, hr)
)
SELECT user_id, CAST(hr AS BIGINT) AS hour, CAST(n_events AS BIGINT) AS n_events,
       last_value(lastv IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hr ROWS UNBOUNDED PRECEDING) AS last_value
FROM j
"""


def _gapfill_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy(dtype=np.int64)
    hrs = g["ts_us"].to_numpy(dtype=np.int64) // HOUR_US
    vals = g["value"].to_numpy(dtype=np.float64)
    out_u, out_h, out_n, out_v = [], [], [], []
    starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
    bounds = np.append(starts, len(g))
    for i, j in zip(bounds[:-1], bounds[1:]):
        h, v = hrs[i:j], vals[i:j]
        grid = np.arange(h[0], h[-1] + 1, dtype=np.int64)
        right = np.searchsorted(h, grid, side="right")
        left = np.searchsorted(h, grid, side="left")
        out_u.append(np.full(len(grid), users[i], dtype=np.int64))
        out_h.append(grid)
        out_n.append((right - left).astype(np.int64))
        # within a (user, hour) the sort puts the (ts, event_id)-last event
        # last, so right-1 indexes exactly the SQL's rn=1 row — and for an
        # empty hour it indexes the most recent earlier event: the ffill
        out_v.append(v[right - 1])
    return pd.DataFrame(
        {
            "user_id": np.concatenate(out_u),
            "hour": np.concatenate(out_h),
            "n_events": np.concatenate(out_n),
            "last_value": np.concatenate(out_v),
        }
    )


def events_gapfill(sf_dir: str, num_buckets: int = 64):
    """(user_id, hour, n_events, last_value) on each user's dense hour grid."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"],
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"].cast(pa.int64()),
                "value": batch["value"].cast(pa.float64()),
                "user_bucket": pa.array((uid % num_buckets).astype(np.int32)),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(_gapfill_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------ events_outlier

# Per-user outlier gate: flag events whose value strictly exceeds that
# user's exact 95th percentile (rank rule: ascending sort, the value at
# index ceil(0.95·n)−1 — the doc_length_filter exact-percentile
# convention, replayed identically in SQL via row_number). All
# comparisons are exact doubles: no interpolation, no float arithmetic.
OUTLIER_Q = 0.95

EVENTS_OUTLIER_SQL = f"""
WITH r AS (
  SELECT user_id, value, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
thr AS (
  SELECT user_id, value AS p95 FROM r WHERE rk = CAST(ceil({OUTLIER_Q} * n) AS BIGINT)
)
SELECT e.event_id, e.user_id, e.value, t.p95
FROM events e JOIN thr t USING (user_id)
WHERE e.value > t.p95
"""


def _outlier_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["user_id", "value", "event_id"], kind="mergesort")
    users = g["user_id"].to_numpy(dtype=np.int64)
    vals = g["value"].to_numpy(dtype=np.float64)
    eids = g["event_id"].to_numpy(dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
    bounds = np.append(starts, len(g))
    out = []
    for i, j in zip(bounds[:-1], bounds[1:]):
        n = j - i
        p95 = vals[i + int(np.ceil(OUTLIER_Q * n)) - 1]
        mask = vals[i:j] > p95
        if mask.any():
            out.append(
                pd.DataFrame(
                    {
                        "event_id": eids[i:j][mask],
                        "user_id": users[i:j][mask],
                        "value": vals[i:j][mask],
                        "p95": p95,
                    }
                )
            )
    if not out:
        return pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "value": pd.Series([], dtype="float64"),
                "p95": pd.Series([], dtype="float64"),
            }
        )
    return pd.concat(out, ignore_index=True)


def events_outlier(sf_dir: str, num_buckets: int = 64):
    """(event_id, user_id, value, p95) for events above the user's exact
    p95 — one user-hash exchange, one sorted pass per bucket."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "value"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "user_bucket", pa.array((uid % num_buckets).astype(np.int32))
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(_outlier_bucket, batch_format="pandas")
    )

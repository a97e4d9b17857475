"""Ray stage: assemble conversations and render them to RDF/XML documents.

``groupby("conv_id").map_groups(assemble_and_render)``: groups are single
conversations (small — tens of turns), so the in-group sort by (ts, event_id)
is cheap and the stable (conv_id, turn_idx) ordering invariant never needs a
global sort (SURVEY.md §2.11).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..transcripts.render import render_conversation

DOC_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("doc", pa.large_string()), ("n_turns", pa.int32())]
)


def assemble_and_render(group: pd.DataFrame) -> pd.DataFrame:
    """One conversation in (any order) → one rendered RDF/XML document row."""
    g = group.sort_values(["ts", "event_id"], kind="mergesort")
    conv_id = g["conv_id"].iloc[0]
    tools = g["tool"].astype(object).where(g["tool"].notna(), None)
    turns = list(zip(g["role"], g["text"], tools, g["ts_us"]))
    doc = render_conversation(conv_id, turns)
    return pd.DataFrame({"conv_id": [conv_id], "doc": [doc], "n_turns": [len(turns)]})


def assemble_and_render_bucket_by_turn_idx(group: pd.DataFrame) -> pd.DataFrame:
    """Bucket assembly for transcript tables that carry an explicit
    ``turn_idx`` (the BASELINE.json input_hint shape): stable
    (conv_id, turn_idx) ordering instead of the derived (ts, event_id)."""
    g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    # explicit µs conversion: a bare astype('int64') on a datetime64[ns]
    # series would yield nanoseconds (1000× ct:tsMicros) — pin the unit
    ts_us = (
        g["ts"].astype("datetime64[us]").astype("int64")
        if "ts_us" not in g.columns
        else g["ts_us"].astype("int64")
    ).to_numpy()
    return _render_sorted(
        g["conv_id"].to_numpy(),
        g["role"].to_numpy(),
        g["text"].to_numpy(),
        g["tool"].astype(object).where(g["tool"].notna(), None).to_numpy(),
        ts_us,
    )


def _render_sorted(conv_ids, roles, texts, tools, ts_us) -> pd.DataFrame:
    out_ids, out_docs, out_n = [], [], []
    n = len(conv_ids)
    start = 0
    for i in range(1, n + 1):
        if i == n or conv_ids[i] != conv_ids[start]:
            turns = list(zip(roles[start:i], texts[start:i], tools[start:i], ts_us[start:i]))
            out_ids.append(conv_ids[start])
            out_docs.append(render_conversation(conv_ids[start], turns))
            out_n.append(i - start)
            start = i
    return pd.DataFrame({"conv_id": out_ids, "doc": out_docs, "n_turns": out_n})


def assemble_and_render_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Many conversations (one conv_bucket) → one doc row per conversation.

    Grouping by a conversation *bucket* instead of conv_id keeps the number
    of ``map_groups`` invocations at O(num_buckets), not O(num_convs) — Ray's
    per-group dispatch costs ~10× the actual render work for small groups.
    One vectorized sort co-orders every conversation in the bucket; the
    Python loop below only walks group boundaries.
    """
    g = group.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
    return _render_sorted(
        g["conv_id"].to_numpy(),
        g["role"].to_numpy(),
        g["text"].to_numpy(),
        g["tool"].astype(object).where(g["tool"].notna(), None).to_numpy(),
        g["ts_us"].to_numpy(),
    )

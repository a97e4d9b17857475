"""Deterministic transcript table derivation from the `events` table.

The driver testdata has no transcripts table, so the pipeline derives one —
deterministically and with SQL-expressible logic — from
``events(event_id, ts, user_id, event_type, value, props)``:

    conv_id   = 'c' || user_id
    turn_idx  = row_number() over (partition by user_id order by ts, event_id) - 1
    raw_role  = CASE event_type ... END        (noisy aliases; linker cleans)
    text      = event_type || ' <' || props || '> &co'   (XML-escape stress)
    tool      = event_type when event_type in ('purchase','error')
    ts_us     = epoch microseconds

This matches ``BASELINE.json.input_hint``'s transcript shape
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp) and keeps the per-turn text equality invariant checkable by the
DuckDB oracle. Everything is vectorized pyarrow; turn_idx is assigned in the
per-conversation group stage (render.py) to avoid a global sort.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EVENT_COLUMNS = ["event_id", "ts", "user_id", "event_type", "props"]

_ROLE_CASES = [
    ("signup", "System"),  # noisy casing → linker canonicalizes
    ("view", "user"),
    ("click", "usr"),  # alias → linker canonicalizes
    ("purchase", "AI"),  # alias → linker canonicalizes
]
_DEFAULT_ROLE = "tool"
_TOOL_EVENTS = ("purchase", "error")


def derive_turns_batch(batch: pa.Table) -> pa.Table:
    """events batch → transcript-turn batch (no turn_idx yet; that needs the
    per-conversation order and is assigned in the conversation group)."""
    # rebase sliced string columns first: pc.if_else over a *sliced* string
    # chunk emits arrays with out-of-bounds offsets (pyarrow 16.1 bug; a
    # table-level combine_chunks does NOT copy a single sliced chunk, but
    # concat_arrays does)
    batch = pa.table(
        {
            name: pa.concat_arrays(batch[name].chunks)
            if batch[name].num_chunks > 0
            else batch[name]
            for name in batch.column_names
        }
    )
    etype = batch["event_type"]
    # constants broadcast as scalars — pa.array([x]*n) builds a Python list
    # per batch and showed up in the flagship derive profile
    conv_id = pc.binary_join_element_wise(
        pa.scalar("c"), pc.cast(batch["user_id"], pa.string()), ""
    )
    role = pa.scalar(_DEFAULT_ROLE)
    for ev, r in _ROLE_CASES:
        role = pc.if_else(pc.equal(etype, ev), r, role)
    text = pc.binary_join_element_wise(
        etype, pa.scalar(" <"), batch["props"], pa.scalar("> &co"), ""
    )
    is_tool = pc.is_in(etype, value_set=pa.array(_TOOL_EVENTS))
    tool = pc.if_else(is_tool, etype, pa.scalar(None, pa.string()))
    ts_us = pc.cast(batch["ts"], pa.int64())  # timestamp[us] → epoch micros
    return pa.table(
        {
            "conv_id": pc.cast(conv_id, pa.string()),
            "event_id": batch["event_id"],
            "role": pc.cast(role, pa.string()),
            "text": pc.cast(text, pa.string()),
            "tool": tool,
            "ts": batch["ts"],
            "ts_us": ts_us,
        }
    )

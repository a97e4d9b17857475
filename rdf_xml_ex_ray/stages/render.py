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

"""Seeded synthetic transcript generator — the BASELINE.json input_hint table
shape, exactly: (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string?, ts:timestamp[us]).

Deterministic from (seed, conversation ordinal); Zipf-ish turn counts, hot
role/tool keys and a skewed text-length tail (a few very large turns) per
FIXTURES.md §1. No external data, no wall-clock."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ROLES = ["user", "assistant", "system", "tool", "AI", "usr", "bot"]  # noisy aliases included
TOOLS = ["search", "calculator", "browser", "python"]
_WORDS = (
    "the quick brown fox jumps over a lazy dog while discussing query plans "
    "joins shuffles and spilling <tags> & \"quotes\" 'apostrophes' run deep"
).split(" ")

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def generate_transcripts(n_convs: int = 100, seed: int = 42) -> pa.Table:
    rng = np.random.RandomState(seed)
    conv_id, turn_idx, role, text, tool, ts = [], [], [], [], [], []
    for c in range(n_convs):
        # Zipf-ish turn count, clamped
        n_turns = int(min(80, max(2, rng.zipf(1.5))))
        t0 = EPOCH_US + c * 3_600_000_000
        for i in range(n_turns):
            conv_id.append(f"conv-{c:06d}")
            turn_idx.append(i)
            r = ROLES[int(rng.randint(0, len(ROLES)))]
            role.append(r)
            # skewed text length: mostly short, occasionally very large
            n_words = int(rng.zipf(1.3))
            n_words = min(5000, max(3, n_words))
            words = [_WORDS[int(w)] for w in rng.randint(0, len(_WORDS), n_words)]
            text.append(" ".join(words))
            tool.append(TOOLS[int(rng.randint(0, len(TOOLS)))] if r in ("tool",) else None)
            ts.append(t0 + i * 30_000_000 + int(rng.randint(0, 1_000_000)))
    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )

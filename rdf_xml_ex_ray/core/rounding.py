"""Half-away-from-zero rounding — the DuckDB/SQL convention.

Python's built-in round() and np.round are banker's (half-to-even):
round(0.00625, 4) = 0.0062 while DuckDB round(1/160, 4) = 0.0063. Every
operator whose oracle compares rounded floats must use THIS helper so exact
ties resolve identically on both engines (first hit in the wild: ngram
jaccard 1/160 at sf0.1).
"""

from __future__ import annotations

import math

import numpy as np


def round_half_away(x: float, nd: int) -> float:
    m = 10.0**nd
    return math.copysign(math.floor(abs(x) * m + 0.5), x) / m


def np_round_half_away(a, nd: int):
    a = np.asarray(a, dtype=np.float64)
    m = 10.0**nd
    return np.copysign(np.floor(np.abs(a) * m + 0.5), a) / m

"""Exact lexical-integer kernel for the SPARQL SUM/AVG aggregates.

The SPARQL front-end's SUM/AVG operate on the triple store's *lexical
forms* and are replayed by a DuckDB oracle, so the numeric semantics must
be bit-reproducible on both engines AND order-independent under
distribution. Both constraints rule out floats (parallel summation is
order-dependent) and rule out DuckDB's own ``TRY_CAST(.. AS
DECIMAL(38,9))`` as the definition:

- DuckDB's DECIMAL->DOUBLE cast is not correctly rounded (probed: 491 of
  2000 random 18-digit values differ from strtod by 1 ulp), and
- the decimal *parser's* rounding is internally inconsistent for
  e-notation underflow — probed on DuckDB 1.x: ``'6e-11'`` ->
  0.000000001 but ``'0.0000000006e-1'`` (the same value) -> 0, and
  ``'54763e-93'`` -> 0.000000001 (integer mantissas round by successive
  divide-with-early-break, fraction mantissas by position) — so no sane
  Python kernel can mirror it and no SQL twin should be built on it.
  (tests/test_numeric.py pins one divergent pair as documentation.)

Instead the fragment defines SUM/AVG over INTEGER lexical forms — the
shape of every numeric term the KG emits (xsd:integer-style ``index``,
``tsMicros``) — with non-integer forms treated as unbound (SQL NULL,
skipped by aggregates, exactly like TRY_CAST semantics on a non-number):

    bound      iff  lexical form fullmatches ``[+-]?\\d{1,18}`` (ASCII)
    SUM        exact integer sum, rendered as its decimal string
    AVG        strtod(SUM string) / COUNT  — one correctly-rounded parse
               plus one IEEE division, deterministic on both engines

The SQL twin spells the same thing verbatim::

    SUM(TRY_CAST(CASE WHEN regexp_matches(v, '^[+-]?\\d{1,18}$')
                      THEN v END AS HUGEINT))

(the regex guard means the cast only ever sees plain ASCII integers, so
none of DuckDB's permissive-numeric-cast quirks — whitespace trimming,
underscores, ``'- '`` -> 0, exponent acceptance — can reach it; DuckDB's
regexp engine is RE2 whose ``\\d`` is ASCII-only, matching re.ASCII).
The 18-digit cap keeps every accepted value well inside int64 while the
running sum may grow without bound (Python int / DuckDB HUGEINT).
"""

from __future__ import annotations

import re

__all__ = ["DBL_LEX_SQL_RE", "INT_LEX_SQL_RE", "int_lex", "int_lex_array"]

# Keep this literal in sync with the SQL twins' regexp_matches pattern.
INT_LEX_SQL_RE = r"^[+-]?\d{1,18}$"

# Numeric-comparison domain for FILTER/HAVING: finite decimal forms only.
# Probed divergences this guard removes (pipelines/bgp._filter_mask is the
# consumer): DuckDB's bare TRY_CAST accepts '1_0' (-> 10), ' 3'/'3 '
# (trims), 'nan' (and DuckDB orders NaN = NaN as TRUE where numpy says
# False) — none of which pandas/Arrow parsing mirrors. Inside this domain
# Arrow's fast_float and DuckDB's strtod agree bit-for-bit, including
# overflow to +-inf ('1e400') and underflow to 0 ('1e-400'), both probed.
DBL_LEX_SQL_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"

_INT_RE = re.compile(r"[+-]?\d{1,18}\Z", re.A)


def int_lex(text) -> int | None:
    """The fragment's numeric-term reading of one lexical form: its exact
    integer value, or None (SQL NULL) for any non-integer form."""
    if text is None or not _INT_RE.match(text):
        return None
    return int(text)


def int_lex_array(values) -> list[int | None]:
    """Vectorized-ish batch variant (a tight loop over a Python list —
    called per aggregation bucket, not per row of the exchange)."""
    match = _INT_RE.match
    return [int(v) if v is not None and match(v) else None for v in values]

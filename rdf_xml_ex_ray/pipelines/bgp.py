"""General basic-graph-pattern (BGP) executor over KG triple datasets.

SPARQL's core evaluation unit is the BGP: a set of triple patterns with
shared variables, evaluated as the natural join of per-pattern scans. The
reference ecosystem queries its graphs by pattern (RDF.Graph /
RDF.Description access in rdf-elixir — rdf-xml-ex builds the graphs that
get queried this way; see reference test/rdf_xml_test.exs usage of
Graph.describe/triples); this module is the distributed equivalent:

- each triple pattern compiles to a streaming filtered PROJECTION of the
  (materialized-once) triple dataset — constants become Arrow equality
  filters, variables become named output columns;
- patterns are greedily ordered so the join tree is left-deep and every
  step shares >= 1 variable with the bindings built so far (most-constant
  pattern first — the classic selectivity heuristic); a disconnected BGP
  (cartesian product) is rejected rather than silently exploded;
- each join step is ONE bucketed all-to-all exchange (stages/join.py
  bucketed_equijoin) on the composite key of the shared variables.

No driver-side state anywhere: pattern scans stream, each join's memory
is bounded by its hottest key bucket, and K patterns cost exactly K-1
exchanges. At 100 TB the triple scan is the dominant cost and runs once;
the branches are cheap block-cache filters (same shape as
graph.kg_pattern_join, which is the hand-wired instance of this planner).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .oracle import KG_TRIPLES_SQL

__all__ = ["bgp_execute", "kg_bgp", "KG_BGP_SQL"]

_POSITIONS = ("subj", "pred", "obj_value")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_vars(pattern) -> list[str]:
    return [t[1:] for t in pattern if _is_var(t)]


def _scan(triples_ds, pattern):
    """One triple pattern -> Dataset of its variable bindings.

    Constants are Arrow equality filters (obj constants match ``obj_value``
    — term-kind-agnostic string identity, mirroring the SQL twin's join on
    the value column). A variable repeated within one pattern becomes an
    equality filter between its positions.
    """
    var_cols: dict[str, str] = {}  # var name -> first position bound to it
    eq_pairs: list[tuple[str, str]] = []
    filters: list[tuple[str, str]] = []
    for pos, term in zip(_POSITIONS, pattern):
        if _is_var(term):
            v = term[1:]
            if v in var_cols:
                eq_pairs.append((var_cols[v], pos))
            else:
                var_cols[v] = pos
        else:
            filters.append((pos, term))

    def project(batch: pa.Table) -> pa.Table:
        mask = None
        for pos, const in filters:
            m = pc.equal(batch[pos], const)
            mask = m if mask is None else pc.and_(mask, m)
        for a, b in eq_pairs:
            m = pc.equal(batch[a], batch[b])
            mask = m if mask is None else pc.and_(mask, m)
        t = batch.filter(mask) if mask is not None else batch
        if not var_cols:
            # all-constant pattern: a zero-column Arrow table always reports
            # 0 rows, so keep the match count visible for existence checks
            return pa.table({"__present": pa.repeat(True, t.num_rows)})
        return pa.table({v: t[pos].cast(pa.string()) for v, pos in var_cols.items()})

    return triples_ds.map_batches(project, batch_format="pyarrow")


def _order_patterns(patterns) -> list:
    """Greedy left-deep join order: start at the most-constant pattern,
    then always extend through a shared variable (reject cartesians)."""
    remaining = list(patterns)
    n_const = lambda p: sum(0 if _is_var(t) else 1 for t in p)  # noqa: E731
    first = max(remaining, key=n_const)
    ordered = [first]
    remaining.remove(first)
    bound = set(_pattern_vars(first))
    while remaining:
        candidates = [p for p in remaining if bound & set(_pattern_vars(p))]
        if not candidates:
            raise ValueError(
                "disconnected BGP (cartesian product between pattern groups): "
                f"bound={sorted(bound)} remaining={remaining}"
            )
        nxt = max(candidates, key=n_const)
        ordered.append(nxt)
        remaining.remove(nxt)
        bound |= set(_pattern_vars(nxt))
    return ordered


def _key_expr(table: pa.Table, shared: list[str]):
    if len(shared) == 1:
        return table[shared[0]].cast(pa.string())
    return pc.binary_join_element_wise(
        *[table[v].cast(pa.string()) for v in shared], "\x00"
    )


def bgp_execute(triples_ds, patterns, project: list[str], num_buckets: int | None = None):
    """Evaluate a BGP (list of (s, p, o) patterns, ``?name`` = variable)
    against a triple-row Dataset; returns the binding table projected to
    ``project`` (bag semantics — identical to the SQL twin's inner joins).

    ``num_buckets`` defaults to 2× the input's block count (floor 32):
    Ray's sort-based groupby uses reduce_partitions = map_blocks, so a
    bucket count BELOW the block count leaves reduce partitions empty and
    the exchange dispatch dominates (the repo-wide buckets ≥ blocks rule;
    measured on this operator: 4 joins over 2×96-block scans cost 35.7 s
    vs 6.9 s over 2×24-block scans at sf0.1, identical output)."""
    from ..stages.join import bucketed_equijoin

    if num_buckets is None:
        try:
            num_buckets = max(32, 2 * triples_ds.num_blocks())
        except Exception:  # lazy/unknown plan — keep the stage default
            num_buckets = 32

    # All-constant patterns bind no variables, so they can't participate in
    # the shared-variable join ordering (feeding them in would wrongly
    # reject the rest of the BGP as disconnected). They are existence
    # checks: absent -> zero solutions; present -> the unit solution (the
    # triple store is canonical/set-semantics, so multiplicity is 1).
    const_checks = [p for p in patterns if not _pattern_vars(p)]
    var_patterns = [p for p in patterns if _pattern_vars(p)]
    if not var_patterns:
        raise ValueError("BGP contains only constant patterns; no variables to bind")
    for chk in const_checks:
        if _scan(triples_ds, chk).count() == 0:
            import ray.data as rd

            return rd.from_arrow(
                pa.schema([(v, pa.string()) for v in project]).empty_table()
            )

    ordered = _order_patterns(var_patterns)
    acc = _scan(triples_ds, ordered[0])
    bound = list(dict.fromkeys(_pattern_vars(ordered[0])))

    s = pa.string()
    for pattern in ordered[1:]:
        nxt = _scan(triples_ds, pattern)
        pvars = list(dict.fromkeys(_pattern_vars(pattern)))
        shared = sorted(set(bound) & set(pvars))
        new = [v for v in pvars if v not in bound]

        def add_key(name, keys):
            def f(batch: pa.Table) -> pa.Table:
                return batch.append_column(name, _key_expr(batch, keys))

            return f

        left = acc.map_batches(add_key("__kl", shared), batch_format="pyarrow")
        # the right side carries only NEW vars + its key (shared vars are
        # equal by the join predicate; duplicating them would collide)
        def right_project(batch: pa.Table, _keys=shared, _new=new) -> pa.Table:
            cols = {v: batch[v] for v in _new}
            cols["__kr"] = _key_expr(batch, _keys)
            return pa.table(cols)

        right = nxt.map_batches(right_project, batch_format="pyarrow")
        acc = bucketed_equijoin(
            left,
            right,
            left_key="__kl",
            right_key="__kr",
            left_fields=[(v, s) for v in bound] + [("__kl", s)],
            right_fields=[(v, s) for v in new] + [("__kr", s)],
            num_buckets=num_buckets,
            key_type=s,
        ).map_batches(
            lambda t: t.drop_columns(["__kl", "__kr"]), batch_format="pyarrow"
        )
        bound = bound + new

    missing = [v for v in project if v not in bound]
    if missing:
        raise ValueError(f"projection variables not bound by any pattern: {missing}")
    return acc.map_batches(
        lambda t: pa.table({v: t[v] for v in project}), batch_format="pyarrow"
    )


# ----------------------------------------------------------------- query

_C = "http://example.org/convo#"

_KG_BGP_PATTERNS = [
    ("?conv", _C + "turn", "?turn"),
    ("?turn", _C + "role", "http://example.org/role/assistant"),
    ("?turn", _C + "toolUse", "?use"),
    ("?use", _C + "tool", "?tool"),
    ("?turn", _C + "index", "?idx"),
]


def kg_bgp(sf_dir: str):
    """SPARQL-style BGP over the flagship KG: every assistant turn that
    used a tool, with its conversation, turn index and tool name —
    five patterns, four distributed bucketed joins, bnode hop included.

    The triple input is built at a QUARTER of the cluster's parse-stage
    width: the pattern scans collapse the data ~10× before any join, and
    the join phase is exchange-width-bound, not compute-bound — at sf0.1
    / 32 CPUs the default 96-block build costs 35.7 s of joins vs 6.9 s
    at 24 blocks (same answer). Block width should track the post-filter
    volume, not the parse stage's."""
    from ..stages.broadcast import cluster_cpus
    from .kg import kg_triples_dataset

    triples = kg_triples_dataset(
        sf_dir, parallelism=max(4, cluster_cpus() // 4)
    ).materialize()
    return bgp_execute(triples, _KG_BGP_PATTERNS, ["conv", "turn", "idx", "tool"])


KG_BGP_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS conv, t1.obj_value AS turn, t5.obj_value AS idx,
       t4.obj_value AS tool
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value
          AND t2.pred = '{_C}role'
          AND t2.obj_value = 'http://example.org/role/assistant'
JOIN kt t3 ON t3.subj = t1.obj_value AND t3.pred = '{_C}toolUse'
JOIN kt t4 ON t4.subj = t3.obj_value AND t4.pred = '{_C}tool'
JOIN kt t5 ON t5.subj = t1.obj_value AND t5.pred = '{_C}index'
WHERE t1.pred = '{_C}turn'
"""


# ---------------------------------------------------------------- SPARQL

def sparql_select(triples_ds, query: str, num_buckets: int | None = None):
    """Run a restricted SPARQL SELECT (core/sparql.py fragment) against a
    triple-row Dataset. DISTINCT dedups bindings through one bucketed
    exchange; LIMIT is made deterministic by sorting on the projection
    (SPARQL leaves un-ORDERed LIMIT implementation-defined — a distributed
    engine must pin it or two runs disagree)."""
    import pandas as pd

    from ..core.sparql import parse_select

    q = parse_select(query)
    res = bgp_execute(triples_ds, q["patterns"], q["project"], num_buckets=num_buckets)

    if q["distinct"]:
        from .dedup import _doc_bucket

        cols = q["project"]

        def add_key(batch: pa.Table) -> pa.Table:
            key = _key_expr(batch, cols) if len(cols) > 1 else batch[cols[0]].cast(pa.string())
            return batch.append_column(
                "__dbucket", pa.array(_doc_bucket(key.to_pylist(), 64))
            )

        def drop_dups(group: pd.DataFrame) -> pd.DataFrame:
            return group.drop_duplicates(cols)[cols]

        res = (
            res.map_batches(add_key, batch_format="pyarrow")
            .groupby("__dbucket")
            .map_groups(drop_dups, batch_format="pandas")
        )
    if q["limit"] is not None:
        res = res.sort(q["project"]).limit(q["limit"])
    return res


KG_SPARQL_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT DISTINCT ?conv ?tool
WHERE { ?conv c:turn ?t . ?t c:toolUse ?u . ?u c:tool ?tool }
"""

KG_SPARQL_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT DISTINCT t1.subj AS conv, t3.obj_value AS tool
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}toolUse'
JOIN kt t3 ON t3.subj = t2.obj_value AND t3.pred = '{_C}tool'
WHERE t1.pred = '{_C}turn'
"""


def kg_sparql(sf_dir: str):
    """SPARQL SELECT DISTINCT front-end over the flagship KG: which tools
    does each conversation use (set semantics) — parsed from query text,
    planned and executed by the BGP engine."""
    from ..stages.broadcast import cluster_cpus
    from .kg import kg_triples_dataset

    triples = kg_triples_dataset(
        sf_dir, parallelism=max(4, cluster_cpus() // 4)
    ).materialize()
    return sparql_select(triples, KG_SPARQL_QUERY)

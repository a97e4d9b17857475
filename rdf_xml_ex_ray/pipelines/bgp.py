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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.sparql import NegSet, PathPlus
from .oracle import KG_TRIPLES_SQL

__all__ = ["bgp_execute", "kg_bgp", "KG_BGP_SQL"]

_POSITIONS = ("subj", "pred", "obj_value")


def _is_var(term) -> bool:
    # a non-str predicate term is an alternation set (a constant)
    return isinstance(term, str) and term.startswith("?")


def _pattern_vars(pattern) -> list[str]:
    return [t[1:] for t in pattern if _is_var(t)]


def _scan(triples_ds, pattern, extra_cols=()):
    """One triple/quad pattern -> Dataset of its variable bindings.

    Constants are Arrow equality filters (obj constants match ``obj_value``
    — term-kind-agnostic string identity, mirroring the SQL twin's join on
    the value column). A variable repeated within one pattern becomes an
    equality filter between its positions.

    A 4-term pattern binds/filters the ``graph`` column of a quad-row
    Dataset (SPARQL ``GRAPH``); 3-term patterns against a quad store scan
    the union of all named graphs (the union-default-graph convention).

    ``extra_cols`` is a list of (output name, source column) pairs copied
    from the matched store rows into the binding table — the term-facet
    channel (obj_kind/obj_lang/obj_datatype/subj_kind) for FILTER's
    LANG/DATATYPE/isIRI/isBlank/isLiteral (see bgp_execute's facet plan).
    """
    if len(pattern) not in (3, 4):
        raise ValueError(f"pattern must have 3 (triple) or 4 (quad) terms: {pattern}")
    positions = _POSITIONS if len(pattern) == 3 else _POSITIONS + ("graph",)
    var_cols: dict[str, str] = {}  # var name -> first position bound to it
    eq_pairs: list[tuple[str, str]] = []
    filters: list[tuple[str, str]] = []
    for pos, term in zip(positions, pattern):
        if _is_var(term):
            v = term[1:]
            if v in var_cols:
                eq_pairs.append((var_cols[v], pos))
            else:
                var_cols[v] = pos
        else:
            filters.append((pos, term))

    for _pos, const in filters:
        if isinstance(const, PathPlus):
            # PathPlus is a NamedTuple (tuple subclass) — without this
            # guard it would silently scan as a one-hop alternation set
            raise ValueError(
                f"closure predicate {const} reached a plain scan; closure "
                "patterns need one variable endpoint (see _closure_nodes)"
            )

    def project(batch: pa.Table) -> pa.Table:
        mask = None
        for pos, const in filters:
            if isinstance(const, NegSet):  # negated set: pred NOT IN (...)
                # checked BEFORE the plain-tuple branch — NegSet is a
                # NamedTuple and would otherwise scan as an alternation
                m = pc.invert(
                    pc.is_in(
                        batch[pos],
                        value_set=pa.array(list(const.preds), pa.string()),
                    )
                )
            elif isinstance(const, tuple):  # path alternation: pred IN set
                m = pc.is_in(
                    batch[pos], value_set=pa.array(list(const), pa.string())
                )
            else:
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
        cols = {v: t[pos].cast(pa.string()) for v, pos in var_cols.items()}
        for out_name, src_col in extra_cols:
            cols[out_name] = t[src_col].cast(pa.string())
        return pa.table(cols)

    return triples_ds.map_batches(project, batch_format="pyarrow")


def _order_patterns(patterns) -> list:
    """Greedy left-deep join order: start at the most-constant pattern,
    then always extend through a shared variable (reject cartesians)."""
    remaining = list(patterns)
    # a NegSet predicate is constant but UNselective (it matches most of
    # the store) — don't let it win the most-constant-first heuristic
    n_const = lambda p: sum(  # noqa: E731
        0 if (_is_var(t) or isinstance(t, NegSet)) else 1 for t in p
    )
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


def _join_onto(acc, bound: list[str], rhs, pvars: list[str], num_buckets: int, how: str):
    """One bucketed exchange joining the binding table ``acc`` (columns =
    ``bound``) with ``rhs`` (columns = ``pvars``) on their shared
    variables; returns (joined, bound + new vars). ``how`` 'left' keeps
    unmatched acc rows with null new-var columns (OPTIONAL); 'anti' keeps
    exactly the acc rows with NO match (MINUS / NOT EXISTS) and 'semi'
    exactly those WITH one (FILTER EXISTS) — neither binds new vars."""
    from ..stages.join import bucketed_equijoin

    s = pa.string()
    shared = sorted(set(bound) & set(pvars))
    new = [] if how in ("anti", "semi") else [v for v in pvars if v not in bound]

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("__kl", _key_expr(batch, shared))

    # the right side carries only NEW vars + its key (shared vars are
    # equal by the join predicate; duplicating them would collide) — for
    # an anti join the key alone decides, so only it ships
    def right_project(batch: pa.Table) -> pa.Table:
        cols = {v: batch[v] for v in new}
        cols["__kr"] = _key_expr(batch, shared)
        return pa.table(cols)

    left = acc.map_batches(add_key, batch_format="pyarrow")
    right = rhs.map_batches(right_project, batch_format="pyarrow")
    joined = bucketed_equijoin(
        left,
        right,
        left_key="__kl",
        right_key="__kr",
        left_fields=[(v, s) for v in bound] + [("__kl", s)],
        right_fields=[(v, s) for v in new] + [("__kr", s)],
        num_buckets=num_buckets,
        key_type=s,
        how=how,
    ).map_batches(
        lambda t: t.drop_columns(
            ["__kl"] if how in ("anti", "semi") else ["__kl", "__kr"]
        ),
        batch_format="pyarrow",
    )
    return joined, bound + new


def _project_bound(acc, bound: list[str], needed):
    """Drop binding columns no consumer will read again (projection
    pushdown): narrower rows through every later exchange. No-op when
    nothing is droppable."""
    pruned = [v for v in bound if v in needed]
    if len(pruned) == len(bound):
        return acc, bound
    cols = tuple(pruned)
    return (
        acc.map_batches(
            lambda t, c=cols: pa.table({v: t[v] for v in c}),
            batch_format="pyarrow",
        ),
        pruned,
    )


def _join_group(triples_ds, patterns, num_buckets: int, keep=None, facet_map=None):
    """Inner-join a connected pattern group left-deep; returns (acc, bound).

    ``keep`` (a set of variable names, or None to disable) enables
    projection pushdown: before each join — and once after the last —
    the accumulator drops every variable that neither a remaining
    pattern nor any downstream consumer (projection, FILTER, OPTIONAL /
    MINUS / closure join keys) will read. Property-path fresh variables
    (?__pN) are the canonical win: each lives for exactly one hop.

    ``facet_map`` maps a pattern (by tuple value) to the extra
    (facet column, store column) pairs its scan must carry into the
    binding table (bgp_execute attaches each facet to exactly ONE
    pattern, so tuple-keyed lookup is unambiguous)."""
    fmap = facet_map or {}

    def scan_of(p):
        extra = fmap.get(p, ())
        return _scan(triples_ds, p, extra), (
            list(dict.fromkeys(_pattern_vars(p))) + [c for c, _s in extra]
        )

    ordered = _order_patterns(patterns)
    acc, bound = scan_of(ordered[0])
    for i, pattern in enumerate(ordered[1:], start=1):
        if keep is not None:
            future = {v for p in ordered[i:] for v in _pattern_vars(p)}
            future.update(c for p in ordered[i:] for c, _s in fmap.get(p, ()))
            acc, bound = _project_bound(acc, bound, keep | future)
        rhs, pvars = scan_of(pattern)
        acc, bound = _join_onto(acc, bound, rhs, pvars, num_buckets, "inner")
    if keep is not None:
        acc, bound = _project_bound(acc, bound, keep)
    return acc, bound


def _union_groups(triples_ds, unions, num_buckets: int):
    """SPARQL UNION: evaluate each branch as its own inner BGP, pad each
    result with null string columns for the variables it doesn't bind, and
    concatenate (bag semantics = SQL UNION ALL). A branch whose all-constant
    existence check fails contributes zero rows. Returns (acc, bound) with
    bound = first-appearance order of every variable across branches."""
    import ray.data as rd

    cols = list(
        dict.fromkeys(v for g in unions for p in g for v in _pattern_vars(p))
    )

    def _pad(branch_vars: tuple):
        def pad(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    v: batch[v].cast(pa.string())
                    if v in branch_vars
                    else pa.nulls(n, pa.string())
                    for v in cols
                }
            )

        return pad

    parts = []
    for g in unions:
        const_checks = [p for p in g if not _pattern_vars(p)]
        var_patterns = [p for p in g if _pattern_vars(p)]
        if not var_patterns:
            raise ValueError(f"UNION branch contains only constant patterns: {g}")
        if any(_scan(triples_ds, chk).count() == 0 for chk in const_checks):
            continue  # failed existence check: branch contributes no rows
        acc_g, bound_g = _join_group(triples_ds, var_patterns, num_buckets)
        parts.append(acc_g.map_batches(_pad(tuple(bound_g)), batch_format="pyarrow"))
    if not parts:
        empty = pa.schema([(v, pa.string()) for v in cols]).empty_table()
        return rd.from_arrow(empty), cols
    acc = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    return acc, cols


# ----------------------------------------------------- term-facet channel
#
# FILTER's LANG(?v) / DATATYPE(?v) / isIRI / isBlank / isLiteral read term
# METADATA the string-only binding table doesn't carry. The plan: each
# facet-bearing variable's first REQUIRED pattern binding (object position
# for kind/lang/datatype, subject position for kind) copies the store's
# facet column(s) into the binding table as reserved ``__f_{facet}__{var}``
# columns; they thread through the joins like ordinary variables and the
# projection drops them. SQL twins read obj_kind/obj_lang/obj_datatype off
# the same matched row. Facets over UNION / OPTIONAL-only / closure / BIND
# bindings are out of fragment (no single required row to read them from).

_FACET_NAMES = ("kind", "lang", "dt")

_FACET_SRC = {"kind": "obj_kind", "lang": "obj_lang", "dt": "obj_datatype"}


def _facet_col(var: str, facet: str) -> str:
    return f"__f_{facet}__{var}"


def _binding_site(var: str, patterns):
    """The pattern (and position) whose scan carries ?var's facets:
    the first required pattern binding it in OBJECT position, else the
    first binding it in SUBJECT position (kind only). Deterministic in
    the query's pattern order, independent of the join order."""
    for want in ("obj_value", "subj"):
        for p in patterns:
            positions = _POSITIONS if len(p) == 3 else _POSITIONS + ("graph",)
            for posname, term in zip(positions, p):
                if posname == want and _is_var(term) and term[1:] == var:
                    return p, want
    return None, None


def _facet_reqs(expr, out: dict):
    """Collect {var: set of facets} a FILTER AST needs."""
    k = expr[0]
    if k in ("or", "and"):
        for sub in expr[1]:
            _facet_reqs(sub, out)
    elif k == "not":
        _facet_reqs(expr[1], out)
    elif k in ("kindis",):
        out.setdefault(expr[1], set()).add("kind")
    elif k == "not_kindis":
        _facet_reqs(expr[1], out)
    elif k == "facet_cmp":
        _fk, var = expr[2]
        need = out.setdefault(var, set())
        need.add("kind")  # LANG/DATATYPE error on non-literals -> kind gate
        need.add("lang")
        if _fk == "dt":
            need.add("dt")
    elif k == "langmatches":
        out.setdefault(expr[1], set()).update({"kind", "lang"})
    elif k == "not_langmatches":
        _facet_reqs(expr[1], out)


def _bind_facet_reqs(expr, out: dict):
    """Collect {var: set of facets} a BIND value expression needs — the
    ("sfacet", lang|dt, var) accessor reads kind+lang (+dt) columns."""
    head = expr[0]
    if head == "sfacet":
        need = out.setdefault(expr[2], set())
        need.update({"kind", "lang"})
        if expr[1] == "dt":
            need.add("dt")
    elif head == "bop":
        _bind_facet_reqs(expr[2], out)
        _bind_facet_reqs(expr[3], out)
    elif head in ("blen", "babs"):
        _bind_facet_reqs(expr[1], out)
    elif head == "scoal":
        for a in expr[1]:
            _bind_facet_reqs(a, out)
    elif head == "sif":  # the condition can't carry facets (parse-rejected)
        _bind_facet_reqs(expr[2], out)
        _bind_facet_reqs(expr[3], out)
    elif head == "sfn":
        if expr[1] == "CONCAT":
            for a in expr[2]:
                _bind_facet_reqs(a, out)
        else:
            _bind_facet_reqs(expr[2], out)


def _filter_slen_facet_reqs(e, out: dict):
    """Walk a FILTER AST for ("slen", str-expr) comparison operands and
    collect the facet needs of any nested accessors."""
    if e[0] in ("or", "and"):
        for sub in e[1]:
            _filter_slen_facet_reqs(sub, out)
    elif e[0] == "not":
        _filter_slen_facet_reqs(e[1], out)
    elif e[0] in ("cmp", "ncmp"):
        for o in (e[2], e[3]):
            if o[0] == "slen":
                _bind_facet_reqs(("blen", o[1]), out)


_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


# ------------------------------------------------------ FILTER evaluation
#
# Two-valued evaluation with null -> False, which coincides with SQL's
# three-valued WHERE semantics for every construct the parser admits:
# a NULL comparison is never satisfied, AND/OR propagate identically when
# the only sink is "keep row iff true", and '!' is restricted to BOUND
# (2-valued) at parse time. Numeric comparisons follow TRY_CAST-to-double
# semantics: an unparseable lexical form fails the comparison.

_CMP_NUM = {
    "=": np.equal, "!=": np.not_equal, "<": np.less,
    "<=": np.less_equal, ">": np.greater, ">=": np.greater_equal,
}


def _sfn_mask(expr, tbl: pa.Table) -> np.ndarray:
    """String-predicate FILTER functions: REGEX / STRSTARTS / STRENDS /
    CONTAINS over one variable column — vectorized Arrow kernels, RE2
    regex syntax (DuckDB's regexp_matches is RE2 too), null -> False."""
    _k, fn, var, arg, ci = expr
    arr = tbl[var].combine_chunks().cast(pa.string())
    if fn == "REGEX":
        m = pc.match_substring_regex(arr, arg, ignore_case=ci)
    elif fn == "STRSTARTS":
        m = pc.starts_with(arr, arg)
    elif fn == "STRENDS":
        m = pc.ends_with(arr, arg)
    else:  # CONTAINS
        m = pc.match_substring(arr, arg)
    return pc.fill_null(m, False).to_numpy(zero_copy_only=False)


def _filter_mask(expr, tbl: pa.Table) -> np.ndarray:
    kind = expr[0]
    if kind == "or":
        return np.logical_or.reduce([_filter_mask(e, tbl) for e in expr[1]])
    if kind == "and":
        return np.logical_and.reduce([_filter_mask(e, tbl) for e in expr[1]])
    if kind == "not":
        return ~_filter_mask(expr[1], tbl)
    if kind == "bound":
        return ~np.asarray(tbl[expr[1]].combine_chunks().is_null())
    if kind == "sfn":
        return _sfn_mask(expr, tbl)
    if kind == "not_sfn":
        # !fn(?v): not-null AND NOT fn — SQL `v IS NOT NULL AND NOT fn(v)`
        inner = expr[1]
        valid = ~np.asarray(tbl[inner[2]].combine_chunks().is_null())
        return valid & ~_sfn_mask(inner, tbl)
    if kind == "kindis":  # isIRI/isBlank/isLiteral: kind facet equality
        m = pc.equal(tbl[_facet_col(expr[1], "kind")].combine_chunks(), expr[2])
        return pc.fill_null(m, False).to_numpy(zero_copy_only=False)
    if kind == "not_kindis":  # bound AND kind-differs
        inner = expr[1]
        col = tbl[_facet_col(inner[1], "kind")].combine_chunks()
        valid = ~np.asarray(col.is_null())
        return valid & ~_filter_mask(inner, tbl)
    if kind in ("langmatches", "not_langmatches"):
        # RFC 4647 basic filtering on the lang facet: case-insensitive
        # exact tag or range+"-" subtag prefix; "*" = any non-empty tag.
        # Plain literals (LANG = "") match nothing; non-literals error ->
        # row dropped on BOTH branches (the not_ flavor is literal AND
        # mismatch). Twin spelling: kind='literal' AND lang IS NOT NULL
        # AND (lower(lang) = lower(r) OR starts_with(lower(lang),
        # lower(r) || '-')) — DuckDB lower() agrees with str.lower() on
        # BCP47 tags (ASCII).
        neg = kind == "not_langmatches"
        inner = expr[1] if neg else expr
        var, rng = inner[1], inner[2]
        kindc = _str_operand(tbl, _facet_col(var, "kind"))
        langc = _str_operand(tbl, _facet_col(var, "lang"))
        is_lit = pc.fill_null(pc.equal(kindc, "literal"), False).to_numpy(
            zero_copy_only=False
        )
        has = pc.fill_null(pc.not_equal(langc, ""), False).to_numpy(
            zero_copy_only=False
        )
        if rng == "*":
            m = has
        else:
            r = rng.lower()
            low = pc.utf8_lower(langc)
            hit = pc.or_(pc.equal(low, r), pc.starts_with(low, r + "-"))
            m = has & pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
        return (is_lit & ~m) if neg else (is_lit & m)
    if kind == "facet_cmp":  # LANG(?v)/DATATYPE(?v) =/!= "const"
        op, (facet, var), (_s, const) = expr[1], expr[2], expr[3]
        kindv = tbl[_facet_col(var, "kind")].to_pandas().to_numpy(dtype=object)
        langv = tbl[_facet_col(var, "lang")].to_pandas().to_numpy(dtype=object)
        is_lit = kindv == "literal"  # null kind -> object mismatch -> False
        has_lang = np.array([isinstance(x, str) for x in langv], dtype=bool)
        if facet == "lang":
            # SPARQL LANG: "" for plain literals, the tag otherwise
            eff = np.where(has_lang, langv, "")
        else:
            dtv = tbl[_facet_col(var, "dt")].to_pandas().to_numpy(dtype=object)
            has_dt = np.array([isinstance(x, str) for x in dtv], dtype=bool)
            # SPARQL DATATYPE: the tag'd default is rdf:langString, the
            # plain default xsd:string (the store never carries both)
            eff = np.where(
                has_dt, dtv, np.where(has_lang, _RDF_LANGSTRING, _XSD_STRING)
            )
        m = np.equal(eff, const) if op == "=" else np.not_equal(eff, const)
        # non-literals ERROR in SPARQL -> row dropped on both engines
        return np.asarray(m, dtype=bool) & is_lit
    if kind == "not_in":  # ?v NOT IN (...): not-null AND not-member
        arr = tbl[expr[1]].combine_chunks().cast(pa.string())
        valid = ~np.asarray(arr.is_null())
        m = pc.fill_null(
            pc.is_in(arr, value_set=pa.array(expr[2], pa.string())), False
        ).to_numpy(zero_copy_only=False)
        return valid & ~m
    if kind == "in":  # VALUES ?v { ... } / ?v IN (...): null -> False
        arr = tbl[expr[1]].combine_chunks().cast(pa.string())
        m = pc.fill_null(pc.is_in(arr, value_set=pa.array(expr[2], pa.string())), False)
        return m.to_numpy(zero_copy_only=False)
    if kind == "in_rows":  # VALUES (?a ?b) { (..) .. }: row membership
        cols = [
            tbl[v].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
            for v in expr[1]
        ]
        m = np.zeros(tbl.num_rows, dtype=bool)
        for row in expr[2]:  # inline data: a handful of rows, vectorized per row
            rm = np.ones(tbl.num_rows, dtype=bool)
            for c, const in zip(cols, row):
                if const is None:  # UNDEF: wildcard position
                    continue
                rm &= c == const  # null -> object != str -> False
            m |= rm
        return m
    op, lhs, rhs = expr[1], expr[2], expr[3]
    # ("ncmp", ...) = var-vs-var ordering: numeric on BOTH sides by
    # fragment convention (finite-decimal guarded reads)
    numeric = (
        kind == "ncmp"
        or lhs[0] in ("num", "slen")
        or rhs[0] in ("num", "slen")
    )
    valid = np.ones(tbl.num_rows, dtype=bool)

    def operand(o):
        nonlocal valid
        if o[0] == "slen":
            # STRLEN(str-expr): an int64 array (or scalar for constants);
            # a null string expression fails the comparison like any
            # numeric read — twins spell length(...)
            val = _bind_eval(("blen", o[1]), tbl)
            if isinstance(val, pa.Scalar):
                return float(val.as_py())
            v = val.cast(pa.float64()).to_numpy(zero_copy_only=False)
            valid &= ~np.isnan(v)
            return v
        if o[0] == "var":
            col = tbl[o[1]]
            if numeric:
                # numeric read = the fragment's finite-decimal domain
                # (core/numeric.DBL_LEX_SQL_RE) parsed by Arrow's strtod-
                # compatible fast_float — bit-identical to the twins'
                # guarded TRY_CAST (_dbl_cast_sql). A bare pandas
                # to_numeric / DuckDB TRY_CAST pair diverges on '1_0',
                # padded whitespace and NaN ordering (probed; see
                # core/numeric.py). Aggregate outputs (HAVING) arrive as
                # typed int64/float64 columns and skip the lexical read.
                from ..core.numeric import DBL_LEX_SQL_RE

                if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                    v = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
                else:
                    arr = (
                        pa.concat_arrays([c.cast(pa.string()) for c in col.chunks])
                        if col.num_chunks > 0
                        else pa.array([], pa.string())
                    )
                    ok = pc.match_substring_regex(arr, DBL_LEX_SQL_RE)
                    clean = pc.if_else(ok, arr, pa.scalar(None, pa.string()))
                    v = pc.cast(clean, pa.float64()).to_numpy(zero_copy_only=False)
                valid &= ~np.isnan(v)
                return v
            s = col.to_pandas()
            valid &= s.notna().to_numpy()
            return s.to_numpy(dtype=object)
        return o[1]

    a, b = operand(lhs), operand(rhs)
    if numeric:
        with np.errstate(invalid="ignore"):
            m = _CMP_NUM[op](a, b)
    else:
        m = np.equal(a, b) if op == "=" else np.not_equal(a, b)
    return np.asarray(m, dtype=bool) & valid


# Safety cap on closure BFS rounds — the anti-join guarantees monotone
# progress (each round emits only never-seen nodes), so this only trips
# on a bug, not on cycles.
MAX_CLOSURE_HOPS = 1024

# Reached-set size up to which the BFS runs in the broadcast regime:
# frontier membership as a map-side pc.is_in filter over the edge scan
# (zero exchanges per hop). Beyond it the loop migrates, mid-flight, to
# the fully distributed regime (bucketed join + DISTINCT + anti-join per
# hop). Same dual-path convention as kg_reachability / dedup_minhash;
# equivalence at cap=0 is pinned in tests/test_sparql.py.
CLOSURE_BROADCAST_NODE_CAP = 500_000


def _closure_nodes(triples_ds, pattern, num_buckets: int,
                   broadcast_cap: int = CLOSURE_BROADCAST_NODE_CAP):
    """Seed-anchored transitive closure for a ``p+`` / ``p*`` pattern:
    all nodes reachable from the constant endpoint via >= 1 hop over the
    p-edge scan (the seed itself appears only if it lies on a cycle —
    SPARQL OneOrMorePath semantics). For ``p*`` (``pred.zero``) the seed
    is in the result from the start (the zero-length path matches any
    term, whether or not it appears in the graph) — it simply seeds the
    ``reached`` set, so both regimes inherit the semantics unchanged.
    Returns (Dataset[{var}], var).

    Shape: the edge scan materializes once (pruned to the closure
    predicate — tiny next to the store). While the reached set fits
    ``broadcast_cap`` each BFS round is ONE map-side filter over the
    edge blocks (frontier set shipped by ray.put; no exchange at all);
    past the cap the loop migrates to the distributed regime — per round
    one bucketed equijoin (frontier x edges) + DISTINCT + anti-join vs
    the seen set, no driver-side node state. Rounds are bounded by graph
    diameter either way. A variable-variable closure (the full quadratic
    relation) is rejected as out of fragment."""
    import ray.data as rd

    from ..stages.broadcast import put_broadcast, resolve_broadcast

    s, pred, o = pattern
    s_var, o_var = _is_var(s), _is_var(o)
    if s_var and o_var:
        raise ValueError(
            f"closure pattern {pattern} needs one constant endpoint; the "
            "full ?x p+ ?y relation is out of fragment (see kg_reachability)"
        )
    if not s_var and not o_var:
        raise ValueError(
            f"closure pattern {pattern} with two constants is out of "
            "fragment; bind one side to a variable and FILTER instead"
        )
    forward = o_var
    seed = s if forward else o
    var = (o if forward else s)[1:]
    edges = _scan(triples_ds, ("?__cs", pred.pred, "?__co")).materialize()
    src, dst = ("__cs", "__co") if forward else ("__co", "__cs")

    # p? (and any future bounded form) stops after max_hops rounds with
    # no convergence requirement; 0 = unbounded transitive closure
    hop_limit = pred.max_hops or MAX_CLOSURE_HOPS
    bounded = pred.max_hops > 0

    # ---- broadcast regime: reached/frontier live on the driver (small),
    # each hop is a map-side is_in filter — 0 exchanges
    frontier_set: set = {seed}
    reached: set = {seed} if pred.zero else set()
    hops_done = 0
    overflow = False
    while hops_done < hop_limit and frontier_set and not overflow:
        if len(reached) + len(frontier_set) > broadcast_cap:
            overflow = True  # migrate BEFORE the hop (cap=0 => never broadcast)
            break
        fr_ref = put_broadcast(pa.array(sorted(frontier_set), pa.string()))

        def hop_filter(batch: pa.Table) -> pa.Table:
            fr = resolve_broadcast(fr_ref)
            m = pc.is_in(batch[src], value_set=fr)
            return pa.table({"n": batch.filter(m)[dst].cast(pa.string())})

        nxt: set = set()
        for bt in edges.map_batches(
            hop_filter, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            nxt.update(bt["n"].to_pylist())
        # invariant: reached = result so far; frontier ⊆ reached after
        # hop 1. The hop-0 frontier is {seed}, which enters the result
        # only if some edge leads back to it (>= 1-hop semantics).
        new = nxt - reached
        reached |= new
        frontier_set = new
        hops_done += 1
        if len(reached) > broadcast_cap:
            overflow = True
    if not overflow:
        if not bounded and hops_done >= hop_limit and frontier_set:
            raise RuntimeError(
                f"closure did not converge in {MAX_CLOSURE_HOPS} hops"
            )
        if not reached:
            return (
                rd.from_arrow(pa.schema([(var, pa.string())]).empty_table()),
                var,
            )
        return (
            rd.from_arrow(
                pa.table({var: pa.array(sorted(reached), pa.string())})
            ),
            var,
        )

    # ---- distributed regime (migrated mid-flight): continue from the
    # current reached/frontier sets with dataset-only state
    def as_step(batch: pa.Table) -> pa.Table:
        return pa.table(
            {var: batch[src].cast(pa.string()), "__nxt": batch[dst].cast(pa.string())}
        )

    steps = edges.map_batches(as_step, batch_format="pyarrow")
    parts: list = [
        rd.from_arrow(pa.table({var: pa.array(sorted(reached), pa.string())}))
    ]
    frontier = rd.from_arrow(
        pa.table({var: pa.array(sorted(frontier_set), pa.string())})
    )
    for _ in range(hops_done, hop_limit):
        hop, _b = _join_onto(frontier, [var], steps, [var, "__nxt"], num_buckets, "inner")
        nxt = _distinct(
            hop.map_batches(
                lambda t: pa.table({var: t["__nxt"].cast(pa.string())}),
                batch_format="pyarrow",
            ),
            [var],
        )
        seen = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        nxt, _b = _join_onto(nxt, [var], seen, [var], num_buckets, "anti")
        nxt = nxt.materialize()
        if nxt.count() == 0:
            break
        parts.append(nxt)
        frontier = nxt
    else:
        if not bounded:
            raise RuntimeError(
                f"closure did not converge in {MAX_CLOSURE_HOPS} hops"
            )
    return (parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])), var


# ------------------------------------------------------- BIND evaluation
#
# Integer value expressions (core/sparql "bnum"/"bvar"/"bop" AST) over the
# binding table: operands read lexical forms under the fragment's
# integer-lexical rule (core/numeric — non-integer form -> NULL, which
# propagates through the arithmetic), int64 *checked* Arrow kernels so
# overflow raises on BOTH engines (DuckDB BIGINT arithmetic also raises),
# and the result re-enters the binding table as its decimal string (the
# same rendering as SUM; DuckDB twin: CAST(expr AS VARCHAR)).

_BIND_OPS = {"+": "add_checked", "-": "subtract_checked", "*": "multiply_checked"}


def _bind_vars(expr, out: set):
    """Collect the variable names a BIND value expression references."""
    head = expr[0]
    if head in ("bvar", "svar"):
        out.add(expr[1])
    elif head == "bop":
        _bind_vars(expr[2], out)
        _bind_vars(expr[3], out)
    elif head in ("blen", "babs"):
        _bind_vars(expr[1], out)
    elif head == "sfacet":
        out.add(expr[2])
    elif head == "scoal":
        for a in expr[1]:
            _bind_vars(a, out)
    elif head == "sif":
        _expr_vars(expr[1], out)  # the FILTER-expression condition
        _bind_vars(expr[2], out)
        _bind_vars(expr[3], out)
    elif head == "sfn":
        fn = expr[1]
        if fn == "CONCAT":
            for a in expr[2]:
                _bind_vars(a, out)
        else:  # UCASE / LCASE / SUBSTR / REPLACE — operand is expr[2]
            _bind_vars(expr[2], out)


def _str_operand(tbl: pa.Table, name: str):
    """A binding column as ONE contiguous string array — rebases sliced
    chunks before any compute (pyarrow 16.1 sliced-chunk offset corruption
    in if_else — the repo-wide mitigation; concat_arrays copies)."""
    col = tbl[name]
    if col.num_chunks > 0:
        return pa.concat_arrays([c.cast(pa.string()) for c in col.chunks])
    return pa.array([], pa.string())


def _bind_eval(expr, tbl: pa.Table):
    """Evaluate a BIND AST over ``tbl`` -> int64 Array (numeric flavor),
    string Array (string flavor), or a Scalar for an all-constant
    expression. NULL propagates through every node (unbound operand →
    unbound result — SPARQL error semantics = DuckDB's function/``||``
    convention)."""
    from ..core.numeric import INT_LEX_SQL_RE

    head = expr[0]
    if head == "bnum":
        return pa.scalar(expr[1], pa.int64())
    if head == "sstr":
        return pa.scalar(expr[1], pa.string())
    if head == "svar":
        return _str_operand(tbl, expr[1])
    if head == "bvar":
        arr = _str_operand(tbl, expr[1])
        ok = pc.match_substring_regex(arr, INT_LEX_SQL_RE)
        clean = pc.if_else(ok, arr, pa.scalar(None, pa.string()))
        # Arrow's string->int cast rejects a leading '+'; strip it (the
        # regex guarantees at most one, at position 0)
        clean = pc.replace_substring_regex(clean, r"^\+", "")
        return pc.cast(clean, pa.int64())
    if head == "blen":
        # codepoint count: Arrow utf8_length = DuckDB length()
        return pc.cast(pc.utf8_length(_bind_eval(expr[1], tbl)), pa.int64())
    if head == "babs":
        # |x| under checked int64 (INT64_MIN raises on both engines)
        return pc.abs_checked(_bind_eval(expr[1], tbl))
    if head == "scoal":
        # first non-NULL operand — Arrow coalesce = DuckDB coalesce
        return pc.coalesce(*(_bind_eval(a, tbl) for a in expr[1]))
    if head == "sfacet":
        # LANG/DATATYPE accessor over the variable's scan-carried facet
        # columns: "" / default datatype for literals, NULL (error →
        # unbound) for non-literals — the same semantics as facet_cmp,
        # here producing a VALUE instead of a mask. Twin: CASE WHEN
        # kind='literal' THEN coalesce(lang,'') END (resp. the datatype
        # default chain).
        facet, var = expr[1], expr[2]
        kindv = _str_operand(tbl, _facet_col(var, "kind"))
        langv = _str_operand(tbl, _facet_col(var, "lang"))
        if facet == "lang":
            eff = pc.fill_null(langv, "")
        else:
            dtv = _str_operand(tbl, _facet_col(var, "dt"))
            eff = pc.coalesce(
                dtv,
                pc.if_else(
                    pc.is_valid(langv),
                    pa.scalar(_RDF_LANGSTRING, pa.string()),
                    pa.scalar(_XSD_STRING, pa.string()),
                ),
            )
        is_lit = pc.fill_null(pc.equal(kindv, "literal"), False)
        return pc.if_else(is_lit, eff, pa.scalar(None, pa.string()))
    if head == "sif":
        # the condition is a FILTER expression under FILTER semantics
        # (error/unbound → False → else); DuckDB CASE WHEN cond THEN a
        # ELSE b END agrees (NULL condition takes ELSE)
        mask = pa.array(_filter_mask(expr[1], tbl))
        return pc.if_else(mask, _bind_eval(expr[2], tbl), _bind_eval(expr[3], tbl))
    if head == "sfn":
        fn = expr[1]
        if fn == "UCASE":
            return pc.utf8_upper(_bind_eval(expr[2], tbl))
        if fn == "LCASE":
            return pc.utf8_lower(_bind_eval(expr[2], tbl))
        if fn == "CONCAT":
            vals = [_bind_eval(a, tbl) for a in expr[2]]
            # emit_null (the default) propagates any NULL operand; twins
            # spell DuckDB's equally-propagating ``||`` chain
            return pc.binary_join_element_wise(*vals, "")
        if fn == "SUBSTR":
            _, _, sub, start, length = expr
            stop = None if length is None else start - 1 + length
            return pc.utf8_slice_codeunits(
                _bind_eval(sub, tbl), start - 1, stop
            )
        if fn == "REPLACE":
            _, _, sub, pat, rep = expr
            return pc.replace_substring_regex(
                _bind_eval(sub, tbl), pattern=pat, replacement=rep
            )
        if fn in ("STRBEFORE", "STRAFTER"):
            # split on the FIRST occurrence of the constant separator.
            # Rows without an occurrence are masked to NULL before the
            # split so every surviving list has exactly 2 elements, then
            # restored to "" (NULL inputs stay NULL through if_else's
            # null-condition path). Twin spelling: CASE WHEN s IS NULL
            # THEN NULL WHEN strpos(s, sep) > 0 THEN substr(...) ELSE ''
            # END — DuckDB strpos/substr/length are all codepoint-based,
            # multibyte-probe-verified against Arrow's split.
            _, _, sub, sep = expr
            arr = _bind_eval(sub, tbl)
            if isinstance(arr, pa.Scalar):
                s = arr.as_py()
                if s is None:
                    return pa.scalar(None, pa.string())
                i = s.find(sep)
                out = (
                    "" if i < 0
                    else s[:i] if fn == "STRBEFORE"
                    else s[i + len(sep):]
                )
                return pa.scalar(out, pa.string())
            found = pc.greater(pc.count_substring(arr, sep), 0)
            masked = pc.if_else(found, arr, pa.scalar(None, pa.string()))
            parts = pc.split_pattern(masked, pattern=sep, max_splits=1)
            val = pc.list_element(parts, 0 if fn == "STRBEFORE" else 1)
            return pc.if_else(found, val, pa.scalar("", pa.string()))
        raise ValueError(f"unknown string function {fn!r}")  # unreachable
    lhs = _bind_eval(expr[2], tbl)
    rhs = _bind_eval(expr[3], tbl)
    return getattr(pc, _BIND_OPS[expr[1]])(lhs, rhs)


def _reject_closures(groups, ctx: str):
    for g in groups:
        for p in g:
            if any(isinstance(t, PathPlus) for t in p):
                raise ValueError(f"closure paths are not supported in {ctx}")


def _expr_vars(e, out: set):
    """Collect the variable names a FILTER/HAVING AST references."""
    if e[0] in ("or", "and"):
        for sub in e[1]:
            _expr_vars(sub, out)
    elif e[0] == "not":
        _expr_vars(e[1], out)
    elif e[0] in ("bound", "in", "not_in"):
        out.add(e[1])
    elif e[0] == "sfn":
        out.add(e[2])
    elif e[0] in ("not_sfn", "not_kindis"):
        _expr_vars(e[1], out)
    elif e[0] == "in_rows":
        out.update(e[1])
    elif e[0] == "kindis":
        out.add(e[1])
    elif e[0] == "langmatches":
        out.add(e[1])
    elif e[0] == "not_langmatches":
        _expr_vars(e[1], out)
    elif e[0] == "facet_cmp":
        out.add(e[2][1])
    else:
        for o in (e[2], e[3]):
            if o[0] == "var":
                out.add(o[1])
            elif o[0] == "slen":  # STRLEN(str-expr) comparison operand
                _bind_vars(("blen", o[1]), out)


def _subquery_cols(subq: dict) -> list[str]:
    """Output columns of a parsed subquery dict, in projection order."""
    return subq["project"] + [a for *_x, a in subq["aggregates"]]


def _subquery_nullable(subq: dict) -> set:
    """Subquery output columns that can be NULL: OPTIONAL-only vars,
    union branch-missing vars, BIND targets (a non-integer lexical is
    unbound), and every aggregate alias except COUNT (null on an all-null
    input group). The complement is safe to treat as required-bound."""
    req = {v for p in subq["patterns"] for v in _pattern_vars(p)}
    u_all: set = set()
    if subq["unions"]:
        branch_sets = [
            {v for p in g for v in _pattern_vars(p)} for g in subq["unions"]
        ]
        req |= set.intersection(*branch_sets)
        u_all = set().union(*branch_sets)
    nullable: set = u_all - req
    for g in subq["optionals"]:
        nullable |= {v for p in g for v in _pattern_vars(p)} - req
    nullable |= {bv for bv, _be in subq.get("binds", ())}
    nullable |= {a for f, _v, _d, a in subq["aggregates"] if f != "COUNT"}
    return nullable


def bgp_execute(
    triples_ds,
    patterns,
    project: list[str],
    num_buckets: int | None = None,
    optionals=(),
    filters=(),
    unions=(),
    minuses=(),
    exists=(),
    binds=(),
    subqueries=(),
    extra_facets=None,
):
    """Evaluate a BGP (list of (s, p, o) patterns, ``?name`` = variable)
    against a triple-row Dataset; returns the binding table projected to
    ``project`` (bag semantics — identical to the SQL twin's inner joins).

    ``extra_facets`` ({var: set of "kind"/"lang"/"dt"}) requests facet
    columns beyond what the FILTERs need — the UPDATE engine uses it to
    read term kinds for INSERT-template slots. The planned columns are
    named ``__f_{facet}__{var}`` and may be listed in ``project`` (the
    ``__f_`` prefix is the engine's reserved facet namespace).

    ``optionals`` is a list of pattern groups, each evaluated as its own
    inner BGP and LEFT-joined onto the required bindings on their shared
    variables (SPARQL OPTIONAL; unmatched rows carry nulls). ``filters``
    is a list of core/sparql FILTER ASTs applied to the full binding table
    (all vars visible) before projection.

    ``unions`` (mutually exclusive with ``patterns``/``optionals``) is a
    list of branch pattern groups: each branch is evaluated as its own
    inner BGP, padded with null columns for variables it doesn't bind,
    and the branches are concatenated (SPARQL UNION, bag semantics — the
    SQL twin is UNION ALL). Branch scans all read the one materialized
    triple input; no extra exchange beyond each branch's own joins.

    ``num_buckets`` defaults to 2× the input's block count (floor 32):
    Ray's sort-based groupby uses reduce_partitions = map_blocks, so a
    bucket count BELOW the block count leaves reduce partitions empty and
    the exchange dispatch dominates (the repo-wide buckets ≥ blocks rule;
    measured on this operator: 4 joins over 2×96-block scans cost 35.7 s
    vs 6.9 s over 2×24-block scans at sf0.1, identical output)."""
    if num_buckets is None:
        try:
            num_buckets = max(32, 2 * triples_ds.num_blocks())
        except Exception:  # lazy/unknown plan — keep the stage default
            num_buckets = 32

    _reject_closures(optionals, "OPTIONAL groups")
    _reject_closures(minuses, "MINUS groups")
    _reject_closures([g for _n, g in exists], "FILTER EXISTS groups")
    _reject_closures(unions, "UNION branches")
    if binds:
        # MINUS / EXISTS groups join BEFORE binds evaluate, so a group
        # mentioning a BIND target would silently treat it as a free inner
        # variable instead of correlating on the computed value — reject
        # rather than answer a different question. (An OPTIONAL group
        # colliding with a target trips the freshness check below.)
        bind_targets = {bv for bv, _be in binds}
        for g in list(minuses) + [g for _n, g in exists]:
            overlap = bind_targets & {v for p in g for v in _pattern_vars(p)}
            if overlap:
                raise ValueError(
                    f"MINUS / FILTER EXISTS group references BIND target(s) "
                    f"{sorted(overlap)}; BINDs evaluate after group joins — "
                    "out of fragment"
                )
    # per-branch and every-branch variable sets of the UNION (if any):
    # a var bound by EVERY branch is never null in the union's output;
    # one missing from some branch is nullable (like an OPTIONAL target)
    u_branch_vars = [
        {v for p in g for v in _pattern_vars(p)} for g in unions
    ] if unions else []
    u_common = set.intersection(*u_branch_vars) if u_branch_vars else set()

    if unions and not patterns:
        ureq: dict[str, set] = dict(extra_facets) if extra_facets else {}
        for f in filters:
            _facet_reqs(f, ureq)
            _filter_slen_facet_reqs(f, ureq)
        for _bv, be in binds:
            _bind_facet_reqs(be, ureq)
        if ureq:
            # a UNION var has no single required scan to read facets from
            raise ValueError(
                "facet functions (LANG/DATATYPE/is*) over UNION bindings "
                "are out of fragment"
            )
        acc, bound = _union_groups(triples_ds, unions, num_buckets)
        required_bound = u_common
    else:
        closure_pats = [
            p for p in patterns if len(p) == 3 and isinstance(p[1], PathPlus)
        ]
        regular = [p for p in patterns if not (len(p) == 3 and isinstance(p[1], PathPlus))]
        # All-constant patterns bind no variables, so they can't participate
        # in the shared-variable join ordering (feeding them in would wrongly
        # reject the rest of the BGP as disconnected). They are existence
        # checks: absent -> zero solutions; present -> the unit solution (the
        # triple store is canonical/set-semantics, so multiplicity is 1).
        const_checks = [p for p in regular if not _pattern_vars(p)]
        var_patterns = [p for p in regular if _pattern_vars(p)]
        if not var_patterns and not closure_pats and not unions and not subqueries:
            raise ValueError("BGP contains only constant patterns; no variables to bind")
        for chk in const_checks:
            if _scan(triples_ds, chk).count() == 0:
                import ray.data as rd

                return rd.from_arrow(
                    pa.schema([(v, pa.string()) for v in project]).empty_table()
                )

        # term-facet plan: each LANG/DATATYPE/is* variable's facets are
        # copied into the binding table by exactly ONE required scan
        facet_req: dict[str, set] = (
            {v: set(fs) for v, fs in extra_facets.items()}
            if extra_facets
            else {}
        )
        for f in filters:
            _facet_reqs(f, facet_req)
        for _bv, be in binds:
            _bind_facet_reqs(be, facet_req)
        for f in filters:  # STRLEN operands can nest facet accessors too
            _filter_slen_facet_reqs(f, facet_req)
        facet_map: dict = {}
        for fvar in sorted(facet_req):
            facets = facet_req[fvar]
            site, posname = _binding_site(fvar, var_patterns)
            if site is None:
                raise ValueError(
                    f"facet functions (LANG/DATATYPE/is*) need ?{fvar} bound "
                    "in a required pattern's subject or object position; "
                    "OPTIONAL-only / closure / BIND / graph-position bindings "
                    "are out of fragment"
                )
            if posname == "subj" and facets - {"kind"}:
                raise ValueError(
                    f"LANG/DATATYPE need ?{fvar} bound in OBJECT position; "
                    f"?{fvar} is only subject-bound"
                )
            if var_patterns.count(site) > 1:
                raise ValueError(
                    f"facet attach is ambiguous: pattern {site} appears more "
                    "than once in the BGP"
                )
            src = {"kind": "subj_kind"} if posname == "subj" else _FACET_SRC
            facet_map.setdefault(site, []).extend(
                (_facet_col(fvar, f), src[f]) for f in sorted(facets)
            )
        # projection pushdown: a variable survives a join only if the
        # projection, a FILTER, or an OPTIONAL/MINUS/closure join key
        # still reads it downstream
        keep = set(project)
        for f in filters:
            _expr_vars(f, keep)
        keep.update(c for cols in facet_map.values() for c, _s in cols)
        # union / subquery join keys are bound ∩ their output vars — keep
        # every such var the required side binds so the join columns
        # survive pushdown
        keep.update(v for bv in u_branch_vars for v in bv)
        keep.update(c for sq in subqueries for c in _subquery_cols(sq))
        for g in list(optionals) + list(minuses) + [g for _n, g in exists]:
            keep.update(v for p in g for v in _pattern_vars(p))
        for cp in closure_pats:
            keep.update(_pattern_vars(cp))
        for _bv, be in binds:
            _bind_vars(be, keep)
        if var_patterns:
            acc, bound = _join_group(
                triples_ds, var_patterns, num_buckets, keep, facet_map
            )
        else:
            acc, bound = None, []
        # closure (p+) patterns join their reachable-node sets onto the
        # regular bindings by the closure variable (a semi-join: the node
        # set is distinct by construction). Required, never nullable.
        # Greedy order: always pick a closure whose variable is already
        # bound (their vars can also introduce each other's join key).
        for cp in closure_pats:
            cs_var, co_var = _is_var(cp[0]), _is_var(cp[2])
            if cs_var and co_var:
                raise ValueError(
                    f"closure pattern {cp} needs one constant endpoint; the "
                    "full ?x p+ ?y relation is out of fragment (see "
                    "kg_reachability)"
                )
            if not cs_var and not co_var:
                raise ValueError(
                    f"closure pattern {cp} with two constants is out of "
                    "fragment; bind one side to a variable and FILTER instead"
                )
        pending = list(closure_pats)
        while pending:
            if acc is None:
                cp = pending.pop(0)
            else:
                connected = [
                    p
                    for p in pending
                    if set(_pattern_vars(p)) & set(bound)
                ]
                if not connected:
                    raise ValueError(
                        f"closure patterns {pending} share no variable with "
                        "the other patterns (cartesian)"
                    )
                cp = connected[0]
                pending.remove(cp)
            nodes_ds, cvar = _closure_nodes(triples_ds, cp, num_buckets)
            if acc is None:
                acc, bound = nodes_ds, [cvar]
            else:
                acc, bound = _join_onto(
                    acc, bound, nodes_ds, [cvar], num_buckets, "inner"
                )
        required_bound = set(bound)
        if unions:
            # join the UNION's binding table onto the required bindings:
            # one more bucketed exchange on the shared variables. Every
            # join var must be bound by EVERY branch — a branch-missing
            # join var would put nulls in the key (SPARQL's compatible
            # mapping joins those to anything; an equijoin drops them), so
            # reject loudly. Branch-missing NON-join vars are nullable
            # outputs, excluded from required_bound like OPTIONAL targets.
            u_acc, u_bound = _union_groups(triples_ds, unions, num_buckets)
            if acc is None:
                # the required side was all-constant existence checks (all
                # passed, or we'd have returned empty): the union IS the
                # binding table
                acc, bound = u_acc, u_bound
                required_bound = u_common
                shared = None
            else:
                shared = set(bound) & set(u_bound)
            if shared is not None and not shared:
                raise ValueError(
                    "UNION shares no variable with the required patterns "
                    "(cartesian product); out of fragment"
                )
            if shared:
                gaps = [
                    (i, sorted(shared - bv))
                    for i, bv in enumerate(u_branch_vars)
                    if not shared <= bv
                ]
                if gaps:
                    raise ValueError(
                        f"UNION join variables {sorted(shared)} must be bound "
                        f"by every branch; missing (branch, vars): {gaps} — a "
                        "branch-missing join var needs compatible-mapping "
                        "null semantics, out of fragment"
                    )
                acc, bound = _join_onto(
                    acc, bound, u_acc, u_bound, num_buckets, "inner"
                )
                required_bound |= u_common

    for subq in subqueries:
        # evaluate the subquery as its own select pipeline, cast its
        # columns to string at the boundary (aggregate ints render as
        # decimal strings — twins spell CAST(... AS VARCHAR)), and join it
        # onto the outer bindings with one bucketed exchange. Join vars
        # must be non-nullable on BOTH sides (null keys would need
        # compatible-mapping semantics); nullable subquery outputs join
        # the result as nullable columns, like OPTIONAL targets.
        sub_res, sub_cols = _select_exec(triples_ds, subq, num_buckets)
        cols_t = tuple(sub_cols)

        def to_str(t: pa.Table, c=cols_t) -> pa.Table:
            return pa.table({n: t[n].cast(pa.string()) for n in c})

        sub_res = sub_res.map_batches(to_str, batch_format="pyarrow")
        nullable = _subquery_nullable(subq)
        if acc is None:
            # subquery-only WHERE: the subquery IS the binding table
            acc, bound = sub_res, list(sub_cols)
            required_bound = set(sub_cols) - nullable
            continue
        shared = set(bound) & set(sub_cols)
        if not shared:
            raise ValueError(
                "subquery shares no variable with the other patterns "
                "(cartesian product); out of fragment"
            )
        bad_n = sorted(shared & nullable)
        if bad_n:
            raise ValueError(
                f"subquery join variables {bad_n} may be unbound (OPTIONAL "
                "/ union-branch / BIND / nullable-aggregate outputs); "
                "joining through nullable variables is out of fragment"
            )
        if not shared <= required_bound:
            raise ValueError(
                f"subquery joins through nullable outer variables "
                f"{sorted(shared - required_bound)}; out of fragment"
            )
        acc, bound = _join_onto(
            acc, bound, sub_res, list(sub_cols), num_buckets, "inner"
        )
        required_bound |= set(sub_cols) - nullable

    for group in optionals:
        gvars_all = {v for p in group for v in _pattern_vars(p)}
        shared = gvars_all & set(bound)
        if not shared:
            raise ValueError(
                f"OPTIONAL group shares no variable with the required "
                f"patterns (cartesian): {group}"
            )
        if not shared <= required_bound:
            # a var bound only by a previous OPTIONAL is nullable; joining
            # through it needs SPARQL's compatible-mapping (null-matches-
            # anything) semantics — out of fragment, reject loudly
            raise ValueError(
                f"OPTIONAL group joins through nullable variables "
                f"{sorted(shared - required_bound)} bound by an earlier "
                "OPTIONAL; out of the supported fragment"
            )
        grp_acc, grp_bound = _join_group(triples_ds, group, num_buckets)
        acc, bound = _join_onto(acc, bound, grp_acc, grp_bound, num_buckets, "left")

    for group in minuses:
        # SPARQL MINUS with fully-bound groups = anti-semi-join on the
        # shared variables (SQL NOT EXISTS). A group sharing nothing would
        # remove either everything or nothing (compatible-by-vacuity) —
        # almost certainly a query bug, so reject; likewise joining
        # through a nullable OPTIONAL-bound var needs compatible-mapping
        # semantics, out of fragment (same rule as OPTIONAL chaining).
        gvars_all = {v for p in group for v in _pattern_vars(p)}
        shared = gvars_all & set(bound)
        if not shared:
            raise ValueError(
                f"MINUS group shares no variable with the required "
                f"patterns: {group}"
            )
        if not shared <= required_bound:
            raise ValueError(
                f"MINUS group joins through nullable variables "
                f"{sorted(shared - required_bound)} bound by an OPTIONAL; "
                "out of the supported fragment"
            )
        grp_acc, _grp_bound = _join_group(triples_ds, group, num_buckets)
        acc, bound = _join_onto(
            acc, bound, grp_acc, sorted(shared), num_buckets, "anti"
        )

    for neg, group in exists:
        # FILTER [NOT] EXISTS: with shared required-bound variables this is
        # a semi/anti-join — identical to SPARQL's substitution semantics
        # because every substituted var is non-null. With NO shared
        # variable the group is a global gate: any match keeps (EXISTS) /
        # empties (NOT EXISTS) the whole result — evaluated as one
        # existence probe, never a cross product.
        gvars_all = {v for p in group for v in _pattern_vars(p)}
        shared = gvars_all & set(bound)
        if not shared:
            const_checks = [p for p in group if not _pattern_vars(p)]
            var_pats = [p for p in group if _pattern_vars(p)]
            matched = all(
                len(_scan(triples_ds, c).limit(1).take(1)) > 0
                for c in const_checks
            )
            if matched and var_pats:
                g_acc, _gb = _join_group(triples_ds, var_pats, num_buckets)
                matched = len(g_acc.limit(1).take(1)) > 0
            if matched == neg:
                import ray.data as rd

                return rd.from_arrow(
                    pa.schema([(v, pa.string()) for v in project]).empty_table()
                )
            continue
        if not shared <= required_bound:
            raise ValueError(
                f"FILTER EXISTS group joins through nullable variables "
                f"{sorted(shared - required_bound)} bound by an OPTIONAL; "
                "out of the supported fragment"
            )
        grp_acc, _grp_bound = _join_group(triples_ds, group, num_buckets)
        acc, bound = _join_onto(
            acc, bound, grp_acc, sorted(shared), num_buckets,
            "anti" if neg else "semi",
        )

    if binds:
        # evaluated in declaration order AFTER every join (so a later BIND
        # may read an earlier target); each target extends the binding
        # table as a string column — FILTERs, DISTINCT, ORDER BY and the
        # aggregates downstream treat it exactly like a pattern variable.
        # The freshness check runs against the query's FULL variable
        # surface, not the pushdown-pruned `bound` — projection may have
        # dropped a pattern var the BIND would silently shadow.
        surface_vars = set(bound)
        for grp in [list(patterns)] + list(optionals) + [
            b for b in (unions or ())
        ]:
            surface_vars.update(v for p in grp for v in _pattern_vars(p))
        for sq in subqueries:
            surface_vars.update(_subquery_cols(sq))
        for bv, be in binds:
            refs: set = set()
            _bind_vars(be, refs)
            missing_b = sorted(refs - set(bound))
            if missing_b:
                raise ValueError(
                    f"BIND expression references unbound variables: {missing_b}"
                )
            if bv in surface_vars:
                raise ValueError(
                    f"BIND target ?{bv} is already bound by a pattern or "
                    "earlier BIND"
                )
            surface_vars.add(bv)
            bound = list(bound) + [bv]
        bind_list = list(binds)

        def apply_binds(batch: pa.Table) -> pa.Table:
            for bv, be in bind_list:
                val = _bind_eval(be, batch)
                if isinstance(val, pa.Scalar):
                    col = pa.repeat(pc.cast(val, pa.string()), batch.num_rows)
                else:
                    col = pc.cast(val, pa.string())
                batch = batch.append_column(bv, col)
            return batch

        acc = acc.map_batches(apply_binds, batch_format="pyarrow")

    if filters:
        fvars = set()
        for f in filters:
            _expr_vars(f, fvars)
        missing_f = sorted(fvars - set(bound))
        if missing_f:
            raise ValueError(f"FILTER references unbound variables: {missing_f}")

        def apply_filters(batch: pa.Table) -> pa.Table:
            m = np.ones(batch.num_rows, dtype=bool)
            for f in filters:
                m &= _filter_mask(f, batch)
            return batch.filter(pa.array(m))

        acc = acc.map_batches(apply_filters, batch_format="pyarrow")

    missing = [
        v for v in project if v not in bound and not v.startswith("__f_")
    ]
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
    return bgp_execute(
        _kg_triples_quarter(sf_dir),
        _KG_BGP_PATTERNS,
        ["conv", "turn", "idx", "tool"],
    )


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
    triple-row Dataset: BGP joins + OPTIONAL left-joins + FILTER masks,
    then DISTINCT (one bucketed exchange), ORDER BY (null-safe distributed
    sort via _null_safe_sort — unbound sorts first ASC / last DESC, the
    SPARQL ordering; the remaining projected vars are appended ASC as
    tie-breakers so the row order is TOTAL — a distributed engine must
    pin ties or two runs disagree, and the SQL twin must spell the same
    tie-breakers, with NULLS FIRST/LAST when keys are nullable), and
    LIMIT/OFFSET. An un-ORDERed LIMIT sorts on the full projection (the
    established deterministic-LIMIT idiom). OFFSET materializes only
    offset+limit rows on the driver (the parser requires LIMIT with it)."""
    from ..core.sparql import parse_select

    q = parse_select(query)
    res, _cols = _select_exec(triples_ds, q, num_buckets)
    return res


def _select_exec(triples_ds, q: dict, num_buckets: int | None = None):
    """Execute a parsed SELECT dict (core/sparql) -> (Dataset, output
    columns). Shared by the top-level front-end and the subquery plan."""
    aggregates = q["aggregates"]
    if aggregates:
        # project only what the aggregation consumes: group keys + agg vars
        needed = dict.fromkeys(q["group_by"])
        for _f, v, _d, _a in aggregates:
            if v:
                needed[v] = None
        needed = list(needed)
        if not needed:  # pure COUNT(*): carry one bound column to count rows
            pats = q["patterns"] or [p for g in q["unions"] for p in g]
            if pats:
                needed = [next(v for p in pats for v in _pattern_vars(p))]
            else:  # subquery-only WHERE
                sq = q["subqueries"][0]
                needed = [(sq["project"] + [a for *_x, a in sq["aggregates"]])[0]]
        bgp_project = needed
    else:
        bgp_project = q["project"]
    res = bgp_execute(
        triples_ds,
        q["patterns"],
        bgp_project,
        num_buckets=num_buckets,
        optionals=q["optionals"],
        filters=q["filters"],
        unions=q["unions"],
        minuses=q.get("minuses") or (),
        exists=q.get("exists") or (),
        binds=q.get("binds") or (),
        subqueries=q.get("subqueries") or (),
    )
    if aggregates:
        res, cols = _aggregate_bindings(res, q["group_by"], aggregates)
        having = q.get("having") or []
        if having:
            # HAVING = FILTER over the aggregated table (group keys +
            # aliases): a numeric comparison reads an int64/float64 alias
            # directly and TRY_CASTs a string one (SUM's decimal string)
            # to DOUBLE. NB: that is FILTER semantics, not exact integer
            # comparison — a SUM-based HAVING twin must spell
            # CAST(CAST(SUM(..) AS VARCHAR) AS DOUBLE) in its comparison,
            # or the engines diverge on sums past 2^53
            hreq: dict[str, set] = {}
            for h in having:
                _facet_reqs(h, hreq)
            if hreq:
                # aggregate outputs carry no term metadata to read
                raise ValueError(
                    "facet functions (LANG/DATATYPE/is*) in HAVING are out "
                    "of fragment"
                )
            hvars = set()
            for h in having:
                _expr_vars(h, hvars)
            missing_h = sorted(hvars - set(cols))
            if missing_h:
                raise ValueError(
                    f"HAVING references non-output columns: {missing_h}"
                )

            def apply_having(batch: pa.Table) -> pa.Table:
                m = np.ones(batch.num_rows, dtype=bool)
                for h in having:
                    m &= _filter_mask(h, batch)
                return batch.filter(pa.array(m))

            res = res.map_batches(apply_having, batch_format="pyarrow")
    else:
        cols = q["project"]

    if q["distinct"]:
        res = _distinct(res, cols)

    order_by = list(q["order_by"])
    if order_by:
        keys: list[str] = []
        desc: list[bool] = []
        nexprs: list[tuple[str, tuple]] = []
        for item, d in order_by:
            if isinstance(item, tuple) and item[0] == "nexpr":
                # numeric-expression key: evaluated into a hidden int64
                # column, dropped by the sort's final projection
                col = f"__ob{len(nexprs)}"
                evars: set = set()
                _bind_vars(item[1], evars)
                missing_e = sorted(evars - set(cols))
                if missing_e:
                    raise ValueError(
                        f"ORDER BY expression references non-projected "
                        f"variables: {missing_e}"
                    )
                nexprs.append((col, item[1]))
                keys.append(col)
            else:
                if item not in cols:
                    raise ValueError(
                        f"ORDER BY variables must be projected: [{item!r}]"
                    )
                keys.append(item)
            desc.append(d)
        # total order: remaining projected vars ASC break ties
        for v in cols:
            if v not in keys:
                keys.append(v)
                desc.append(False)
        if nexprs:

            def add_order_cols(batch: pa.Table) -> pa.Table:
                for col, ast in nexprs:
                    val = _bind_eval(ast, batch)
                    if isinstance(val, pa.Scalar):
                        val = pa.repeat(val, batch.num_rows)
                    batch = batch.append_column(col, val)
                return batch

            res = res.map_batches(add_order_cols, batch_format="pyarrow")
        res = _null_safe_sort(res, keys, desc, cols)
    elif q["limit"] is not None:
        res = _null_safe_sort(res, cols, [False] * len(cols), cols)

    if q["limit"] is not None:
        offset = q["offset"] or 0
        res = res.limit(offset + q["limit"])
        if offset:
            import ray
            import ray.data as rd

            # promote unifies all-null (OPTIONAL/UNION) blocks with typed
            # ones; aggregate outputs keep their int64 columns
            parts = [t.select(cols) for t in ray.get(res.to_arrow_refs())]
            if parts:
                tbl = pa.concat_tables(parts, promote_options="permissive")
            else:
                tbl = pa.schema([(v, pa.string()) for v in cols]).empty_table()
            res = rd.from_arrow(tbl.slice(offset))
    return res, cols


def sparql_select_typed(triples_ds, query: str, num_buckets: int | None = None):
    """SELECT execution for results SERIALIZATION (SPARQL 1.1 JSON / TSV
    need term KINDS, which the plain binding table doesn't carry).
    Returns ``(Dataset, out_vars, provenance)``: the dataset carries, for
    every facet-eligible projected variable, its ``__f_kind__`` /
    ``__f_lang__`` / ``__f_dt__`` columns; ``provenance[var]`` is
    ``"facet"`` (true term kinds from the variable's required binding
    site) or ``"derived"`` (a BIND / expression-projection target — a
    genuine plain literal). A projected variable with NEITHER provenance
    (OPTIONAL/UNION/closure/subquery-only binding) is rejected loudly —
    serialize those result sets as CSV (untyped by spec) or parquet.
    DISTINCT and GROUP BY are out of fragment here (term-level
    distinctness and aggregate kind metadata); ORDER BY / LIMIT / OFFSET
    apply as in sparql_select."""
    from ..core.sparql import parse_select

    q = parse_select(query)
    if q["distinct"] or q["group_by"] or q["aggregates"]:
        raise ValueError(
            "typed serialization covers the plain SELECT fragment — "
            "DISTINCT / GROUP BY results carry no term-kind provenance; "
            "use CSV or parquet output"
        )
    derived = {bv for bv, _be in (q.get("binds") or ())}
    prov: dict[str, str] = {}
    extra: dict[str, set] = {}
    for v in q["project"]:
        if v in derived:
            prov[v] = "derived"
            continue
        site, pos = _binding_site(v, q["patterns"])
        if site is None:
            raise ValueError(
                f"typed serialization needs ?{v} bound by a required "
                "pattern (or a BIND target); OPTIONAL/UNION/closure/"
                "subquery-only bindings carry no term kind — use CSV or "
                "parquet output"
            )
        prov[v] = "facet"
        extra[v] = {"kind"} if pos == "subj" else {"kind", "lang", "dt"}
    out_cols = list(q["project"]) + [
        _facet_col(v, f)
        for v in q["project"]
        if prov[v] == "facet"
        for f in sorted(extra[v])
    ]
    res = bgp_execute(
        triples_ds,
        q["patterns"],
        out_cols,
        num_buckets=num_buckets,
        optionals=q["optionals"],
        filters=q["filters"],
        unions=q["unions"],
        minuses=q.get("minuses") or (),
        exists=q.get("exists") or (),
        binds=q.get("binds") or (),
        subqueries=q.get("subqueries") or (),
        extra_facets=extra or None,
    )
    order_by = list(q["order_by"])
    if order_by:
        if any(isinstance(v, tuple) for v, _ in order_by):
            raise ValueError(
                "expression ORDER BY keys are out of fragment for typed "
                "serialization — sort by a projected variable"
            )
        bad = [v for v, _ in order_by if v not in q["project"]]
        if bad:
            raise ValueError(f"ORDER BY variables must be projected: {bad}")
        keys = [v for v, _ in order_by]
        desc = [d for _, d in order_by]
        for v in q["project"]:
            if v not in keys:
                keys.append(v)
                desc.append(False)
        res = _null_safe_sort(res, keys, desc, out_cols)
    elif q["limit"] is not None:
        res = _null_safe_sort(
            res, q["project"], [False] * len(q["project"]), out_cols
        )
    if q["limit"] is not None:
        res = res.limit((q["offset"] or 0) + q["limit"])
        if q["offset"]:
            import ray
            import ray.data as rd

            parts = [t.select(out_cols) for t in ray.get(res.to_arrow_refs())]
            if parts:
                tbl = pa.concat_tables(parts, promote_options="permissive")
            else:
                tbl = pa.schema([(v, pa.string()) for v in out_cols]).empty_table()
            res = rd.from_arrow(tbl.slice(q["offset"]))
    return res, q["project"], prov


def _null_safe_sort(res, keys: list[str], desc: list[bool], out_cols: list[str]):
    """Distributed sort robust to NULLs in any key column. Ray's sort
    samples quantile boundaries and compares raw key values, so a null in
    a key column (an OPTIONAL/UNION-padded var, a BIND over a non-integer
    lexical, an all-null-group SUM) raises ``TypeError: '<' not supported``
    deep inside the exchange. Each key becomes a (validity int8, filled
    value) surrogate pair: ASC puts unbound FIRST (SPARQL's ordering —
    unbound < everything), DESC reverses it to unbound last; among bound
    values the order is unchanged, so twins without nulls are unaffected
    and twins with nullable keys must spell ``ASC NULLS FIRST`` /
    ``DESC NULLS LAST``. Surrogates are dropped by the final projection."""
    key_list = list(keys)

    def add_surrogates(batch: pa.Table) -> pa.Table:
        for i, k in enumerate(key_list):
            col = batch[k]
            batch = batch.append_column(
                f"__nn{i}", pc.cast(pc.is_valid(col), pa.int8())
            )
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                filled = pc.fill_null(col, "")
            else:
                filled = pc.fill_null(col, pa.scalar(0).cast(col.type))
            batch = batch.append_column(f"__fv{i}", filled)
        return batch

    skeys: list[str] = []
    sdesc: list[bool] = []
    for i, d in enumerate(desc):
        skeys += [f"__nn{i}", f"__fv{i}"]
        sdesc += [d, d]
    out = res.map_batches(add_surrogates, batch_format="pyarrow").sort(
        skeys, descending=sdesc
    )
    return out.map_batches(
        lambda t: pa.table({c: t[c] for c in out_cols}), batch_format="pyarrow"
    )


def _distinct(res, cols: list[str]):
    """Set semantics over string columns ``cols``: ONE bucketed exchange by
    crc32 of the composite key (nulls — e.g. from OPTIONAL — share one key,
    SQL DISTINCT semantics), duplicates dropped inside each bucket."""
    import pandas as pd

    from .dedup import _doc_bucket

    def add_key(batch: pa.Table) -> pa.Table:
        key = _key_expr(batch, cols) if len(cols) > 1 else batch[cols[0]].cast(pa.string())
        key = pc.fill_null(key, "\x01null")
        return batch.append_column(
            "__dbucket", pa.array(_doc_bucket(key.to_pylist(), 64))
        )

    def drop_dups(group: pd.DataFrame) -> pa.Table:
        d = group.drop_duplicates(cols)[cols]
        return pa.table({c: pa.array(d[c], pa.string()) for c in cols})

    return (
        res.map_batches(add_key, batch_format="pyarrow")
        .groupby("__dbucket")
        .map_groups(drop_dups, batch_format="pandas")
    )


def sparql_ask(triples_ds, query: str, num_buckets: int | None = None):
    """SPARQL ASK: does the pattern have at least one solution? Returns a
    one-row Dataset {ask: bool} (the SQL twin is SELECT EXISTS(...)). The
    probe consumes at most one solution row off the streaming executor —
    the BGP's own joins still run, but nothing downstream materializes."""
    import ray.data as rd

    from ..core.sparql import parse_query

    q = parse_query(query)
    if q["form"] != "ask":
        raise ValueError(f"sparql_ask needs an ASK query, got {q['form'].upper()}")
    pats = q["patterns"] or [p for g in q["unions"] for p in g]
    probe_var = next((v for p in pats for v in _pattern_vars(p)), None)
    if probe_var is None:
        # all-constant ASK (e.g. ASK { <s> <p> <o> }): every pattern must
        # have at least one match. A two-constant closure (<s> <p>+ <o>)
        # is rejected here like everywhere else — _scan would otherwise
        # misread PathPlus as a one-hop alternation.
        for p in q["patterns"]:
            if any(isinstance(t, PathPlus) for t in p):
                raise ValueError(
                    f"closure pattern {p} with two constants is out of "
                    "fragment; bind one side to a variable"
                )
        if q["filters"] or q.get("binds"):
            # no binding table exists to evaluate them over — silently
            # ignoring a FILTER/BIND would answer the wrong question
            raise ValueError(
                "FILTER/BIND over an all-constant ASK is out of fragment "
                "(no variables to bind)"
            )
        found = all(
            len(_scan(triples_ds, p).limit(1).take(1)) > 0 for p in q["patterns"]
        )
        # FILTER [NOT] EXISTS over an all-constant ASK: each group is a
        # global gate (no variables to share)
        for neg, group in q.get("exists") or ():
            if not found:
                break
            var_pats = [p for p in group if _pattern_vars(p)]
            matched = all(
                len(_scan(triples_ds, c).limit(1).take(1)) > 0
                for c in group
                if not _pattern_vars(c)
            )
            if matched and var_pats:
                g_acc, _gb = _join_group(triples_ds, var_pats, num_buckets or 32)
                matched = len(g_acc.limit(1).take(1)) > 0
            if matched == neg:
                found = False
        return rd.from_arrow(pa.table({"ask": pa.array([found], pa.bool_())}))
    res = bgp_execute(
        triples_ds,
        q["patterns"],
        [probe_var],
        num_buckets=num_buckets,
        optionals=q["optionals"],
        filters=q["filters"],
        unions=q["unions"],
        minuses=q.get("minuses") or (),
        exists=q.get("exists") or (),
        binds=q.get("binds") or (),
    )
    found = len(res.limit(1).take(1)) > 0
    return rd.from_arrow(pa.table({"ask": pa.array([found], pa.bool_())}))


def sparql_describe(triples_ds, query: str, num_buckets: int | None = None):
    """SPARQL DESCRIBE: CBD (concise bounded description) of the resource
    set — constant IRIs, or the distinct bindings of the one DESCRIBE
    variable over the WHERE pattern. Seeds feed graph.cbd_closure: triples
    whose subject is a seed plus the transitive bnode-object closure, one
    guarded semi-join per hop. Returns full triple-schema rows."""
    import ray.data as rd

    from ..core.sparql import parse_query
    from .graph import cbd_closure

    q = parse_query(query)
    if q["form"] != "describe":
        raise ValueError(
            f"sparql_describe needs a DESCRIBE query, got {q['form'].upper()}"
        )
    if q["var"] is not None:
        res = bgp_execute(
            triples_ds,
            q["patterns"],
            [q["var"]],
            num_buckets=num_buckets,
            optionals=q["optionals"],
            filters=q["filters"],
            unions=q["unions"],
            minuses=q.get("minuses") or (),
            exists=q.get("exists") or (),
        )
        nodes = _distinct(res, [q["var"]]).map_batches(
            lambda t, v=q["var"]: pa.table({"node": t[v].cast(pa.string())}),
            batch_format="pyarrow",
        )
    else:
        nodes = rd.from_arrow(
            pa.table({"node": pa.array(sorted(set(q["iris"])), pa.string())})
        )
    return cbd_closure(triples_ds, nodes)


def sparql_construct(triples_ds, query: str, num_buckets: int | None = None):
    """SPARQL CONSTRUCT: instantiate the template once per solution and
    dedup (CONSTRUCT produces a GRAPH — set semantics). Returns a Dataset
    of (subj, pred, obj_value) strings. Template rows whose variables are
    null in a solution (OPTIONAL / UNION padding) are skipped, per spec.
    Emission is vectorized: one projected column (or pa.repeat constant)
    per template slot, concatenated across template triples per batch;
    the final dedup is the engine's one-exchange _distinct."""
    from ..core.sparql import parse_query

    q = parse_query(query)
    if q["form"] != "construct":
        raise ValueError(
            f"sparql_construct needs a CONSTRUCT query, got {q['form'].upper()}"
        )
    template = q["template"]
    tvars = list(
        dict.fromkeys(t[1:] for p in template for t in p if _is_var(t))
    )
    res = bgp_execute(
        triples_ds,
        q["patterns"],
        tvars,
        num_buckets=num_buckets,
        optionals=q["optionals"],
        filters=q["filters"],
        unions=q["unions"],
        minuses=q.get("minuses") or (),
        exists=q.get("exists") or (),
    )
    out_cols = ("subj", "pred", "obj_value")

    def emit(batch: pa.Table) -> pa.Table:
        parts = []
        for pat in template:
            pat_vars = [t[1:] for t in pat if _is_var(t)]
            t = batch
            for v in pat_vars:  # drop solutions that leave a slot null
                t = t.filter(pc.is_valid(t[v]))
            n = t.num_rows
            cols = {}
            for name, term in zip(out_cols, pat):
                cols[name] = (
                    t[term[1:]].cast(pa.string())
                    if _is_var(term)
                    else pa.repeat(term, n)
                )
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return _distinct(
        res.map_batches(emit, batch_format="pyarrow"), list(out_cols)
    )


def sparql_construct_typed(triples_ds, query: str,
                           num_buckets: int | None = None):
    """SPARQL CONSTRUCT returning FULL 7-column store rows (term kinds +
    lang/datatype marks) — the serializable flavor behind the CLI's
    ``--format nt|ttl`` CONSTRUCT path and a writable store in its own
    right. Constant template slots carry their parsed kinds; VARIABLE
    slots read the term-kind facet columns from the variable's required
    binding site (the same plan as UPDATE's INSERT templates — a variable
    bound only by OPTIONAL/UNION is rejected loudly, unlike the untyped
    ``sparql_construct`` which skips null slots). Literal-in-subject /
    non-IRI-predicate bindings raise. Dedup is full-row set semantics
    (one bucketed exchange)."""
    from ..core.sparql import parse_query
    from .update import _distinct_rows, _emit_insert_rows, _insert_facet_plan

    q = parse_query(query)
    if q["form"] != "construct":
        raise ValueError(
            f"sparql_construct_typed needs a CONSTRUCT query, got "
            f"{q['form'].upper()}"
        )
    if num_buckets is None:
        try:
            num_buckets = max(32, 2 * triples_ds.num_blocks())
        except Exception:
            num_buckets = 64
    tmpl = q["template_tagged"]
    if tmpl is None:
        raise ValueError(
            "CONSTRUCT WHERE shorthand carries no template term kinds — "
            "spell the template out (CONSTRUCT { ... } WHERE { ... }) "
            "for typed output"
        )
    extra = _insert_facet_plan(
        tmpl, q["patterns"], what="typed CONSTRUCT template"
    )
    tvars = list(dict.fromkeys(
        t[1] for trip in tmpl for t in trip if t[0] == "var"
    ))
    project = tvars + [
        _facet_col(v, f) for v in sorted(extra) for f in sorted(extra[v])
    ]
    bindings = bgp_execute(
        triples_ds,
        q["patterns"],
        project,
        num_buckets=num_buckets,
        optionals=q["optionals"],
        filters=q["filters"],
        unions=q["unions"],
        minuses=q.get("minuses") or (),
        exists=q.get("exists") or (),
        extra_facets=extra or None,
    )
    rows = bindings.map_batches(
        _emit_insert_rows(tmpl, what="typed CONSTRUCT template"),
        batch_format="pyarrow",
    )
    return _distinct_rows(rows, num_buckets)


def _aggregate_bindings(res, group_by: list[str], aggregates, pre_aggregate=None):
    """GROUP BY + {COUNT, COUNT DISTINCT, MIN, MAX, SUM, AVG} over a
    binding table.

    Grouped path: ONE bucketed exchange — rows shuffle by crc32(group key)
    % 64 (groups never span buckets: the bucket is a function of the full
    key) and each bucket task computes its groups' aggregates exactly with
    pandas, so COUNT(DISTINCT) needs no second exchange. When every
    aggregate is DECOMPOSABLE (no DISTINCT flag anywhere), each block
    first combines down to one partial row per (block, group) — COUNT
    partials sum, MIN/MAX partials re-min/max, SUM/AVG partials are exact
    integer sums (+ valid counts for AVG) — so the exchange carries
    O(groups x blocks) partial rows instead of every binding row (the
    classic pre-aggregation/combiner; ``pre_aggregate`` False/True
    overrides the auto choice, used by the equivalence test). A DISTINCT
    aggregate needs the group's raw values co-located, so those queries
    keep the ship-rows path. Global path (no GROUP BY): per-block partials
    reduced on the driver — O(blocks) scalar rows, never the data (the
    parser rejects global DISTINCT aggregates).
    SQL aggregate null semantics throughout: COUNT(?v)/MIN/MAX skip nulls,
    COUNT(*) counts rows, a null group key is its own group.

    SUM/AVG follow core/numeric.py's integer-lexical semantics: values are
    exact Python ints (order-independent — safe to sum per block and merge),
    SUM renders as the integer's decimal string (matching the SQL twin's
    CAST(SUM(..) AS VARCHAR)), AVG is float(SUM)/COUNT — one correctly-
    rounded conversion plus one IEEE division, identical to the twin's
    CAST(CAST(SUM(..) AS VARCHAR) AS DOUBLE)/COUNT(..)."""
    import pandas as pd
    import ray.data as rd

    from ..core.numeric import int_lex_array

    out_cols = group_by + [a for *_x, a in aggregates]
    int_cols = {a for f, _v, _d, a in aggregates if f == "COUNT"}
    float_cols = {a for f, _v, _d, a in aggregates if f == "AVG"}
    out_fields = [
        (
            c,
            pa.int64()
            if c in int_cols
            else pa.float64()
            if c in float_cols
            else pa.string(),
        )
        for c in out_cols
    ]

    def _agg_frame(df: pd.DataFrame) -> dict:
        row = {}
        for f, v, d, alias in aggregates:
            if f == "COUNT":
                if v is None:
                    row[alias] = len(df)
                elif d:
                    row[alias] = df[v].dropna().nunique()
                else:
                    row[alias] = int(df[v].notna().sum())
            elif f in ("SUM", "AVG"):
                vals = [
                    x
                    for x in int_lex_array(df[v].dropna().tolist())
                    if x is not None
                ]
                if d:
                    vals = set(vals)
                if not vals:
                    row[alias] = None
                elif f == "SUM":
                    row[alias] = str(sum(vals))
                else:
                    row[alias] = float(sum(vals)) / len(vals)
            elif isinstance(f, tuple):  # ("GC", sep): GROUP_CONCAT
                vals = df[v].dropna().tolist()
                vals = sorted(set(vals)) if d else sorted(vals)
                # codepoint-sorted concat (twin: string_agg ORDER BY v);
                # all-null group -> NULL, DuckDB's convention
                row[alias] = f[1].join(vals) if vals else None
            else:
                s = df[v].dropna()
                if len(s) == 0:
                    row[alias] = None
                else:
                    row[alias] = s.min() if f == "MIN" else s.max()
        return row

    if group_by:
        from .dedup import _doc_bucket

        def add_bucket(batch: pa.Table) -> pa.Table:
            key = _key_expr(batch, group_by) if len(group_by) > 1 else batch[
                group_by[0]
            ].cast(pa.string())
            key = pc.fill_null(key, "\x01null")
            return batch.append_column(
                "__abucket", pa.array(_doc_bucket(key.to_pylist(), 64))
            )

        # DISTINCT needs the full value set per group; GROUP_CONCAT's
        # globally-sorted concat cannot merge from per-block partials
        decomposable = not any(
            d or isinstance(f, tuple) for f, _v, d, _a in aggregates
        )
        if pre_aggregate is True and not decomposable:
            raise ValueError(
                "DISTINCT / GROUP_CONCAT aggregates cannot be pre-aggregated"
            )
        if decomposable and pre_aggregate is not False:
            partial_fields = [(c, pa.string()) for c in group_by]
            for f, _v, _d, alias in aggregates:
                partial_fields.append(
                    (alias, pa.int64() if f == "COUNT" else pa.string())
                )
                if f == "AVG":
                    partial_fields.append(("__" + alias + "_n", pa.int64()))

            def _partial_row(g: pd.DataFrame, row: dict) -> dict:
                for f, v, _d, alias in aggregates:
                    if f == "COUNT":
                        row[alias] = (
                            len(g) if v is None else int(g[v].notna().sum())
                        )
                    elif f in ("SUM", "AVG"):
                        vals = [
                            x
                            for x in int_lex_array(g[v].dropna().tolist())
                            if x is not None
                        ]
                        row[alias] = str(sum(vals)) if vals else None
                        if f == "AVG":
                            row["__" + alias + "_n"] = len(vals)
                    else:
                        s = g[v].dropna()
                        row[alias] = (
                            None
                            if len(s) == 0
                            else (s.min() if f == "MIN" else s.max())
                        )
                return row

            def partial_by_group(batch: pa.Table) -> pa.Table:
                df = batch.to_pandas()
                rows = []
                for keys, g in df.groupby(group_by, dropna=False, sort=False):
                    if not isinstance(keys, tuple):
                        keys = (keys,)
                    row = {
                        c: (None if pd.isna(k) else k)
                        for c, k in zip(group_by, keys)
                    }
                    rows.append(_partial_row(g, row))
                return pa.table(
                    {c: pa.array([r[c] for r in rows], t) for c, t in partial_fields}
                )

            def merge_bucket(group: pd.DataFrame) -> pa.Table:
                rows = []
                for keys, g in group.groupby(group_by, dropna=False, sort=True):
                    if not isinstance(keys, tuple):
                        keys = (keys,)
                    row = {
                        c: (None if pd.isna(k) else k)
                        for c, k in zip(group_by, keys)
                    }
                    for f, _v, _d, alias in aggregates:
                        if f == "COUNT":
                            row[alias] = int(g[alias].sum())
                        elif f in ("SUM", "AVG"):
                            sums = g[alias].dropna()
                            total = sum(int(x) for x in sums)
                            if f == "SUM":
                                row[alias] = str(total) if len(sums) else None
                            else:
                                n = int(g["__" + alias + "_n"].sum())
                                row[alias] = float(total) / n if n else None
                        else:
                            s = g[alias].dropna()
                            row[alias] = (
                                None
                                if len(s) == 0
                                else (s.min() if f == "MIN" else s.max())
                            )
                    rows.append(row)
                return pa.table(
                    {c: pa.array([r[c] for r in rows], t) for c, t in out_fields}
                )

            out = (
                res.map_batches(partial_by_group, batch_format="pyarrow")
                .map_batches(add_bucket, batch_format="pyarrow")
                .groupby("__abucket")
                .map_groups(merge_bucket, batch_format="pandas")
            )
            return out, out_cols

        def agg_bucket(group: pd.DataFrame) -> pa.Table:
            rows = []
            for keys, g in group.groupby(group_by, dropna=False, sort=True):
                if not isinstance(keys, tuple):  # pandas-version-dependent
                    keys = (keys,)
                row = {c: (None if pd.isna(k) else k) for c, k in zip(group_by, keys)}
                row.update(_agg_frame(g))
                rows.append(row)
            return pa.table(
                {c: pa.array([r[c] for r in rows], t) for c, t in out_fields}
            )

        out = (
            res.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__abucket")
            .map_groups(agg_bucket, batch_format="pandas")
        )
        return out, out_cols

    # global aggregate: per-block partials -> tiny driver-side merge.
    # SUM/AVG partials are exact ints (sum-of-sums is order-independent);
    # AVG also needs the block's valid-value count to divide at the end.
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cols = {}
        for f, v, _d, alias in aggregates:
            if f == "COUNT":
                n = batch.num_rows if v is None else int(df[v].notna().sum())
                cols[alias] = pa.array([n], pa.int64())
            elif f in ("SUM", "AVG"):
                vals = [
                    x
                    for x in int_lex_array(df[v].dropna().tolist())
                    if x is not None
                ]
                cols[alias] = pa.array(
                    [str(sum(vals)) if vals else None], pa.string()
                )
                if f == "AVG":
                    cols["__" + alias + "_n"] = pa.array([len(vals)], pa.int64())
            else:
                s = df[v].dropna()
                val = None if len(s) == 0 else (s.min() if f == "MIN" else s.max())
                cols[alias] = pa.array([val], pa.string())
        return pa.table(cols)

    partials = res.map_batches(partial, batch_format="pyarrow").to_pandas()
    row = {}
    for f, _v, _d, alias in aggregates:
        if f == "COUNT":
            row[alias] = int(partials[alias].sum()) if len(partials) else 0
        elif f in ("SUM", "AVG"):
            sums = partials[alias].dropna() if len(partials) else []
            total = sum(int(s) for s in sums)
            if f == "SUM":
                row[alias] = str(total) if len(sums) else None
            else:
                n = int(partials["__" + alias + "_n"].sum()) if len(partials) else 0
                row[alias] = float(total) / n if n else None
        else:
            s = partials[alias].dropna() if len(partials) else pd.Series([], dtype=object)
            row[alias] = None if len(s) == 0 else (s.min() if f == "MIN" else s.max())
    tbl = pa.table({c: pa.array([row[c]], t) for c, t in out_fields})
    return rd.from_arrow(tbl), out_cols


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
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_QUERY)


_QUARTER_CACHE: dict = {}


def _kg_triples_quarter(sf_dir: str):
    """Quarter-width flagship triple store, memoized per (Ray session,
    input dir): every SPARQL/BGP query callable starts from the same
    deterministic build, so within one driver/bench/test session the
    flagship pipeline runs ONCE instead of once per query (it dominated
    each query's wall — ~4.7 s of kg_sparql_sum's 10.5 s at sf0.1/x32).
    The session id in the key drops handles from dead Ray sessions; the
    materialized dataset keeps its lineage, so object-store eviction
    recomputes blocks rather than failing."""
    import os

    import ray

    key = (
        ray.get_runtime_context().get_job_id(),
        os.path.abspath(sf_dir),
    )
    ds = _QUARTER_CACHE.get(key)
    if ds is None:
        # evict entries from dead Ray sessions so a process that cycles
        # ray.init()/shutdown() holds at most one session's handles
        for stale in [k for k in _QUARTER_CACHE if k[0] != key[0]]:
            del _QUARTER_CACHE[stale]
        from ..stages.broadcast import cluster_cpus
        from .kg import kg_triples_dataset

        ds = kg_triples_dataset(
            sf_dir, parallelism=max(4, cluster_cpus() // 4)
        ).materialize()
        _QUARTER_CACHE[key] = ds
    return ds


# FILTER/HAVING numeric comparisons read lexical forms through the finite-
# decimal guard (core/numeric.DBL_LEX_SQL_RE) — inside that domain DuckDB's
# strtod and Arrow's fast_float agree bit-for-bit; outside it a bare
# TRY_CAST diverges ('1_0', padded whitespace, NaN — and DuckDB's total
# order makes NaN = NaN TRUE where numpy says False). Twins must spell
# numeric FILTER comparisons with THIS, mirroring _filter_mask.
def _dbl_cast_sql(col: str) -> str:
    from ..core.numeric import DBL_LEX_SQL_RE

    return (
        "TRY_CAST(CASE WHEN regexp_matches(" + col + ", '" + DBL_LEX_SQL_RE
        + "') THEN " + col + " END AS DOUBLE)"
    )


# FILTER: numeric range on the turn index (guarded-TRY_CAST-to-double
# semantics on both engines) over a 3-pattern BGP.
KG_SPARQL_FILTER_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?conv ?turn ?idx
WHERE {
  ?conv c:turn ?turn . ?turn c:index ?idx . ?turn c:role role:assistant .
  FILTER(?idx >= 2 && ?idx < 5)
}
"""

KG_SPARQL_FILTER_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS conv, t1.obj_value AS turn, t2.obj_value AS idx
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}index'
JOIN kt t3 ON t3.subj = t1.obj_value AND t3.pred = '{_C}role'
          AND t3.obj_value = 'http://example.org/role/assistant'
WHERE t1.pred = '{_C}turn'
  AND {_dbl_cast_sql("t2.obj_value")} >= 2
  AND {_dbl_cast_sql("t2.obj_value")} < 5
"""


def kg_sparql_filter(sf_dir: str):
    """SPARQL FILTER over the flagship KG: assistant turns whose index is
    in [2, 5) — the numeric comparison runs under TRY_CAST semantics
    identically on both engines."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_FILTER_QUERY)


# OPTIONAL: every assistant turn, with its tool when one was used (null
# otherwise) — the left-outer bucketed join.
KG_SPARQL_OPTIONAL_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?turn ?tool
WHERE {
  ?turn c:role role:assistant .
  OPTIONAL { ?turn c:toolUse ?use . ?use c:tool ?tool }
}
"""

KG_SPARQL_OPTIONAL_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS turn, u.tool AS tool
FROM kt t1
LEFT JOIN (
  SELECT t2.subj AS s, t3.obj_value AS tool
  FROM kt t2 JOIN kt t3 ON t3.subj = t2.obj_value AND t3.pred = '{_C}tool'
  WHERE t2.pred = '{_C}toolUse'
) u ON u.s = t1.subj
WHERE t1.pred = '{_C}role'
  AND t1.obj_value = 'http://example.org/role/assistant'
"""


def kg_sparql_optional(sf_dir: str):
    """SPARQL OPTIONAL over the flagship KG: assistant turns left-joined
    to their tool (null when the turn used none)."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_OPTIONAL_QUERY)


# ORDER BY + LIMIT/OFFSET: the deterministic distributed sort window. The
# index is compared as its LEXICAL form on both engines (the store holds
# strings; '10' sorts before '2'), and ?turn breaks ties so the order is
# total — the SQL twin spells the identical ORDER BY.
KG_SPARQL_ORDER_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?turn ?idx
WHERE {
  ?conv c:turn ?turn . ?turn c:index ?idx . ?turn c:role role:assistant
}
ORDER BY DESC(?idx) ?turn
LIMIT 20 OFFSET 5
"""

KG_SPARQL_ORDER_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.obj_value AS turn, t2.obj_value AS idx
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}index'
JOIN kt t3 ON t3.subj = t1.obj_value AND t3.pred = '{_C}role'
          AND t3.obj_value = 'http://example.org/role/assistant'
WHERE t1.pred = '{_C}turn'
ORDER BY idx DESC, turn
LIMIT 20 OFFSET 5
"""


def kg_sparql_order(sf_dir: str):
    """SPARQL ORDER BY DESC + LIMIT/OFFSET window over the flagship KG:
    rows 6-25 of assistant turns by descending lexical index."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_ORDER_QUERY)


# ------------------------------------------------- GRAPH (quad) patterns

def _kg_quads_quarter(sf_dir: str):
    """Quad-row view of the flagship KG at join-phase width (see
    _kg_triples_quarter — pattern scans collapse the data before any
    exchange, so the input is built at a quarter of the parse width)."""
    from .kg import add_conv_graph

    return _kg_triples_quarter(sf_dir).map_batches(
        add_conv_graph, batch_format="pyarrow"
    )


# Quad BGP: per named graph (= conversation provenance), every assistant
# turn that used a tool. All three patterns share ?g, so each join's
# composite key carries (turn-or-use, graph) — co-location by graph is the
# partitioning assumption a multi-document store would exploit.
_KG_BGP_GRAPH_PATTERNS = [
    ("?turn", _C + "role", "http://example.org/role/assistant", "?g"),
    ("?turn", _C + "toolUse", "?use", "?g"),
    ("?use", _C + "tool", "?tool", "?g"),
]

from .kg import KG_QUADS_SQL  # noqa: E402  (appended section; no cycle)

KG_BGP_GRAPH_SQL = f"""
WITH kq AS (
  SELECT subj, pred, obj_value, graph FROM ( {KG_QUADS_SQL} ) AS base
)
SELECT t1.graph AS g, t1.subj AS turn, t3.obj_value AS tool
FROM kq t1
JOIN kq t2 ON t2.subj = t1.subj AND t2.graph = t1.graph
          AND t2.pred = '{_C}toolUse'
JOIN kq t3 ON t3.subj = t2.obj_value AND t3.graph = t2.graph
          AND t3.pred = '{_C}tool'
WHERE t1.pred = '{_C}role'
  AND t1.obj_value = 'http://example.org/role/assistant'
"""


def kg_bgp_graph(sf_dir: str):
    """Named-graph BGP over the quad view of the flagship KG: (graph,
    assistant turn, tool) matches where every pattern is constrained to
    the SAME named graph — the ?g variable joins through the graph column
    exactly like any other shared variable."""
    return bgp_execute(
        _kg_quads_quarter(sf_dir), _KG_BGP_GRAPH_PATTERNS, ["g", "turn", "tool"]
    )


KG_SPARQL_GRAPH_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT DISTINCT ?g ?tool
WHERE { GRAPH ?g { ?t c:toolUse ?u . ?u c:tool ?tool } }
"""

KG_SPARQL_GRAPH_SQL = f"""
WITH kq AS (
  SELECT subj, pred, obj_value, graph FROM ( {KG_QUADS_SQL} ) AS base
)
SELECT DISTINCT t1.graph AS g, t2.obj_value AS tool
FROM kq t1
JOIN kq t2 ON t2.subj = t1.obj_value AND t2.graph = t1.graph
          AND t2.pred = '{_C}tool'
WHERE t1.pred = '{_C}toolUse'
"""


def kg_sparql_graph(sf_dir: str):
    """SPARQL GRAPH-pattern front-end: which named graphs (conversations)
    used which tools — parsed from `GRAPH ?g { … }` query text and
    evaluated as quad patterns by the BGP engine."""
    return sparql_select(_kg_quads_quarter(sf_dir), KG_SPARQL_GRAPH_QUERY)


# ------------------------------------------- UNION / aggregates / paths

# UNION: bag semantics — each turn contributes its tool rows (if any) AND
# its role row; the SQL twin is UNION ALL of the two branch joins.
KG_SPARQL_UNION_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?turn ?item WHERE {
  { ?turn c:toolUse ?u . ?u c:tool ?item }
  UNION
  { ?turn c:role ?item }
}
"""

KG_SPARQL_UNION_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS turn, t2.obj_value AS item
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}tool'
WHERE t1.pred = '{_C}toolUse'
UNION ALL
SELECT subj AS turn, obj_value AS item FROM kt WHERE pred = '{_C}role'
"""


def kg_sparql_union(sf_dir: str):
    """SPARQL UNION over the flagship KG: each turn paired with every tool
    it used plus its role IRI — two branch BGPs evaluated over the one
    materialized triple input and concatenated (bag semantics)."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_UNION_QUERY)


# Aggregates: per-conversation turn count, distinct-tool count (nulls from
# the OPTIONAL excluded, per SQL COUNT semantics) and lexical max index.
KG_SPARQL_AGG_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?conv (COUNT(?turn) AS ?n_turns) (COUNT(DISTINCT ?tool) AS ?n_tools)
       (MAX(?idx) AS ?max_idx)
WHERE {
  ?conv c:turn ?turn . ?turn c:index ?idx .
  OPTIONAL { ?turn c:toolUse ?u . ?u c:tool ?tool }
}
GROUP BY ?conv
"""

KG_SPARQL_AGG_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.subj AS conv, t1.obj_value AS turn, t2.obj_value AS idx,
         u.tool AS tool
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}index'
  LEFT JOIN (
    SELECT t3.subj AS s, t4.obj_value AS tool
    FROM kt t3 JOIN kt t4 ON t4.subj = t3.obj_value AND t4.pred = '{_C}tool'
    WHERE t3.pred = '{_C}toolUse'
  ) u ON u.s = t1.obj_value
  WHERE t1.pred = '{_C}turn'
)
SELECT conv, COUNT(turn) AS n_turns, COUNT(DISTINCT tool) AS n_tools,
       MAX(idx) AS max_idx
FROM b GROUP BY conv
"""


def kg_sparql_agg(sf_dir: str):
    """SPARQL GROUP BY aggregates over the flagship KG: per conversation,
    COUNT / COUNT DISTINCT / lexical MAX over a BGP with an OPTIONAL —
    one bucketed exchange, exact per-group aggregation inside buckets."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_AGG_QUERY)


# The SQL spelling of core/numeric.int_lex: a regex-guarded HUGEINT cast
# (the guard keeps DuckDB's permissive numeric parsing away — see the
# core/numeric.py docstring for why DECIMAL semantics were rejected).
# The pattern comes from core/numeric.INT_LEX_SQL_RE so the Python
# kernel, its parity test and every SQL twin stay in lockstep.
def _int_cast_sql(col: str, typ: str = "HUGEINT") -> str:
    # HUGEINT for aggregate twins (the running SUM is unbounded on both
    # engines); BIGINT for BIND value-expression twins (the Ray side is
    # int64 checked arithmetic — BIGINT makes overflow raise on BOTH
    # engines instead of silently diverging)
    from ..core.numeric import INT_LEX_SQL_RE

    return (
        "TRY_CAST(CASE WHEN regexp_matches(" + col + ", '" + INT_LEX_SQL_RE
        + "') THEN " + col + " END AS " + typ + ")"
    )

KG_SPARQL_SUM_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?role (COUNT(?t) AS ?n_turns) (SUM(?idx) AS ?sum_idx)
       (SUM(DISTINCT ?idx) AS ?sum_didx) (AVG(?ts) AS ?avg_ts)
WHERE { ?t c:role ?role . ?t c:index ?idx . ?t c:tsMicros ?ts }
GROUP BY ?role
"""

KG_SPARQL_SUM_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.obj_value AS role,
         {_int_cast_sql("t2.obj_value")} AS ic_idx,
         {_int_cast_sql("t3.obj_value")} AS ic_ts
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}index'
  JOIN kt t3 ON t3.subj = t1.subj AND t3.pred = '{_C}tsMicros'
  WHERE t1.pred = '{_C}role'
)
SELECT role, COUNT(*) AS n_turns,
       CAST(SUM(ic_idx) AS VARCHAR) AS sum_idx,
       CAST(SUM(DISTINCT ic_idx) AS VARCHAR) AS sum_didx,
       CAST(CAST(SUM(ic_ts) AS VARCHAR) AS DOUBLE) / COUNT(ic_ts) AS avg_ts
FROM b GROUP BY role
"""


def kg_sparql_sum(sf_dir: str):
    """SPARQL SUM/AVG aggregates (integer-exact semantics) over the
    flagship KG: per role — turn count, exact turn-index sums (plain and
    DISTINCT: indexes repeat across conversations, so the two differ) and
    the mean timestamp. Sums are exact Python ints (order-independent
    under the distributed merge), matching the twin's HUGEINT arithmetic;
    AVG is one strtod + one IEEE division on both engines."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_SUM_QUERY)


KG_SPARQL_HAVING_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?conv (COUNT(?turn) AS ?n_turns) (COUNT(DISTINCT ?tool) AS ?n_tools)
WHERE {
  ?conv c:turn ?turn . OPTIONAL { ?turn c:toolUse ?u . ?u c:tool ?tool }
}
GROUP BY ?conv
HAVING (?n_tools >= 2) (?n_turns > 5)
"""

KG_SPARQL_HAVING_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.subj AS conv, t1.obj_value AS turn, u.tool AS tool
  FROM kt t1
  LEFT JOIN (
    SELECT t3.subj AS s, t4.obj_value AS tool
    FROM kt t3 JOIN kt t4 ON t4.subj = t3.obj_value AND t4.pred = '{_C}tool'
    WHERE t3.pred = '{_C}toolUse'
  ) u ON u.s = t1.obj_value
  WHERE t1.pred = '{_C}turn'
)
SELECT conv, COUNT(turn) AS n_turns, COUNT(DISTINCT tool) AS n_tools
FROM b GROUP BY conv
HAVING COUNT(DISTINCT tool) >= 2 AND COUNT(turn) > 5
"""


def kg_sparql_having(sf_dir: str):
    """SPARQL HAVING over GROUP BY aggregates: conversations that used at
    least two distinct tools across more than five turns. The constraint
    runs as a map-side Arrow mask on the already-aggregated table — no
    extra exchange beyond the aggregation's one."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_HAVING_QUERY)


# Property path: inverse + sequence — from each tool IRI back through the
# bnode use (^c:tool) and the turn (^c:toolUse) to the turn's role.
KG_SPARQL_PATH_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT DISTINCT ?tool ?role
WHERE { ?tool ^c:tool/^c:toolUse ?turn . ?turn c:role ?role }
"""

KG_SPARQL_PATH_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT DISTINCT t2.obj_value AS tool, t3.obj_value AS role
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}tool'
JOIN kt t3 ON t3.subj = t1.subj AND t3.pred = '{_C}role'
WHERE t1.pred = '{_C}toolUse'
"""


def kg_sparql_path(sf_dir: str):
    """SPARQL property-path front-end: inverse (^) and sequence (/) steps
    desugar to fresh-variable patterns at parse time — which roles issued
    each tool, walked backwards from the tool IRI."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_PATH_QUERY)


# Fully decomposable GROUP BY (no DISTINCT aggregate): runs on the
# pre-aggregated path — per-block partials, exchange carries
# O(groups x blocks) rows, not the bindings.
KG_SPARQL_ROLLUP_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?conv (COUNT(*) AS ?n_turns) (MIN(?idx) AS ?min_idx)
       (MAX(?idx) AS ?max_idx) (SUM(?ts) AS ?sum_ts)
WHERE { ?conv c:turn ?t . ?t c:index ?idx . ?t c:tsMicros ?ts }
GROUP BY ?conv
"""

KG_SPARQL_ROLLUP_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.subj AS conv, t2.obj_value AS idx,
         {_int_cast_sql("t3.obj_value")} AS ic_ts
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}index'
  JOIN kt t3 ON t3.subj = t1.obj_value AND t3.pred = '{_C}tsMicros'
  WHERE t1.pred = '{_C}turn'
)
SELECT conv, COUNT(*) AS n_turns, MIN(idx) AS min_idx, MAX(idx) AS max_idx,
       CAST(SUM(ic_ts) AS VARCHAR) AS sum_ts
FROM b GROUP BY conv
"""


def kg_sparql_rollup(sf_dir: str):
    """Per-conversation rollup (COUNT/MIN/MAX/exact SUM) — every
    aggregate is decomposable, so the engine pre-aggregates inside each
    block and the grouped exchange ships one partial row per
    (block, conversation) instead of one row per turn."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_ROLLUP_QUERY)


# Transitive closure p+ anchored at a constant: everything reachable from
# one conversation over turn/toolUse edges, typed. The twin is a
# recursive CTE (DuckDB WITH RECURSIVE, UNION = distinct = termination
# on cycles — same fixpoint the distributed BFS computes).
KG_SPARQL_PATH_PLUS_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX conv: <http://example.org/conv/>
SELECT ?node ?ty
WHERE { conv:c1 (c:turn|c:toolUse)+ ?node . ?node a ?ty }
"""

KG_SPARQL_PATH_PLUS_SQL = f"""
WITH RECURSIVE kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), e AS (
  SELECT subj, obj_value FROM kt
  WHERE pred IN ('{_C}turn', '{_C}toolUse')
), r(node) AS (
  SELECT obj_value FROM e WHERE subj = 'http://example.org/conv/c1'
  UNION
  SELECT e.obj_value FROM r JOIN e ON e.subj = r.node
)
SELECT r.node AS node, t.obj_value AS ty
FROM r
JOIN kt t ON t.subj = r.node
         AND t.pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
"""


def kg_sparql_path_plus(sf_dir: str):
    """SPARQL one-or-more path ``(c:turn|c:toolUse)+`` from a constant
    conversation seed, joined to each reached node's rdf:type. The
    closure runs as a distributed BFS over the (materialized-once,
    predicate-pruned) edge scan: per round one bucketed join + DISTINCT +
    anti-join vs the seen set — rounds = graph diameter (2 here), no
    driver-side node state."""
    return sparql_select(
        _kg_triples_quarter(sf_dir), KG_SPARQL_PATH_PLUS_QUERY
    )


# Multi-variable VALUES: row-tuple membership over bound variables —
# vectorized OR-of-ANDs mask, the SQL twin spells the same disjunction.
KG_SPARQL_VALUES_MULTI_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
PREFIX tool: <http://example.org/tool/>
SELECT ?t ?role ?tool
WHERE {
  ?t c:role ?role . ?t c:toolUse ?u . ?u c:tool ?tool .
  VALUES (?role ?tool) {
    (role:assistant tool:error) (role:assistant tool:purchase)
    (role:user tool:error)
  }
}
"""

_VM_ROWS = [
    ("http://example.org/role/assistant", "http://example.org/tool/error"),
    ("http://example.org/role/assistant", "http://example.org/tool/purchase"),
    ("http://example.org/role/user", "http://example.org/tool/error"),
]

KG_SPARQL_VALUES_MULTI_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS t, t1.obj_value AS role, t3.obj_value AS tool
FROM kt t1
JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}toolUse'
JOIN kt t3 ON t3.subj = t2.obj_value AND t3.pred = '{_C}tool'
WHERE t1.pred = '{_C}role'
  AND ( {" OR ".join(f"(t1.obj_value = '{r}' AND t3.obj_value = '{t}')" for r, t in _VM_ROWS)} )
"""


def kg_sparql_values_multi(sf_dir: str):
    """SPARQL multi-variable VALUES: tool-using turns restricted to an
    inline (role, tool) row set — a vectorized row-membership mask over
    the binding table (no join: the inline data is a constant in the
    query plan)."""
    return sparql_select(
        _kg_triples_quarter(sf_dir), KG_SPARQL_VALUES_MULTI_QUERY
    )


# VALUES with UNDEF wildcards: one row pins (assistant, error), the other
# admits ANY role that used the purchase tool — the UNDEF position drops
# its conjunct from the row's AND. Twin: the same OR-of-ANDs with the
# wildcard conjunct omitted.
KG_SPARQL_VALUES_UNDEF_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
PREFIX tool: <http://example.org/tool/>
SELECT ?t ?role ?tool
WHERE {
  ?t c:role ?role . ?t c:toolUse ?u . ?u c:tool ?tool .
  VALUES (?role ?tool) {
    (role:assistant tool:error) (UNDEF tool:purchase)
  }
}
"""

KG_SPARQL_VALUES_UNDEF_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS t, t1.obj_value AS role, t3.obj_value AS tool
FROM kt t1
JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}toolUse'
JOIN kt t3 ON t3.subj = t2.obj_value AND t3.pred = '{_C}tool'
WHERE t1.pred = '{_C}role'
  AND ( (t1.obj_value = 'http://example.org/role/assistant'
         AND t3.obj_value = 'http://example.org/tool/error')
     OR t3.obj_value = 'http://example.org/tool/purchase' )
"""


def kg_sparql_values_undef(sf_dir: str):
    """Multi-var VALUES with an UNDEF wildcard: (assistant, error) pinned
    exactly, (UNDEF, purchase) admitting every role — wildcard positions
    drop their conjunct from the row mask."""
    return sparql_select(
        _kg_triples_quarter(sf_dir), KG_SPARQL_VALUES_UNDEF_QUERY
    )


# langMatches: RFC 4647 basic filtering over the lang facet — the range
# "EN" is deliberately upper-case (the match is case-insensitive, so a
# plain lang = 'en' equality twin would be the WRONG twin). Twin spells
# the full literal-gate + lower() + subtag-prefix disjunction.
KG_SPARQL_LANGMATCHES_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?role (COUNT(*) AS ?n)
WHERE {
  ?t c:text ?txt . ?t c:role ?role .
  FILTER(langMatches(LANG(?txt), "EN"))
}
GROUP BY ?role
"""

KG_SPARQL_LANGMATCHES_SQL = f"""
WITH kt AS ( {KG_TRIPLES_SQL} )
SELECT t2.obj_value AS role, COUNT(*) AS n
FROM kt t1
JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}role'
WHERE t1.pred = '{_C}text'
  AND t1.obj_kind = 'literal'
  AND t1.obj_lang IS NOT NULL AND t1.obj_lang <> ''
  AND (lower(t1.obj_lang) = 'en'
       OR starts_with(lower(t1.obj_lang), 'en-'))
GROUP BY role
"""


def kg_sparql_langmatches(sf_dir: str):
    """SPARQL langMatches over the lang facet (case-insensitive RFC 4647
    basic filtering), aggregated per role."""
    return sparql_select(
        _kg_triples_quarter(sf_dir), KG_SPARQL_LANGMATCHES_QUERY
    )


# MINUS: tool-using turns that did NOT resolve to the error tool — an
# anti-semi-join on the shared variable (SQL NOT EXISTS).
KG_SPARQL_MINUS_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX tool: <http://example.org/tool/>
SELECT DISTINCT ?t ?role
WHERE {
  ?t c:toolUse ?u . ?t c:role ?role .
  MINUS { ?t c:toolUse/c:tool tool:error }
}
"""

KG_SPARQL_MINUS_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT DISTINCT t1.subj AS t, t2.obj_value AS role
FROM kt t1
JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}role'
WHERE t1.pred = '{_C}toolUse'
  AND NOT EXISTS (
    SELECT 1
    FROM kt m1
    JOIN kt m2 ON m2.subj = m1.obj_value AND m2.pred = '{_C}tool'
              AND m2.obj_value = 'http://example.org/tool/error'
    WHERE m1.pred = '{_C}toolUse' AND m1.subj = t1.subj
  )
"""


def kg_sparql_minus(sf_dir: str):
    """SPARQL MINUS: tool-using turns (with their role), minus the turns
    whose tool use resolved to tool:error. The MINUS group is its own
    inner BGP (path-desugared), anti-semi-joined onto the required
    bindings on the shared variable — one extra bucketed exchange
    shipping only the join key."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_MINUS_QUERY)


# Path alternation inside a sequence: every role-or-toolUse object
# reachable from a conversation through one turn hop.
KG_SPARQL_ALT_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT DISTINCT ?conv ?x
WHERE { ?conv c:turn/(c:role|c:toolUse) ?x }
"""

KG_SPARQL_ALT_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT DISTINCT t1.subj AS conv, t2.obj_value AS x
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value
          AND t2.pred IN ('{_C}role', '{_C}toolUse')
WHERE t1.pred = '{_C}turn'
"""


def kg_sparql_alt(sf_dir: str):
    """SPARQL property-path alternation: ``(p1|p2)`` as a sequence step
    runs as ONE scan with a predicate-set filter (SQL ``pred IN``) — the
    union of edge kinds costs no extra exchange over a single-predicate
    hop."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_ALT_QUERY)


# --------------------------------------------------- ASK / CONSTRUCT forms

# ASK: is there any user turn that used a tool? (False on this corpus —
# tool use is assistant-only — so the query exercises the negative path.)
KG_SPARQL_ASK_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
ASK WHERE { ?t c:role role:user . ?t c:toolUse ?u }
"""

KG_SPARQL_ASK_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT EXISTS(
  SELECT 1 FROM kt t1
  JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}toolUse'
  WHERE t1.pred = '{_C}role'
    AND t1.obj_value = 'http://example.org/role/user'
) AS ask
"""


def kg_sparql_ask(sf_dir: str):
    """SPARQL ASK over the flagship KG: a boolean existence probe (did any
    USER turn use a tool?) — one row {ask}, at most one solution pulled
    off the streaming executor."""
    return sparql_ask(_kg_triples_quarter(sf_dir), KG_SPARQL_ASK_QUERY)


# CONSTRUCT: derive a direct conv --usedTool--> tool edge graph from the
# three-hop pattern (turn + bnode use), set semantics.
KG_SPARQL_CONSTRUCT_QUERY = """
PREFIX c: <http://example.org/convo#>
CONSTRUCT { ?conv c:usedTool ?tool . ?tool a c:Tool }
WHERE { ?conv c:turn ?t . ?t c:toolUse ?u . ?u c:tool ?tool }
"""

KG_SPARQL_CONSTRUCT_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), sol AS (
  SELECT t1.subj AS conv, t3.obj_value AS tool
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}toolUse'
  JOIN kt t3 ON t3.subj = t2.obj_value AND t3.pred = '{_C}tool'
  WHERE t1.pred = '{_C}turn'
)
SELECT DISTINCT subj, pred, obj_value FROM (
  SELECT conv AS subj, '{_C}usedTool' AS pred, tool AS obj_value FROM sol
  UNION ALL
  SELECT tool AS subj,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         '{_C}Tool' AS obj_value
  FROM sol
)
"""


def kg_sparql_construct(sf_dir: str):
    """SPARQL CONSTRUCT over the flagship KG: derives the direct
    conv→tool edge graph (plus a type triple per tool) from the three-hop
    BGP — vectorized template emission, one dedup exchange."""
    return sparql_construct(_kg_triples_quarter(sf_dir), KG_SPARQL_CONSTRUCT_QUERY)


# Typed CONSTRUCT: full 7-column rows with term kinds + lang/datatype
# marks carried from each variable's binding site — ?u is a BNODE in the
# subject slot, ?txt a lang-tagged literal, ?idx a datatyped literal,
# ?conv an IRI in an object slot (kind-only facet: its site is a subject
# position). Twin: the same 3 template emissions as a UNION ALL with the
# facet columns selected from the matched base rows, DISTINCT over all 7
# (DuckDB DISTINCT nulls-equal = the engine's sentinel full-row key).
KG_SPARQL_CONSTRUCT_TYPED_QUERY = """
PREFIX c: <http://example.org/convo#>
CONSTRUCT { ?u c:fromConv ?conv . ?u c:note ?txt . ?u c:rank ?idx }
WHERE {
  ?conv c:turn ?t . ?t c:toolUse ?u . ?t c:text ?txt . ?t c:index ?idx
}
"""

KG_SPARQL_CONSTRUCT_TYPED_SQL = f"""
WITH kt AS ( {KG_TRIPLES_SQL} ), sol AS (
  SELECT t2.obj_value AS u, t2.obj_kind AS uk, t1.subj AS conv,
         t3.obj_kind AS txtk, t3.obj_value AS txt,
         t3.obj_lang AS txtl, t3.obj_datatype AS txtd,
         t4.obj_kind AS idxk, t4.obj_value AS idx,
         t4.obj_lang AS idxl, t4.obj_datatype AS idxd
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}toolUse'
  JOIN kt t3 ON t3.subj = t1.obj_value AND t3.pred = '{_C}text'
  JOIN kt t4 ON t4.subj = t1.obj_value AND t4.pred = '{_C}index'
  WHERE t1.pred = '{_C}turn'
)
SELECT DISTINCT subj, subj_kind, pred, obj_kind, obj_value,
                obj_lang, obj_datatype
FROM (
  SELECT u AS subj, uk AS subj_kind, '{_C}fromConv' AS pred,
         'iri' AS obj_kind, conv AS obj_value,
         CAST(NULL AS VARCHAR) AS obj_lang,
         CAST(NULL AS VARCHAR) AS obj_datatype
  FROM sol
  UNION ALL
  SELECT u, uk, '{_C}note', txtk, txt, txtl, txtd FROM sol
  UNION ALL
  SELECT u, uk, '{_C}rank', idxk, idx, idxl, idxd FROM sol
)
"""


def kg_sparql_construct_typed(sf_dir: str):
    """Typed SPARQL CONSTRUCT: full store-schema rows (kinds + lang/dt
    facets) instantiated from a 4-pattern BGP — the serializable /
    re-storable CONSTRUCT flavor (bnode subjects, lang-tagged and
    datatyped literal objects all carried exactly)."""
    return sparql_construct_typed(
        _kg_triples_quarter(sf_dir), KG_SPARQL_CONSTRUCT_TYPED_QUERY
    )


# DESCRIBE: CBD of every turn of conversation c0 — the SPARQL front-end for
# the kg_describe operator, so the SQL twin is the same recursive CTE.
KG_SPARQL_DESCRIBE_QUERY = """
PREFIX c: <http://example.org/convo#>
DESCRIBE ?t WHERE { <http://example.org/conv/c0> c:turn ?t }
"""


def kg_sparql_describe(sf_dir: str):
    """SPARQL DESCRIBE front-end over the flagship KG: the CBD of every
    turn of conversation c0, seeds bound by the WHERE pattern — identical
    semantics (and oracle) to the kg_describe operator."""
    return sparql_describe(_kg_triples_quarter(sf_dir), KG_SPARQL_DESCRIBE_QUERY)


# VALUES: inline membership restriction — turns whose tool is in an inline
# list (one present value, one absent, so the mask genuinely filters); the
# SQL twin is a plain IN list.
KG_SPARQL_VALUES_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX tool: <http://example.org/tool/>
SELECT ?turn ?tool WHERE {
  ?turn c:toolUse ?u . ?u c:tool ?tool .
  VALUES ?tool { tool:error tool:refund }
}
"""

KG_SPARQL_VALUES_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS turn, t2.obj_value AS tool
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}tool'
WHERE t1.pred = '{_C}toolUse'
  AND t2.obj_value IN ('http://example.org/tool/error',
                       'http://example.org/tool/refund')
"""


def kg_sparql_values(sf_dir: str):
    """SPARQL VALUES over the flagship KG: tool-using turns restricted to
    an inline tool list — an O(1) membership mask on the binding table,
    no extra exchange."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_VALUES_QUERY)


# String-predicate FILTERs: REGEX (plain + case-insensitive), STRSTARTS /
# STRENDS / CONTAINS (negated), and [NOT] IN membership — all map-side
# Arrow kernels on the binding table; RE2 regex syntax on BOTH engines
# (pyarrow and DuckDB embed RE2). Each construct filters real rows: the
# plain REGEX keeps turns 10-19, the || keeps error-rows only via the
# case-insensitive branch and purchase-rows only via STRENDS, !CONTAINS
# drops conversation c3, NOT IN drops one named turn.
KG_SPARQL_STRFILTER_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX tool: <http://example.org/tool/>
SELECT DISTINCT ?t ?tool WHERE {
  ?t c:toolUse ?u . ?u c:tool ?tool .
  FILTER ( REGEX(?t, "/turn/1[0-9]$") )
  FILTER ( REGEX(?tool, "ERROR$", "i") || STRENDS(?tool, "chase") )
  FILTER ( STRSTARTS(?t, "http://example.org/conv/") )
  FILTER ( !CONTAINS(?t, "/conv/c3/") )
  FILTER ( ?t NOT IN (<http://example.org/conv/c0/turn/10>) )
}
"""

KG_SPARQL_STRFILTER_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT DISTINCT t1.subj AS t, t2.obj_value AS tool
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}tool'
WHERE t1.pred = '{_C}toolUse'
  AND regexp_matches(t1.subj, '/turn/1[0-9]$')
  AND (regexp_matches(t2.obj_value, 'ERROR$', 'i')
       OR ends_with(t2.obj_value, 'chase'))
  AND starts_with(t1.subj, 'http://example.org/conv/')
  AND (t1.subj IS NOT NULL AND NOT contains(t1.subj, '/conv/c3/'))
  AND (t1.subj IS NOT NULL
       AND t1.subj NOT IN ('http://example.org/conv/c0/turn/10'))
"""


def kg_sparql_strfilter(sf_dir: str):
    """SPARQL string-predicate FILTERs over the flagship KG: tool-using
    turns 10-19 outside conversation c3, each tool admitted by a different
    string predicate (case-insensitive REGEX vs STRENDS) — all vectorized
    map-side masks, zero extra exchanges."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_STRFILTER_QUERY)


# FILTER EXISTS (semi-join) + FILTER NOT EXISTS (anti-join): conversations
# with a turn that used some tool but never the error tool — each gate is
# ONE bucketed exchange shipping only the join key.
KG_SPARQL_EXISTS_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX tool: <http://example.org/tool/>
SELECT DISTINCT ?conv WHERE {
  ?conv c:turn ?t .
  FILTER EXISTS { ?t c:toolUse ?u }
  FILTER NOT EXISTS { ?t c:toolUse/c:tool tool:error }
}
"""

KG_SPARQL_EXISTS_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT DISTINCT t1.subj AS conv
FROM kt t1
WHERE t1.pred = '{_C}turn'
  AND EXISTS (
    SELECT 1 FROM kt e
    WHERE e.pred = '{_C}toolUse' AND e.subj = t1.obj_value
  )
  AND NOT EXISTS (
    SELECT 1
    FROM kt m1
    JOIN kt m2 ON m2.subj = m1.obj_value AND m2.pred = '{_C}tool'
              AND m2.obj_value = 'http://example.org/tool/error'
    WHERE m1.pred = '{_C}toolUse' AND m1.subj = t1.obj_value
  )
"""


def kg_sparql_exists(sf_dir: str):
    """SPARQL FILTER EXISTS / NOT EXISTS over the flagship KG:
    conversations having a turn that used a tool (semi-join on the shared
    turn variable) but whose tool use never resolved to tool:error
    (anti-join; the NOT EXISTS group is a path-desugared inner BGP)."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_EXISTS_QUERY)


# Zero-or-more path p*: identical BFS to p+ with the seed pre-loaded into
# the reached set — the seed row (typed Conversation) is exactly the delta
# vs kg_sparql_path_plus. Twin: the recursive CTE's base case is the seed
# constant itself instead of its one-hop neighbors.
KG_SPARQL_PATH_STAR_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX conv: <http://example.org/conv/>
SELECT ?node ?ty
WHERE { conv:c1 (c:turn|c:toolUse)* ?node . ?node a ?ty }
"""

KG_SPARQL_PATH_STAR_SQL = f"""
WITH RECURSIVE kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), e AS (
  SELECT subj, obj_value FROM kt
  WHERE pred IN ('{_C}turn', '{_C}toolUse')
), r(node) AS (
  SELECT 'http://example.org/conv/c1'
  UNION
  SELECT e.obj_value FROM r JOIN e ON e.subj = r.node
)
SELECT r.node AS node, t.obj_value AS ty
FROM r
JOIN kt t ON t.subj = r.node
         AND t.pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
"""


def kg_sparql_path_star(sf_dir: str):
    """SPARQL zero-or-more path ``(c:turn|c:toolUse)*`` from a constant
    conversation seed, joined to each node's rdf:type — the p+ BFS with
    the seed itself in the result (so the conversation row, typed
    c:Conversation, appears alongside its turns and tool uses)."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_PATH_STAR_QUERY)


# Zero-or-one path p?: the seed plus its DIRECT successors — the closure
# BFS stopped after one round (max_hops=1, no convergence requirement).
# Twin: a two-branch UNION (seed row, one-hop scan) joined to rdf:type.
KG_SPARQL_PATH_OPT_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX conv: <http://example.org/conv/>
SELECT ?node ?ty
WHERE { conv:c1 c:turn? ?node . ?node a ?ty }
"""

KG_SPARQL_PATH_OPT_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), r AS (
  SELECT 'http://example.org/conv/c1' AS node
  UNION
  SELECT obj_value AS node FROM kt
  WHERE pred = '{_C}turn' AND subj = 'http://example.org/conv/c1'
)
SELECT r.node AS node, t.obj_value AS ty
FROM r
JOIN kt t ON t.subj = r.node
         AND t.pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
"""


def kg_sparql_path_opt(sf_dir: str):
    """SPARQL zero-or-one path ``c:turn?`` from a constant conversation
    seed, joined to each node's rdf:type — the conversation itself plus
    its direct turns, one BFS round, set semantics."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_PATH_OPT_QUERY)


# BIND: per-turn derived weight 2*index+1 (odd weights — first turn
# counts 1, each later turn 2 more), summed per role. Exercises the whole
# BIND path: int-lexical operand read, int64 checked arithmetic, string
# rendering, and a derived column flowing into the SUM aggregate (which
# re-reads it under the same integer-lexical rule). Twin: identical
# BIGINT expression rendered to VARCHAR, re-guarded through the shared
# _int_cast_sql spelling before the HUGEINT sum — byte-identical by
# construction.
KG_SPARQL_BIND_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?role (COUNT(*) AS ?n_turns) (SUM(?w) AS ?w_sum)
WHERE {
  ?t c:role ?role . ?t c:index ?i .
  BIND( 2 * ?i + 1 AS ?w )
}
GROUP BY ?role
"""

KG_SPARQL_BIND_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.obj_value AS role,
         CAST(2 * {_int_cast_sql("t2.obj_value", "BIGINT")} + 1 AS VARCHAR) AS w
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}index'
  WHERE t1.pred = '{_C}role'
)
SELECT role, COUNT(*) AS n_turns,
       CAST(SUM({_int_cast_sql("w")}) AS VARCHAR) AS w_sum
FROM b GROUP BY role
"""


def kg_sparql_bind(sf_dir: str):
    """SPARQL BIND: a derived integer column (``2 * ?i + 1`` over the turn
    index) summed per role — BIND arithmetic is int64-checked on both
    engines (Arrow ``*_checked`` / DuckDB BIGINT), the rendered string
    re-enters SUM under the fragment's integer-lexical semantics."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_BIND_QUERY)


# Expression projection: SELECT (int-expr AS ?alias) — the same checked-
# int64 value-expression grammar as BIND (the parser desugars it to one,
# evaluated after the WHERE clause's own BINDs). Here: each assistant
# turn with a derived rank 3*?idx - 1, plus a second projection reading
# the first's target (?rank + 10) — exercising the declaration-order
# evaluation chain. Twin: identical BIGINT arithmetic rendered to VARCHAR.
KG_SPARQL_EXPR_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?turn (3 * ?idx - 1 AS ?rank) (?rank + 10 AS ?shifted)
WHERE {
  ?turn c:index ?idx . ?turn c:role role:assistant
}
"""

KG_SPARQL_EXPR_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.subj AS turn,
         3 * {_int_cast_sql("t1.obj_value", "BIGINT")} - 1 AS rank_i
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}role'
            AND t2.obj_value = 'http://example.org/role/assistant'
  WHERE t1.pred = '{_C}index'
)
SELECT turn, CAST(rank_i AS VARCHAR) AS rank,
       CAST(rank_i + 10 AS VARCHAR) AS shifted
FROM b
"""


def kg_sparql_expr(sf_dir: str):
    """SPARQL expression projections: ``SELECT (3*?idx-1 AS ?rank)
    (?rank+10 AS ?shifted)`` — desugared to BINDs by the parser; the
    second projection reads the first's target (declaration-order
    evaluation), both rendered as decimal strings on both engines."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_EXPR_QUERY)


# Expression ORDER BY: ASC/DESC over the checked-int64 value-expression
# grammar — the key is evaluated into a hidden column and compared
# NUMERICALLY ('2' before '10'), unlike the plain-variable form's lexical
# order (kg_sparql_order). Non-integer lexicals evaluate to unbound and
# sort last under DESC (the null-safe sort's SPARQL ordering); the twin
# spells the identical guarded BIGINT cast with NULLS LAST plus the
# engine's total-order tie-breakers (?turn, then the remaining projected
# ?idx ASC).
KG_SPARQL_ORDER_EXPR_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?turn ?idx
WHERE {
  ?conv c:turn ?turn . ?turn c:index ?idx . ?turn c:role role:assistant
}
ORDER BY DESC(2 * ?idx) ?turn
LIMIT 20 OFFSET 5
"""

KG_SPARQL_ORDER_EXPR_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.obj_value AS turn, t2.obj_value AS idx
FROM kt t1
JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}index'
JOIN kt t3 ON t3.subj = t1.obj_value AND t3.pred = '{_C}role'
          AND t3.obj_value = 'http://example.org/role/assistant'
WHERE t1.pred = '{_C}turn'
ORDER BY 2 * {_int_cast_sql("t2.obj_value", "BIGINT")} DESC NULLS LAST,
         turn, idx
LIMIT 20 OFFSET 5
"""


def kg_sparql_order_expr(sf_dir: str):
    """SPARQL numeric-expression ORDER BY key: ``ORDER BY DESC(2 * ?idx)``
    — the same LIMIT/OFFSET window shape as kg_sparql_order but ranked by
    the int64 VALUE of the index (lexical '10' outranks '9'), picking a
    provably different window than the lexical form."""
    return sparql_select(
        _kg_triples_quarter(sf_dir), KG_SPARQL_ORDER_EXPR_QUERY
    )


# Numeric var-vs-var FILTER ordering + ABS: within one conversation, pair
# each assistant turn with each STRICTLY LATER tool turn — FILTER(?i1 <
# ?i2) reads BOTH sides numerically under the finite-decimal domain
# (lexical comparison would misorder '10' vs '9'), then ABS derives the
# |i2 - i1 - 3| distance via checked int64. Twin: identical guarded
# double casts in the WHERE, abs() over guarded BIGINT casts rendered to
# VARCHAR, and the engine's total-order tie-breakers spelled out.
KG_SPARQL_NUMCMP_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?t1 ?t2 ?gap
WHERE {
  ?conv c:turn ?t1 . ?conv c:turn ?t2 .
  ?t1 c:index ?i1 . ?t2 c:index ?i2 .
  ?t1 c:role role:assistant . ?t2 c:role role:tool .
  FILTER(?i1 < ?i2)
  BIND(ABS(?i2 - ?i1 - 3) AS ?gap)
}
ORDER BY ?t1 ?t2
LIMIT 40
"""

KG_SPARQL_NUMCMP_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT a1.obj_value AS t1, a2.obj_value AS t2,
       CAST(abs({_int_cast_sql("b2.obj_value", "BIGINT")}
                - {_int_cast_sql("b1.obj_value", "BIGINT")}
                - 3) AS VARCHAR) AS gap
FROM kt a1
JOIN kt a2 ON a2.subj = a1.subj AND a2.pred = '{_C}turn'
JOIN kt b1 ON b1.subj = a1.obj_value AND b1.pred = '{_C}index'
JOIN kt b2 ON b2.subj = a2.obj_value AND b2.pred = '{_C}index'
JOIN kt r1 ON r1.subj = a1.obj_value AND r1.pred = '{_C}role'
          AND r1.obj_value = 'http://example.org/role/assistant'
JOIN kt r2 ON r2.subj = a2.obj_value AND r2.pred = '{_C}role'
          AND r2.obj_value = 'http://example.org/role/tool'
WHERE a1.pred = '{_C}turn'
  AND {_dbl_cast_sql("b1.obj_value")} < {_dbl_cast_sql("b2.obj_value")}
ORDER BY t1, t2, gap
LIMIT 40
"""


def kg_sparql_numcmp(sf_dir: str):
    """SPARQL numeric var-vs-var FILTER (``?i1 < ?i2`` — finite-decimal
    reads on BOTH sides) plus the checked-int64 ``ABS`` value function,
    over a 6-pattern conversation self-join."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_NUMCMP_QUERY)


# STRBEFORE/STRAFTER: extract the conversation id out of each turn IRI
# (".../conv/{cid}/turn/{k}") by nesting the two split accessors, then
# GROUP BY the derived id — exercising first-occurrence split semantics,
# NULL propagation, and a BIND target as the aggregation key. Twin: the
# NULL-guarded strpos/substr CASE spelling (DuckDB's bare CASE ELSE ''
# would swallow NULL inputs; strpos/substr/length are codepoint-based,
# matching Arrow's split — multibyte probe in _bind_eval's docstring).
KG_SPARQL_STRSPLIT_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?cid (COUNT(*) AS ?n)
WHERE {
  ?conv c:turn ?turn .
  BIND(STRBEFORE(STRAFTER(?turn, "org/conv/"), "/turn/") AS ?cid)
}
GROUP BY ?cid
"""

KG_SPARQL_STRSPLIT_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT CASE WHEN obj_value IS NULL THEN NULL
              WHEN strpos(obj_value, 'org/conv/') > 0
              THEN substr(obj_value, strpos(obj_value, 'org/conv/') + 9)
              ELSE '' END AS aft
  FROM kt WHERE pred = '{_C}turn'
)
SELECT CASE WHEN aft IS NULL THEN NULL
            WHEN strpos(aft, '/turn/') > 0
            THEN substr(aft, 1, strpos(aft, '/turn/') - 1)
            ELSE '' END AS cid,
       COUNT(*) AS n
FROM b GROUP BY cid
"""


def kg_sparql_strsplit(sf_dir: str):
    """SPARQL STRBEFORE/STRAFTER nested to parse the conv id out of each
    turn IRI, grouped — the IRI-munging idiom every real SPARQL user
    writes within a week."""
    return sparql_select(
        _kg_triples_quarter(sf_dir), KG_SPARQL_STRSPLIT_QUERY
    )


# String value expressions: REPLACE strips the role-IRI prefix (global RE2
# regex on both engines), SUBSTR takes the first 3 codepoints, UCASE maps
# them, CONCAT splices the turn index in (NULL-propagating — DuckDB ||),
# and STRLEN bridges a string expression back into the checked-int64
# projection grammar. Twin: the same fns under their DuckDB spellings
# (regexp_replace 'g' / substring / upper / || / length — probe-verified
# parity incl. Unicode case edges).
KG_SPARQL_STRFNS_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?turn ?tag (STRLEN(?role) AS ?rl)
WHERE {
  ?turn c:role ?role . ?turn c:index ?idx .
  BIND(REPLACE(?role, "^http://example.org/role/", "") AS ?rname)
  BIND(CONCAT(UCASE(SUBSTR(?rname, 1, 3)), ":", ?idx) AS ?tag)
}
"""

KG_SPARQL_STRFNS_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.subj AS turn, t1.obj_value AS role, t2.obj_value AS idx,
         regexp_replace(t1.obj_value, '^http://example.org/role/', '', 'g')
           AS rname
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.subj AND t2.pred = '{_C}index'
  WHERE t1.pred = '{_C}role'
)
SELECT turn,
       upper(substring(rname, 1, 3)) || ':' || idx AS tag,
       CAST(length(role) AS VARCHAR) AS rl
FROM b
"""


# Conditional value expressions: COALESCE defaults an OPTIONAL-null tool
# to "none" (Arrow coalesce = DuckDB coalesce), IF routes on a numeric
# FILTER-semantics condition (guarded TRY_CAST double compare; error/NULL
# → else — DuckDB CASE WHEN agrees).
KG_SPARQL_COND_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?turn (COALESCE(?tool, "none") AS ?tool2)
       (IF(?idx >= 4, "late", "early") AS ?phase)
WHERE {
  ?turn c:index ?idx .
  OPTIONAL { ?turn c:toolUse ?use . ?use c:tool ?tool }
}
"""

KG_SPARQL_COND_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS turn,
       coalesce(u.tool, 'none') AS tool2,
       CASE WHEN {_dbl_cast_sql("t1.obj_value")} >= 4
            THEN 'late' ELSE 'early' END AS phase
FROM kt t1
LEFT JOIN (
  SELECT t2.subj AS s, t3.obj_value AS tool
  FROM kt t2 JOIN kt t3 ON t3.subj = t2.obj_value AND t3.pred = '{_C}tool'
  WHERE t2.pred = '{_C}toolUse'
) u ON u.s = t1.subj
WHERE t1.pred = '{_C}index'
"""


# Facet ACCESSORS as values + STRLEN as a FILTER operand: per-turn text
# rows pass a codepoint-length gate (Arrow utf8_length = DuckDB length)
# and carry their LANG/DATATYPE ("" / xsd:string for the store's plain
# literals — the accessor default chain, identical CASE/coalesce on the
# twin side).
KG_SPARQL_FACETVAL_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?turn ?text (LANG(?text) AS ?lg) (DATATYPE(?text) AS ?dt)
WHERE { ?turn c:text ?text . FILTER(STRLEN(?text) >= 22) }
"""

KG_SPARQL_FACETVAL_SQL = f"""
SELECT subj AS turn, obj_value AS text,
       CASE WHEN obj_kind = 'literal'
            THEN coalesce(obj_lang, '') END AS lg,
       CASE WHEN obj_kind = 'literal'
            THEN coalesce(
              obj_datatype,
              CASE WHEN obj_lang IS NOT NULL
                THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString'
                ELSE 'http://www.w3.org/2001/XMLSchema#string' END
            ) END AS dt
FROM ( {KG_TRIPLES_SQL} ) AS base
WHERE pred = '{_C}text' AND length(obj_value) >= 22
"""


def kg_sparql_facetval(sf_dir: str):
    """SPARQL facet accessors as values (``LANG``/``DATATYPE`` in BIND /
    projections) plus ``STRLEN`` as a numeric FILTER operand over the
    flagship KG's turn texts."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_FACETVAL_QUERY)


def kg_sparql_cond(sf_dir: str):
    """SPARQL conditional value expressions: ``COALESCE(?tool, "none")``
    defaulting the OPTIONAL-null tool and ``IF(?idx >= 4, ...)`` routing
    on a FILTER-semantics numeric condition — both evaluated as Arrow
    kernels over the binding table, matching DuckDB's coalesce /
    CASE WHEN exactly."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_COND_QUERY)


def kg_sparql_strfns(sf_dir: str):
    """SPARQL string value expressions: ``BIND(REPLACE/SUBSTR/UCASE/
    CONCAT ...)`` deriving a role:index tag per turn plus a
    ``(STRLEN(?role) AS ?rl)`` projection — every string function of the
    fragment in one chain, evaluated by Arrow kernels that are
    probe-verified byte-identical to the DuckDB twin's."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_STRFNS_QUERY)


# UNION joined with required patterns: the union's binding table joins
# onto the required bindings with one more bucketed exchange on the shared
# variables (?turn here — bound by BOTH branches, so no null join keys;
# the executor rejects branch-missing join vars). Every assistant turn's
# index paired with each item the union yields: its tools (branch 1, via
# the bnode hop) and its text (branch 2).
KG_SPARQL_UNION_JOIN_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?turn ?idx ?item
WHERE {
  ?turn c:index ?idx . ?turn c:role role:assistant .
  { ?turn c:toolUse ?u . ?u c:tool ?item } UNION { ?turn c:text ?item }
}
"""

KG_SPARQL_UNION_JOIN_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), u AS (
  SELECT t1.subj AS turn, t2.obj_value AS item
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}tool'
  WHERE t1.pred = '{_C}toolUse'
  UNION ALL
  SELECT subj AS turn, obj_value AS item FROM kt WHERE pred = '{_C}text'
)
SELECT r.subj AS turn, i.obj_value AS idx, u.item AS item
FROM kt r
JOIN kt i ON i.subj = r.subj AND i.pred = '{_C}index'
JOIN u ON u.turn = r.subj
WHERE r.pred = '{_C}role'
  AND r.obj_value = 'http://example.org/role/assistant'
"""


def kg_sparql_union_join(sf_dir: str):
    """SPARQL UNION joined with required patterns: assistant turns' index
    against each union item (tool via the bnode hop, or the turn text) —
    the union's binding table joins the required bindings in one bucketed
    exchange on ?turn, which every branch binds."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_UNION_JOIN_QUERY)


# Subquery: an aggregating { SELECT ... GROUP BY } evaluated as its own
# select pipeline and joined onto the outer bindings by its group key
# (?conv — non-null by construction). COUNT crosses the boundary as a
# decimal string (twin: CAST(COUNT(..) AS VARCHAR)) and the outer FILTER
# re-reads it under the guarded TRY_CAST-to-double semantics.
KG_SPARQL_SUBQUERY_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?conv ?turn ?n_assist
WHERE {
  ?conv c:turn ?turn . ?turn c:role role:assistant .
  { SELECT ?conv (COUNT(?t) AS ?n_assist) WHERE {
      ?conv c:turn ?t . ?t c:role role:assistant } GROUP BY ?conv }
  FILTER(?n_assist >= 4)
}
"""

KG_SPARQL_SUBQUERY_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), sub AS (
  SELECT t1.subj AS conv, CAST(COUNT(t1.obj_value) AS VARCHAR) AS n_assist
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}role'
            AND t2.obj_value = 'http://example.org/role/assistant'
  WHERE t1.pred = '{_C}turn'
  GROUP BY t1.subj
)
SELECT o1.subj AS conv, o1.obj_value AS turn, sub.n_assist AS n_assist
FROM kt o1
JOIN kt o2 ON o2.subj = o1.obj_value AND o2.pred = '{_C}role'
          AND o2.obj_value = 'http://example.org/role/assistant'
JOIN sub ON sub.conv = o1.subj
WHERE o1.pred = '{_C}turn'
  AND {_dbl_cast_sql("sub.n_assist")} >= 4
"""


def kg_sparql_subquery(sf_dir: str):
    """SPARQL subquery over the flagship KG: each assistant turn of the
    conversations with >= 4 assistant turns, carrying the per-conversation
    count — the inner GROUP BY pipeline joins the outer BGP on ?conv."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_SUBQUERY_QUERY)


# Term-facet FILTERs: LANG / DATATYPE / isBlank read the store's term
# METADATA (obj_kind/obj_lang/obj_datatype), which the binding scan copies
# into reserved facet columns (bgp_execute's facet plan). One disjunctive
# filter exercises all three channels: bnode objects (toolUse links),
# lang-tagged text, and xsd:long-typed timestamps. The twin reads the same
# store columns, with SPARQL's defaulting (plain literal -> xsd:string,
# lang-tagged -> rdf:langString) spelled as a COALESCE/CASE.
KG_SPARQL_FACETS_QUERY = """
SELECT ?s ?p ?o
WHERE {
  ?s ?p ?o
  FILTER( isBlank(?o) || LANG(?o) = "en" ||
          DATATYPE(?o) = <http://www.w3.org/2001/XMLSchema#long> )
}
"""

KG_SPARQL_FACETS_SQL = f"""
SELECT subj AS s, pred AS p, obj_value AS o
FROM ( {KG_TRIPLES_SQL} ) AS base
WHERE obj_kind = 'bnode'
   OR (obj_kind = 'literal' AND COALESCE(obj_lang, '') = 'en')
   OR (obj_kind = 'literal' AND COALESCE(obj_datatype,
        CASE WHEN obj_lang IS NOT NULL
             THEN '{_RDF_LANGSTRING}'
             ELSE '{_XSD_STRING}' END)
        = 'http://www.w3.org/2001/XMLSchema#long')
"""


def kg_sparql_facets(sf_dir: str):
    """SPARQL term-facet FILTERs over the flagship KG: every triple whose
    object is a blank node, an English-tagged literal, or an xsd:long —
    isBlank/LANG/DATATYPE evaluated from the scan-carried facet columns."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_FACETS_QUERY)


# Negated property set !(...): every property of an assistant turn EXCEPT
# the bulky text, the role selector itself and rdf:type — i.e. index,
# tsMicros and toolUse links. One scan with a pred NOT IN complement
# filter; the twin spells the identical NOT IN.
KG_SPARQL_NEGSET_QUERY = """
PREFIX c: <http://example.org/convo#>
PREFIX role: <http://example.org/role/>
SELECT ?t ?o
WHERE {
  ?t c:role role:assistant .
  ?t !(c:text|c:role|<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>) ?o
}
"""

KG_SPARQL_NEGSET_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT t1.subj AS t, t2.obj_value AS o
FROM kt t1
JOIN kt t2 ON t2.subj = t1.subj
          AND t2.pred NOT IN ('{_C}text', '{_C}role',
                              'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')
WHERE t1.pred = '{_C}role'
  AND t1.obj_value = 'http://example.org/role/assistant'
"""


def kg_sparql_negset(sf_dir: str):
    """SPARQL negated property set: assistant turns' properties other
    than text/role/rdf:type (their index, timestamp and tool-use links)
    — one complement-filtered scan (``pred NOT IN``) joined to the role
    selector."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_NEGSET_QUERY)


# GROUP_CONCAT: per-conversation sorted distinct tool roster plus the raw
# use count. Concat order is pinned to codepoint sort on BOTH engines
# (the fragment's definition — solution order is nondeterministic under
# distribution), so the strings are byte-identical by construction.
KG_SPARQL_GROUPCONCAT_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?conv (GROUP_CONCAT(DISTINCT ?tool ; SEPARATOR = ",") AS ?tools)
       (COUNT(?tool) AS ?n_uses)
WHERE { ?conv c:turn ?t . ?t c:toolUse ?u . ?u c:tool ?tool }
GROUP BY ?conv
"""

KG_SPARQL_GROUPCONCAT_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
), b AS (
  SELECT t1.subj AS conv, t3.obj_value AS tool
  FROM kt t1
  JOIN kt t2 ON t2.subj = t1.obj_value AND t2.pred = '{_C}toolUse'
  JOIN kt t3 ON t3.subj = t2.obj_value AND t3.pred = '{_C}tool'
  WHERE t1.pred = '{_C}turn'
)
SELECT conv, string_agg(DISTINCT tool, ',' ORDER BY tool) AS tools,
       COUNT(tool) AS n_uses
FROM b GROUP BY conv
"""


def kg_sparql_groupconcat(sf_dir: str):
    """SPARQL GROUP_CONCAT: each conversation's codepoint-sorted distinct
    tool roster (comma-joined) next to its raw tool-use count — the
    mixed-aggregate (GC + COUNT) grouped path, which ships binding rows
    (GROUP_CONCAT cannot merge from per-block partials)."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_GROUPCONCAT_QUERY)


# SAMPLE: one representative turn per conversation next to the turn count.
# SPARQL allows any group element; the fragment pins the codepoint minimum
# (= MIN) so the distributed answer is reproducible — the twin spells MIN.
KG_SPARQL_SAMPLE_QUERY = """
PREFIX c: <http://example.org/convo#>
SELECT ?conv (SAMPLE(?t) AS ?a_turn) (COUNT(?t) AS ?n_turns)
WHERE { ?conv c:turn ?t }
GROUP BY ?conv
"""

KG_SPARQL_SAMPLE_SQL = f"""
WITH kt AS (
  SELECT subj, pred, obj_value FROM ( {KG_TRIPLES_SQL} ) AS base
)
SELECT subj AS conv, MIN(obj_value) AS a_turn, COUNT(obj_value) AS n_turns
FROM kt WHERE pred = '{_C}turn' GROUP BY subj
"""


def kg_sparql_sample(sf_dir: str):
    """SPARQL SAMPLE: a pinned representative turn per conversation (the
    codepoint-minimum — deterministic under distribution) with the turn
    count."""
    return sparql_select(_kg_triples_quarter(sf_dir), KG_SPARQL_SAMPLE_QUERY)

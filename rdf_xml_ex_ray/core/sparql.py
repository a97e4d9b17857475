"""Restricted SPARQL SELECT parser — the query front-end for the BGP engine.

The reference's wider ecosystem queries RDF.Graph values through a SPARQL
engine (rdf-elixir ships SPARQL.ex alongside rdf-xml-ex); this module gives
the distributed engine the matching entry point for the fragment the BGP
executor evaluates:

    PREFIX pfx: <ns> ...
    SELECT [DISTINCT] ?v1 ?v2 | * | ?g1 ... (AGG(*|[DISTINCT] ?v) AS ?alias) ...
         | ?v1 ... (value-expr AS ?alias) ...  # expression projection
                                               # (desugared to BIND)
    WHERE {
        s path o . ...              # path steps: p, ^p, (p1|p2); join by /
        FILTER ( expr ) ...
        FILTER [NOT] EXISTS { s path o . ... } ...  # semi/anti-join
        BIND ( value-expr AS ?v ) ...       # int arithmetic / string fns
        OPTIONAL { s path o . ... } ...
        MINUS { s path o . ... } ...        # anti-join on shared vars
        GRAPH (?g | iri) { s path o . ... } ...
        { s path o . ... } UNION { ... } [UNION { ... }]  # standalone or
                                            # joined with other patterns
        { SELECT ... }                      # one-level subquery
    }
    [GROUP BY ?g1 ...]
    [HAVING ( expr ) ...]                   # over group keys / agg aliases
    [ORDER BY (?v | ASC/DESC( ?v | int-expr )) ...]   # expr keys sort
                                                      # NUMERICALLY
    [LIMIT n] [OFFSET n]

Terms: ``?var``, ``<iri>``, ``pfx:local``, ``a`` (rdf:type), plain
``"literal"`` constants (matched against the object VALUE column,
kind-agnostic — the same convention as pipelines/bgp._scan and its SQL
twins) and signed numeric literals. FILTER expressions support ``&&``,
``||``, parentheses, ``BOUND(?v)`` / ``!BOUND(?v)``, the string
predicates ``REGEX(?v, "pat"[, "i"])`` / ``STRSTARTS(?v, "s")`` /
``STRENDS`` / ``CONTAINS`` (RE2 regex syntax on BOTH engines; null →
False; negatable with ``!`` under not-null-AND-not semantics),
the term-facet forms ``isIRI(?v)`` / ``isBlank(?v)`` / ``isLiteral(?v)``
(negatable) ``langMatches(LANG(?v), "range")`` (RFC 4647 basic filtering,
case-insensitive, ``"*"`` = any non-empty tag; negatable),
and ``LANG(?v)`` / ``DATATYPE(?v)`` compared ``=``/``!=``
against a constant (LANG of a plain literal is ``""``; DATATYPE defaults
to xsd:string / rdf:langString; both error→drop on non-literals; facets
need the variable bound by a required pattern in object position — or
subject position for the kind tests),
``?v [NOT] IN (c1, c2, ...)`` membership, and the comparisons
``= != < <= > >=`` whose operands may also be ``STRLEN(str-expr)``
(numeric-valued; codepoint count); ordering comparisons (``< <= > >=``)
require one NUMERIC operand — they evaluate under SQL
TRY_CAST-to-double semantics
(an unparseable or unbound value fails the comparison) — EXCEPT the
var-vs-var form, which is numeric on BOTH sides by fragment convention
(string collation stays out of fragment) — while ``=``/``!=``
against a string/IRI constant or another variable compare exact strings.
String ORDER BY and MIN/MAX use byte/codepoint order (identical on both
engines: UTF-8 byte order = codepoint order). SUM/AVG aggregate INTEGER
lexical forms exactly (core/numeric.py semantics — non-integer forms are
unbound/NULL; SUM is the exact integer as a string, AVG = strtod(SUM) /
COUNT). ``BIND`` value expressions come in two typed flavors, dispatched
on the first token (see ``_value_expr``): INTEGER arithmetic (``+ - *``,
parentheses, ``ABS(int-expr)``, ``STRLEN(str-expr)``) over bound
variables and integer
constants — operands read under the same integer-lexical rule
(non-integer form -> unbound/NULL, which propagates), int64 arithmetic
with overflow a loud error on BOTH engines (Arrow checked kernels /
DuckDB BIGINT), result rendered as its decimal string — and STRING
expressions ``UCASE`` / ``LCASE`` / ``CONCAT`` / ``SUBSTR`` (1-based
codepoints, positive-constant start/len) / ``REPLACE`` (global, RE2 on
both engines) / ``STRBEFORE`` / ``STRAFTER`` (first occurrence of a
non-empty constant separator; absent → ``""``) / ``STR`` (identity on
the stored value string) over
variables and string constants, NULL-propagating (an unbound operand →
unbound target, SPARQL's error semantics and DuckDB's ``||``/function
convention alike), plus ``COALESCE(e1, e2, ...)`` (first non-NULL — the
OPTIONAL-default idiom), ``IF(cond, then, else)`` whose condition is a
FILTER expression under FILTER semantics (error/unbound → False → else;
term-facet forms inside it are out of fragment), and the facet
accessors ``LANG(?v)`` / ``DATATYPE(?v)`` as string VALUES ("" /
default-datatype for literals, unbound on non-literals; ?v must be
bound by a required pattern). A BIND evaluates after its group's patterns join, so
the target must be fresh and every referenced variable pattern-bound (or
an earlier BIND target). Property paths cover sequence ``p1/p2``,
inverse ``^p``, parenthesized alternation ``(p1|p2)`` as a step
(desugared to fresh-variable patterns; an alternation step scans with a
predicate-set filter) and seed-anchored transitive closure ``p+`` /
``p*`` (one constant endpoint; distributed BFS). Subqueries nest one
level (``{ SELECT ... }`` in WHERE, joined on its projected variables);
deeper nesting and the rest of SPARQL stay out of scope — the parser
rejects anything outside the fragment loudly rather than guessing.
"""

from __future__ import annotations

import re

from typing import NamedTuple, Union

from .terms import ParseError

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class PathPlus(NamedTuple):
    """Predicate marker for a closure path step: ``p+`` / ``(p1|p2)+``
    (one-or-more), with ``zero=True`` the ``p*`` zero-or-more variant
    (the constant seed term itself joins the result set — SPARQL's
    zero-length path matches any term, in the graph or not), and with
    ``max_hops=1`` (+ ``zero=True``) the ``p?`` zero-or-one variant —
    the same BFS stopped after one round, no convergence requirement.

    The BGP executor evaluates a pattern carrying this as a seed-anchored
    transitive closure (distributed BFS over the p-edge scan) — the
    pattern therefore needs one CONSTANT endpoint; ``?x p+ ?y`` (the full
    closure relation, quadratic in the worst case) is rejected as out of
    fragment (whole-graph analytics live in kg_reachability/kg_pagerank).
    """

    pred: Union[str, tuple]
    zero: bool = False
    max_hops: int = 0  # 0 = unbounded (convergence enforced)


class NegSet(NamedTuple):
    """Predicate marker for a negated property set ``!p`` / ``!(p1|p2)``:
    matches any triple whose predicate is NOT in ``preds`` (forward
    members only — ``^`` inside the set is out of fragment; inverting the
    whole step, ``^!p``, is supported since direction is the caller's
    desugar). The scan filters ``pred NOT IN (...)``; SQL twins spell the
    same. Closure over a negated set (``!p+``) stays out of fragment."""

    preds: tuple

_KEYWORDS = (
    "PREFIX|SELECT|DISTINCT|WHERE|LIMIT|OFFSET|FILTER|OPTIONAL|ORDER|BY|"
    "ASC|DESC|BOUND|UNION|GRAPH|COUNT|MIN|MAX|SUM|AVG|AS|GROUP|HAVING|MINUS|"
    "ASK|CONSTRUCT|DESCRIBE|VALUES|UNDEF|REGEX|STRSTARTS|STRENDS|CONTAINS|"
    "IN|NOT|EXISTS|BIND|GROUP_CONCAT|SEPARATOR|SAMPLE|LANGMATCHES|LANG|"
    "DATATYPE|"
    "ISIRI|ISBLANK|ISLITERAL|STRBEFORE|STRAFTER|STRLEN|STR|UCASE|LCASE|"
    "CONCAT|SUBSTR|REPLACE|"
    "COALESCE|IF|INSERT|DELETE|DATA|ABS"
)

_STRING_FNS = ("REGEX", "STRSTARTS", "STRENDS", "CONTAINS")

# string-VALUED functions usable in BIND / expression projections (STRLEN
# is integer-valued and lives in the numeric grammar instead; COALESCE and
# IF are string-typed in this fragment — their operands are string
# expressions, which covers variables of any provenance since the binding
# table stores lexical forms)
_STR_VALUE_FNS = (
    "STR", "UCASE", "LCASE", "CONCAT", "SUBSTR", "REPLACE", "COALESCE", "IF",
    "STRBEFORE", "STRAFTER",
)

_AGG_FNS = ("COUNT", "MIN", "MAX", "SUM", "AVG", "GROUP_CONCAT", "SAMPLE")

# term-kind test functions -> the stored kind value they assert
_KIND_FNS = {"ISIRI": "iri", "ISBLANK": "bnode", "ISLITERAL": "literal"}

# NB: regex alternation is first-match — the full pname (with local part)
# must precede the bare namespace form so "ex:s" lexes as one token while
# "ex:" (in a PREFIX decl) still lexes as pname_ns; multi-char operators
# precede their single-char prefixes (<= before <, && before unlexable &).
_TOKEN_RE = re.compile(
    r"""
      (?P<kw>(?:""" + _KEYWORDS + r""")\b)
    | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
    # PN_LOCAL must not END with '.', or 'ex:o.' (statement dot, no space)
    # would lex the terminator into the IRI (SPARQL/Turtle PN_LOCAL rule).
    | (?P<pname>[A-Za-z][\w\-]*:[A-Za-z0-9_](?:[\w\-.]*[\w\-])?)
    | (?P<pname_ns>[A-Za-z][\w\-]*:)
    | (?P<a_kw>a(?![\w:]))
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<number>[+-]?\d+(?:\.\d+)?)
    | (?P<star>\*)
    | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<op>&&|\|\||!=|<=|>=|=|<|>|!|/|\^\^|\^|\||\+|-|\?)
    | (?P<punct>[{}.;(),])
    """,
    re.X | re.I,
)
_WS_RE = re.compile(r"(?:\s+|\#[^\n]*)+")

# SPARQL ECHAR: \t \b \n \r \f \" \' \\ — decoded to the CONTROL character,
# never the letter; unknown escapes are a loud error (reject, don't guess).
_ECHAR = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_ESC_RE = re.compile(r"\\(.)")


def _unescape_literal(body: str) -> str:
    def sub(m: re.Match) -> str:
        c = m.group(1)
        try:
            return _ECHAR[c]
        except KeyError:
            raise ParseError(f"unknown literal escape \\{c!r} in SPARQL string")

    return _ESC_RE.sub(sub, body)


def _reject_facets(expr, where: str):
    """Reject term-facet FILTER forms (isIRI/isBlank/isLiteral, LANG,
    DATATYPE) inside ``where`` — they read scan-carried facet columns the
    surrounding construct doesn't plan for."""
    head = expr[0]
    if head in (
        "kindis", "not_kindis", "facet_cmp", "langmatches", "not_langmatches"
    ):
        raise ParseError(f"term-facet forms inside {where} are out of fragment")
    if head in ("or", "and"):
        for e in expr[1]:
            _reject_facets(e, where)
    elif head == "not":
        _reject_facets(expr[1], where)


def _tokenize(text: str):
    pos, n = 0, len(text)
    out = []
    while pos < n:
        m = _WS_RE.match(text, pos)
        if m:
            pos = m.end()
            if pos >= n:
                break
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"unlexable SPARQL at offset {pos}: {text[pos:pos+30]!r}")
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "kw":
            kind = val.upper()
        out.append((kind, val))
        pos = m.end()
    return out


# ------------------------------------------------------- FILTER expressions
#
# AST (plain tuples, consumed by pipelines/bgp._filter_mask):
#   ("or",  [expr, ...])           ("and", [expr, ...])
#   ("not", expr)                  ("bound", varname)
#   ("cmp", op, operand, operand)  op in {=, !=, <, <=, >, >=}
#   ("ncmp", op, operand, operand) var-vs-var ordering: BOTH sides read
#                                  numerically (finite-decimal domain)
# operands: ("var", name) | ("num", float) | ("str", s) — IRI/pname/literal
# constants all become ("str", resolved-string), matching the bgp engine's
# kind-agnostic string-identity convention. Term-facet forms:
#   ("kindis", var, kind)     isIRI/isBlank/isLiteral; kind in {iri,bnode,literal}
#   ("not_kindis", kindis)    bound AND kind-differs
#   ("facet_cmp", op, ("lang"|"dt", var), ("str", const))  op in {=, !=}
# evaluated from scan-carried facet columns (pipelines/bgp facet plan).


class _SelectParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self._path_n = 0  # fresh-variable counter for property-path desugar
        self._sub_depth = 0  # subquery nesting level (max 1)

    def _peek(self, ahead: int = 0):
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else (None, None)

    def _next(self):
        if self.i >= len(self.toks):
            raise ParseError("unexpected end of SPARQL query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, kind, val=None):
        k, v = self._next()
        if k != kind or (val is not None and v != val):
            raise ParseError(f"expected {val or kind}, got {v!r}")
        return v

    def _resolve_const(self, k, v) -> str:
        if k == "iriref":
            return v[1:-1]
        if k == "pname":
            pfx, _, local = v.partition(":")
            ns = self.prefixes.get(pfx)
            if ns is None:
                raise ParseError(f"undeclared prefix {pfx!r}")
            return ns + local
        if k == "a_kw":
            return RDF_TYPE
        if k == "literal":
            return _unescape_literal(v[1:-1])
        raise ParseError(f"bad SPARQL term: {v!r}")

    def _term(self) -> str:
        """→ the BGP executor's term syntax: '?var' or a raw constant
        string (numbers keep their literal spelling — the store holds
        lexical forms)."""
        k, v = self._next()
        if k == "var":
            return v
        if k == "number":
            return v
        return self._resolve_const(k, v)

    # -------------------------------------------------- FILTER expr parser

    def _expr(self):
        parts = [self._and_expr()]
        while self._peek() == ("op", "||"):
            self._next()
            parts.append(self._and_expr())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _and_expr(self):
        parts = [self._unary_expr()]
        while self._peek() == ("op", "&&"):
            self._next()
            parts.append(self._unary_expr())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _unary_expr(self):
        if self._peek() == ("op", "!"):
            self._next()
            # '!' before BOUND (2-valued, plain negation) or before a
            # string function — the latter under explicit not-null
            # semantics (mask = BOUND(?v) && !fn(?v)), which is exactly
            # SQL's `v IS NOT NULL AND NOT fn(v)` / SPARQL's
            # error-on-unbound -> row dropped. Negating a comparison would
            # need SQL's general 3-valued NOT — still out of fragment.
            nxt = self._peek()[0]
            if nxt == "BOUND":
                return ("not", self._unary_expr())
            if nxt in _STRING_FNS:
                return ("not_sfn", self._string_fn())
            if nxt in _KIND_FNS:
                # !isIRI(?v) etc: bound AND kind-differs (error-on-unbound
                # -> row dropped; SQL `kind IS NOT NULL AND kind <> k`)
                return ("not_kindis", self._kind_fn())
            if nxt == "LANGMATCHES":
                # !langMatches: literal AND range-mismatch (errors on
                # non-literals drop the row on both engines)
                return ("not_langmatches", self._langmatches())
            raise ParseError(
                "'!' is only supported before BOUND(...), a string function "
                "(REGEX/STRSTARTS/STRENDS/CONTAINS), a term-kind test "
                "(isIRI/isBlank/isLiteral) or langMatches(...)"
            )
        if self._peek()[0] in _KIND_FNS:
            return self._kind_fn()
        if self._peek()[0] == "LANGMATCHES":
            return self._langmatches()
        if self._peek()[0] == "BOUND":
            self._next()
            self._expect("punct", "(")
            var = self._expect("var")[1:]
            self._expect("punct", ")")
            return ("bound", var)
        if self._peek()[0] in _STRING_FNS:
            return self._string_fn()
        if self._peek() == ("punct", "("):
            self._next()
            inner = self._expr()
            self._expect("punct", ")")
            return inner
        return self._comparison()

    def _langmatches(self):
        """``langMatches(LANG(?v), "range")`` — RFC 4647 basic filtering
        over the variable's scan-carried lang facet: case-insensitive
        exact tag or subtag-prefix match; ``"*"`` matches any non-empty
        tag. A plain literal's LANG is ``""`` (matches nothing, not even
        ``"*"``); non-literals error → row dropped. The first argument
        must be exactly ``LANG(?var)`` (the only tag source the binding
        table carries)."""
        self._next()
        self._expect("punct", "(")
        self._expect("LANG")
        self._expect("punct", "(")
        var = self._expect("var")[1:]
        self._expect("punct", ")")
        self._expect("punct", ",")
        k2, v2 = self._next()
        if k2 != "literal":
            raise ParseError(
                "langMatches range must be a string literal"
            )
        rng = _unescape_literal(v2[1:-1])
        if not rng:
            raise ParseError("empty langMatches range")
        self._expect("punct", ")")
        return ("langmatches", var, rng)

    def _kind_fn(self):
        """``isIRI(?v)`` / ``isBlank(?v)`` / ``isLiteral(?v)`` — term-kind
        tests over one variable. The executor reads the kind facet column
        the variable's binding scan carries (subj_kind / obj_kind); an
        unbound (OPTIONAL-padded) variable fails the test, matching SQL's
        null comparison under the keep-iff-true sink."""
        fk, _ = self._next()
        self._expect("punct", "(")
        var = self._expect("var")[1:]
        self._expect("punct", ")")
        return ("kindis", var, _KIND_FNS[fk])

    def _string_fn(self):
        """``REGEX(?v, "pat"[, "i"])`` / ``STRSTARTS(?v, "s")`` /
        ``STRENDS(?v, "s")`` / ``CONTAINS(?v, "s")`` — vectorized string
        predicates over one bound variable; null -> False on both engines
        (Arrow kernels and DuckDB's functions propagate null, and the only
        sink is "keep row iff true"). REGEX is RE2 syntax on BOTH engines
        (pyarrow and DuckDB embed RE2), flags limited to "i"."""
        fk, _ = self._next()
        self._expect("punct", "(")
        var = self._expect("var")[1:]
        self._expect("punct", ",")
        k, v = self._next()
        if k != "literal":
            raise ParseError(f"{fk} needs a plain string-literal argument")
        arg = _unescape_literal(v[1:-1])
        ci = False
        if self._peek() == ("punct", ","):
            if fk != "REGEX":
                raise ParseError(f"{fk} takes exactly two arguments")
            self._next()
            k2, v2 = self._next()
            if k2 != "literal" or _unescape_literal(v2[1:-1]) != "i":
                raise ParseError('REGEX flags support only "i"')
            ci = True
        self._expect("punct", ")")
        if fk == "REGEX":
            # reject patterns RE2 itself won't take, at parse time
            try:
                re.compile(arg)
            except re.error as exc:
                raise ParseError(f"bad REGEX pattern {arg!r}: {exc}")
        return ("sfn", fk, var, arg, ci)

    def _operand(self):
        k, v = self._peek()
        if k == "var":
            self._next()
            return ("var", v[1:])
        if k == "STRLEN":
            # STRLEN(str-expr) as a NUMERIC comparison operand (codepoint
            # count; Arrow utf8_length = DuckDB length(); an unbound /
            # null operand fails the comparison like any numeric read)
            self._next()
            self._expect("punct", "(")
            sub = self._str_expr()
            self._expect("punct", ")")
            return ("slen", sub)
        if k in ("LANG", "DATATYPE"):
            # LANG(?v) / DATATYPE(?v) — facet accessors, only usable on
            # the LEFT of an =/!= against a constant (checked in
            # _comparison). LANG of a plain literal is "" (SPARQL);
            # DATATYPE of a plain literal is xsd:string, of a lang-tagged
            # one rdf:langString; both ERROR (row dropped) on non-literals.
            self._next()
            self._expect("punct", "(")
            var = self._expect("var")[1:]
            self._expect("punct", ")")
            return ("lang" if k == "LANG" else "dt", var)
        if k == "number":
            self._next()
            return ("num", float(v))
        if k in ("iriref", "pname", "literal", "a_kw"):
            self._next()
            return ("str", self._resolve_const(k, v))
        raise ParseError(f"bad FILTER operand: {v!r}")

    def _in_list(self) -> list[str]:
        self._expect("punct", "(")
        consts: list[str] = []
        while True:
            k, v = self._next()
            if k == "number":
                consts.append(v)  # the store holds lexical forms
            elif k in ("iriref", "pname", "literal", "a_kw"):
                consts.append(self._resolve_const(k, v))
            else:
                raise ParseError(f"bad IN-list member: {v!r}")
            if self._peek() == ("punct", ","):
                self._next()
                continue
            self._expect("punct", ")")
            return consts

    def _comparison(self):
        lhs = self._operand()
        # ?v IN (c, ...) — same membership mask as single-var VALUES;
        # ?v NOT IN (c, ...) — not-null AND not-member, matching SQL's
        # 3-valued NOT IN under the keep-iff-true sink.
        if self._peek()[0] in ("IN", "NOT"):
            neg = self._peek()[0] == "NOT"
            self._next()
            if neg:
                self._expect("IN")
            if lhs[0] != "var":
                raise ParseError("IN needs a variable on its left side")
            consts = self._in_list()
            return ("not_in" if neg else "in", lhs[1], consts)
        k, op = self._next()
        if k != "op" or op not in ("=", "!=", "<", "<=", ">", ">="):
            raise ParseError(f"expected comparison operator in FILTER, got {op!r}")
        rhs = self._operand()
        if lhs[0] in ("lang", "dt") or rhs[0] in ("lang", "dt"):
            fname = "LANG" if "lang" in (lhs[0], rhs[0]) else "DATATYPE"
            if lhs[0] not in ("lang", "dt") or rhs[0] != "str":
                raise ParseError(
                    f"{fname}(?v) comparisons need the facet on the left and "
                    "a constant on the right"
                )
            if op not in ("=", "!="):
                raise ParseError(f"{fname}(?v) supports only = / != comparisons")
            return ("facet_cmp", op, lhs, rhs)
        if (
            op in ("<", "<=", ">", ">=")
            and lhs[0] not in ("num", "slen")
            and rhs[0] not in ("num", "slen")
        ):
            if lhs[0] == "var" and rhs[0] == "var":
                # var-vs-var ordering is NUMERIC by fragment convention:
                # both sides read under the finite-decimal domain
                # (core/numeric.DBL_LEX_SQL_RE guarded cast — exactly the
                # var-vs-constant numeric semantics); a non-numeric or
                # unbound lexical on either side fails the comparison.
                # String collation stays out of fragment.
                return ("ncmp", op, lhs, rhs)
            raise ParseError(
                f"ordering comparison {op!r} needs one numeric operand "
                "(string collation is engine-defined; out of fragment)"
            )
        if lhs[0] not in ("var", "slen") and rhs[0] not in ("var", "slen"):
            raise ParseError("FILTER comparison must reference a variable")
        return ("cmp", op, lhs, rhs)

    # ------------------------------------------------- BIND value exprs
    #
    # AST (consumed by pipelines/bgp._bind_eval):
    #   ("bnum", int)  ("bvar", name)  ("bop", op, lhs, rhs)  op in {+,-,*}
    # Integer value expressions ONLY — operands are read under the
    # fragment's integer-lexical semantics (core/numeric: non-integer
    # forms are unbound/NULL, which propagates), arithmetic is int64 with
    # overflow a LOUD error on both engines (Arrow checked kernels /
    # DuckDB BIGINT), and the result re-enters the binding table as its
    # decimal string. Division stays out of fragment (integer-vs-float
    # semantics diverge between engines).

    def _bind_clause(self):
        """``BIND ( value-expr AS ?v )`` → (varname, expr AST)."""
        self._expect("punct", "(")
        expr = self._value_expr()
        self._expect("AS")
        var = self._expect("var")[1:]
        self._expect("punct", ")")
        return (var, expr)

    def _value_expr(self):
        """A BIND / expression-projection value expression — either the
        integer grammar (``_num_expr``, which includes ``STRLEN``) or a
        string expression (``_str_expr``), dispatched on the first token:
        a string-valued function keyword or a string literal starts a
        string expression; anything else (vars, numbers, ``(``, STRLEN)
        stays in the numeric grammar, so ``BIND(?x AS ?y)`` keeps its
        established integer-lexical semantics."""
        k, _v = self._peek()
        if k in _STR_VALUE_FNS or k in ("LANG", "DATATYPE") or k == "literal":
            return self._str_expr()
        return self._num_expr()

    def _str_expr(self):
        """String-valued expression AST (consumed by pipelines/bgp
        ``_bind_eval``):

            ("sstr", const)                  string constant
            ("svar", name)                   a variable's stored VALUE
                                             string (kind-agnostic — the
                                             binding-table convention)
            ("sfn", "UCASE"|"LCASE", sub)    Unicode case mapping (Arrow
                                             utf8_upper/lower = DuckDB
                                             upper/lower, probe-verified
                                             incl. ß/İ/ǳ/final sigma)
            ("sfn", "CONCAT", (sub, ...))    concatenation; any NULL
                                             operand → NULL (DuckDB ``||``)
            ("sfn", "SUBSTR", sub, start, len|None)
                                             1-based CODEPOINT slice;
                                             start/len are positive /
                                             non-negative int constants
                                             (expressions and the 0/negative
                                             edge semantics are out of
                                             fragment — they diverge between
                                             engines)
            ("sfn", "REPLACE", sub, pat, rep)
                                             global regex replace, RE2
                                             syntax on BOTH engines (Arrow
                                             replace_substring_regex /
                                             DuckDB regexp_replace 'g')
            ("sfn", "STRBEFORE"|"STRAFTER", sub, sep)
                                             substring before/after the
                                             FIRST occurrence of the
                                             non-empty constant separator;
                                             absent -> "", NULL propagates

        ``STR(x)`` is the identity on the stored value string (the table
        already holds lexical forms / IRI strings) — it parses and returns
        its argument's AST."""
        k, v = self._next()
        if k == "literal":
            return ("sstr", _unescape_literal(v[1:-1]))
        if k == "var":
            return ("svar", v[1:])
        if k == "STR":
            self._expect("punct", "(")
            sub = self._str_expr()
            self._expect("punct", ")")
            return sub
        if k in ("UCASE", "LCASE"):
            self._expect("punct", "(")
            sub = self._str_expr()
            self._expect("punct", ")")
            return ("sfn", k, sub)
        if k == "CONCAT":
            self._expect("punct", "(")
            args = [self._str_expr()]
            while self._peek() == ("punct", ","):
                self._next()
                args.append(self._str_expr())
            self._expect("punct", ")")
            if len(args) < 2:
                raise ParseError("CONCAT needs at least 2 arguments")
            return ("sfn", "CONCAT", tuple(args))
        if k == "SUBSTR":
            self._expect("punct", "(")
            sub = self._str_expr()
            self._expect("punct", ",")
            start = self._int_const("SUBSTR start")
            if start < 1:
                raise ParseError(
                    "SUBSTR start must be >= 1 (SPARQL is 1-based; the "
                    "0/negative edge semantics diverge between engines)"
                )
            length = None
            if self._peek() == ("punct", ","):
                self._next()
                length = self._int_const("SUBSTR length")
                if length < 0:
                    raise ParseError("SUBSTR length must be >= 0")
            self._expect("punct", ")")
            return ("sfn", "SUBSTR", sub, start, length)
        if k in ("STRBEFORE", "STRAFTER"):
            # the substring before/after the FIRST occurrence of a
            # constant separator; no occurrence -> "" and a NULL (unbound)
            # input propagates — SPARQL's xpath:substring-before/after
            # semantics on simple literals. The separator is a non-empty
            # string constant (SPARQL's empty-separator edge returns
            # ""/arg1 — constant-foldable but engine-divergent on the
            # NULL path; out of fragment, rejected loudly).
            self._expect("punct", "(")
            sub = self._str_expr()
            self._expect("punct", ",")
            k2, v2 = self._next()
            if k2 != "literal":
                raise ParseError(f"{k} separator must be a string literal")
            sep = _unescape_literal(v2[1:-1])
            if not sep:
                raise ParseError(
                    f"{k} with an empty separator is out of fragment"
                )
            self._expect("punct", ")")
            return ("sfn", k, sub, sep)
        if k == "REPLACE":
            self._expect("punct", "(")
            sub = self._str_expr()
            self._expect("punct", ",")
            kp, vp = self._next()
            if kp != "literal":
                raise ParseError("REPLACE pattern must be a string literal")
            self._expect("punct", ",")
            kr, vr = self._next()
            if kr != "literal":
                raise ParseError("REPLACE replacement must be a string literal")
            self._expect("punct", ")")
            return (
                "sfn",
                "REPLACE",
                sub,
                _unescape_literal(vp[1:-1]),
                _unescape_literal(vr[1:-1]),
            )
        if k in ("LANG", "DATATYPE"):
            # facet ACCESSORS as string values: LANG(?v) is "" for a plain
            # literal, the tag otherwise; DATATYPE(?v) defaults to
            # xsd:string / rdf:langString; both are NULL (error → unbound)
            # on non-literals. The executor reads the variable's
            # scan-carried facet columns — ?v must be bound by a required
            # pattern (the facet plan rejects otherwise).
            self._expect("punct", "(")
            var = self._expect("var")[1:]
            self._expect("punct", ")")
            return ("sfacet", "lang" if k == "LANG" else "dt", var)
        if k == "COALESCE":
            # first non-NULL operand (DuckDB coalesce / Arrow pc.coalesce
            # agree) — the idiomatic default for an OPTIONAL-null variable
            self._expect("punct", "(")
            args = [self._str_expr()]
            while self._peek() == ("punct", ","):
                self._next()
                args.append(self._str_expr())
            self._expect("punct", ")")
            if len(args) < 2:
                raise ParseError("COALESCE needs at least 2 arguments")
            return ("scoal", tuple(args))
        if k == "IF":
            # IF(cond, then, else): cond is a FILTER expression evaluated
            # under the same semantics as FILTER itself (error/unbound →
            # False → else branch; DuckDB CASE WHEN's NULL → ELSE agrees).
            # Term-facet forms (LANG/DATATYPE/isIRI/...) inside the
            # condition would need facet columns the bind stage doesn't
            # carry — out of fragment, rejected below.
            self._expect("punct", "(")
            cond = self._expr()
            _reject_facets(cond, "IF(...) conditions")
            self._expect("punct", ",")
            then = self._str_expr()
            self._expect("punct", ",")
            other = self._str_expr()
            self._expect("punct", ")")
            return ("sif", cond, then, other)
        raise ParseError(f"bad string-expression operand: {v!r}")

    def _int_const(self, what: str) -> int:
        k, v = self._next()
        if k != "number" or not re.fullmatch(r"[+-]?\d{1,18}", v):
            raise ParseError(f"{what} must be an integer constant, got {v!r}")
        return int(v)

    def _num_expr(self):
        node = self._num_term()
        while True:
            k, v = self._peek()
            if k == "op" and v in ("+", "-"):
                self._next()
                node = ("bop", v, node, self._num_term())
            elif k == "number" and v[:1] in ("+", "-"):
                # '?i -3' lexes the sign into the number token (the number
                # group precedes op in _TOKEN_RE); fold it back into an
                # addition of the signed constant
                node = ("bop", "+", node, self._num_prim())
            else:
                return node

    def _num_term(self):
        node = self._num_prim()
        while self._peek()[0] == "star":
            self._next()
            node = ("bop", "*", node, self._num_prim())
        return node

    def _num_prim(self):
        k, v = self._next()
        if k == "STRLEN":
            # integer-valued string accessor: codepoint count (Arrow
            # utf8_length = DuckDB length(); NULL propagates) — composes
            # with the int64-checked arithmetic like any operand
            self._expect("punct", "(")
            sub = self._str_expr()
            self._expect("punct", ")")
            return ("blen", sub)
        if k == "ABS":
            # absolute value — int64-checked on both engines (Arrow
            # abs_checked / DuckDB abs on BIGINT both raise on the
            # INT64_MIN edge); NULL propagates like any operand
            self._expect("punct", "(")
            sub = self._num_expr()
            self._expect("punct", ")")
            return ("babs", sub)
        if k == "var":
            return ("bvar", v[1:])
        if k == "number":
            if not re.fullmatch(r"[+-]?\d{1,18}", v):
                raise ParseError(
                    "BIND numeric constants must be integer lexical forms "
                    f"(<= 18 digits); got {v!r}"
                )
            return ("bnum", int(v))
        if (k, v) == ("punct", "("):
            node = self._num_expr()
            self._expect("punct", ")")
            return node
        raise ParseError(f"bad BIND operand: {v!r}")

    # ------------------------------------------------------- group parser

    def _path_elt(self):
        """One property-path step: ``iri``, ``^iri`` (inverse), a
        parenthesized alternation ``(p1|p2|...)`` of plain IRIs —
        optionally inverted as a whole, ``^(p1|p2)`` — or a negated
        property set ``!iri`` / ``!(p1|p2)`` (``^!p`` inverts the step).
        Returns (inverse, iri | tuple | NegSet); an alternation step scans
        with a predicate-set filter (SQL ``pred IN (...)``), a negated set
        with its complement (``pred NOT IN (...)``) — still one scan.
        Mixing ``^`` INSIDE a set would need per-branch direction in a
        single scan — out of fragment, rejected."""
        inverse = False
        if self._peek() == ("op", "^"):
            self._next()
            inverse = True
        neg = False
        if self._peek() == ("op", "!"):
            self._next()
            neg = True
        if self._peek() == ("punct", "("):
            self._next()
            alts = []
            while True:
                k, v = self._peek()
                if k == "op" and v == "^":
                    raise ParseError(
                        "'^' inside a path alternation / negated set is out "
                        "of fragment; invert the whole group: ^(p1|p2)"
                    )
                if k not in ("iriref", "pname", "a_kw"):
                    raise ParseError(
                        f"path-alternation branch must be an IRI, got {v!r}"
                    )
                self._next()
                alts.append(self._resolve_const(k, v))
                if self._peek() == ("op", "|"):
                    self._next()
                    continue
                self._expect("punct", ")")
                break
            base: Union[str, tuple, NegSet] = (
                alts[0] if len(alts) == 1 else tuple(dict.fromkeys(alts))
            )
        else:
            k, v = self._peek()
            if k not in ("iriref", "pname", "a_kw"):
                raise ParseError(f"property-path step must be an IRI, got {v!r}")
            self._next()
            base = self._resolve_const(k, v)
        if neg:
            base = NegSet(base if isinstance(base, tuple) else (base,))
        return inverse, self._maybe_plus(base)

    def _maybe_plus(self, pred):
        """Consume a trailing ``+`` (one-or-more closure), ``*``
        (zero-or-more: reachable set plus the constant seed itself) or
        ``?`` (zero-or-one: the seed plus its direct successors) on a
        path step. All need one constant endpoint — enforced by the
        executor, which rejects ``?x p+/*/? ?y``."""
        nxt = self._peek()
        if nxt in (("op", "+"), ("star", "*"), ("op", "?")):
            if isinstance(pred, NegSet):
                raise ParseError(
                    "closure over a negated property set is out of fragment"
                )
            self._next()
            if nxt == ("op", "?"):
                return PathPlus(pred, zero=True, max_hops=1)
            return PathPlus(pred, zero=nxt == ("star", "*"))
        return pred

    def _predicate(self):
        """Predicate position: a plain ``?var``, or a property path of
        steps joined by ``/`` — each step an IRI, ``^``-inverse,
        parenthesized alternation, negated set or ``+``/``*`` closure
        (see _path_elt / _maybe_plus; ``p?`` zero-or-one stays out of
        fragment). Returns the var token or a list of (inverse, step)
        pairs for the caller to desugar."""
        k, v = self._peek()
        if k == "var":
            self._next()
            if self._peek()[0] == "op" and self._peek()[1] in ("/", "^", "+", "|"):
                raise ParseError(
                    "property paths over a predicate variable are out of fragment"
                )
            return v
        steps = [self._path_elt()]
        while self._peek() == ("op", "/"):
            self._next()
            steps.append(self._path_elt())
        if self._peek() == ("op", "|"):
            raise ParseError("path alternation must be parenthesized: (p1|p2)")
        return steps

    def _triple_block(self, patterns: list, graph: str | None = None):
        """One or more 's p o' triples separated/terminated by '.'. With
        ``graph`` set (a ``?var`` or constant IRI), each triple becomes a
        quad pattern bound to that graph term (SPARQL GRAPH block). A
        property-path predicate desugars to a chain of patterns through
        fresh ``?__pN`` variables (excluded from SELECT *)."""
        found = False
        while True:
            k, v = self._peek()
            if k in (None, "FILTER", "OPTIONAL", "UNION", "GRAPH", "GROUP", "VALUES", "MINUS", "BIND") or (
                k,
                v,
            ) in (("punct", "}"), ("punct", "{")):
                break
            s = self._term()
            pred = self._predicate()
            o = self._term()
            if isinstance(pred, str):  # ?var predicate
                patterns.append((s, pred, o) if graph is None else (s, pred, o, graph))
            else:
                nodes = [s]
                for _ in range(len(pred) - 1):
                    nodes.append(f"?__p{self._path_n}")
                    self._path_n += 1
                nodes.append(o)
                for i, (inverse, iri) in enumerate(pred):
                    a, b = nodes[i], nodes[i + 1]
                    if inverse:
                        a, b = b, a
                    if isinstance(iri, PathPlus) and graph is not None:
                        raise ParseError(
                            "closure paths inside GRAPH blocks are out of fragment"
                        )
                    patterns.append((a, iri, b) if graph is None else (a, iri, b, graph))
            found = True
            if self._peek() == ("punct", "."):
                self._next()
        return found

    def _graph_block(self, patterns: list):
        """``GRAPH (?var | iri) { triples }`` → quad patterns appended to
        ``patterns``. Nested GRAPH / OPTIONAL / FILTER inside the block are
        out of fragment and rejected by the closing-brace expectation."""
        k, v = self._next()
        if k == "var":
            gterm = v
        elif k in ("iriref", "pname"):
            gterm = self._resolve_const(k, v)
        else:
            raise ParseError(f"GRAPH needs a ?var or IRI, got {v!r}")
        self._expect("punct", "{")
        if not self._triple_block(patterns, graph=gterm):
            raise ParseError("empty GRAPH block")
        self._expect("punct", "}")
        if self._peek() == ("punct", "."):
            self._next()

    def _consume_prefixes(self):
        while self._peek()[0] == "PREFIX":
            self._next()
            ns_tok = self._next()
            if ns_tok[0] == "pname_ns":
                pfx = ns_tok[1][:-1]
            elif ns_tok[0] == "pname" and ns_tok[1].endswith(":"):
                pfx = ns_tok[1][:-1]
            else:
                raise ParseError(f"bad PREFIX name: {ns_tok[1]!r}")
            iri = self._expect("iriref")
            self.prefixes[pfx] = iri[1:-1]

    def parse(self):
        self._consume_prefixes()
        form = self._peek()[0]
        if form == "ASK":
            return self._parse_ask()
        if form == "CONSTRUCT":
            return self._parse_construct()
        if form == "DESCRIBE":
            return self._parse_describe()
        q = self._select_body()
        if self._peek()[0] is not None:
            raise ParseError(f"trailing content after query: {self._peek()[1]!r}")
        return q

    # ----------------------------------------------------- SPARQL UPDATE

    def _tagged_term(self, ctx: str):
        """One update-template / data-block term with its TERM KIND kept:
        ``("var", name)`` | ``("iri", iri)`` | ``("lit", value, lang,
        datatype)``. Bare numbers are rejected (Turtle's implicit xsd
        typing would be a silent semantic choice — write the typed
        literal explicitly); blank nodes are rejected (the store's bnode
        labels are an internal namespace — minting fresh ones in an
        update is out of fragment)."""
        k, v = self._next()
        if k == "var":
            return ("var", v[1:])
        if k in ("iriref", "pname", "a_kw"):
            return ("iri", self._resolve_const(k, v))
        if k == "literal":
            val = _unescape_literal(v[1:-1])
            nk, nv = self._peek()
            if nk == "langtag":
                self._next()
                return ("lit", val, nv[1:], None)
            if (nk, nv) == ("op", "^^"):
                self._next()
                dk, dv = self._next()
                if dk not in ("iriref", "pname"):
                    raise ParseError(f"datatype must be an IRI, got {dv!r}")
                return ("lit", val, None, self._resolve_const(dk, dv))
            return ("lit", val, None, None)
        if k == "number":
            raise ParseError(
                f"bare numeric term {v!r} in {ctx} is out of fragment — "
                "write the typed literal explicitly, e.g. "
                f'"{v}"^^<http://www.w3.org/2001/XMLSchema#integer>'
            )
        raise ParseError(f"bad {ctx} term: {v!r}")

    def _tagged_triples(self, ctx: str, allow_vars: bool) -> list[tuple]:
        """``{ s p o . s p o [.] }`` — '.'-separated PLAIN triples with
        term kinds kept (no ';'/',' continuations, no property paths, no
        GRAPH blocks — all rejected loudly)."""
        self._expect("punct", "{")
        out: list[tuple] = []
        while self._peek() != ("punct", "}"):
            if self._peek()[0] is None:
                raise ParseError(f"unterminated {ctx}")
            s = self._tagged_term(ctx)
            p = self._tagged_term(ctx)
            o = self._tagged_term(ctx)
            if s[0] == "lit":
                raise ParseError(f"literal subject in {ctx} is invalid RDF")
            if p[0] == "lit":
                raise ParseError(f"literal predicate in {ctx} is invalid RDF")
            if not allow_vars:
                for t in (s, p, o):
                    if t[0] == "var":
                        raise ParseError(
                            f"variables are not allowed in {ctx} (a DATA "
                            "block holds constant triples)"
                        )
            out.append((s, p, o))
            if self._peek() == ("punct", "."):
                self._next()
            elif self._peek() != ("punct", "}"):
                raise ParseError(
                    f"expected '.' or '}}' in {ctx}, got {self._peek()[1]!r} "
                    "(';'/',' continuations are out of fragment here)"
                )
        self._next()
        if not out:
            raise ParseError(f"empty {ctx}")
        return out

    def _modify_where(self) -> dict:
        (patterns, optionals, filters, unions, minuses, exists, binds,
         subqueries) = self._where_block()
        if subqueries:
            raise ParseError("subqueries in an UPDATE WHERE are out of fragment")
        return {
            "patterns": patterns,
            "optionals": optionals,
            "filters": filters,
            "unions": unions[0] if unions else [],
            "minuses": minuses,
            "exists": exists,
            "binds": binds,
        }

    def _assert_end(self, ctx: str):
        if self._peek()[0] is not None:
            raise ParseError(
                f"trailing content after {ctx}: {self._peek()[1]!r} "
                "(';'-separated update sequences are out of fragment — "
                "apply them as separate requests)"
            )

    def _subselect(self) -> dict:
        """``{ SELECT ... }`` inside WHERE — one nesting level only. The
        executor evaluates it as its own select pipeline and joins the
        result onto the outer bindings (see pipelines/bgp.bgp_execute's
        subquery plan)."""
        if self._sub_depth >= 1:
            raise ParseError("nested subqueries (depth > 1) are out of fragment")
        self._sub_depth += 1
        try:
            return self._select_body(sub=True)
        finally:
            self._sub_depth -= 1

    def _select_body(self, sub: bool = False) -> dict:
        """SELECT clause through solution modifiers (shared by the
        top-level query and ``{ SELECT ... }`` subqueries); the caller
        owns the terminator (end-of-input / closing brace)."""
        self._expect("SELECT")
        distinct = False
        if self._peek()[0] == "DISTINCT":
            self._next()
            distinct = True
        project: list[str] | None = []
        aggregates: list[tuple[str, str | None, bool, str]] = []
        sel_exprs: list[tuple[str, tuple]] = []  # expression projections
        if self._peek()[0] == "star":
            self._next()
            project = None  # all vars, in first-appearance order
        else:
            while True:
                k, v = self._peek()
                if k == "var":
                    self._next()
                    project.append(v[1:])
                elif (k, v) == ("punct", "("):
                    if self._peek(1)[0] in _AGG_FNS:
                        aggregates.append(self._aggregate_item())
                    else:
                        alias, bexpr = self._select_expr_item()
                        sel_exprs.append((alias, bexpr))
                        project.append(alias)
                else:
                    break
            if not project and not aggregates:
                raise ParseError("SELECT needs at least one ?var, aggregate or *")
        if sub and any(f == "AVG" for f, *_x in aggregates):
            raise ParseError(
                "AVG in a subquery projection is out of fragment (the "
                "float-to-string rendering at the join boundary diverges "
                "between engines); project SUM and COUNT instead"
            )
        (patterns, optionals, filters, unions, minuses, exists, binds,
         subqueries) = self._where_block()
        if sel_exprs:
            if aggregates:
                raise ParseError(
                    "expression projections combined with aggregates are out "
                    "of fragment (project the BIND of the expression instead)"
                )
            # desugar: expression projections ARE binds, evaluated after the
            # WHERE clause's own BINDs (so they may read earlier targets);
            # the shared duplicate/freshness checks below and in the
            # executor cover them identically
            binds = list(binds) + sel_exprs
        tgt_seen: set[str] = set()
        for bv, _be in binds:
            if bv in tgt_seen:
                raise ParseError(f"duplicate BIND target ?{bv}")
            tgt_seen.add(bv)

        group_by: list[str] = []
        if self._peek()[0] == "GROUP":
            self._next()
            self._expect("BY")
            while self._peek()[0] == "var":
                group_by.append(self._next()[1][1:])
            if not group_by:
                raise ParseError("GROUP BY needs at least one ?var")
        if aggregates:
            if distinct:
                raise ParseError("SELECT DISTINCT with aggregates is out of fragment")
            bad = sorted(set(project) - set(group_by))
            if bad:
                raise ParseError(
                    f"non-aggregated SELECT variables must appear in GROUP BY: {bad}"
                )
            names = project + [a for *_x, a in aggregates]
            if len(set(names)) != len(names):
                raise ParseError(f"duplicate output names in SELECT: {names}")
            if not group_by and any(d for _f, _v, d, _a in aggregates):
                raise ParseError(
                    "global DISTINCT aggregates are out of fragment (need a "
                    "distributed distinct; use GROUP BY, or the distinct_kmv / "
                    "kg_void_stats operators)"
                )
            if not group_by and any(
                isinstance(f, tuple) for f, _v, _d, _a in aggregates
            ):
                raise ParseError(
                    "global GROUP_CONCAT (no GROUP BY) is out of fragment — "
                    "it materializes the whole column in one string"
                )
        elif group_by:
            raise ParseError("GROUP BY without aggregate functions in SELECT")

        having: list = []
        if self._peek()[0] == "HAVING":
            if not aggregates:
                raise ParseError("HAVING without aggregates in SELECT")
            self._next()
            # one or more parenthesized constraints, implicitly ANDed —
            # expressions reference the OUTPUT columns (group keys and
            # aggregate aliases), the same FILTER grammar/semantics
            while self._peek() == ("punct", "("):
                self._next()
                having.append(self._expr())
                self._expect("punct", ")")
            if not having:
                raise ParseError("HAVING needs at least one (constraint)")

        order_by: list[tuple[str, bool]] = []
        if self._peek()[0] == "ORDER":
            self._next()
            self._expect("BY")
            while True:
                k, v = self._peek()
                if k == "var":
                    self._next()
                    order_by.append((v[1:], False))
                elif k in ("ASC", "DESC"):
                    self._next()
                    self._expect("punct", "(")
                    if (
                        self._peek()[0] == "var"
                        and self._peek(1) == ("punct", ")")
                    ):
                        var = self._expect("var")[1:]
                        self._expect("punct", ")")
                        order_by.append((var, k == "DESC"))
                    else:
                        # NUMERIC expression key (the int grammar incl.
                        # STRLEN): evaluated as a hidden int64 column —
                        # '10' sorts after '2', unlike the lexical var
                        # form; non-integer lexicals are unbound and sort
                        # first (ASC) per the null-safe sort. Twins spell
                        # the same expression over guarded casts.
                        expr = self._num_expr()
                        self._expect("punct", ")")
                        order_by.append((("nexpr", expr), k == "DESC"))
                else:
                    break
            if not order_by:
                raise ParseError("ORDER BY needs at least one sort key")

        limit = offset = None
        while self._peek()[0] in ("LIMIT", "OFFSET"):
            kw = self._next()[0]
            val = self._expect("number")
            if not re.fullmatch(r"\d+", val):
                raise ParseError(f"{kw} needs a non-negative integer, got {val!r}")
            if kw == "LIMIT":
                limit = int(val)
            else:
                offset = int(val)
        if offset is not None and limit is None:
            raise ParseError(
                "OFFSET without LIMIT is out of fragment (unbounded "
                "driver-side skip); add a LIMIT"
            )
        if sub and order_by and limit is None:
            raise ParseError(
                "ORDER BY in a subquery without LIMIT has no effect "
                "(subquery solution order is not preserved); add a LIMIT "
                "or drop the ORDER BY"
            )
        if project is None:
            seen: dict[str, None] = {}
            union_pats = [p for u in unions for g in u for p in g]
            for pat in patterns + union_pats + [p for g in optionals for p in g]:
                for t in pat:
                    # fresh property-path variables (?__pN) are internal;
                    # non-str terms are alternation predicate sets
                    if isinstance(t, str) and t.startswith("?") and not t.startswith("?__p"):
                        seen[t[1:]] = None
            for sq in subqueries:
                for v in sq["project"] + [a for *_x, a in sq["aggregates"]]:
                    seen[v] = None
            for bv, _be in binds:
                seen[bv] = None
            project = list(seen)
        return {
            "form": "select",
            "project": project,
            "patterns": patterns,
            "optionals": optionals,
            "filters": filters,
            "unions": unions[0] if unions else [],
            "minuses": minuses,
            "exists": exists,
            "binds": binds,
            "group_by": group_by,
            "aggregates": aggregates,
            "having": having,
            "distinct": distinct,
            "order_by": order_by,
            "limit": limit,
            "offset": offset,
            "subqueries": subqueries,
        }

    def _where_block(self):
        """``WHERE { ... }`` → (patterns, optionals, filters, unions,
        minuses, exists, binds, subqueries) with the fragment's structural
        checks applied."""
        self._expect("WHERE")
        self._expect("punct", "{")
        patterns: list = []
        optionals: list[list] = []
        filters: list = []
        minuses: list[list] = []
        exists: list[tuple[bool, list]] = []  # (negated, pattern group)
        unions: list[list[list]] = []  # [construct][branch][pattern]
        binds: list[tuple[str, tuple]] = []  # (target var, value-expr AST)
        subqueries: list[dict] = []  # parsed { SELECT ... } groups
        while self._peek() != ("punct", "}"):
            k, v = self._peek()
            if k is None:
                raise ParseError("unterminated WHERE block")
            if k == "FILTER":
                self._next()
                # FILTER [NOT] EXISTS { ... }: a semi/anti-join against the
                # group's inner BGP on the shared (required-bound) variables
                # — with fully-bound shared vars this IS SPARQL's
                # substitution semantics. A group sharing NO variable is a
                # global gate (any match -> keep all / drop all).
                if self._peek()[0] in ("EXISTS", "NOT"):
                    neg = self._peek()[0] == "NOT"
                    self._next()
                    if neg:
                        self._expect("EXISTS")
                    self._expect("punct", "{")
                    egroup: list = []
                    if not self._triple_block(egroup):
                        raise ParseError("empty EXISTS block")
                    self._expect("punct", "}")
                    exists.append((neg, egroup))
                    if self._peek() == ("punct", "."):
                        self._next()
                    continue
                self._expect("punct", "(")
                filters.append(self._expr())
                self._expect("punct", ")")
                if self._peek() == ("punct", "."):
                    self._next()
            elif k == "OPTIONAL":
                self._next()
                self._expect("punct", "{")
                group: list = []
                if not self._triple_block(group):
                    raise ParseError("empty OPTIONAL block")
                self._expect("punct", "}")
                optionals.append(group)
                if self._peek() == ("punct", "."):
                    self._next()
            elif k == "MINUS":
                self._next()
                self._expect("punct", "{")
                mgroup: list = []
                if not self._triple_block(mgroup):
                    raise ParseError("empty MINUS block")
                self._expect("punct", "}")
                minuses.append(mgroup)
                if self._peek() == ("punct", "."):
                    self._next()
            elif k == "BIND":
                # evaluated AFTER the whole group's patterns join (the
                # target must be fresh and every referenced variable
                # pattern-bound — enforced by the executor), so a BIND is
                # position-insensitive within its group; a pattern USING
                # the target would need mid-group evaluation order and is
                # rejected by the executor's already-bound check
                self._next()
                binds.append(self._bind_clause())
                if self._peek() == ("punct", "."):
                    self._next()
            elif k == "GRAPH":
                self._next()
                self._graph_block(patterns)
            elif k == "VALUES":
                # inline data as a membership filter over variables the
                # patterns already bind (a VALUES var that binds NEW
                # variables would extend solutions — out of fragment):
                # single-var form -> set membership, multi-var form ->
                # row-tuple membership. Both evaluate null -> False (an
                # OPTIONAL-bound unbound var fails the row), matching the
                # SQL twins' IN / OR-of-ANDs — NOT SPARQL's
                # compatible-mapping join, where unbound matches any row;
                # the restriction is documented rather than guessed around.
                self._next()
                if self._peek() == ("punct", "("):
                    self._next()
                    vvars: list[str] = []
                    while self._peek()[0] == "var":
                        vvars.append(self._next()[1][1:])
                    self._expect("punct", ")")
                    if not vvars:
                        raise ParseError("VALUES needs at least one variable")
                    if len(set(vvars)) != len(vvars):
                        # SPARQL forbids repeated VALUES variables; a dup
                        # would silently demand v==c1 AND v==c2 (always
                        # false) — reject loudly instead
                        raise ParseError(
                            f"duplicate variable in VALUES list: {vvars}"
                        )
                    self._expect("punct", "{")
                    rows: list[tuple[str, ...]] = []
                    while self._peek() != ("punct", "}"):
                        if self._peek()[0] is None:
                            raise ParseError("unterminated VALUES block")
                        self._expect("punct", "(")
                        row: list[str | None] = []
                        while self._peek() != ("punct", ")"):
                            kk, vv = self._peek()
                            if kk is None:
                                raise ParseError("unterminated VALUES row")
                            self._next()
                            if kk == "UNDEF":
                                # wildcard position: constrains nothing in
                                # this row (the membership filter skips
                                # the conjunct — consistent with the
                                # null->False row semantics above)
                                row.append(None)
                            else:
                                row.append(
                                    vv
                                    if kk == "number"
                                    else self._resolve_const(kk, vv)
                                )
                        self._next()  # )
                        if len(row) != len(vvars):
                            raise ParseError(
                                f"VALUES row arity {len(row)} != {len(vvars)} "
                                f"variables"
                            )
                        if all(c is None for c in row):
                            raise ParseError(
                                "an all-UNDEF VALUES row constrains nothing "
                                "— drop the VALUES clause instead"
                            )
                        rows.append(tuple(row))
                    self._next()  # }
                    if not rows:
                        raise ParseError("empty VALUES block")
                    filters.append(("in_rows", vvars, rows))
                    if self._peek() == ("punct", "."):
                        self._next()
                    continue
                vvar = self._expect("var")[1:]
                self._expect("punct", "{")
                consts: list[str] = []
                while self._peek() != ("punct", "}"):
                    kk, vv = self._peek()
                    if kk is None:
                        raise ParseError("unterminated VALUES block")
                    if kk == "UNDEF":
                        raise ParseError("UNDEF in VALUES is out of fragment")
                    self._next()
                    if kk == "number":
                        consts.append(vv)  # the store holds lexical forms
                    else:
                        consts.append(self._resolve_const(kk, vv))
                self._next()  # }
                if not consts:
                    raise ParseError("empty VALUES block")
                filters.append(("in", vvar, consts))
                if self._peek() == ("punct", "."):
                    self._next()
            elif k == "UNION":
                raise ParseError("UNION must follow a braced group: { ... } UNION { ... }")
            elif (k, v) == ("punct", "{"):
                # braced group: subquery, plain (its patterns inline), or
                # UNION chain
                self._next()
                if self._peek()[0] == "SELECT":
                    sq = self._subselect()
                    self._expect("punct", "}")
                    if self._peek()[0] == "UNION":
                        raise ParseError(
                            "a subquery as a UNION branch is out of fragment"
                        )
                    subqueries.append(sq)
                    if self._peek() == ("punct", "."):
                        self._next()
                    continue
                grp: list = []
                if not self._triple_block(grp):
                    raise ParseError("empty braced group in WHERE")
                self._expect("punct", "}")
                if self._peek()[0] == "UNION":
                    branches = [grp]
                    while self._peek()[0] == "UNION":
                        self._next()
                        self._expect("punct", "{")
                        b: list = []
                        if not self._triple_block(b):
                            raise ParseError("empty UNION branch")
                        self._expect("punct", "}")
                        branches.append(b)
                    unions.append(branches)
                else:
                    patterns.extend(grp)
                if self._peek() == ("punct", "."):
                    self._next()
            else:
                if not self._triple_block(patterns):
                    raise ParseError(f"bad WHERE content: {v!r}")
        self._next()  # }
        if unions:
            if len(unions) > 1:
                raise ParseError("multiple UNION constructs are out of fragment")
            if minuses or exists:
                raise ParseError(
                    "MINUS / FILTER EXISTS combined with UNION is out of fragment"
                )
            # UNION mixed with required/OPTIONAL patterns is allowed; the
            # executor joins the union's binding table onto the required
            # bindings and enforces that every JOIN variable is bound by
            # every branch (a branch-missing join var would need SPARQL's
            # compatible-mapping null semantics — rejected loudly there).
            # Vars missing from some branch are nullable outputs, like
            # OPTIONAL targets.
        if not patterns and not unions and not subqueries:
            raise ParseError("WHERE block needs at least one required pattern")
        if subqueries and (minuses or exists):
            raise ParseError(
                "MINUS / FILTER EXISTS combined with a subquery is out of "
                "fragment"
            )
        return (patterns, optionals, filters, unions, minuses, exists, binds,
                subqueries)

    def _parse_describe(self):
        """``DESCRIBE <iri> ...`` (constant resources) or ``DESCRIBE ?v
        WHERE { ... }`` (one variable, seeds = its distinct bindings).
        The result is the CBD closure of the seed set."""
        self._expect("DESCRIBE")
        iris: list[str] = []
        var = None
        while True:
            k, v = self._peek()
            if k in ("iriref", "pname"):
                self._next()
                iris.append(self._resolve_const(k, v))
            elif k == "var":
                self._next()
                if var is not None:
                    raise ParseError("DESCRIBE supports at most one variable")
                var = v[1:]
            else:
                break
        if var is not None and iris:
            raise ParseError("DESCRIBE mixes a variable with constant IRIs; pick one")
        if var is None and not iris:
            raise ParseError("DESCRIBE needs at least one IRI or a ?var")
        patterns: list = []
        optionals: list[list] = []
        filters: list = []
        unions: list = []
        minuses: list = []
        exists: list = []
        if var is not None:
            (patterns, optionals, filters, unions, minuses, exists, binds,
             subqueries) = self._where_block()
            if subqueries:
                raise ParseError("subqueries are only supported in SELECT")
            if binds:
                # a BIND target is a synthesized string with no term kind —
                # it cannot name a resource to describe; out of fragment
                raise ParseError("BIND in DESCRIBE is out of fragment")
            bound = {
                t[1:]
                for grp in ([patterns] + optionals + (unions[0] if unions else []))
                for p in grp
                for t in p
                if isinstance(t, str) and t.startswith("?")
            }
            if var not in bound:
                raise ParseError(f"DESCRIBE variable ?{var} is not bound in WHERE")
        elif self._peek()[0] == "WHERE":
            raise ParseError("DESCRIBE <iri> with a WHERE block is out of fragment")
        if self._peek()[0] is not None:
            raise ParseError(
                f"trailing content after DESCRIBE query: {self._peek()[1]!r}"
            )
        return {
            "form": "describe",
            "iris": iris,
            "var": var,
            "patterns": patterns,
            "optionals": optionals,
            "filters": filters,
            "unions": unions[0] if unions else [],
            "minuses": minuses,
            "exists": exists,
        }

    def _parse_ask(self):
        """``ASK WHERE { ... }`` (or ``ASK { ... }``) → boolean existence
        query; no projection or solution modifiers."""
        self._expect("ASK")
        if self._peek()[0] != "WHERE":
            # SPARQL allows ASK { ... } — normalize by injecting WHERE
            self.toks.insert(self.i, ("WHERE", "WHERE"))
        (patterns, optionals, filters, unions, minuses, exists, binds,
         subqueries) = self._where_block()
        if subqueries:
            raise ParseError("subqueries are only supported in SELECT")
        if self._peek()[0] is not None:
            raise ParseError(
                f"trailing content after ASK query: {self._peek()[1]!r}"
            )
        return {
            "form": "ask",
            "patterns": patterns,
            "optionals": optionals,
            "filters": filters,
            "unions": unions[0] if unions else [],
            "minuses": minuses,
            "exists": exists,
            "binds": binds,
        }

    def _parse_construct(self):
        """``CONSTRUCT { template } WHERE { ... }`` → template triples
        instantiated once per solution, null-dropping, set semantics.
        ``CONSTRUCT WHERE { plain triples }`` is the §10.2.3 shorthand
        (template = pattern; untyped output only)."""
        self._expect("CONSTRUCT")
        if self._peek()[0] == "WHERE":
            # CONSTRUCT WHERE { ... } shorthand: the template IS the
            # pattern block (SPARQL 1.1 §10.2.3 — plain BGP only, so
            # FILTER/OPTIONAL/paths/etc. inside are rejected below).
            # Pattern constants are kind-agnostic VALUE matches, so the
            # shorthand has no tagged template — sparql_construct_typed
            # rejects it; spell the template out for typed output.
            (patterns, optionals, filters, unions, minuses, exists, binds,
             subqueries) = self._where_block()
            extras = [optionals, filters, unions, minuses, exists, binds,
                      subqueries]
            if any(extras):
                raise ParseError(
                    "CONSTRUCT WHERE takes a plain triple block only "
                    "(no FILTER/OPTIONAL/UNION/MINUS/EXISTS/BIND/"
                    "subqueries) — use CONSTRUCT { template } WHERE { ... }"
                )
            for pat in patterns:
                # non-str terms are path operators (PathPlus / alternation
                # tuples / negated sets); '?__p' vars are desugared path
                # sequences — all non-template-able
                if len(pat) != 3 or any(
                    not isinstance(t, str) or t.startswith("?__p")
                    for t in pat
                ):
                    raise ParseError(
                        "CONSTRUCT WHERE takes plain triples only "
                        "(no property paths or GRAPH blocks)"
                    )
            if self._peek()[0] is not None:
                raise ParseError(
                    f"trailing content after CONSTRUCT query: "
                    f"{self._peek()[1]!r}"
                )
            return {
                "form": "construct",
                "template": [tuple(p) for p in patterns],
                "template_tagged": None,
                "patterns": patterns,
                "optionals": [],
                "filters": [],
                "unions": [],
                "minuses": [],
                "exists": [],
            }
        # TAGGED template parse (kinds kept — '("var",n) | ("iri",v) |
        # ("lit",v,lang,dt)') so sparql_construct_typed can emit full
        # 7-column store rows; the untyped string template the plain
        # emitter consumes is derived below. Property paths / GRAPH stay
        # rejected (by _tagged_triples); bare NUMERIC template constants,
        # which the pre-typed parser accepted as raw strings, are now
        # rejected too (a deliberate tightening: Turtle's implicit xsd
        # typing would be a silent kind choice — write the typed literal).
        tagged = self._tagged_triples("CONSTRUCT template", allow_vars=True)
        template: list = [
            tuple(
                "?" + t[1] if t[0] == "var" else t[1]
                for t in pat
            )
            for pat in tagged
        ]
        (patterns, optionals, filters, unions, minuses, exists, binds,
         subqueries) = self._where_block()
        if subqueries:
            raise ParseError("subqueries are only supported in SELECT")
        if binds:
            # a BIND target carries no term kind (iri/literal), which the
            # CONSTRUCT emitter needs per template slot; out of fragment
            raise ParseError("BIND in CONSTRUCT is out of fragment")
        if self._peek()[0] is not None:
            raise ParseError(
                f"trailing content after CONSTRUCT query: {self._peek()[1]!r}"
            )
        tvars = {t[1:] for p in template for t in p if t.startswith("?")}
        bound = {
            v
            for grp in ([patterns] + optionals + (unions[0] if unions else []))
            for p in grp
            for t in p
            if isinstance(t, str) and t.startswith("?")
            for v in [t[1:]]
        }
        missing = sorted(tvars - bound)
        if missing:
            raise ParseError(f"CONSTRUCT template uses unbound variables: {missing}")
        return {
            "form": "construct",
            "template": template,
            "template_tagged": tagged,
            "patterns": patterns,
            "optionals": optionals,
            "filters": filters,
            "unions": unions[0] if unions else [],
            "minuses": minuses,
            "exists": exists,
        }

    def _select_expr_item(self) -> tuple[str, tuple]:
        """``(value-expr AS ?alias)`` expression projection — the same
        value-expression grammar as BIND (it desugars to one): checked
        int64 arithmetic (rendered as the decimal string; SQL twins spell
        ``CAST(... AS VARCHAR) AS alias``) or a string expression
        (UCASE/LCASE/CONCAT/SUBSTR/REPLACE/STR, entering the binding
        table directly)."""
        self._expect("punct", "(")
        expr = self._value_expr()
        self._expect("AS")
        alias = self._expect("var")[1:]
        self._expect("punct", ")")
        return alias, expr

    def _aggregate_item(self) -> tuple:
        """``(AGG(* | [DISTINCT] ?v) AS ?alias)`` in the SELECT clause.
        AGG in {COUNT, MIN, MAX, SUM, AVG, GROUP_CONCAT, SAMPLE}. SAMPLE
        is the deterministic codepoint-minimum choice (= MIN; any element
        conforms, and a distributed engine must pin one). MIN/MAX compare
        codepoint/byte order — UTF-8 byte order equals codepoint order, so
        both engines agree. SUM/AVG read INTEGER lexical forms exactly
        (core/numeric semantics: any non-``[+-]?\\d{1,18}`` form is
        unbound/NULL); SUM renders the exact integer as a string, AVG is
        strtod(SUM)/COUNT — deterministic under distribution, unlike float
        summation. ``GROUP_CONCAT([DISTINCT] ?v ; SEPARATOR = "s")``
        (default separator a single space) concatenates in CODEPOINT-
        SORTED order — solution order is nondeterministic under
        distribution, so the fragment pins the sort and twins spell
        ``string_agg(v, s ORDER BY v)``; an all-null group is NULL
        (DuckDB's convention). Its function slot is the tuple
        ``("GC", separator)``; it requires GROUP BY (a global concat has
        no small-result guarantee) and cannot pre-aggregate (merging
        per-block concats would break the global sort)."""
        self._expect("punct", "(")
        fk, fv = self._next()
        if fk not in _AGG_FNS:
            raise ParseError(f"expected aggregate function, got {fv!r}")
        was_sample = fk == "SAMPLE"
        if was_sample:
            # SAMPLE returns an ARBITRARY element of the group (SPARQL 1.1
            # §18.5.1.8) — any deterministic choice conforms, and a
            # distributed engine must pin one or two runs disagree. The
            # fragment picks the codepoint-minimum, i.e. MIN; twins spell
            # MIN(v) likewise.
            fk = "MIN"
        self._expect("punct", "(")
        agg_distinct = False
        if self._peek()[0] == "DISTINCT":
            self._next()
            agg_distinct = not was_sample  # SAMPLE(DISTINCT x) = SAMPLE(x)
        k2, v2 = self._next()
        if k2 == "star":
            if fk != "COUNT" or agg_distinct:
                raise ParseError("'*' is only valid in COUNT(*)")
            var = None
        elif k2 == "var":
            var = v2[1:]
        else:
            raise ParseError(f"aggregate argument must be ?var or *, got {v2!r}")
        if agg_distinct and fk in ("MIN", "MAX"):
            raise ParseError(f"DISTINCT inside {fk}(...) is a no-op; drop it")
        sep = " "
        if self._peek() == ("punct", ";"):
            if fk != "GROUP_CONCAT":
                raise ParseError(f"';' is only valid inside GROUP_CONCAT, not {fk}")
            self._next()
            self._expect("SEPARATOR")
            k3, v3 = self._next()
            if (k3, v3) != ("op", "="):
                raise ParseError(f"expected '=' after SEPARATOR, got {v3!r}")
            k4, v4 = self._next()
            if k4 != "literal":
                raise ParseError("SEPARATOR needs a plain string literal")
            sep = _unescape_literal(v4[1:-1])
        self._expect("punct", ")")
        self._expect("AS")
        alias = self._expect("var")[1:]
        self._expect("punct", ")")
        if fk == "GROUP_CONCAT":
            return (("GC", sep), var, agg_distinct, alias)
        return (fk, var, agg_distinct, alias)


def parse_query(text: str) -> dict:
    """SPARQL SELECT / ASK / CONSTRUCT (restricted fragment) → a dict with
    ``form`` plus the form's fields, ready for pipelines/bgp.sparql_select
    / sparql_ask / sparql_construct."""
    return _SelectParser(text).parse()


def parse_select(text: str) -> dict:
    """SPARQL SELECT (restricted fragment) → {project, patterns, optionals,
    filters, unions, group_by, aggregates, distinct, order_by, limit,
    offset} ready for pipelines/bgp.sparql_select / bgp_execute."""
    q = parse_query(text)
    if q["form"] != "select":
        raise ParseError(f"expected a SELECT query, got {q['form'].upper()}")
    return q


def _untag_triple(tagged) -> tuple:
    """Tagged template triple → the executor's plain-term convention
    (``?name`` = variable, anything else a constant matched by VALUE —
    a DELETE template's identity is (subj, pred, obj_value); its lang /
    datatype marks are ignored, the engine-wide kind-agnostic matching
    convention)."""
    out = []
    for t in tagged:
        if t[0] == "var":
            out.append("?" + t[1])
        elif t[0] == "iri":
            out.append(t[1])
        else:
            if t[1].startswith("?"):
                raise ParseError(
                    f"literal constant {t[1]!r} starting with '?' would be "
                    "ambiguous with a variable in the plain-term convention"
                )
            out.append(t[1])
    return tuple(out)


def _tmpl_bound_check(templates, where: dict, what: str):
    """Every template variable must be bound by the WHERE group (required
    patterns, OPTIONAL groups, UNION branches, closure endpoints or BIND
    targets — the executor decides per-row nullability; null slots skip
    the row, the CONSTRUCT convention)."""
    tvars = {t[1] for trip in templates for t in trip if t[0] == "var"}
    bound = {bv for bv, _be in where["binds"]}
    for grp in [where["patterns"]] + list(where["optionals"]) + list(
        where["unions"]
    ):
        for p in grp:
            for term in p:
                if isinstance(term, str) and term.startswith("?"):
                    bound.add(term[1:])
    missing = sorted(tvars - bound)
    if missing:
        raise ParseError(f"{what} uses unbound variables: {missing}")


def parse_update(text: str) -> dict:
    """SPARQL UPDATE (restricted fragment) → an op dict for
    pipelines/update.sparql_update:

        PREFIX decls ...
        INSERT DATA { s p o . ... }      # constant tagged triples
        DELETE DATA { s p o . ... }      # deletion is by VALUE identity
        DELETE WHERE { patterns }        # plain pattern group, doubles as
                                         # the delete template (SPARQL 1.1
                                         # §3.1.3.3 — no FILTER/OPTIONAL)
        DELETE { tmpl } [INSERT { tmpl }] WHERE { group }
        INSERT { tmpl } WHERE { group }

    Templates are '.'-separated plain triples (vars + tagged constants);
    the WHERE group supports the SELECT fragment's pattern features
    (FILTER / OPTIONAL / UNION / MINUS / EXISTS / BIND / paths) minus
    subqueries. One request per call — ';' sequences are rejected.
    Returns {"op": "insert_data"|"delete_data", "data": [...]} or
    {"op": "modify", "delete_tmpl": [plain triples], "insert_tmpl":
    [tagged triples], "where": {...}}."""
    p = _SelectParser(text)
    p._consume_prefixes()
    k, v = p._peek()
    if k == "INSERT":
        p._next()
        if p._peek()[0] == "DATA":
            p._next()
            data = p._tagged_triples("INSERT DATA block", allow_vars=False)
            p._assert_end("INSERT DATA")
            return {"op": "insert_data", "data": data}
        ins = p._tagged_triples("INSERT template", allow_vars=True)
        where = p._modify_where()
        p._assert_end("INSERT ... WHERE")
        _tmpl_bound_check(ins, where, "INSERT template")
        return {"op": "modify", "delete_tmpl": [], "insert_tmpl": ins,
                "where": where}
    if k == "DELETE":
        p._next()
        nk = p._peek()[0]
        if nk == "DATA":
            p._next()
            data = p._tagged_triples("DELETE DATA block", allow_vars=False)
            p._assert_end("DELETE DATA")
            return {"op": "delete_data", "data": data}
        if nk == "WHERE":
            where = p._modify_where()
            p._assert_end("DELETE WHERE")
            for key in ("optionals", "filters", "unions", "minuses",
                        "exists", "binds"):
                if where[key]:
                    raise ParseError(
                        "DELETE WHERE takes a plain pattern group only "
                        f"(found {key}); use DELETE {{...}} WHERE {{...}} "
                        "for the general form"
                    )
            for pat in where["patterns"]:
                if len(pat) != 3:
                    raise ParseError("GRAPH in DELETE WHERE is out of fragment")
                for term in pat:
                    if not isinstance(term, str) or term.startswith("?__p"):
                        raise ParseError(
                            "property paths are not allowed in DELETE WHERE"
                        )
            return {"op": "modify", "delete_tmpl": list(where["patterns"]),
                    "insert_tmpl": [], "where": where}
        del_t = p._tagged_triples("DELETE template", allow_vars=True)
        ins_t: list = []
        if p._peek()[0] == "INSERT":
            p._next()
            ins_t = p._tagged_triples("INSERT template", allow_vars=True)
        where = p._modify_where()
        p._assert_end("DELETE/INSERT ... WHERE")
        _tmpl_bound_check(del_t + ins_t, where, "DELETE/INSERT template")
        return {"op": "modify",
                "delete_tmpl": [_untag_triple(t) for t in del_t],
                "insert_tmpl": ins_t, "where": where}
    raise ParseError(f"expected an INSERT or DELETE update, got {v!r}")

"""Graph → RDF/XML serialization.

Re-implements the reference encoder's semantics
(/root/reference/lib/rdf/xml/encoder.ex:66-340) from scratch:

* one ``<rdf:Description>`` (or type-shortened) element per subject;
* subject attr: bnode → ``rdf:nodeID``; IRI → ``rdf:about`` (base-relativized
  by literal prefix-strip, encoder.ex:326-331) or ``rdf:ID="frag"`` when
  ``use_rdf_id``;
* objects: IRI → ``rdf:resource``, bnode → ``rdf:nodeID``, XMLLiteral →
  ``parseType="Literal"`` raw body, other literals → text content with
  ``xml:lang`` / ``rdf:datatype`` (none for xsd:string);
* namespace declarations sorted for deterministic output (encoder.ex:162-177);
* properties must have a QName under the prefix map, else ``EncodeError``
  (encoder.ex:278-288).

Deterministic everywhere (descriptions sorted by subject, predicates and
objects sorted) — a hard requirement for distributed reproducibility, where
the reference only sorts ns declarations.

The streaming shape mirrors ``Encoder.stream/2`` (encoder.ex:94-123): header
+ one line per description + footer, which is exactly the
``groupby(subj).map_groups`` layout the Ray stage uses.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from ..core.model import Graph, Triple
from ..core.terms import (
    DEFAULT_PREFIXES,
    RDF_TYPE,
    RDF_XML_LITERAL,
    BNode,
    EncodeError,
    IRI,
    Literal,
    escape_attr,
    escape_text,
)

XML_DECL = '<?xml version="1.0" encoding="utf-8"?>'


def _ncname_ok(rest: str) -> bool:
    return bool(rest) and not any(c in rest for c in "/#:?")


def qname(iri: str, prefixes: dict[str | None, str]) -> str | None:
    """IRI → prefixed name under the prefix map (encoder.ex:333-339)."""
    best = None
    for prefix, ns in prefixes.items():
        if iri.startswith(ns):
            rest = iri[len(ns):]
            if _ncname_ok(rest):
                name = rest if prefix is None else f"{prefix}:{rest}"
                if best is None or len(name) < len(best):
                    best = name
    return best


def _attr_val_uri(iri: str, base: str | None) -> str:
    if base and iri.startswith(base):
        return iri[len(base):]
    return iri


def _sorted_prefixes(prefixes: dict[str | None, str]) -> list[tuple[str | None, str]]:
    return sorted(prefixes.items(), key=lambda kv: (kv[0] is not None, kv[0] or ""))


def ns_declaration_attrs(
    prefixes: dict[str | None, str], base: str | None, implicit_base: bool
) -> list[tuple[str, str]]:
    attrs = []
    if base and not implicit_base:
        attrs.append(("xml:base", base))
    for prefix, ns in _sorted_prefixes(prefixes):
        attrs.append(("xmlns" if prefix is None else f"xmlns:{prefix}", ns))
    return attrs


def _term_sort_key(o) -> tuple:
    if isinstance(o, Literal):
        return (2, o.lexical, o.lang or "", o.datatype or "")
    if isinstance(o, BNode):
        return (1, str(o), "", "")
    return (0, str(o), "", "")


def _object_element(prop_name: str, o, base, prefixes) -> str:
    if isinstance(o, Literal):
        if o.datatype == RDF_XML_LITERAL:
            return f'<{prop_name} rdf:parseType="Literal">{o.lexical}</{prop_name}>'
        if o.lang:
            attr = f' xml:lang="{escape_attr(o.lang)}"'
        elif o.datatype:
            attr = f' rdf:datatype="{escape_attr(_attr_val_uri(o.datatype, base))}"'
        else:
            attr = ""
        return f"<{prop_name}{attr}>{escape_text(o.lexical)}</{prop_name}>"
    if isinstance(o, BNode):
        return f'<{prop_name} rdf:nodeID="{escape_attr(str(o))}"/>'
    return f'<{prop_name} rdf:resource="{escape_attr(_attr_val_uri(str(o), base))}"/>'


def encode_description(
    subject,
    triples: Iterable[Triple],
    base: str | None = None,
    prefixes: dict[str | None, str] | None = None,
    use_rdf_id: bool | Callable = False,
) -> str:
    """One subject's triples → one XML element string (encoder.ex:225-324).

    This is the per-group unit of work for the Ray encode stage."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    pred_objs: dict[str, list] = {}
    for _s, p, o in triples:
        pred_objs.setdefault(str(p), []).append(o)

    # type-node shortening (encoder.ex:238-251): first rdf:type object with a
    # known QName becomes the element name
    el_name = None
    if RDF_TYPE in pred_objs:
        for o in sorted(pred_objs[RDF_TYPE], key=_term_sort_key):
            if isinstance(o, (IRI, str)) and not isinstance(o, (Literal, BNode)):
                qn = qname(str(o), prefixes)
                if qn:
                    el_name = qn
                    pred_objs[RDF_TYPE] = [x for x in pred_objs[RDF_TYPE] if x != o]
                    if not pred_objs[RDF_TYPE]:
                        del pred_objs[RDF_TYPE]
                    break
    el_name = el_name or "rdf:Description"

    # subject attribute (encoder.ex:253-270)
    if isinstance(subject, BNode):
        subj_attr = f'rdf:nodeID="{escape_attr(str(subject))}"'
    else:
        use_id = use_rdf_id(subject, pred_objs) if callable(use_rdf_id) else use_rdf_id
        val = _attr_val_uri(str(subject), base)
        if use_id and val.startswith("#"):
            subj_attr = f'rdf:ID="{escape_attr(val[1:])}"'
        else:
            subj_attr = f'rdf:about="{escape_attr(val)}"'

    parts = [f"<{el_name} {subj_attr}>"]
    for pred in sorted(pred_objs):
        prop_name = qname(pred, prefixes)
        if prop_name is None:
            raise EncodeError(f"no namespace declaration for property {pred} found")
        for o in sorted(pred_objs[pred], key=_term_sort_key):
            parts.append(_object_element(prop_name, o, base, prefixes))
    parts.append(f"</{el_name}>")
    return "".join(parts)


def _resolve_opts(graph: Graph | None, base, prefixes):
    if base is None and graph is not None:
        base = graph.base_iri
    if prefixes is None:
        prefixes = graph.prefixes if graph is not None and graph.prefixes else DEFAULT_PREFIXES
    if base is not None:
        base = base.split("#", 1)[0]
    return base, dict(prefixes)


def stream_encode(
    graph: Graph,
    base: str | None = None,
    prefixes: dict[str | None, str] | None = None,
    use_rdf_id: bool | Callable = False,
    implicit_base: bool = False,
    xml_declaration: bool = True,
    producer: Callable | None = None,
):
    """Yield RDF/XML line by line: header, one description per line, footer
    (encoder.ex:94-123).

    ``producer`` (encoder.ex:29-47 ``:producer`` option) customizes which
    descriptions are emitted and in what order: a callable taking the graph
    and returning an iterable of subjects (or (subject, triples) pairs).
    Default: subjects sorted (IRIs first) — deterministic, unlike the
    reference's insertion order.
    """
    base, prefixes = _resolve_opts(graph, base, prefixes)
    if xml_declaration:
        yield XML_DECL
    decls = "".join(
        f' {n}="{escape_attr(v)}"' for n, v in ns_declaration_attrs(prefixes, base, implicit_base)
    )
    yield f"<rdf:RDF{decls}>"
    by_subject: dict = {}
    for t in graph:
        by_subject.setdefault(t[0], []).append(t)
    if producer is not None:
        for item in producer(graph):
            if isinstance(item, tuple) and len(item) == 2 and not isinstance(item[1], str):
                subject, triples = item
            else:
                subject, triples = item, by_subject.get(item, [])
            yield encode_description(subject, triples, base, prefixes, use_rdf_id)
    else:
        for subject in sorted(by_subject, key=lambda s: (isinstance(s, BNode), str(s))):
            yield encode_description(subject, by_subject[subject], base, prefixes, use_rdf_id)
    yield "</rdf:RDF>"


def encode(graph: Graph, **opts) -> str:
    """Graph → single RDF/XML string (encoder.ex:66-81)."""
    sep = "\n" if opts.pop("pretty", False) else ""
    return sep.join(stream_encode(graph, **opts))

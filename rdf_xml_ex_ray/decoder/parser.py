"""RDF/XML → triples: a deterministic striped-syntax grammar walker.

Re-implements, from scratch, the semantics of the reference's grammar state
machine (/root/reference/lib/rdf/xml/decoder/grammar/rules.ex — productions
Doc/OuterRDF/NodeElement/PropertyElt/…; element classification per
element_node.ex; shared helpers per rule.ex:106-170), with two deliberate
improvements over the reference, both spec-aligned:

* syntax terms (``rdf:about`` etc.) are recognized by *resolved namespace*,
  not by the literal ``rdf:`` prefix — fixing the reference's five skipped
  ``rdf-ns-prefix-confusion`` W3C cases (w3c_test.exs:32-40);
* a document whose root is a node element (no ``rdf:RDF`` wrapper) is
  accepted — fixing the skipped ``rdf-element-not-mandatory`` case.

The reference's speculative branch machinery (grammar.ex:69-104) exists only
because SAX cannot look ahead; with the whole (per-conversation, bounded)
element tree available the Literal/Resource/Empty property-element ambiguity
is resolved deterministically with identical outcomes (see
``_property_element``).

This module is pure Python with no Ray dependency: one call per document, all
state function-local, so it runs embarrassingly parallel inside
``map_batches`` (stages/parse.py).
"""

from __future__ import annotations

from ..core.model import Graph, MultiGraph
from ..core.terms import (
    CORE_SYNTAX_TERMS,
    OLD_TERMS,
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_OBJECT,
    RDF_PREDICATE,
    RDF_REST,
    RDF_STATEMENT,
    RDF_SUBJECT,
    RDF_TYPE,
    RDF_XML_LITERAL,
    BNode,
    IRI,
    Literal,
    ParseError,
    check_nc_name,
    escape_attr,
    escape_text,
    is_absolute_iri,
    make_rdf_id,
    normalize_base_uri,
    resolve_iri,
    split_qname,
)
from .xmltree import XmlElement, parse_xml

_FORBIDDEN_NODE_LOCALS = CORE_SYNTAX_TERMS | OLD_TERMS | {"li"}
_FORBIDDEN_PROPERTY_LOCALS = CORE_SYNTAX_TERMS | OLD_TERMS | {"Description"}
_PARSE_TYPES = {"Literal": "literal", "Resource": "resource", "Collection": "collection"}
_RDF_NS_LEN = len(RDF_NS)


class BnodeGen:
    """Per-document blank node allocator (reference: grammar.ex:19,
    rule.ex:120-126). ``generate`` mints ``<prefix><n>``; ``generate_for``
    maps an ``rdf:nodeID`` label to a stable generated bnode."""

    __slots__ = ("prefix", "counter", "by_label")

    def __init__(self, prefix: str = "b"):
        self.prefix = prefix
        self.counter = 0
        self.by_label: dict[str, BNode] = {}

    def generate(self) -> BNode:
        node = BNode(f"{self.prefix}{self.counter}")
        self.counter += 1
        return node

    def generate_for(self, label: str) -> BNode:
        node = self.by_label.get(label)
        if node is None:
            node = self.generate()
            self.by_label[label] = node
        return node


_EMPTY_DICT: dict = {}  # shared by attribute-less contexts (never mutated)


class ElemCtx:
    """Resolved element context: the analogue of the reference's ElementNode
    (element_node.ex:5-28) — namespace/base/lang inheritance + attribute
    classification."""

    __slots__ = (
        "qname",
        "uri",
        "_rdf_local",
        "rdf",
        "prop_attrs",
        "base",
        "ns",
        "lang",
        "li_counter",
        "xml",
        "_memo",
    )

    def __init__(
        self,
        xml_el: XmlElement,
        parent: "ElemCtx | None",
        doc_base: str | None,
        memo: dict | None = None,
    ):
        self.xml = xml_el
        self.qname = xml_el.qname
        self.li_counter = 1
        if parent is not None:
            ns = parent.ns
            base = parent.base
            lang = parent.lang
            memo = parent._memo if memo is None else memo
        else:
            ns = {}
            base = doc_base
        # per-document memo: (id(ns_dict), name) → resolved classification.
        # ns dicts are kept alive in memo["ns"] so id() stays unambiguous.
        if memo is None:
            memo = {"ns": [], "el": {}, "at": {}}
        self._memo = memo
        if parent is None:
            lang = None

        # Fast path: no attributes at all (most property elements) — skip
        # both classification passes
        if not xml_el.attrs:
            self.ns = ns
            self.base = base
            self.lang = lang
            self.uri, self._rdf_local = self._resolve_elem_name(xml_el.qname)
            self.rdf = _EMPTY_DICT  # read-only past init; shared, no alloc
            self.prop_attrs = _EMPTY_DICT
            return

        # Fast path: attributes but none in the xml/xmlns space (the common
        # attributed shape: one rdf:resource/rdf:about/rdf:datatype) — skip
        # the declaration pass, context inherits unchanged. Plain loop, not
        # any(genexpr): the generator frame costs ~2µs per element here.
        has_xml_attr = False
        for name, _v in xml_el.attrs:
            if name.startswith("xml"):
                has_xml_attr = True
                break
        if not has_xml_attr:
            self.ns = ns
            self.base = base
            self.lang = lang
            self.uri, self._rdf_local = self._resolve_elem_name(xml_el.qname)
            self._classify_plain_attrs(xml_el.attrs)
            return

        # Pass 1: xml:lang / xml:base / xmlns declarations (element_node.ex:94-111)
        plain_attrs: list[tuple[str, str]] = []
        own_ns: dict[str | None, str] | None = None
        for name, value in xml_el.attrs:
            if name == "xml:lang":
                lang = value or None
            elif name == "xml:base":
                # resolve a relative xml:base against the outer base (XML Base
                # spec; the reference replaces it outright, which is only
                # correct for absolute values)
                if base is not None and not is_absolute_iri(value):
                    value = resolve_iri(value, base)
                base = normalize_base_uri(value)
            elif name.startswith("xmlns"):
                if own_ns is None:
                    own_ns = dict(ns)
                if name == "xmlns":
                    own_ns[None] = value
                elif name[5] == ":":
                    own_ns[name[6:]] = value
            else:
                plain_attrs.append((name, value))
        self.ns = own_ns if own_ns is not None else ns
        self.base = base
        self.lang = lang

        # Element name → IRI
        self.uri, self._rdf_local = self._resolve_elem_name(xml_el.qname)

        # Pass 2: classify remaining attributes (element_node.ex:115-192)
        self._classify_plain_attrs(plain_attrs)

    def _classify_plain_attrs(self, plain_attrs) -> None:
        rdf: dict[str, object] = {}
        prop_attrs: dict[str, str] = {}
        at_memo = self._memo["at"]
        ns_id = id(self.ns)
        for name, value in plain_attrs:
            klass = at_memo.get((ns_id, name))
            if klass is None:
                klass = self._classify_attr_name(name)
                at_memo[(ns_id, name)] = klass
                self._keepalive_ns()
            kind, payload = klass
            if kind == "ignore":
                continue
            if kind == "prop":
                prop_attrs[payload] = value
            elif kind == "rdf":
                rdf[payload] = self._rdf_attr_value(payload, value)
            else:  # "error": forbidden/old-term attribute name
                raise ParseError(payload)
        self.rdf = rdf
        self.prop_attrs = prop_attrs

    def _keepalive_ns(self):
        ka = self._memo["ns"]
        if not ka or ka[-1] is not self.ns:
            ka.append(self.ns)

    def _classify_attr_name(self, name: str) -> tuple[str, str | None]:
        prefix, local = split_qname(name)
        if prefix == "xml" or (prefix is None and name.startswith("xml")):
            return ("ignore", None)  # unrecognized xml-namespace attrs ignored
        ns_uri = self.ns.get(prefix)
        if ns_uri is None:
            # unqualified without default ns, or undeclarable prefix →
            # ignored (reference parity, element_node.ex:188-191)
            return ("ignore", None)
        uri = ns_uri + local
        if ns_uri == RDF_NS:
            if local in ("li", "RDF", "Description"):
                return ("error", f"rdf:{local} is not allowed as an attribute")
            if local in OLD_TERMS:
                return ("error", f"rdf:{local} not supported in RDF/XML 1.1")
            key = self._classify_rdf_attr(local)
            if key is not None:
                return ("rdf", key)
        return ("prop", uri)

    def _resolve_elem_name(self, qname: str) -> tuple[IRI, str | None]:
        """(IRI, rdf-namespace local name) for an element qname — memoized
        per (ns dict, qname) so the startswith/slice classification runs
        once per distinct name, not once per element."""
        el_memo = self._memo["el"]
        key = (id(self.ns), qname)
        entry = el_memo.get(key)
        if entry is None:
            prefix, local = split_qname(qname)
            ns_uri = self.ns.get(prefix)
            if ns_uri is None:
                raise ParseError(f"can't resolve name {qname} to URI reference")
            uri = IRI(ns_uri + local)
            u = str.__str__(uri)
            entry = (uri, u[_RDF_NS_LEN:] if u.startswith(RDF_NS) else None)
            el_memo[key] = entry
            self._keepalive_ns()
        return entry

    _RDF_ATTR_KEYS = {
        "ID": "id",
        "nodeID": "node_id",
        "about": "about",
        "resource": "resource",
        "datatype": "datatype",
        "parseType": "parse_type",
    }

    @classmethod
    def _classify_rdf_attr(cls, local: str) -> str | None:
        return cls._RDF_ATTR_KEYS.get(local)

    def _rdf_attr_value(self, key: str, value: str):
        if key == "id":
            return make_rdf_id(value, self.base)
        if key == "node_id":
            return check_nc_name(value)
        if key in ("about", "resource", "datatype"):
            return resolve_iri(value, self.base)
        if key == "parse_type":
            return _PARSE_TYPES.get(value, ("other", value))
        raise AssertionError(key)

    # --- name category helpers (resolved-namespace based) ---

    def rdf_local(self) -> str | None:
        return self._rdf_local

    def is_rdf_RDF(self) -> bool:
        return self.rdf_local() == "RDF"

    def check_node_element_name(self) -> None:
        local = self.rdf_local()
        if local is not None and local in _FORBIDDEN_NODE_LOCALS:
            raise ParseError(f"{self.qname} is not allowed as a node element")

    def check_property_element_name(self) -> None:
        local = self.rdf_local()
        if local is not None and local in _FORBIDDEN_PROPERTY_LOCALS:
            raise ParseError(f"{self.qname} is not allowed as a property element")


class _DocParser:
    def __init__(self, base: str | None, bnode_prefix: str, unique: bool = True):
        # unique=False parses into an append-only MultiGraph — no per-triple
        # set insert/hash; for pipeline paths whose downstream per-bucket
        # canonicalization restores set semantics anyway (stages/parse.py)
        cls = Graph if unique else MultiGraph
        self.graph = cls(base_iri=normalize_base_uri(base))
        self.bnodes = BnodeGen(bnode_prefix)
        self.rdf_ids: set[str] = set()

    # -- shared helpers --

    def _check_rdf_id(self, ctx: ElemCtx) -> None:
        rdf_id = ctx.rdf.get("id")
        if rdf_id is not None:
            if rdf_id in self.rdf_ids:
                raise ParseError(f"multiple uses of ID {rdf_id}")
            self.rdf_ids.add(rdf_id)

    def _emit(self, s, p, o) -> None:
        self.graph.add((s, p, o))

    def _reify(self, statement, rdf_id: str) -> None:
        # rule.ex:128-134
        r = IRI(rdf_id)
        s, p, o = statement
        self._emit(r, IRI(RDF_TYPE), IRI(RDF_STATEMENT))
        self._emit(r, IRI(RDF_SUBJECT), s)
        self._emit(r, IRI(RDF_PREDICATE), p)
        self._emit(r, IRI(RDF_OBJECT), o)

    def _property_attr_triples(self, subject, ctx: ElemCtx) -> None:
        # rule.ex:142-169: rdf:type attr value resolves to an IRI, all other
        # property attributes become (lang-tagged) plain literals.
        for uri, value in ctx.prop_attrs.items():
            if uri == RDF_TYPE:
                self._emit(subject, IRI(RDF_TYPE), IRI(resolve_iri(value, ctx.base)))
            else:
                self._emit(subject, IRI(uri), Literal(value, lang=ctx.lang))

    @staticmethod
    def _require_ws_only_text(el: XmlElement, what: str) -> None:
        for child in el.children:
            if isinstance(child, str) and child.strip():
                raise ParseError(f"unexpected characters in {what}: {child!r}")

    # -- productions --

    def parse_doc(self, root_el: XmlElement) -> Graph:
        ctx = ElemCtx(root_el, None, self.graph.base_iri)
        if ctx.is_rdf_RDF():
            # OuterRDF (rules.ex:28-49): record base + ns declarations
            self._check_rdf_id(ctx)
            self._require_ws_only_text(root_el, "rdf:RDF")
            for child in root_el.element_children():
                self.node_element(ElemCtx(child, ctx, None))
            if ctx.base is not None:
                self.graph.base_iri = ctx.base
            self.graph.prefixes.update(ctx.ns)
        else:
            # rdf:RDF is optional (spec; reference skips this case)
            self.node_element(ctx)
        return self.graph

    def node_element(self, ctx: ElemCtx):
        """rules.ex:56-107. Returns the subject term."""
        ctx.check_node_element_name()
        self._check_rdf_id(ctx)
        for key in ("resource", "parse_type", "datatype"):
            if key in ctx.rdf:
                raise ParseError(f"rdf:{key} not allowed on a node element")
        # node-element subject attrs are mutually exclusive
        # (element_node.ex:113-136; scoped to node elements only — on property
        # elements rdf:ID reifies alongside rdf:nodeID, the reference's skipped
        # rdfms-syntax-incomplete/test004)
        if sum(k in ctx.rdf for k in ("id", "node_id", "about")) > 1:
            raise ParseError("rdf:nodeID can't be used with rdf:ID and rdf:about")
        # subject precedence: rdf:ID → rdf:nodeID → rdf:about → fresh bnode
        if "id" in ctx.rdf:
            subject = IRI(ctx.rdf["id"])
        elif "node_id" in ctx.rdf:
            subject = self.bnodes.generate_for(ctx.rdf["node_id"])
        elif "about" in ctx.rdf:
            subject = IRI(ctx.rdf["about"])
        else:
            subject = self.bnodes.generate()

        if ctx.rdf_local() != "Description":
            self._emit(subject, IRI(RDF_TYPE), ctx.uri)
        self._property_attr_triples(subject, ctx)

        self._require_ws_only_text(ctx.xml, f"node element {ctx.qname}")
        for child in ctx.xml.element_children():
            self.property_element(ElemCtx(child, ctx, None), subject, ctx)
        return subject

    def property_element(self, ctx: ElemCtx, subject, li_holder: ElemCtx) -> None:
        """rules.ex:113-171 (PropertyElt selection) + the seven forms."""
        self._check_rdf_id(ctx)
        if ctx.rdf_local() == "li":
            # rdf:li → rdf:_N with the counter of the enclosing node element
            ctx.uri = IRI(f"{RDF_NS}_{li_holder.li_counter}")
            ctx._rdf_local = f"_{li_holder.li_counter}"
            li_holder.li_counter += 1
        ctx.check_property_element_name()
        rdf = ctx.rdf
        pt = rdf.get("parse_type")
        if pt == "literal":
            self._parse_type_literal(ctx, subject)
        elif isinstance(pt, tuple):  # ("other", value)
            self._parse_type_other(ctx, subject)
        elif pt == "resource":
            self._parse_type_resource(ctx, subject)
        elif pt == "collection":
            self._parse_type_collection(ctx, subject)
        elif rdf.get("resource") is not None or rdf.get("node_id") is not None or ctx.prop_attrs:
            self._require_empty_content(ctx)
            self._empty_property(ctx, subject)
        else:
            element_children = ctx.xml.element_children()
            text = ctx.xml.text_content()
            if element_children:
                if text.strip():
                    raise ParseError(
                        f"unexpected mixed content in property element {ctx.qname}"
                    )
                if "datatype" in rdf:
                    raise ParseError(
                        f"rdf:datatype with element content in property element {ctx.qname}"
                    )
                if len(element_children) > 1:
                    raise ParseError(
                        f"multiple node elements in property element {ctx.qname}"
                    )
                # ResourcePropertyElt (rules.ex:216-239)
                child_subject = self.node_element(ElemCtx(element_children[0], ctx, None))
                statement = (subject, ctx.uri, child_subject)
                self._emit(*statement)
                if "id" in rdf:
                    self._reify(statement, rdf["id"])
            elif text:
                # LiteralPropertyElt (rules.ex:173-214); any present text —
                # including whitespace-only — wins, matching the reference's
                # surviving-branch outcome.
                self._literal_property(ctx, subject, text)
            else:
                self._empty_property(ctx, subject)

    def _require_empty_content(self, ctx: ElemCtx) -> None:
        if ctx.xml.element_children():
            raise ParseError(f"unexpected element content in {ctx.qname}")
        if ctx.xml.text_content().strip():
            raise ParseError(f"unexpected characters in {ctx.qname}")

    def _literal_property(self, ctx: ElemCtx, subject, text: str) -> None:
        if "datatype" in ctx.rdf:
            o = Literal(text, datatype=ctx.rdf["datatype"])
        elif ctx.lang:
            o = Literal(text, lang=ctx.lang)
        else:
            o = Literal(text)
        statement = (subject, ctx.uri, o)
        self._emit(*statement)
        if "id" in ctx.rdf:
            self._reify(statement, ctx.rdf["id"])

    def _empty_property(self, ctx: ElemCtx, subject) -> None:
        """EmptyPropertyElt (rules.ex:241-315)."""
        rdf = ctx.rdf
        if sum(k in rdf for k in ("resource", "node_id", "datatype")) > 1:
            raise ParseError(
                f"only one of rdf:resource, rdf:nodeID, rdf:datatype allowed on {ctx.qname}"
            )
        # Empty-literal case. The reference admits only {rdf:ID}
        # (rules.ex:310-314) and so turns `<p rdf:datatype="…"/>` into a
        # fresh-bnode object with the datatype silently unused (its own TODO
        # at rules.ex:244); we follow the spec's literalPropertyElt reading
        # instead — empty text + rdf:datatype is the empty typed literal —
        # which also makes such literals encoder-roundtrippable.
        if not ctx.prop_attrs and set(rdf) <= {"id", "datatype"}:
            if "datatype" in rdf:
                o = Literal("", datatype=rdf["datatype"])
            else:
                o = Literal("", lang=ctx.lang) if ctx.lang else Literal("")
            statement = (subject, ctx.uri, o)
            self._emit(*statement)
            if "id" in rdf:
                self._reify(statement, rdf["id"])
            return
        if rdf.get("resource") is not None:
            r = IRI(rdf["resource"])
        elif rdf.get("node_id") is not None:
            r = self.bnodes.generate_for(rdf["node_id"])
        else:
            r = self.bnodes.generate()
        statement = (subject, ctx.uri, r)
        if "id" in rdf:
            self._reify(statement, rdf["id"])
        self._emit(*statement)
        self._property_attr_triples(r, ctx)

    def _conform_parse_type(self, ctx: ElemCtx, allowed: str) -> None:
        # ParseType*PropertyElt conform?: no property attributes; no rdf
        # attributes besides rdf:ID and the parseType itself
        if ctx.prop_attrs:
            raise ParseError(f"property attributes not allowed on parseType {allowed}")
        extra = set(ctx.rdf) - {"id", "parse_type"}
        if extra:
            raise ParseError(
                f"attributes {sorted(extra)} not allowed on parseType {allowed} element {ctx.qname}"
            )

    def _parse_type_resource(self, ctx: ElemCtx, subject) -> None:
        """rules.ex:317-348."""
        self._conform_parse_type(ctx, "Resource")
        n = self.bnodes.generate()
        self._require_ws_only_text(ctx.xml, f"parseType Resource element {ctx.qname}")
        for child in ctx.xml.element_children():
            # children are property elements of the implicit bnode; rdf:li
            # numbering scopes to this property element (its own li_counter)
            self.property_element(ElemCtx(child, ctx, None), n, ctx)
        statement = (subject, ctx.uri, n)
        self._emit(*statement)
        if "id" in ctx.rdf:
            self._reify(statement, ctx.rdf["id"])

    def _parse_type_collection(self, ctx: ElemCtx, subject) -> None:
        """rules.ex:350-430 — cons-list construction, reference bnode
        allocation order preserved (members first, then head, then links)."""
        self._conform_parse_type(ctx, "Collection")
        self._require_ws_only_text(ctx.xml, f"parseType Collection element {ctx.qname}")
        member_subjects = [
            self.node_element(ElemCtx(child, ctx, None)) for child in ctx.xml.element_children()
        ]
        n = self.bnodes.generate()  # allocated even for the empty list (parity)
        if not member_subjects:
            statement = (subject, ctx.uri, IRI(RDF_NIL))
            self._emit(*statement)
            if "id" in ctx.rdf:
                self._reify(statement, ctx.rdf["id"])
            return
        statement = (subject, ctx.uri, n)
        self._emit(*statement)
        if "id" in ctx.rdf:
            self._reify(statement, ctx.rdf["id"])
        cell = n
        for i, member in enumerate(member_subjects):
            self._emit(cell, IRI(RDF_FIRST), member)
            if i == len(member_subjects) - 1:
                self._emit(cell, IRI(RDF_REST), IRI(RDF_NIL))
            else:
                nxt = self.bnodes.generate()
                self._emit(cell, IRI(RDF_REST), nxt)
                cell = nxt

    def _parse_type_literal(self, ctx: ElemCtx, subject) -> None:
        """rules.ex:432-468: capture the subtree verbatim, re-serialize with
        C14N-style namespace fixup (which the reference lacks — its
        xml-canon/xml-literal-namespaces gap, README.md:28)."""
        self._conform_parse_type(ctx, "Literal")
        lexical = serialize_xml_literal(ctx.xml.children, ctx.ns)
        o = Literal(lexical, datatype=RDF_XML_LITERAL)
        statement = (subject, ctx.uri, o)
        self._emit(*statement)
        if "id" in ctx.rdf:
            self._reify(statement, ctx.rdf["id"])

    def _parse_type_other(self, ctx: ElemCtx, subject) -> None:
        """rules.ex:470-488: subtree consumed, no triples emitted (divergence
        from spec pinned by the reference's decoder_test.exs:134-150)."""
        self._conform_parse_type(ctx, "Other")
        # content intentionally ignored


def serialize_xml_literal(children: list, inscope_ns: dict[str | None, str]) -> str:
    """Serialize captured XML content as an ``rdf:XMLLiteral`` lexical form.

    Exclusive-canonicalization-flavored: empty elements render as
    ``<x></x>``, and namespace declarations for *visibly used* prefixes are
    emitted on the outermost fragment element that uses them (goldens:
    w3c xml-canon/test001.nt, rdfms-xml-literal-namespaces/test001.nt).
    """
    out: list[str] = []

    def visible_prefixes(el: XmlElement) -> set[str | None]:
        used: set[str | None] = set()
        p, _ = split_qname(el.qname)
        used.add(p)
        for name, _v in el.attrs:
            if name == "xmlns" or name.startswith("xmlns:"):
                continue
            ap, _ = split_qname(name)
            if ap is not None and ap != "xml":
                used.add(ap)
        return used

    def emit(node, output_env: dict[str | None, str]):
        if isinstance(node, str):
            out.append(escape_text(node))
            return
        el: XmlElement = node
        env = dict(output_env)
        declared_here: dict[str | None, str] = {}
        for name, value in el.attrs:
            if name == "xmlns":
                declared_here[None] = value
            elif name.startswith("xmlns:"):
                declared_here[name[6:]] = value
        env.update(declared_here)

        added: list[tuple[str, str]] = []
        for prefix in sorted(visible_prefixes(el), key=lambda p: (p is not None, p or "")):
            target = inscope_ns.get(prefix)
            if target is None:
                continue  # prefix resolves only inside the fragment (or not at all)
            if env.get(prefix) != target and declared_here.get(prefix) != target:
                attr = "xmlns" if prefix is None else f"xmlns:{prefix}"
                added.append((attr, target))
                env[prefix] = target

        out.append(f"<{el.qname}")
        for name, value in added + el.attrs:
            out.append(f' {name}="{escape_attr(value)}"')
        out.append(">")
        for child in el.children:
            emit(child, env)
        out.append(f"</{el.qname}>")

    for node in children:
        emit(node, {})
    return "".join(out)


def parse_rdfxml(
    source: str | bytes,
    base: str | None = None,
    bnode_prefix: str = "b",
    unique: bool = True,
) -> Graph:
    """Decode one RDF/XML document to a ``Graph`` (decoder.ex:42-61).

    Raises ``ParseError`` on any syntax violation (the negative-case
    surface); callers in the Ray stages catch it and route the document to
    the rejects side-channel. ``unique=False`` returns a ``MultiGraph``
    (duplicates kept — cheaper; see _DocParser)."""
    root = parse_xml(source)
    return _DocParser(base, bnode_prefix, unique=unique).parse_doc(root)


def parse_rdfxml_stream(chunks, base: str | None = None, bnode_prefix: str = "b") -> Graph:
    """Decode an iterable of str/bytes chunks (``decode_from_stream``
    analogue, decoder.ex:52-53) — truly incremental: expat push-parses the
    chunks and each completed top-level description is walked through the
    grammar then pruned, so memory is O(largest description), never O(doc).
    See decoder/streaming.py (``iter_parse_rdfxml`` additionally bounds the
    output side by yielding triple batches)."""
    from .streaming import stream_parse_rdfxml

    return stream_parse_rdfxml(chunks, base=base, bnode_prefix=bnode_prefix)

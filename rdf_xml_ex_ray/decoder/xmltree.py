"""Expat-based XML reader producing a lightweight per-document element tree.

The reference decodes via streaming SAX (Saxy) because a whole-document tree
of an unbounded file would not fit in memory
(/root/reference/lib/rdf/xml/decoder/grammar/rules.ex:31-33). In our engine a
"document" is one rendered conversation — a single Arrow row of bounded size
inside a ``map_batches`` task — so building the (tiny) tree per row is both
simpler and faster, and removes the need for the reference's speculative
grammar branches (grammar.ex:69-104): with the whole element available,
production selection is deterministic.

No namespace processing happens here: names and attributes are kept exactly
as written (like Saxy), and namespace resolution is done by the grammar layer
with reference-equivalent precedence.
"""

from __future__ import annotations

import xml.parsers.expat

from ..core.terms import ParseError


class XmlElement:
    __slots__ = ("qname", "attrs", "children")

    def __init__(self, qname: str, attrs: list[tuple[str, str]]):
        self.qname = qname
        self.attrs = attrs  # [(name, value)] in document order, as written
        self.children: list = []  # XmlElement | str (text)

    def element_children(self) -> list["XmlElement"]:
        return [c for c in self.children if isinstance(c, XmlElement)]

    def text_content(self) -> str:
        ch = self.children
        if not ch:
            return ""
        if len(ch) == 1 and type(ch[0]) is str:  # the overwhelmingly common case
            return ch[0]
        return "".join(c for c in ch if isinstance(c, str))


def parse_xml(data: str | bytes) -> XmlElement:
    """Parse an XML document string into an ``XmlElement`` tree.

    Raises ``ParseError`` on malformed XML (the decode-side error surface for
    the W3C negative-syntax cases that are XML-level violations).
    """
    parser = xml.parsers.expat.ParserCreate()
    parser.ordered_attributes = True
    parser.buffer_text = True
    # Forbid external entity resolution (documents are untrusted content).
    parser.SetParamEntityParsing(xml.parsers.expat.XML_PARAM_ENTITY_PARSING_NEVER)

    root: list[XmlElement] = []
    stack: list[XmlElement] = []

    def start(name: str, attr_list: list):
        if attr_list:
            it = iter(attr_list)
            attrs = list(zip(it, it))  # one pass, no [::2] slice copies
        else:
            attrs = attr_list
        el = XmlElement(name, attrs)
        if stack:
            stack[-1].children.append(el)
        else:
            root.append(el)
        stack.append(el)

    def end(_name: str):
        stack.pop()

    def chars(data: str):
        if stack:
            parent = stack[-1]
            if parent.children and isinstance(parent.children[-1], str):
                parent.children[-1] += data
            else:
                parent.children.append(data)

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars

    try:
        if isinstance(data, str):
            data = data.encode("utf-8")
        parser.Parse(data, True)
    except xml.parsers.expat.ExpatError as e:
        raise ParseError(f"XML parse error: {e}") from None
    if not root:
        raise ParseError("empty XML document")
    return root[0]

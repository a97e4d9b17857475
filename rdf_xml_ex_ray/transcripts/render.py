"""Deterministic conversation → RDF/XML renderer.

One document per conversation; turns serialized in ``turn_idx`` order (the
stable-order invariant of BASELINE.json.input_hint). The rendered markup
deliberately exercises the grammar productions the reference's decoder covers
(rules.ex): typed node elements (G4), nested node elements (G8), datatyped +
lang-tagged literal property elements (G7), rdf:resource empties (G9) and
parseType="Resource" with a fresh blank node per tool call (G10) — so the
flagship pipeline drives the same code paths the W3C suite certifies.

Blank-node determinism: the only bnode-allocating construct is ct:toolUse, in
turn order, so with ``bnode_prefix=f"{conv_id}!b"`` the k-th tool turn of a
conversation always yields ``{conv_id}!b{k}`` — reproducible across retries
and expressible in the DuckDB oracle.
"""

from __future__ import annotations

from ..core.terms import RDF_NS, escape_attr, escape_text
from .ontology import (
    CT_NS,
    TEXT_LANG,
    TOOL_USE,
    XSD_INTEGER,
    XSD_LONG,
    conv_iri,
    role_iri,
    tool_iri,
    turn_iri,
)

_HEADER = (
    '<?xml version="1.0" encoding="utf-8"?>'
    f'<rdf:RDF xmlns:ct="{CT_NS}" xmlns:rdf="{RDF_NS}">'
)


def render_conversation(
    conv_id: str,
    turns: list[tuple[str, str, str | None, int]],
) -> str:
    """``turns`` = [(role, text, tool|None, ts_us)] already in turn order."""
    parts = [_HEADER, f'<ct:Conversation rdf:about="{escape_attr(conv_iri(conv_id))}">']
    for turn_idx, (role, text, tool, ts_us) in enumerate(turns):
        parts.append("<ct:turn>")
        parts.append(f'<ct:Turn rdf:about="{escape_attr(turn_iri(conv_id, turn_idx))}">')
        parts.append(f'<ct:index rdf:datatype="{XSD_INTEGER}">{turn_idx}</ct:index>')
        parts.append(f'<ct:role rdf:resource="{escape_attr(role_iri(role))}"/>')
        parts.append(f'<ct:text xml:lang="{TEXT_LANG}">{escape_text(text)}</ct:text>')
        parts.append(f'<ct:tsMicros rdf:datatype="{XSD_LONG}">{ts_us}</ct:tsMicros>')
        if tool is not None:
            parts.append(
                '<ct:toolUse rdf:parseType="Resource">'
                f'<rdf:type rdf:resource="{TOOL_USE}"/>'
                f'<ct:tool rdf:resource="{escape_attr(tool_iri(tool))}"/>'
                "</ct:toolUse>"
            )
        parts.append("</ct:Turn>")
        parts.append("</ct:turn>")
    parts.append("</ct:Conversation></rdf:RDF>")
    return "".join(parts)

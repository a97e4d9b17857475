"""Conversation/transcript ontology for the KG-construction pipeline.

IRI scheme + role/tool vocabulary. Deliberately simple and *deterministic*:
every IRI is a pure function of the input row, so the Ray pipeline and the
DuckDB oracle SQL (see __ray_entry__.oracle_sql) can derive identical triples
independently.
"""

from __future__ import annotations

CT_NS = "http://example.org/convo#"
CONV_NS = "http://example.org/conv/"
ROLE_NS = "http://example.org/role/"
TOOL_NS = "http://example.org/tool/"

XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_LONG = "http://www.w3.org/2001/XMLSchema#long"

PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "ct": CT_NS,
}

# classes / properties
CONVERSATION = CT_NS + "Conversation"
TURN = CT_NS + "Turn"
TOOL_USE = CT_NS + "ToolUse"
P_TURN = CT_NS + "turn"
P_INDEX = CT_NS + "index"
P_ROLE = CT_NS + "role"
P_TEXT = CT_NS + "text"
P_TS = CT_NS + "tsMicros"
P_TOOL_USE = CT_NS + "toolUse"
P_TOOL = CT_NS + "tool"

TEXT_LANG = "en"

# Entity linking: raw role mentions → canonical role entity. The raw values
# are what the (noisy) transcript source emits; the registry is the small
# broadcast side of the linking stage (SURVEY.md §2.6).
ROLE_ALIASES = {
    "system": "system",
    "sys": "system",
    "user": "user",
    "usr": "user",
    "human": "user",
    "assistant": "assistant",
    "ai": "assistant",
    "bot": "assistant",
    "tool": "tool",
    "function": "tool",
}


def conv_iri(conv_id: str) -> str:
    return CONV_NS + conv_id


def turn_iri(conv_id: str, turn_idx: int) -> str:
    return f"{CONV_NS}{conv_id}/turn/{turn_idx}"


def role_iri(role: str) -> str:
    return ROLE_NS + role


def tool_iri(tool: str) -> str:
    return TOOL_NS + tool


def canonical_role(raw: str) -> str:
    return ROLE_ALIASES.get(raw.lower(), raw.lower())

"""BIND string-function parity on hostile text: the Arrow kernels
(utf8_upper/lower, utf8_slice_codeunits, utf8_length,
replace_substring_regex, binary_join_element_wise) must agree byte-for-byte
with DuckDB's upper/lower, substring, length, regexp_replace('g') and ||
on Unicode case edges (ß→ẞ, dotted İ, titlecase ǳ, ligature ﬁ, final
sigma), astral codepoints (emoji count as ONE), combining marks, RTL text
and embedded controls — the probe behind the kg_sparql_strfns oracle."""

import duckdb
import pyarrow as pa
import pytest

HOSTILE = [
    "straße", "İstanbul", "ǳungle", "ﬁle", "ß", "ʼn",
    "ΣΊΣΥΦΟΣ", "σίσυφος", "ΌΣος τελικός",
    "emoji 🎉 twice 🎉!", "astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 math",
    "combining é vs precomposed é",  # e+U+0301 vs U+00E9
    "عربى mixed العربية text", "עברית rtl",
    "tab\tand\nnewline\rcr", "  spaces  ",
    "", "a", "Ab", "ALL CAPS", "no-caps",
    "quote\"s and back\\slash", "null\x1fsep",
]


def test_bind_string_fns_match_duckdb(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for i, s in enumerate(HOSTILE):
        cols["subj"].append(f"s{i:02d}"); cols["subj_kind"].append("iri")
        cols["pred"].append("http://e/t"); cols["obj_kind"].append("literal")
        cols["obj_value"].append(s); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    got = sparql_select(
        ds,
        """
        SELECT ?s ?u ?l ?m ?r ?c (STRLEN(?v) AS ?n)
        WHERE {
          ?s <http://e/t> ?v .
          BIND(UCASE(?v) AS ?u) BIND(LCASE(?v) AS ?l)
          BIND(SUBSTR(?v, 2, 5) AS ?m)
          BIND(REPLACE(?v, "[aeiou]+", "_") AS ?r)
          BIND(CONCAT(?s, "|", ?v, "|", ?u) AS ?c)
        } ORDER BY ?s
        """,
    ).to_pandas()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS s, unnest(?) AS v)",
        [[f"s{i:02d}" for i in range(len(HOSTILE))], HOSTILE],
    )
    want = con.execute(
        """
        SELECT s, upper(v) AS u, lower(v) AS l, substring(v, 2, 5) AS m,
               regexp_replace(v, '[aeiou]+', '_', 'g') AS r,
               s || '|' || v || '|' || upper(v) AS c,
               CAST(length(v) AS VARCHAR) AS n
        FROM t ORDER BY s
        """
    ).df()

    for col in ("u", "l", "m", "r", "c", "n"):
        g = got[col].tolist()
        w = want[col].tolist()
        assert g == w, (col, [(a, b) for a, b in zip(g, w) if a != b][:3])

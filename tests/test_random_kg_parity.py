"""Randomized-KG oracle parity: seeded random event logs whose ``props``
strings are XML-hostile (``< > & " '``, tabs, newlines, CR, unicode,
multi-byte) must keep the FULL flagship path — transcript derivation →
RDF/XML render → expat parse → link → canonicalize — byte-identical to
the SQL twin's plain string concatenation. This is the pipeline-level
escaping/roundtrip gate: the SQL oracle never sees XML, so any escaping
asymmetry in the renderer/parser pair shows up as a value-hash diff."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# XML-representable hostile fragments (XML 1.0 cannot carry C0 controls
# other than \t \n \r — those are excluded by construction, not by luck)
_FRAGMENTS = [
    "<tag>", "&amp;", "&", "<", ">", '"quoted"', "'single'",
    "a]]>b", "tab\there", "line\nbreak", "cr\rreturn",
    "café", "naïve", "☃ snowman", "\U0001F600 emoji",
    "mixed <x a='1'> & \"q\" end", "", "plain",
]

_ETYPES = ["signup", "view", "click", "purchase", "error"]


def _make_events(seed: int, n: int = 800):
    rng = np.random.RandomState(seed)
    user = rng.randint(0, 25, size=n)
    ts = np.sort(rng.randint(0, 30 * 86_400_000_000, size=n).astype("int64"))
    etype = np.asarray(_ETYPES)[rng.randint(0, len(_ETYPES), size=n)]
    parts = [
        "".join(_FRAGMENTS[k] for k in rng.randint(0, len(_FRAGMENTS), size=3))
        for _ in range(n)
    ]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user.astype("int64"), pa.int64()),
            "event_type": pa.array(list(etype), pa.string()),
            "value": pa.array(np.round(rng.rand(n) * 100, 3), pa.float64()),
            "props": pa.array(parts, pa.string()),
        }
    )


KG_OPS = [
    "kg_triples", "kg_conv_stats", "kg_pred_counts", "kg_bgp", "kg_quads", "kg_sparql",
    "kg_describe", "kg_char_sets", "kg_cardinality_profile",
    "kg_triangle_count", "kg_pattern_join", "kg_shacl_check", "kg_void_stats",
    "kg_sparql_sum", "kg_sparql_having", "kg_sparql_alt", "kg_sparql_minus", "kg_sparql_values_multi",
    "kg_sparql_path_plus", "kg_sparql_rollup",
]


@pytest.mark.parametrize("seed", [7, 41])
@pytest.mark.parametrize("name", KG_OPS)
def test_random_kg_oracle_parity(ray_session, tmp_path_factory, seed, name):
    import duckdb

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp(f"randkg{seed}")
    pq.write_table(_make_events(seed), d / "events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")

    result = e.queries()[name](str(d))
    rdf = result.to_pandas() if hasattr(result, "to_pandas") else result
    sdf = con.execute(e.oracle_sql()[name]).fetchdf()
    cols = sorted(rdf.columns)
    assert cols == sorted(sdf.columns)
    a = rdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows (seed {seed})"
    assert a.equals(b), f"{name} diverges on XML-hostile random events (seed {seed})"

"""End-to-end over the input_hint-shaped transcripts table (the shape a user
with real transcript parquet brings): seeded synthetic generator → flagship
topology → invariants."""

import pyarrow.compute as pc

from rdf_xml_ex_ray.transcripts.ontology import P_TEXT, P_TOOL_USE, turn_iri
from rdf_xml_ex_ray.transcripts.synth import generate_transcripts


def test_generator_deterministic_and_shaped():
    a = generate_transcripts(20, seed=7)
    b = generate_transcripts(20, seed=7)
    assert a.equals(b)
    assert a.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(a.schema.field("turn_idx").type) == "int32"
    assert str(a.schema.field("ts").type) == "timestamp[us]"
    # skewed text lengths: some large turns exist
    lens = pc.utf8_length(a["text"]).to_pylist()
    assert max(lens) > 20 * min(lens)


def test_transcripts_pipeline_invariants(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.pipelines.kg import kg_triples_from_transcripts

    table = generate_transcripts(60, seed=11)
    ds = rd.from_arrow(table)
    out = kg_triples_from_transcripts(ds, num_buckets=8, num_conv_buckets=8).to_pandas()

    n_turns = table.num_rows
    n_convs = pc.count_distinct(table["conv_id"]).as_py()
    n_tools = table.num_rows - table.column("tool").null_count
    # triple count formula: 1 + 6*turns + 3*tool-calls per conversation
    assert len(out) == n_convs + 6 * n_turns + 3 * n_tools

    # per-turn text equality under stable (conv_id, turn_idx) ordering
    texts = out[out["pred"] == P_TEXT].set_index("subj")["obj_value"]
    for conv, idx, text in zip(
        table["conv_id"].to_pylist()[:200],
        table["turn_idx"].to_pylist()[:200],
        table["text"].to_pylist()[:200],
    ):
        assert texts[turn_iri(conv, idx)] == text

    # conversation-scoped bnode labels
    bnodes = out[out["pred"] == P_TOOL_USE]["obj_value"]
    assert all("!b" in b and b.split("!")[0].startswith("conv-") for b in bnodes)

"""DuckDB oracle SQL for the KG pipelines (driver correctness gate).

Every query in __ray_entry__.queries() with SQL-expressible semantics has its
ANSI-SQL twin here, producing identical column names and values on the same
parquet views — including the deterministic blank-node labels (the renderer
allocates toolUse bnodes in turn order, so the k-th tool turn of a
conversation is ``{conv_id}!b{k}``; render.py docstring).
"""

RDF_TYPE_SQL = "'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'"

# Shared CTE: events → transcript turns (mirrors transcripts/derive.py +
# stages/render.py ordering + stages/linker.py role canonicalization).
TURNS_CTE = """
WITH t AS (
  SELECT
    'c' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
    CASE event_type
      WHEN 'signup' THEN 'System'
      WHEN 'view' THEN 'user'
      WHEN 'click' THEN 'usr'
      WHEN 'purchase' THEN 'AI'
      ELSE 'tool' END AS raw_role,
    event_type || ' <' || props || '> &co' AS text,
    CASE WHEN event_type IN ('purchase','error') THEN event_type END AS tool,
    epoch_us(ts) AS ts_us
  FROM events
),
turns AS (
  SELECT
    conv_id, turn_idx, text, tool, ts_us,
    'http://example.org/conv/' || conv_id AS conv_iri,
    'http://example.org/conv/' || conv_id || '/turn/' || turn_idx AS turn_iri,
    'http://example.org/role/' ||
      CASE lower(raw_role)
        WHEN 'sys' THEN 'system'
        WHEN 'usr' THEN 'user'
        WHEN 'human' THEN 'user'
        WHEN 'ai' THEN 'assistant'
        WHEN 'bot' THEN 'assistant'
        WHEN 'function' THEN 'tool'
        ELSE lower(raw_role) END AS role_iri,
    CASE WHEN tool IS NOT NULL THEN
      conv_id || '!b' ||
      (row_number() OVER (PARTITION BY conv_id, (tool IS NOT NULL) ORDER BY turn_idx) - 1)
    END AS tool_bnode
  FROM t
)
"""

_N = "CAST(NULL AS VARCHAR)"

KG_TRIPLES_SQL = (
    TURNS_CTE
    + f"""
SELECT DISTINCT conv_iri AS subj, 'iri' AS subj_kind, {RDF_TYPE_SQL} AS pred,
       'iri' AS obj_kind, 'http://example.org/convo#Conversation' AS obj_value,
       {_N} AS obj_lang, {_N} AS obj_datatype
FROM turns
UNION ALL
SELECT conv_iri, 'iri', 'http://example.org/convo#turn', 'iri', turn_iri, {_N}, {_N} FROM turns
UNION ALL
SELECT turn_iri, 'iri', {RDF_TYPE_SQL}, 'iri', 'http://example.org/convo#Turn', {_N}, {_N} FROM turns
UNION ALL
SELECT turn_iri, 'iri', 'http://example.org/convo#index', 'literal', CAST(turn_idx AS VARCHAR),
       {_N}, 'http://www.w3.org/2001/XMLSchema#integer' FROM turns
UNION ALL
SELECT turn_iri, 'iri', 'http://example.org/convo#role', 'iri', role_iri, {_N}, {_N} FROM turns
UNION ALL
SELECT turn_iri, 'iri', 'http://example.org/convo#text', 'literal', text, 'en', {_N} FROM turns
UNION ALL
SELECT turn_iri, 'iri', 'http://example.org/convo#tsMicros', 'literal', CAST(ts_us AS VARCHAR),
       {_N}, 'http://www.w3.org/2001/XMLSchema#long' FROM turns
UNION ALL
SELECT turn_iri, 'iri', 'http://example.org/convo#toolUse', 'bnode', tool_bnode, {_N}, {_N}
FROM turns WHERE tool IS NOT NULL
UNION ALL
SELECT tool_bnode, 'bnode', {RDF_TYPE_SQL}, 'iri', 'http://example.org/convo#ToolUse', {_N}, {_N}
FROM turns WHERE tool IS NOT NULL
UNION ALL
SELECT tool_bnode, 'bnode', 'http://example.org/convo#tool', 'iri',
       'http://example.org/tool/' || tool, {_N}, {_N}
FROM turns WHERE tool IS NOT NULL
"""
)

KG_CONV_STATS_SQL = (
    TURNS_CTE
    + """
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(tool) AS BIGINT) AS n_tool_calls,
       CAST(1 + 6 * count(*) + 3 * count(tool) AS BIGINT) AS n_triples
FROM turns
GROUP BY conv_id
"""
)

KG_PRED_COUNTS_SQL = (
    "WITH trip AS (" + KG_TRIPLES_SQL + ")\n"
    "SELECT pred, CAST(count(*) AS BIGINT) AS n FROM trip GROUP BY pred"
)

# bnode-free projection used by the encode→decode roundtrip query (blank-node
# labels are regenerated on reparse, so the roundtrip compares the IRI-subject
# sub-graph; full bnode roundtrip is covered isomorphically in pytest).
KG_TRIPLES_NOBNODE_SQL = (
    "WITH trip AS (" + KG_TRIPLES_SQL + ")\n"
    "SELECT * FROM trip WHERE subj_kind = 'iri' AND obj_kind <> 'bnode'"
)

# kg_store_diff oracle: diff(full, base) over conversation-separable stores
# is exactly the delta partition's triples, all 'added' (kg.py kg_store_diff;
# delta = conversations with user_id % 10 == 0, matching INCR_DELTA_MOD).
KG_STORE_DIFF_SQL = (
    "WITH trip AS ("
    + KG_TRIPLES_SQL.replace("FROM events", "FROM events WHERE user_id % 10 = 0")
    + ")\nSELECT 'added' AS change, * FROM trip"
)

KG_TOP_ENTITIES_SQL = (
    "WITH trip AS (" + KG_TRIPLES_SQL + ")\n"
    """SELECT obj_value AS entity, CAST(count(*) AS BIGINT) AS n
FROM trip WHERE obj_kind = 'iri'
GROUP BY obj_value
ORDER BY n DESC, entity ASC
LIMIT 10"""
)

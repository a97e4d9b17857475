"""Python/SQL operator-pair parity on hostile text: Unicode whitespace,
ASCII control whitespace, apostrophes, empty and single-word docs. Pins the
ASCII_WS contract (every oracle pair shares one explicit whitespace class —
Python's \\s and str.split() would otherwise diverge from DuckDB RE2)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

NASTY_TEXTS = [
    "plain words here",
    "tab\tseparated\tand spaced",
    "vertical\x0btab and form\x0cfeed",
    "nbsp\xa0stuck together",  # NBSP: NOT a separator under ASCII_WS — both engines agree
    "unicode em-space and line-sep",
    "",
    "single",
    "it's the dog's and they're we've I'm we'll I'd",
    "  leading and trailing  ",
    "crlf\r\nline",
    "punct!!! mixed, with (parens) & symbols %% end.",
    "the quick brown fox jumps over the lazy dog",
    "der die das und ist nicht ein mit zu für",
    "número uno: café naïve résumé",
    # PII-shaped inputs (doc_pii_scrub: \b is the ASCII boundary both sides)
    "mail a@b.co or x.y+z@sub.domain.org today",
    "hosts 10.0.0.1 and 192.168.255.254, bogus 999.999.999.999x",
    "acct 123456789 vs short 12345678 and café9123456789 touch",
    "a@b.c edge, v4-ish 1.2.3.4.5 run-on, id00000000017",
    "email@domain.org.12.34.56.78 adjacency test 0x123456789",
    # \x1f (unit separator) inside tokens: doc_lm_coverage's bigram key is
    # length-prefixed exactly so "a\x1fb","c" cannot collide with "a","b\x1fc"
    "a\x1fb c a\x1fb c d",
    "a b\x1fc a b\x1fc d",
    # search-op targets: the conjunctive terms and the phrase, delimited by
    # HOSTILE whitespace (tab/CR/FF) — the ASCII_WS boundary must match
    "table\thash join\rfast table",
    "fast\x0cjoin table hash table hash",
    "join fast TABLE Hash table  hash",
]


@pytest.fixture(scope="module")
def nasty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(NASTY_TEXTS)), pa.int64()),
            "text": pa.array(NASTY_TEXTS, pa.string()),
            "source": pa.array(
                ["s" + str(i % 3) for i in range(len(NASTY_TEXTS))], pa.string()
            ),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def nasty_duck(nasty_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{nasty_dir}/documents.parquet'")
    return con


TEXT_OPS = ["token_count", "lang_id", "doc_stats", "doc_fingerprint", "doc_winnow", "doc_pii_scrub",
            "dedup_simhash", "dedup_exact",
            "doc_substring_dedup", "doc_blocklist_filter", "doc_lm_coverage", "corpus_shuffle",
            "corpus_search", "corpus_phrase_search", "corpus_bm25"]


@pytest.mark.parametrize("name", TEXT_OPS)
def test_text_operator_sql_parity_on_nasty_input(ray_session, nasty_dir, nasty_duck, name):
    import __ray_entry__ as e

    result = e.queries()[name](nasty_dir)
    rdf = result.to_pandas() if hasattr(result, "to_pandas") else result
    sdf = nasty_duck.execute(e.oracle_sql()[name]).fetchdf()
    cols = sorted(rdf.columns)
    assert cols == sorted(sdf.columns)
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = sdf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if a[c].dtype.kind == "f":
            a[c] = a[c].round(6)
            b[c] = b[c].round(6)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    assert a.equals(b[cols]), f"{name} diverges on nasty input\n{a}\n{b}"

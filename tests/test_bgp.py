"""BGP executor: planner ordering, disconnected rejection, repeated-var
filters, and executor-vs-hand-joined-pandas equivalence on a tiny graph."""

import pandas as pd
import pyarrow as pa
import pytest

from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
from rdf_xml_ex_ray.pipelines.bgp import _order_patterns, bgp_execute


def _triples_table(rows):
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s)
        cols["subj_kind"].append("iri")
        cols["pred"].append(p)
        cols["obj_kind"].append("iri")
        cols["obj_value"].append(o)
        cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    return pa.table(cols, schema=TRIPLE_SCHEMA)


TINY = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "knows", "c"),
    ("c", "knows", "a"),
    ("a", "type", "Person"),
    ("b", "type", "Person"),
    ("c", "type", "Robot"),
    ("loop", "knows", "loop"),
    ("loop", "type", "Person"),
]


def test_order_starts_at_most_constant():
    pats = [("?x", "knows", "?y"), ("?y", "type", "Robot")]
    assert _order_patterns(pats)[0] == ("?y", "type", "Robot")


def test_order_rejects_cartesian():
    with pytest.raises(ValueError, match="disconnected"):
        _order_patterns([("?x", "knows", "?y"), ("?a", "type", "?b")])


def test_projection_must_be_bound():
    import ray.data as rd

    ds = rd.from_arrow(_triples_table(TINY))
    with pytest.raises(ValueError, match="not bound"):
        bgp_execute(ds, [("?x", "type", "Person")], ["x", "nope"])


def test_bgp_matches_pandas_joins(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_triples_table(TINY))
    # friends-of-friends where the endpoint is a Robot
    pats = [
        ("?x", "knows", "?y"),
        ("?y", "knows", "?z"),
        ("?z", "type", "Robot"),
    ]
    got = (
        bgp_execute(ds, pats, ["x", "y", "z"])
        .to_pandas()
        .sort_values(["x", "y", "z"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(TINY, columns=["s", "p", "o"])
    knows = df[df.p == "knows"][["s", "o"]]
    robots = df[(df.p == "type") & (df.o == "Robot")][["s"]]
    exp = (
        knows.rename(columns={"s": "x", "o": "y"})
        .merge(knows.rename(columns={"s": "y", "o": "z"}), on="y")
        .merge(robots.rename(columns={"s": "z"}), on="z")
        .sort_values(["x", "y", "z"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    assert len(got) > 0


def test_constant_only_pattern_is_existence_check(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_triples_table(TINY))
    # present constant pattern: unit solution — rest of the BGP unaffected
    got = bgp_execute(
        ds, [("a", "knows", "b"), ("?x", "type", "Robot")], ["x"]
    ).to_pandas()
    assert got["x"].tolist() == ["c"]
    # absent constant pattern: zero solutions, schema preserved (check via
    # .schema() — Ray's to_pandas drops column names on 0-row datasets)
    empty = bgp_execute(ds, [("a", "knows", "zz"), ("?x", "type", "Robot")], ["x"])
    assert empty.count() == 0 and empty.schema().names == ["x"]
    # a BGP of only constant patterns has nothing to bind — reject loudly
    with pytest.raises(ValueError, match="only constant"):
        bgp_execute(ds, [("a", "knows", "b")], [])


def test_repeated_var_self_loop(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_triples_table(TINY))
    got = bgp_execute(ds, [("?x", "knows", "?x")], ["x"]).to_pandas()
    assert got["x"].tolist() == ["loop"]

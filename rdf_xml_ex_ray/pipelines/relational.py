"""Relational → KG direct mapping (W3C Direct Mapping flavor) over the
TPC-H-ish tables: every row becomes a subject IRI, columns become literal
predicates, foreign keys become IRI edges — the standard way an RDF engine
ingests relational data (reference ecosystem parity: RDF.ex's ecosystem
ships table→RDF mappers; the semantics here are the public W3C
direct-mapping rules, simplified to the columns present).

Ray-Data-first: one column-pruned ``read_parquet`` + vectorized
``map_batches`` per table — all 7 TPC-H-ish tables including the lineitem
fact table at ~10× the rows — unioned into one triple stream with no
shuffle at all; canonical ordering is the store's job.
Formatting is pinned for oracle parity: floats as %.2f on both engines,
dates as ISO 'YYYY-MM-DD'.
"""

from __future__ import annotations

import os

import pyarrow as pa

NS = "urn:tpch:"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _sql_table(table: str, key: str, cls: str, lits: list[tuple[str, str]],
               fks: list[tuple[str, str, str]]) -> str:
    subj = f"'{NS}{table}/' || CAST({key} AS VARCHAR)"
    parts = [
        f"SELECT {subj} AS subj, '{RDF_TYPE}' AS pred, 'iri' AS obj_kind, "
        f"'{NS}{cls}' AS obj_value FROM {table}"
    ]
    for col, expr in lits:
        parts.append(
            f"SELECT {subj}, '{NS}{table}#{col}', 'literal', {expr} FROM {table}"
        )
    for col, target, fk in fks:
        parts.append(
            f"SELECT {subj}, '{NS}{table}#{col}', 'iri', "
            f"'{NS}{target}/' || CAST({fk} AS VARCHAR) FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)


KG_DIRECT_MAPPING_SQL = "\nUNION ALL\n".join(
    [
        _sql_table(
            "region", "r_regionkey", "Region", [("name", "r_name")], []
        ),
        _sql_table(
            "nation", "n_nationkey", "Nation", [("name", "n_name")],
            [("region", "region", "n_regionkey")],
        ),
        _sql_table(
            "customer", "c_custkey", "Customer",
            [("name", "c_name"), ("acctbal", "printf('%.2f', c_acctbal)"),
             ("mktsegment", "c_mktsegment")],
            [("nation", "nation", "c_nationkey")],
        ),
        _sql_table(
            "orders", "o_orderkey", "Order",
            [("orderstatus", "o_orderstatus"),
             ("totalprice", "printf('%.2f', o_totalprice)"),
             ("orderdate", "CAST(o_orderdate AS VARCHAR)"),
             ("orderpriority", "o_orderpriority")],
            [("customer", "customer", "o_custkey")],
        ),
        _sql_table(
            "supplier", "s_suppkey", "Supplier",
            [("name", "s_name"), ("acctbal", "printf('%.2f', s_acctbal)")],
            [("nation", "nation", "s_nationkey")],
        ),
        _sql_table(
            "part", "p_partkey", "Part",
            [("name", "p_name"), ("brand", "p_brand"), ("type", "p_type"),
             ("size", "CAST(p_size AS VARCHAR)"),
             ("retailprice", "printf('%.2f', p_retailprice)")],
            [],
        ),
        # lineitem — the fact table, ~10× every other table's rows: the part
        # of a direct mapping that actually stresses volume (round-2 verdict
        # directive 6). Composite key (orderkey, linenumber).
        _sql_table(
            "lineitem",
            "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)",
            "Lineitem",
            [("quantity", "printf('%.2f', l_quantity)"),
             ("extendedprice", "printf('%.2f', l_extendedprice)"),
             ("discount", "printf('%.2f', l_discount)"),
             ("tax", "printf('%.2f', l_tax)"),
             ("returnflag", "l_returnflag"),
             ("linestatus", "l_linestatus"),
             ("shipdate", "strftime(l_shipdate, '%Y-%m-%d')")],
            [("order", "orders", "l_orderkey"),
             ("part", "part", "l_partkey"),
             ("supplier", "supplier", "l_suppkey")],
        ),
    ]
)


def _emit(table: str, key_vals, cls: str, lit_cols: dict, fk_cols: dict) -> pa.Table:
    subj_base = f"{NS}{table}/"
    subjs, preds, kinds, vals = [], [], [], []
    for i, k in enumerate(key_vals):
        s = f"{subj_base}{k}"
        subjs.append(s)
        preds.append(RDF_TYPE)
        kinds.append("iri")
        vals.append(f"{NS}{cls}")
        for col, colvals in lit_cols.items():
            subjs.append(s)
            preds.append(f"{NS}{table}#{col}")
            kinds.append("literal")
            vals.append(colvals[i])
        for col, (target, fkvals) in fk_cols.items():
            subjs.append(s)
            preds.append(f"{NS}{table}#{col}")
            kinds.append("iri")
            vals.append(f"{NS}{target}/{fkvals[i]}")
    return pa.table(
        {
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj_kind": pa.array(kinds, pa.string()),
            "obj_value": pa.array(vals, pa.string()),
        }
    )


def kg_direct_mapping(sf_dir: str):
    """Seven tables → one Dataset of (subj, pred, obj_kind, obj_value)."""
    import ray.data as rd

    def region_rows(b: pa.Table) -> pa.Table:
        return _emit(
            "region", b["r_regionkey"].to_pylist(), "Region",
            {"name": b["r_name"].to_pylist()}, {},
        )

    def nation_rows(b: pa.Table) -> pa.Table:
        return _emit(
            "nation", b["n_nationkey"].to_pylist(), "Nation",
            {"name": b["n_name"].to_pylist()},
            {"region": ("region", b["n_regionkey"].to_pylist())},
        )

    def customer_rows(b: pa.Table) -> pa.Table:
        return _emit(
            "customer", b["c_custkey"].to_pylist(), "Customer",
            {
                "name": b["c_name"].to_pylist(),
                "acctbal": [f"{x:.2f}" for x in b["c_acctbal"].to_pylist()],
                "mktsegment": b["c_mktsegment"].to_pylist(),
            },
            {"nation": ("nation", b["c_nationkey"].to_pylist())},
        )

    def orders_rows(b: pa.Table) -> pa.Table:
        return _emit(
            "orders", b["o_orderkey"].to_pylist(), "Order",
            {
                "orderstatus": b["o_orderstatus"].to_pylist(),
                "totalprice": [f"{x:.2f}" for x in b["o_totalprice"].to_pylist()],
                "orderdate": [str(d) for d in b["o_orderdate"].to_pylist()],
                "orderpriority": b["o_orderpriority"].to_pylist(),
            },
            {"customer": ("customer", b["o_custkey"].to_pylist())},
        )

    def tbl(name, fn, cols):
        return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=cols).map_batches(
            fn, batch_format="pyarrow"
        )

    def supplier_rows(b: pa.Table) -> pa.Table:
        return _emit(
            "supplier", b["s_suppkey"].to_pylist(), "Supplier",
            {
                "name": b["s_name"].to_pylist(),
                "acctbal": [f"{x:.2f}" for x in b["s_acctbal"].to_pylist()],
            },
            {"nation": ("nation", b["s_nationkey"].to_pylist())},
        )

    def part_rows(b: pa.Table) -> pa.Table:
        return _emit(
            "part", b["p_partkey"].to_pylist(), "Part",
            {
                "name": b["p_name"].to_pylist(),
                "brand": b["p_brand"].to_pylist(),
                "type": b["p_type"].to_pylist(),
                "size": [str(x) for x in b["p_size"].to_pylist()],
                "retailprice": [f"{x:.2f}" for x in b["p_retailprice"].to_pylist()],
            },
            {},
        )

    def lineitem_rows(b: pa.Table) -> pa.Table:
        keys = [
            f"{ok}-{ln}"
            for ok, ln in zip(b["l_orderkey"].to_pylist(), b["l_linenumber"].to_pylist())
        ]
        return _emit(
            "lineitem", keys, "Lineitem",
            {
                "quantity": [f"{x:.2f}" for x in b["l_quantity"].to_pylist()],
                "extendedprice": [f"{x:.2f}" for x in b["l_extendedprice"].to_pylist()],
                "discount": [f"{x:.2f}" for x in b["l_discount"].to_pylist()],
                "tax": [f"{x:.2f}" for x in b["l_tax"].to_pylist()],
                "returnflag": b["l_returnflag"].to_pylist(),
                "linestatus": b["l_linestatus"].to_pylist(),
                "shipdate": [d.strftime("%Y-%m-%d") for d in b["l_shipdate"].to_pylist()],
            },
            {
                "order": ("orders", b["l_orderkey"].to_pylist()),
                "part": ("part", b["l_partkey"].to_pylist()),
                "supplier": ("supplier", b["l_suppkey"].to_pylist()),
            },
        )

    ds = tbl("region", region_rows, ["r_regionkey", "r_name"])
    ds = ds.union(tbl("nation", nation_rows, ["n_nationkey", "n_name", "n_regionkey"]))
    ds = ds.union(
        tbl("customer", customer_rows, ["c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment"])
    )
    ds = ds.union(
        tbl("orders", orders_rows, ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_custkey", "o_orderpriority"])
    )
    ds = ds.union(tbl("supplier", supplier_rows, ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]))
    ds = ds.union(
        tbl("part", part_rows, ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
    )
    ds = ds.union(
        tbl(
            "lineitem", lineitem_rows,
            ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
             "l_tax", "l_returnflag", "l_linestatus", "l_shipdate", "l_partkey", "l_suppkey"],
        )
    )
    return ds

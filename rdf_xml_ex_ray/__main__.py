"""CLI / ``ray job submit`` entry point.

    ray job submit -- python -m rdf_xml_ex_ray kg \
        --sf-dir /root/testdata/sf0.1 --out /tmp/kgstore --buckets 64

Owns its Ray session (library code never calls ray.init). The job is
checkpoint-resumable: rerunning with the same --out skips completed work
(pipelines/kg.run_kg_job layout: partitioned store + lineage.json +
_SUCCESS marker).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="rdf_xml_ex_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="run the transcript→triple-store job")
    kg.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    kg.add_argument("--out", required=True)
    kg.add_argument("--buckets", type=int, default=64)
    kg.add_argument("--num-cpus", type=int, default=None)
    kg.add_argument("--no-resume", action="store_true")

    clean = sub.add_parser("clean", help="run the corpus clean+dedup materialization job")
    clean.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    clean.add_argument("--out", required=True)
    clean.add_argument("--buckets", type=int, default=16)
    clean.add_argument("--num-cpus", type=int, default=None)
    clean.add_argument("--no-resume", action="store_true")

    decode = sub.add_parser("decode", help="decode .rdf files to a parquet triple store")
    decode.add_argument("paths", nargs="+")
    decode.add_argument("--out", required=True)
    decode.add_argument("--base", default=None)
    decode.add_argument("--num-cpus", type=int, default=None)

    export = sub.add_parser(
        "export", help="export a parquet triple store to .nt / .ttl / .nq / .trig"
    )
    export.add_argument("store", help="triple-store parquet dir (e.g. <kg-out>/triples)")
    export.add_argument("--out", required=True)
    export.add_argument(
        "--format", choices=["nt", "ttl", "rdf", "nq", "trig"], default="nt",
        help="nq/trig use the store's graph column, else the per-conversation "
             "graph; rdf = RDF/XML via the repo's own encoder (predicate "
             "prefixes auto-derived, extendable with --prefix)",
    )
    export.add_argument(
        "--prefix", action="append", default=[], metavar="PFX=NS",
        help="extra Turtle prefix (repeatable), e.g. --prefix c=http://example.org/convo#",
    )
    export.add_argument("--buckets", type=int, default=16)
    export.add_argument("--num-cpus", type=int, default=None)

    expc = sub.add_parser(
        "export-corpus",
        help="export a clean-job corpus store to .jsonl / flat parquet",
    )
    expc.add_argument("store", help="corpus store parquet dir (e.g. <clean-out>/corpus)")
    expc.add_argument("--out", required=True)
    expc.add_argument("--format", choices=["jsonl", "parquet"], default="jsonl")
    expc.add_argument("--buckets", type=int, default=16)
    expc.add_argument("--num-cpus", type=int, default=None)

    bgp_p = sub.add_parser(
        "bgp", help="basic-graph-pattern query over a triple store (SPARQL-style BGP)"
    )
    bgp_p.add_argument("store", nargs="?", help="parquet triple-store dir (e.g. <kg-out>/triples)")
    bgp_p.add_argument("--sf-dir", help="build the flagship triples from this sf dir instead")
    bgp_p.add_argument(
        "--pattern", action="append", required=True, metavar="'S P O'",
        help="triple pattern: ?var, <iri>, or a raw constant per position (repeatable)",
    )
    bgp_p.add_argument("--project", help="comma list of output variables (default: all)")
    bgp_p.add_argument("--out", help="write the binding table as parquet instead of printing")
    bgp_p.add_argument("--limit", type=int, default=20, help="rows to print without --out")
    bgp_p.add_argument("--num-cpus", type=int, default=None)

    sparql_p = sub.add_parser(
        "sparql", help="SPARQL SELECT/ASK/CONSTRUCT (restricted fragment) over a triple store"
    )
    sparql_p.add_argument("query", help="SELECT | ASK | CONSTRUCT query text (restricted fragment)")
    sparql_p.add_argument("store", nargs="?", help="parquet triple-store dir")
    sparql_p.add_argument("--sf-dir", help="build the flagship triples from this sf dir instead")
    sparql_p.add_argument(
        "--out",
        help="write the result as parquet instead of printing — SELECT: the "
             "binding table; CONSTRUCT/DESCRIBE: a canonical triple STORE "
             "(full schema, subj_bucket-partitioned) re-queryable by every "
             "other subcommand",
    )
    sparql_p.add_argument("--limit", type=int, default=20, help="rows to print without --out")
    sparql_p.add_argument(
        "--format",
        choices=("json", "csv", "tsv", "xml", "nt", "ttl", "rdf"),
        help="serialize the WHOLE result as one document: SELECT as a "
             "SPARQL 1.1 results doc (json/tsv/xml typed via term-kind "
             "facets, csv untyped per spec), ASK as json/xml, "
             "CONSTRUCT/DESCRIBE as an N-Triples/Turtle/RDF-XML graph doc "
             "(nt/ttl/rdf; CONSTRUCT uses the typed emitter — full term "
             "kinds) — printed, or written to --out as one file",
    )
    sparql_p.add_argument("--num-cpus", type=int, default=None)

    update_p = sub.add_parser(
        "update",
        help="SPARQL UPDATE (INSERT/DELETE DATA, DELETE WHERE, "
             "DELETE/INSERT WHERE) — writes the NEW store (non-destructive)",
    )
    update_p.add_argument("request", help="one UPDATE request (restricted fragment)")
    update_p.add_argument("store", help="parquet triple-store dir (read-only input)")
    update_p.add_argument("--out", required=True,
                          help="directory for the updated store (canonical, "
                               "subj_bucket-partitioned)")
    update_p.add_argument("--num-cpus", type=int, default=None)

    args = parser.parse_args(argv)

    import ray

    init_kwargs = dict(
        address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR"
    )
    if args.num_cpus:
        init_kwargs["num_cpus"] = args.num_cpus
    if not ray.is_initialized():
        ray.init(**init_kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "kg":
            from rdf_xml_ex_ray.pipelines.kg import run_kg_job

            lineage = run_kg_job(
                args.sf_dir, args.out, num_buckets=args.buckets, resume=not args.no_resume
            )
            print(json.dumps({"n_triples": lineage["n_triples"], "partitions": len(lineage["partitions"]), "out": args.out}))
        elif args.cmd == "clean":
            from rdf_xml_ex_ray.pipelines.corpus import run_clean_job

            lineage = run_clean_job(
                args.sf_dir, args.out, num_buckets=args.buckets, resume=not args.no_resume
            )
            print(
                json.dumps(
                    {
                        "n_docs": lineage["n_docs"],
                        "n_bytes": lineage["n_bytes"],
                        "partitions": len(lineage["partitions"]),
                        "out": args.out,
                    }
                )
            )
        elif args.cmd == "export":
            import ray.data as rd

            from rdf_xml_ex_ray.core.model import TRIPLE_COLUMNS

            raw = rd.read_parquet(args.store)
            has_graph = "graph" in raw.schema().names
            keep = TRIPLE_COLUMNS + (["graph", "graph_kind"] if has_graph else [])
            store = raw.map_batches(
                lambda t: t.select([c for c in keep if c in t.column_names]),
                batch_format="pyarrow",
            )
            if args.format in ("nq", "trig"):
                if not has_graph:
                    from rdf_xml_ex_ray.pipelines.kg import add_conv_graph

                    store = store.map_batches(add_conv_graph, batch_format="pyarrow")
                if args.format == "nq":
                    from rdf_xml_ex_ray.sources.nquads import write_nquads

                    stats = write_nquads(store, args.out, num_buckets=args.buckets).to_pandas()
                else:
                    from rdf_xml_ex_ray.sources.trig import write_trig

                    stats = write_trig(store, args.out, num_buckets=args.buckets).to_pandas()
                print(
                    json.dumps(
                        {
                            "n_quads": int(stats["n_quads"].sum()),
                            "files": len(stats),
                            "format": args.format,
                            "out": args.out,
                        }
                    )
                )
            elif args.format in ("ttl", "rdf"):
                from rdf_xml_ex_ray.sources.turtle import DEFAULT_PREFIXES, write_turtle

                import re as _re

                prefixes = dict(DEFAULT_PREFIXES)
                # Match read_turtle's prefix grammar ([A-Za-z][\w-]*): a
                # malformed name would emit prefixed names the reader cannot
                # parse back, silently breaking the write→read roundtrip.
                for spec in args.prefix:
                    pfx, eq, ns = spec.partition("=")
                    if not eq or not ns or not _re.fullmatch(r"[A-Za-z][\w\-]*", pfx):
                        parser.error(
                            f"--prefix {spec!r}: expected PFX=NS with PFX matching "
                            "[A-Za-z][A-Za-z0-9_-]* and a non-empty namespace"
                        )
                    prefixes[pfx] = ns
                if args.format == "rdf":
                    from rdf_xml_ex_ray.sources.rdfxml import (
                        derive_pred_prefixes,
                        write_rdfxml,
                    )

                    # predicate namespaces MUST be prefixed in RDF/XML;
                    # derive the ones --prefix didn't name (pred
                    # cardinality is tiny — a schema, not the data)
                    prefixes = derive_pred_prefixes(
                        store.unique("pred"), prefixes
                    )
                    stats = write_rdfxml(
                        store, args.out, prefixes=prefixes,
                        num_buckets=args.buckets,
                    ).to_pandas()
                    print(
                        json.dumps(
                            {
                                "n_descriptions": int(
                                    stats["n_descriptions"].sum()
                                ),
                                "files": len(stats),
                                "format": "rdf",
                                "out": args.out,
                            }
                        )
                    )
                else:
                    stats = write_turtle(
                        store, args.out, prefixes=prefixes,
                        num_buckets=args.buckets,
                    ).to_pandas()
            else:
                from rdf_xml_ex_ray.sources.ntriples import write_ntriples

                stats = write_ntriples(store, args.out, num_buckets=args.buckets).to_pandas()
            if args.format in ("nt", "ttl"):
                print(
                    json.dumps(
                        {
                            "n_triples": int(stats["n_triples"].sum()),
                            "files": len(stats),
                            "format": args.format,
                            "out": args.out,
                        }
                    )
                )
        elif args.cmd == "export-corpus":
            import ray.data as rd

            store = rd.read_parquet(args.store)
            if args.format == "jsonl":
                from rdf_xml_ex_ray.sources.jsonl import write_jsonl

                stats = write_jsonl(store, args.out, num_buckets=args.buckets).to_pandas()
                print(
                    json.dumps(
                        {
                            "n_docs": int(stats["n_docs"].sum()),
                            "files": len(stats),
                            "format": "jsonl",
                            "out": args.out,
                        }
                    )
                )
            else:
                # flat re-partitioned parquet (doc_bucket partition dirs kept
                # if the store carries the column)
                kwargs = (
                    {"partition_cols": ["doc_bucket"]}
                    if "doc_bucket" in store.schema().names
                    else {}
                )
                store.write_parquet(args.out, **kwargs)
                print(json.dumps({"n_docs": store.count(), "format": "parquet", "out": args.out}))
        elif args.cmd == "bgp":
            import ray.data as rd

            from rdf_xml_ex_ray.core.model import TRIPLE_COLUMNS
            from rdf_xml_ex_ray.pipelines.bgp import bgp_execute

            pats = []
            for spec in args.pattern:
                toks = spec.split()
                if len(toks) != 3:
                    parser.error(f"--pattern {spec!r}: expected exactly 3 terms")
                pats.append(
                    tuple(
                        t if t.startswith("?") else (t[1:-1] if t.startswith("<") and t.endswith(">") else t)
                        for t in toks
                    )
                )
            all_vars = [t[1:] for p in pats for t in p if t.startswith("?")]
            project = (
                args.project.split(",") if args.project else list(dict.fromkeys(all_vars))
            )
            if args.store:
                triples = rd.read_parquet(args.store).map_batches(
                    lambda t: t.select(
                        [c for c in TRIPLE_COLUMNS + ["graph", "graph_kind"]
                         if c in t.column_names]
                    ),
                    batch_format="pyarrow",
                )
            elif args.sf_dir:
                from rdf_xml_ex_ray.pipelines.kg import kg_triples_dataset

                triples = kg_triples_dataset(args.sf_dir).materialize()
            else:
                parser.error("bgp: need a store dir or --sf-dir")
            try:
                res = bgp_execute(triples, pats, project)
            except ValueError as exc:  # disconnected BGP / unbound projection
                parser.error(f"bgp: {exc}")
            if args.out:
                res.write_parquet(args.out)
                print(json.dumps({"n_bindings": res.count(), "out": args.out}))
            else:
                rows = res.take(args.limit)
                for r in rows:
                    print(json.dumps(r))
                print(json.dumps({"n_bindings": res.count(), "shown": len(rows)}))
        elif args.cmd == "sparql":
            import ray.data as rd

            from rdf_xml_ex_ray.core.model import TRIPLE_COLUMNS
            from rdf_xml_ex_ray.core.sparql import parse_query
            from rdf_xml_ex_ray.core.terms import ParseError as _PE
            from rdf_xml_ex_ray.pipelines.bgp import (
                sparql_ask,
                sparql_construct,
                sparql_describe,
                sparql_select,
            )

            if args.store:
                triples = rd.read_parquet(args.store).map_batches(
                    lambda t: t.select(
                        [c for c in TRIPLE_COLUMNS + ["graph", "graph_kind"]
                         if c in t.column_names]
                    ),
                    batch_format="pyarrow",
                )
            elif args.sf_dir:
                from rdf_xml_ex_ray.pipelines.kg import kg_triples_dataset

                triples = kg_triples_dataset(args.sf_dir).materialize()
            else:
                parser.error("sparql: need a store dir or --sf-dir")
            try:
                q_parsed = parse_query(args.query)
                form = q_parsed["form"]
                if args.format:
                    from rdf_xml_ex_ray.pipelines.bgp import sparql_select_typed
                    from rdf_xml_ex_ray.sources.results import (
                        ask_json,
                        ask_xml,
                        select_csv,
                        select_json,
                        select_tsv,
                        select_xml,
                    )

                    if form == "ask" and args.format in ("json", "xml"):
                        res_a = sparql_ask(triples, args.query)
                        doc = (
                            json.dumps(ask_json(res_a))
                            if args.format == "json"
                            else ask_xml(res_a)
                        )
                    elif (
                        form in ("construct", "describe")
                        and args.format in ("nt", "ttl", "rdf")
                    ):
                        from rdf_xml_ex_ray.pipelines.bgp import (
                            sparql_construct_typed,
                            sparql_describe,
                        )
                        from rdf_xml_ex_ray.sources.results import (
                            graph_document,
                        )

                        res_g = (
                            sparql_construct_typed(triples, args.query)
                            if form == "construct"
                            else sparql_describe(triples, args.query)
                        )
                        doc = graph_document(res_g, args.format)
                    elif form != "select" or args.format in ("nt", "ttl", "rdf"):
                        parser.error(
                            f"sparql: --format {args.format} doesn't "
                            f"serialize {form.upper()} results (SELECT: "
                            "json/csv/tsv/xml; ASK: json/xml; "
                            "CONSTRUCT/DESCRIBE: nt/ttl/rdf)"
                        )
                    elif args.format == "csv":
                        res_c = sparql_select(triples, args.query)
                        doc = select_csv(res_c, res_c.schema().names)
                    else:
                        res_t, out_vars, prov = sparql_select_typed(
                            triples, args.query
                        )
                        doc = (
                            json.dumps(select_json(res_t, out_vars, prov))
                            if args.format == "json"
                            else select_tsv(res_t, out_vars, prov)
                            if args.format == "tsv"
                            else select_xml(res_t, out_vars, prov)
                        )
                    if args.out:
                        with open(args.out, "w", encoding="utf-8") as fh:
                            fh.write(doc)
                        print(json.dumps({"out": args.out, "format": args.format}))
                    else:
                        print(doc)
                    return 0
                if args.out and form in ("construct", "describe"):
                    # graph-valued results persist as a CANONICAL store
                    # (full 7-column schema, subj_bucket-partitioned) so
                    # the output is immediately queryable/exportable by
                    # every other subcommand. CONSTRUCT uses the typed
                    # emitter; the CONSTRUCT WHERE shorthand carries no
                    # template kinds and falls back to the flat untyped
                    # parquet (flagged in the output JSON).
                    from rdf_xml_ex_ray.pipelines.bgp import (
                        sparql_construct_typed,
                    )
                    from rdf_xml_ex_ray.stages.canonicalize import canonicalize

                    if form == "describe":
                        rows_g = sparql_describe(triples, args.query)
                    elif q_parsed["template_tagged"] is not None:
                        rows_g = sparql_construct_typed(triples, args.query)
                    else:
                        res_u = sparql_construct(triples, args.query)
                        res_u.write_parquet(args.out)
                        # count from the WRITTEN files — res_u.count()
                        # would re-execute the whole lazy pipeline
                        n_u = rd.read_parquet(args.out).count()
                        print(json.dumps({
                            "n_triples": n_u, "out": args.out,
                            "store": False, "untyped": True,
                        }))
                        return 0
                    canonicalize(rows_g).write_parquet(
                        args.out, partition_cols=["subj_bucket"]
                    )
                    n = rd.read_parquet(args.out).count()
                    print(json.dumps(
                        {"n_triples": n, "out": args.out, "store": True}
                    ))
                    return 0
                run = {
                    "select": sparql_select,
                    "ask": sparql_ask,
                    "construct": sparql_construct,
                    "describe": sparql_describe,
                }[form]
                res = run(triples, args.query)
            except (ValueError, _PE) as exc:
                parser.error(f"sparql: {exc}")
            if args.out:
                res.write_parquet(args.out)
                print(json.dumps({"n_bindings": res.count(), "out": args.out}))
            else:
                rows = res.take(args.limit)
                for r in rows:
                    print(json.dumps(r))
                print(json.dumps({"n_bindings": res.count(), "shown": len(rows)}))
        elif args.cmd == "update":
            import ray.data as rd

            from rdf_xml_ex_ray.core.model import TRIPLE_COLUMNS
            from rdf_xml_ex_ray.core.terms import ParseError as _PE
            from rdf_xml_ex_ray.pipelines.update import sparql_update
            from rdf_xml_ex_ray.stages.canonicalize import canonicalize

            raw = rd.read_parquet(args.store)
            if "graph" in raw.schema().names:
                # silently dropping the graph column would rewrite a quad
                # store as its default-graph projection — reject instead
                parser.error(
                    "update: quad stores (graph column present) are out of "
                    "fragment — export the default graph or query it via "
                    "'sparql' (GRAPH patterns) instead"
                )
            triples = raw.map_batches(
                lambda t: t.select([c for c in TRIPLE_COLUMNS if c in t.column_names]),
                batch_format="pyarrow",
            )
            try:
                new_store = sparql_update(triples, args.request)
            except (ValueError, _PE) as exc:
                parser.error(f"update: {exc}")
            canonicalize(new_store).write_parquet(
                args.out, partition_cols=["subj_bucket"]
            )
            n = rd.read_parquet(args.out).count()
            print(json.dumps({"out": args.out, "n_triples": n}))
        elif args.cmd == "decode":
            import pyarrow.compute as pc

            from rdf_xml_ex_ray.sources.rdfxml import read_rdfxml
            from rdf_xml_ex_ray.stages.canonicalize import canonicalize

            ds = read_rdfxml(args.paths, base=args.base)
            triples = ds.map_batches(
                lambda t: t.filter(pc.is_null(t["error"])).drop_columns(["error"]),
                batch_format="pyarrow",
            )
            canonicalize(triples).write_parquet(args.out, partition_cols=["subj_bucket"])
            print(json.dumps({"out": args.out}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

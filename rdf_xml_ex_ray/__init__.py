"""rdf_xml_ex_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the RDF/XML decode/encode semantics of rdf-elixir/rdf-xml-ex
(reference at /root/reference, v1.2.1) from scratch on top of
``ray.data.Dataset`` pipelines: striped-syntax RDF/XML parsing inside
``map_batches`` over Arrow batches, actor-pool entity linking, hash-partitioned
canonicalization and a deterministic partitioned Parquet triple store.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (bench.py, CLI entry points, the test fixture, or the driver).
"""

__version__ = "0.1.0"

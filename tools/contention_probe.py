#!/usr/bin/env python
"""Single-box concurrency-ceiling control for the scaling measurement.

Runs K independent OS processes (no Ray involved), each executing the
identical parse-stage workload (render → ParseDocs over 50 synthetic
conversations), and reports per-task wall time vs K. Any slowdown with K is
machine physics — all-core turbo scaling and shared memory bandwidth — not
pipeline or scheduler overhead. BASELINE.md cites this when interpreting the
strong-scaling pairs: a real 4×-node cluster shards this ceiling with the
nodes, a single box cannot.

Usage: python tools/contention_probe.py   (from the repo root)
"""

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(n_iter, out_q):
    sys.path.insert(0, REPO)
    import pyarrow as pa

    from rdf_xml_ex_ray.stages.parse import ParseDocs
    from rdf_xml_ex_ray.transcripts.render import render_conversation

    docs = []
    for c in range(50):
        turns = [
            (
                "user" if i % 2 else "assistant",
                f"turn text number {i} with some padding",
                None if i % 3 else "search",
                1000 + i,
            )
            for i in range(40)
        ]
        docs.append(render_conversation(f"c{c}", turns))
    batch = pa.table({"conv_id": [f"c{i}" for i in range(50)], "doc": docs})
    p = ParseDocs()
    p(batch)  # warm
    t0 = time.perf_counter()
    for _ in range(n_iter):
        p(batch)
    out_q.put((time.perf_counter() - t0) / n_iter)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    for K in (1, 8, 16, 32):
        q = mp.Queue()
        procs = [mp.Process(target=worker, args=(4, q)) for _ in range(K)]
        [p.start() for p in procs]
        times = [q.get() for _ in procs]
        [p.join() for p in procs]
        print(
            f"K={K:2d}: per-task {sum(times) / len(times):.3f}s (max {max(times):.3f})",
            flush=True,
        )

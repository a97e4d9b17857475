"""Graph isomorphism modulo blank-node relabeling.

The W3C harness compares decoded graphs against N-Triples goldens with
``RDF.Graph.isomorphic?`` (reference: w3c_test.exs:55-59). This is the
equivalent comparator: hash-refinement coloring of blank nodes followed by a
small backtracking match within color classes. Only ever used on tiny
per-document graphs (test side), never in the distributed pipeline.
"""

from __future__ import annotations

from itertools import permutations

from .terms import BNode, Literal


def _ground_key(term):
    if isinstance(term, BNode):
        return None
    if isinstance(term, Literal):
        return ("lit", term.key())
    return ("iri", str(term))


def _signatures(triples, colors):
    """One refinement round: color each bnode by its incident edge shapes."""
    sig = {b: [] for b in colors}
    for s, p, o in triples:
        s_b = isinstance(s, BNode)
        o_b = isinstance(o, BNode)
        if s_b:
            sig[s].append(("out", str(p), colors[o] if o_b else _ground_key(o)))
        if o_b:
            sig[o].append(("in", str(p), colors[s] if s_b else _ground_key(s)))
    return {b: hash((colors[b],) + tuple(sorted(map(hash, edges)))) for b, edges in sig.items()}


def _color_classes(triples):
    bnodes = {t for tr in triples for t in (tr[0], tr[2]) if isinstance(t, BNode)}
    colors = {b: 0 for b in bnodes}
    for _ in range(max(1, len(bnodes))):
        new = _signatures(triples, colors)
        if len(set(new.values())) == len(set(colors.values())):
            colors = new
            break
        colors = new
    return colors


def isomorphic(triples_a, triples_b) -> bool:
    a = set(triples_a)
    b = set(triples_b)
    if len(a) != len(b):
        return False

    ground_a = {t for t in a if not (isinstance(t[0], BNode) or isinstance(t[2], BNode))}
    ground_b = {t for t in b if not (isinstance(t[0], BNode) or isinstance(t[2], BNode))}
    if ground_a != ground_b:
        return False

    colors_a = _color_classes(a)
    colors_b = _color_classes(b)
    by_color_a: dict = {}
    by_color_b: dict = {}
    for n, c in colors_a.items():
        by_color_a.setdefault(c, []).append(n)
    for n, c in colors_b.items():
        by_color_b.setdefault(c, []).append(n)
    if sorted(len(v) for v in by_color_a.values()) != sorted(len(v) for v in by_color_b.values()):
        return False
    # colors are hashes of identical construction → classes must line up
    if set(by_color_a) != set(by_color_b):
        return False
    for c, nodes in by_color_a.items():
        if len(by_color_b.get(c, [])) != len(nodes):
            return False

    classes = sorted(by_color_a, key=lambda c: len(by_color_a[c]))

    def substitute(mapping):
        def m(t):
            return mapping.get(t, t) if isinstance(t, BNode) else t

        return {(m(s), p, m(o)) for s, p, o in a}

    def backtrack(idx, mapping):
        if idx == len(classes):
            return substitute(mapping) == b
        c = classes[idx]
        src = by_color_a[c]
        for perm in permutations(by_color_b[c]):
            mapping.update(zip(src, perm))
            if backtrack(idx + 1, mapping):
                return True
            for n in src:
                mapping.pop(n, None)
        return False

    return backtrack(0, {})

"""Ray stage: entity linking for hot entities (roles, tools).

An actor-pool ``map_batches`` class: the registry (raw mention → canonical
entity IRI) is built ONCE per actor in ``__init__`` — in production from a
broadcast ``ray.put`` handle so the table ships to each actor once, never
per batch (SURVEY.md §2.5/§2.6: broadcast-dictionary lookup instead of a
shuffle join; the hot-entity dictionary is small even at 10^12-turn scale).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..transcripts.ontology import P_ROLE, ROLE_ALIASES, ROLE_NS


def build_role_registry() -> dict[str, str]:
    """raw role IRI → canonical role IRI (covers known aliases; unknown
    mentions pass through lowercased inside the linker)."""
    return {ROLE_NS + raw: ROLE_NS + canon for raw, canon in ROLE_ALIASES.items()}


class EntityLinker:
    """Rewrites ``ct:role`` object IRIs to canonical role entities.

    ``registry_ref`` may be a plain dict (tests) or a ``ray.ObjectRef`` from
    ``ray.put`` (pipeline) — resolved once per actor here in ``__init__``.
    """

    def __init__(self, registry_ref=None):
        if registry_ref is None:
            registry = build_role_registry()
        else:
            try:
                import ray

                registry = (
                    ray.get(registry_ref)
                    if isinstance(registry_ref, ray.ObjectRef)
                    else registry_ref
                )
            except ImportError:  # pragma: no cover
                registry = registry_ref
        self.registry = registry

    def _canonicalize(self, iri: str) -> str:
        hit = self.registry.get(iri)
        if hit is not None:
            return hit
        if iri.startswith(ROLE_NS):
            lowered = ROLE_NS + iri[len(ROLE_NS):].lower()
            return self.registry.get(lowered, lowered)
        return iri

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch["pred"], P_ROLE), pc.equal(batch["obj_kind"], "iri"))
        if pc.sum(mask).as_py() in (0, None):
            return batch
        # dictionary-encode so the python-dict lookup runs once per distinct
        # mention, not once per row
        obj = batch["obj_value"].combine_chunks()
        dict_arr = pc.dictionary_encode(obj)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        uniques = dict_arr.dictionary.to_pylist()
        mapped = pa.array([self._canonicalize(u) if u is not None else None for u in uniques])
        rewritten = mapped.take(dict_arr.indices)
        new_obj = pc.if_else(mask, rewritten, obj)
        idx = batch.schema.get_field_index("obj_value")
        return batch.set_column(idx, "obj_value", new_obj)

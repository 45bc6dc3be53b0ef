"""Entity linking — the stateful actor-pool stage (SURVEY.md §2.4).

The catalog (surface → canonical key) plays the role of the reference's
canonicalization trie + deps.dev-style per-worker cache
(pkg/handler/collector/deps_dev/deps_dev.go:68-80: per-instance
``checkedPurls`` maps). The catalog is broadcast ONCE via ``ray.put`` on
the driver; each actor fetches it in ``__init__`` (never re-shipped per
batch) and rewrites alias keys to canonical keys vectorized.

    ref = ray.put(load_surface_map(catalog_path))
    edges = edges.map_batches(EntityLinker, fn_constructor_args=(ref,),
                              batch_format="pyarrow", concurrency=N)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from guac_ray.canonical import entity_key

__all__ = ["EntityLinker", "load_link_map", "put_link_map"]


def load_link_map(catalog_path: str) -> dict[str, str]:
    """entity_catalog.parquet → {surface entity key: canonical key}.

    Surfaces are stored raw ("google search"); the extractor emits
    ``ent:<type>/<sanitized surface>`` keys, so the map is keyed on that
    derived form. Identity mappings are dropped (no-op rewrites).
    """
    t = pq.read_table(catalog_path, columns=["surface", "ent_type", "ent_key"])
    out: dict[str, str] = {}
    for surface, ent_type, ent_key_ in zip(
        t["surface"].to_pylist(), t["ent_type"].to_pylist(), t["ent_key"].to_pylist()
    ):
        k = entity_key(ent_type, surface)
        if k != ent_key_:
            out[k] = ent_key_
    return out


def put_link_map(catalog_path: str) -> "ray.ObjectRef":
    """Broadcast the link map once (small-side broadcast, not a shuffle)."""
    return ray.put(load_link_map(catalog_path))


def load_surface_map(catalog_path: str, ent_type: str = "tool") -> dict[str, str]:
    """{raw surface: canonical key} for one entity type — the fused-link
    form the extractor consumes (linking at fact time touches only the
    few surfaces per turn instead of rescanning every edge column)."""
    t = pq.read_table(catalog_path, columns=["surface", "ent_type", "ent_key"])
    return {
        s: k
        for s, et, k in zip(
            t["surface"].to_pylist(), t["ent_type"].to_pylist(), t["ent_key"].to_pylist()
        )
        if et == ent_type
    }


class EntityLinker:
    """Actor-pool batch UDF rewriting alias keys to canonical keys.

    State (the link map) loads once per actor in ``__init__``. Lookup is
    vectorized: build a dictionary-encoding of the key column and map only
    the (few) distinct values through the dict.
    """

    def __init__(self, link_ref) -> None:
        self.link: dict[str, str] = (
            ray.get(link_ref) if isinstance(link_ref, ray.ObjectRef) else dict(link_ref)
        )

    def _map_col(self, arr: pa.ChunkedArray) -> pa.Array:
        # dictionary-encode → rewrite the small dictionary → decode:
        # O(distinct) python work per batch instead of O(rows)
        combined = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        d = pc.dictionary_encode(combined)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        dict_vals = d.dictionary.to_pylist()
        new_vals = [self.link.get(v, v) for v in dict_vals]
        if new_vals == dict_vals:
            return combined
        return pc.take(pa.array(new_vals, type=pa.string()), d.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col in ("subj_key", "obj_key"):
            idx = batch.schema.get_field_index(col)
            batch = batch.set_column(idx, col, self._map_col(batch[col]))
        return batch

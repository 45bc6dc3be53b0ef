"""Enrichment — the certifier loop analog (SURVEY.md §3.3).

The reference's OSV certifier pages packages from the graph, anti-joins
on scan freshness, batch-queries osv.dev, and re-ingests CertifyVuln
triples including ``noVuln`` negatives (pkg/certifier/osv/osv.go:48-146,
root_package.go:127-184, vuln.go:57). Here the vuln source is a local
Parquet table (no network in this sandbox); the lookup is a broadcast
small-side join inside an actor pool:

  - ``ray.put`` the vulndb dict once (driver)
  - anti-join = broadcast the already-scanned key set, filter in the batch
  - per-batch the actor dedups lookups (the reference dedups purls per
    batch before the HTTP call — osv.go:69-77)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from guac_ray.canonical import NO_VULN_KEY, vuln_key
from guac_ray.stages.rules import (
    DEP_COLLECTOR,
    DEP_ORIGIN,
    ENRICH_COLLECTOR,
    ENRICH_ORIGIN,
    make_edge,
)

__all__ = ["load_vulndb", "VulnCertifier", "certify_vulns",
           "load_depdb", "DepCertifier", "certify_deps"]

_ID_FIELDS = [
    "subj_type", "subj_key", "pred", "obj_type", "obj_key",
    "props", "justification", "origin", "collector",
]
_ID_SCHEMA = pa.schema([(c, pa.string()) for c in _ID_FIELDS])


def load_vulndb(path: str) -> dict[str, list[str]]:
    """vulndb.parquet → {package key: sorted distinct vuln ids}."""
    t = pq.read_table(path, columns=["ent_key", "vuln_id"])
    out: dict[str, set[str]] = {}
    for k, v in zip(t["ent_key"].to_pylist(), t["vuln_id"].to_pylist()):
        out.setdefault(k, set()).add(v)
    return {k: sorted(v) for k, v in out.items()}


class VulnCertifier:
    """Actor-pool batch UDF: package-node batch → certify_vuln edges.

    Misses emit the ``noVuln`` negative fact (obj = NO_VULN_KEY) — these
    count in P/R (reference emits noVuln CertifyVuln — vuln.go:57,156-163).
    ``scanned_ref`` (optional) broadcasts already-certified keys for the
    anti-join re-scan selection.
    """

    def __init__(self, vulndb_ref, scanned_ref=None) -> None:
        self.vmap: dict[str, list[str]] = (
            ray.get(vulndb_ref) if isinstance(vulndb_ref, ray.ObjectRef) else dict(vulndb_ref)
        )
        scanned = (
            ray.get(scanned_ref) if isinstance(scanned_ref, ray.ObjectRef) else scanned_ref
        )
        self.scanned: set[str] = set(scanned or ())

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch["node_key"].to_pylist()
        types = batch["node_type"].to_pylist()
        out: list[tuple] = []
        seen: set[str] = set()  # per-batch query dedup (osv.go:69-77)
        for t, k in zip(types, keys):
            if t != "package" or k in seen or k in self.scanned:
                continue
            seen.add(k)
            hits = self.vmap.get(k)
            if hits:
                for vid in hits:
                    out.append(
                        make_edge("package", k, "certify_vuln", "vulnerability",
                                  vuln_key(vid), {"scanner": "local-vulndb"},
                                  origin=ENRICH_ORIGIN, collector=ENRICH_COLLECTOR)
                    )
            else:
                out.append(
                    make_edge("package", k, "certify_vuln", "vulnerability",
                              NO_VULN_KEY, {"scanner": "local-vulndb"},
                              origin=ENRICH_ORIGIN, collector=ENRICH_COLLECTOR)
                )
        if not out:
            return _ID_SCHEMA.empty_table()
        cols = list(zip(*out))
        return pa.Table.from_arrays(
            [pa.array(c, type=pa.string()) for c in cols], schema=_ID_SCHEMA
        )


def certify_vulns(
    nodes: Dataset,
    vulndb_path: str,
    scanned: set[str] | None = None,
    concurrency: int = 2,
) -> Dataset:
    """nodes → certify_vuln edge Dataset (identity columns only).

    Nodes are already globally distinct (assemble output), so per-batch
    dedup inside the actor suffices — no extra shuffle here.
    """
    vref = ray.put(load_vulndb(vulndb_path))
    sref = ray.put(scanned or set())
    return nodes.map_batches(
        VulnCertifier,
        fn_constructor_args=(vref, sref),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def load_depdb(path: str) -> dict[str, list[tuple[str, str]]]:
    """depdb.parquet → {name-level package key: sorted (dep key, req)}."""
    t = pq.read_table(path, columns=["pkg_name", "dep_name", "requirement"])
    out: dict[str, set[tuple[str, str]]] = {}
    for k, d, r in zip(t["pkg_name"].to_pylist(), t["dep_name"].to_pylist(),
                       t["requirement"].to_pylist()):
        out.setdefault(k, set()).add((d, r))
    return {k: sorted(v) for k, v in out.items()}


class DepCertifier:
    """Actor-pool batch UDF: package-node batch → depends_on edges — the
    deps.dev dependency-graph enrichment analog (deps_dev.go:44-132):
    every package node is looked up at NAME level (split before '@', the
    AllVersions attach — helpers.go:125-131) and its dependencies emit as
    edges to name-level dep keys with the requirement range in props
    (assembler.go:58-63 IsDependency). No negative fact on a miss — the
    reference emits nothing for dependency-free packages."""

    def __init__(self, depdb_ref, scanned_ref=None) -> None:
        self.dmap: dict[str, list[tuple[str, str]]] = (
            ray.get(depdb_ref) if isinstance(depdb_ref, ray.ObjectRef)
            else dict(depdb_ref)
        )
        scanned = (
            ray.get(scanned_ref) if isinstance(scanned_ref, ray.ObjectRef)
            else scanned_ref
        )
        self.scanned: set[str] = set(scanned or ())

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch["node_key"].to_pylist()
        types = batch["node_type"].to_pylist()
        out: list[tuple] = []
        seen: set[str] = set()  # per-batch lookup dedup (deps_dev.go:61-68)
        from guac_ray.canonical import package_name_key

        for t, k in zip(types, keys):
            if t != "package" or k in seen or k in self.scanned:
                continue
            seen.add(k)
            # AllVersions lookup key via the canonical helper — the
            # ad-hoc split('@') kept '?quals' on versionless purls and
            # silently missed the name-level depdb entry
            name_key = package_name_key(k) or k.split("@", 1)[0]
            for dep, req in self.dmap.get(name_key, ()):
                out.append(
                    make_edge("package", k, "depends_on", "package", dep,
                              {"requirement": req},
                              origin=DEP_ORIGIN, collector=DEP_COLLECTOR)
                )
        if not out:
            return _ID_SCHEMA.empty_table()
        cols = list(zip(*out))
        return pa.Table.from_arrays(
            [pa.array(c, type=pa.string()) for c in cols], schema=_ID_SCHEMA
        )


def certify_deps(
    nodes: Dataset,
    depdb_path: str,
    scanned: set[str] | None = None,
    concurrency: int = 2,
) -> Dataset:
    """nodes → depends_on edge Dataset (identity columns only). Same
    broadcast-lookup actor-pool shape as :func:`certify_vulns`."""
    dref = ray.put(load_depdb(depdb_path))
    sref = ray.put(scanned or set())
    return nodes.map_batches(
        DepCertifier,
        fn_constructor_args=(dref, sref),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

"""CLI entry points (the guacone analog: collect → ingest → query from
one binary — cmd/guacone). Owns the Ray session (guarded init); library
code never calls ray.init.

    python -m guac_ray build  <transcripts_dir> <out_dir> [--catalog F] [--partitions N]
    python -m guac_ray query  <graph_out_dir> known <node_key>
    python -m guac_ray query  <graph_out_dir> vulns <pkg_key>
    python -m guac_ray query  <graph_out_dir> patch <node_key> [--depth N]
    python -m guac_ray query  <graph_out_dir> neighbors <node_key> [--direction out|in|both]
    python -m guac_ray query  <graph_out_dir> pagerank [--limit K] [--iters N]
    python -m guac_ray query  <graph_out_dir> triangles
    python -m guac_ray query  <graph_out_dir> truss [--k K]
    python -m guac_ray engagement <events.parquet> <out> --op streaks|cohort|dauwau|gaps|twap
    python -m guac_ray bpe    <documents.parquet> <out> [--merges N]
    python -m guac_ray concat <table.parquet> <out> --keys a,b --val v
    python -m guac_ray simjoin <documents.parquet> [--threshold T] [--ngram N]
    python -m guac_ray compact <in_dir> <out_dir> [--target-mb M] [--delete-inputs]
    python -m guac_ray curate <documents.parquet> <out_dir> [--threshold T]
    python -m guac_ray pii <table.parquet> <out_dir> [--text-col C]
    python -m guac_ray kmeans <table.parquet> [--k K] [--iters N] [--out F]
    python -m guac_ray boiler <table.parquet> <out_dir> --group-col G [--min-groups N]
    python -m guac_ray export <table.parquet> <out_dir> [--format jsonl|csv] [--columns a,b]
    python -m guac_ray abtest <events.parquet> [--test ttest|mw|ks] [--group-a A --group-b B]
    python -m guac_ray refresh <mv.parquet> <changes.parquet> <out> --keys k [--sums s:v]
    python -m guac_ray query  <graph_out_dir> hits [--limit K]
    python -m guac_ray query  <graph_out_dir> communities [--limit K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cents_frame(df, value_col: str, keep: list[str]):
    """Project ``keep`` + a '_cents' int64 column from ``value_col``:
    integer columns pass through, float columns get floor(v*100+0.5)
    with NULL rows DROPPED (SQL aggregates skip NULL — the decision is
    explicit here, per the cents() hardening). One definition for
    every CLI verb that coerces arbitrary parquet values to cents."""
    import numpy as np
    import pandas as pd

    v = df[value_col].to_numpy()
    if not np.issubdtype(v.dtype, np.integer):
        ok = ~pd.isna(v)
        df = df[ok].copy()
        df["_cents"] = np.floor(
            v[ok].astype("float64") * 100 + 0.5).astype("int64")
    else:
        df = df.copy()
        df["_cents"] = v.astype("int64")
    return df[keep + ["_cents"]]


def cmd_build(args) -> int:
    _ray_up(args.num_cpus)
    from guac_ray.state.checkpoint import poll_graph_job, run_graph_job

    if args.poll:
        res = poll_graph_job(
            args.transcripts, args.out,
            catalog_path=args.catalog,
            num_partitions=args.partitions,
            interval_sec=args.interval,
            max_polls=args.poll if args.poll > 0 else None,
            idle_stop=args.idle_stop,
        )
        print(json.dumps({
            "polls": res["polls"],
            "assemblies": res["assemblies"],
            "edges_dir": res["last"]["edges_dir"],
            "partitions": len(res["last"]["partitions"]),
        }))
        return 0
    res = run_graph_job(
        args.transcripts, args.out,
        catalog_path=args.catalog,
        num_partitions=args.partitions,
        incremental=args.incremental,
    )
    print(json.dumps({
        "edges_dir": res["edges_dir"],
        "nodes_dir": res["nodes_dir"],
        "identifiers_dir": res["identifiers_dir"],
        "partitions": len(res["partitions"]),
        "skipped": res["skipped"],
    }))
    return 0


def cmd_query(args) -> int:
    if args.what not in ("pagerank", "triangles", "kcore", "components",
                         "truss", "hits", "communities") and not args.key:
        # only the whole-graph verb is keyless; a forgotten key on the
        # node verbs must not silently read as "no results"
        print(f"error: query {args.what} requires a node key", file=sys.stderr)
        return 2
    _ray_up(args.num_cpus)
    import ray.data as rd

    edges = rd.read_parquet(os.path.join(args.graph, "edges"))
    if args.what == "known":
        from guac_ray.query.cli import known

        out = known(edges, args.key)
    elif args.what == "vulns":
        from guac_ray.query.cli import vulnerabilities

        out = vulnerabilities(edges, args.key)
    elif args.what == "patch":
        from guac_ray.query.cli import patch_plan

        out = patch_plan(
            edges, args.key, max_depth=args.depth,
            preds=args.preds.split(",") if args.preds else None,
            direction=args.direction,
        )
    elif args.what == "neighbors":
        from guac_ray.query.graph import neighbors, paginate

        out = paginate(
            neighbors(edges, args.key, direction=args.direction),
            # full identity = a total order → pages are stable across calls
            sort_keys=["pred", "obj_key", "subj_key", "props"],
            offset=args.offset, limit=args.limit,
        ).to_pandas()
    elif args.what == "pagerank":
        from guac_ray.functions.pagerank import pagerank

        pr = pagerank(edges, max_iters=args.iters)
        # top-k distributedly: the full rank table never hits the driver
        out = (pr.sort(["rank", "node_key"], descending=[True, False])
               .limit(args.limit).to_pandas())
    elif args.what == "triangles":
        from guac_ray.functions.triangles import triangle_count

        out = triangle_count(edges).to_pandas()
    elif args.what == "kcore":
        from guac_ray.functions.graph_algs import kcore
        from guac_ray.functions.joins import default_exchange

        out = kcore(edges, "subj_key", "obj_key", k=args.k,
                    exchange_base=default_exchange("cli_kcore")).to_pandas()
    elif args.what == "truss":
        from guac_ray.functions.joins import default_exchange
        from guac_ray.functions.triangles import k_truss

        out = k_truss(edges, k=args.k,  # k<3 raises loudly in k_truss
                      exchange_base=default_exchange("cli_truss")
                      ).to_pandas()
    elif args.what == "spath":
        from guac_ray.functions.joins import default_exchange
        from guac_ray.functions.paths import shortest_paths

        def weighted(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            # unit weights: spath over a plain edge table = hop counts;
            # a weight column in the graph would be passed through here
            return pa.table({
                "src": t["subj_key"].cast(pa.string()),
                "dst": t["obj_key"].cast(pa.string()),
                "w": pc.cast(pa.array([1] * t.num_rows), pa.int64()),
            })

        sp = shortest_paths(
            edges.map_batches(weighted, batch_format="pyarrow"),
            args.key, k=args.depth,
            exchange_base=default_exchange("cli_spath"))
        out = sp.to_pandas() if hasattr(sp, "to_pandas") else sp
    elif args.what == "components":
        from guac_ray.functions.dedup import connected_components_ds

        def to_pairs(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            f = t.filter(pc.not_equal(t["subj_key"], t["obj_key"]))
            return pa.table({"a": f["subj_key"].cast(pa.string()),
                             "b": f["obj_key"].cast(pa.string())})

        cc = connected_components_ds(
            edges.map_batches(to_pairs, batch_format="pyarrow"))
        out = cc.to_pandas().rename(columns={"doc_id": "node_key"})
    elif args.what == "hits":
        from guac_ray.functions.hits import hits

        # --iters defaults to pagerank's 20; HITS pays 4 bucket passes
        # per iteration, so cap the shared flag at its own default 8
        hs = hits(edges, max_iters=min(args.iters, 8))
        # top-k distributedly by authority, like the pagerank verb
        out = (hs.sort(["auth_fp", "node_key"], descending=[True, False])
               .limit(args.limit).to_pandas())
    elif args.what == "communities":
        from guac_ray.functions.graph_algs import label_propagation
        from guac_ray.stages.groupagg import grouped_agg

        lp = label_propagation(edges, rounds=4)
        # community SIZES, aggregated DISTRIBUTED (label-cardinality
        # output) then top-k by sort+limit — the node->label table
        # never transits the driver; the full table goes to parquet
        # via the library API
        out = (grouped_agg(lp, ["label"],
                           {"n_members": ("node_key", "count")},
                           num_buckets=8)
               .sort(["n_members", "label"], descending=[True, False])
               .limit(args.limit).to_pandas())
    else:  # pragma: no cover - argparse restricts choices
        raise ValueError(args.what)
    print(out.to_json(orient="records", lines=True) if hasattr(out, "to_json")
          else json.dumps(out))
    return 0


def cmd_simjoin(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    docs = rd.read_parquet(args.documents, columns=[args.id_col, args.text_col])
    from guac_ray.functions.simjoin import jaccard_similarity_join

    out = jaccard_similarity_join(
        docs, id_col=args.id_col, text_col=args.text_col,
        threshold=args.threshold, shingle_n=args.ngram).to_pandas()
    if out.empty:  # Ray drops columns on a fully-empty Dataset
        print("", end="")
        return 0
    out = out.sort_values(["da", "db"]).reset_index(drop=True)
    print(out.to_json(orient="records", lines=True))
    return 0


def cmd_compact(args) -> int:
    _ray_up(args.num_cpus)
    from guac_ray.sources.compact import compact_parquet

    print(json.dumps(compact_parquet(
        args.in_dir, args.out_dir, target_mb=args.target_mb,
        delete_inputs=args.delete_inputs)))
    return 0


def cmd_sbom(args) -> int:
    """Mixed SBOM/VEX/attestation directory → nodes/edges Parquet
    graph: documents are content-sniffed (SPDX / CycloneDX JSON+XML /
    OpenVEX / CSAF / ITE-6 vuln+SLSA / DSSE / scorecard / deps.dev /
    IngestPredicates / JSON-Lines, gz/zst/bz2 transparent) and routed
    through the parser registry, then the standard full-identity
    assemble dedup — the real-format ingest path (the reference's
    collect→process→parse→assemble chain for files)."""
    _ray_up(args.num_cpus)
    from guac_ray.sources.spdx import read_documents_any
    from guac_ray.stages.assemble import assemble_edges, nodes_from_edges

    edges = assemble_edges(read_documents_any(args.in_dir,
                                              strict=args.strict),
                           num_buckets=args.num_buckets)
    os.makedirs(args.out_dir, exist_ok=True)
    edges = edges.materialize()
    n_e = edges.count()
    if n_e == 0:
        # every document reject-routed (or none parseable): report zero
        # — write_parquet writes NO files for an empty dataset, so the
        # re-reads below would crash on a file-less directory
        print(json.dumps({"edges": 0, "nodes": 0, "out": args.out_dir}))
        return 0
    edges.write_parquet(os.path.join(args.out_dir, "edges"))
    import ray.data as rd

    edges_w = rd.read_parquet(os.path.join(args.out_dir, "edges"))
    nodes = nodes_from_edges(edges_w, num_buckets=max(8, args.num_buckets // 2))
    nodes.write_parquet(os.path.join(args.out_dir, "nodes"))
    n_n = rd.read_parquet(os.path.join(args.out_dir, "nodes")).count()
    print(json.dumps({"edges": n_e, "nodes": n_n, "out": args.out_dir}))
    return 0


def cmd_curate(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.pipelines.curation import curate

    docs = rd.read_parquet(args.documents, columns=["doc_id", "text"])
    kept = curate(docs, min_tokens=args.min_tokens,
                  neardup_threshold=args.threshold, shingle_n=args.ngram)
    # materialize once: count + write read the same blocks, and a
    # zero-survivor corpus reports kept=0 instead of crashing on a
    # parquet-less out_dir (Ray writes no files for an empty dataset)
    kept = kept.materialize()
    n = kept.count()
    if n:
        kept.write_parquet(args.out_dir)
    print(json.dumps({"kept": n, "out_dir": args.out_dir}))
    return 0


def cmd_hh(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.sketch import heavy_hitters

    ds = rd.read_parquet(args.table, columns=[args.col])
    out = heavy_hitters(ds, args.col, k=args.k).to_pandas()
    if out.empty:
        print("", end="")
        return 0
    out = out.sort_values(["n", args.col], ascending=[False, True]).reset_index(drop=True)
    print(out.to_json(orient="records", lines=True))
    return 0


def cmd_tfidf(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.text import tfidf_top_terms

    docs = rd.read_parquet(args.documents, columns=[args.id_col, args.text_col])
    out = tfidf_top_terms(docs, id_col=args.id_col, text_col=args.text_col,
                          top_k=args.top_k).to_pandas()
    if out.empty:
        print("", end="")
        return 0
    out = out.sort_values([args.id_col, "score_fp", "term"],
                          ascending=[True, False, True]).reset_index(drop=True)
    print(out.to_json(orient="records", lines=True))
    return 0


def cmd_decontaminate(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.pipelines.curation import decontaminate

    cols = [args.id_col, args.text_col]
    out = decontaminate(
        rd.read_parquet(args.train, columns=[args.text_col]),
        rd.read_parquet(args.test, columns=cols),
        id_col=args.id_col, text_col=args.text_col, ngram=args.ngram,
    ).to_pandas()
    if out.empty:
        print("", end="")
        return 0
    out = out.sort_values(args.id_col).reset_index(drop=True)
    print(out.to_json(orient="records", lines=True))
    return 0


def cmd_pii(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.text import (PII_PATTERNS, pattern_inventory,
                                         scrub_pii)

    ds = rd.read_parquet(args.table, columns=[args.id_col, args.text_col])
    if getattr(args, "inventory", False):
        pats = {k: PII_PATTERNS[k] for k in ("email", "url", "ipv4")}
        out = pattern_inventory(ds, pats, id_col=args.id_col,
                                text_col=args.text_col)
        n = out.count()
        if n:
            out.write_parquet(args.out)
        print(json.dumps({"inventory_rows": int(n), "out": args.out}))
        return 0
    out = scrub_pii(ds, text_col=args.text_col).materialize()
    n = out.count()
    if n:
        out.write_parquet(args.out)
    print(json.dumps({"scrubbed": n, "out": args.out}))
    return 0


def cmd_bpe(args) -> int:
    """Train BPE merges over a documents parquet and write the merge
    table (rank, left, right, merged, pair_count)."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.bpe import bpe_train_merges

    docs = rd.read_parquet(args.documents, columns=[args.text_col])
    out = bpe_train_merges(docs, n_merges=args.merges,
                           max_words=args.max_words,
                           min_pair_count=args.min_pair_count,
                           text_col=args.text_col)
    n = out.count()
    if n:
        out.write_parquet(args.out)
    print(json.dumps({"merges": int(n), "out": args.out}))
    return 0


def cmd_concat(args) -> int:
    """Ordered string_agg: per-key sorted concat signature of a value
    column (string_agg(v, sep ORDER BY v) semantics)."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.stages.groupagg import grouped_sorted_concat

    keys = args.keys.split(",")
    ds = rd.read_parquet(args.table, columns=keys + [args.val])
    out = grouped_sorted_concat(ds, keys=keys, val_col=args.val,
                                sep=args.sep,
                                distinct=not args.keep_dups)
    n = out.count()
    if n:
        out.write_parquet(args.out)
    print(json.dumps({"groups": int(n), "out": args.out}))
    return 0


def cmd_kmeans(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.kmeans import kmeans_fixed_point

    ds = rd.read_parquet(args.table, columns=[args.id_col, args.vec_col])
    out = kmeans_fixed_point(
        ds, vec_col=args.vec_col, id_col=args.id_col,
        k=args.k, iters=args.iters).to_pandas()
    sizes = out.groupby("cluster").size().sort_index()
    print(json.dumps({"cluster_sizes": sizes.to_dict()}))
    if args.out:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False), args.out)
    return 0


def cmd_semdedup(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.kmeans import semdedup_embeddings

    ds = rd.read_parquet(args.table, columns=[args.id_col, args.vec_col])
    out = semdedup_embeddings(
        ds, vec_col=args.vec_col, id_col=args.id_col,
        k=args.k, iters=args.iters, dist2_max=args.dist2).to_pandas()
    print(json.dumps({
        "rows": int(len(out)),
        "kept": int(out["kept"].sum()),
        "dropped": int((out["kept"] == 0).sum()),
    }))
    if args.out:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False), args.out)
    return 0


def cmd_passages(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.pipelines.curation import (dup_passage_stats,
                                             remove_dup_passages)

    ds = rd.read_parquet(args.table, columns=[args.id_col, args.text_col])
    if args.remove:
        out = remove_dup_passages(
            ds, id_col=args.id_col, text_col=args.text_col,
            window=args.window, min_count=args.min_count).to_pandas()
        print(json.dumps({
            "docs": int(len(out)),
            "docs_rewritten": int((out["n_removed"] > 0).sum())
            if len(out) else 0,
            "tokens_removed": int(out["n_removed"].sum())
            if len(out) else 0,
        }))
    else:
        out = dup_passage_stats(
            ds, id_col=args.id_col, text_col=args.text_col,
            window=args.window, min_count=args.min_count).to_pandas()
        tot = int(out["n_tokens"].sum()) if len(out) else 0
        dup = int(out["dup_tokens"].sum()) if len(out) else 0
        print(json.dumps({
            "docs": int(len(out)),
            "docs_with_dup": int((out["dup_tokens"] > 0).sum())
            if len(out) else 0,
            "tokens": tot, "dup_tokens": dup,
            "dup_frac": round(dup / tot, 4) if tot else 0.0,
        }))
    if args.out:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False), args.out)
    return 0


def cmd_dsir(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.pipelines.curation import dsir_importance

    target = rd.read_parquet(args.target, columns=[args.id_col,
                                                   args.text_col])
    raw = rd.read_parquet(args.raw, columns=[args.id_col, args.text_col])
    out = dsir_importance(
        target, raw, id_col=args.id_col, text_col=args.text_col
    ).to_pandas()
    pos = int((out["logw_micronats"] > 0).sum()) if len(out) else 0
    print(json.dumps({
        "raw_docs": int(len(out)), "target_like": pos,
    }))
    if args.out:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False), args.out)
    return 0


def cmd_boiler(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.boilerplate import strip_boilerplate

    # no column pruning: the verb's output IS the kept rows, so every
    # payload column (ids, ordering, roles) must ride through
    ds = rd.read_parquet(args.table)
    total = ds.count()
    kept = strip_boilerplate(
        ds, args.text_col, args.group_col,
        min_groups=args.min_groups).materialize()
    n = kept.count()
    if n:
        kept.write_parquet(args.out)
    print(json.dumps({"kept": n, "total": total, "out": args.out}))
    return 0


def cmd_striplines(args) -> int:
    """Line-level boilerplate removal: rewrite docs dropping lines that
    recur in >= min-docs distinct documents."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.boilerplate import strip_boiler_lines

    ds = rd.read_parquet(args.table)
    out = strip_boiler_lines(
        ds, args.text_col, args.id_col,
        min_docs=args.min_docs).materialize()
    if out.count():  # empty input: nothing to write, report zeros
        out.write_parquet(args.out)
    dropped = out.sum("n_dropped") or 0  # aggregated, not a driver pull
    print(json.dumps({"docs": out.count(), "lines_dropped": int(dropped),
                      "out": args.out}))
    return 0


def cmd_chunk(args) -> int:
    """Split documents into overlapping codepoint context windows — the
    pre-tokenization step. Pure map: streams, no shuffle."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.chunking import chunk_documents

    ds = rd.read_parquet(args.table)
    out = chunk_documents(ds, args.text_col, args.size,
                          args.stride).materialize()
    n = out.count()
    if n:
        out.write_parquet(args.out)
    print(json.dumps({"chunks": n, "out": args.out,
                      "size": args.size, "stride": args.stride}))
    return 0


def cmd_profile(args) -> int:
    """Column profiling over arbitrary parquet — per column row/null
    counts, EXACT distinct cardinality, typed min/max (functions/
    profile.py). Kinds are inferred from the Arrow schema (int→int,
    floating→cents, timestamp→ts_us, string→str) unless --cols
    overrides with col:kind pairs."""
    _ray_up(args.num_cpus)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from guac_ray.functions.profile import table_profile

    if args.cols:
        spec = dict(p.split(":", 1) for p in args.cols.split(","))
    else:
        spec = {}
        for f in pq.read_schema(args.table):
            if pa.types.is_integer(f.type):
                spec[f.name] = "int"
            elif pa.types.is_floating(f.type):
                spec[f.name] = "cents"
            elif pa.types.is_timestamp(f.type):
                spec[f.name] = "ts_us"
            elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
                spec[f.name] = "str"
    t = table_profile(rd.read_parquet(args.table, columns=sorted(spec)),
                      spec)
    print(json.dumps({"profile": t.to_pylist()}))
    return 0


def cmd_expect(args) -> int:
    """Declarative data-quality checks over arbitrary parquet
    (functions/expectations.py). --checks takes a JSON list; fk checks
    name a parent parquet path via "parent". Exit code 1 if any check
    fails — the CI-gate contract."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.expectations import check_table

    checks = json.loads(args.checks)
    for c in checks:
        if c.get("kind") == "fk":
            c["parent"] = rd.read_parquet(c["parent"])
    t = check_table(rd.read_parquet(args.table), checks)
    rows = t.to_pylist()
    print(json.dumps({"checks": rows}))
    return 0 if all(r["passed"] for r in rows) else 1


def cmd_merge(args) -> int:
    """MERGE INTO / CDC upsert+delete over arbitrary parquet
    (functions/streams.py cdc_merge): --base is the keyed snapshot
    (key, value_cents, updated_us), --changelog the event stream with
    an int op column (0 = upsert, 1 = delete); writes the merged
    snapshot and prints row counts. usage:
    merge --base snap.parquet --changelog chg.parquet --out DIR
          [--key user_id --ts ts --order event_id --op op
           --value value_cents]"""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.streams import cdc_merge

    out = cdc_merge(
        rd.read_parquet(args.base), rd.read_parquet(args.changelog),
        key_col=args.key, ts_col=args.ts, order_col=args.order,
        op_col=args.op, value_col=args.value).materialize()
    n = out.count()
    if n:  # empty write creates no files/dir — os.listdir would crash
        out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": n}))
    return 0


def cmd_debounce(args) -> int:
    """Lag-throttle burst filter over an event table (functions/
    streams.py debounce): keep first-per-key and gap > --gap-seconds;
    writes the kept rows (key, order, ts_us, gap_us). usage:
    debounce EVENTS --out DIR [--gap-seconds 3600 --key user_id
             --ts ts --order event_id]"""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.streams import debounce

    out = debounce(rd.read_parquet(args.table),
                   gap_us=int(args.gap_seconds * 1_000_000),
                   user_col=args.key, ts_col=args.ts,
                   order_col=args.order).materialize()
    n = out.count()
    if n:  # empty write creates no files/dir — os.listdir would crash
        out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": n}))
    return 0


def cmd_mode(args) -> int:
    """Exact grouped mode over arbitrary parquet (stages/groupagg.py
    grouped_mode): most frequent --val per --by group, smallest-value
    tie-break; prints the rows (key-cardinality output). usage:
    mode TABLE --by user_id --val event_type"""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.stages.groupagg import grouped_mode

    by = args.by.split(",")
    t = grouped_mode(rd.read_parquet(args.table, columns=by + [args.val]),
                     by, args.val).to_pandas()
    print(json.dumps({"rows": t.to_dict(orient="records")}, default=str))
    return 0


def cmd_pivot(args) -> int:
    """Long -> wide pivot over arbitrary parquet (stages/groupagg.py
    pivot_wide): one row per --by key, one int64 column per --label
    value (count, or sum of --val), absent cells 0; writes the wide
    table to --out or prints it. usage:
    pivot TABLE --by user_id --label event_type [--val value] [--out D]"""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.stages.groupagg import pivot_wide

    by = args.by.split(",")
    cols = by + [args.label] + ([args.val] if args.val else [])
    wide = pivot_wide(
        rd.read_parquet(args.table, columns=cols), by, args.label,
        value_col=args.val, agg="sum" if args.val else "count")
    if args.out:
        wide.write_parquet(args.out)
        print(json.dumps({"out": args.out,
                          "columns": wide.schema().names}))
    else:
        t = wide.to_pandas()
        print(json.dumps({"rows": t.to_dict(orient="records")},
                         default=str))
    return 0


def cmd_cluster(args) -> int:
    """Range-cluster a parquet table on an int64 column and write the
    zone-map layout (sources/layout.py); --probe LO:HI prints the
    pruning plan for a range query over the fresh layout. usage:
    cluster TABLE OUT --by col [--ranges 32] [--probe 4000:4500]"""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.sources.layout import prune_plan, write_clustered

    m = write_clustered(rd.read_parquet(args.table), args.out, args.by,
                        num_ranges=args.ranges)
    rep = {"out": args.out, "ranges": len(m["ranges"]),
           "rows": sum(r["rows"] for r in m["ranges"])}
    if args.probe:
        lo, hi = (int(x) for x in args.probe.split(":", 1))
        p = prune_plan(args.out, lo, hi)
        rep["probe"] = {"lo": lo, "hi": hi,
                        "ranges_read": len(p["read"]),
                        "ranges_skipped": p["skipped"],
                        "rows_read_bound": p["rows_read_bound"]}
    print(json.dumps(rep))
    return 0


def cmd_reconcile(args) -> int:
    """Keyed reconciliation of two parquet tables (functions/setops.py
    reconcile): prints the only_left/only_right/equal/differs summary;
    --detail DIR also writes the per-key status table. Exit 1 unless
    everything reconciled equal — the migration-gate contract. usage:
    reconcile LEFT RIGHT --key k [--compare a,b] [--detail DIR]"""
    _ray_up(args.num_cpus)
    import pyarrow.parquet as pq
    import ray.data as rd

    from guac_ray.functions.setops import reconcile

    key = args.key.split(",")
    if args.compare:
        cmp_cols = args.compare.split(",")
    else:
        cmp_cols = [f.name for f in pq.read_schema(args.left)
                    if f.name not in key]
    l = rd.read_parquet(args.left, columns=key + cmp_cols)
    r = rd.read_parquet(args.right, columns=key + cmp_cols)
    if args.detail:
        reconcile(l, r, key, cmp_cols, detail=True).write_parquet(
            args.detail)
        l = rd.read_parquet(args.left, columns=key + cmp_cols)
        r = rd.read_parquet(args.right, columns=key + cmp_cols)
    t = reconcile(l, r, key, cmp_cols)
    rows = t.to_pylist()
    print(json.dumps({"summary": rows}))
    bad = sum(r_["n_keys"] for r_ in rows if r_["status"] != "equal")
    return 0 if bad == 0 else 1


def cmd_funnel(args) -> int:
    """Anchored funnel over an event table: per-key furthest step and
    step timestamps; prints the per-level completion counts."""
    _ray_up(args.num_cpus)
    import pandas as pd
    import ray.data as rd

    from guac_ray.functions.funnel import funnel

    ds = rd.read_parquet(args.table)
    steps = args.steps.split(",")
    within = pd.Timedelta(args.within) if args.within else None
    out = funnel(ds, args.key, args.order, args.step_col, steps,
                 within=within)
    if hasattr(out, "materialize"):
        out = out.materialize()
        n = out.count()
        if n:
            out.write_parquet(args.out)
        levels = {str(r["funnel_level"]): int(r["count()"])
                  for r in (out.groupby("funnel_level").count().take_all())}
    else:  # typed empty pa.Table
        n, levels = 0, {}
    print(json.dumps({"keys": n, "levels": levels, "out": args.out}))
    return 0


def cmd_engagement(args) -> int:
    """Engagement analytics over an events parquet: per-user
    consecutive-day streaks, first-active cohort retention matrix, or
    rolling DAU/WAU — one islands-family op per invocation."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.streams import (cohort_retention,
                                            daily_streaks,
                                            rolling_active_users)

    from guac_ray.functions.streams import (ewma, gap_quantiles,
                                            time_weighted_mean)

    cols = [args.user_col, args.ts_col]
    if args.op in ("gaps", "twap", "ewma"):
        cols.append(args.order_col)
    if args.op in ("twap", "ewma"):
        cols.append(args.value_col)
    ds = rd.read_parquet(args.table, columns=cols)
    if args.op == "streaks":
        out = daily_streaks(ds, user_col=args.user_col,
                            ts_col=args.ts_col)
    elif args.op == "cohort":
        out = cohort_retention(ds, user_col=args.user_col,
                               ts_col=args.ts_col,
                               period_days=args.period_days)
    elif args.op == "gaps":
        out = gap_quantiles(ds, user_col=args.user_col,
                            ts_col=args.ts_col,
                            order_col=args.order_col)
    elif args.op == "twap":
        out = time_weighted_mean(ds, value_col=args.value_col,
                                 user_col=args.user_col,
                                 ts_col=args.ts_col,
                                 order_col=args.order_col)
    elif args.op == "ewma":
        out = ewma(ds.map_batches(
            lambda df: _cents_frame(
                df, args.value_col,
                [args.user_col, args.ts_col, args.order_col]),
            batch_format="pandas"),
            "_cents", user_col=args.user_col, ts_col=args.ts_col,
            order_col=args.order_col)
    else:
        out = rolling_active_users(ds, user_col=args.user_col,
                                   ts_col=args.ts_col,
                                   window_days=args.window_days)
    n = out.count()
    if n:
        out.write_parquet(args.out)
    print(json.dumps({"op": args.op, "rows": int(n), "out": args.out}))
    return 0


def cmd_index(args) -> int:
    """Build the full inverted index (term, doc_id, tf, doc_freq) from
    a documents parquet and write it as the partitioned artifact."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.text import build_postings

    docs = rd.read_parquet(args.documents,
                           columns=[args.id_col, args.text_col])
    out = build_postings(docs, id_col=args.id_col,
                         text_col=args.text_col)
    n = out.count()
    if n:
        out.write_parquet(args.out)
    print(json.dumps({"postings": int(n), "out": args.out}))
    return 0


def cmd_diff(args) -> int:
    """Graph snapshot diff: edges added/removed between two builds, on
    the FULL edge identity (every payload column — the same identity
    dedup uses). Each direction is one EXCEPT set-op exchange; output
    is two parquet dirs + a one-line summary."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.functions.setops import except_distinct

    a = rd.read_parquet(os.path.join(args.graph_a, "edges"))
    b = rd.read_parquet(os.path.join(args.graph_b, "edges"))
    cols = sorted(set(a.schema().names) & set(b.schema().names))
    if not cols:
        print("error: graphs share no edge columns", file=sys.stderr)
        return 2
    added = except_distinct(b, a, cols)      # in B, not in A
    removed = except_distinct(a, b, cols)    # in A, not in B

    def emit(ds, name):
        if hasattr(ds, "materialize"):
            ds = ds.materialize()
            n = ds.count()
            if n:
                ds.write_parquet(os.path.join(args.out, name))
            return n
        return ds.num_rows  # typed-empty pa.Table

    n_add = emit(added, "added")
    n_rem = emit(removed, "removed")
    print(json.dumps({"added": n_add, "removed": n_rem,
                      "identity_cols": cols, "out": args.out}))
    return 0


def cmd_export(args) -> int:
    """Parquet → sharded JSONL/CSV — the handoff format most training
    stacks ingest. Streamed: each block writes its own shard."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    ds = rd.read_parquet(args.table,
                         columns=args.columns.split(",") if args.columns
                         else None)
    n = ds.count()
    if args.format == "jsonl":
        ds.write_json(args.out)
    else:
        ds.write_csv(args.out)
    print(json.dumps({"rows": n, "out": args.out, "format": args.format}))
    return 0


def cmd_abtest(args) -> int:
    """Experimentation readouts over an events-style parquet: Welch's
    t (means), Mann–Whitney U (stochastic order) or Kolmogorov–
    Smirnov (full CDF shape) between two groups of a categorical
    column — the session-12 stats family from one verb."""
    _ray_up(args.num_cpus)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(args.table,
                         columns=[args.group_col, args.value_col])

    def to_cents(df: "pd.DataFrame") -> "pd.DataFrame":
        out = _cents_frame(df, args.value_col, [args.group_col])
        return out.rename(columns={"_cents": "_v"})

    keyed = ds.map_batches(to_cents, batch_format="pandas")
    if args.test == "ttest":
        from guac_ray.functions.stats import welch_ttest

        out = welch_ttest(keyed, args.group_col, "_v", args.group_b)
    elif args.test == "mw":
        from guac_ray.functions.stats import mann_whitney_u

        out = mann_whitney_u(keyed, args.group_col, "_v",
                             args.group_a, args.group_b)
    else:
        from guac_ray.functions.stats import ks_test

        out = ks_test(keyed, args.group_col, "_v",
                      args.group_a, args.group_b)
    print(out.to_pandas().to_json(orient="records", lines=True))
    return 0


def cmd_refresh(args) -> int:
    """Incremental MV refresh: previous aggregate parquet + signed
    changelog parquet → refreshed aggregate parquet (count + sums),
    bit-identical to a full recompute (stages/groupagg.mv_refresh)."""
    _ray_up(args.num_cpus)
    import ray.data as rd

    from guac_ray.stages.groupagg import mv_refresh

    keys = args.keys.split(",")
    sums = dict(kv.split(":") for kv in args.sums.split(",")) \
        if args.sums else {}
    out = mv_refresh(
        rd.read_parquet(args.base_mv), rd.read_parquet(args.changes),
        keys, args.count_col, sums, sign_col=args.sign_col)
    # materialize once: count + write read the same blocks instead of
    # re-running the exchange reduce twice (the funnel-verb rule)
    out = out.materialize()
    n = out.count()
    if n:
        out.write_parquet(args.out)
    print(json.dumps({"rows": int(n), "out": args.out}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="guac_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="transcripts → nodes/edges Parquet graph")
    b.add_argument("transcripts")
    b.add_argument("out")
    b.add_argument("--catalog", default=None)
    b.add_argument("--partitions", type=int, default=4)
    b.add_argument("--incremental", action="store_true",
                   help="stable file->partition assignment: reruns over a "
                        "grown input dir extract only new/changed shards")
    b.add_argument("--poll", type=int, default=0, metavar="N",
                   help="steady-state mode: poll the input dir up to N "
                        "times (implies --incremental); unchanged polls "
                        "are no-ops, new shards extract + reassemble")
    b.add_argument("--interval", type=float, default=10.0,
                   help="seconds between polls (with --poll)")
    b.add_argument("--idle-stop", type=int, default=None, metavar="K",
                   help="stop after K consecutive no-op polls")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="read-side queries over a built graph")
    q.add_argument("graph")
    q.add_argument("what",
                   choices=["known", "vulns", "patch", "neighbors",
                            "pagerank", "triangles", "kcore", "components",
                            "spath", "truss", "hits", "communities"])
    q.add_argument("key", nargs="?", default=None)
    q.add_argument("--depth", type=int, default=10)
    q.add_argument("--direction", default="out", choices=["out", "in", "both"])
    q.add_argument("--preds", default=None,
                   help="comma-separated predicate filter (patch: e.g. depends_on)")
    q.add_argument("--offset", type=int, default=0)
    q.add_argument("--limit", type=int, default=100)
    q.add_argument("--iters", type=int, default=20,
                   help="pagerank iterations (library default)")
    q.add_argument("--k", type=int, default=3,
                   help="kcore degree threshold")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("simjoin",
                       help="exact n-gram Jaccard similarity join over a "
                            "documents parquet")
    s.add_argument("documents")
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--threshold", type=float, default=0.8)
    s.add_argument("--ngram", type=int, default=10)
    s.set_defaults(fn=cmd_simjoin)

    sb = sub.add_parser("sbom", help="SBOM/VEX documents (SPDX / "
                        "CycloneDX / OpenVEX / CSAF, content-sniffed) → "
                        "nodes/edges Parquet graph")
    sb.add_argument("in_dir")
    sb.add_argument("out_dir")
    sb.add_argument("--num-buckets", type=int, default=16)
    sb.add_argument("--strict", action="store_true",
                    help="fail on unrecognized/malformed documents "
                         "instead of reject-routing them")
    sb.set_defaults(fn=cmd_sbom)

    c = sub.add_parser("compact",
                       help="bin-pack small parquet files into ~target-MB "
                            "files (deterministic, resumable)")
    c.add_argument("in_dir")
    c.add_argument("out_dir")
    c.add_argument("--target-mb", type=int, default=256)
    c.add_argument("--delete-inputs", action="store_true")
    c.set_defaults(fn=cmd_compact)

    u = sub.add_parser("curate",
                       help="quality filter + exact dedup + exact near-dup "
                            "removal + split over a documents parquet")
    u.add_argument("documents")
    u.add_argument("out_dir")
    u.add_argument("--threshold", type=float, default=0.8)
    u.add_argument("--ngram", type=int, default=10)
    u.add_argument("--min-tokens", type=int, default=20)
    u.set_defaults(fn=cmd_curate)

    h = sub.add_parser("hh",
                       help="EXACT heavy hitters (count > rows/k) over one "
                            "column of a parquet table, sketch + verify")
    h.add_argument("table")
    h.add_argument("col")
    h.add_argument("--k", type=int, default=100)
    h.set_defaults(fn=cmd_hh)

    t = sub.add_parser("tfidf",
                       help="per-doc top-k terms by fixed-point tf-idf over "
                            "a documents parquet")
    t.add_argument("documents")
    t.add_argument("--id-col", default="doc_id")
    t.add_argument("--text-col", default="text")
    t.add_argument("--top-k", type=int, default=3)
    t.set_defaults(fn=cmd_tfidf)

    d = sub.add_parser("decontaminate",
                       help="per-test-doc word-ngram overlap with a train "
                            "corpus (train/test leakage audit)")
    d.add_argument("train")
    d.add_argument("test")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--ngram", type=int, default=3)
    d.set_defaults(fn=cmd_decontaminate)

    pi = sub.add_parser("pii",
                        help="redact URLs/emails/IPv4s/phones in a text "
                             "column (RE2 kernels) → parquet + counts")
    pi.add_argument("table")
    pi.add_argument("out")
    pi.add_argument("--id-col", default="doc_id")
    pi.add_argument("--text-col", default="text")
    pi.add_argument("--inventory", action="store_true",
                    help="emit the (id, kind, pii, n) extraction table "
                         "for the token-shaped kinds instead of "
                         "redacting")
    pi.set_defaults(fn=cmd_pii)

    bp = sub.add_parser("bpe",
                        help="train BPE merges over a documents parquet "
                             "→ merge-table parquet")
    bp.add_argument("documents")
    bp.add_argument("out")
    bp.add_argument("--merges", type=int, default=50)
    bp.add_argument("--max-words", type=int, default=50_000)
    bp.add_argument("--min-pair-count", type=int, default=2)
    bp.add_argument("--text-col", default="text")
    bp.set_defaults(fn=cmd_bpe)

    cc = sub.add_parser("concat",
                        help="ordered string_agg: per-key sorted "
                             "value-concat signatures")
    cc.add_argument("table")
    cc.add_argument("out")
    cc.add_argument("--keys", required=True,
                    help="comma-separated key columns")
    cc.add_argument("--val", required=True)
    cc.add_argument("--sep", default="|")
    cc.add_argument("--keep-dups", action="store_true",
                    help="keep duplicate (key, val) rows in the concat")
    cc.set_defaults(fn=cmd_concat)

    km = sub.add_parser("kmeans",
                        help="fixed-point k-means over an embedding column "
                             "(deterministic: int64 distances, floor-div "
                             "centroids)")
    km.add_argument("table")
    km.add_argument("--id-col", default="vec_id")
    km.add_argument("--vec-col", default="embedding")
    km.add_argument("--k", type=int, default=8)
    km.add_argument("--iters", type=int, default=3)
    km.add_argument("--out", default=None)
    km.set_defaults(fn=cmd_kmeans)

    sd = sub.add_parser("semdedup",
                        help="SemDeDup-style semantic dedup: k-means "
                             "buckets + within-cluster near-dup pruning "
                             "(exact int64 distances)")
    sd.add_argument("table")
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--k", type=int, default=8)
    sd.add_argument("--iters", type=int, default=3)
    sd.add_argument("--dist2", type=int, default=1_700_000,
                    help="quantized squared-L2 radius (default ≈ cosine "
                         "0.95 on unit-norm vectors at scale 4096)")
    sd.add_argument("--out", default=None)
    sd.set_defaults(fn=cmd_semdedup)

    pg = sub.add_parser("passages",
                        help="repeated-passage coverage (ExactSubstr "
                             "measurement): tokens inside any window-token "
                             "passage occurring >= min-count times")
    pg.add_argument("table")
    pg.add_argument("--id-col", default="doc_id")
    pg.add_argument("--text-col", default="text")
    pg.add_argument("--window", type=int, default=10)
    pg.add_argument("--min-count", type=int, default=2)
    pg.add_argument("--remove", action="store_true",
                    help="rewrite docs dropping covered tokens "
                         "(clean_text parquet) instead of reporting "
                         "coverage stats")
    pg.add_argument("--out", default=None)
    pg.set_defaults(fn=cmd_passages)

    dr = sub.add_parser("dsir",
                        help="DSIR importance weights: score raw-pool "
                             "docs by the target-vs-raw unigram-LM "
                             "log-likelihood ratio (exact micro-nats)")
    dr.add_argument("target", help="target-domain documents parquet")
    dr.add_argument("raw", help="raw-pool documents parquet")
    dr.add_argument("--id-col", default="doc_id")
    dr.add_argument("--text-col", default="text")
    dr.add_argument("--out", default=None)
    dr.set_defaults(fn=cmd_dsir)

    bo = sub.add_parser("boiler",
                        help="drop rows whose text recurs in >= min-groups "
                             "distinct groups (cross-group boilerplate)")
    bo.add_argument("table")
    bo.add_argument("out")
    bo.add_argument("--group-col", required=True)
    bo.add_argument("--text-col", default="text")
    bo.add_argument("--min-groups", type=int, default=50)
    bo.set_defaults(fn=cmd_boiler)

    sl = sub.add_parser("striplines",
                        help="rewrite docs dropping lines recurring in "
                             ">= min-docs distinct documents")
    sl.add_argument("table")
    sl.add_argument("out")
    sl.add_argument("--id-col", default="doc_id")
    sl.add_argument("--text-col", default="text")
    sl.add_argument("--min-docs", type=int, default=20)
    sl.set_defaults(fn=cmd_striplines)

    ch = sub.add_parser("chunk",
                        help="documents → overlapping context windows")
    ch.add_argument("table")
    ch.add_argument("out")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--size", type=int, default=2048)
    ch.add_argument("--stride", type=int, default=1536)
    ch.set_defaults(fn=cmd_chunk)

    pr = sub.add_parser("profile",
                        help="per-column stats: nulls, exact distinct, "
                             "typed min/max")
    pr.add_argument("table")
    pr.add_argument("--cols", default=None,
                    help="comma list of col:kind (int|cents|ts_us|str); "
                         "default: inferred from the schema")
    pr.set_defaults(fn=cmd_profile)

    ex = sub.add_parser("expect",
                        help="data-quality checks (unique/not_null/"
                             "accepted_values/range_cents/fk); exit 1 "
                             "on failure")
    ex.add_argument("table")
    ex.add_argument("--checks", required=True,
                    help="JSON list of check dicts")
    ex.set_defaults(fn=cmd_expect)

    mg = sub.add_parser("merge",
                        help="CDC MERGE: upsert+delete changelog onto "
                             "a keyed snapshot")
    mg.add_argument("--base", required=True)
    mg.add_argument("--changelog", required=True)
    mg.add_argument("--out", required=True)
    mg.add_argument("--key", default="user_id")
    mg.add_argument("--ts", default="ts")
    mg.add_argument("--order", default="event_id")
    mg.add_argument("--op", default="op")
    mg.add_argument("--value", default="value_cents")
    mg.set_defaults(fn=cmd_merge)

    db = sub.add_parser("debounce",
                        help="burst filter: keep first-per-key and "
                             "gap > threshold")
    db.add_argument("table")
    db.add_argument("--out", required=True)
    db.add_argument("--gap-seconds", type=float, default=3600.0)
    db.add_argument("--key", default="user_id")
    db.add_argument("--ts", default="ts")
    db.add_argument("--order", default="event_id")
    db.set_defaults(fn=cmd_debounce)

    mo = sub.add_parser("mode",
                        help="exact grouped mode (argmax category per "
                             "group, smallest-value tie-break)")
    mo.add_argument("table")
    mo.add_argument("--by", required=True,
                    help="comma list of key columns")
    mo.add_argument("--val", required=True)
    mo.set_defaults(fn=cmd_mode)

    pv = sub.add_parser("pivot",
                        help="long -> wide pivot (one column per "
                             "label value, zero-filled cells)")
    pv.add_argument("table")
    pv.add_argument("--by", required=True,
                    help="comma list of key columns")
    pv.add_argument("--label", required=True)
    pv.add_argument("--val", default=None,
                    help="sum this column instead of counting rows")
    pv.add_argument("--out", default=None)
    pv.set_defaults(fn=cmd_pivot)

    cl = sub.add_parser("cluster",
                        help="range-cluster a table + zone-map "
                             "manifest (data-skipping layout)")
    cl.add_argument("table")
    cl.add_argument("out")
    cl.add_argument("--by", required=True)
    cl.add_argument("--ranges", type=int, default=32)
    cl.add_argument("--probe", default=None,
                    help="LO:HI — print the pruning plan for this "
                         "range query")
    cl.set_defaults(fn=cmd_cluster)

    rc = sub.add_parser("reconcile",
                        help="keyed diff of two tables (only_left/"
                             "only_right/equal/differs); exit 1 unless "
                             "all equal")
    rc.add_argument("left")
    rc.add_argument("right")
    rc.add_argument("--key", required=True,
                    help="comma list of key columns")
    rc.add_argument("--compare", default=None,
                    help="comma list of value columns (default: every "
                         "non-key column of LEFT)")
    rc.add_argument("--detail", default=None,
                    help="also write the per-key status parquet here")
    rc.set_defaults(fn=cmd_reconcile)

    fu = sub.add_parser("funnel",
                        help="anchored step funnel over an event table")
    fu.add_argument("table")
    fu.add_argument("out")
    fu.add_argument("--key", default="user_id")
    fu.add_argument("--order", default="ts")
    fu.add_argument("--step-col", default="event_type")
    fu.add_argument("--steps", required=True,
                    help="comma-separated ordered step values")
    fu.add_argument("--within", default=None,
                    help="anchored horizon, e.g. '7 days' (pandas Timedelta)")
    fu.set_defaults(fn=cmd_funnel)

    en = sub.add_parser("engagement",
                        help="streaks / cohort retention / rolling "
                             "DAU-WAU over an events parquet")
    en.add_argument("table")
    en.add_argument("out")
    en.add_argument("--op", choices=["streaks", "cohort", "dauwau",
                                     "gaps", "twap", "ewma"],
                    default="streaks")
    en.add_argument("--user-col", default="user_id")
    en.add_argument("--ts-col", default="ts")
    en.add_argument("--period-days", type=int, default=1,
                    help="cohort period (1=daily, 7=weekly)")
    en.add_argument("--window-days", type=int, default=7,
                    help="dauwau trailing window")
    en.add_argument("--order-col", default="event_id",
                    help="gaps/twap tie-break column")
    en.add_argument("--value-col", default="value",
                    help="twap value column")
    en.set_defaults(fn=cmd_engagement)

    ab = sub.add_parser("abtest",
                        help="Welch t / Mann-Whitney / KS between two "
                             "groups of a categorical column")
    ab.add_argument("table")
    ab.add_argument("--test", choices=["ttest", "mw", "ks"],
                    default="ttest")
    ab.add_argument("--group-col", default="event_type")
    ab.add_argument("--value-col", default="value")
    ab.add_argument("--group-a", default="purchase")
    ab.add_argument("--group-b", default="view",
                    help="ttest: the control group")
    ab.set_defaults(fn=cmd_abtest)

    rf = sub.add_parser("refresh",
                        help="incremental MV refresh: base aggregate + "
                             "signed changelog -> refreshed aggregate")
    rf.add_argument("base_mv")
    rf.add_argument("changes")
    rf.add_argument("out")
    rf.add_argument("--keys", required=True,
                    help="comma-separated group keys")
    rf.add_argument("--count-col", default="n")
    rf.add_argument("--sums", default=None,
                    help="mv_col:change_value_col pairs, comma-separated")
    rf.add_argument("--sign-col", default="sign")
    rf.set_defaults(fn=cmd_refresh)

    ix = sub.add_parser("index",
                        help="build the full inverted index (term, doc, "
                             "tf, df) from a documents parquet")
    ix.add_argument("documents")
    ix.add_argument("out")
    ix.add_argument("--id-col", default="doc_id")
    ix.add_argument("--text-col", default="text")
    ix.set_defaults(fn=cmd_index)

    df_ = sub.add_parser("diff",
                         help="edges added/removed between two graph builds")
    df_.add_argument("graph_a")
    df_.add_argument("graph_b")
    df_.add_argument("out")
    df_.set_defaults(fn=cmd_diff)

    ex = sub.add_parser("export",
                        help="parquet → sharded jsonl/csv (streamed, one "
                             "shard per block)")
    ex.add_argument("table")
    ex.add_argument("out")
    ex.add_argument("--format", choices=["jsonl", "csv"], default="jsonl")
    ex.add_argument("--columns", default=None,
                    help="comma-separated column subset")
    ex.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())

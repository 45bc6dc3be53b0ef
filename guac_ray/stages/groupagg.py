"""Bucketed two-phase grouped aggregation — the engine's workhorse
replacement for ``Dataset.groupby().aggregate(...)``.

Why: Ray 2.49's built-in aggregate reduces per-key in Python during the
sort-based shuffle; at 15k distinct int keys over 330k rows it measures
~114 s on this node, while this implementation's
partial-pandas-agg → hash-bucket shuffle → per-bucket pandas-agg
measures ~0.8 s (same result, same machine). The shuffle here moves one
partial row per (key, input block) — bounded by cardinality × blocks,
never the fact table — and each reduce group is a COARSE bucket
(``num_buckets`` of them), so per-group dispatch overhead is constant.

Supported aggs: sum, count, min, max, mean (mean = sum+count partials,
exact division at finalize).

``num_buckets`` sizes reduce parallelism: each bucket holds
≈ cardinality / num_buckets keys and must fit a worker's memory — raise
it with cardinality (it is the reduce-partition count, exactly like a
shuffle partition count in any MPP engine).
"""

from __future__ import annotations

from guac_ray.arrowutil import table_from_pandas

import pandas as pd

from ray.data import Dataset

from guac_ray.stages.assemble import stable_hash

__all__ = ["grouped_agg", "grouped_first_last", "grouped_sorted_concat",
           "grouped_mode", "mv_refresh"]

_PARTIAL = {
    "sum": "sum",
    "count": "size",      # COUNT(*): rows, NULLs included (documented)
    "nncount": "count",   # internal: non-null count — mean's denominator
    "min": "min",
    "max": "max",
}
_FINAL = {
    "sum": "sum",
    "count": "sum",   # partial counts sum up
    "nncount": "sum",
    "min": "min",
    "max": "max",
}


def grouped_agg(
    ds: Dataset,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    num_buckets: int = 32,
    use_exchange: bool = True,
) -> Dataset:
    """``spec``: {out_col: (in_col, fn)} with fn ∈ sum|count|min|max|mean.
    For ``count`` the in_col only anchors the row count — it is SQL
    COUNT(*), NULLs included. ``mean`` divides by the NON-NULL count
    (SQL AVG; an all-NULL group yields NaN/NULL). Returns a
    Dataset with columns keys + spec keys.

    ``use_exchange=True`` (default) routes the final phase through the
    filesystem-partitioned exchange (``fs_exchange_reduce``): both
    phases are pure map work, the reduce reads only populated buckets
    (no empty placeholder blocks from Ray's sort partitions), and the
    partial write runs eagerly. ``use_exchange=False`` keeps the fully
    lazy object-store ``groupby(bucket).map_groups`` plan — also the
    automatic fallback when the partial phase writes zero rows, where
    the exchange has no schema to reduce over."""
    means = {o: c for o, (c, f) in spec.items() if f == "mean"}
    plain = {o: (c, f) for o, (c, f) in spec.items() if f != "mean"}
    # mean decomposes into hidden sum/count partials
    hidden: dict[str, tuple[str, str]] = {}
    for o, c in means.items():
        hidden[f"_{o}_s"] = (c, "sum")
        # NON-NULL count: pandas sum skips NaN, so a size-based
        # denominator silently deflates the mean of any nullable
        # column (sum(skipna)/count(all)); SQL AVG divides by the
        # non-null count, and so do we — an all-NULL group divides
        # 0/0 → NaN, which IS SQL's NULL AVG
        hidden[f"_{o}_n"] = (c, "nncount")
    clash = set(hidden) & set(spec)
    if clash:
        # {**plain, **hidden} would silently overwrite the user's
        # column with the mean's internal partial and finalize would
        # then DROP it from the output
        raise ValueError(
            f"grouped_agg: output name(s) {sorted(clash)} collide with "
            f"the hidden mean partials of {sorted(means)} — rename")
    allspec = {**plain, **hidden}

    import pyarrow as pa

    def partial(df: pd.DataFrame) -> "pa.Table":
        if df.empty:
            cols = {k: pd.Series([], dtype=df[k].dtype if k in df else "object")
                    for k in keys}
            for o, (c, f) in allspec.items():
                # partial dtype must match the non-empty blocks': counts
                # are int64, everything else carries the source dtype
                # (float64 placeholders corrupt e.g. timestamp min/max
                # at the Arrow schema-unification boundary)
                if f in ("count", "nncount"):
                    cols[o] = pd.Series([], dtype="int64")
                else:
                    cols[o] = pd.Series(
                        [], dtype=df[c].dtype if c in df else "float64")
            out = pd.DataFrame(cols)
        else:
            g = df.groupby(keys, sort=False, dropna=False)
            pieces = {}
            for o, (c, f) in allspec.items():
                pieces[o] = g[c].agg(_PARTIAL[f])
            out = pd.DataFrame(pieces).reset_index()
        out["_bucket"] = (stable_hash(out, keys) % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def final(g: pd.DataFrame) -> "pa.Table":
        gg = g.groupby(keys, sort=False, dropna=False)
        pieces = {}
        for o, (c, f) in allspec.items():
            pieces[o] = gg[o].agg(_FINAL[f])
        out = pd.DataFrame(pieces).reset_index()
        for o in means:
            out[o] = out[f"_{o}_s"] / out[f"_{o}_n"]
            out = out.drop(columns=[f"_{o}_s", f"_{o}_n"])
        return table_from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    if use_exchange:
        from guac_ray.functions.joins import default_exchange
        from guac_ray.stages.assemble import fs_exchange_reduce

        def final_t(t: "pa.Table") -> "pa.Table":
            return final(t.to_pandas())

        out = fs_exchange_reduce(partials, default_exchange("groupagg"), final_t)
        if out is not None:
            return out
        # zero partial rows: fall through to the lazy plan, which keeps
        # the historical empty-result shape
        partials = ds.map_batches(partial, batch_format="pandas")
    return (
        partials
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
    )


def grouped_first_last(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    spec: dict[str, tuple[str, str]],
    num_buckets: int = 32,
) -> Dataset:
    """Distributed grouped aggregation with ARGMIN/ARGMAX members —
    the ``min_by``/``max_by`` (a.k.a. first/last-value) aggregate
    family ``grouped_agg`` cannot express: ``spec`` maps
    {out_col: (value_col, fn)} with fn ∈ first|last|min|max|sum|count,
    where ``first``/``last`` return the value at the lexicographic
    MIN/MAX of the ``order_cols`` tuple within the group. Callers make
    the order tuple unique (e.g. append the row's primary key) and the
    result is deterministic under ANY partitioning — the merge of two
    partial firsts is the one with the smaller order tuple, which is an
    associative/commutative combine, exactly like sum.

    Shape: same two-phase discipline as ``grouped_agg`` — the per-batch
    partial compacts each group to ONE row (its first/last candidates
    carry their order tuples alongside, the plain aggs combine as
    usual), so the exchange ships cardinality × blocks rows, never the
    fact table; the per-bucket finalize re-runs the identical
    keep-first / keep-last merge over the partial candidates. Both
    phases are vectorized pandas (one stable sort + ``drop_duplicates``
    per phase)."""
    import pyarrow as pa

    firsts_spec = {o: c for o, (c, f) in spec.items() if f == "first"}
    lasts_spec = {o: c for o, (c, f) in spec.items() if f == "last"}
    plain = {o: (c, f) for o, (c, f) in spec.items()
             if f not in ("first", "last")}
    fo = [f"_fo_{c}" for c in order_cols]
    lo = [f"_lo_{c}" for c in order_cols]
    need_first = bool(firsts_spec)
    need_last = bool(lasts_spec)

    def partial(df: pd.DataFrame) -> "pa.Table":
        if df.empty:
            # column ORDER must mirror the non-empty path exactly —
            # Arrow schema unification at the exchange is positional-
            # name-sensitive across blocks
            def _dt(c):
                return df[c].dtype if c in df else "float64"

            cols = {k: pd.Series([], dtype=df[k].dtype if k in df
                                 else "object") for k in keys}
            if need_first:
                for oc, name in zip(order_cols, fo):
                    cols[name] = pd.Series([], dtype=_dt(oc))
                for o, c in firsts_spec.items():
                    cols[o] = pd.Series([], dtype=_dt(c))
            if need_last:
                for oc, name in zip(order_cols, lo):
                    cols[name] = pd.Series([], dtype=_dt(oc))
                for o, c in lasts_spec.items():
                    cols[o] = pd.Series([], dtype=_dt(c))
            for o, (c, f) in plain.items():
                cols[o] = pd.Series([], dtype="int64" if f == "count"
                                    else _dt(c))
            out = pd.DataFrame(cols)
        else:
            # SQL arg_min/arg_max IGNORE null ordering keys: a NULL
            # order tuple must never win either pick (pandas' default
            # na_position='last' would crown it the group's 'last').
            # Two-step stable sorts vary na placement on the ORDER
            # columns only, so both frames walk groups in one order
            # even with NULL keys; an all-null-order group still keeps
            # a row (its null row — never silently dropped).
            srt = (df.sort_values(order_cols, kind="mergesort",
                                  na_position="last")
                   .sort_values(keys, kind="mergesort"))
            f1 = srt.drop_duplicates(subset=keys, keep="first")
            l1 = (df.sort_values(order_cols, kind="mergesort",
                                 na_position="first")
                  .sort_values(keys, kind="mergesort")
                  .drop_duplicates(subset=keys, keep="last"))
            # f1/l1/groupby(sort=False) all walk groups in the same
            # key-sorted order srt established
            out = f1[keys].reset_index(drop=True)
            if need_first:
                for oc, name in zip(order_cols, fo):
                    out[name] = f1[oc].to_numpy()
                for o, c in firsts_spec.items():
                    out[o] = f1[c].to_numpy()
            if need_last:
                for oc, name in zip(order_cols, lo):
                    out[name] = l1[oc].to_numpy()
                for o, c in lasts_spec.items():
                    out[o] = l1[c].to_numpy()
            if plain:
                g = srt.groupby(keys, sort=False, dropna=False)
                for o, (c, f) in plain.items():
                    out[o] = g[c].agg(_PARTIAL[f]).to_numpy()
        out["_bucket"] = (stable_hash(out, keys) % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def final(t: "pa.Table") -> "pa.Table":
        g = t.to_pandas()
        parts = []
        if need_first:
            f1 = (g.sort_values(fo, kind="mergesort", na_position="last")
                  .sort_values(keys, kind="mergesort")
                  .drop_duplicates(subset=keys, keep="first")
                  .set_index(keys))
            parts.append(f1[list(firsts_spec)])
        if need_last:
            l1 = (g.sort_values(lo, kind="mergesort", na_position="first")
                  .sort_values(keys, kind="mergesort")
                  .drop_duplicates(subset=keys, keep="last")
                  .set_index(keys))
            parts.append(l1[list(lasts_spec)])
        if plain:
            gg = g.groupby(keys, sort=True, dropna=False)
            parts.append(pd.DataFrame(
                {o: gg[o].agg(_FINAL[f]) for o, (c, f) in plain.items()}))
        out = pd.concat(parts, axis=1)[list(spec)].reset_index()
        return table_from_pandas(out, preserve_index=False)

    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    partials = ds.map_batches(partial, batch_format="pandas")
    out = fs_exchange_reduce(partials, default_exchange("firstlast"), final)
    if out is not None:
        return out
    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("_bucket").map_groups(
        lambda df: final(table_from_pandas(df, preserve_index=False)),
        batch_format="pandas")


def grouped_sorted_concat(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    sep: str = "|",
    out_col: str = "concat",
    distinct: bool = True,
    num_buckets: int = 32,
    exchange_base: str | None = None,
) -> Dataset:
    """ORDER-SENSITIVE list/string aggregate — the ``string_agg(v, sep
    ORDER BY v)`` / sorted ``collect_list`` family the partial-agg
    machinery above cannot express (sum/min/max partials commute;
    a concatenation does not). One row per key group with ``n_items``
    and ``out_col`` = the group's values sorted ASC joined by ``sep`` —
    a canonical group signature, identical on any engine.

    Shape: batches project to (keys, val) and pre-dedup IN-BATCH when
    ``distinct`` (the combiner — the exchange ships at most one row per
    (key, val) per block, never the fact table); ONE key-hash fs
    exchange co-locates each group, where the in-bucket distinct IS the
    global distinct; the join itself is ``pyarrow.compute.binary_join``
    over group-offset ListArrays — C++ vectorized, NO per-group Python
    call. Buckets scale with the cluster. int32 list offsets bound one
    bucket's value bytes at 2 GiB — raise ``num_buckets`` for wider
    groups (the same contract as every exchange op here)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    def add_bucket(df: pd.DataFrame) -> "pa.Table":
        out = df[keys + [val_col]]
        if distinct:
            out = out.drop_duplicates()
        out = out.copy()
        out["_bucket"] = (stable_hash(out, keys)
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: "pa.Table") -> "pa.Table":
        df = t.to_pandas()[keys + [val_col]]
        if distinct:
            df = df.drop_duplicates()
        df = df.sort_values(keys + [val_col], kind="mergesort")
        n = len(df)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for k in keys:
            av = df[k]
            cur = av.iloc[1:]
            prev = av.iloc[:-1].set_axis(av.index[1:])
            # NaN != NaN is True (and pd.NA propagates), so a NULL key
            # would open a boundary at EVERY row — null-safe equality:
            # rows differ unless equal or both null
            diff = (cur != prev) & ~(cur.isna() & prev.isna())
            new[1:] |= diff.fillna(True).to_numpy(dtype=bool)
        starts = np.flatnonzero(new)
        offsets = np.append(starts, n).astype("int32")
        vals = pa.array(df[val_col].astype(str).to_numpy(), pa.string())
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals),
            sep)
        cols = {k: pa.array(df[k].to_numpy()[starts]) for k in keys}
        cols["n_items"] = pa.array(np.diff(offsets).astype("int64"))
        cols[out_col] = joined
        return pa.table(cols)

    out = fs_exchange_reduce(
        ds.map_batches(add_bucket, batch_format="pandas"),
        exchange_base or default_exchange("sconcat"), reduce_fn)
    if out is None:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}
        fields = [(k, types.get(k) if isinstance(types.get(k), pa.DataType)
                   else pa.string()) for k in keys]
        return rd.from_arrow(pa.schema(
            fields + [("n_items", pa.int64()),
                      (out_col, pa.string())]).empty_table())
    return out


def grouped_mode(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    num_buckets: int = 32,
    exchange_base: str | None = None,
) -> Dataset:
    """EXACT grouped mode with a deterministic tie-break: the most
    frequent ``val_col`` value per key group, ties going to the
    SMALLEST value — the argmax-per-group aggregate (dominant category
    per user, majority label per cluster) that sum/min/max partials
    cannot express but COUNT partials can: a group's global value
    counts are the sum of its per-block counts, so the exchange ships
    one count partial per (key, value, block), never the fact table.
    Output: one row per key group — ``keys…, mode, n_mode`` (mode in
    ``val_col``'s dtype, n_mode int64), identical on any engine.

    Shape: in-batch (keys, val) count combiner → ONE key-hash fs
    exchange (a group's value counts land in one bucket, so in-bucket
    argmax IS global argmax); per bucket one groupby-sum, one
    mergesort by (keys ASC, n DESC, val ASC) and a drop_duplicates
    head — all C-vectorized, no per-group Python."""
    import pyarrow as pa
    import ray.data as rd

    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    def add_bucket(df: pd.DataFrame) -> "pa.Table":
        # SQL mode() ignores NULL values; SQL GROUP BY keeps NULL keys
        # (dropna=False — pandas' default silently deleted those
        # groups). A group whose values are ALL null has no computable
        # mode and is omitted (documented divergence from SQL's
        # NULL-mode row).
        df = df[df[val_col].notna()]
        out = (df.groupby(keys + [val_col], sort=False, dropna=False)
               .size().rename("_n").reset_index())
        out["_n"] = out["_n"].astype("int64")
        out["_bucket"] = (stable_hash(out, keys)
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: "pa.Table") -> "pa.Table":
        df = (t.to_pandas().groupby(keys + [val_col], sort=False,
                                    dropna=False)["_n"]
              .sum().reset_index())
        df = df.sort_values(
            keys + ["_n", val_col],
            ascending=[True] * len(keys) + [False, True],
            kind="mergesort")
        out = df.drop_duplicates(keys, keep="first").rename(
            columns={val_col: "mode", "_n": "n_mode"})
        out["n_mode"] = out["n_mode"].astype("int64")
        return table_from_pandas(out, preserve_index=False)

    out = fs_exchange_reduce(
        ds.map_batches(add_bucket, batch_format="pandas"),
        exchange_base or default_exchange("gmode"), reduce_fn)
    if out is None:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}

        def at(c):
            ty = types.get(c)
            return ty if isinstance(ty, pa.DataType) else pa.string()

        return rd.from_arrow(pa.schema(
            [(c, at(c)) for c in keys]
            + [("mode", at(val_col)), ("n_mode", pa.int64())]
        ).empty_table())
    return out


def pivot_wide(
    ds: Dataset,
    key_cols: list[str],
    label_col: str,
    value_col: str | None = None,
    agg: str = "count",
    labels: list[str] | None = None,
    prefix: str = "n_",
    exchange_base: str | None = None,
    num_buckets: int = 16,
    label_cap: int = 256,
) -> Dataset:
    """Long → wide pivot: one output row per distinct ``key_cols``
    tuple, one int64 column per label (``prefix + label``) holding the
    ``agg`` (``count`` of rows, or ``sum`` of ``value_col``) for that
    (key, label) cell — absent cells fill 0, because a pivoted frame
    with silent NULL holes breaks every downstream matrix consumer.

    Labels become COLUMNS, so they are a schema-level contract:
    pass ``labels`` explicitly for a stable schema, or let one
    label-cardinality distinct pass discover them (deterministic
    sorted order, ``label_cap`` guarded — a pivot over an unbounded
    label domain is a modeling error, not a scaling problem; keep
    long format and ``grouped_agg`` instead).

    Scale shape: in-batch (key, label) combine first, so the ONE
    key-hash fs exchange ships cell-grain partials (keys × labels per
    block), never input rows; per bucket one vectorized
    ``pivot_table`` + column reindex (a key lives in one bucket, so
    in-bucket cells are globally complete). Nothing driver-sized
    except the label list itself."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    if agg not in ("count", "sum"):
        raise ValueError(f"pivot_wide: unsupported agg {agg!r} "
                         "(count | sum)")
    if agg == "sum" and value_col is None:
        raise ValueError("pivot_wide: agg='sum' needs value_col")

    def _require_nonnull(df: pd.DataFrame):
        # NULL keys/labels are a LOUD contract, not a silent drop:
        # pandas groupby would drop them where SQL GROUP BY keeps the
        # NULL group, and a NULL label cannot become a column — callers
        # fill_null or filter upstream, explicitly
        for c in list(key_cols) + [label_col]:
            if df[c].isna().any():
                raise ValueError(
                    f"pivot_wide: NULL in {c!r} — pivot keys and labels "
                    "must be non-null (fill_null or filter upstream)")

    cols = list(key_cols) + [label_col] + (
        [value_col] if agg == "sum" else [])
    narrow = ds.select_columns(cols)

    if labels is None:
        def batch_labels(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            u = pc.unique(t[label_col])
            return pa.table({"_l": u})

        found = narrow.select_columns([label_col]).map_batches(
            batch_labels, batch_format="pyarrow").to_pandas()
        uniq = found["_l"].unique().tolist()
        if any(x is None for x in uniq):
            raise ValueError(
                "pivot_wide: NULL label encountered during discovery — "
                "a NULL cannot become a column (fill_null upstream)")
        labels = sorted(uniq)
    if len(labels) > label_cap:
        raise ValueError(
            f"pivot_wide: {len(labels)} labels exceed label_cap "
            f"({label_cap}) — a pivot this wide is a schema smell; "
            "stay long-format (grouped_agg) or raise label_cap")
    label_list = [str(x) for x in labels]
    out_cols = [prefix + x for x in label_list]

    def partial(df: pd.DataFrame) -> "pa.Table":
        _require_nonnull(df)
        if agg == "count":
            g = (df.groupby(key_cols + [label_col], sort=False)
                 .size().reset_index(name="_v"))
        else:
            v = df[value_col].to_numpy()
            if not np.issubdtype(v.dtype, np.integer):
                raise TypeError(
                    "pivot_wide: sum needs an integer value column "
                    f"(use the cents trick for floats), got {v.dtype}")
            g = (df.assign(_v=v.astype("int64"))
                 .groupby(key_cols + [label_col], sort=False)
                 ._v.sum().reset_index())
        g["_v"] = g["_v"].astype("int64")
        g["_bucket"] = (stable_hash(g, key_cols)
                        % num_buckets).astype("int64")
        return table_from_pandas(g, preserve_index=False)

    def reduce_fn(t: "pa.Table") -> "pa.Table":
        df = t.to_pandas()
        wide = pd.pivot_table(df, index=key_cols, columns=label_col,
                              values="_v", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=labels, fill_value=0)
        wide.columns = out_cols
        wide = wide.reset_index()
        for c in out_cols:
            wide[c] = wide[c].to_numpy().astype("int64")
        return table_from_pandas(wide, preserve_index=False)

    out = fs_exchange_reduce(
        narrow.map_batches(partial, batch_format="pandas"),
        exchange_base or default_exchange("pivot"), reduce_fn)
    if out is None:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}

        def at(c):
            ty = types.get(c)
            # pandas-born blocks report numpy dtypes here (the
            # grouped_mode fallback rule)
            return ty if isinstance(ty, pa.DataType) else pa.string()

        return rd.from_arrow(pa.schema(
            [(c, at(c)) for c in key_cols]
            + [(c, pa.int64()) for c in out_cols]).empty_table())
    return out


def mv_refresh(
    base_mv: Dataset,
    changes: Dataset,
    keys: list[str],
    count_col: str,
    sum_cols: dict[str, str],
    sign_col: str = "sign",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """INCREMENTAL materialized-view maintenance for count/sum
    aggregates — the delta-refresh every lakehouse MV engine runs
    instead of recomputing: given the PREVIOUS aggregate
    (``base_mv``: keys + ``count_col`` + the ``sum_cols`` outputs) and
    a signed changelog (``changes``: keys + ``sign_col`` ∈ {+1, −1} +
    one input value column per sum), produce the refreshed aggregate

        n'   = n_base + Σ sign
        sum' = sum_base + Σ sign·v

    with groups reaching n' == 0 DROPPED (a fully-deleted group
    vanishes, exactly as a recompute would drop it) and n' < 0 a LOUD
    error — more deletes than existing rows means the changelog and
    the snapshot disagree, and a silently negative count would poison
    every later refresh. Counts and sums are exact int64, so the
    refreshed table is bit-identical to a full recompute over
    base-rows ∪ changes (the correctness contract a SQL oracle checks).

    Shape: the changelog pre-combines per batch (one signed partial
    row per (key, block) — the grouped_agg discipline), then BOTH
    sides flow through ONE shared key-hash exchange
    (``fs_exchange_reduce_multi``); the per-bucket reduce is a single
    groupby-sum. The base MV is never rescanned at fact grain and the
    changelog never touches base facts — the whole point of
    incremental maintenance. ``sum_cols``: {mv_output_col:
    change_value_col}; all value columns must be integer (the cents
    trick), asserted per batch."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce_multi

    out_cols = [count_col] + list(sum_cols)

    def _check_int(v, name):
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"mv_refresh: {name!r} must be integer (use the cents "
                f"trick for floats), got {v.dtype}")
        return v.astype(np.int64)

    def tag_base(df: pd.DataFrame) -> "pa.Table":
        out = df[keys].copy()
        out[count_col] = _check_int(df[count_col].to_numpy(), count_col)
        for mc in sum_cols:
            out[mc] = _check_int(df[mc].to_numpy(), mc)
        out["_bucket"] = (stable_hash(out, keys)
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def tag_changes(df: pd.DataFrame) -> "pa.Table":
        sign = _check_int(df[sign_col].to_numpy(), sign_col)
        bad = ~np.isin(sign, (1, -1))
        if bad.any():
            raise ValueError(
                f"mv_refresh: {sign_col!r} must be +1 or -1 "
                f"({int(bad.sum())} offending rows in one batch) — an "
                "unexpected op code silently mis-weighted into the MV "
                "would corrupt every later refresh")
        part = df[keys].copy()
        part[count_col] = sign
        for mc, vc in sum_cols.items():
            part[mc] = sign * _check_int(df[vc].to_numpy(), vc)
        g = (part.groupby(keys, sort=False, dropna=False)[out_cols]
             .sum().reset_index())
        for c in out_cols:
            g[c] = g[c].astype("int64")
        g["_bucket"] = (stable_hash(g, keys)
                        % num_buckets).astype("int64")
        return table_from_pandas(g, preserve_index=False)

    def reduce_fn(t: "pa.Table") -> "pa.Table":
        df = t.to_pandas()
        g = (df.groupby(keys, sort=False, dropna=False)[out_cols]
             .sum().reset_index())
        neg = g[count_col] < 0
        if neg.any():
            bad = g.loc[neg, keys].iloc[0].to_dict()
            raise ValueError(
                f"mv_refresh: group {bad} would reach count "
                f"{int(g.loc[neg, count_col].iloc[0])} < 0 — the "
                "changelog deletes rows the base snapshot does not "
                "hold; reconcile the inputs (a negative count would "
                "poison every later refresh)")
        g = g[g[count_col] != 0]
        for c in out_cols:
            g[c] = g[c].astype("int64")
        return table_from_pandas(g, preserve_index=False)

    out = fs_exchange_reduce_multi(
        [base_mv.map_batches(tag_base, batch_format="pandas"),
         changes.map_batches(tag_changes, batch_format="pandas")],
        exchange_base or default_exchange("mvrefresh"), reduce_fn)
    if out is None:
        sch = base_mv.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}

        def at(c):
            ty = types.get(c)
            return ty if isinstance(ty, pa.DataType) else pa.string()

        return rd.from_arrow(pa.schema(
            [(c, at(c)) for c in keys]
            + [(c, pa.int64()) for c in out_cols]).empty_table())
    return out

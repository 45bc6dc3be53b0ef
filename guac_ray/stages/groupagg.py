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

__all__ = ["grouped_agg"]

_PARTIAL = {
    "sum": "sum",
    "count": "size",
    "min": "min",
    "max": "max",
}
_FINAL = {
    "sum": "sum",
    "count": "sum",   # partial counts sum up
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
    For ``count`` the in_col only anchors the row count. Returns a
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
        hidden[f"_{o}_n"] = (c, "count")
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
                if f == "count":
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

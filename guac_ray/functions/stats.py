"""Grouped bivariate moment statistics: exact-population covariance and
Pearson correlation between two INTEGER columns, per group.

Exactness discipline (same as functions/scale.py): the inputs are
integer (the repo's cents trick), so the five moment sums
(n, Σx, Σy, Σxy, Σx², Σy²) are exact int64 through the bucketed
two-phase aggregate; each is cast to DOUBLE once and the final
expression is evaluated in ONE fixed operation order —

    cov  = (Σxy - (Σx·Σy)/n) / n                      (population)
    corr = (Σxy - (Σx·Σy)/n)
           / (sqrt(Σx² - (Σx·Σx)/n) · sqrt(Σy² - (Σy·Σy)/n))

— so a SQL oracle spelling the IDENTICAL expression tree over HUGEINT
sums reproduces the doubles bit-for-bit. (Σx·Σy is computed in double —
the PRODUCT of two int64 sums overflows int64 long before either sum
does; both engines do the same double multiply.) Zero-variance groups
(min == max on either column — an exact integer test) pin to 0.0 in
both engines instead of a NaN/NULL divergence, mirroring scale.py.

Overflow budget: per-row x·y products must fit int64 across a group —
with cents-scale x (≤ ~10⁵) and bounded y (e.g. second-of-day ≤ 86400)
the sum stays exact past 10⁹ rows per group; the per-batch partial
asserts integer dtypes so a float column cannot silently degrade.

Scale shape: one streaming map (derive xy/x²/y²) feeding the bucketed
two-phase aggregate — shuffle volume is one moment row per (group,
block), output one row per group. No sort, no materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from guac_ray.arrowutil import table_from_pandas

__all__ = ["grouped_corr", "chi2_contingency", "grouped_linreg"]


def grouped_corr(
    ds: Dataset,
    by: list[str] | str,
    x: str,
    y: str,
    num_buckets: int = 16,
) -> Dataset:
    """Per-group population covariance (``cov``) and Pearson correlation
    (``corr``) of integer columns ``x`` and ``y``, plus ``n``.
    Zero-variance groups yield 0.0 for both."""
    from guac_ray.stages.groupagg import grouped_agg

    by = [by] if isinstance(by, str) else list(by)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        vx = df[x].to_numpy()
        vy = df[y].to_numpy()
        if not (np.issubdtype(vx.dtype, np.integer)
                and np.issubdtype(vy.dtype, np.integer)):
            raise TypeError(
                f"grouped_corr: {x!r}/{y!r} must be integer (use the cents "
                f"trick for floats), got {vx.dtype}/{vy.dtype}")
        # int64 BEFORE multiplying: int32 passes the check but wraps
        vx = vx.astype(np.int64)
        vy = vy.astype(np.int64)
        return df.assign(_xy=vx * vy, _xx=vx * vx, _yy=vy * vy)

    agg = grouped_agg(
        ds.map_batches(moments, batch_format="pandas"), by,
        {"_n": (x, "count"), "_sx": (x, "sum"), "_sy": (y, "sum"),
         "_sxy": ("_xy", "sum"), "_sxx": ("_xx", "sum"),
         "_syy": ("_yy", "sum"),
         "_mnx": (x, "min"), "_mxx": (x, "max"),
         "_mny": (y, "min"), "_mxy": (y, "max")},
        num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pa.Table:
        nf = df["_n"].to_numpy().astype("float64")
        sx = df["_sx"].to_numpy().astype("float64")
        sy = df["_sy"].to_numpy().astype("float64")
        sxy = df["_sxy"].to_numpy().astype("float64")
        sxx = df["_sxx"].to_numpy().astype("float64")
        syy = df["_syy"].to_numpy().astype("float64")
        const = (df["_mnx"].to_numpy() == df["_mxx"].to_numpy()) \
            | (df["_mny"].to_numpy() == df["_mxy"].to_numpy())
        with np.errstate(divide="ignore", invalid="ignore"):
            num = sxy - (sx * sy) / nf
            cov = num / nf
            corr = num / (np.sqrt(sxx - (sx * sx) / nf)
                          * np.sqrt(syy - (sy * sy) / nf))
        out = df[by].copy()
        out["n"] = df["_n"].to_numpy().astype("int64")
        out["cov"] = np.where(const, 0.0, cov)
        out["corr"] = np.where(const, 0.0, corr)
        return table_from_pandas(out, preserve_index=False)

    return agg.map_batches(finish, batch_format="pandas")


def basket_pair_rules(
    items,  # Dataset of (basket_col, item_col) rows, possibly duplicated
    basket_col: str,
    item_col: str,
    min_support: int = 5,
    scale: int = 1_000_000,
    num_buckets: int = 8,
    max_items_per_basket: int = 10_000,
):
    """Exact 2-itemset association rules (the Apriori/market-basket
    primitive): for every unordered item pair {x, y} co-occurring in
    ≥ ``min_support`` baskets, the support count plus FIXED-POINT
    confidence both ways and lift —

        conf(x→y)_fp = scale·s_xy // s_x          (int64 floor div)
        lift_fp      = scale·N·s_xy // (s_x·s_y)

    — pure integer arithmetic over exact counts, so any engine
    reproduces the table bit-for-bit.

    Shape: one by-basket fs exchange co-locates each basket's items
    (dedup in-bucket IS global dedup — a basket lives in one bucket),
    then pairs expand with a vectorized self-merge per bucket — the
    in-document-join discipline; baskets are small (order lines), and
    a basket exceeding ``max_items_per_basket`` distinct items raises
    rather than going quadratic. The SAME reduce emits item supports
    and the basket-count partial as sentinel rows (item2 = ''), so one
    exchange + one ``grouped_agg`` combine carries all three count
    families; the final rule table is (item-vocab)²-bounded — the only
    driver-side product, exactly like the vocabulary ops."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from guac_ray.arrowutil import table_from_pandas
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash
    from guac_ray.stages.groupagg import grouped_agg

    empty = pd.DataFrame({
        "item1": pd.Series(dtype="object"), "item2": pd.Series(dtype="object"),
        "support": pd.Series(dtype="int64"),
        "conf12_fp": pd.Series(dtype="int64"),
        "conf21_fp": pd.Series(dtype="int64"),
        "lift_fp": pd.Series(dtype="int64"),
    })

    def emit(df: pd.DataFrame) -> "pa.Table":
        out = df[[basket_col, item_col]].drop_duplicates()
        out = out.rename(columns={basket_col: "o", item_col: "b"})
        # the support/N sentinel encoding reserves item2 == '' — a real
        # empty-string (or null) item value would be summed into
        # n_baskets and its pair rows mis-filtered, silently shifting
        # every conf/lift; reject loudly (pivot_wide's discipline)
        bad = out["b"].isna() | (out["b"].astype(str) == "")
        if bad.any():
            raise ValueError(
                "basket_pair_rules: empty-string or null item values "
                "collide with the sentinel encoding (item2='') — clean "
                f"or re-key the items first ({int(bad.sum())} offending "
                "rows in one batch)")
        out["_bucket"] = (stable_hash(out, ["o"]) % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: "pa.Table") -> "pa.Table":
        df = t.to_pandas().drop_duplicates()  # basket-local => global
        sizes = df.groupby("o", sort=False)["b"].size()
        if len(sizes) and int(sizes.max()) > max_items_per_basket:
            raise ValueError(
                f"basket with {int(sizes.max())} distinct items exceeds "
                f"max_items_per_basket={max_items_per_basket}; pair "
                "expansion would be quadratic — raise the cap only with "
                "a matching pair-volume budget")
        pairs = df.merge(df, on="o")
        pairs = pairs[pairs["b_x"] < pairs["b_y"]]
        pc_ = (pairs.groupby(["b_x", "b_y"], sort=False).size()
               .rename("cnt").reset_index()
               .rename(columns={"b_x": "item1", "b_y": "item2"}))
        supp = (df.groupby("b", sort=False).size().rename("cnt")
                .reset_index().rename(columns={"b": "item1"}))
        supp["item2"] = ""
        nrow = pd.DataFrame({"item1": [""], "item2": [""],
                             "cnt": [df["o"].nunique()]})
        out = pd.concat([pc_, supp[["item1", "item2", "cnt"]], nrow],
                        ignore_index=True)
        out["cnt"] = out["cnt"].astype("int64")
        return table_from_pandas(out, preserve_index=False)

    rows = items.map_batches(emit, batch_format="pandas")
    reduced = fs_exchange_reduce(rows, default_exchange("basket"), reduce_fn)
    if reduced is None:
        return empty
    agg = grouped_agg(reduced, ["item1", "item2"], {"cnt": ("cnt", "sum")},
                      num_buckets=num_buckets).to_pandas()
    n_baskets = int(agg.loc[(agg.item1 == "") & (agg.item2 == ""), "cnt"].sum())
    supp = dict(zip(agg.loc[(agg.item2 == "") & (agg.item1 != ""), "item1"],
                    agg.loc[(agg.item2 == "") & (agg.item1 != ""), "cnt"]))
    pairs = agg[(agg.item1 != "") & (agg.item2 != "")].copy()
    pairs = pairs[pairs["cnt"] >= min_support]
    if pairs.empty:
        return empty
    sxy = pairs["cnt"].to_numpy().astype("int64")
    s1 = pairs["item1"].map(supp).to_numpy().astype("int64")
    s2 = pairs["item2"].map(supp).to_numpy().astype("int64")
    out = pd.DataFrame({
        "item1": pairs["item1"].to_numpy(),
        "item2": pairs["item2"].to_numpy(),
        "support": sxy,
        "conf12_fp": scale * sxy // s1,
        "conf21_fp": scale * sxy // s2,
        "lift_fp": scale * n_baskets * sxy // (s1 * s2),
    })
    return (out.sort_values(["item1", "item2"]).reset_index(drop=True))


def chi2_contingency(
    ds: Dataset,
    row_col: str,
    col_col: str,
    num_buckets: int = 8,
) -> pa.Table:
    """Pearson chi-squared independence grid over two categorical
    columns — the feature-dependence screen (is event mix independent
    of weekday / is label balanced across sources) run before feature
    selection or stratified sampling. One output row per cell of the
    FULL observed-label cross product: absent combinations carry
    ``n_obs = 0`` but still contribute their expected count to the
    statistic (dropping them understates χ² — the classic bug in
    GROUP-BY-only implementations). Columns:
    ``(row_col, col_col, n_obs, n_row, n_col, n_total, chi2_cell)``.

    Exactness discipline (module header): counts are exact int64
    through the bucketed two-phase aggregate; the cell deviation
    ``d = n_obs·N − n_row·n_col`` is exact int64 (|d| ≤ N², guarded —
    callers beyond ~3·10⁹ rows rescale first), and the one double
    expression ``chi2_cell = (d·d) / ((N·r)·c)`` is evaluated in the
    IDENTICAL operation order here and in the SQL oracle, so the
    doubles match bit-for-bit. Emitting per-CELL contributions instead
    of their sum keeps float summation order (which no SQL engine
    guarantees) out of the contract; the total χ² is one
    driver/consumer fold over the grid.

    Scale shape: ONE distributed two-phase aggregate at cell grain
    (shuffle = one partial row per (cell, block)); the grid build,
    margins and χ² are a driver fold over the label-cardinality cell
    frame — the ``grouping_sets_agg`` discipline (bounded by distinct
    labels, never input size)."""
    from guac_ray.stages.groupagg import grouped_agg

    cells = grouped_agg(
        ds, [row_col, col_col], {"n_obs": (row_col, "count")},
        num_buckets=num_buckets,
    ).to_pandas()
    if cells.empty:
        # typed empty from the INPUT schema: grouped_agg's lazy
        # zero-row fallback yields a column-less frame, so the label
        # dtypes must come from ds itself
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}

        def at(c):
            ty = types.get(c)
            return ty if isinstance(ty, pa.DataType) else pa.string()

        return pa.schema(
            [(row_col, at(row_col)), (col_col, at(col_col)),
             ("n_obs", pa.int64()), ("n_row", pa.int64()),
             ("n_col", pa.int64()), ("n_total", pa.int64()),
             ("chi2_cell", pa.float64())]).empty_table()

    grid = pd.MultiIndex.from_product(
        [sorted(cells[row_col].unique()), sorted(cells[col_col].unique())],
        names=[row_col, col_col]).to_frame(index=False)
    g = grid.merge(cells, how="left", on=[row_col, col_col])
    g["n_obs"] = g["n_obs"].fillna(0).astype("int64")
    g["n_row"] = g.groupby(row_col)[["n_obs"]].transform("sum")["n_obs"]
    g["n_col"] = g.groupby(col_col)[["n_obs"]].transform("sum")["n_obs"]
    nt = int(g["n_obs"].sum())
    if nt > 3_000_000_000:
        raise ValueError(
            "chi2_contingency: n_total > 3e9 would overflow the exact "
            "int64 cell deviation (|d| <= N^2); pre-aggregate or "
            "sample the input first")
    g["n_total"] = np.int64(nt)
    d = (g["n_obs"].to_numpy() * nt
         - g["n_row"].to_numpy() * g["n_col"].to_numpy())
    df64 = d.astype("float64")
    g["chi2_cell"] = (df64 * df64) / (
        (float(nt) * g["n_row"].to_numpy().astype("float64"))
        * g["n_col"].to_numpy().astype("float64"))
    return table_from_pandas(
        g[[row_col, col_col, "n_obs", "n_row", "n_col", "n_total",
           "chi2_cell"]], preserve_index=False)


def grouped_linreg(
    ds: Dataset,
    by: list[str] | str,
    x: str,
    y: str,
    num_buckets: int = 16,
) -> Dataset:
    """Per-group ordinary-least-squares line ``y = slope·x +
    intercept`` over two INTEGER columns — the trend detector
    (value drift per entity, rate-of-change per segment) completing
    the ``grouped_corr`` family with the same exactness discipline
    (module header): five exact int64 moment sums through the bucketed
    two-phase aggregate, one double cast each, and the final
    expressions in ONE fixed operation order —

        num       = Σxy − (Σx·Σy)/n
        slope     = num / (Σx² − (Σx·Σx)/n)
        intercept = (Σy − slope·Σx) / n

    — so the SQL oracle spelling the identical tree reproduces the
    doubles bit-for-bit. Constant-x groups (min == max, the exact
    integer test) pin slope to 0.0 and intercept to the group's mean
    y in both engines instead of a 0/0 divergence. Output: by…, n,
    slope, intercept. Same one-map + two-phase-aggregate shape and
    per-row x·y int64 budget as ``grouped_corr``."""
    from guac_ray.stages.groupagg import grouped_agg

    by = [by] if isinstance(by, str) else list(by)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        vx = df[x].to_numpy()
        vy = df[y].to_numpy()
        if not (np.issubdtype(vx.dtype, np.integer)
                and np.issubdtype(vy.dtype, np.integer)):
            raise TypeError(
                f"grouped_linreg: {x!r}/{y!r} must be integer (use the "
                f"cents trick for floats), got {vx.dtype}/{vy.dtype}")
        # int64 BEFORE multiplying: int32 passes the check but wraps
        vx = vx.astype(np.int64)
        vy = vy.astype(np.int64)
        return df.assign(_xy=vx * vy, _xx=vx * vx)

    agg = grouped_agg(
        ds.map_batches(moments, batch_format="pandas"), by,
        {"_n": (x, "count"), "_sx": (x, "sum"), "_sy": (y, "sum"),
         "_sxy": ("_xy", "sum"), "_sxx": ("_xx", "sum"),
         "_mnx": (x, "min"), "_mxx": (x, "max")},
        num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pa.Table:
        nf = df["_n"].to_numpy().astype("float64")
        sx = df["_sx"].to_numpy().astype("float64")
        sy = df["_sy"].to_numpy().astype("float64")
        sxy = df["_sxy"].to_numpy().astype("float64")
        sxx = df["_sxx"].to_numpy().astype("float64")
        const = df["_mnx"].to_numpy() == df["_mxx"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            num = sxy - (sx * sy) / nf
            slope = num / (sxx - (sx * sx) / nf)
            intercept = (sy - slope * sx) / nf
        out = df[by].copy()
        out["n"] = df["_n"].to_numpy().astype("int64")
        out["slope"] = np.where(const, 0.0, slope)
        out["intercept"] = np.where(const, sy / nf, intercept)
        return table_from_pandas(out, preserve_index=False)

    return agg.map_batches(finish, batch_format="pandas")


def grouped_acf(
    ds: Dataset,
    by: str,
    value_col: str,
    ts_col: str,
    order_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
    exchange_base: str | None = None,
    num_buckets: int = 8,
) -> Dataset:
    """Per-group lag-k autocorrelation of an ordered value stream —
    the seasonality / memory screen (does this series correlate with
    itself k steps back?) run before trend fits or forecasting. For
    each group and each lag k, Pearson correlation between the series
    and itself shifted k positions in (ts, order) order, over the
    n - k overlapping pairs — the standard sample-ACF-with-pairwise-
    moments form, which makes every lag an ordinary grouped_corr and
    keeps the cross-engine double contract.

    ``value_col`` must be int64 (the house cents trick): all moment
    sums are exact integers and the ONLY doubles are grouped_corr's
    fixed-order tree, evaluated identically in the SQL oracle (sxy's
    per-pair int64 budget |v|² · n, same as grouped_corr). Shape: the
    ``sessionize`` contract — ONE group-hash fs exchange of 3 int64
    columns + the group label (a group lives wholly in one bucket, so
    its stream order AND its complete pair moments are bucket-local);
    per bucket one lexsort, then per lag one shifted same-group
    compare — pairs never materialize beyond two slices. Few huge
    groups skew like any ordered-stream reduction (documented on
    sessionize); zero-variance or n ≤ k groups pin acf 0.0 / drop."""
    import ray.data as rd

    from guac_ray.functions.joins import default_exchange
    from guac_ray.functions.streams import _per_user_stream

    lag_list = sorted(set(int(k) for k in lags))
    if not lag_list or lag_list[0] < 1:
        raise ValueError(f"grouped_acf: lags must be >= 1, got {lags}")

    sch = ds.schema()
    by_type = (dict(zip(sch.names, sch.types)).get(by)
               if sch is not None else None)
    if not isinstance(by_type, pa.DataType):
        # pandas-born blocks report numpy dtypes here (the
        # grouped_mode fallback rule)
        by_type = pa.string()
    empty = pa.schema([(by, by_type), ("lag", pa.int64()),
                       ("n", pa.int64()), ("acf", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        g = t[by].to_numpy(zero_copy_only=False)
        n = len(g)
        if n == 0:
            return empty.empty_table()
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        v = t["_v"].to_numpy(zero_copy_only=False).astype("int64")
        o = np.lexsort((od, ts, g))
        g, v = g[o], v[o]
        frames = []
        for k in lag_list:
            if n <= k:
                continue
            # sorted by group, so g[i] == g[i+k] iff the whole window
            # [i, i+k] sits inside one group — the pair is in-group
            same = g[:-k] == g[k:]
            if not same.any():
                continue
            x, y = v[:-k][same], v[k:][same]
            s = (pd.DataFrame({
                by: g[:-k][same], "x": x, "y": y,
                "xy": x * y, "xx": x * x, "yy": y * y})
                .groupby(by, sort=False)
                .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                     sxy=("xy", "sum"), sxx=("xx", "sum"),
                     syy=("yy", "sum"),
                     mnx=("x", "min"), mxx=("x", "max"),
                     mny=("y", "min"), mxy=("y", "max"))
                .reset_index())
            s["lag"] = k
            frames.append(s)
        if not frames:
            return empty.empty_table()
        s = pd.concat(frames, ignore_index=True)
        nf = s["n"].to_numpy().astype("float64")
        sx = s["sx"].to_numpy().astype("float64")
        sy = s["sy"].to_numpy().astype("float64")
        sxy = s["sxy"].to_numpy().astype("float64")
        sxx = s["sxx"].to_numpy().astype("float64")
        syy = s["syy"].to_numpy().astype("float64")
        const = ((s["mnx"].to_numpy() == s["mxx"].to_numpy())
                 | (s["mny"].to_numpy() == s["mxy"].to_numpy()))
        with np.errstate(divide="ignore", invalid="ignore"):
            # grouped_corr's EXACT operation order — the oracle
            # contract depends on this tree, do not refactor
            num = sxy - (sx * sy) / nf
            acf = num / (np.sqrt(sxx - (sx * sx) / nf)
                         * np.sqrt(syy - (sy * sy) / nf))
        return table_from_pandas(pd.DataFrame({
            by: s[by], "lag": s["lag"].astype("int64"),
            "n": s["n"].astype("int64"),
            "acf": np.where(const, 0.0, acf)}), preserve_index=False)

    def add_v(df: pd.DataFrame) -> pd.DataFrame:
        vv = df[value_col].to_numpy()
        if not np.issubdtype(vv.dtype, np.integer):
            raise TypeError(
                "grouped_acf: value must be integer (use the cents "
                f"trick for floats), got {vv.dtype}")
        df = df.copy()
        df["_v"] = vv.astype("int64")
        return df

    out = _per_user_stream(
        ds.select_columns([by, ts_col, order_col, value_col]
                          ).map_batches(add_v, batch_format="pandas"),
        by, ts_col, order_col, ["_v"],
        exchange_base or default_exchange("acf"), num_buckets,
        reduce_fn)
    if out is None:
        return rd.from_arrow(empty.empty_table())
    return out

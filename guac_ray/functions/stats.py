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

__all__ = ["grouped_corr", "chi2_contingency", "grouped_linreg",
           "welch_ttest", "mann_whitney_u", "multi_linreg", "ks_test",
           "two_proportion_ztest", "cuped_adjust"]


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


def welch_ttest(
    ds: Dataset,
    group_col: str,
    value_col: str,
    control,
    num_buckets: int = 8,
) -> pa.Table:
    """Welch's unequal-variance t-test of every group against the
    ``control`` group — the A/B-experiment readout (does each variant's
    mean value differ from control?) run straight on the event stream.
    One output row per non-control group:
    ``(group_col, n, mean, n_control, mean_control, t_stat, df)``.

    Exactness discipline (module header): ``value_col`` must be integer
    (the cents trick), so the per-group moment sums (n, Σv, Σv²) are
    exact int64 through the bucketed two-phase aggregate; each is cast
    to DOUBLE once and the final expressions run in ONE fixed operation
    order —

        mean = Σv/n
        var  = (Σv² − (Σv·Σv)/n) / (n−1)          (sample variance)
        se²  = var_g/n_g + var_c/n_c
        t    = (mean_g − mean_c) / sqrt(se²)
        df   = se²·se² / ((var_g/n_g)²/(n_g−1) + (var_c/n_c)²/(n_c−1))

    — so a SQL oracle spelling the IDENTICAL tree over HUGEINT sums
    reproduces the doubles bit-for-bit. Constant groups (min == max,
    the exact integer test) pin var to 0.0; when BOTH variances are
    zero, t and df pin to 0.0 instead of a 0/0 divergence (the
    grouped_corr rule). Groups with n < 2 have no sample variance and
    are dropped (SQL: WHERE n >= 2); a missing or undersized control
    group raises loudly.

    Scale shape: one streaming map (derive v²) feeding the bucketed
    two-phase aggregate — shuffle volume is one moment row per (group,
    block); everything after is a fold over the group-cardinality
    moment table (the chi2_contingency discipline)."""
    from guac_ray.stages.groupagg import grouped_agg

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"welch_ttest: {value_col!r} must be integer (use the "
                f"cents trick for floats), got {v.dtype}")
        v = v.astype(np.int64)
        return pd.DataFrame({group_col: df[group_col], "_v": v,
                             "_vv": v * v})

    agg = grouped_agg(
        ds.map_batches(moments, batch_format="pandas"), [group_col],
        {"_n": ("_v", "count"), "_sv": ("_v", "sum"),
         "_svv": ("_vv", "sum"),
         "_mn": ("_v", "min"), "_mx": ("_v", "max")},
        num_buckets=num_buckets).to_pandas()

    # group-column type from the INPUT schema (the chi2_contingency
    # rule): an astype(str) here would mint the literal 'None' for a
    # NULL group and silently restring integer group labels
    sch = ds.schema()
    gtype = (dict(zip(sch.names, sch.types)).get(group_col)
             if sch is not None else None)
    if not isinstance(gtype, pa.DataType):
        gtype = pa.string()
    out_schema = pa.schema([
        (group_col, gtype), ("n", pa.int64()),
        ("mean", pa.float64()), ("n_control", pa.int64()),
        ("mean_control", pa.float64()),
        ("t_stat", pa.float64()), ("df", pa.float64())])
    if agg.empty:
        return out_schema.empty_table()

    agg = agg[agg["_n"] >= 2].reset_index(drop=True)
    ctl = agg[agg[group_col] == control]
    if len(ctl) != 1:
        raise ValueError(
            f"welch_ttest: control group {control!r} missing or has "
            "n < 2 — a t-test against nothing is a config error, not "
            "an empty result")

    def stats_of(frame: pd.DataFrame):
        nf = frame["_n"].to_numpy().astype("float64")
        sv = frame["_sv"].to_numpy().astype("float64")
        svv = frame["_svv"].to_numpy().astype("float64")
        const = frame["_mn"].to_numpy() == frame["_mx"].to_numpy()
        mean = sv / nf
        var = (svv - (sv * sv) / nf) / (nf - 1.0)
        var = np.where(const, 0.0, var)
        return nf, mean, var

    ncf, meanc, varc = stats_of(ctl)
    nc, mc, vc = float(ncf[0]), float(meanc[0]), float(varc[0])

    g = agg[agg[group_col] != control].reset_index(drop=True)
    if g.empty:
        return out_schema.empty_table()
    nf, mean, var = stats_of(g)
    sea = var / nf
    sec = vc / nc
    se2 = sea + sec
    zero = se2 == 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (mean - mc) / np.sqrt(se2)
        dfree = (se2 * se2) / ((sea * sea) / (nf - 1.0)
                               + (sec * sec) / (nc - 1.0))
    return pa.table({
        group_col: pa.array(g[group_col], type=gtype),
        "n": pa.array(g["_n"].to_numpy().astype("int64")),
        "mean": pa.array(mean),
        "n_control": pa.array(np.full(len(g), int(nc), dtype="int64")),
        "mean_control": pa.array(np.full(len(g), mc)),
        "t_stat": pa.array(np.where(zero, 0.0, t)),
        "df": pa.array(np.where(zero, 0.0, dfree)),
    })


def mann_whitney_u(
    ds: Dataset,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    num_buckets: int = 8,
    max_distinct: int = 2_000_000,
) -> pa.Table:
    """Mann–Whitney U rank-sum test between two groups — the
    non-parametric A/B readout used when value distributions are
    skewed or heavy-tailed (no normality assumption, unlike
    ``welch_ttest``). One output row:
    ``(n_a, n_b, u_a_x2, u_b_x2, z_stat)`` where ``u_a_x2 = 2·U_a``
    (doubling keeps tie-averaged ranks — odd halves — in exact int64;
    U itself is u_a_x2/2).

    Exactness: the distributed work is ONE two-phase aggregate at
    (value, group) grain — the quantile-histogram shape — so the
    driver folds a distinct-value-bounded table, never the stream.
    Ranks come from cumulative counts over the sorted distinct values:
    with c_a/c_b per value, t = c_a + c_b tied rows share average rank
    (cum_before + (t+1)/2), so

        2·R_a = Σ_v c_a·(2·cum_before + t + 1)        (exact int64)
        2·U_a = 2·R_a − n_a·(n_a+1)

    and the tie-corrected normal approximation

        σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N·(N−1)))
        z  = (2·U_a − n_a·n_b) / (2·σ)

    evaluates in ONE fixed double order from exact integers — the
    Σ(t³−t) term is summed in arbitrary-precision Python ints here and
    HUGEINT in the SQL oracle, so both engines cast the SAME exact
    integer to double. All-tied inputs (σ = 0) pin z to 0.0.

    ``max_distinct`` guards the driver fold exactly like
    ``scale.percentile_rank``'s distinct_cap: past it, bucket values
    into ranges first (coarser ties) rather than degrading silently."""
    from guac_ray.stages.groupagg import grouped_agg

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"mann_whitney_u: {value_col!r} must be integer (use "
                f"the cents trick for floats), got {v.dtype}")
        m = df[group_col].isin([group_a, group_b]).to_numpy()
        return pd.DataFrame({"_v": v.astype(np.int64)[m],
                             group_col: df[group_col].to_numpy()[m]})

    hist = grouped_agg(
        ds.map_batches(keyed, batch_format="pandas"),
        ["_v", group_col], {"c": ("_v", "count")},
        num_buckets=num_buckets).to_pandas()

    if hist.empty or hist[group_col].nunique() < 2:
        raise ValueError(
            f"mann_whitney_u: need both groups {group_a!r} and "
            f"{group_b!r} present with rows — got "
            f"{sorted(hist[group_col].unique()) if not hist.empty else []}")
    if hist["_v"].nunique() > max_distinct:
        raise ValueError(
            f"mann_whitney_u: {hist['_v'].nunique()} distinct values "
            f"exceed max_distinct={max_distinct}; bucket values into "
            "ranges first (coarser ties) — raising the cap silently "
            "would make the driver fold data-sized")

    w = (hist.pivot_table(index="_v", columns=group_col, values="c",
                          aggfunc="sum", fill_value=0)
         .reindex(columns=[group_a, group_b], fill_value=0)
         .sort_index())
    ca = w[group_a].to_numpy().astype("int64")
    cb = w[group_b].to_numpy().astype("int64")
    t = ca + cb
    cum_before = np.concatenate(([0], np.cumsum(t)[:-1]))
    na, nb = int(ca.sum()), int(cb.sum())
    n = na + nb
    if n > 2_000_000_000:
        # 2·R_a ≈ N² would silently wrap numpy int64 past ~3e9 rows —
        # the ks_test/chi2 guard class, raised loudly instead
        raise ValueError(
            "mann_whitney_u: n > 2e9 would overflow the exact int64 "
            "doubled rank sum (2*R_a <= N*(N+1)); sample first")
    r_a_x2 = int((ca * (2 * cum_before + t + 1)).sum())
    u_a_x2 = r_a_x2 - na * (na + 1)
    u_b_x2 = 2 * na * nb - u_a_x2
    # Σ(t³−t) in Python ints: a single dominant tie at N rows is
    # N³ ≈ 4e20 > int64 at 7.5M rows — arbitrary precision here,
    # HUGEINT in the oracle, both cast the same exact value once
    tie_term = sum(int(x) ** 3 - int(x) for x in t)
    naf, nbf, nf = float(na), float(nb), float(n)
    sig2 = (naf * nbf / 12.0) * (
        (nf + 1.0) - float(tie_term) / (nf * (nf - 1.0)))
    if sig2 == 0.0:
        z = 0.0
    else:
        z = (float(u_a_x2) - naf * nbf) / (2.0 * np.sqrt(sig2))
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "u_a_x2": pa.array([u_a_x2], pa.int64()),
        "u_b_x2": pa.array([u_b_x2], pa.int64()),
        "z_stat": pa.array([float(z)], pa.float64()),
    })


def multi_linreg(
    ds: Dataset,
    features: list[str],
    y: str,
) -> pa.Table:
    """EXACT multi-feature ordinary least squares — the distributed
    linear-model trainer: fit ``y = b0 + b1·x1 + … + bk·xk`` by normal
    equations over integer features/target. The distributed pass emits
    per-batch int64 Gram partials (every pairwise product sum of
    [1, x1…xk, y]); the driver folds them in arbitrary-precision
    Python ints and solves the (k+1)×(k+1) system by fraction-free
    Bareiss elimination, so every determinant is an EXACT integer and
    each coefficient is produced by ONE double division
    ``float(det_i)/float(det)`` — a SQL oracle spelling Cramer's rule
    over HUGEINT sums reproduces the doubles bit-for-bit (both engines
    round the same two exact integers to double once).

    Singular systems (collinear features, e.g. a constant column next
    to the intercept) have det = 0 and raise loudly — a silently
    pseudo-inverted fit would not be reproducible across engines.

    Output: one row per coefficient, ``(term, beta)`` with term
    'intercept' or the feature name, plus an ``n`` column.

    Scale shape: the q6 discipline — one partial row per input block
    with (k+2)(k+3)/2 int64 sums, folded on the driver; nothing else
    moves. Per-row product budget: |x_i·x_j| · rows must fit int64 —
    with bounded encodings (hour ≤ 23, weekday ≤ 6, cents ≤ 10⁷) that
    holds past 10¹⁰ rows; the partial asserts integer dtypes."""
    cols = list(features) + [y]
    k = len(features)

    def partial(df: pd.DataFrame) -> pa.Table:
        mats = []
        for c in cols:
            v = df[c].to_numpy()
            if not np.issubdtype(v.dtype, np.integer):
                raise TypeError(
                    f"multi_linreg: {c!r} must be integer (use the "
                    f"cents trick for floats), got {v.dtype}")
            mats.append(v.astype(np.int64))
        # partial keys are COLUMN INDICES, not names: name-based keys
        # like _s_{a}_{b} collide when a column name itself contains an
        # underscore (features ('a','b') vs a column 'a_b' — the pair
        # moment would be silently overwritten by the single moment)
        out = {"_n": np.int64(len(df))}
        for i in range(len(cols)):
            out[f"_s{i}"] = mats[i].sum()
            for j in range(i, len(cols)):
                out[f"_s{i}_{j}"] = (mats[i] * mats[j]).sum()
        return pa.table({kk: pa.array([int(vv)], pa.int64())
                         for kk, vv in out.items()})

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas").to_pandas()
    if parts.empty or int(parts["_n"].sum()) == 0:
        return pa.schema([("term", pa.string()), ("beta", pa.float64()),
                          ("n", pa.int64())]).empty_table()
    # fold in PYTHON ints (arbitrary precision): int64 partials are
    # exact per block, but their sum and every determinant below can
    # exceed int64 — the oracle's HUGEINT plays the same role
    tot = {c: int(parts[c].astype(object).sum()) for c in parts.columns}
    n = tot["_n"]
    iy = len(cols) - 1  # y's column index

    def s(i: int, j: int | None = None) -> int:
        if j is None:
            return tot[f"_s{i}"]
        lo, hi = (i, j) if i <= j else (j, i)
        return tot[f"_s{lo}_{hi}"]

    # normal equations over the design [1, x1..xk]: A·beta = b.
    # term index -1 stands for the intercept's all-ones column.
    terms = [-1] + list(range(k))

    def dot(a: int, b: int) -> int:
        if a == -1 and b == -1:
            return n
        if a == -1:
            return s(b)
        if b == -1:
            return s(a)
        return s(a, b)

    A = [[dot(ti, tj) for tj in terms] for ti in terms]
    bvec = [s(iy)] + [s(i, iy) for i in range(k)]

    def det_int(m: list[list[int]]) -> int:
        """Fraction-free Bareiss — exact integer determinant."""
        m = [row[:] for row in m]
        d = len(m)
        sign = 1
        prev = 1
        for p in range(d - 1):
            if m[p][p] == 0:
                swap = next((r for r in range(p + 1, d) if m[r][p] != 0),
                            None)
                if swap is None:
                    return 0
                m[p], m[swap] = m[swap], m[p]
                sign = -sign
            for r in range(p + 1, d):
                for c in range(p + 1, d):
                    m[r][c] = (m[r][c] * m[p][p]
                               - m[r][p] * m[p][c]) // prev
                m[r][p] = 0
            prev = m[p][p]
        return sign * m[d - 1][d - 1]

    det = det_int(A)
    if det == 0:
        raise ValueError(
            "multi_linreg: singular normal equations (collinear "
            "features) — drop the dependent feature; a silent "
            "pseudo-inverse would not be engine-reproducible")
    betas = []
    for i in range(k + 1):
        Ai = [[bvec[r] if c == i else A[r][c]
               for c in range(k + 1)] for r in range(k + 1)]
        betas.append(float(det_int(Ai)) / float(det))
    return pa.table({
        "term": pa.array(["intercept"] + list(features)),
        "beta": pa.array(betas, pa.float64()),
        "n": pa.array([n] * (k + 1), pa.int64()),
    })


def ks_test(
    ds: Dataset,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    num_buckets: int = 8,
    max_distinct: int = 2_000_000,
) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov test — the distribution-equality
    screen (did the whole SHAPE shift, not just the mean?) completing
    the experimentation family: ``welch_ttest`` compares means,
    ``mann_whitney_u`` compares stochastic order, KS compares the full
    empirical CDFs. One output row:
    ``(n_a, n_b, d_num, d_stat, z_stat)`` where

        d_num  = max over values |cum_a·n_b − cum_b·n_a|   (EXACT int64)
        D      = d_num / (n_a·n_b)
        z      = D · sqrt(n_a·n_b / (n_a + n_b))           (asymptotic)

    — the supremum gap is computed in cross-multiplied integers, so
    the discrete statistic is exact on any engine; the two doubles
    evaluate in ONE fixed operation order mirrored by the SQL oracle.
    Identical distributions give d_num = 0 exactly.

    Same distributed shape as ``mann_whitney_u``: ONE two-phase
    aggregate at (value, group) grain, driver fold bounded by distinct
    values (``max_distinct`` guard). Int64 budget: cum·n ≤ N², safe to
    ~3·10⁹ rows (the chi2_contingency bound)."""
    from guac_ray.stages.groupagg import grouped_agg

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"ks_test: {value_col!r} must be integer (use the "
                f"cents trick for floats), got {v.dtype}")
        m = df[group_col].isin([group_a, group_b]).to_numpy()
        return pd.DataFrame({"_v": v.astype(np.int64)[m],
                             group_col: df[group_col].to_numpy()[m]})

    hist = grouped_agg(
        ds.map_batches(keyed, batch_format="pandas"),
        ["_v", group_col], {"c": ("_v", "count")},
        num_buckets=num_buckets).to_pandas()

    if hist.empty or hist[group_col].nunique() < 2:
        raise ValueError(
            f"ks_test: need both groups {group_a!r} and {group_b!r} "
            f"present with rows — got "
            f"{sorted(hist[group_col].unique()) if not hist.empty else []}")
    if hist["_v"].nunique() > max_distinct:
        raise ValueError(
            f"ks_test: {hist['_v'].nunique()} distinct values exceed "
            f"max_distinct={max_distinct}; bucket values into ranges "
            "first — a silent cap would make the driver fold "
            "data-sized")
    n_total = int(hist["c"].sum())
    if n_total > 3_000_000_000:
        raise ValueError(
            "ks_test: n > 3e9 would overflow the exact int64 "
            "cross-multiplied CDF gap (cum*n <= N^2); sample first")

    w = (hist.pivot_table(index="_v", columns=group_col, values="c",
                          aggfunc="sum", fill_value=0)
         .reindex(columns=[group_a, group_b], fill_value=0)
         .sort_index())
    ca = w[group_a].to_numpy().astype("int64")
    cb = w[group_b].to_numpy().astype("int64")
    na, nb = int(ca.sum()), int(cb.sum())
    cum_a = np.cumsum(ca)
    cum_b = np.cumsum(cb)
    d_num = int(np.abs(cum_a * nb - cum_b * na).max())
    naf, nbf = float(na), float(nb)
    d_stat = float(d_num) / (naf * nbf)
    z = d_stat * np.sqrt(naf * nbf / (naf + nbf))
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "d_num": pa.array([d_num], pa.int64()),
        "d_stat": pa.array([d_stat], pa.float64()),
        "z_stat": pa.array([float(z)], pa.float64()),
    })


def two_proportion_ztest(
    user_flags: Dataset,
    variant_col: str,
    flag_col: str,
    control,
    num_buckets: int = 4,
) -> pa.Table:
    """Two-proportion z-test of per-variant CONVERSION RATES vs a
    control — the count-based A/B readout (did the purchase RATE move,
    not the spend?) completing the experimentation family on the
    binary-outcome side. Input is one row per experimental UNIT
    (usually user) with its variant and a 0/1 conversion flag; output
    one row per non-control variant:
    ``(variant_col, n, conv, rate, n_control, conv_control,
    rate_control, z_stat)``.

    Counts are exact int64 through the two-phase aggregate; the rates,
    pooled rate and

        z = (r_v − r_c) / sqrt(p·(1−p)·(1/n_v + 1/n_c))

    evaluate in ONE fixed double order mirrored by the SQL oracle —
    bit-exact. Degenerate pools (p ∈ {0, 1}: nobody or everybody
    converts) pin z to 0.0 instead of a 0/0 divergence. Flags outside
    {0, 1} refuse loudly (a miscoded flag silently averaged into a
    'rate' is the classic conversion-pipeline bug)."""
    from guac_ray.stages.groupagg import grouped_agg

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        f = df[flag_col].to_numpy()
        if not np.issubdtype(f.dtype, np.integer):
            raise TypeError(
                f"two_proportion_ztest: {flag_col!r} must be an "
                f"integer 0/1 flag, got {f.dtype}")
        bad = ~np.isin(f, (0, 1))
        if bad.any():
            raise ValueError(
                f"two_proportion_ztest: {flag_col!r} has values "
                f"outside {{0, 1}} ({int(bad.sum())} rows in one "
                "batch) — a miscoded flag averaged into a rate is "
                "silent corruption")
        return pd.DataFrame({variant_col: df[variant_col],
                             "_f": f.astype(np.int64)})

    agg = grouped_agg(
        user_flags.map_batches(keyed, batch_format="pandas"),
        [variant_col], {"_n": ("_f", "count"), "_c": ("_f", "sum")},
        num_buckets=num_buckets).to_pandas()

    sch = user_flags.schema()
    vtype = (dict(zip(sch.names, sch.types)).get(variant_col)
             if sch is not None else None)
    if not isinstance(vtype, pa.DataType):
        vtype = pa.string()
    out_schema = pa.schema([
        (variant_col, vtype), ("n", pa.int64()), ("conv", pa.int64()),
        ("rate", pa.float64()), ("n_control", pa.int64()),
        ("conv_control", pa.int64()), ("rate_control", pa.float64()),
        ("z_stat", pa.float64())])
    if agg.empty:
        return out_schema.empty_table()
    ctl = agg[agg[variant_col] == control]
    if len(ctl) != 1:
        raise ValueError(
            f"two_proportion_ztest: control variant {control!r} "
            "missing — a rate test against nothing is a config error")
    nc = int(ctl["_n"].iloc[0])
    cc = int(ctl["_c"].iloc[0])
    g = agg[agg[variant_col] != control].reset_index(drop=True)
    if g.empty:
        return out_schema.empty_table()
    nv = g["_n"].to_numpy().astype("int64")
    cv = g["_c"].to_numpy().astype("int64")
    nvf, cvf = nv.astype("float64"), cv.astype("float64")
    ncf, ccf = float(nc), float(cc)
    rv = cvf / nvf
    rc = ccf / ncf
    pool = (cvf + ccf) / (nvf + ncf)
    den2 = pool * (1.0 - pool) * (1.0 / nvf + 1.0 / ncf)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = (rv - rc) / np.sqrt(den2)
    return pa.table({
        variant_col: pa.array(g[variant_col], type=vtype),
        "n": pa.array(nv), "conv": pa.array(cv),
        "rate": pa.array(rv),
        "n_control": pa.array(np.full(len(g), nc, dtype="int64")),
        "conv_control": pa.array(np.full(len(g), cc, dtype="int64")),
        "rate_control": pa.array(np.full(len(g), rc)),
        "z_stat": pa.array(np.where(den2 == 0.0, 0.0, z)),
    })


def cuped_adjust(
    user_metrics: Dataset,
    variant_col: str,
    pre_col: str,
    post_col: str,
    num_buckets: int = 4,
) -> pa.Table:
    """CUPED variance-reduced experiment readout (Deng et al. 2013,
    'Improving the Sensitivity of Online Controlled Experiments') —
    the industry-standard pre-period adjustment: with a pre-experiment
    covariate X and experiment metric Y per unit,

        θ        = cov(X, Y) / var(X)          (population, ALL units)
        adj_mean = mean(Y_v) − θ·(mean(X_v) − mean(X_all))

    removes the X-explained variance from each variant's mean without
    biasing the treatment effect. Input: one row per unit with
    variant, integer pre metric, integer post metric. Output one row
    per variant:
    ``(variant_col, n, mean_pre, mean_post, mean_adj)``.

    Exactness discipline: per-variant moment sums (n, Σx, Σy, Σxy,
    Σx²) are exact int64 through the two-phase aggregate; the GLOBAL
    moments are the exact integer fold of the per-variant rows (never
    a second scan), and θ / means / adjustments evaluate in ONE fixed
    double order (grouped_corr's tree: Σxy − (Σx·Σy)/n over doubles)
    mirrored by the SQL oracle — bit-exact. Zero pre-variance pins
    θ = 0.0 (adjustment is a no-op, as it should be). Per-unit x·y
    products must fit int64 — the grouped_corr budget, asserted."""
    from guac_ray.stages.groupagg import grouped_agg

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df[pre_col].to_numpy()
        y = df[post_col].to_numpy()
        if not (np.issubdtype(x.dtype, np.integer)
                and np.issubdtype(y.dtype, np.integer)):
            raise TypeError(
                f"cuped_adjust: {pre_col!r}/{post_col!r} must be "
                f"integer (cents), got {x.dtype}/{y.dtype}")
        x = x.astype(np.int64)
        y = y.astype(np.int64)
        return pd.DataFrame({variant_col: df[variant_col],
                             "_x": x, "_y": y, "_xy": x * y,
                             "_xx": x * x})

    agg = grouped_agg(
        user_metrics.map_batches(moments, batch_format="pandas"),
        [variant_col],
        {"_n": ("_x", "count"), "_sx": ("_x", "sum"),
         "_sy": ("_y", "sum"), "_sxy": ("_xy", "sum"),
         "_sxx": ("_xx", "sum"),
         "_mnx": ("_x", "min"), "_mxx": ("_x", "max")},
        num_buckets=num_buckets).to_pandas()

    sch = user_metrics.schema()
    vtype = (dict(zip(sch.names, sch.types)).get(variant_col)
             if sch is not None else None)
    if not isinstance(vtype, pa.DataType):
        vtype = pa.string()
    out_schema = pa.schema([
        (variant_col, vtype), ("n", pa.int64()),
        ("mean_pre", pa.float64()), ("mean_post", pa.float64()),
        ("mean_adj", pa.float64())])
    if agg.empty:
        return out_schema.empty_table()

    # global moments: the EXACT integer fold of the per-variant rows
    N = int(agg["_n"].sum())
    SX = int(agg["_sx"].astype(object).sum())
    SY = int(agg["_sy"].astype(object).sum())
    SXY = int(agg["_sxy"].astype(object).sum())
    SXX = int(agg["_sxx"].astype(object).sum())
    const = int(agg["_mnx"].min()) == int(agg["_mxx"].max())
    nf = float(N)
    sxf, syf, sxyf, sxxf = float(SX), float(SY), float(SXY), float(SXX)
    if const:
        theta = 0.0
    else:
        # grouped_corr's fixed tree: cov and var share the (… − …/n)
        # numerators; their /n denominators cancel in the ratio, and
        # BOTH engines spell the ratio of the two numerators directly
        theta = (sxyf - (sxf * syf) / nf) / (sxxf - (sxf * sxf) / nf)
    mean_x_all = sxf / nf

    nv = agg["_n"].to_numpy().astype("float64")
    mean_pre = agg["_sx"].to_numpy().astype("float64") / nv
    mean_post = agg["_sy"].to_numpy().astype("float64") / nv
    mean_adj = mean_post - theta * (mean_pre - mean_x_all)
    return pa.table({
        variant_col: pa.array(agg[variant_col], type=vtype),
        "n": pa.array(agg["_n"].to_numpy().astype("int64")),
        "mean_pre": pa.array(mean_pre),
        "mean_post": pa.array(mean_post),
        "mean_adj": pa.array(mean_adj),
    })

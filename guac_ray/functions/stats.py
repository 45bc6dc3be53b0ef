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

__all__ = ["grouped_corr"]


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

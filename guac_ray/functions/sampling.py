"""Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
each row draws a deterministic uniform u from the md5 of its id and is
ranked by ``ln(u) / w`` — the classic one-pass weighted-reservoir key
(monotone-equivalent to u^(1/w)); the k largest keys are an exact
weighted sample without replacement.

Determinism/oracle: u = (first 13 md5 hex nibbles + 0.5) / 2^52 — the
same md5 discipline as the train/test split — and both engines
evaluate the IDENTICAL double expression ``ln(u)/w`` (one libm log and
one divide), so a SQL oracle with
``QUALIFY row_number() OVER (ORDER BY key DESC, id) <= k`` reproduces
the sample exactly. Ties (impossible for distinct ids barring md5
collisions) break by id ascending in both engines.

Scale shape: a pure map computes keys (one digest per row — md5 has no
vectorized kernel, so the loop is reduced to 7 digest bytes per row,
all arithmetic numpy); each batch keeps only its local top-k (the
combiner), so the driver reduces k × n_blocks candidate rows — the
same driver-small top-k contract as every sort+limit here. Rows with
``w <= 0`` are excluded (SQL mirror: WHERE w > 0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

__all__ = ["weighted_sample_k"]

_U_DENOM = float(1 << 52)


def _md5_u52(ids) -> np.ndarray:
    """First 52 md5-digest bits per int id, as int64 (== the oracle's
    ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 13) AS BIGINT)``)."""
    import hashlib

    buf = b"".join(
        hashlib.md5(str(int(i)).encode()).digest()[:7] for i in ids)
    a = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 7).astype(np.uint64)
    v = np.zeros(len(a), dtype=np.uint64)
    for j in range(7):
        v = (v << np.uint64(8)) | a[:, j]
    return (v >> np.uint64(4)).astype("int64")


def weighted_sample_k(
    ds: Dataset,
    k: int,
    weight_col: str,
    id_col: str,
    keep_cols: list[str] | None = None,
) -> pd.DataFrame:
    """k-row weighted sample without replacement → small pandas frame
    (``id_col`` + ``keep_cols``), deterministic for a fixed input."""
    if k < 1:
        raise ValueError("weighted_sample_k: k must be >= 1")
    keep = keep_cols if keep_cols is not None else [weight_col]
    cols = [id_col] + [c for c in keep if c != id_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy().astype("float64")
        m = w > 0
        sub = df.loc[m, cols].copy()
        u = (_md5_u52(sub[id_col].to_numpy()) + 0.5) / _U_DENOM \
            if len(sub) else np.empty(0)
        sub["_key"] = np.log(u) / w[m] if len(sub) else u
        return sub.sort_values(["_key", id_col],
                               ascending=[False, True]).head(k)

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if cand.empty:
        return cand.reindex(columns=cols)
    out = cand.sort_values(["_key", id_col],
                           ascending=[False, True]).head(k)
    return out.drop(columns=["_key"]).reset_index(drop=True)

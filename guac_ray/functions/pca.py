"""Distributed EXACT PCA top component — the dimensionality-reduction
primitive over the embedding table, built so the APPROXIMATE-looking
spectral computation is a bit-exact cross-engine contract like
everything else here:

1. embeddings quantize to int64 at ``scale`` (``floor(v·S + 0.5)`` —
   the cents trick generalized; identical in numpy and DuckDB), so the
   per-block Gram partials (n, Σx_i, Σx_i·x_j) are EXACT integers;
2. the centered covariance NUMERATOR  Cn[i][j] = N·Σx_ix_j − Σx_i·Σx_j
   folds on the driver in arbitrary-precision Python ints (the
   partials table is dims²·blocks rows — the q6 constant-size fold,
   never data-sized — and the fold itself cannot wrap);
3. the principal direction comes from ``iters`` rounds of POWER
   ITERATION on Cn in exact integer arithmetic with max-abs
   fixed-point normalization:  v' = trunc_div(w·Q, max|w|)  where
   w = Cn·v — TRUNCATING division, because SQL's ``//`` truncates
   while Python's floors and eigenvector components go negative; the
   engine mirrors SQL, not the other way round.

Scaling the covariance by any positive constant leaves eigenvectors
unchanged, so iterating on the integer NUMERATOR (never dividing by
N·(N−1)) keeps every step exact. The suite's ``emb_pca_top`` oracle
unrolls the identical recurrence over HUGEINT sums (the kg_hits
discipline applied to a dense 64×64 operator), so the whole spectral
pipeline is hash-checked like a relational query.

Output: one row per dimension, ``(dim, component_fp)`` with the
component in [-Q, Q] (divide by ``quantize`` for the unit-max-norm
direction; the overall sign is the deterministic one the all-ones
start converges to — identical on both engines by construction).

Scale shape: ONE streaming pass emits per-block integer partial rows
in long format ((i, j, sxy) + sentinel rows for Σx and n); the driver
collects dims²·blocks rows and does constant-size exact arithmetic.
No shuffle at all — the map output IS the reduced state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

__all__ = ["pca_top_component"]


def _trunc_div(a: int, b: int) -> int:
    """SQL-semantics integer division (truncate toward zero) over
    arbitrary-precision ints — Python's // floors, DuckDB's //
    truncates; negatives appear in every eigenvector."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def pca_top_component(
    ds: Dataset,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    quantize: int = 1 << 20,
    iters: int = 12,
    max_dim: int = 512,
) -> pa.Table:
    """Principal component of the vectors in ``vec_col`` (see module
    docstring). ``max_dim`` guards the dims²-sized driver fold."""
    if iters < 1:
        raise ValueError(f"pca_top_component: iters must be >= 1, "
                         f"got {iters}")

    def partials(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.schema([("i", pa.int64()), ("j", pa.int64()),
                              ("v", pa.int64())]).empty_table()
        X = np.stack(df[vec_col].to_numpy()).astype("float64")
        d = X.shape[1]
        if d > max_dim:
            raise ValueError(
                f"pca_top_component: dim {d} exceeds max_dim="
                f"{max_dim} — the driver fold is dims^2-sized; raise "
                "the cap only with a matching memory budget")
        if not np.isfinite(X).all():
            raise ValueError(
                "pca_top_component: non-finite embedding values — "
                "clean or impute first (a NaN would quantize to "
                "INT64_MIN silently)")
        q = np.floor(X * scale + 0.5).astype("int64")
        if len(q) and np.abs(q).max() > 30_000_000:
            raise ValueError(
                "pca_top_component: |quantized value| > 3e7 — the "
                "per-block int64 Gram budget (q^2 x rows) would "
                "overflow; lower `scale`")
        G = q.T @ q                       # exact int64 per block
        sx = q.sum(axis=0)
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        rows_i = np.concatenate([ii.ravel(), np.arange(d), [-1]])
        rows_j = np.concatenate([jj.ravel(), np.full(d, -1), [-1]])
        rows_v = np.concatenate([G.ravel(), sx, [len(q)]])
        return pa.table({"i": pa.array(rows_i, pa.int64()),
                         "j": pa.array(rows_j, pa.int64()),
                         "v": pa.array(rows_v, pa.int64())})

    # the fold input is dims^2 x blocks rows (constant per block) —
    # collected raw and summed in PYTHON ints so no int64 accumulator
    # anywhere between the exact block partials and the exact totals
    part = ds.select_columns([vec_col]).map_batches(
        partials, batch_format="pandas").to_pandas()
    empty = pa.schema([("dim", pa.int64()),
                       ("component_fp", pa.int64())])
    if part.empty:
        return empty.empty_table()
    n = 0
    sx: dict[int, int] = {}
    sxy: dict[tuple[int, int], int] = {}
    for i, j, v in zip(part["i"].to_numpy(), part["j"].to_numpy(),
                       part["v"].to_numpy()):
        i, j, v = int(i), int(j), int(v)
        if i == -1:
            n += v
        elif j == -1:
            sx[i] = sx.get(i, 0) + v
        else:
            sxy[(i, j)] = sxy.get((i, j), 0) + v
    if n == 0:
        return empty.empty_table()
    d = max(sx) + 1
    Cn = [[n * sxy[(i, j)] - sx[i] * sx[j] for j in range(d)]
          for i in range(d)]

    Q = quantize
    v = [Q] * d
    for _ in range(iters):
        w = [sum(Cn[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            # zero-variance input: direction undefined -> all-zero
            v = [0] * d
            break
        v = [_trunc_div(x * Q, mx) for x in w]
    return pa.table({
        "dim": pa.array(list(range(d)), pa.int64()),
        "component_fp": pa.array(v, pa.int64()),
    })

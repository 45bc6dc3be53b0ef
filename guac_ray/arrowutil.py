"""Tiny Arrow interop helpers shared by every stage."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["table_from_pandas", "arrow_type_of"]


def arrow_type_of(t) -> "pa.DataType | None":
    """Normalize a ``Dataset.schema()`` entry to a concrete Arrow type.

    Ray reports Arrow types for Arrow-block datasets but RAW numpy
    dtypes — or even the bare Python ``object`` class — for
    pandas-block ones (and Arrow ``null`` for all-empty object
    columns). Every typed-empty fallback needs one honest conversion:
    returns a concrete ``pa.DataType`` (``object``/``null`` → string,
    the only concrete stand-in), or ``None`` when no sensible mapping
    exists (caller picks its own fallback)."""
    import numpy as np

    if isinstance(t, pa.DataType):
        return pa.string() if pa.types.is_null(t) else t
    if t is None:
        # np.dtype(None) is numpy's legacy float64 alias — minting a
        # float64 for an UNKNOWN type would break downstream concat
        # against the real blocks; None means 'caller picks'
        return None
    try:
        dt = np.dtype(t)
    except TypeError:
        return None
    if dt == np.dtype("O"):
        return pa.string()
    try:
        return pa.from_numpy_dtype(dt)
    except (pa.ArrowNotImplementedError, TypeError):
        return None


def table_from_pandas(df: pd.DataFrame, preserve_index: bool = False,
                      **kwargs) -> pa.Table:
    """``pa.Table.from_pandas`` minus the pandas schema metadata.

    The metadata makes ``pa.Schema`` unhashable ("unhashable type:
    'dict'"), which (a) defeats Ray Data's block-schema deduplication —
    a warning per worker-side block concat — and (b) leaks through
    ``write_parquet`` into exchange files, so even downstream
    re-readers inherit it. Every ``DataFrame → Table`` conversion in
    the engine goes through here.
    """
    return pa.Table.from_pandas(
        df, preserve_index=preserve_index,
        **kwargs).replace_schema_metadata(None)

"""Tiny Arrow interop helpers shared by every stage."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["table_from_pandas"]


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

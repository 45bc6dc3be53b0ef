"""Process-level compatibility shims shared across modules."""

from __future__ import annotations

__all__ = ["stabilize_optional_imports"]


def stabilize_optional_imports() -> None:
    """Make Ray's optional fsspec-http probe race-free before running
    concurrent Dataset executions from driver threads. Ray's path
    resolution does ``from fsspec.implementations.http import
    HTTPFileSystem`` per read/write; without aiohttp that import FAILS
    every time, and two threads failing it concurrently hit the CPython
    partial-module race — one thread then sees a half-initialized
    sys.modules entry and a spurious ImportError. If the real import
    fails, cache a placeholder module whose HTTPFileSystem nothing is an
    instance of (behavior identical to the ModuleNotFoundError branch
    Ray already handles), so every later import is a race-free cache
    hit."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        m = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder: the real one needs aiohttp
            pass

        m.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = m
        try:
            import fsspec.implementations as _fi

            _fi.http = m
        except ImportError:
            pass

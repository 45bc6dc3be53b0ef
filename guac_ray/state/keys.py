"""In-memory key store (reference: pkg/ingestor/key/inmemory —
RetrieveKey/StoreKey/DeleteKey over a process-local map; the key
provider registry mirrors key.go's provider dispatch).

Key material here is an opaque byte string (the HMAC secret the DSSE
verifier uses — stages/verifier.py). Parquet snapshot load/store makes
the store broadcastable to verifier actors via ``ray.put``.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["InMemoryKeyStore", "register_key_provider", "get_key_provider"]

_PROVIDERS: dict[str, type] = {}


def register_key_provider(name: str, cls: type) -> None:
    """Provider registry with overwrite-error semantics (key.go:34-44)."""
    if name in _PROVIDERS:
        raise ValueError(f"key provider already registered: {name!r}")
    _PROVIDERS[name] = cls


def get_key_provider(name: str) -> type:
    try:
        return _PROVIDERS[name]
    except KeyError:
        raise KeyError(f"unknown key provider: {name!r}") from None


class InMemoryKeyStore:
    """key_id → key material (bytes)."""

    def __init__(self, keys: dict[str, bytes] | None = None):
        self._keys: dict[str, bytes] = dict(keys or {})

    def store(self, key_id: str, material: bytes) -> None:
        self._keys[key_id] = bytes(material)

    def retrieve(self, key_id: str) -> bytes | None:
        return self._keys.get(key_id)

    def delete(self, key_id: str) -> bool:
        return self._keys.pop(key_id, None) is not None

    def as_dict(self) -> dict[str, bytes]:
        return dict(self._keys)

    # ---- parquet snapshot (broadcastable / resumable) ----

    def to_parquet(self, path: str) -> None:
        pd.DataFrame(
            {"key_id": list(self._keys), "material": list(self._keys.values())}
        ).to_parquet(path, index=False)

    @classmethod
    def from_parquet(cls, path: str) -> "InMemoryKeyStore":
        df = pd.read_parquet(path)
        return cls(dict(zip(df.key_id, (bytes(m) for m in df.material))))


register_key_provider("inmemory", InMemoryKeyStore)

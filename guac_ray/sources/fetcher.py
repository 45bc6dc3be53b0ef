"""Rate-limited external-fetch collector (SURVEY.md §2.1, the OCI /
registry collector shape — pkg/handler/collector/oci/oci.go fetches
referrers per identifier through a rate-limited client; the GitHub and
git collectors — github/github.go, git/git.go — are the SAME stage with
a different transport: identifier = release-asset URL / repo ref, the
injected callable does the protocol).

There is no network in this environment, so the TRANSPORT is injected:
a callable ``identifier -> bytes`` (tests inject a deterministic fake;
a real deployment injects an HTTP/registry client). Everything around
it is real and distributed:

  - actor-pool ``map_batches`` stage, transport constructed once per
    actor in ``__init__``;
  - token-bucket rate limit PER ACTOR (rate_per_sec, burst) — total
    fleet rate = rate × concurrency, the same budget split the
    reference applies per registry host;
  - failures route to an error column, never a crash (collector
    emit-and-continue).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ray.data import Dataset

__all__ = ["RateLimitedFetcher", "collect_fetch"]

_OUT_SCHEMA = pa.schema(
    [
        ("identifier", pa.string()),
        ("payload", pa.binary()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
    ]
)


class _TokenBucket:
    def __init__(self, rate_per_sec: float, burst: int):
        # rate <= 0 means "no limit" (a paused/unlimited setting must not
        # divide by zero below or spin forever on a negative rate)
        self.rate = float(rate_per_sec)
        self.capacity = float(max(1, burst))
        self.tokens = self.capacity
        self.last = time.monotonic()

    def acquire(self) -> None:
        if self.rate <= 0:
            return
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep(max(0.0, (1.0 - self.tokens) / self.rate))


class RateLimitedFetcher:
    """Actor-pool batch UDF: identifier rows → fetched payload rows.

    ``transport``: callable ``str -> bytes``. Required — there is no
    default network client here; pass a real client factory on a
    connected deployment or a fake in tests.
    """

    def __init__(self, transport, rate_per_sec: float = 10.0, burst: int = 5):
        if transport is None:
            raise ValueError("RateLimitedFetcher needs a transport callable "
                             "(no network in this environment)")
        import ray

        self.transport = (
            ray.get(transport) if isinstance(transport, ray.ObjectRef) else transport
        )
        self.bucket = _TokenBucket(rate_per_sec, burst)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["identifier"].to_pylist()
        out_p, out_ok, out_err = [], [], []
        for ident in ids:
            self.bucket.acquire()
            try:
                payload = self.transport(ident)
                if not isinstance(payload, (bytes, bytearray, memoryview)):
                    # bytes(200) would mint 200 NUL bytes and mark the
                    # row ok — a transport returning a status code /
                    # length must surface as an ERROR, not a payload
                    raise TypeError(
                        f"transport returned {type(payload).__name__}, "
                        "expected bytes")
                out_p.append(bytes(payload))
                out_ok.append(True)
                out_err.append("")
            except Exception as ex:  # route, don't crash
                out_p.append(b"")
                out_ok.append(False)
                out_err.append(f"{type(ex).__name__}: {ex}")
        return pa.Table.from_arrays(
            [pa.array([str(i) for i in ids], type=pa.string()),
             pa.array(out_p, type=pa.binary()),
             pa.array(out_ok, type=pa.bool_()),
             pa.array(out_err, type=pa.string())],
            schema=_OUT_SCHEMA)  # one declared schema, used, not drifting


def collect_fetch(
    ds: Dataset,
    transport,
    rate_per_sec: float = 10.0,
    burst: int = 5,
    concurrency=(1, 2),
    batch_size: int = 64,
) -> Dataset:
    """Fetch every ``identifier`` row through the rate-limited actor
    pool. This is the round-k+1 consumer of the identifiers table the
    graph job writes (the collectsub feedback loop, SURVEY §2.1)."""
    return ds.map_batches(
        RateLimitedFetcher,
        fn_constructor_kwargs={
            "transport": transport,
            "rate_per_sec": rate_per_sec,
            "burst": burst,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

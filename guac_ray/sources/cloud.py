"""Object-store collectors: scheme-routed parquet reads over
s3:// / gs:// / file:// / plain paths — the S3/GCS bucket collectors of
the reference (pkg/handler/collector/s3/s3.go:39-170,
gcs/gcs.go:47-150) re-expressed as filesystem resolution feeding
``ray.data.read_parquet`` (Ray's streaming reader already handles
parallel range-reads, retries and column pruning once it has a
filesystem + path).

Why explicit routing instead of passing the URI straight through:
  * S3 region resolution performs a network HeadBucket — on an
    air-gapped or VPC-endpoint deployment the region must be pinned
    (``region=`` / $AWS_REGION), never sniffed;
  * anonymous-read buckets (public datasets) need ``anonymous=True``
    at FILESYSTEM construction, not per read;
  * tests and on-prem S3-compatibles (MinIO, Ceph RGW) inject a
    ``filesystem=`` override (e.g. a SubTreeFileSystem in the tests
    here — the sandbox has no network, so the cloud path is exercised
    through injection, which is also exactly the MinIO deployment
    story with ``endpoint_override``).

Scale note: filesystem objects are constructed ONCE on the driver and
serialized to read tasks by Ray — no per-task credential lookups.
"""

from __future__ import annotations

import os

from ray.data import Dataset

__all__ = ["resolve_filesystem", "read_parquet_uri"]


def resolve_filesystem(
    uri: str,
    region: str | None = None,
    anonymous: bool = False,
    endpoint_override: str | None = None,
):
    """(pyarrow filesystem, path-within-filesystem) for a storage URI.

    Schemes: ``s3://bucket/key``, ``gs://bucket/key``,
    ``file:///abs/path``, or a plain local path. The S3 region is
    pinned from ``region`` / ``$AWS_REGION`` / ``$AWS_DEFAULT_REGION``
    (default us-east-1) so construction never needs the network.
    """
    import pyarrow.fs as pafs

    if uri.startswith("s3://"):
        fs = pafs.S3FileSystem(
            region=(region or os.environ.get("AWS_REGION")
                    or os.environ.get("AWS_DEFAULT_REGION") or "us-east-1"),
            anonymous=anonymous,
            **({"endpoint_override": endpoint_override}
               if endpoint_override else {}),
        )
        return fs, uri[len("s3://"):]
    if uri.startswith(("gs://", "gcs://")):
        fs = pafs.GcsFileSystem(anonymous=anonymous)
        return fs, uri.split("://", 1)[1]
    if uri.startswith("file://"):
        return pafs.LocalFileSystem(), uri[len("file://"):]
    return pafs.LocalFileSystem(), uri


def read_parquet_uri(
    uri: str | list[str],
    columns: list[str] | None = None,
    filesystem=None,
    region: str | None = None,
    anonymous: bool = False,
    endpoint_override: str | None = None,
    **read_kwargs,
) -> Dataset:
    """``ray.data.read_parquet`` over any storage scheme. With
    ``filesystem=`` the URI/path is used as-is inside that filesystem
    (the injection point for tests and S3-compatibles); otherwise the
    scheme routes construction via :func:`resolve_filesystem`."""
    import ray.data as rd

    if filesystem is not None:
        return rd.read_parquet(uri, columns=columns, filesystem=filesystem,
                               **read_kwargs)
    uris = [uri] if isinstance(uri, str) else list(uri)
    fs, first = resolve_filesystem(
        uris[0], region=region, anonymous=anonymous,
        endpoint_override=endpoint_override)
    paths = [first] + [
        resolve_filesystem(u, region=region, anonymous=anonymous,
                           endpoint_override=endpoint_override)[1]
        for u in uris[1:]
    ]
    return rd.read_parquet(paths if len(paths) > 1 else paths[0],
                           columns=columns, filesystem=fs, **read_kwargs)

"""Object-store collector (sources/cloud.py): scheme routing and
filesystem-injected reads (the sandbox has no network, so the cloud
path is exercised via injection — also the MinIO/on-prem story)."""

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq
import pytest

from guac_ray.sources.cloud import read_parquet_uri, resolve_filesystem


class TestResolveFilesystem:
    def test_s3_offline_with_pinned_region(self):
        fs, path = resolve_filesystem("s3://bucket/key/x.parquet",
                                      region="eu-west-1")
        assert type(fs).__name__ == "S3FileSystem"
        assert path == "bucket/key/x.parquet"

    def test_s3_region_from_env(self, monkeypatch):
        monkeypatch.setenv("AWS_REGION", "ap-south-1")
        fs, _ = resolve_filesystem("s3://b/k")
        assert type(fs).__name__ == "S3FileSystem"

    def test_gs(self):
        fs, path = resolve_filesystem("gs://bucket/prefix")
        assert type(fs).__name__ == "GcsFileSystem"
        assert path == "bucket/prefix"

    def test_file_and_plain(self):
        fs, path = resolve_filesystem("file:///tmp/x")
        assert type(fs).__name__ == "LocalFileSystem"
        assert path == "/tmp/x"
        fs, path = resolve_filesystem("/tmp/y")
        assert path == "/tmp/y"


class TestReadParquetUri:
    def _write(self, tmp_path):
        t = pa.table({
            "conv_id": pa.array(["c1", "c2"], type=pa.string()),
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "text": ["hello", "world"],
        })
        p = tmp_path / "bucket" / "shard.parquet"
        p.parent.mkdir(parents=True)
        pq.write_table(t, str(p))
        return p

    def test_injected_filesystem_and_column_pruning(self, ray_session,
                                                    tmp_path):
        self._write(tmp_path)
        # the MinIO/test injection point: paths resolve INSIDE the
        # injected filesystem, exactly as bucket/key would inside S3
        sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
        ds = read_parquet_uri("bucket/shard.parquet",
                              columns=["conv_id", "text"], filesystem=sub)
        df = ds.to_pandas()
        assert sorted(df["conv_id"]) == ["c1", "c2"]
        assert list(df.columns) == ["conv_id", "text"]

    def test_file_scheme_end_to_end(self, ray_session, tmp_path):
        p = self._write(tmp_path)
        ds = read_parquet_uri(f"file://{p}", columns=["text"])
        assert sorted(ds.to_pandas()["text"]) == ["hello", "world"]

    def test_read_transcripts_routes_uris(self, ray_session, tmp_path):
        p = self._write(tmp_path)
        from guac_ray.pipelines.kg import read_transcripts

        ds = read_transcripts(f"file://{p}", columns=["conv_id", "text"])
        assert ds.count() == 2

    def test_multi_uri_same_scheme(self, ray_session, tmp_path):
        p = self._write(tmp_path)
        ds = read_parquet_uri([f"file://{p}", f"file://{p}"],
                              columns=["text"])
        assert ds.count() == 4

"""Document chunking: window/stride arithmetic, unicode codepoints,
reconstruction invariant."""

import pandas as pd
import pyarrow as pa
import pytest


def _run(texts, size, stride):
    import ray.data as rd

    from guac_ray.functions.chunking import chunk_documents

    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    out = chunk_documents(ds, "text", size, stride).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


class TestChunking:
    def test_counts_at_boundaries(self, ray_session):
        # len <= size → 1 chunk; len = size+1 → 2; exact multiple edges
        out = _run(["x" * 10, "x" * 11, "x" * 15, "x" * 16, ""], 10, 5)
        counts = out.groupby("doc_id").size()
        # 10→1, 11→ceil(1/5)+1=2, 15→ceil(5/5)+1=2, 16→ceil(6/5)+1=3, ""→1
        assert counts.tolist() == [1, 2, 2, 3, 1]
        assert out[out.doc_id == 4].chunk.tolist() == [""]

    def test_window_content_and_overlap(self, ray_session):
        text = "abcdefghij"  # size 4, stride 3 → chunks at 0,3,6
        out = _run([text], 4, 3)
        assert out.chunk.tolist() == ["abcd", "defg", "ghij"]
        # consecutive chunks overlap by size - stride = 1 codepoint
        for a, b in zip(out.chunk, out.chunk[1:]):
            assert a[3:] == b[:1]

    def test_disjoint_when_stride_equals_size(self, ray_session):
        out = _run(["abcdefgh"], 4, 4)
        assert out.chunk.tolist() == ["abcd", "efgh"]
        assert "".join(out.chunk) == "abcdefgh"  # lossless cover

    def test_unicode_codepoints(self, ray_session):
        text = "héllö wörld ünïcodé"  # multibyte codepoints
        out = _run([text], 5, 4)
        for i, c in zip(out.chunk_idx, out.chunk):
            assert c == text[i * 4:i * 4 + 5]

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            _run(["x"], 0, 1)
        with pytest.raises(ValueError):
            _run(["x"], 4, 5)  # stride > size drops codepoints


class TestNullText:
    """ADVICE r4: null text rows must be DROPPED (matching the SQL
    oracle), never flow through an undefined NaN→int64 chunk-count
    cast — and an ALL-null batch must not raise on empty concat."""

    def test_mixed_nulls_dropped(self, ray_session):
        out = _run(["abcdefgh", None, "xy"], 4, 4)
        assert sorted(out.doc_id.unique().tolist()) == [0, 2]
        assert out[out.doc_id == 0].chunk.tolist() == ["abcd", "efgh"]

    def test_all_null_batch(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.chunking import chunk_documents

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([None, None], pa.string())}))
        out = chunk_documents(ds, "text", 4, 4)
        tbl = out.to_arrow_refs()
        import ray as _r
        t = pa.concat_tables([_r.get(r) for r in tbl])
        assert t.num_rows == 0
        assert t.schema.field("chunk_idx").type == pa.int64()
        assert t.schema.field("chunk").type == pa.string()

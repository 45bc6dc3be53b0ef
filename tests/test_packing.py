"""Sequence packing (functions/packing.py): budget respected, every doc
assigned exactly once, deterministic under repartitioning, oversize
flagging."""

import numpy as np
import pandas as pd
import pytest


def _docs(n=300, seed=5):
    rng = np.random.default_rng(seed)
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(1, 120, n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "text": texts})


class TestPackSequences:
    def test_budget_and_exact_cover(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.packing import pack_sequences

        df = _docs()
        out = pack_sequences(rd.from_pandas(df).repartition(5), budget=256,
                             num_buckets=8).to_pandas()
        assert (out[~out.oversize].n_tokens <= 256).all()
        assert not out.oversize.any()  # all docs fit the budget here
        # exact cover: every doc in exactly one sequence
        all_ids = [i for m in out.doc_ids for i in m]
        assert sorted(all_ids) == list(range(len(df)))
        # token accounting matches the docs
        want = {i: len(t.split()) for i, t in zip(df.doc_id, df.text)}
        for m, tt in zip(out.doc_ids, out.n_tokens):
            assert sum(want[i] for i in m) == tt

    def test_deterministic_across_partitioning(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.packing import pack_sequences

        df = _docs(200, seed=9)
        a = pack_sequences(rd.from_pandas(df).repartition(2), budget=200,
                           num_buckets=4).to_pandas()
        b = pack_sequences(rd.from_pandas(df).repartition(13), budget=200,
                           num_buckets=4).to_pandas()
        a = a.sort_values("seq_key").reset_index(drop=True)
        b = b.sort_values("seq_key").reset_index(drop=True)
        assert a.seq_key.tolist() == b.seq_key.tolist()
        assert [tuple(m) for m in a.doc_ids] == [tuple(m) for m in b.doc_ids]

    def test_oversize_flagged_not_dropped(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.packing import pack_sequences

        df = pd.DataFrame({
            "doc_id": np.array([1, 2, 3], dtype="int64"),
            "text": ["short one", " ".join(["w"] * 500), "tiny"],
        })
        out = pack_sequences(rd.from_pandas(df), budget=64,
                             num_buckets=2).to_pandas()
        over = out[out.oversize]
        assert len(over) == 1 and over.iloc[0].doc_ids == [2]
        assert over.iloc[0].n_tokens == 500
        all_ids = sorted(i for m in out.doc_ids for i in m)
        assert all_ids == [1, 2, 3]

    def test_budget_validation(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.packing import pack_sequences

        with pytest.raises(ValueError):
            pack_sequences(rd.from_pandas(_docs(5)), budget=0)

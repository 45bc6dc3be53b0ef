"""Pivot / rollup reshaping aggregates (functions/reshape.py)."""

import numpy as np
import pandas as pd
import pytest


def _events(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "u": rng.integers(0, 40, n),
        "kind": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 50, n).astype("int64"),
    })


class TestPivotCounts:
    def test_matches_crosstab(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import pivot_counts

        df = _events()
        got = pivot_counts(rd.from_pandas(df).repartition(4), "u", "kind",
                           ["a", "b", "c"], num_buckets=4).to_pandas()
        want = pd.crosstab(df.u, df.kind)
        got = got.sort_values("u").reset_index(drop=True)
        for c in ["a", "b", "c"]:
            assert (got[f"n_{c}"].to_numpy()
                    == want[c].reindex(got.u).to_numpy()).all()

    def test_unlisted_category_ignored(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import pivot_counts

        df = _events(500)
        got = pivot_counts(rd.from_pandas(df), "u", "kind", ["a"],
                           num_buckets=2).to_pandas()
        assert set(got.columns) == {"u", "n_a"}
        assert got.n_a.sum() == (df.kind == "a").sum()


class TestRollupAgg:
    def test_matches_pandas_levels(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import rollup_agg

        df = _events()
        df["kind2"] = np.where(df.v % 2 == 0, "even", "odd")
        got = rollup_agg(
            rd.from_pandas(df).repartition(3), ["kind", "kind2"],
            {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")},
            num_buckets=4)
        # finest
        finest = df.groupby(["kind", "kind2"]).agg(
            n=("v", "count"), s=("v", "sum"), mx=("v", "max")).reset_index()
        mid = df.groupby("kind").agg(
            n=("v", "count"), s=("v", "sum"), mx=("v", "max")).reset_index()
        assert len(got) == len(finest) + len(mid) + 1
        g = got.set_index(["kind", "kind2"])
        for _, r in finest.iterrows():
            row = g.loc[(r.kind, r.kind2)]
            assert (row.n, row.s, row.mx) == (r.n, r.s, r.mx)
        for _, r in mid.iterrows():
            row = g.loc[(r.kind, "ALL")]
            assert (row.n, row.s, row.mx) == (r.n, r.s, r.mx)
        total = g.loc[("ALL", "ALL")]
        assert total.n == len(df) and total.s == df.v.sum() and total.mx == df.v.max()

    def test_mean_rejected(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import rollup_agg

        with pytest.raises(ValueError, match="mean"):
            rollup_agg(rd.from_pandas(_events(50)), ["kind"],
                       {"m": ("v", "mean")})


class TestUnpivot:
    def test_roundtrip_with_pivot(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import pivot_counts, unpivot

        df = _events(2000)
        wide = pivot_counts(rd.from_pandas(df).repartition(3), "u", "kind",
                            ["a", "b", "c"], num_buckets=4)
        long = unpivot(wide, "u", ["n_a", "n_b", "n_c"],
                       var_name="kind", value_name="n",
                       var_labels=["a", "b", "c"]).to_pandas()
        want = df.groupby(["u", "kind"]).size().rename("n").reset_index()
        m = long[long.n > 0].merge(want, on=["u", "kind"],
                                   suffixes=("", "_w"))
        assert len(m) == len(want)
        assert (m.n.to_numpy() == m.n_w.to_numpy()).all()
        # zero rows exist exactly where a (u, kind) combo is absent
        assert len(long) == long.u.nunique() * 3

    def test_mixed_dtypes_melt_to_string(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.reshape import unpivot

        df = pd.DataFrame({"k": [1, 2], "a": [10, 20],
                           "b": ["x", "y"]})
        long = unpivot(rd.from_pandas(df), "k", ["a", "b"]).to_pandas()
        assert len(long) == 4
        assert set(zip(long.k, long.variable, long.value)) == {
            (1, "a", "10"), (1, "b", "x"), (2, "a", "20"), (2, "b", "y")}

    def test_label_length_mismatch_rejected(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import unpivot

        with pytest.raises(ValueError, match="var_labels"):
            unpivot(rd.from_pandas(_events(5)), "u", ["kind", "v"],
                    var_labels=["only_one"])

    def test_mixed_dtype_nulls_stay_null(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.reshape import unpivot

        df = pd.DataFrame({"k": [1], "a": [pd.NA], "b": ["x"]})
        long = unpivot(rd.from_pandas(df), "k", ["a", "b"]).to_pandas()
        byvar = long.set_index("variable")["value"]
        assert pd.isna(byvar["a"]) and byvar["b"] == "x"


class TestCubeAgg:
    def test_all_grouping_sets(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import cube_agg

        df = _events()
        df["kind2"] = np.where(df.v % 2 == 0, "even", "odd")
        got = cube_agg(
            rd.from_pandas(df).repartition(3), ["kind", "kind2"],
            {"n": ("v", "count"), "s": ("v", "sum")}, num_buckets=4)
        finest = df.groupby(["kind", "kind2"]).agg(
            n=("v", "count"), s=("v", "sum")).reset_index()
        by_kind = df.groupby("kind").agg(n=("v", "count"), s=("v", "sum")).reset_index()
        by_kind2 = df.groupby("kind2").agg(n=("v", "count"), s=("v", "sum")).reset_index()
        # cube = finest + each single-key set + grand total
        assert len(got) == len(finest) + len(by_kind) + len(by_kind2) + 1
        g = got.set_index(["kind", "kind2"])
        for _, r in by_kind2.iterrows():  # the set ROLLUP cannot produce
            row = g.loc[("ALL", r.kind2)]
            assert (row.n, row.s) == (r.n, r.s)
        total = g.loc[("ALL", "ALL")]
        assert total.n == len(df) and total.s == df.v.sum()

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.reshape import cube_agg

        got = cube_agg(rd.from_pandas(_events(50).iloc[:0]), ["kind"],
                       {"n": ("v", "count")})
        assert len(got) == 0 and list(got.columns) == ["kind", "n"]


class TestGroupingSetsAgg:
    """Arbitrary GROUPING SETS lattice selections."""

    def test_hand_computed_sets(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.reshape import grouping_sets_agg

        df = pd.DataFrame({
            "a": ["x", "x", "y", "y"],
            "b": ["1", "2", "1", "1"],
            "v": [10, 20, 30, 40],
        })
        out = grouping_sets_agg(
            rd.from_pandas(df).repartition(2), keys=["a", "b"],
            sets=[("a",), (), ("a", "b")],
            spec={"n": ("v", "count"), "s": ("v", "sum")})
        got = out.sort_values(["a", "b"]).reset_index(drop=True)
        assert got.values.tolist() == sorted([
            # set (a,):
            ["x", "ALL", 2, 30], ["y", "ALL", 2, 70],
            # set ():
            ["ALL", "ALL", 4, 100],
            # full set (a, b) = the finest frame itself:
            ["x", "1", 1, 10], ["x", "2", 1, 20], ["y", "1", 2, 70],
        ])

    def test_duplicate_set_and_validation_and_empty(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.reshape import grouping_sets_agg

        df = pd.DataFrame({"a": ["x"], "v": [7]})
        out = grouping_sets_agg(
            rd.from_pandas(df), keys=["a"], sets=[(), ()],
            spec={"s": ("v", "sum")})
        # duplicate sets emit duplicate rows, exactly as SQL does
        assert out.values.tolist() == [["ALL", 7], ["ALL", 7]]
        with pytest.raises(ValueError, match="non-key"):
            grouping_sets_agg(rd.from_pandas(df), keys=["a"],
                              sets=[("nope",)], spec={"s": ("v", "sum")})
        empty = pd.DataFrame({"a": pd.Series([], dtype="object"),
                              "v": pd.Series([], dtype="int64")})
        out = grouping_sets_agg(rd.from_pandas(empty), keys=["a"],
                                sets=[()], spec={"s": ("v", "sum")})
        assert len(out) == 0 and list(out.columns) == ["a", "s"]

"""grouped_agg correctness vs pandas across fns and cardinalities."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def df():
    rng = np.random.default_rng(11)
    return pd.DataFrame({
        "k": rng.integers(0, 300, 20000).astype(str),
        "g2": rng.integers(0, 3, 20000),
        "v": rng.standard_normal(20000) * 10,
        "w": rng.integers(-50, 50, 20000),
    })


class TestGroupedAgg:
    def test_all_fns_match_pandas(self, ray_session, df):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_agg

        got = grouped_agg(
            rd.from_pandas(df).repartition(8),
            ["k"],
            {
                "s": ("v", "sum"),
                "n": ("v", "count"),
                "lo": ("w", "min"),
                "hi": ("w", "max"),
                "m": ("v", "mean"),
            },
            num_buckets=8,
        ).to_pandas().set_index("k").sort_index()

        want = df.groupby("k").agg(
            s=("v", "sum"), n=("v", "size"), lo=("w", "min"),
            hi=("w", "max"), m=("v", "mean"),
        ).sort_index()
        want.index = want.index.astype(str)
        assert len(got) == len(want)
        assert (got.n.to_numpy() == want.n.to_numpy()).all()
        assert (got.lo.to_numpy() == want.lo.to_numpy()).all()
        assert (got.hi.to_numpy() == want.hi.to_numpy()).all()
        np.testing.assert_allclose(got.s.to_numpy(), want.s.to_numpy(), rtol=1e-12)
        np.testing.assert_allclose(got.m.to_numpy(), want.m.to_numpy(), rtol=1e-12)

    def test_multi_key(self, ray_session, df):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_agg

        got = grouped_agg(
            rd.from_pandas(df).repartition(4),
            ["k", "g2"], {"n": ("v", "count")}, num_buckets=4,
        ).to_pandas()
        want = df.groupby(["k", "g2"]).size().reset_index(name="n")
        assert len(got) == len(want)
        g = got.sort_values(["k", "g2"]).reset_index(drop=True)
        w = want.sort_values(["k", "g2"]).reset_index(drop=True)
        assert (g.n.to_numpy() == w.n.to_numpy()).all()


class TestUserStatsOrderSensitive:
    """The order-sensitive aggregate family folded into events_user_stats:
    exact count-distinct, mode with the lexicographic-min tie rule, and
    ordered string_agg."""

    def _run(self, tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from guac_ray.pipelines.suite import events_user_stats

        pq.write_table(pa.table({
            "event_id": list(range(len(rows["user_id"]))),
            "user_id": rows["user_id"],
            "event_type": rows["event_type"],
            "value": [1.0] * len(rows["user_id"]),
        }), str(tmp_path / "events.parquet"))
        out = events_user_stats(str(tmp_path))
        return out.to_pandas().sort_values("user_id").reset_index(drop=True)

    def test_mode_tie_breaks_lexicographic(self, ray_session, tmp_path):
        # user 1: b x2, a x2 (tie -> 'a'); user 2: z x3, a x1 (-> 'z')
        df = self._run(tmp_path, {
            "user_id": [1, 1, 1, 1, 2, 2, 2, 2],
            "event_type": ["b", "b", "a", "a", "z", "z", "z", "a"],
        })
        assert df.top_type.tolist() == ["a", "z"]
        assert df.n_types.tolist() == [2, 2]
        assert df.types_list.tolist() == ["a,b", "a,z"]
        assert df.n.tolist() == [4, 4]
        assert df.value_cents.tolist() == [400, 400]

    def test_empty_input_typed(self, ray_session, tmp_path):
        df = self._run(tmp_path, {"user_id": [], "event_type": []})
        assert len(df) == 0
        assert list(df.columns) == ["user_id", "n", "value_cents",
                                    "n_types", "top_type", "types_list"]


class TestGroupedFirstLast:
    def _ref(self, df: pd.DataFrame) -> pd.DataFrame:
        srt = df.sort_values(["k", "ts", "rid"], kind="mergesort")
        g = srt.groupby("k", sort=True)
        return pd.DataFrame({
            "open": g["v"].first(), "high": g["v"].max(),
            "low": g["v"].min(), "close": g["v"].last(),
            "n": g["v"].size().astype("int64"),
        }).reset_index()

    def _mk(self, seed=7, n=200, nk=9):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "k": rng.integers(0, nk, n),
            # heavy tie mass on ts so rid must break the order
            "ts": rng.integers(0, 5, n),
            "rid": np.arange(n, dtype="int64"),
            "v": rng.normal(size=n),
        })

    def test_matches_pandas_reference_any_partitioning(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_first_last

        df = self._mk()
        want = self._ref(df)
        for parts in (1, 3, 17):
            got = grouped_first_last(
                rd.from_pandas(df).repartition(parts),
                keys=["k"], order_cols=["ts", "rid"],
                spec={"open": ("v", "first"), "high": ("v", "max"),
                      "low": ("v", "min"), "close": ("v", "last"),
                      "n": ("v", "count")},
                num_buckets=4,
            ).to_pandas().sort_values("k").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_first_only_and_plain_only(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_first_last

        df = self._mk(seed=11)
        got = grouped_first_last(
            rd.from_pandas(df).repartition(5), keys=["k"],
            order_cols=["ts", "rid"], spec={"open": ("v", "first")},
            num_buckets=4).to_pandas().sort_values("k").reset_index(drop=True)
        want = self._ref(df)[["k", "open"]]
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        got2 = grouped_first_last(
            rd.from_pandas(df).repartition(5), keys=["k"],
            order_cols=["ts", "rid"], spec={"s": ("v", "sum")},
            num_buckets=4).to_pandas().sort_values("k").reset_index(drop=True)
        want2 = (df.groupby("k", sort=True)["v"].sum()
                 .rename("s").reset_index())
        pd.testing.assert_frame_equal(got2, want2, check_dtype=False,
                                      check_exact=False)

    def test_multi_key_and_empty(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_first_last

        df = self._mk(seed=3)
        df["k2"] = (df.rid % 2).astype("int64")
        got = grouped_first_last(
            rd.from_pandas(df).repartition(4), keys=["k", "k2"],
            order_cols=["ts", "rid"],
            spec={"close": ("v", "last"), "n": ("v", "count")},
            num_buckets=4).to_pandas().sort_values(["k", "k2"]).reset_index(drop=True)
        srt = df.sort_values(["k", "k2", "ts", "rid"], kind="mergesort")
        g = srt.groupby(["k", "k2"], sort=True)
        want = pd.DataFrame({"close": g["v"].last(),
                             "n": g["v"].size().astype("int64")}).reset_index()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        empty = grouped_first_last(
            rd.from_pandas(df.head(0)), keys=["k"], order_cols=["ts", "rid"],
            spec={"open": ("v", "first"), "n": ("v", "count")},
            num_buckets=2).to_pandas()
        assert len(empty) == 0


class TestGroupedSortedConcat:
    """Order-sensitive string_agg / sorted collect_list."""

    def test_hand_computed_signatures(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_sorted_concat

        df = pd.DataFrame({
            "k": [1, 1, 1, 2, 2, 3],
            "v": ["b", "a", "b", "z", "a", "m"],  # k=1 has dup 'b'
        })
        got = grouped_sorted_concat(
            rd.from_pandas(df).repartition(3), keys=["k"], val_col="v",
            out_col="sig", exchange_base=str(tmp_path / "s"),
            num_buckets=4,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert got[["k", "n_items", "sig"]].values.tolist() == [
            [1, 2, "a|b"], [2, 2, "a|z"], [3, 1, "m"]]

    def test_non_distinct_keeps_duplicates(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_sorted_concat

        df = pd.DataFrame({"k": [7, 7, 7], "v": ["x", "x", "a"]})
        got = grouped_sorted_concat(
            rd.from_pandas(df), keys=["k"], val_col="v",
            distinct=False, exchange_base=str(tmp_path / "d"),
        ).to_pandas()
        assert got[["k", "n_items", "concat"]].values.tolist() == [
            [7, 3, "a|x|x"]]

    def test_multikey_cross_partition_and_empty(self, ray_session,
                                                tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_sorted_concat

        # values for one (k1, k2) group scattered over 6 blocks must
        # assemble into ONE sorted signature — per-block concat would
        # fragment it.
        df = pd.DataFrame({
            "k1": [1] * 10 + [2] * 2,
            "k2": ["a"] * 10 + ["a", "b"],
            "v": [f"v{i:02d}" for i in range(9, -1, -1)] + ["q", "q"],
        }).sample(frac=1.0, random_state=3)
        got = grouped_sorted_concat(
            rd.from_pandas(df).repartition(6), keys=["k1", "k2"],
            val_col="v", exchange_base=str(tmp_path / "m"),
            num_buckets=2,
        ).to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
        assert got.loc[0, "concat"] == "|".join(
            f"v{i:02d}" for i in range(10))
        assert got[["k1", "k2", "n_items"]].values.tolist() == [
            [1, "a", 10], [2, "a", 1], [2, "b", 1]]
        empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "v": pd.Series([], dtype="object")})
        out = grouped_sorted_concat(
            rd.from_pandas(empty), keys=["k"], val_col="v",
            exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["k", "n_items", "concat"]) <= set(out.schema().names)


class TestPivotWide:
    def test_hand_case_counts_and_fill(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import pivot_wide

        df = pd.DataFrame({
            "u": [1, 1, 1, 2, 3, 3],
            "t": ["a", "a", "b", "a", "c", "c"],
        })
        got = (pivot_wide(rd.from_pandas(df), ["u"], "t")
               .to_pandas().sort_values("u").reset_index(drop=True))
        assert list(got.columns) == ["u", "n_a", "n_b", "n_c"]
        assert got.values.tolist() == [
            [1, 2, 1, 0], [2, 1, 0, 0], [3, 0, 0, 2]]

    def test_sum_mode_and_explicit_absent_label(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import pivot_wide

        df = pd.DataFrame({"u": [1, 1, 2], "t": ["a", "b", "a"],
                           "v": [5, 7, 9]})
        got = (pivot_wide(rd.from_pandas(df), ["u"], "t",
                          value_col="v", agg="sum",
                          labels=["a", "b", "zz"], prefix="s_")
               .to_pandas().sort_values("u").reset_index(drop=True))
        # the absent explicit label materializes as an all-zero column
        # (schema is a contract, not a data accident)
        assert got.values.tolist() == [[1, 5, 7, 0], [2, 9, 0, 0]]

    def test_cross_partition_matches_pandas(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import pivot_wide

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "u": rng.integers(0, 40, 5000),
            "t": rng.choice(list("abcdef"), 5000),
        })
        got = (pivot_wide(rd.from_pandas(df).repartition(8), ["u"], "t",
                          num_buckets=4)
               .to_pandas().sort_values("u").reset_index(drop=True))
        want = pd.crosstab(df.u, df.t).reindex(
            columns=list("abcdef"), fill_value=0)
        want.columns = [f"n_{c}" for c in want.columns]
        want = want.reset_index()
        assert got.values.tolist() == want.values.tolist()

    def test_label_cap_and_bad_agg(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import pivot_wide

        df = pd.DataFrame({"u": [1], "t": ["a"]})
        with pytest.raises(ValueError, match="label_cap"):
            pivot_wide(rd.from_pandas(pd.DataFrame({
                "u": np.arange(300), "t": [f"l{i}" for i in range(300)],
            })), ["u"], "t", label_cap=100)
        with pytest.raises(ValueError, match="unsupported agg"):
            pivot_wide(rd.from_pandas(df), ["u"], "t", agg="median")
        with pytest.raises(ValueError, match="needs value_col"):
            pivot_wide(rd.from_pandas(df), ["u"], "t", agg="sum")
        bad = pd.DataFrame({"u": [1], "t": ["a"], "v": [1.5]})
        with pytest.raises(Exception, match="cents trick"):
            pivot_wide(rd.from_pandas(bad), ["u"], "t",
                       value_col="v", agg="sum").to_pandas()

    def test_null_key_and_label_raise(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import pivot_wide

        df = pd.DataFrame({"u": [1.0, None], "t": ["a", "a"]})
        with pytest.raises(Exception, match="non-null"):
            pivot_wide(rd.from_pandas(df), ["u"], "t").to_pandas()
        df2 = pd.DataFrame({"u": [1, 2], "t": ["a", None]})
        with pytest.raises(Exception, match="NULL"):
            pivot_wide(rd.from_pandas(df2), ["u"], "t").to_pandas()


class TestMeanNullSemantics:
    def test_mean_divides_by_nonnull_count(self, ray_session):
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_agg

        df = pd.DataFrame({"k": ["a", "a", "b", "c", "c"],
                           "x": [1.0, np.nan, 3.0, np.nan, np.nan]})
        got = (grouped_agg(rd.from_pandas(df).repartition(3), ["k"],
                           {"m": ("x", "mean"), "n": ("x", "count")})
               .to_pandas().sort_values("k").reset_index(drop=True))
        # SQL AVG: NULLs out of the denominator; COUNT(*) keeps them;
        # an all-NULL group averages to NULL (NaN), not 0
        assert got.n.tolist() == [2, 1, 2]
        assert got.m.tolist()[0] == 1.0 and got.m.tolist()[1] == 3.0
        assert np.isnan(got.m.tolist()[2])


class TestWave8Hardening:
    """Round-5 session-11: null-order picks, null keys, hidden-partial
    collisions, canonical-key edge inputs."""

    def test_first_last_null_order_never_wins(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_first_last

        ts = pd.to_datetime([100, 200], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({
            "k": [1, 1, 1],
            "ts": [ts[0], ts[1], pd.NaT],
            "v": pd.array([10, 20, 99], dtype="int64")})
        out = grouped_first_last(
            rd.from_pandas(df), ["k"], ["ts"],
            {"open": ("v", "first"), "close": ("v", "last")}).to_pandas()
        want = duckdb.sql("""
            SELECT k, arg_min(v, ts) AS open, arg_max(v, ts) AS close
            FROM df GROUP BY k""").df()
        assert out["open"].iloc[0] == want["open"].iloc[0] == 10
        assert out["close"].iloc[0] == want["close"].iloc[0] == 20

    def test_mode_keeps_null_keys_drops_null_values(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_mode

        df = pd.DataFrame({
            "k": pd.array([1, None, None, None], dtype="Int64"),
            "v": ["a", "b", "b", None]})
        out = grouped_mode(rd.from_pandas(df), ["k"], "v").to_pandas()
        assert len(out) == 2  # the NULL-key group survives
        nk = out[out.k.isna()]
        assert nk["mode"].iloc[0] == "b"  # null VALUE not a candidate
        assert nk["n_mode"].iloc[0] == 2

    def test_sorted_concat_null_key_one_group(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_sorted_concat

        df = pd.DataFrame({
            "k": pd.array([None, None, 1], dtype="Int64"),
            "v": ["x", "y", "z"]})
        out = grouped_sorted_concat(
            rd.from_pandas(df), ["k"], "v").to_pandas()
        assert len(out) == 2  # NULL key = ONE group, not one per row
        nk = out[out.k.isna()]
        assert nk["concat"].iloc[0] == "x|y"
        assert nk["n_items"].iloc[0] == 2

    def test_mean_hidden_partial_collision_rejected(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_agg

        ds = rd.from_pandas(pd.DataFrame({"k": [1], "a": [1], "b": [2]}))
        with pytest.raises(ValueError, match="hidden mean partials"):
            grouped_agg(ds, ["k"],
                        {"_x_s": ("a", "sum"), "x": ("b", "mean")})

    def test_canonical_newline_and_trailing_slash(self):
        from guac_ray.canonical import is_commit_sha, parse_vcs, sanitize

        assert sanitize("v1\n") == "v1%0A"      # raw newline never leaks
        assert not is_commit_sha("a" * 40 + "\n")
        sp = parse_vcs("git+https://github.com/org/repo@v1/")
        assert sp.tag == "v1"                    # trailing slash stripped
        sha = "a" * 40
        sp2 = parse_vcs(f"git+https://github.com/org/repo@{sha}/")
        assert sp2.commit == sha and not sp2.tag  # still a COMMIT

    def test_generate_corpus_two_convs(self, tmp_path):
        from guac_ray.synth import generate_corpus

        paths = generate_corpus(str(tmp_path / "c2"), n_convs=2,
                                n_shards=1)
        import pandas as pd
        df = pd.read_parquet(paths["transcripts"])
        assert df["conv_id"].nunique() >= 2  # no TypeError crash


class TestMvRefresh:
    """Incremental MV maintenance: delta refresh == full recompute,
    zero-group drop, negative-count refusal, sign validation."""

    def _mv(self, tmp_path, name, base, changes, **kw):
        import ray.data as rd

        from guac_ray.stages.groupagg import mv_refresh

        return (mv_refresh(rd.from_pandas(base), rd.from_pandas(changes),
                           ["k"], "n", {"s": "v"},
                           exchange_base=str(tmp_path / name), **kw)
                .to_pandas().sort_values("k").reset_index(drop=True))

    def test_refresh_equals_recompute(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(31)
        base_rows = pd.DataFrame({
            "k": rng.integers(0, 20, 500),
            "v": rng.integers(0, 100, 500).astype("int64")})
        base = (base_rows.groupby("k")
                .agg(n=("v", "size"), s=("v", "sum")).reset_index()
                .astype({"n": "int64", "s": "int64"}))
        # deletes replay a subset of base rows; inserts are new rows
        dels = base_rows.sample(60, random_state=1).assign(sign=-1)
        ins = pd.DataFrame({
            "k": rng.integers(0, 25, 200),
            "v": rng.integers(0, 100, 200).astype("int64"),
            "sign": 1})
        changes = pd.concat([dels, ins], ignore_index=True)
        changes["sign"] = changes["sign"].astype("int64")
        got = self._mv(tmp_path, "m1", base, changes, num_buckets=4)
        # recompute: base rows minus deleted replicas plus inserts
        full = pd.concat([base_rows.assign(w=1), ins.assign(w=1)[["k", "v", "w"]],
                          dels.assign(w=-1)[["k", "v", "w"]]],
                         ignore_index=True)
        full["wv"] = full["w"] * full["v"]
        want = (full.groupby("k")
                .agg(n=("w", "sum"), s=("wv", "sum")).reset_index())
        want = want[want["n"] != 0].reset_index(drop=True)
        want = want.astype({"n": "int64", "s": "int64"})
        pd.testing.assert_frame_equal(got, want, check_exact=True)

    def test_fully_deleted_group_drops(self, ray_session, tmp_path):
        import pandas as pd

        base = pd.DataFrame({"k": [1, 2], "n": [1, 2],
                             "s": [10, 40]}).astype("int64")
        changes = pd.DataFrame({"k": [1], "v": [10],
                                "sign": [-1]}).astype("int64")
        got = self._mv(tmp_path, "m2", base, changes)
        assert list(got["k"]) == [2]

    def test_negative_count_raises(self, ray_session, tmp_path):
        import pandas as pd
        import pytest

        base = pd.DataFrame({"k": [1], "n": [1], "s": [10]}).astype("int64")
        changes = pd.DataFrame({"k": [1, 1], "v": [10, 10],
                                "sign": [-1, -1]}).astype("int64")
        with pytest.raises(Exception, match="< 0"):
            self._mv(tmp_path, "m3", base, changes)

    def test_bad_sign_raises(self, ray_session, tmp_path):
        import pandas as pd
        import pytest

        base = pd.DataFrame({"k": [1], "n": [1], "s": [10]}).astype("int64")
        changes = pd.DataFrame({"k": [1], "v": [10],
                                "sign": [2]}).astype("int64")
        with pytest.raises(Exception, match="sign"):
            self._mv(tmp_path, "m4", base, changes)

    def test_insert_only_new_group(self, ray_session, tmp_path):
        import pandas as pd

        base = pd.DataFrame({"k": [], "n": [], "s": []}).astype("int64")
        changes = pd.DataFrame({"k": [9, 9], "v": [5, 7],
                                "sign": [1, 1]}).astype("int64")
        got = self._mv(tmp_path, "m5", base, changes)
        assert list(got["k"]) == [9]
        assert got.loc[0, "n"] == 2 and got.loc[0, "s"] == 12

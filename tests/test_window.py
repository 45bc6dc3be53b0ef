"""Partitioned window operators (functions/window.py) vs pandas
references."""

import numpy as np
import pandas as pd
import pytest


def _events(n=3000, seed=12, keys=40):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "u": rng.integers(0, keys, n),
        "t": rng.permutation(n).astype("int64"),  # unique order col
        "v": rng.integers(0, 100, n).astype("int64"),
        "eid": np.arange(n, dtype="int64"),
    })


class TestWindowed:
    def test_lag_lead_rownum_cumsum_match_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = _events()
        got = windowed(
            rd.from_pandas(df).repartition(5), by="u", order="t",
            ops={"pv": ("lag", "v"), "nv": ("lead", "v"),
                 "rn": ("row_number",), "cs": ("cumsum", "v")},
            exchange_base=str(tmp_path / "w"), num_buckets=4,
        ).to_pandas().sort_values("eid").reset_index(drop=True)

        ref = df.sort_values(["u", "t"], kind="mergesort")
        g = ref.groupby("u", sort=False)
        ref = ref.assign(pv=g["v"].shift(1), nv=g["v"].shift(-1),
                         rn=(g.cumcount() + 1).astype("int64"),
                         cs=g["v"].cumsum())
        ref = ref.sort_values("eid").reset_index(drop=True)
        assert len(got) == len(ref)
        for c in ["pv", "nv"]:
            pd.testing.assert_series_equal(got[c], ref[c], check_names=False)
        assert (got["rn"].to_numpy() == ref["rn"].to_numpy()).all()
        assert (got["cs"].to_numpy() == ref["cs"].to_numpy()).all()

    def test_unknown_op_rejected(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        with pytest.raises(ValueError, match="unknown op"):
            windowed(rd.from_pandas(_events(10)), "u", "t",
                     {"x": ("median", "v")})


class TestKeepLatest:
    def test_matches_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import keep_latest

        df = _events()
        got = keep_latest(
            rd.from_pandas(df).repartition(6), by="u", order=["t", "eid"],
            exchange_base=str(tmp_path / "kl"), num_buckets=4,
        ).to_pandas().sort_values("u").reset_index(drop=True)
        want = (df.sort_values(["u", "t", "eid"], kind="mergesort")
                .drop_duplicates("u", keep="last")
                .sort_values("u").reset_index(drop=True))
        assert (got["eid"].to_numpy() == want["eid"].to_numpy()).all()
        assert len(got) == df["u"].nunique()

    def test_tie_breaks_deterministically(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import keep_latest

        # all same key and order value: highest eid must win every run
        df = pd.DataFrame({"u": [1] * 50, "t": [7] * 50,
                           "eid": np.arange(50, dtype="int64")})
        got = keep_latest(rd.from_pandas(df).repartition(5), "u",
                          ["t", "eid"],
                          exchange_base=str(tmp_path / "kl2"),
                          num_buckets=2).to_pandas()
        assert got["eid"].tolist() == [49]


class TestEmptyInputs:
    def test_windowed_empty(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({"u": pd.Series([], dtype="int64"),
                           "t": pd.Series([], dtype="int64"),
                           "v": pd.Series([], dtype="int64")})
        out = windowed(rd.from_pandas(df), "u", "t",
                       {"pv": ("lag", "v")},
                       exchange_base=str(tmp_path / "we")).to_pandas()
        assert len(out) == 0

    def test_keep_latest_empty(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import keep_latest

        df = pd.DataFrame({"u": pd.Series([], dtype="int64"),
                           "t": pd.Series([], dtype="int64")})
        out = keep_latest(rd.from_pandas(df), "u", "t",
                          exchange_base=str(tmp_path / "ke")).to_pandas()
        assert len(out) == 0

    def test_shadowing_output_name_rejected(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        with pytest.raises(ValueError, match="shadow"):
            windowed(rd.from_pandas(_events(20)), "u", "t",
                     {"v": ("lag", "v"), "w": ("lead", "v")})

    def test_typed_empty_supports_downstream_select(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({"u": pd.Series([], dtype="int64"),
                           "t": pd.Series([], dtype="int64"),
                           "v": pd.Series([], dtype="float64")})
        out = windowed(rd.from_pandas(df), "u", "t", {"pv": ("lag", "v")},
                       exchange_base=str(tmp_path / "we2"))
        sel = out.select_columns(["u", "pv"])
        assert sel.count() == 0


class TestRankOps:
    def test_rank_dense_rank_and_lag_k_match_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = _events()
        # order by a TIE-RICH column (v mod 7): rank/dense_rank must be
        # functions of the order-key value, deterministic under ties
        df["o"] = (df["v"] % 7).astype("int64")
        got = windowed(
            rd.from_pandas(df).repartition(5), by="u", order="o",
            ops={"rk": ("rank",), "dr": ("dense_rank",),
                 "l2": ("lag", "v", 2)},
            exchange_base=str(tmp_path / "wr"), num_buckets=4,
        ).to_pandas()

        ref = df.sort_values(["u", "o", "eid"], kind="mergesort")
        g = ref.groupby("u", sort=False)
        ref = ref.assign(
            rk=g["o"].rank(method="min").astype("int64"),
            dr=g["o"].rank(method="dense").astype("int64"),
        )
        m = got.merge(ref[["eid", "rk", "dr"]], on="eid",
                      suffixes=("", "_ref"))
        assert len(m) == len(df)
        assert (m["rk"] == m["rk_ref"]).all()
        assert (m["dr"] == m["dr_ref"]).all()
        # lag offset 2 is order-dependent → check only where the order
        # tuple is unique per key (group sizes ≤ ... simpler: rebuild
        # with the full deterministic order)
        got2 = windowed(
            rd.from_pandas(df), by="u", order=["o", "eid"],
            ops={"l2": ("lag", "v", 2)},
            exchange_base=str(tmp_path / "wr2"), num_buckets=4,
        ).to_pandas().sort_values("eid").reset_index(drop=True)
        ref2 = df.sort_values(["u", "o", "eid"], kind="mergesort")
        ref2 = ref2.assign(l2=ref2.groupby("u", sort=False)["v"].shift(2))
        ref2 = ref2.sort_values("eid").reset_index(drop=True)
        pd.testing.assert_series_equal(got2["l2"], ref2["l2"],
                                       check_names=False)


class TestNullKeys:
    def test_null_order_values_are_rank_peers(self, ray_session, tmp_path):
        """Review finding: SQL ranks NULL order values as PEERS; the
        NaN != NaN tie detector used to open a new run per null row."""
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({
            "u": [1, 1, 1, 1, 2],
            "v": [np.nan, np.nan, np.nan, 5.0, np.nan],
        })
        out = windowed(
            rd.from_pandas(df), by="u", order=["v"],
            ops={"rk": ("rank",), "dk": ("dense_rank",)},
            exchange_base=str(tmp_path / "w"), num_buckets=2,
        ).to_pandas().sort_values(["u", "v"], na_position="first")
        u1 = out[out.u == 1]
        # NaN sorts first in pandas ascending? SQL default NULLS LAST in
        # duckdb — we assert the PEER property, not the null position:
        nan_rows = u1[u1.v.isna()]
        assert nan_rows.rk.nunique() == 1      # all null rows share a rank
        assert nan_rows.dk.nunique() == 1
        assert out[out.u == 2].rk.tolist() == [1]


class TestNtilePercentRank:
    def test_against_duckdb(self, ray_session, tmp_path):
        """ntile(k) bucket-size rule and percent_rank tie semantics vs
        DuckDB's window functions, including n<k, n%k!=0, ties, and a
        single-row partition."""
        import duckdb
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({
            "u": [1] * 7 + [2] * 3 + [3] + [4] * 2,
            "o": [10, 20, 30, 40, 50, 60, 70,  # 7 rows, k=3 → 3/2/2
                  5, 5, 9,                     # TIE on the order key
                  1,
                  2, 2],                       # all-tie partition
            "eid": list(range(13)),
        })
        got = windowed(
            rd.from_pandas(df).repartition(3), by="u", order=["o"],
            ops={"nt": ("ntile", 3), "pr": ("percent_rank",)},
            exchange_base=str(tmp_path / "w"), num_buckets=2,
        ).to_pandas().sort_values(["u", "o", "eid"]).reset_index(drop=True)

        con = duckdb.connect()
        want = con.execute("""
            SELECT u, o, eid,
                   CAST(ntile(3) OVER (PARTITION BY u ORDER BY o)
                        AS BIGINT) AS nt,
                   percent_rank() OVER (PARTITION BY u ORDER BY o) AS pr
            FROM df ORDER BY u, o, eid
        """).df()
        # ntile under ties is positional → compare only where order is
        # tie-free; percent_rank is tie-safe → compare everywhere
        assert got["pr"].tolist() == want["pr"].tolist()
        tie_free = ~df.sort_values(["u", "o", "eid"]).duplicated(
            ["u", "o"], keep=False).reset_index(drop=True)
        assert (got.loc[tie_free, "nt"].tolist()
                == want.loc[tie_free, "nt"].tolist())
        # the all-tie partition still obeys the SIZE rule (2 rows, k=3
        # → one per bucket regardless of which row got which)
        u4 = got[got.u == 4]
        assert sorted(u4["nt"]) == [1, 2]
        assert u4["pr"].tolist() == [0.0, 0.0]  # rank ties → both 0
        # single-row partition
        assert got[got.u == 3]["pr"].tolist() == [0.0]
        assert got[got.u == 3]["nt"].tolist() == [1]

    def test_ntile_rejects_bad_k(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        ds = rd.from_pandas(pd.DataFrame({"u": [1], "o": [1]}))
        for bad in (("ntile", 0), ("ntile", -3), ("ntile",)):
            with pytest.raises(ValueError, match="ntile requires k"):
                windowed(ds, by="u", order=["o"], ops={"nt": bad},
                         exchange_base=str(tmp_path / "w"))


class TestMovingAggs:
    def test_against_duckdb_with_nulls(self, ray_session, tmp_path):
        """moving_{sum,avg,min,max,count} vs DuckDB ROWS BETWEEN k-1
        PRECEDING AND CURRENT ROW, incl. NULL skipping (all-NULL window
        → NULL; count → 0), n<k partitions, and negative values."""
        import duckdb
        import ray.data as rd

        from guac_ray.functions.window import windowed

        rng = np.random.default_rng(3)
        n = 800
        df = pd.DataFrame({
            "u": rng.integers(0, 25, n),
            "t": rng.permutation(n).astype("int64"),
            "eid": np.arange(n, dtype="int64"),
        })
        vals = rng.integers(-500, 500, n)
        null = rng.random(n) < 0.15
        df["v"] = pd.array([None if m else int(x)
                            for m, x in zip(null, vals)], dtype="Int64")
        got = windowed(
            rd.from_pandas(df).repartition(4), by="u", order=["t"],
            ops={"ms": ("moving_sum", "v", 4),
                 "ma": ("moving_avg", "v", 4),
                 "mn": ("moving_min", "v", 4),
                 "mx": ("moving_max", "v", 4),
                 "mc": ("moving_count", "v", 4)},
            exchange_base=str(tmp_path / "w"), num_buckets=3,
        ).to_pandas().sort_values("eid").reset_index(drop=True)

        con = duckdb.connect()
        want = con.execute("""
            SELECT eid,
                   sum(v)   OVER w AS ms,
                   avg(v)   OVER w AS ma,
                   min(v)   OVER w AS mn,
                   max(v)   OVER w AS mx,
                   count(v) OVER w AS mc
            FROM df
            WINDOW w AS (PARTITION BY u ORDER BY t
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            ORDER BY eid
        """).df()
        for c in ["ms", "ma", "mn", "mx", "mc"]:
            a = got[c].astype("float64")
            b = want[c].astype("float64")
            assert ((a.isna() & b.isna()) | (a == b)).all(), c

    def test_k1_is_identity(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = _events(200)
        got = windowed(
            rd.from_pandas(df), by="u", order=["t"],
            ops={"ms": ("moving_sum", "v", 1)},
            exchange_base=str(tmp_path / "w1"), num_buckets=2,
        ).to_pandas().sort_values("eid").reset_index(drop=True)
        assert (got["ms"].to_numpy() ==
                df.sort_values("eid")["v"].to_numpy()).all()

    def test_bad_spec_rejected(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        ds = rd.from_pandas(pd.DataFrame({"u": [1], "t": [1], "v": [1.0]}))
        for bad in (("moving_sum", "v"), ("moving_avg", "v", 0),
                    ("moving_max", "v", -2)):
            with pytest.raises(ValueError, match="requires .op, col, k."):
                windowed(ds, by="u", order=["t"], ops={"m": bad},
                         exchange_base=str(tmp_path / "w"))

    def test_typed_empty(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({"u": pd.Series([], dtype="int64"),
                           "t": pd.Series([], dtype="int64"),
                           "v": pd.Series([], dtype="int64")})
        out = windowed(rd.from_pandas(df), "u", "t",
                       {"ms": ("moving_sum", "v", 3),
                        "mc": ("moving_count", "v", 3)},
                       exchange_base=str(tmp_path / "we3"))
        sel = out.select_columns(["ms", "mc"])
        assert sel.count() == 0


class TestCoalesceIntervals:
    def test_matches_duckdb_islands(self, ray_session, tmp_path):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import coalesce_intervals

        rng = np.random.default_rng(4)
        n = 3000
        s = rng.integers(0, 100_000, n)
        df = pd.DataFrame({
            "u": rng.integers(0, 40, n),
            "s": s,
            "e": s + rng.integers(0, 2000, n),
        })
        got = coalesce_intervals(
            rd.from_pandas(df).repartition(4), by="u",
            start_col="s", end_col="e",
            exchange_base=str(tmp_path / "iv"), num_buckets=4,
        ).to_pandas().sort_values(["u", "start"]).reset_index(drop=True)
        want = duckdb.connect().execute("""
            WITH o AS (SELECT u, s, e,
                         max(e) OVER (PARTITION BY u ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS pmax FROM df),
            isl AS (SELECT u, s, e,
                      sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                        OVER (PARTITION BY u ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING) AS gid FROM o)
            SELECT u, min(s) AS start, max(e) AS "end",
                   count(*) AS n_merged
            FROM isl GROUP BY u, gid ORDER BY u, start
        """).df()
        assert (got["start"].to_numpy() == want["start"].to_numpy()).all()
        assert (got["end"].to_numpy() == want["end"].to_numpy()).all()
        assert (got["n_merged"].to_numpy() == want["n_merged"].to_numpy()).all()

    def test_touching_intervals_merge_strict_gap_splits(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import coalesce_intervals

        df = pd.DataFrame({
            "u": [1, 1, 1, 1],
            "s": [1, 5, 20, 9],
            "e": [5, 9, 30, 9],   # [1,5]+[5,9]+[9,9] touch; [20,30] apart
        })
        got = coalesce_intervals(
            rd.from_pandas(df), by="u", start_col="s", end_col="e",
            exchange_base=str(tmp_path / "t"),
        ).to_pandas().sort_values("start").reset_index(drop=True)
        assert got[["start", "end", "n_merged"]].values.tolist() == [
            [1, 9, 3], [20, 30, 1]]

    def test_contained_interval_and_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import coalesce_intervals

        # an interval fully containing later ones (cummax, not last-end)
        df = pd.DataFrame({"u": [1, 1, 1], "s": [0, 2, 4], "e": [100, 3, 5]})
        got = coalesce_intervals(
            rd.from_pandas(df), by="u", start_col="s", end_col="e",
            exchange_base=str(tmp_path / "c")).to_pandas()
        assert got[["start", "end", "n_merged"]].values.tolist() == [[0, 100, 3]]
        empty = pd.DataFrame({"u": pd.Series([], dtype="int64"),
                              "s": pd.Series([], dtype="int64"),
                              "e": pd.Series([], dtype="int64")})
        out = coalesce_intervals(rd.from_pandas(empty), by="u",
                                 start_col="s", end_col="e",
                                 exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["u", "start", "end", "n_merged"]) <= set(out.schema().names)


class TestDailyStreaks:
    """Calendar-day gaps-and-islands: consecutive-active-day streaks."""

    def test_hand_computed_streaks(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import daily_streaks

        base = pd.Timestamp("2024-03-01")
        # u=1 active days {0,1,2, 5,6, 10}: 3 streaks, longest 3.
        # Day 1 has THREE events (incl. different times of day) — the
        # (user, day) dedup must count it once. u=2 single day.
        rows = []
        for d, hrs in [(0, [9]), (1, [1, 12, 23]), (2, [5]),
                       (5, [8]), (6, [8]), (10, [0])]:
            for h in hrs:
                rows.append({"user_id": 1,
                             "ts": base + pd.Timedelta(days=d, hours=h)})
        rows.append({"user_id": 2, "ts": base})
        df = pd.DataFrame(rows)
        got = daily_streaks(
            rd.from_pandas(df).repartition(3),
            exchange_base=str(tmp_path / "st"), num_buckets=4,
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert got[["user_id", "active_days", "longest_streak",
                    "n_streaks"]].values.tolist() == [
            [1, 6, 3, 3], [2, 1, 1, 1]]

    def test_cross_partition_run_and_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import daily_streaks

        # one user, 30 consecutive days scattered over 6 blocks: the
        # per-batch combiner only dedups locally; the exchange must
        # still assemble ONE 30-day run (not per-partition fragments).
        base = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({
            "user_id": [7] * 30,
            "ts": [base + pd.Timedelta(days=d) for d in range(30)],
        }).sample(frac=1.0, random_state=0)
        got = daily_streaks(
            rd.from_pandas(df).repartition(6),
            exchange_base=str(tmp_path / "x"), num_buckets=2).to_pandas()
        assert got[["active_days", "longest_streak",
                    "n_streaks"]].values.tolist() == [[30, 30, 1]]
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]")})
        out = daily_streaks(rd.from_pandas(empty),
                            exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["user_id", "active_days", "longest_streak",
                    "n_streaks"]) <= set(out.schema().names)


class TestCohortRetention:
    """First-active-period cohorts × offset retention cells."""

    def test_hand_computed_cells(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import cohort_retention

        base = pd.Timestamp("2024-03-04")  # a Monday
        # u1 active days {0,1,3} (day 0 TWICE — same-day dedup),
        # u2 days {0,2}, u3 days {1}: cohorts u1=u2=0, u3=1.
        rows = []
        for u, days in [(1, [0, 0, 1, 3]), (2, [0, 2]), (3, [1])]:
            for d in days:
                rows.append({"user_id": u,
                             "ts": base + pd.Timedelta(days=d, hours=u)})
        got = cohort_retention(
            rd.from_pandas(pd.DataFrame(rows)).repartition(3),
            exchange_base=str(tmp_path / "c"), num_buckets=4,
        ).to_pandas().sort_values(["cohort_week", "week_offset"])
        assert got[["cohort_week", "week_offset", "n_users"]] \
            .values.tolist() == [
            [19786, 0, 2], [19786, 1, 1], [19786, 2, 1], [19786, 3, 1],
            [19787, 0, 1]]

    def test_cross_partition_cohort_min_weekly_and_empty(
            self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import cohort_retention

        # one user: earliest activity (week 0) lands in a DIFFERENT
        # block than the week-3 activity — the per-bucket min must
        # still be the global cohort (user-hash co-location).
        base = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({
            "user_id": [5, 5, 5],
            "ts": [base + pd.Timedelta(days=d) for d in (21, 22, 0)],
        })
        got = cohort_retention(
            rd.from_pandas(df).repartition(3), period_days=7,
            exchange_base=str(tmp_path / "w"), num_buckets=2,
        ).to_pandas().sort_values("week_offset")
        w0 = (base.to_datetime64().astype("datetime64[D]")
              .astype("int64")) // 7
        assert got[["cohort_week", "week_offset", "n_users"]] \
            .values.tolist() == [[w0, 0, 1], [w0, 3, 1]]
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]")})
        out = cohort_retention(rd.from_pandas(empty),
                               exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["cohort_week", "week_offset", "n_users"]) \
            <= set(out.schema().names)


class TestRollingActiveUsers:
    """Windowed COUNT(DISTINCT) via per-user interval coverage."""

    @staticmethod
    def _run(df, tmp_path, tag, w=7, parts=3):
        import ray.data as rd

        from guac_ray.functions.streams import rolling_active_users

        return rolling_active_users(
            rd.from_pandas(df).repartition(parts), window_days=w,
            exchange_base=str(tmp_path / tag), num_buckets=4,
        ).to_pandas().sort_values("epoch_day").reset_index(drop=True)

    def test_hand_computed_dau_wau(self, ray_session, tmp_path):
        import pandas as pd

        base = pd.Timestamp("2024-01-01")
        d0 = base.to_datetime64().astype("datetime64[D]").astype("int64")
        rows = [(1, 0), (1, 0), (1, 10), (2, 0), (2, 1), (3, 3)]
        df = pd.DataFrame({
            "user_id": [u for u, _ in rows],
            "ts": [base + pd.Timedelta(days=d, hours=u)
                   for u, d in rows]})
        got = self._run(df, tmp_path, "h")
        # day 0: dau {1,2}; day 1: dau {2}, wau {1,2}; day 3: dau {3},
        # wau {1,2,3}; day 10: dau {1}, wau {1} (u3's day 3 < 10-6).
        assert got[["epoch_day", "dau", "wau"]].values.tolist() == [
            [d0 + 0, 2, 2], [d0 + 1, 1, 2],
            [d0 + 3, 1, 3], [d0 + 10, 1, 1]]

    def test_island_merge_vs_gap_and_window1(self, ray_session, tmp_path):
        import pandas as pd

        base = pd.Timestamp("2024-01-01")
        d0 = base.to_datetime64().astype("datetime64[D]").astype("int64")
        # u_a days {0, 8}: gap 8 > 6 → two coverage islands [0,6],[8,14]
        # — day 7 must NOT count u_a. u_b day {7} makes day 7 observed.
        df = pd.DataFrame({
            "user_id": [10, 10, 11],
            "ts": [base, base + pd.Timedelta(days=8),
                   base + pd.Timedelta(days=7)]})
        got = self._run(df, tmp_path, "g")
        assert got[["epoch_day", "dau", "wau"]].values.tolist() == [
            [d0 + 0, 1, 1], [d0 + 7, 1, 1], [d0 + 8, 1, 2]]
        # window_days=1 degenerates to DAU == WAU
        got1 = self._run(df, tmp_path, "w1", w=1)
        assert (got1["dau"] == got1["wau"]).all()
        import ray.data as rd

        from guac_ray.functions.streams import rolling_active_users

        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]")})
        out = rolling_active_users(rd.from_pandas(empty),
                                   exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["epoch_day", "dau", "wau"]) <= set(out.schema().names)


class TestRangeWindows:
    """Time-RANGE frames: peer inclusion, variable width, NULL skipping."""

    def _run(self, df, win, ray_session=None):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        out = windowed(rd.from_pandas(df), by="u", order="t",
                       ops={"s": ("range_sum", "v", win),
                            "n": ("range_count", "v", win)},
                       num_buckets=2).to_pandas()
        return out.sort_values(["u", "t"]).reset_index(drop=True)

    def test_matches_duckdb_range(self, ray_session):
        import duckdb
        import numpy as np

        rng = np.random.default_rng(8)
        df = pd.DataFrame({
            "u": rng.integers(0, 10, 800),
            "t": rng.integers(0, 500, 800).astype("int64"),  # ties likely
            "v": rng.integers(0, 1000, 800).astype("int64")})
        got = self._run(df, 50)
        want = duckdb.sql("""
            SELECT u, t, v,
                   CAST(sum(v) OVER w AS BIGINT) AS s,
                   count(v) OVER w AS n
            FROM df WINDOW w AS (PARTITION BY u ORDER BY t
                RANGE BETWEEN 50 PRECEDING AND CURRENT ROW)
            ORDER BY u, t""").df()
        # ties make row order ambiguous; compare per-(u,t) multisets
        for key in ["s", "n"]:
            g = got.groupby(["u", "t"])[key].apply(sorted)
            w = want.groupby(["u", "t"])[key].apply(sorted)
            assert g.equals(w)

    def test_peers_included(self, ray_session):
        # three rows at the SAME t: every one sees all three (RANGE is
        # value-defined — peers after the current row still count)
        df = pd.DataFrame({"u": [1, 1, 1], "t": [5, 5, 5],
                           "v": [10, 20, 30]})
        got = self._run(df, 0)
        assert got["s"].tolist() == [60, 60, 60]
        assert got["n"].tolist() == [3, 3, 3]

    def test_null_values_skipped(self, ray_session):
        df = pd.DataFrame({"u": [1, 1, 1], "t": [0, 1, 2],
                           "v": [None, None, 7.0]})
        got = self._run(df, 10)
        assert got["n"].tolist() == [0, 0, 1]
        assert pd.isna(got["s"][0]) and pd.isna(got["s"][1])
        assert got["s"][2] == 7.0

    def test_timestamps_and_validation(self, ray_session):
        import pytest

        t0 = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({
            "u": [1, 1, 1],
            "t": [t0, t0 + pd.Timedelta("30min"), t0 + pd.Timedelta("2h")],
            "v": [1, 2, 4]})
        got = self._run(df, pd.Timedelta(hours=1))
        assert got["s"].tolist() == [1, 3, 4]  # 2h row: only itself
        with pytest.raises(ValueError):
            import ray.data as rd

            from guac_ray.functions.window import windowed

            windowed(rd.from_pandas(df), by="u", order=["t", "v"],
                     ops={"s": ("range_sum", "v", 1)}, num_buckets=2)


class TestRangeSumSchemaStability:
    """ADVICE r4: range_sum must emit ONE schema (float64) regardless
    of which bucket a row lands in — previously an int64-source bucket
    with no all-NULL frames emitted int64 while a bucket containing an
    all-NULL frame emitted float64, and _typed_empty disagreed with
    both on nullable-int sources."""

    def test_int_bucket_and_null_bucket_agree(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from guac_ray.functions.window import windowed

        t = pa.table({
            "u": pa.array([1, 1, 2, 2], pa.int64()),
            "t": pa.array([0, 1, 0, 1], pa.int64()),
            "v": pa.array([1, 2, None, None], pa.int64())})
        out = windowed(rd.from_arrow(t), by="u", order="t",
                       ops={"s": ("range_sum", "v", 10)},
                       num_buckets=2)
        df = out.to_pandas().sort_values(["u", "t"]).reset_index(drop=True)
        assert str(df["s"].dtype) == "float64"
        assert df["s"].tolist()[:2] == [1.0, 3.0]
        assert pd.isna(df["s"][2]) and pd.isna(df["s"][3])

    def test_typed_empty_matches(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from guac_ray.functions.window import windowed

        t = pa.table({
            "u": pa.array([], pa.int64()),
            "t": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64())})
        out = windowed(rd.from_arrow(t), by="u", order="t",
                       ops={"s": ("range_sum", "v", 10)}, num_buckets=2)
        sch = out.schema()
        assert dict(zip(sch.names, sch.types))["s"] == pa.float64()


class TestGapQuantiles:
    """Per-user exact inter-arrival-gap quantiles (high-cardinality
    grouped quantile_disc)."""

    def test_hand_computed_gaps(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import gap_quantiles

        base = pd.Timestamp("2024-06-01")
        us = pd.Timedelta(microseconds=1)
        rows = []
        # u=1 at µs offsets [0, 10, 10, 40, 100] — the tied ts pair is
        # ordered by event_id, gaps (sorted-by-order) = [10, 0, 30, 60]:
        # n=4, sorted [0,10,30,60], p50 = idx ceil(4/2)-1=1 → 10,
        # p90 = idx ceil(3.6)-1=3 → 60, max 60.
        for i, off in enumerate([0, 10, 10, 40, 100]):
            rows.append({"event_id": i + 1, "user_id": 1,
                         "ts": base + off * us})
        # u=2: single event → no gaps → no output row.
        rows.append({"event_id": 10, "user_id": 2, "ts": base})
        # u=3: one gap of 5 → p50 = p90 = max = 5.
        rows.append({"event_id": 20, "user_id": 3, "ts": base})
        rows.append({"event_id": 21, "user_id": 3, "ts": base + 5 * us})
        got = gap_quantiles(
            rd.from_pandas(pd.DataFrame(rows)).repartition(4),
            exchange_base=str(tmp_path / "g"), num_buckets=4,
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert got[["user_id", "n_gaps", "p50_gap_us", "p90_gap_us",
                    "max_gap_us"]].values.tolist() == [
            [1, 4, 10, 60, 60], [3, 1, 5, 5, 5]]

    def test_cross_partition_order_and_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import gap_quantiles

        # one user, 11 events at quadratic offsets scattered over 5
        # blocks: gaps [1,3,5,...,19]; p50 = idx ceil(5)-1=4 → 9,
        # p90 = idx 9 → 17, max 19. The exchange must reassemble the
        # global order — per-block diffs would be wrong.
        base = pd.Timestamp("2024-06-01")
        df = pd.DataFrame({
            "event_id": range(11), "user_id": [9] * 11,
            "ts": [base + pd.Timedelta(microseconds=i * i)
                   for i in range(11)],
        }).sample(frac=1.0, random_state=1)
        got = gap_quantiles(
            rd.from_pandas(df).repartition(5),
            exchange_base=str(tmp_path / "x"), num_buckets=2).to_pandas()
        assert got[["n_gaps", "p50_gap_us", "p90_gap_us",
                    "max_gap_us"]].values.tolist() == [[10, 9, 17, 19]]
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]")})
        out = gap_quantiles(rd.from_pandas(empty),
                            exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["user_id", "n_gaps", "p50_gap_us", "p90_gap_us",
                    "max_gap_us"]) <= set(out.schema().names)


class TestTimeWeightedMean:
    """Per-user TWAP: value held to the next event, exact int64."""

    def test_hand_computed_twap(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import time_weighted_mean

        base = pd.Timestamp("2024-06-01")
        us = pd.Timedelta(microseconds=1)
        rows = [
            # u=1: (t=0, 1.00), (t=10, 3.00), (t=30, 2.00) → spans
            # (100¢×10µs)+(300¢×20µs) = 7000, dur 30, twap 7000//30=233
            {"event_id": 1, "user_id": 1, "ts": base + 0 * us, "value": 1.0},
            {"event_id": 2, "user_id": 1, "ts": base + 10 * us, "value": 3.0},
            {"event_id": 3, "user_id": 1, "ts": base + 30 * us, "value": 2.0},
            # u=2: single event → no spans → no row
            {"event_id": 9, "user_id": 2, "ts": base, "value": 99.0},
            # u=5: tied ts pair ordered by event_id — the dt=0 middle
            # span contributes nothing: (100×10)+(200×0)+(400×10)=5000,
            # dur 20, twap 250, n_spans 3
            {"event_id": 11, "user_id": 5, "ts": base + 0 * us, "value": 1.0},
            {"event_id": 12, "user_id": 5, "ts": base + 10 * us, "value": 2.0},
            {"event_id": 13, "user_id": 5, "ts": base + 10 * us, "value": 4.0},
            {"event_id": 14, "user_id": 5, "ts": base + 20 * us, "value": 8.0},
        ]
        got = time_weighted_mean(
            rd.from_pandas(pd.DataFrame(rows)).repartition(3),
            exchange_base=str(tmp_path / "t"), num_buckets=4,
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert got[["user_id", "n_spans", "dur_us", "vw_sum",
                    "twap_cents"]].values.tolist() == [
            [1, 2, 30, 7000, 233], [5, 3, 20, 5000, 250]]

    def test_cross_partition_and_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import time_weighted_mean

        # constant value across scattered blocks → twap == that value
        # in cents exactly, any partitioning.
        base = pd.Timestamp("2024-06-01")
        df = pd.DataFrame({
            "event_id": range(20), "user_id": [3] * 20,
            "ts": [base + pd.Timedelta(microseconds=7 * i)
                   for i in range(20)],
            "value": [4.56] * 20,
        }).sample(frac=1.0, random_state=2)
        got = time_weighted_mean(
            rd.from_pandas(df).repartition(6),
            exchange_base=str(tmp_path / "x"), num_buckets=2).to_pandas()
        assert got[["n_spans", "dur_us", "twap_cents"]] \
            .values.tolist() == [[19, 133, 456]]
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]"),
            "value": pd.Series([], dtype="float64")})
        out = time_weighted_mean(rd.from_pandas(empty),
                                 exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["user_id", "n_spans", "dur_us", "vw_sum",
                    "twap_cents"]) <= set(out.schema().names)


class TestRunningDistinct:
    """Per-user running distinct-value count (windowed COUNT(DISTINCT)
    in its running form)."""

    def test_hand_computed_running(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import running_distinct

        base = pd.Timestamp("2024-06-01")
        us = pd.Timedelta(microseconds=1)
        rows = []
        # u=1 types a,b,a,c at t=0,1,2,3 → running 1,2,2,3
        for i, ty in enumerate("abac"):
            rows.append({"event_id": i, "user_id": 1,
                         "ts": base + i * us, "event_type": ty})
        # u=2: tied ts pair ordered by event_id: types b,a at the SAME
        # ts → running 1 (for id 10), 2 (for id 11)
        rows.append({"event_id": 10, "user_id": 2, "ts": base,
                     "event_type": "b"})
        rows.append({"event_id": 11, "user_id": 2, "ts": base,
                     "event_type": "a"})
        got = running_distinct(
            rd.from_pandas(pd.DataFrame(rows)).repartition(3),
            exchange_base=str(tmp_path / "r"), num_buckets=4,
        ).to_pandas().sort_values(["user_id", "event_id"])
        assert got[["user_id", "event_id", "n_distinct"]] \
            .values.tolist() == [
            [1, 0, 1], [1, 1, 2], [1, 2, 2], [1, 3, 3],
            [2, 10, 1], [2, 11, 2]]

    def test_cross_partition_and_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import running_distinct

        # one user, 26 events with 5 distinct types scattered over 6
        # blocks: final running value must be 5, prefix non-decreasing
        base = pd.Timestamp("2024-06-01")
        df = pd.DataFrame({
            "event_id": range(26), "user_id": [4] * 26,
            "ts": [base + pd.Timedelta(microseconds=i)
                   for i in range(26)],
            "event_type": [("xyzuv")[i % 5] for i in range(26)],
        }).sample(frac=1.0, random_state=5)
        got = running_distinct(
            rd.from_pandas(df).repartition(6),
            exchange_base=str(tmp_path / "x"), num_buckets=2,
        ).to_pandas().sort_values("event_id")
        v = got["n_distinct"].tolist()
        assert v[:5] == [1, 2, 3, 4, 5] and v[-1] == 5
        assert all(a <= b for a, b in zip(v, v[1:]))
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]"),
            "event_type": pd.Series([], dtype="object")})
        out = running_distinct(rd.from_pandas(empty),
                               exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["user_id", "event_id", "n_distinct"]) \
            <= set(out.schema().names)


class TestScd2Intervals:
    """SCD2 validity intervals: change-run compression per (user, type)
    with half-open [from, to) bounds, NULL to while current."""

    def test_hand_computed_intervals(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import scd2_intervals

        base = pd.Timestamp("2024-06-01")
        us = pd.Timedelta(microseconds=1)
        b = base.value // 1000  # epoch µs of base
        rows = []
        # u=1 type 'a': values [5, 5, 7, 5] at µs [0, 10, 20, 30] —
        # runs (5, [0,20), n=2), (7, [20,30), n=1), (5, [30, NULL), 1).
        # The revert to 5 MUST open a new interval (SCD2 vs compaction).
        for i, (off, v) in enumerate([(0, 5), (10, 5), (20, 7), (30, 5)]):
            rows.append({"event_id": i, "user_id": 1, "event_type": "a",
                         "ts": base + off * us, "value_cents": v})
        # u=1 type 'b': single value → one open run.
        rows.append({"event_id": 10, "user_id": 1, "event_type": "b",
                     "ts": base, "value_cents": 9})
        # u=2 'a': tied ts pair ordered by event_id — run equality must
        # follow (ts, event_id) order: values [3, 4] at the same ts →
        # two runs, first closed AT THE SAME µs (zero-width interval).
        rows.append({"event_id": 20, "user_id": 2, "event_type": "a",
                     "ts": base, "value_cents": 3})
        rows.append({"event_id": 21, "user_id": 2, "event_type": "a",
                     "ts": base, "value_cents": 4})
        got = scd2_intervals(
            rd.from_pandas(pd.DataFrame(rows)).repartition(4),
            exchange_base=str(tmp_path / "s"), num_buckets=4,
        ).to_pandas().sort_values(
            ["user_id", "event_type", "valid_from_us"]
        ).reset_index(drop=True)
        want = [
            [1, "a", 5, b + 0, float(b + 20), 2],
            [1, "a", 7, b + 20, float(b + 30), 1],
            [1, "a", 5, b + 30, None, 1],
            [1, "b", 9, b + 0, None, 1],
            [2, "a", 3, b + 0, float(b + 0), 1],
            [2, "a", 4, b + 0, None, 1],
        ]
        cols = ["user_id", "event_type", "value_cents", "valid_from_us",
                "valid_to_us", "n_obs"]
        for row, w in zip(got[cols].itertuples(index=False), want):
            row = list(row)
            assert row[:4] == w[:4] and row[5] == w[5]
            if w[4] is None:
                assert pd.isna(row[4])
            else:
                assert row[4] == w[4]

    def test_cross_partition_and_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import scd2_intervals

        # one user/type, values 0,0,1,1,2,2,... over 12 events scattered
        # across 5 blocks: 6 runs of n_obs=2 each; the exchange must
        # reassemble global order or run boundaries break.
        base = pd.Timestamp("2024-06-01")
        df = pd.DataFrame({
            "event_id": range(12), "user_id": [7] * 12,
            "event_type": ["x"] * 12,
            "ts": [base + pd.Timedelta(microseconds=i) for i in range(12)],
            "value_cents": [i // 2 for i in range(12)],
        }).sample(frac=1.0, random_state=3)
        got = scd2_intervals(
            rd.from_pandas(df).repartition(5),
            exchange_base=str(tmp_path / "x"), num_buckets=2
        ).to_pandas().sort_values("valid_from_us").reset_index(drop=True)
        assert got["n_obs"].tolist() == [2] * 6
        assert got["value_cents"].tolist() == list(range(6))
        assert got["valid_to_us"].isna().tolist() == [False] * 5 + [True]
        # half-open chain: each valid_to equals the next valid_from
        assert (got["valid_to_us"].dropna().astype("int64").tolist()
                == got["valid_from_us"].iloc[1:].tolist())

        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "ts": pd.Series([], dtype="datetime64[ns]"),
            "value_cents": pd.Series([], dtype="int64")})
        out = scd2_intervals(rd.from_pandas(empty),
                             exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["user_id", "event_type", "value_cents",
                    "valid_from_us", "valid_to_us", "n_obs"]
                   ) <= set(out.schema().names)


class TestCdcMerge:
    """MERGE INTO / CDC upsert+delete: last-writer-wins per key with
    delete semantics over a base snapshot + changelog."""

    def test_hand_computed_merge(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import cdc_merge

        base = pd.DataFrame({
            "user_id": [1, 2, 5],
            "value_cents": [10, 20, 50],
            "updated_us": [100, 100, 100]})
        # u1: upsert → rewritten; u2: delete → gone; u3: upsert,
        # delete, upsert — the re-insert wins with n_changes=3; u4:
        # delete-only on a key never in base → absent; u5: untouched.
        chg = pd.DataFrame({
            "user_id": [1, 2, 3, 3, 3, 4],
            "ts": pd.to_datetime([200, 200, 200, 300, 400, 200],
                                 unit="us"),
            "event_id": [0, 1, 2, 3, 4, 5],
            "op": [0, 1, 0, 1, 0, 1],
            "value_cents": [15, 0, 30, 0, 35, 0]})
        got = cdc_merge(
            rd.from_pandas(base).repartition(2),
            rd.from_pandas(chg).repartition(3),
            exchange_base=str(tmp_path / "m"), num_buckets=4,
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert got.values.tolist() == [
            [1, 15, 200, 1], [3, 35, 400, 3], [5, 50, 100, 0]]

    def test_tied_ts_changelog_outranks_base_and_empty(
            self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import cdc_merge

        # changelog row at the SAME µs as the base snapshot must win
        # (base sorts at ord = -1), and changelog-internal ties break
        # by event order.
        base = pd.DataFrame({"user_id": [9], "value_cents": [1],
                             "updated_us": [500]})
        chg = pd.DataFrame({
            "user_id": [9, 9],
            "ts": pd.to_datetime([500, 500], unit="us"),
            "event_id": [3, 7], "op": [0, 0],
            "value_cents": [2, 4]})
        got = cdc_merge(rd.from_pandas(base), rd.from_pandas(chg),
                        exchange_base=str(tmp_path / "t"),
                        num_buckets=2).to_pandas()
        assert got.values.tolist() == [[9, 4, 500, 2]]

        # empty changelog → base passthrough with n_changes = 0
        empty_chg = chg.iloc[:0]
        got = cdc_merge(rd.from_pandas(base), rd.from_pandas(empty_chg),
                        exchange_base=str(tmp_path / "p"),
                        num_buckets=2).to_pandas()
        assert got.values.tolist() == [[9, 1, 500, 0]]

        # both empty → typed empty with the output schema
        out = cdc_merge(rd.from_pandas(base.iloc[:0]),
                        rd.from_pandas(empty_chg),
                        exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["user_id", "value_cents", "updated_us",
                    "n_changes"]) <= set(out.schema().names)


class TestDebounce:
    """Lag-throttle burst filter: keep first-per-user and gap >
    threshold; NULL gap on firsts; ties dropped (zero gap)."""

    def test_hand_case(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import debounce

        base = pd.Timestamp("2024-06-01").value // 1000
        df = pd.DataFrame({
            "event_id": [0, 1, 2, 3, 9],
            "user_id": [1, 1, 1, 1, 2],
            "ts": pd.to_datetime(
                [base, base + 50, base + 200, base + 200, base + 7],
                unit="us"),
        })
        got = debounce(rd.from_pandas(df).repartition(3), gap_us=100,
                       exchange_base=str(tmp_path / "d"), num_buckets=2
                       ).to_pandas().sort_values(
                           ["user_id", "ts_us", "event_id"]
                       ).reset_index(drop=True)
        # u1: keep id0 (first, NULL gap); drop id1 (gap 50 <= 100);
        # keep id2 (gap 150); drop id3 (tie, gap 0). u2: first only.
        assert got["event_id"].tolist() == [0, 2, 9]
        assert got["gap_us"].isna().tolist() == [True, False, True]
        assert got["gap_us"].iloc[1] == 150

    def test_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import debounce

        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]")})
        out = debounce(rd.from_pandas(empty), gap_us=10,
                       exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["user_id", "event_id", "ts_us", "gap_us"]) \
            <= set(out.schema().names)


class TestGroupedMode:
    """Exact grouped mode: count-partial argmax with the smallest-value
    tie-break, counts summed across partitions."""

    def test_tie_break_and_cross_partition(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.stages.groupagg import grouped_mode

        # u1: a=2, b=2 (tie -> 'a'); u2: z=3, a=1 -> 'z'. Rows are
        # scattered across 4 blocks so counts must combine globally.
        df = pd.DataFrame({
            "u": [1, 1, 1, 1, 2, 2, 2, 2],
            "v": ["a", "b", "a", "b", "z", "z", "a", "z"],
        }).sample(frac=1.0, random_state=5)
        got = grouped_mode(rd.from_pandas(df).repartition(4), ["u"], "v",
                           num_buckets=2,
                           exchange_base=str(tmp_path / "m")
                           ).to_pandas().sort_values("u").values.tolist()
        assert got == [[1, "a", 2], [2, "z", 3]]

        empty = pd.DataFrame({"u": pd.Series([], dtype="int64"),
                              "v": pd.Series([], dtype="object")})
        out = grouped_mode(rd.from_pandas(empty), ["u"], "v",
                           exchange_base=str(tmp_path / "e"))
        assert out.count() == 0
        assert set(["u", "mode", "n_mode"]) <= set(out.schema().names)


class TestCumeDistNthValue:
    def test_cume_dist_ties_and_singleton(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({
            "k": ["a"] * 4 + ["b"],
            "o": [1, 2, 2, 3, 9],
            "v": [1, 2, 3, 4, 5],
        })
        got = (windowed(rd.from_pandas(df), "k", "o",
                        {"cd": ("cume_dist",)})
               .to_pandas().sort_values(["k", "o", "v"])
               .reset_index(drop=True))
        # ties at o=2 SHARE max-rank/n = 3/4; singleton partition = 1.0
        assert got.cd.tolist() == [0.25, 0.75, 0.75, 1.0, 1.0]

    def test_nth_value_short_partition_null_and_dtype(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({
            "k": ["a"] * 3 + ["b"] * 2,
            "o": [1, 2, 3, 1, 2],
            "v": [10, 20, 30, 40, 50],
        })
        got = (windowed(rd.from_pandas(df).repartition(3), "k", "o",
                        {"n2": ("nth_value", "v", 2),
                         "n3": ("nth_value", "v", 3)})
               .to_pandas().sort_values(["k", "o"])
               .reset_index(drop=True))
        # whole-partition semantics: every row of k=a reads the 3rd
        # value; k=b (2 rows) reads NULL for n3 but 50 for n2
        assert got.n2.tolist() == [20.0, 20.0, 20.0, 50.0, 50.0]
        assert got.n3.tolist()[:3] == [30.0, 30.0, 30.0]
        assert got.n3.isna().tolist() == [False, False, False, True, True]
        # integer source comes back float64 in EVERY bucket (schema
        # must not depend on which bucket holds the short partition)
        assert got.n2.dtype == "float64" and got.n3.dtype == "float64"

    def test_nth_value_bad_k_raises(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({"k": ["a"], "o": [1], "v": [1]})
        with pytest.raises(Exception, match="nth_value k"):
            windowed(rd.from_pandas(df), "k", "o",
                     {"n": ("nth_value", "v", 0)}).to_pandas()


class TestStreamsNullHardening:
    """Round-5 session-11 wave: NULL timestamps/values/users must not
    corrupt the stream operators through undefined NaT/NaN int casts."""

    def test_sessionize_null_user_and_value(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import sessionize

        ts = pd.to_datetime([10, 20, 5000, 30, 40], unit="s")
        df = pd.DataFrame({
            "user_id": pd.array([1, 1, 1, None, None], dtype="Int64"),
            "ts": ts.astype("datetime64[us]"),
            "event_id": [1, 2, 3, 4, 5],
            "value": [1.0, np.nan, 2.0, 3.0, 4.0]})
        out = sessionize(rd.from_pandas(df), user_col="user_id",
                         ts_col="ts", id_col="event_id",
                         value_col="value").to_pandas()
        u1 = out[out.user_id.notna()].sort_values("session_start")
        # user 1: two sessions (gap > 30min); null value contributes 0
        assert len(u1) == 2
        assert u1["value_cents"].tolist() == [100, 200]
        # NULL-user events form ONE stream (SQL GROUP BY keeps them)
        un = out[out.user_id.isna()]
        assert len(un) == 1
        assert un["n"].iloc[0] == 2 and un["value_cents"].iloc[0] == 700

    def test_gap_quantiles_drops_null_ts(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import gap_quantiles

        ts = pd.Series(pd.to_datetime([100, 200, 400], unit="s")
                       .astype("datetime64[us]"))
        df = pd.DataFrame({
            "user_id": [7, 7, 7, 7],
            "ts": list(ts) + [pd.NaT],
            "event_id": [1, 2, 3, 4]})
        out = gap_quantiles(rd.from_pandas(df), user_col="user_id",
                            ts_col="ts", order_col="event_id",
                            exchange_base=str(tmp_path / "gq")).to_pandas()
        # the NaT row must NOT become an INT64_MIN "first event":
        # gaps are 100s and 200s, max gap exactly 200s
        assert out["max_gap_us"].tolist() == [200_000_000]

    def test_twap_zero_span_is_null(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import time_weighted_mean

        ts = pd.to_datetime([100, 100, 100, 200], unit="s")
        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2],  # user 1: all at one instant
            "ts": ts.astype("datetime64[us]"),
            "event_id": [1, 2, 3, 4],
            "value": [5.0, 6.0, 7.0, 8.0]})
        out = time_weighted_mean(
            rd.from_pandas(df), user_col="user_id", ts_col="ts",
            order_col="event_id", value_col="value",
            exchange_base=str(tmp_path / "tw")).to_pandas()
        u1 = out[out.user_id == 1]
        assert len(u1) == 1 and pd.isna(u1["twap_cents"].iloc[0])

    def test_cdc_refuses_float_keys(self, ray_session, tmp_path):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.streams import cdc_merge

        base = pd.DataFrame({"user_id": [1.5], "value_cents": [10],
                             "updated_us": [0]})
        chg = pd.DataFrame({
            "user_id": [1], "ts": pd.to_datetime([5], unit="s"),
            "event_id": [1], "op": [0], "value_cents": [20]})
        with pytest.raises(Exception, match="integer"):
            cdc_merge(rd.from_pandas(base), rd.from_pandas(chg),
                      key_col="user_id", base_ts_col="updated_us",
                      ts_col="ts", order_col="event_id", op_col="op",
                      value_col="value_cents",
                      exchange_base=str(tmp_path / "cdc")).materialize()

    def test_unpivot_nullable_int_columns(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.reshape import unpivot

        df = pd.DataFrame({"k": [1, 2],
                           "a": pd.array([10, None], dtype="Int64"),
                           "b": pd.array([None, 20], dtype="Int64")})
        out = unpivot(rd.from_pandas(df), "k", ["a", "b"]).to_pandas()
        assert len(out) == 4
        got = out.sort_values(["k", "variable"])["value"].tolist()
        assert got[0] == 10 and pd.isna(got[1])
        assert pd.isna(got[2]) and got[3] == 20


class TestWave7WindowHardening:
    def test_keep_latest_null_order_never_wins(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.window import keep_latest

        ts = pd.to_datetime([100, 200], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({
            "k": [1, 1, 1, 2],
            "ts": [ts[0], ts[1], pd.NaT, pd.NaT],
            "v": [10, 20, 99, 7]})
        out = keep_latest(rd.from_pandas(df), by="k",
                          order="ts").to_pandas().sort_values("k")
        # the null-ts row must NOT be crowned latest for key 1 …
        assert out[out.k == 1]["v"].iloc[0] == 20
        # … but an all-null key still keeps one row
        assert out[out.k == 2]["v"].iloc[0] == 7

    def test_cumsum_sql_null_semantics(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({
            "k": [1, 1, 1, 2, 2],
            "o": [1, 2, 3, 1, 2],
            "v": [5.0, None, 3.0, None, 4.0]})
        out = windowed(rd.from_pandas(df), by="k", order="o",
                       ops={"run": ("cumsum", "v")},
                       exchange_base=str(tmp_path / "w")
                       ).to_pandas().sort_values(["k", "o"])
        want = duckdb.sql("""
            SELECT k, o, SUM(v) OVER (PARTITION BY k ORDER BY o) AS run
            FROM df ORDER BY k, o""").df()
        got = out["run"].tolist()
        exp = want["run"].tolist()
        for g, e in zip(got, exp):
            assert (pd.isna(g) and pd.isna(e)) or g == e, (got, exp)

    def test_range_frames_refuse_floats_and_nulls(self, ray_session,
                                                  tmp_path):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({"k": [1, 1], "o": [2.0, 2.7], "v": [1, 1]})
        with pytest.raises(Exception, match="integer or datetime"):
            windowed(rd.from_pandas(df), by="k", order="o",
                     ops={"s": ("range_sum", "v", 1)},
                     exchange_base=str(tmp_path / "rf")).materialize()
        df2 = pd.DataFrame({"k": [1, 1],
                            "o": pd.array([1, None], dtype="Int64"),
                            "v": [1, 1]})
        with pytest.raises(Exception, match="NULL"):
            windowed(rd.from_pandas(df2), by="k", order="o",
                     ops={"s": ("range_sum", "v", 1)},
                     exchange_base=str(tmp_path / "rn")).materialize()

    def test_payload_shadow_rejected(self, ray_session, tmp_path):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({"k": [1], "o": [1], "text": ["payload"]})
        with pytest.raises(Exception, match="text"):
            windowed(rd.from_pandas(df), by="k", order="o",
                     ops={"text": ("row_number",)},
                     exchange_base=str(tmp_path / "sh")).materialize()

    def test_rank_all_null_first_row(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.window import windowed

        df = pd.DataFrame({
            "k": pd.array([None, None], dtype="Int64"),
            "o": pd.array([None, None], dtype="Int64"),
            "v": [1, 2]})
        out = windowed(rd.from_pandas(df), by="k", order="o",
                       ops={"r": ("rank",)},
                       exchange_base=str(tmp_path / "rk")).to_pandas()
        assert out["r"].tolist() == [1, 1]  # all peers, no crash


class TestWave13StreamsHardening:
    """Round-5 session-12: null values/types/users through the stream
    reduces — crashes and silent casts replaced with SQL semantics."""

    def test_running_distinct_null_values_ignored(self, ray_session,
                                                  tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import running_distinct

        ts = pd.to_datetime([1, 2, 3, 4], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1],
            "ts": ts,
            "event_id": [1, 2, 3, 4],
            "event_type": ["a", None, "a", "b"]})
        out = running_distinct(
            rd.from_pandas(df), user_col="user_id", ts_col="ts",
            order_col="event_id", value_col="event_type",
            exchange_base=str(tmp_path / "rdx")).to_pandas()
        out = out.sort_values("event_id")
        # NULL is never a distinct value (SQL COUNT DISTINCT), but the
        # row keeps its output entry with the unchanged running count
        assert out["n_distinct"].tolist() == [1, 1, 1, 2]

    def test_scd2_null_type_is_one_group(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import scd2_intervals

        ts = pd.to_datetime([1, 2, 3], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({
            "user_id": [7, 7, 7],
            "event_type": [None, None, "x"],
            "ts": ts,
            "event_id": [1, 2, 3],
            "value": [5, 5, 9]})
        out = scd2_intervals(
            rd.from_pandas(df), key_cols=["user_id", "event_type"],
            ts_col="ts", order_col="event_id", value_col="value",
            exchange_base=str(tmp_path / "s2x")).to_pandas()
        # no lexsort TypeError; the two NULL-type events form ONE run
        nt = out[out.event_type.isna()]
        assert len(nt) == 1 and nt["n_obs"].iloc[0] == 2

    def test_streaks_null_user_one_group(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.streams import daily_streaks

        ts = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-05",
                             "2024-01-01"]).astype("datetime64[us]")
        df = pd.DataFrame({
            "user_id": [None, None, None, "u1"],
            "ts": ts})
        out = daily_streaks(
            rd.from_pandas(df), user_col="user_id", ts_col="ts",
            exchange_base=str(tmp_path / "dsx")).to_pandas()
        # the NULL-user stream survives as ONE group (SQL GROUP BY)
        nu = out[out.user_id.isna()]
        assert len(nu) == 1
        assert nu["longest_streak"].iloc[0] == 2
        assert nu["n_streaks"].iloc[0] == 2

    def test_cohort_rejects_zero_period(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.streams import cohort_retention

        df = pd.DataFrame({
            "user_id": [1],
            "ts": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]")})
        with pytest.raises(ValueError, match="period_days"):
            cohort_retention(rd.from_pandas(df), period_days=0)

    def test_gap_quantiles_refuses_float_user(self, ray_session,
                                              tmp_path):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.streams import gap_quantiles

        ts = pd.to_datetime([1, 2], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({
            "user_id": [1.0, None],  # NULL-upcast float key
            "ts": ts, "event_id": [1, 2]})
        with pytest.raises(Exception, match="integer"):
            gap_quantiles(rd.from_pandas(df), user_col="user_id",
                          ts_col="ts", order_col="event_id",
                          exchange_base=str(tmp_path / "gqx")
                          ).materialize()


class TestEwma:
    """Fixed-point per-user EWMA: hand recurrence, tie ordering,
    partitioning invariance, guards."""

    def _run(self, df, tmp_path, name, **kw):
        import ray.data as rd

        from guac_ray.functions.streams import ewma

        out = ewma(rd.from_pandas(df), "v",
                   exchange_base=str(tmp_path / name), **kw).to_pandas()
        return out.sort_values("user_id").reset_index(drop=True)

    def test_hand_recurrence(self, ray_session, tmp_path):
        import pandas as pd
        import numpy as np

        ts = pd.to_datetime([1, 2, 3, 10], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({
            "user_id": np.array([7, 7, 7, 9], "int64"),
            "ts": ts, "event_id": np.array([1, 2, 3, 4], "int64"),
            "v": np.array([100, 50, 200, 30], "int64")})
        out = self._run(df, tmp_path, "e1")
        S = 1_000_000
        e = 100 * S
        e = (50 * S + e) // 2
        e = (200 * S + e) // 2
        assert list(out["user_id"]) == [7, 9]
        assert out.loc[0, "ewma_fp"] == e and out.loc[0, "n_events"] == 3
        assert out.loc[1, "ewma_fp"] == 30 * S and out.loc[1, "n_events"] == 1

    def test_tied_ts_orders_by_event_id(self, ray_session, tmp_path):
        import pandas as pd
        import numpy as np

        ts = pd.to_datetime([5, 5], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({
            "user_id": np.array([1, 1], "int64"), "ts": ts,
            "event_id": np.array([2, 1], "int64"),
            "v": np.array([10, 20], "int64")})  # event 1 (v=20) is FIRST
        out = self._run(df, tmp_path, "e2")
        S = 1_000_000
        assert out.loc[0, "ewma_fp"] == (10 * S + 20 * S) // 2

    def test_partitioning_invariance(self, ray_session, tmp_path):
        import pandas as pd
        import numpy as np
        import ray.data as rd

        from guac_ray.functions.streams import ewma

        rng = np.random.default_rng(21)
        n = 2000
        df = pd.DataFrame({
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s")
                    .astype("datetime64[us]"),
            "event_id": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 5000, n).astype("int64")})
        outs = []
        for i, nblocks in enumerate((1, 11)):
            ds = rd.from_pandas(df).repartition(nblocks)
            outs.append(
                ewma(ds, "v", exchange_base=str(tmp_path / f"p{i}"),
                     num_buckets=4).to_pandas()
                .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)

    def test_negative_and_alpha_guards(self, ray_session, tmp_path):
        import pandas as pd
        import numpy as np
        import pytest
        import ray.data as rd

        from guac_ray.functions.streams import ewma

        ts = pd.to_datetime([1], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({"user_id": np.array([1], "int64"), "ts": ts,
                           "event_id": np.array([1], "int64"),
                           "v": np.array([-5], "int64")})
        with pytest.raises(Exception, match="negative"):
            ewma(rd.from_pandas(df), "v",
                 exchange_base=str(tmp_path / "neg")).materialize()
        with pytest.raises(ValueError, match="alpha"):
            ewma(rd.from_pandas(df), "v", alpha_num=3, alpha_den=2)

    def test_overflow_guard(self, ray_session, tmp_path):
        import pandas as pd
        import numpy as np
        import pytest
        import ray.data as rd

        from guac_ray.functions.streams import ewma

        ts = pd.to_datetime([1], unit="s").astype("datetime64[us]")
        df = pd.DataFrame({"user_id": np.array([1], "int64"), "ts": ts,
                           "event_id": np.array([1], "int64"),
                           "v": np.array([2**61], "int64")})
        with pytest.raises(Exception, match="overflow"):
            ewma(rd.from_pandas(df), "v",
                 exchange_base=str(tmp_path / "ovf")).materialize()

"""Join tiers: broadcast, semi/anti, partitioned hash join."""

import numpy as np
import pandas as pd
import pytest


def _sides(n=5000, seed=2):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({"k": rng.integers(0, 800, n), "x": rng.integers(0, 100, n)})
    right = pd.DataFrame({"k": np.arange(0, 1000), "y": np.arange(0, 1000) * 2})
    return left, right


class TestJoins:
    def test_broadcast_join_matches_pandas(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.joins import broadcast_join

        left, right = _sides()
        got = broadcast_join(rd.from_pandas(left).repartition(4), right, on="k").to_pandas()
        want = left.merge(right, on="k", how="inner")
        assert len(got) == len(want)
        assert got.y.sum() == want.y.sum()

    def test_hash_join_matches_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides()
        got = hash_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(3),
            on="k", exchange_dir=str(tmp_path / "jex"), num_buckets=8,
        ).to_pandas()
        want = left.merge(right, on="k", how="inner")
        assert len(got) == len(want)
        g = got.sort_values(["k", "x"]).reset_index(drop=True)
        w = want.sort_values(["k", "x"]).reset_index(drop=True)
        assert (g.y.to_numpy() == w.y.to_numpy()).all()

    def test_exchange_dir_reuse_keeps_earlier_result_live(self, ray_session, tmp_path):
        """Two calls sharing one exchange_dir base must not repoint the
        first (lazy) result at the second call's data."""
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides()
        ex = str(tmp_path / "shared")
        first = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", exchange_dir=ex, num_buckets=4)
        n_first = first.count()
        # second call, same base dir, much smaller input
        hash_join(rd.from_pandas(left.head(3)), rd.from_pandas(right.head(3)),
                  on="k", exchange_dir=ex, num_buckets=4).materialize()
        # re-consume the FIRST result — must still see its own data
        assert first.to_pandas().shape[0] == n_first

    def test_hash_join_left_matches_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides(100)
        # make some left keys unmatched
        right = right[right.k % 3 != 0]
        got = hash_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2),
            on="k", exchange_dir=str(tmp_path / "lj"), num_buckets=8, how="left",
        ).to_pandas()
        want = left.merge(right, on="k", how="left")
        assert len(got) == len(want)
        g = got.sort_values(["k", "x"]).reset_index(drop=True)
        w = want.sort_values(["k", "x"]).reset_index(drop=True)
        assert g.y.isna().sum() == w.y.isna().sum() > 0
        gm, wm = g[g.y.notna()], w[w.y.notna()]
        assert (gm.y.to_numpy() == wm.y.to_numpy()).all()

    def test_hash_join_full_outer_matches_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides(200)
        # unmatched rows on BOTH sides: drop some keys from each
        left = left[left.k % 3 != 0]        # right-only keys appear
        right = right[right.k % 5 != 0]     # left-only keys appear
        got = hash_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2),
            on="k", exchange_dir=str(tmp_path / "oj"), num_buckets=8, how="outer",
        ).to_pandas()
        want = left.merge(right, on="k", how="outer")
        g = got.sort_values(["k", "x", "y"], na_position="last").reset_index(drop=True)
        w = want.sort_values(["k", "x", "y"], na_position="last").reset_index(drop=True)
        assert len(g) == len(w)
        # both directions of unmatchedness must survive
        assert g.x.isna().sum() == w.x.isna().sum() > 0
        assert g.y.isna().sum() == w.y.isna().sum() > 0
        pd.testing.assert_frame_equal(g[w.columns], w, check_dtype=False)

    def test_hash_join_right_only_bucket_and_empty_left(self, ray_session, tmp_path):
        """Outer join where entire buckets (and then the entire left
        side) have no left rows still emits the right rows."""
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left = pd.DataFrame({"k": [1], "x": [7]})
        right = pd.DataFrame({"k": np.arange(50), "y": np.arange(50) * 2})
        got = hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k",
            exchange_dir=str(tmp_path / "ro"), num_buckets=8, how="outer",
        ).to_pandas()
        want = left.merge(right, on="k", how="outer")
        assert len(got) == len(want) == 50
        assert got.x.notna().sum() == 1

    def test_hash_join_rejects_unknown_how(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides(100)
        with pytest.raises(NotImplementedError):
            hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                      exchange_dir=str(tmp_path / "x"), how="right")

    def test_semi_anti_partition(self, ray_session):
        import ray.data as rd

        from guac_ray.functions.joins import anti_join, semi_join

        left, _ = _sides(1000)
        keys = set(range(0, 400))
        ds = rd.from_pandas(left).repartition(3)
        s = semi_join(ds, keys, "k").to_pandas()
        a = anti_join(ds, keys, "k").to_pandas()
        assert len(s) + len(a) == len(left)
        assert s.k.isin(keys).all()
        assert (~a.k.isin(keys)).all()


def _range_reference(left, right, by, on, lower, upper, rsuffix="_r"):
    m = left.merge(right, on=by, how="inner", suffixes=("", rsuffix))
    ron = on + rsuffix if on + rsuffix in m.columns else on
    keep = (m[ron] >= m[on] + lower) & (m[ron] <= m[on] + upper)
    return m[keep]


class TestRangeJoin:
    def _sides(self, seed=11, n_left=400, n_right=600, keys=25):
        rng = np.random.default_rng(seed)
        left = pd.DataFrame({
            "u": rng.integers(0, keys, n_left),
            "t": rng.integers(0, 5_000, n_left).astype("int64"),
            "lid": np.arange(n_left),
        })
        right = pd.DataFrame({
            "u": rng.integers(0, keys, n_right),
            "t": rng.integers(0, 5_000, n_right).astype("int64"),
            "rid": np.arange(n_right),
        })
        return left, right

    def test_matches_pandas_reference(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import range_join

        left, right = self._sides()
        got = range_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            by="u", on="t", lower=-100, upper=50,
            exchange_dir=str(tmp_path / "rex"), num_buckets=4,
        ).to_pandas()
        want = _range_reference(left, right, "u", "t", -100, 50)
        assert len(got) == len(want)
        g = set(zip(got.lid, got.rid))
        w = set(zip(want.lid, want.rid))
        assert g == w

    def test_inclusive_bounds_and_missing_keys(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import range_join

        left = pd.DataFrame({"u": [1, 1, 2, 9], "t": [100, 200, 50, 7],
                             "lid": [0, 1, 2, 3]})
        # key 9 absent on the right; exact-boundary matches at both edges
        right = pd.DataFrame({"u": [1, 1, 1, 2], "t": [90, 110, 201, 50],
                              "rid": [0, 1, 2, 3]})
        got = range_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="u", on="t", lower=-10, upper=10,
            exchange_dir=str(tmp_path / "rex2"), num_buckets=2,
        ).to_pandas()
        pairs = set(zip(got.lid, got.rid))
        # lid 0 @100: right 90 (=-10 edge) and 110 (=+10 edge); lid 1 @200:
        # 201; lid 2 @50: 50 (zero gap); lid 3: key missing → nothing
        assert pairs == {(0, 0), (0, 1), (1, 2), (2, 3)}

    def test_datetime_ordinate(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import range_join

        base = pd.Timestamp("2024-03-01")
        left = pd.DataFrame({
            "u": [5, 5, 6],
            "t": [base, base + pd.Timedelta("45min"), base],
            "lid": [0, 1, 2],
        })
        right = pd.DataFrame({
            "u": [5, 5, 6, 6],
            "t": [base - pd.Timedelta("20min"), base + pd.Timedelta("40min"),
                  base - pd.Timedelta("31min"), base + pd.Timedelta("1s")],
            "rid": [0, 1, 2, 3],
        })
        got = range_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="u", on="t", lower=pd.Timedelta("-30min"), upper=pd.Timedelta(0),
            exchange_dir=str(tmp_path / "rex3"), num_buckets=2,
        ).to_pandas()
        pairs = set(zip(got.lid, got.rid))
        # lid0 window [-30m, 0]: rid0 (-20m) in, rid1 (+40m) out; lid1 window
        # covers rid1 (45-40=5m before); lid2: rid2 at -31m out, rid3 (+1s) out
        assert pairs == {(0, 0), (1, 1)}

    def test_hot_key_skew(self, ray_session, tmp_path):
        """One key holding 60% of both sides (the documented worst case:
        a hot key serializes into one bucket's task) — must still be
        correct and produce exactly the true matches."""
        import ray.data as rd

        from guac_ray.functions.joins import range_join

        rng = np.random.default_rng(21)
        n = 2000
        hot = rng.random(n) < 0.6
        left = pd.DataFrame({
            "u": np.where(hot, 7, rng.integers(100, 130, n)),
            "t": rng.integers(0, 20_000, n).astype("int64"),
            "lid": np.arange(n),
        })
        right = left.rename(columns={"lid": "rid"}).copy()
        got = range_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(4),
            by="u", on="t", lower=-3, upper=3,
            exchange_dir=str(tmp_path / "skew"), num_buckets=4,
        ).to_pandas()
        want = _range_reference(left, right, "u", "t", -3, 3)
        assert set(zip(got.lid, got.rid)) == set(zip(want.lid, want.rid))

    def test_ns_timestamps_many_keys_stay_vectorized(self):
        """Regression for the dense-rank composite: ns-resolution
        timestamps over a 30-day span with thousands of distinct keys
        previously overflowed the value-range composite guard
        ((keys+1)*span >= 2^62) and fell into the per-row Python loop.
        Rank encoding keeps span = n_distinct_ordinates + 1, so this must
        run the vectorized path (budgeted) and match brute force."""
        import time

        from guac_ray.functions.joins import _banded_matches

        rng = np.random.default_rng(9)
        n, keys = 30_000, 4000
        base = pd.Timestamp("2024-01-01").value
        span_ns = 30 * 24 * 3600 * 10**9  # 30 days in ns
        lby = rng.integers(0, keys, n)
        lon = base + rng.integers(0, span_ns, n)
        rby = np.sort(rng.integers(0, keys, n))
        ron = base + rng.integers(0, span_ns, n)
        ron = np.concatenate([np.sort(ron[rby == k]) for k in np.unique(rby)])
        lower, upper = -3_600 * 10**9, 3_600 * 10**9  # ±1h
        t0 = time.time()
        lidx, ridx = _banded_matches(lby, lon, rby, ron, lower, upper)
        elapsed = time.time() - t0
        got = set(zip(lidx.tolist(), ridx.tolist()))
        want = set()
        for k in np.unique(np.concatenate([lby, rby])):
            lmask = np.flatnonzero(lby == k)
            rmask = np.flatnonzero(rby == k)
            for i in lmask:
                ok = (ron[rmask] >= lon[i] + lower) & (ron[rmask] <= lon[i] + upper)
                want.update((int(i), int(j)) for j in rmask[ok])
        assert got == want
        # the per-row loop takes >10s on 30k rows; the composite is ~ms
        assert elapsed < 2.0

    def test_float_ordinate_fallback(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import range_join

        rng = np.random.default_rng(3)
        left = pd.DataFrame({"u": rng.integers(0, 8, 200),
                             "t": rng.uniform(0, 100, 200),
                             "lid": np.arange(200)})
        right = pd.DataFrame({"u": rng.integers(0, 8, 200),
                              "t": rng.uniform(0, 100, 200),
                              "rid": np.arange(200)})
        got = range_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="u", on="t", lower=-2.5, upper=2.5,
            exchange_dir=str(tmp_path / "rex4"), num_buckets=3,
        ).to_pandas()
        want = _range_reference(left, right, "u", "t", -2.5, 2.5)
        assert set(zip(got.lid, got.rid)) == set(zip(want.lid, want.rid))


class TestAsofJoin:
    def test_matches_pandas_merge_asof(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import asof_join

        rng = np.random.default_rng(9)
        left = pd.DataFrame({
            "u": rng.integers(0, 30, 400),
            "t": rng.integers(0, 10_000, 400),
            "ev": np.arange(400),
        }).astype({"t": "int64"})
        right = pd.DataFrame({
            "u": rng.integers(0, 30, 120),
            "t": rng.integers(0, 10_000, 120),
            "mark": np.arange(120),
        }).astype({"t": "int64"})
        got = asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            by="u", on="t", exchange_dir=str(tmp_path / "aex"), num_buckets=4,
        ).to_pandas()
        want = pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t", kind="mergesort"),
            on="t", by="u", direction="backward", suffixes=("", "_r"),
        ).dropna(subset=["mark"])
        assert len(got) == len(want)
        g = got.sort_values("ev").reset_index(drop=True)
        w = want.sort_values("ev").reset_index(drop=True)
        assert (g.mark.to_numpy() == w.mark.to_numpy()).all()


class TestBloomPrune:
    def test_bloom_join_matches_plain(self, ray_session, tmp_path):
        """Selective right side: bloom-pruned inner join must equal the
        unpruned join exactly (false positives only add exchange rows,
        never results)."""
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        rng = np.random.default_rng(31)
        left = pd.DataFrame({"k": rng.integers(0, 100_000, 20_000),
                             "x": rng.integers(0, 9, 20_000)})
        right = pd.DataFrame({"k": rng.choice(100_000, 50, replace=False),
                              "y": np.arange(50)})
        plain = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", exchange_dir=str(tmp_path / "p"),
                          num_buckets=4).to_pandas()
        pruned = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", exchange_dir=str(tmp_path / "b"),
                           num_buckets=4, bloom_prune=True).to_pandas()
        key = ["k", "x", "y"]
        a = plain.sort_values(key).reset_index(drop=True)
        b = pruned.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a[key].to_numpy() == b[key].to_numpy()).all()


class TestHashSemiAnti:
    def test_semi_anti_match_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides(500)
        right = right[right.k % 3 == 0]  # membership set with gaps
        lds = rd.from_pandas(left).repartition(4)
        rds = rd.from_pandas(right).repartition(2)
        semi = hash_join(lds, rds, on="k", how="semi",
                         exchange_dir=str(tmp_path / "s"), num_buckets=8).to_pandas()
        anti = hash_join(lds, rds, on="k", how="anti",
                         exchange_dir=str(tmp_path / "a"), num_buckets=8).to_pandas()
        member = left.k.isin(set(right.k))
        assert list(semi.columns) == ["k", "x"]  # no right columns
        assert len(semi) == int(member.sum()) > 0
        assert len(anti) == int((~member).sum()) > 0
        assert semi.k.isin(set(right.k)).all()
        assert (~anti.k.isin(set(right.k))).all()
        # semi/anti never multiply left rows on duplicate right keys
        dup_right = pd.concat([right, right])
        semi2 = hash_join(lds, rd.from_pandas(dup_right), on="k", how="semi",
                          exchange_dir=str(tmp_path / "s2"), num_buckets=8).to_pandas()
        assert len(semi2) == len(semi)

    def test_anti_with_empty_right(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides(100)
        anti = hash_join(
            rd.from_pandas(left), rd.from_pandas(right.iloc[:0]), on="k",
            how="anti", exchange_dir=str(tmp_path / "e"), num_buckets=4,
        ).to_pandas()
        assert len(anti) == len(left)


class TestHashMark:
    """how="mark": EXISTS flag per left row — one exchange answers both
    the semi and anti questions; duplicate right keys never multiply."""

    def test_mark_matches_membership(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides(500)
        right = right[right.k % 3 == 0]
        lds = rd.from_pandas(left).repartition(4)
        # duplicate right rows on purpose: per-bucket re-dedup must keep
        # left row counts intact under the left-outer implementation
        rds = rd.from_pandas(pd.concat([right, right])).repartition(3)
        got = hash_join(lds, rds, on="k", how="mark",
                        exchange_dir=str(tmp_path / "m"),
                        num_buckets=8).to_pandas()
        assert len(got) == len(left)
        assert set(got.columns) == {"k", "x", "_mark"}
        member = got.k.isin(set(right.k))
        assert (got["_mark"].astype(bool) == member).all()
        assert got["_mark"].sum() > 0 and (got["_mark"] == 0).sum() > 0

    def test_mark_empty_right(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left, right = _sides(100)
        got = hash_join(
            rd.from_pandas(left), rd.from_pandas(right.iloc[:0]), on="k",
            how="mark", exchange_dir=str(tmp_path / "e"), num_buckets=4,
        ).to_pandas()
        assert len(got) == len(left)
        assert (got["_mark"] == 0).all()

    def test_mark_partial_fn_fused(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        left = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "g": list("aabbcc")})
        right = pd.DataFrame({"k": [1, 3]})

        def part(j: pa.Table) -> pa.Table:
            g = j.group_by(["g"]).aggregate([("_mark", "sum")])
            return pa.table({"g": g["g"], "m": g["_mark_sum"]})

        got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", how="mark",
                        exchange_dir=str(tmp_path / "p"), num_buckets=4,
                        partial_fn=part).to_pandas()
        agg = got.groupby("g")["m"].sum()
        # rows: (1,a)(1,a)(2,b)(3,b)(3,c)(3,c); k∈{1,3} marked
        assert agg.to_dict() == {"a": 2, "b": 1, "c": 2}


class TestIntervalJoin:
    def _join(self, tmp_path, left, right, **kw):
        import ray.data as rd

        from guac_ray.functions.joins import interval_join

        return interval_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="u", left_start="s", left_end="e",
            right_start="s", right_end="e",
            exchange_dir=str(tmp_path / "ivx"), num_buckets=2, **kw,
        ).to_pandas()

    def test_overlap_touch_contain_disjoint(self, ray_session, tmp_path):
        left = pd.DataFrame({"u": [1, 1, 1, 1], "s": [0, 0, 100, 200],
                             "e": [10, 10, 150, 210], "lid": [0, 1, 2, 3]})
        right = pd.DataFrame({
            "u": [1, 1, 1, 1, 1],
            "s": [10, 11, 110, 90, 500],   # touch / gap-1 / contained /
            "e": [20, 20, 120, 400, 600],  # spanning / disjoint
            "rid": [0, 1, 2, 3, 4]})
        got = self._join(tmp_path, left, right)
        pairs = set(zip(got.lid, got.rid))
        # lid0/1 [0,10]: touches rid0 at 10 (inclusive), NOT rid1 (s=11)
        # lid2 [100,150]: contains rid2, overlapped by spanning rid3
        # lid3 [200,210]: inside rid3's [90,400]
        assert pairs == {(0, 0), (1, 0), (2, 2), (2, 3), (3, 3)}

    def test_matches_sql_reference(self, ray_session, tmp_path):
        import duckdb

        rng = np.random.default_rng(7)
        n_l, n_r = 300, 400
        left = pd.DataFrame({
            "u": rng.integers(0, 20, n_l),
            "s": rng.integers(0, 10_000, n_l).astype("int64"),
            "lid": np.arange(n_l)})
        left["e"] = left.s + rng.integers(0, 500, n_l)
        right = pd.DataFrame({
            "u": rng.integers(0, 20, n_r),
            "s": rng.integers(0, 10_000, n_r).astype("int64"),
            "rid": np.arange(n_r)})
        # include one GIANT interval to exercise the maxlen window
        right["e"] = right.s + rng.integers(0, 300, n_r)
        right.loc[0, "e"] = right.loc[0, "s"] + 9_999
        got = self._join(tmp_path, left, right)
        lt, rt = left, right  # duckdb: left/right are reserved words
        want = duckdb.sql(
            "SELECT lid, rid FROM lt JOIN rt ON lt.u = rt.u "
            "AND lt.s <= rt.e AND rt.s <= lt.e").df()
        assert set(zip(got.lid, got.rid)) == set(zip(want.lid, want.rid))

    def test_key_isolation_and_datetimes(self, ray_session, tmp_path):
        t0 = pd.Timestamp("2024-05-01")
        left = pd.DataFrame({
            "u": [1, 2], "s": [t0, t0], "e": [t0 + pd.Timedelta("1h")] * 2,
            "lid": [0, 1]})
        right = pd.DataFrame({
            "u": [2], "s": [t0 + pd.Timedelta("30min")],
            "e": [t0 + pd.Timedelta("2h")], "rid": [0]})
        got = self._join(tmp_path, left, right)
        assert set(zip(got.lid, got.rid)) == {(1, 0)}


class TestAsofLeftJoin:
    def _sides(self):
        rng = np.random.default_rng(13)
        left = pd.DataFrame({
            "u": rng.integers(0, 12, 200),
            "t": rng.integers(0, 1000, 200).astype("int64"),
            "lid": np.arange(200)})
        right = pd.DataFrame({
            "u": rng.integers(0, 9, 80),   # keys 9-11 left-only
            "t": rng.integers(0, 1000, 80).astype("int64"),
            "v": np.arange(80)})
        return left, right

    def test_left_matches_duckdb_asof_left(self, ray_session, tmp_path):
        import duckdb

        import ray.data as rd

        from guac_ray.functions.joins import asof_join

        lt, rt = self._sides()
        got = asof_join(rd.from_pandas(lt), rd.from_pandas(rt),
                        by="u", on="t",
                        exchange_dir=str(tmp_path / "ax"),
                        num_buckets=4, how="left").to_pandas()
        want = duckdb.sql(
            "SELECT lt.lid, rt.v FROM lt ASOF LEFT JOIN rt "
            "ON lt.u = rt.u AND lt.t >= rt.t").df()
        assert len(got) == len(lt) == len(want)
        g = {(int(r.lid), None if pd.isna(r.v) else int(r.v))
             for r in got.itertuples()}
        w = {(int(r.lid), None if pd.isna(r.v) else int(r.v))
             for r in want.itertuples()}
        assert g == w

    def test_inner_unchanged_and_validation(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import asof_join

        lt, rt = self._sides()
        inner = asof_join(rd.from_pandas(lt), rd.from_pandas(rt),
                          by="u", on="t",
                          exchange_dir=str(tmp_path / "ai"),
                          num_buckets=4).to_pandas()
        assert inner.v.notna().all() and len(inner) < len(lt)
        with pytest.raises(ValueError):
            asof_join(rd.from_pandas(lt), rd.from_pandas(rt), by="u",
                      on="t", exchange_dir=str(tmp_path / "ae"), how="outer")

    def test_left_with_entirely_empty_right(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import asof_join

        lt, rt = self._sides()
        got = asof_join(rd.from_pandas(lt), rd.from_pandas(rt.iloc[0:0]),
                        by="u", on="t",
                        exchange_dir=str(tmp_path / "ae2"),
                        num_buckets=4, how="left").to_pandas()
        assert len(got) == len(lt)  # every left row survives unmatched


class TestSkewJoin:
    """Salted inner join: output identical to the unsalted join on a
    planted-whale key; hot build rows actually scatter across salts."""

    def test_matches_plain_join_on_planted_skew(self, ray_session,
                                                tmp_path):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from guac_ray.functions.joins import hash_join, skew_join

        rng = np.random.RandomState(7)
        # right: whale key 0 owns 5000 rows; 50 cold keys own ~20 each
        rk = np.concatenate([np.zeros(5000, dtype="int64"),
                             rng.randint(1, 51, 1000).astype("int64")])
        right = pd.DataFrame({"k": rk, "rv": np.arange(len(rk),
                                                       dtype="int64")})
        # left: 40 whale rows + cold rows (some matching, some not)
        lk = np.concatenate([np.zeros(40, dtype="int64"),
                             rng.randint(1, 80, 200).astype("int64")])
        left = pd.DataFrame({"k": lk, "lv": np.arange(len(lk),
                                                      dtype="int64")})

        def norm(ds):
            df = ds.to_pandas()
            return (df[sorted(df.columns)]
                    .sort_values(sorted(df.columns))
                    .reset_index(drop=True))

        want = norm(hash_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(4), on="k",
            exchange_dir=str(tmp_path / "plain"), num_buckets=4))
        got = norm(skew_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(4), on="k",
            hot_keys=[0], salt=4,
            exchange_dir=str(tmp_path / "salted"), num_buckets=4))
        # whale contributes 5000 x 40 = 200k of the rows
        assert len(want) > 200_000
        pd.testing.assert_frame_equal(got, want)

    def test_salt_guard(self, ray_session, tmp_path):
        import pandas as pd
        import pytest
        import ray.data as rd

        from guac_ray.functions.joins import skew_join

        df = pd.DataFrame({"k": [1], "v": [1]})
        with pytest.raises(ValueError, match="salt must be >= 2"):
            skew_join(rd.from_pandas(df), rd.from_pandas(df), "k",
                      hot_keys=[1], salt=1,
                      exchange_dir=str(tmp_path / "x"))


class TestReviewHardening:
    def test_interval_join_float_ordinates_no_truncation(
            self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import interval_join

        l = pd.DataFrame({"k": [1], "s": [10.0], "e": [11.0]})
        r = pd.DataFrame({"k": [1], "s2": [7.5], "e2": [10.2]})
        # right length 2.7: an int() window (2) would exclude this
        # true overlap
        out = interval_join(
            rd.from_pandas(l), rd.from_pandas(r), by="k",
            left_start="s", left_end="e",
            right_start="s2", right_end="e2",
            exchange_dir=str(tmp_path / "ij")).to_pandas()
        assert len(out) == 1

    def test_float_join_key_refused(self, ray_session, tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        l = pd.DataFrame({"k": [1.0, 2.0], "a": [1, 2]})
        r = pd.DataFrame({"k": [1, 2], "b": [3, 4]})
        with pytest.raises(Exception, match="float"):
            hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      exchange_dir=str(tmp_path / "hj")).to_pandas()

    def test_disjoint_keys_keep_joined_schema(self, ray_session,
                                              tmp_path):
        import ray.data as rd

        from guac_ray.functions.joins import hash_join

        l = pd.DataFrame({"k": [1, 2], "a": [10, 20]})
        r = pd.DataFrame({"k": [3, 4], "b": ["x", "y"]})
        out = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                        exchange_dir=str(tmp_path / "hj2"))
        sch = out.schema()
        assert sch is not None and set(sch.names) >= {"k", "a", "b"}
        assert out.count() == 0

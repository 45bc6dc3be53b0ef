"""Stream-shaped operators over event logs (SURVEY.md §2.10 mapping).

Ray Data has no event-time windows/watermarks; the reference has no
windows either (NATS work queue, at-most-once). For stream-shaped
workloads the engine treats the log as a partitioned table:

  - tumbling windows = truncated-timestamp GROUP BY (suite.events_hourly)
  - session windows  = gap-based sessionization below: hash-cluster by
    key, sort within cluster, vectorized gap/cumsum per key

Ordering assumption: within one coarse bucket all events of a user are
present (guaranteed by hash-clustering on user), and sessions never span
buckets. Late data = re-run the affected partitions (batch semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas

from ray.data import Dataset

from guac_ray.stages.assemble import stable_hash

__all__ = ["sessionize", "coalesce_intervals", "daily_streaks",
           "cohort_retention", "rolling_active_users"]


def sessionize(
    events: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_minutes: int = 30,
    num_buckets: int = 16,
) -> Dataset:
    """Gap-based session windows per user → one row per session:
    ``(user_id, session_start, n, value_cents)``.

    A new session starts when the gap to the previous event (ordered by
    (ts, event_id) — the deterministic tie-break) exceeds ``gap_minutes``.
    The shuffle is a coarse user-hash bucket groupby; the per-user
    windowing is vectorized pandas inside each bucket.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def bucket(df: pd.DataFrame) -> pa.Table:
        df = df[[user_col, ts_col, id_col, value_col]].copy()
        df["_b"] = (stable_hash(df, [user_col]) % num_buckets).astype("int64")
        return table_from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        prev_ts = g.groupby(user_col, sort=False)[ts_col].shift()
        new_sess = prev_ts.isna() | ((g[ts_col] - prev_ts) > gap)
        g["_sess"] = new_sess.cumsum()  # globally increasing → unique per (user, session)
        cents = np.floor(g[value_col].to_numpy() * 100 + 0.5).astype("int64")
        g["_vc"] = cents
        out = (
            g.groupby([user_col, "_sess"], sort=False)
            .agg(
                session_start=(ts_col, "min"),
                n=(ts_col, "size"),
                value_cents=("_vc", "sum"),
            )
            .reset_index()
            .drop(columns=["_sess"])
        )
        out["n"] = out["n"].astype("int64")
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        return table_from_pandas(out, preserve_index=False)

    return (
        events.map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )


def coalesce_intervals(
    ds: Dataset,
    by: list[str] | str,
    start_col: str,
    end_col: str,
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Merge overlapping-or-touching [start, end] intervals per key —
    the OTHER islands operator (``sessionize`` groups POINT events by
    gap; this coalesces SPANS by overlap: availability windows, call
    legs, maintenance intervals). Returns one row per merged island:
    ``by…, start, end (min/max over the island), n_merged``.

    Semantics match the classic SQL gaps-and-islands window idiom: rows
    sorted by (start, end) per key; a row opens a new island iff its
    start is STRICTLY greater than the running max of all previous
    ends (touching intervals [1,5],[5,9] merge). Works for any ordered
    numeric/timestamp column pair; island detection is vectorized
    cummax/cumsum inside each hash bucket of the filesystem exchange —
    one sort per bucket, nothing driver-sized."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    import ray.data as rd

    by = [by] if isinstance(by, str) else list(by)

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df[by + [start_col, end_col]].copy()
        df["_bucket"] = (stable_hash(df, by) % num_buckets).astype("int64")
        return table_from_pandas(df, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(by + [start_col, end_col],
                                       kind="mergesort")
        g = df.groupby(by, sort=False, dropna=False)
        pmax = g[end_col].cummax()
        df["_pmax"] = pmax
        prev_max = df.groupby(by, sort=False, dropna=False)["_pmax"].shift()
        new_isl = prev_max.isna() | (df[start_col] > prev_max)
        df["_gid"] = new_isl.cumsum()  # global cumsum: unique per island
        out = (df.groupby(by + ["_gid"], sort=False, dropna=False)
               .agg(start=(start_col, "min"), end=(end_col, "max"),
                    n_merged=(start_col, "size"))
               .reset_index().drop(columns=["_gid"]))
        out["n_merged"] = out["n_merged"].astype("int64")
        return table_from_pandas(out, preserve_index=False)

    out = fs_exchange_reduce(
        ds.map_batches(add_bucket, batch_format="pandas"),
        exchange_base or default_exchange("intervals"), reduce_fn)
    if out is None:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}

        def at(c, fallback):
            ty = types.get(c)
            return ty if isinstance(ty, pa.DataType) else fallback

        return rd.from_arrow(pa.schema(
            [(c, at(c, pa.string())) for c in by]
            + [("start", at(start_col, pa.int64())),
               ("end", at(end_col, pa.int64())),
               ("n_merged", pa.int64())]).empty_table())
    return out


def daily_streaks(
    events: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Consecutive-active-day streaks per user — the THIRD islands
    operator (``sessionize`` gap-groups point events, ``coalesce_
    intervals`` merges spans; this runs the calendar-day variant
    engagement/retention analytics call "streaks"): one row per user
    with ``active_days`` (distinct calendar days with ≥1 event),
    ``longest_streak`` (max run of consecutive days) and ``n_streaks``
    (number of maximal runs). All int64 counts — exact on any engine.

    Semantics match the classic SQL gaps-and-islands idiom: distinct
    (user, day) rows ranked by day per user; ``day − row_number`` is
    constant exactly within a consecutive run, so island = GROUP BY
    that anchor. Shape: batches project to (user, epoch-day) pairs and
    pre-dedup IN-BATCH (the classic combiner — the exchange ships at
    most one row per user-day per batch, never event-scale); ONE
    user-hash fs exchange co-locates each user, where the in-bucket
    distinct IS the global distinct and one vectorized
    sort + cumcount + two groupbys emit the per-user row. Nothing
    driver-sized; buckets scale with the cluster."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce

    import ray.data as rd

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            user_col: df[user_col],
            # epoch-day floor; matches DuckDB CAST(ts AS DATE) for any
            # post-1970 timestamp (both floor toward -inf)
            "_day": df[ts_col].to_numpy().astype("datetime64[D]")
                              .astype("int64"),
        }).drop_duplicates()
        out["_bucket"] = (stable_hash(out, [user_col])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()[[user_col, "_day"]]
              .drop_duplicates()
              .sort_values([user_col, "_day"], kind="mergesort"))
        rn = df.groupby(user_col, sort=False).cumcount()
        df["_anchor"] = df["_day"].to_numpy() - rn.to_numpy()
        isl = (df.groupby([user_col, "_anchor"], sort=False)
               .size().rename("len").reset_index())
        out = (isl.groupby(user_col, sort=False)
               .agg(active_days=("len", "sum"),
                    longest_streak=("len", "max"),
                    n_streaks=("len", "size"))
               .reset_index())
        for c in ("active_days", "longest_streak", "n_streaks"):
            out[c] = out[c].astype("int64")
        return table_from_pandas(out, preserve_index=False)

    out = fs_exchange_reduce(
        events.select_columns([user_col, ts_col]).map_batches(
            add_bucket, batch_format="pandas"),
        exchange_base or default_exchange("streaks"), reduce_fn)
    if out is None:
        sch = events.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}
        uty = types.get(user_col)
        uty = uty if isinstance(uty, pa.DataType) else pa.int64()
        return rd.from_arrow(pa.schema(
            [(user_col, uty), ("active_days", pa.int64()),
             ("longest_streak", pa.int64()),
             ("n_streaks", pa.int64())]).empty_table())
    return out


def cohort_retention(
    events: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 1,
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Cohort retention matrix — the cohort analysis every engagement
    dashboard runs: users are cohorted by their FIRST active period
    (``cohort_week`` = min epoch-day // period_days over all their
    activity; period_days=7 for weekly, 1 for daily cohorts), and each
    cell counts how many of that cohort were active ``week_offset``
    periods later. All int64 — exact on any engine; offset 0 row =
    cohort size, so retention % is a downstream division the caller
    owns.

    Shape: batches project to distinct (user, epoch-week) pairs
    IN-BATCH (the combiner — the exchange ships at most one row per
    user-week per block, never event-scale); ONE user-hash fs exchange
    co-locates each user's full history, so the in-bucket min IS the
    global cohort week and each bucket emits exact PARTIAL cell counts
    (a user lives in exactly one bucket, so partials are disjoint user
    sets); the cross-bucket combine is the standard ``grouped_agg``
    over a cells × buckets table — driver never touches user-scale
    data. Matrix cells are bounded by weeks², independent of users."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce
    from guac_ray.stages.groupagg import grouped_agg

    import ray.data as rd

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            user_col: df[user_col],
            # epoch-week floor; int64 // floors, matching the SQL
            # datediff-from-1970 // 7 for any post-1970 timestamp
            "_week": df[ts_col].to_numpy().astype("datetime64[D]")
                               .astype("int64") // period_days,
        }).drop_duplicates()
        out["_bucket"] = (stable_hash(out, [user_col])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[[user_col, "_week"]].drop_duplicates()
        coh = df.groupby(user_col, sort=False)["_week"].transform("min")
        cells = (pd.DataFrame({
            "cohort_week": coh.to_numpy(),
            "week_offset": df["_week"].to_numpy() - coh.to_numpy(),
        }).groupby(["cohort_week", "week_offset"], sort=False)
          .size().rename("_n").reset_index())
        cells["_n"] = cells["_n"].astype("int64")
        return table_from_pandas(cells, preserve_index=False)

    base = exchange_base or default_exchange("cohort")
    partials = fs_exchange_reduce(
        events.select_columns([user_col, ts_col]).map_batches(
            add_bucket, batch_format="pandas"),
        base + "_p1", reduce_fn)
    if partials is None:
        return rd.from_arrow(pa.schema(
            [("cohort_week", pa.int64()), ("week_offset", pa.int64()),
             ("n_users", pa.int64())]).empty_table())
    return grouped_agg(partials, ["cohort_week", "week_offset"],
                       {"n_users": ("_n", "sum")},
                       num_buckets=max(4, num_buckets // 4))


def rolling_active_users(
    events: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """DAU + trailing-window distinct active users per day — the
    DAU/WAU dashboard pair, and the engine's windowed COUNT(DISTINCT)
    operator (plain windows can't express it: distinct is not
    decomposable over frames). One row per OBSERVED day (≥1 event)
    with ``dau`` (distinct users that day) and ``wau`` (distinct users
    active in the trailing ``window_days`` window ending that day),
    both exact int64.

    Distribution: a user is active-in-window on day e iff e lies in
    the union of [d, d+window−1] over their active days — so per user
    the answer is INTERVAL COVERAGE, which distributes where
    per-day distinct does not. Batches emit distinct (user, epoch-day)
    pairs in-batch (combiner); ONE user-hash fs exchange co-locates
    each user, where the in-bucket gap≤window−1 islands pass merges
    coverage intervals and vectorized repeat/arange expansion emits
    per-day PARTIAL counts (≤ window × user-day pairs rows, never
    event-scale; disjoint across buckets since a user lives in one);
    the standard ``grouped_agg`` sums partials per day (calendar-day
    cardinality) and a final filter keeps observed days. No driver
    pass anywhere."""
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce
    from guac_ray.stages.groupagg import grouped_agg

    import ray.data as rd

    w = int(window_days)
    if w < 1:
        raise ValueError("window_days must be >= 1")

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            user_col: df[user_col],
            "_day": df[ts_col].to_numpy().astype("datetime64[D]")
                              .astype("int64"),
        }).drop_duplicates()
        out["_bucket"] = (stable_hash(out, [user_col])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()[[user_col, "_day"]]
              .drop_duplicates()
              .sort_values([user_col, "_day"], kind="mergesort"))
        day = df["_day"].to_numpy()
        prev = df.groupby(user_col, sort=False)["_day"].shift()
        # coverage islands: [d, d+w-1] unions merge iff gap <= w-1
        new_iv = (prev.isna() | ((df["_day"] - prev) > (w - 1))).to_numpy()
        gid = np.cumsum(new_iv)  # unique island id across users
        # per-island [start, end+w-1] coverage span
        starts = df.groupby(gid, sort=True)["_day"].min().to_numpy()
        ends = df.groupby(gid, sort=True)["_day"].max().to_numpy() + (w - 1)
        lens = ends - starts + 1
        # vectorized expansion: every covered day of every island
        offs = np.arange(lens.sum()) - np.repeat(
            np.cumsum(lens) - lens, lens)
        cov_days = np.repeat(starts, lens) + offs
        cov = np.unique(cov_days, return_counts=True)
        act = np.unique(day, return_counts=True)
        out = (pd.DataFrame({"epoch_day": cov[0], "_wau": cov[1]})
               .merge(pd.DataFrame({"epoch_day": act[0], "_dau": act[1]}),
                      on="epoch_day", how="outer")
               .fillna(0))
        for c in ("_wau", "_dau"):
            out[c] = out[c].astype("int64")
        return table_from_pandas(out, preserve_index=False)

    base = exchange_base or default_exchange("rollact")
    partials = fs_exchange_reduce(
        events.select_columns([user_col, ts_col]).map_batches(
            add_bucket, batch_format="pandas"),
        base + "_p1", reduce_fn)
    empty = pa.schema([("epoch_day", pa.int64()), ("dau", pa.int64()),
                       ("wau", pa.int64())]).empty_table()
    if partials is None:
        return rd.from_arrow(empty)
    agg = grouped_agg(partials, ["epoch_day"],
                      {"dau": ("_dau", "sum"), "wau": ("_wau", "sum")},
                      num_buckets=max(4, num_buckets // 4))

    def observed_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kept = t.filter(pc.greater(t["dau"], 0))
        return kept.select(["epoch_day", "dau", "wau"]) if kept.num_rows \
            else empty
    return agg.map_batches(observed_only, batch_format="pyarrow")

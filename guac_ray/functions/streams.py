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
           "cohort_retention", "rolling_active_users",
           "gap_quantiles", "time_weighted_mean", "running_distinct",
           "scd2_intervals", "cdc_merge", "debounce", "ewma"]


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
        g = g[g[ts_col].notna()]  # NaT cannot be gap-ordered (INT64_MIN)
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        # dropna=False: SQL GROUP BY keeps the NULL-user stream as ONE
        # group; the pandas default would silently delete those events
        prev_ts = g.groupby(user_col, sort=False,
                            dropna=False)[ts_col].shift()
        new_sess = prev_ts.isna() | ((g[ts_col] - prev_ts) > gap)
        g["_sess"] = new_sess.cumsum()  # globally increasing → unique per (user, session)
        # SUM skips NULL values (SQL semantics): a null value must not
        # become INT64_MIN through the NaN floor-cast; an all-null
        # session reads 0 (documented divergence from SQL's NULL)
        vals = g[value_col].to_numpy()
        ok = ~pd.isna(vals)
        cents = np.zeros(len(vals), dtype="int64")
        cents[ok] = np.floor(
            vals[ok].astype("float64") * 100 + 0.5).astype("int64")
        g["_vc"] = cents
        out = (
            g.groupby([user_col, "_sess"], sort=False, dropna=False)
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
        from guac_ray.arrowutil import arrow_type_of

        sch = ds.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}

        def at(c, fallback):
            ty = arrow_type_of(types.get(c))
            return ty if ty is not None else fallback

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
        df = df[df[ts_col].notna()]  # NaT day = INT64_MIN: phantom epoch
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
        # dropna=False throughout: SQL GROUP BY keeps the NULL-user
        # stream as one group; the pandas default silently deleted it
        rn = df.groupby(user_col, sort=False, dropna=False).cumcount()
        df["_anchor"] = df["_day"].to_numpy() - rn.to_numpy()
        isl = (df.groupby([user_col, "_anchor"], sort=False,
                          dropna=False)
               .size().rename("len").reset_index())
        out = (isl.groupby(user_col, sort=False, dropna=False)
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
        from guac_ray.arrowutil import arrow_type_of

        sch = events.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}
        uty = arrow_type_of(types.get(user_col)) or pa.int64()
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
        df = df[df[ts_col].notna()]  # NaT week = INT64_MIN: phantom cohort
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

    if period_days < 1:
        # numpy's int // 0 is 0 with only a RuntimeWarning — a config
        # typo would yield a plausible one-cell all-zero matrix
        raise ValueError("cohort_retention: period_days must be >= 1")

    def reduce_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[[user_col, "_week"]].drop_duplicates()
        # dropna=False: SQL GROUP BY keeps the NULL-user stream as one
        # group (the sessionize contract)
        coh = df.groupby(user_col, sort=False,
                         dropna=False)["_week"].transform("min")
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
        df = df[df[ts_col].notna()]  # NaT day = INT64_MIN: phantom epoch
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
        prev = df.groupby(user_col, sort=False,
                          dropna=False)["_day"].shift()
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

def _per_user_stream(
    events: Dataset,
    user_col: str,
    ts_col: str,
    order_col: str,
    extra_cols: list[str],
    exchange_base: str,
    num_buckets: int,
    reduce_fn,
):
    """Shared shell for the ordered per-user stream reductions below:
    project the narrow (user, ts_us, order, *extra) columns, hash-bucket
    by user (a user lives in exactly ONE bucket, so in-bucket order IS
    the user's global order), run ``reduce_fn`` per bucket. The exchange
    ships event-scale rows — unavoidable for order-sensitive reductions
    (same contract as ``sessionize``) — but only 3–4 int64 columns of
    them; buckets scale with the cluster, nothing is driver-sized."""
    from guac_ray.stages.assemble import fs_exchange_reduce

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        # a NULL timestamp cannot be ordered: NaT.astype(int64) is
        # INT64_MIN, which would make the null row the user's "first"
        # event and corrupt every downstream span/gap/debounce — drop
        # such rows (SQL: WHERE ts IS NOT NULL)
        df = df[df[ts_col].notna()]
        out = pd.DataFrame({
            user_col: df[user_col],
            "_ts": df[ts_col].to_numpy().astype("datetime64[us]")
                             .astype("int64"),
            "_ord": _as_int64_strict(df[order_col].to_numpy(),
                                     "_per_user_stream", order_col),
        })
        for c in extra_cols:
            out[c] = df[c].to_numpy()
        out["_bucket"] = (stable_hash(out, [user_col])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    cols = [user_col, ts_col, order_col] + extra_cols
    return fs_exchange_reduce(
        events.select_columns(cols).map_batches(
            add_bucket, batch_format="pandas"),
        exchange_base, reduce_fn)


def _disc_rank_idx(cnt: np.ndarray, num: int, den: int) -> np.ndarray:
    """0-based per-group element index of the exact discrete quantile
    p = num/den over a group of ``cnt`` sorted values — DuckDB
    ``quantile_disc`` semantics (rank ``ceil(p*n) - 1``) computed in
    EXACT integer arithmetic: ceil(num*n/den) - 1 = (num*n + den-1)//den
    - 1, no float rounding anywhere."""
    return (num * cnt + den - 1) // den - 1


def gap_quantiles(
    events: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Per-user inter-arrival-gap distribution — the engagement-cadence
    operator (how often does each user come back), and the engine's
    HIGH-CARDINALITY grouped EXACT quantile: one row per user with ≥2
    events carrying ``n_gaps``, exact discrete p50/p90 of the gap (µs,
    DuckDB ``quantile_disc`` rank semantics) and ``max_gap_us`` — all
    int64, exact on any engine. The existing quantile operators
    (``exact_quantiles``, events_mad) group by LOW-cardinality keys and
    route a value histogram through the exchange; that shape is wrong
    when groups ≈ users, so this one hash-clusters users instead and
    computes each user's quantile from its own sorted gap array.

    Order is (ts, ``order_col``) — the unique tie-break makes the gap
    multiset deterministic under any partitioning. Shape: ONE user-hash
    fs exchange of 3 int64 columns (event-scale, as any order-sensitive
    reduction must be — the ``sessionize`` contract); per bucket one
    lexsort + diff + np.unique group-offset pass computes every user's
    quantiles with NO per-user Python loop. Buckets scale with the
    cluster; the driver never touches event-scale data."""
    from guac_ray.functions.joins import default_exchange

    import ray.data as rd

    def reduce_fn(t: pa.Table) -> pa.Table:
        u = _as_int64_strict(
            t[user_col].to_numpy(zero_copy_only=False),
            "per-user stream", user_col)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        o = np.lexsort((od, ts, u))
        u, ts = u[o], ts[o]
        same = u[1:] == u[:-1]
        gu, gv = u[1:][same], (ts[1:] - ts[:-1])[same]
        if gu.size == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64()),
                             "p50_gap_us": pa.array([], pa.int64()),
                             "p90_gap_us": pa.array([], pa.int64()),
                             "max_gap_us": pa.array([], pa.int64())})
        # sort gaps by (user, value); group offsets give exact
        # per-user discrete quantiles as pure indexing
        o2 = np.lexsort((gv, gu))
        gu, gv = gu[o2], gv[o2]
        uniq, start, cnt = np.unique(gu, return_index=True,
                                     return_counts=True)
        return pa.table({
            user_col: uniq,
            "n_gaps": cnt.astype("int64"),
            "p50_gap_us": gv[start + _disc_rank_idx(cnt, 1, 2)],
            "p90_gap_us": gv[start + _disc_rank_idx(cnt, 9, 10)],
            "max_gap_us": gv[start + cnt - 1],
        })

    out = _per_user_stream(
        events, user_col, ts_col, order_col, [],
        exchange_base or default_exchange("gapq"), num_buckets, reduce_fn)
    if out is None:
        return rd.from_arrow(pa.schema(
            [(user_col, pa.int64()), ("n_gaps", pa.int64()),
             ("p50_gap_us", pa.int64()), ("p90_gap_us", pa.int64()),
             ("max_gap_us", pa.int64())]).empty_table())
    return out


def time_weighted_mean(
    events: Dataset,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Per-user TIME-weighted average value (TWAP) — each event's value
    held until the user's next event; the metric every pricing/telemetry
    store resamples by. Values enter as exact cents
    (``floor(value*100 + 0.5)``, the house fixed-point convention) and
    every output is int64: ``n_spans`` (weighted events — the last event
    per user carries no span and is excluded, so single-event users emit
    nothing), ``dur_us`` (Σ span), ``vw_sum`` (Σ cents × span-µs) and
    ``twap_cents = vw_sum // dur_us`` — pure int64 floor division, exact
    on any engine; ``vw_sum % dur_us`` is recoverable from the two
    columns so no precision is lost. int64 bound: vw_sum ≤ max-cents ×
    total-span-µs per user (~1.5e17 on this corpus); numpy int64
    multiplication WRAPS silently, so the per-bucket bound is checked
    explicitly and raises — corpora with larger value × span products
    drop the cents scale to units.

    Same shape as ``gap_quantiles``: one user-hash fs exchange of 4
    int64 columns, per-bucket lexsort + shifted-difference, no per-user
    Python loop."""
    from guac_ray.functions.joins import default_exchange

    import ray.data as rd

    def reduce_fn(t: pa.Table) -> pa.Table:
        u = _as_int64_strict(
            t[user_col].to_numpy(zero_copy_only=False),
            "per-user stream", user_col)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        vc = t["_vc"].to_numpy(zero_copy_only=False)
        o = np.lexsort((od, ts, u))
        u, ts, vc = u[o], ts[o], vc[o]
        same = u[1:] == u[:-1]
        su, dt, sv = u[:-1][same], (ts[1:] - ts[:-1])[same], vc[:-1][same]
        if su.size == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "n_spans": pa.array([], pa.int64()),
                             "dur_us": pa.array([], pa.int64()),
                             "vw_sum": pa.array([], pa.int64()),
                             "twap_cents": pa.array([], pa.int64())})
        # numpy int64 multiply (and the later per-user sum) wrap
        # SILENTLY — enforce the documented bound loudly. The hazard is
        # PER USER (vw_sum is a per-user output): the float64 estimate
        # of each user's Σ|cents·span| dominates both every product in
        # it and the signed sum, so one per-user comparison covers both.
        # (A bucket-wide bound would false-positive: a bucket holds many
        # users, each individually in range.)
        df = pd.DataFrame({
            user_col: su, "_dt": dt, "_vd": sv * dt,
            "_va": np.abs(sv.astype(np.float64) * dt.astype(np.float64)),
        })
        g = (df.groupby(user_col, sort=False)
             .agg(n_spans=("_dt", "size"), dur_us=("_dt", "sum"),
                  vw_sum=("_vd", "sum"), _va=("_va", "sum"))
             .reset_index())
        if float(g["_va"].max()) >= 2.0 ** 62:
            raise ValueError(
                "time_weighted_mean: a user's cents x span-µs sum "
                "would overflow int64; rescale the value column "
                "(cents → units) or split the time range")
        g = g.drop(columns=["_va"])
        for c in ("n_spans", "dur_us", "vw_sum"):
            g[c] = g[c].astype("int64")
        # a zero-span user (every event at one instant) has NO defined
        # time-weighted mean — emit NULL, not the fabricated 0 that
        # numpy's warning-only 0//0 produces
        dur = g["dur_us"].to_numpy()
        tw = pd.array(g["vw_sum"].to_numpy() // np.maximum(dur, 1),
                      dtype="Int64")
        tw[dur == 0] = pd.NA
        g["twap_cents"] = tw
        return table_from_pandas(g, preserve_index=False)

    def with_cents(events: Dataset) -> Dataset:
        def add(df: pd.DataFrame) -> pd.DataFrame:
            # NULL values: the oracle's floor(NULL*100+0.5) is NULL and
            # the row drops out — mirroring that beats the warning-only
            # NaN cast, which would mint INT64_MIN cents and trip the
            # overflow guard on perfectly-scaled data
            df = df[df[value_col].notna()].copy()
            df["_vc"] = np.floor(
                df[value_col].to_numpy() * 100 + 0.5).astype("int64")
            return df
        return events.map_batches(add, batch_format="pandas")

    out = _per_user_stream(
        with_cents(events.select_columns(
            [user_col, ts_col, order_col, value_col])),
        user_col, ts_col, order_col, ["_vc"],
        exchange_base or default_exchange("twap"), num_buckets, reduce_fn)
    if out is None:
        return rd.from_arrow(pa.schema(
            [(user_col, pa.int64()), ("n_spans", pa.int64()),
             ("dur_us", pa.int64()), ("vw_sum", pa.int64()),
             ("twap_cents", pa.int64())]).empty_table())
    return out


def running_distinct(
    events: Dataset,
    value_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """RUNNING distinct-value count per user — after each event, how
    many distinct ``value_col`` values has this user produced so far
    (the "features adopted by now" curve every activation funnel
    plots). A windowed COUNT(DISTINCT) that plain window frames cannot
    express (distinct is not frame-decomposable — the same reason
    ``rolling_active_users`` exists); it distributes because
    first-occurrence flags CAN: flag each (user, value)'s first event
    (one extra lexsort), then the running count is a per-user cumsum
    of flags in (ts, order) order. One row per event:
    (user, order_col, n_distinct), all int64, exact on any engine.

    Same one-exchange per-user stream shape as ``gap_quantiles``; both
    passes are vectorized lexsorts + cumsum, no per-user Python."""
    from guac_ray.functions.joins import default_exchange

    import ray.data as rd

    def reduce_fn(t: pa.Table) -> pa.Table:
        u = _as_int64_strict(
            t[user_col].to_numpy(zero_copy_only=False),
            "per-user stream", user_col)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        val = t["_val"].to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             order_col: pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64())})
        # pass 1: first occurrence of each (user, value), by event
        # time. Values sort as FACTORIZED codes: a None in an object
        # array would TypeError inside np.lexsort, and SQL
        # COUNT(DISTINCT) ignores NULLs anyway — null rows keep their
        # output row but never increment the count (code -1 flags off)
        vcodes = pd.factorize(val)[0]          # NULL -> -1
        o2 = np.lexsort((od, ts, vcodes, u))
        first_sorted = np.ones(n, dtype=np.int64)
        first_sorted[1:] = ~((u[o2][1:] == u[o2][:-1])
                             & (vcodes[o2][1:] == vcodes[o2][:-1]))
        first_sorted &= (vcodes[o2] != -1).astype(np.int64)
        flag = np.empty(n, dtype=np.int64)
        flag[o2] = first_sorted
        # pass 2: per-user cumsum of flags in stream order
        o1 = np.lexsort((od, ts, u))
        f1, u1, od1 = flag[o1], u[o1], od[o1]
        cs = np.cumsum(f1)
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u1[1:] != u1[:-1]
        # cumsum value just BEFORE each user's first row, spread to rows
        base = np.where(new_user, cs - f1, 0)
        running = cs - np.maximum.accumulate(base)
        return pa.table({user_col: pa.array(u1),
                         order_col: pa.array(od1),
                         "n_distinct": pa.array(running)})

    def add_val(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_val"] = df[value_col]
        return df

    out = _per_user_stream(
        events.select_columns(
            [user_col, ts_col, order_col, value_col]).map_batches(
            add_val, batch_format="pandas"),
        user_col, ts_col, order_col, ["_val"],
        exchange_base or default_exchange("rundist"), num_buckets,
        reduce_fn)
    if out is None:
        return rd.from_arrow(pa.schema(
            [(user_col, pa.int64()), (order_col, pa.int64()),
             ("n_distinct", pa.int64())]).empty_table())
    return out



def _as_int64_strict(a, fn: str, name: str):
    """Refuse non-integer dtypes loudly (the grouped_robust_stats /
    shared-partitioner discipline): a float column — usually a pandas
    NULL-upcast accident — would truncate-merge distinct values (1.2
    and 1.9 → 1) and turn NaN into INT64_MIN, all silently."""
    if not np.issubdtype(a.dtype, np.integer):
        raise TypeError(
            f"{fn}: {name!r} must be integer (cents trick for floats; "
            f"drop NULL rows upstream), got {a.dtype}")
    return a.astype("int64")

def scd2_intervals(
    events: Dataset,
    value_col: str = "value_cents",
    key_cols: tuple[str, str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    order_col: str = "event_id",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """SCD-Type-2 validity intervals from a change log — the
    gaps-and-islands build every warehouse runs to turn an event
    stream into a slowly-changing dimension: per (user, type) key,
    consecutive runs of the SAME value compress into one row with
    ``valid_from_us`` (first observation), ``valid_to_us`` (start of
    the NEXT run, NULL while current — the half-open [from, to)
    convention) and ``n_obs`` (observations inside the run). A value
    that reverts to an earlier one opens a NEW interval — history is
    preserved, which is exactly what separates SCD2 from
    latest-per-key compaction (events_latest_per_user).

    ``value_col`` must already be int64 (the house cents convention —
    exact run-equality on doubles is not a cross-engine contract).
    Shape: the ``gap_quantiles`` contract — ONE user-hash fs exchange
    (a user lives in one bucket, so both its key groups and their
    global order are bucket-local) of 4 int64 columns + the type
    string; per bucket one lexsort, run starts from two shifted
    compares, every output column pure indexing off the start
    positions. No per-key Python loop; nothing driver-sized."""
    from guac_ray.functions.joins import default_exchange

    import ray.data as rd

    user_col, type_col = key_cols

    def reduce_fn(t: pa.Table) -> pa.Table:
        u = _as_int64_strict(
            t[user_col].to_numpy(zero_copy_only=False),
            "per-user stream", user_col)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        et = t["_et"].to_numpy(zero_copy_only=False)
        vc = t["_vc"].to_numpy(zero_copy_only=False).astype("int64")
        n = len(u)
        if n == 0:
            return _scd2_empty(user_col, type_col)
        # type sorts as FACTORIZED codes: a None in the object array
        # would TypeError in np.lexsort; SQL GROUP BY keeps the NULL
        # type as ONE group, which codes give for free (group ORDER is
        # irrelevant — the output Dataset is unordered)
        etc = pd.factorize(et, use_na_sentinel=False)[0]
        o = np.lexsort((od, ts, etc, u))
        u, ts, et, vc, etc = u[o], ts[o], et[o], vc[o], etc[o]
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = (u[1:] != u[:-1]) | (etc[1:] != etc[:-1])
        chg = new_grp.copy()
        chg[1:] |= vc[1:] != vc[:-1]
        starts = np.flatnonzero(chg)
        n_obs = np.diff(np.append(starts, n)).astype("int64")
        # valid_to = next run's first ts, when that run is in the SAME
        # key group (its start is not a group start); else open/NULL
        nxt = np.append(starts[1:], 0)
        closed = np.zeros(len(starts), dtype=bool)
        closed[:-1] = ~new_grp[starts[1:]]
        vto = np.where(closed, ts[nxt], 0).astype("int64")
        return pa.table({
            user_col: pa.array(u[starts]),
            type_col: pa.array(et[starts].astype(object), pa.string()),
            "value_cents": pa.array(vc[starts]),
            "valid_from_us": pa.array(ts[starts].astype("int64")),
            "valid_to_us": pa.array(vto, mask=~closed),
            "n_obs": pa.array(n_obs),
        })

    def _scd2_empty(ucol, tcol):
        return pa.schema(
            [(ucol, pa.int64()), (tcol, pa.string()),
             ("value_cents", pa.int64()), ("valid_from_us", pa.int64()),
             ("valid_to_us", pa.int64()), ("n_obs", pa.int64())]
        ).empty_table()

    def add_cols(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_et"] = df[type_col]
        df["_vc"] = _as_int64_strict(df[value_col].to_numpy(),
                                     "scd2_intervals", value_col)
        return df

    out = _per_user_stream(
        events.select_columns(
            [user_col, type_col, ts_col, order_col, value_col]
        ).map_batches(add_cols, batch_format="pandas"),
        user_col, ts_col, order_col, ["_et", "_vc"],
        exchange_base or default_exchange("scd2"), num_buckets,
        reduce_fn)
    if out is None:
        return rd.from_arrow(_scd2_empty(user_col, type_col))
    return out


def cdc_merge(
    base: Dataset,
    changelog: Dataset,
    key_col: str = "user_id",
    base_value_col: str = "value_cents",
    base_ts_col: str = "updated_us",
    ts_col: str = "ts",
    order_col: str = "event_id",
    op_col: str = "op",
    value_col: str = "value_cents",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """MERGE INTO (Delta/Iceberg-style upsert+delete) — apply a CDC
    changelog on top of a keyed base snapshot with last-writer-wins
    per key: the newest row per key in (ts, order) order decides the
    key's fate — an upsert (``op == 0``) rewrites the value, a delete
    (``op == 1``) removes the key, and a delete followed by a later
    upsert re-inserts it. Keys only in the changelog are inserts; keys
    only in the base pass through untouched with ``n_changes = 0``.
    Output: one row per surviving key —
    ``(key, value_cents, updated_us, n_changes)`` where ``updated_us``
    is the winning row's epoch-µs timestamp (the base snapshot's own
    ``updated_us`` when untouched) and ``n_changes`` counts the key's
    changelog rows (deletes included), all int64.

    Contract: the base is a snapshot (unique per key) whose
    ``updated_us`` precedes every changelog timestamp for that key —
    the normal compact-then-merge epoch ordering; base rows sort at
    ``(updated_us, order = -1)`` so any changelog row at the same µs
    outranks them. Values are int64 cents (house convention: exact
    last-wins equality is a cross-engine contract).

    Shape: both sides project to 5 narrow int64 columns and write into
    ONE shared key-hash fs exchange (``fs_exchange_reduce_multi`` — a
    key lives in one bucket, so its global (ts, order) stream is
    bucket-local across both inputs); per bucket one lexsort
    + group-end indexing + one ``np.add.reduceat`` for the change
    counts. No per-key Python, nothing driver-sized — the same
    contract as ``scd2_intervals``, with two inputs.

    Reference parity: GUAC's collectsub/ingestion layer re-ingests
    documents idempotently but has no keyed mutation semantics; this
    is the lakehouse-standard operator a Parquet-backed graph store
    needs for steady-state maintenance (SURVEY §2.10's incremental
    story applied to keyed state instead of append-only shards).
    """
    from guac_ray.functions.joins import default_exchange
    from guac_ray.stages.assemble import fs_exchange_reduce_multi

    import ray.data as rd

    def _empty() -> pa.Table:
        return pa.schema(
            [(key_col, pa.int64()), ("value_cents", pa.int64()),
             ("updated_us", pa.int64()), ("n_changes", pa.int64())]
        ).empty_table()

    def tag_base(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            key_col: _as_int64_strict(df[key_col].to_numpy(),
                                      "cdc_merge", key_col),
            "_ts": _as_int64_strict(df[base_ts_col].to_numpy(),
                                    "cdc_merge", base_ts_col),
            "_ord": np.full(len(df), -1, dtype="int64"),
            "_op": np.zeros(len(df), dtype="int64"),
            "_vc": _as_int64_strict(df[base_value_col].to_numpy(),
                                    "cdc_merge", base_value_col),
            "_src": np.zeros(len(df), dtype="int64"),
        })
        out["_bucket"] = (stable_hash(out, [key_col])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def tag_chg(df: pd.DataFrame) -> pa.Table:
        df = df[df[ts_col].notna()]  # NaT µs = INT64_MIN: phantom first
        out = pd.DataFrame({
            key_col: _as_int64_strict(df[key_col].to_numpy(),
                                      "cdc_merge", key_col),
            "_ts": df[ts_col].to_numpy().astype("datetime64[us]")
                            .astype("int64"),
            "_ord": _as_int64_strict(df[order_col].to_numpy(),
                                     "cdc_merge", order_col),
            "_op": _as_int64_strict(df[op_col].to_numpy(),
                                    "cdc_merge", op_col),
            "_vc": _as_int64_strict(df[value_col].to_numpy(),
                                    "cdc_merge", value_col),
            "_src": np.ones(len(df), dtype="int64"),
        })
        out["_bucket"] = (stable_hash(out, [key_col])
                          % num_buckets).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype("int64")
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        op = t["_op"].to_numpy(zero_copy_only=False)
        vc = t["_vc"].to_numpy(zero_copy_only=False)
        src = t["_src"].to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:
            return _empty()
        o = np.lexsort((od, ts, k))
        k, ts, od, op, vc, src = (k[o], ts[o], od[o], op[o], vc[o],
                                  src[o])
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.append(starts[1:], n) - 1  # winner index per key
        n_changes = np.add.reduceat(src, starts).astype("int64")
        keep = op[ends] == 0  # a winning delete removes the key
        return pa.table({
            key_col: pa.array(k[ends][keep]),
            "value_cents": pa.array(vc[ends][keep]),
            "updated_us": pa.array(ts[ends][keep]),
            "n_changes": pa.array(n_changes[keep]),
        })

    out = fs_exchange_reduce_multi(
        [base.map_batches(tag_base, batch_format="pandas"),
         changelog.map_batches(tag_chg, batch_format="pandas")],
        exchange_base or default_exchange("cdcmerge"), reduce_fn)
    if out is None:
        return rd.from_arrow(_empty())
    return out


def debounce(
    events: Dataset,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Burst filter (stream-hygiene dedup): keep an event only if it is
    the user's first OR arrives more than ``gap_us`` µs after the
    user's PREVIOUS event — the SQL lag-throttle idiom pipelines run to
    strip double-fires, retry storms and duplicate webhooks before
    sessionization. One row per KEPT event:
    ``(user_col, order_col, ts_us, gap_us)`` with ``gap_us`` NULL on
    each user's first event, all int64.

    Semantics note: the predicate compares against the previous EVENT
    (SQL ``lag`` — oracle-expressible and order-stable), not the
    previous KEPT event; the sequential variant is a per-key recurrence
    with no vectorized or SQL form and is deliberately not offered.
    Ties on ts break by ``order_col`` (zero gap → dropped).

    Same one-exchange per-user stream shell as ``gap_quantiles``: ships
    3 int64 columns, per bucket one lexsort + one shifted diff."""
    from guac_ray.functions.joins import default_exchange

    import ray.data as rd

    def _empty() -> pa.Table:
        return pa.schema(
            [(user_col, pa.int64()), (order_col, pa.int64()),
             ("ts_us", pa.int64()), ("gap_us", pa.int64())]
        ).empty_table()

    def reduce_fn(t: pa.Table) -> pa.Table:
        u = _as_int64_strict(
            t[user_col].to_numpy(zero_copy_only=False),
            "per-user stream", user_col)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return _empty()
        o = np.lexsort((od, ts, u))
        u, ts, od = u[o], ts[o], od[o]
        first = np.ones(n, dtype=bool)
        first[1:] = u[1:] != u[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        keep = first | (gap > gap_us)
        return pa.table({
            user_col: pa.array(u[keep]),
            order_col: pa.array(od[keep]),
            "ts_us": pa.array(ts[keep]),
            "gap_us": pa.array(gap[keep], mask=first[keep]),
        })

    out = _per_user_stream(
        events.select_columns([user_col, ts_col, order_col]),
        user_col, ts_col, order_col, [],
        exchange_base or default_exchange("debounce"), num_buckets,
        reduce_fn)
    if out is None:
        return rd.from_arrow(_empty())
    return out


def ewma(
    events: Dataset,
    value_col: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    alpha_num: int = 1,
    alpha_den: int = 2,
    scale: int = 1_000_000,
    exchange_base: str | None = None,
    num_buckets: int = 16,
) -> Dataset:
    """Per-user exponentially-weighted moving average — the streaming
    smoother / forecast state (what value do we expect from this user
    next?) that no GROUP BY or window frame expresses: each step
    depends on the previous SMOOTHED value, an order-sensitive
    recurrence. FIXED-POINT integer form with rational
    α = alpha_num/alpha_den:

        e_1 = v_1 · scale
        e_i = (α_num·v_i·scale + (α_den−α_num)·e_{i−1}) // α_den

    — every step is exact int64 floor division, so the result is
    bit-identical across any partitioning or engine; the SQL oracle is
    the IDENTICAL recurrence in a recursive CTE. Output one row per
    user: (user, n_events, ewma_fp) with ewma_fp = e_n (divide by
    ``scale`` for the value-scale smoothed mean).

    Values must be NONNEGATIVE integers (cents): numpy's ``//`` floors
    while SQL's truncates — they agree only when every intermediate is
    ≥ 0, so negatives are refused loudly rather than silently
    diverging from any SQL re-implementation. Overflow guard:
    α_num·v·scale must fit int64; the reduce asserts
    max(v) ≤ 2⁶²/(scale·α_den) with the rescale advice named.

    Scale shape: the ``sessionize`` contract — ONE user-hash exchange
    of 3 int64 columns; per bucket one lexsort, then the recurrence
    runs vectorized ACROSS USERS step-by-step (the loop length is the
    bucket's MAX per-user stream length, not its row count — same
    skew caveat as every ordered-stream reduction here)."""
    from guac_ray.functions.joins import default_exchange

    import ray.data as rd

    if not (0 < alpha_num < alpha_den):
        raise ValueError(
            f"ewma: need 0 < alpha_num < alpha_den, got "
            f"{alpha_num}/{alpha_den}")
    vmax_ok = (2 ** 62) // (scale * alpha_den)

    def reduce_fn(t: pa.Table) -> pa.Table:
        u = _as_int64_strict(
            t[user_col].to_numpy(zero_copy_only=False),
            "ewma", user_col)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        od = t["_ord"].to_numpy(zero_copy_only=False)
        v = t["_v"].to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "ewma_fp": pa.array([], pa.int64())})
        if v.min() < 0:
            raise ValueError(
                "ewma: negative values — numpy floor-division and SQL "
                "truncating division diverge below zero; shift or "
                "split the series first")
        if v.max() > vmax_ok:
            raise ValueError(
                f"ewma: max value {int(v.max())} x scale {scale} x "
                f"alpha_den {alpha_den} would overflow int64 — lower "
                "scale or pre-scale the values")
        o = np.lexsort((od, ts, u))
        u, v = u[o], v[o].astype(np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.append(starts, n))
        e = v[starts] * scale
        beta = alpha_den - alpha_num
        # step loop: vectorized across users (length = max stream len)
        for j in range(1, int(lens.max())):
            act = lens > j
            idx = starts[act] + j
            e[act] = (alpha_num * v[idx] * scale
                      + beta * e[act]) // alpha_den
        return pa.table({user_col: pa.array(u[starts]),
                         "n_events": pa.array(lens.astype("int64")),
                         "ewma_fp": pa.array(e.astype("int64"))})

    def add_v(df: pd.DataFrame) -> pd.DataFrame:
        vv = df[value_col].to_numpy()
        if not np.issubdtype(vv.dtype, np.integer):
            raise TypeError(
                "ewma: value must be integer (use the cents trick for "
                f"floats), got {vv.dtype}")
        df = df.copy()
        df["_v"] = vv.astype("int64")
        return df

    out = _per_user_stream(
        events.select_columns([user_col, ts_col, order_col, value_col]
                              ).map_batches(add_v, batch_format="pandas"),
        user_col, ts_col, order_col, ["_v"],
        exchange_base or default_exchange("ewma"), num_buckets,
        reduce_fn)
    if out is None:
        return rd.from_arrow(pa.schema(
            [(user_col, pa.int64()), ("n_events", pa.int64()),
             ("ewma_fp", pa.int64())]).empty_table())
    return out

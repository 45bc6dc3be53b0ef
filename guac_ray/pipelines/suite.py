"""The query suite: every operator exposed through ``__ray_entry__`` —
one Ray-Data implementation per entry, plus (where SQL-expressible) the
DuckDB oracle string the driver checks it against.

Cross-engine float determinism: monetary/real aggregates use the
integer-cents trick — ``floor(x*100 + 0.5)`` per row is the same IEEE
operation in numpy and DuckDB, integer sums are exact, and the final
``/100.0`` is exact — so Ray and the oracle agree bit-for-bit (plain
double SUMs differ in the last bits between engines).

Scale notes are in each docstring: dimension sides are broadcast via
``ray.put`` (document the bucket-join alternative for when the "small"
side stops being small); aggregations pre-combine per batch before the
groupby shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from guac_ray.arrowutil import table_from_pandas

import ray
import ray.data as rd
from ray.data import Dataset

from guac_ray.stages.groupagg import grouped_agg
from guac_ray.synth import FIXTURE_ROOT, corpus_for_sf

VALID_ROLES_SQL = "('user','assistant','system','tool')"


def cents(x) -> np.ndarray:
    """floor(x*100+0.5) as int64 — identical in numpy and DuckDB.

    Refuses NaN loudly: the cast would otherwise mint INT64_MIN
    silently (numpy warning only) and every monetary aggregate built
    on it would be garbage, where SQL's floor(NULL*100+0.5) is NULL
    and SUM skips it. Callers on nullable columns must drop/impute
    nulls FIRST, making the SQL-semantics decision visible."""
    v = np.asarray(x, dtype=np.float64)
    if np.isnan(v).any():
        raise ValueError(
            "cents: NaN input (a NULL-bearing column) — the int64 cast "
            "would silently produce INT64_MIN; drop or impute nulls "
            "first (SQL aggregates skip NULL, so decide explicitly)")
    return np.floor(v * 100 + 0.5).astype("int64")


def _read(sf_dir: str, table: str, columns: list[str] | None = None,
          filter=None) -> Dataset:
    """Column-pruned read with the file's pandas footer metadata
    stripped: pa.Schema with that metadata is unhashable, so every
    worker-side block concat (actor-pool batching) would log a
    "Failed to hash the schemas" warning per batch otherwise.
    ``filter`` (a ``pyarrow.dataset`` expression) pushes a row
    predicate into the SCAN — row groups whose statistics exclude the
    predicate never leave storage, the prune-at-the-read rule for
    selective fact-table filters."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    sch = pq.read_schema(path).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, schema=sch, columns=columns,
                           filter=filter)


def _bcast_df(sf_dir: str, table: str, columns: list[str],
              sort_by: str | None = None):
    """Broadcast a small dimension table once (ray.put). At 100 TB scale a
    grown dimension switches to the bucketed hash join (ray_guide.md).
    ``sort_by`` sorts BEFORE the put — mandatory when the consumer runs
    ``np.searchsorted`` directly on the shared frame (the join-reduce
    partial_fns); relying on parquet file order is silent corruption on
    any unsorted dimension."""
    df = pd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    if len(df) > BROADCAST_ROW_LIMIT:
        # most registry queries broadcast their dimension side without
        # a per-query hash-join fallback (only the flagship trio has
        # one) — above the limit that would OOM every actor; refuse
        # loudly naming the switch instead
        raise ValueError(
            f"_bcast_df: {table!r} has {len(df)} rows > "
            f"BROADCAST_ROW_LIMIT={BROADCAST_ROW_LIMIT} — this query "
            "needs the co-partitioned hash_join plan at this scale "
            "(raise GUAC_RAY_BROADCAST_ROW_LIMIT only with matching "
            "worker heap)")
    if sort_by is not None:
        df = df.sort_values(sort_by).reset_index(drop=True)
    return ray.put(df)


# Join planning: a "dimension" side is broadcast only while it is small.
# Above this row count the suite switches to the co-partitioned
# fs-exchange hash join — on a real cluster the threshold would key on
# bytes vs per-worker heap; rows are the right proxy for these tables.
BROADCAST_ROW_LIMIT = int(os.environ.get("GUAC_RAY_BROADCAST_ROW_LIMIT", "100000"))


def _dim_idx(sorted_keys: np.ndarray, probe: np.ndarray,
             ctx: str) -> np.ndarray:
    """Index of each probe key in a SORTED dimension key array, with
    the miss check every ``np.searchsorted`` consumer needs: a probe
    key absent from the dimension would otherwise silently bind the
    NEXT key's attributes (wrong nation/brand/name — a value
    divergence the FK-clean oracle tables never exercise) or
    IndexError past the end. SQL's inner join DROPS such rows; this
    engine REFUSES loudly instead, naming the orphan key — silent
    mis-binding is never an option, and an FK violation in a
    dimension-modeled table is a data bug the caller must see."""
    idx = np.searchsorted(sorted_keys, probe)
    idx_c = np.minimum(idx, len(sorted_keys) - 1)
    bad = sorted_keys[idx_c] != probe
    if bad.any():
        raise ValueError(
            f"{ctx}: {int(bad.sum())} probe key(s) absent from the "
            f"dimension (e.g. {probe[bad][:3].tolist()}) — FK "
            "violation; the SQL oracle's inner join would drop these "
            "rows, so clean the input or join through hash_join")
    return idx_c


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet metadata — no data read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _exchange(name: str) -> str:
    from guac_ray.functions.joins import default_exchange

    return default_exchange(name)


def _ts_midpoint_us(sf_dir: str, qname: str) -> int:
    """The events table's integer-µs (min+max)//2 midpoint — the ONE
    epoch cutoff shared by the asof/mv_refresh/cuped family (a single
    definition: any floor-vs-truncate or NULL-handling fix must hit
    every member or their "midpoint discipline" silently diverges)."""
    import pyarrow.compute as pc

    def part(t: pa.Table) -> pa.Table:
        arr = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"mn": pa.array([pc.min(arr).as_py()],
                                        pa.int64()),
                         "mx": pa.array([pc.max(arr).as_py()],
                                        pa.int64())})

    p = (_read(sf_dir, "events", ["ts"])
         .map_batches(part, batch_format="pyarrow")
         .to_pandas().dropna())
    if p.empty:
        raise ValueError(f"{qname}: empty events table")
    return (int(p["mn"].min()) + int(p["mx"].max())) // 2


# ---------------------------------------------------------------------------
# TPC-H-ish relational operators
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """Filter + two-phase grouped aggregate (TPC-H Q1 shape).

    Partial per-batch combine emits ≤ |groups| rows per batch, so the
    groupby shuffle moves partials, not the fact table.
    """
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])
    cutoff = pd.Timestamp("1998-09-01")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.l_shipdate <= cutoff]
        if df.empty:
            return pd.DataFrame({"l_returnflag": [], "l_linestatus": [],
                                 "_qty": [], "_base": [], "_disc": [], "_n": []})
        t = pd.DataFrame({
            "l_returnflag": df.l_returnflag,
            "l_linestatus": df.l_linestatus,
            "_qty": cents(df.l_quantity),
            "_base": cents(df.l_extendedprice),
            "_disc": cents(df.l_extendedprice.to_numpy() * (1 - df.l_discount.to_numpy())),
        })
        g = t.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            _qty=("_qty", "sum"), _base=("_base", "sum"), _disc=("_disc", "sum"),
            _n=("_qty", "size"),
        ).reset_index()
        return g

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        {"qc": ("_qty", "sum"), "bc": ("_base", "sum"),
         "dc": ("_disc", "sum"), "n": ("_n", "sum")},
        num_buckets=4,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df.l_returnflag,
            "l_linestatus": df.l_linestatus,
            "sum_qty": df.qc / 100.0,
            "sum_base": df.bc / 100.0,
            "sum_disc_price": df.dc / 100.0,
            "count_order": df.n.astype("int64"),
        })

    return agg.map_batches(final, batch_format="pandas")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))/100.0 AS sum_qty,
  sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))/100.0 AS sum_base,
  sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS sum_disc_price,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_building_revenue(sf_dir: str):
    """lineitem ⋈ orders ⋈ customer (BUILDING segment), revenue per
    order, top 10. Size-guarded plan: orders/customer broadcast while
    small, co-partitioned fs-exchange hash joins once orders outgrows
    ``BROADCAST_ROW_LIMIT`` (a 150M-row fact table must never ship to
    every actor as a Python dict)."""
    if _table_rows(sf_dir, "orders") > BROADCAST_ROW_LIMIT:
        return _q3_partitioned(sf_dir)
    return _q3_broadcast(sf_dir)


def _rc_sum_partial(key: str):
    """Fused reduce-side partial: groupby(key)._rc.sum inside the join
    task, so the join payload never re-enters the object store."""
    def f(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(key, sort=False)._rc.sum().reset_index()
        return table_from_pandas(g, preserve_index=False)
    return f


def _q3_partitioned(sf_dir: str):
    """Partitioned q3. The customer side is a DIMENSION: while it fits
    (``BROADCAST_ROW_LIMIT``) its BUILDING keys broadcast once and the
    semi-filter fuses into the orders partition write — one exchange
    instead of two. lineitem ⋈ orders stays the co-partitioned
    fs-exchange hash join (both sides fact-scale), with the per-order
    revenue partial fused into the reduce tasks."""
    from guac_ray.functions.joins import hash_join

    cut = pd.Timestamp("1998-01-01")

    if _table_rows(sf_dir, "customer") <= BROADCAST_ROW_LIMIT:
        import pyarrow.parquet as pq

        ck = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"],
            filters=[("c_mktsegment", "==", "BUILDING")],
        )["c_custkey"].to_pylist()
        kref = ray.put(frozenset(ck))

        def orders_f(df: pd.DataFrame) -> pa.Table:
            ks = ray.get(kref)
            d = df[(df.o_orderdate < cut) & df.o_custkey.isin(ks)]
            return table_from_pandas(
                pd.DataFrame({"orderkey": d.o_orderkey}), preserve_index=False)

        okeys = _read(sf_dir, "orders",
                      ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            orders_f, batch_format="pandas")
    else:
        def cust_f(df: pd.DataFrame) -> pa.Table:
            d = df[df.c_mktsegment == "BUILDING"]
            return table_from_pandas(
                pd.DataFrame({"custkey": d.c_custkey}), preserve_index=False)

        def orders_all_f(df: pd.DataFrame) -> pa.Table:
            d = df[df.o_orderdate < cut]
            return table_from_pandas(
                pd.DataFrame({"orderkey": d.o_orderkey, "custkey": d.o_custkey}),
                preserve_index=False)

        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
            cust_f, batch_format="pandas")
        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            orders_all_f, batch_format="pandas")
        okeys = hash_join(orders, cust, on="custkey",
                          exchange_dir=_exchange("q3_oc")
                          ).select_columns(["orderkey"])

    def li_f(df: pd.DataFrame) -> pa.Table:
        d = df[df.l_shipdate > cut]
        return table_from_pandas(
            pd.DataFrame({
                "orderkey": d.l_orderkey,
                "_rc": cents(d.l_extendedprice.to_numpy() * (1 - d.l_discount.to_numpy())),
            }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
               ).map_batches(li_f, batch_format="pandas")
    joined = hash_join(li, okeys, on="orderkey",
                       exchange_dir=_exchange("q3_lo"),
                       partial_fn=_rc_sum_partial("orderkey"))

    agg = grouped_agg(joined, ["orderkey"], {"rc": ("_rc", "sum")},
                      num_buckets=16)
    top = agg.sort(["rc", "orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda df: pd.DataFrame({"l_orderkey": df.orderkey.astype("int64"),
                                 "revenue": df.rc / 100.0}),
        batch_format="pandas",
    )


def _q3_broadcast(sf_dir: str):
    cut = pd.Timestamp("1998-01-01")
    oref = _bcast_df(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    cref = _bcast_df(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    class Join:
        def __init__(self):
            orders = ray.get(oref)
            cust = ray.get(cref)
            keep_cust = set(cust[cust.c_mktsegment == "BUILDING"].c_custkey)
            ok = orders[(orders.o_orderdate < cut) & orders.o_custkey.isin(keep_cust)]
            self.orderkeys = set(ok.o_orderkey)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df.l_shipdate > cut) & df.l_orderkey.isin(self.orderkeys)]
            if df.empty:
                return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                                     "_rc": pd.Series([], dtype="int64")})
            t = pd.DataFrame({
                "l_orderkey": df.l_orderkey,
                "_rc": cents(df.l_extendedprice.to_numpy() * (1 - df.l_discount.to_numpy())),
            })
            return t.groupby("l_orderkey", sort=False)._rc.sum().reset_index()

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    agg = grouped_agg(
        ds.map_batches(Join, batch_format="pandas", concurrency=(1, 2)),
        ["l_orderkey"], {"rc": ("_rc", "sum")}, num_buckets=16,
    )
    top = agg.sort(["rc", "l_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda df: pd.DataFrame({"l_orderkey": df.l_orderkey, "revenue": df.rc / 100.0}),
        batch_format="pandas",
    )


Q3_SQL = """
SELECT l_orderkey,
       sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q5_region_revenue(sf_dir: str):
    """Five-way dimension chain. Size-guarded: one broadcast lookup
    while orders is small; co-partitioned hash joins above the limit
    (nation/region are constant-cardinality and always broadcast)."""
    if _table_rows(sf_dir, "orders") > BROADCAST_ROW_LIMIT:
        return _q5_partitioned(sf_dir)
    return _q5_broadcast(sf_dir)


def _q5_partitioned(sf_dir: str):
    """nation/region are constant-cardinality → always a broadcast dict;
    customer is a dimension → its custkey→n_name map broadcasts while it
    fits, fusing the customer join into the orders partition write; the
    fact-fact lineitem ⋈ orders goes through the fs exchange with the
    revenue partial fused into the reduce."""
    from guac_ray.functions.joins import hash_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"])
    asia = set(region[region.r_name == "ASIA"].r_regionkey)
    nat_name = dict(zip(nation.n_nationkey,
                        nation.n_name.where(nation.n_regionkey.isin(asia))))

    if _table_rows(sf_dir, "customer") <= BROADCAST_ROW_LIMIT:
        cdf = pd.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
        nn = cdf.c_nationkey.map(nat_name)
        cref = ray.put(dict(zip(cdf.c_custkey[nn.notna()], nn[nn.notna()])))

        def orders_f(df: pd.DataFrame) -> pa.Table:
            cmap = ray.get(cref)
            d = df[(df.o_orderdate >= lo) & (df.o_orderdate < hi)]
            names = d.o_custkey.map(cmap)
            out = pd.DataFrame({"orderkey": d.o_orderkey,
                                "n_name": names}).dropna()
            return table_from_pandas(out, preserve_index=False)

        oc = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            orders_f, batch_format="pandas")
    else:
        def cust_f(df: pd.DataFrame) -> pa.Table:
            nn = df.c_nationkey.map(nat_name)
            d = pd.DataFrame({"custkey": df.c_custkey, "n_name": nn}).dropna()
            return table_from_pandas(d, preserve_index=False)

        def orders_all_f(df: pd.DataFrame) -> pa.Table:
            d = df[(df.o_orderdate >= lo) & (df.o_orderdate < hi)]
            return table_from_pandas(
                pd.DataFrame({"orderkey": d.o_orderkey, "custkey": d.o_custkey}),
                preserve_index=False)

        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            cust_f, batch_format="pandas")
        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            orders_all_f, batch_format="pandas")
        oc = hash_join(orders, cust, on="custkey",
                       exchange_dir=_exchange("q5_oc")
                       ).select_columns(["orderkey", "n_name"])

    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(
            pd.DataFrame({
                "orderkey": df.l_orderkey,
                "_rc": cents(df.l_extendedprice.to_numpy() * (1 - df.l_discount.to_numpy())),
            }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        li_f, batch_format="pandas")
    joined = hash_join(li, oc, on="orderkey", exchange_dir=_exchange("q5_lo"),
                       partial_fn=_rc_sum_partial("n_name"))

    agg = grouped_agg(joined, ["n_name"], {"rc": ("_rc", "sum")}, num_buckets=4)
    return agg.map_batches(
        lambda df: pd.DataFrame({"n_name": df.n_name, "revenue": df.rc / 100.0}),
        batch_format="pandas",
    )


def _q5_broadcast(sf_dir: str):
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    refs = {
        "orders": _bcast_df(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        "customer": _bcast_df(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "nation": _bcast_df(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
        "region": _bcast_df(sf_dir, "region", ["r_regionkey", "r_name"]),
    }

    class Join:
        def __init__(self):
            orders = ray.get(refs["orders"])
            cust = ray.get(refs["customer"])
            nation = ray.get(refs["nation"])
            region = ray.get(refs["region"])
            asia = region[region.r_name == "ASIA"].r_regionkey
            nat = nation[nation.n_regionkey.isin(set(asia))]
            cust = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
            o = orders[(orders.o_orderdate >= lo) & (orders.o_orderdate < hi)]
            o = o.merge(cust[["c_custkey", "n_name"]], left_on="o_custkey", right_on="c_custkey")
            self.order_to_nation = dict(zip(o.o_orderkey, o.n_name))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            nn = df.l_orderkey.map(self.order_to_nation)
            df = df[nn.notna()]
            if df.empty:
                return pd.DataFrame({"n_name": pd.Series([], dtype="str"),
                                     "_rc": pd.Series([], dtype="int64")})
            t = pd.DataFrame({
                "n_name": nn[nn.notna()],
                "_rc": cents(df.l_extendedprice.to_numpy() * (1 - df.l_discount.to_numpy())),
            })
            return t.groupby("n_name", sort=False)._rc.sum().reset_index()

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    agg = grouped_agg(
        ds.map_batches(Join, batch_format="pandas", concurrency=(1, 2)),
        ["n_name"], {"rc": ("_rc", "sum")}, num_buckets=4,
    )
    return agg.map_batches(
        lambda df: pd.DataFrame({"n_name": df.n_name, "revenue": df.rc / 100.0}),
        batch_format="pandas",
    )


Q5_SQL = """
SELECT n_name,
       sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def top_customers(sf_dir: str):
    """Revenue per customer, global top 10. Size-guarded: the orders
    fact side broadcasts only while small; above the limit lineitem and
    orders co-partition through the fs exchange and only the FINAL ten
    keys look up names (predicate-pushdown read of customer)."""
    if _table_rows(sf_dir, "orders") > BROADCAST_ROW_LIMIT:
        return _top_customers_partitioned(sf_dir)
    return _top_customers_broadcast(sf_dir)


def _top_customers_partitioned(sf_dir: str):
    from guac_ray.functions.joins import hash_join

    def orders_f(t: pa.Table) -> pa.Table:
        return t.rename_columns(["orderkey", "custkey"])

    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(
            pd.DataFrame({
                "orderkey": df.l_orderkey,
                "_rc": cents(df.l_extendedprice.to_numpy() * (1 - df.l_discount.to_numpy())),
            }), preserve_index=False)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_f, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        li_f, batch_format="pandas")
    joined = hash_join(li, orders, on="orderkey",
                       exchange_dir=_exchange("topc_lo"),
                       partial_fn=_rc_sum_partial("custkey"))

    top = (
        grouped_agg(
            joined, ["custkey"], {"rc": ("_rc", "sum")}, num_buckets=16,
        )
        .sort(["rc", "custkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    # ten keys → predicate-pushdown point lookup, never a table scan
    import pyarrow.parquet as pq

    keys = [int(k) for k in top.custkey]
    names = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", keys)],
    ).to_pandas()
    nm = dict(zip(names.c_custkey, names.c_name))
    return pd.DataFrame({
        "c_custkey": top.custkey.astype("int64"),
        "c_name": top.custkey.map(nm),
        "revenue": top.rc / 100.0,
    })


def _top_customers_broadcast(sf_dir: str):
    oref = _bcast_df(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cref = _bcast_df(sf_dir, "customer", ["c_custkey", "c_name"])

    class Join:
        def __init__(self):
            o = ray.get(oref)
            self.o2c = dict(zip(o.o_orderkey, o.o_custkey))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ck = df.l_orderkey.map(self.o2c)
            t = pd.DataFrame({
                "c_custkey": ck,
                "_rc": cents(df.l_extendedprice.to_numpy() * (1 - df.l_discount.to_numpy())),
            })
            return t.groupby("c_custkey", sort=False)._rc.sum().reset_index()

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    agg = (
        grouped_agg(
            ds.map_batches(Join, batch_format="pandas", concurrency=(1, 2)),
            ["c_custkey"], {"rc": ("_rc", "sum")}, num_buckets=16,
        )
        .sort(["rc", "c_custkey"], descending=[True, False])
        .limit(10)
    )
    cust = ray.get(cref)
    name = dict(zip(cust.c_custkey, cust.c_name))
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "c_custkey": df.c_custkey.astype("int64"),
            "c_name": df.c_custkey.map(name),
            "revenue": df.rc / 100.0,
        }),
        batch_format="pandas",
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10
"""


def part_type_stats(sf_dir: str):
    ds = _read(sf_dir, "part", ["p_type", "p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"p_type": df.p_type, "_rc": cents(df.p_retailprice)})
        g = t.groupby("p_type", sort=False).agg(_rc=("_rc", "sum"), _n=("_rc", "size"))
        return g.reset_index()

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["p_type"], {"rc": ("_rc", "sum"), "n": ("_n", "sum")}, num_buckets=4,
    )
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "p_type": df.p_type, "n": df.n.astype("int64"), "retail_cents": df.rc,
        }),
        batch_format="pandas",
    )


PART_TYPE_SQL = """
SELECT p_type, count(*) AS n,
       CAST(sum(CAST(floor(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS retail_cents
FROM part GROUP BY p_type
"""


def basket_pairs(sf_dir: str):
    """2-itemset association rules over order baskets (functions/
    stats.py ``basket_pair_rules``): brands co-purchased in ≥ 5
    orders, with integer fixed-point confidence both ways and lift —
    the Apriori/market-basket primitive. The part dimension broadcasts
    once (sorted-array searchsorted lookup — dimension-sized at any
    scale); baskets co-locate through ONE by-order fs exchange; the
    rule table is brand²-bounded. All-int arithmetic ⇒ hash-exact."""
    from guac_ray.functions.stats import basket_pair_rules

    pref = _bcast_df(sf_dir, "part", ["p_partkey", "p_brand"])

    class BrandMap:
        def __init__(self):
            part = ray.get(pref).sort_values("p_partkey")
            self.keys = part.p_partkey.to_numpy()
            self.brands = part.p_brand.to_numpy()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            idx = _dim_idx(self.keys, df.l_partkey.to_numpy(), "part dim")
            return pd.DataFrame({"o": df.l_orderkey.to_numpy(),
                                 "b": self.brands[idx]})

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    items = ds.map_batches(BrandMap, batch_format="pandas",
                           concurrency=(1, 4))
    return basket_pair_rules(items, "o", "b", min_support=5)


BASKET_PAIRS_SQL = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), nb AS (
  SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM ob
), supp AS (
  SELECT b, CAST(count(*) AS BIGINT) AS s FROM ob GROUP BY 1
), pairs AS (
  SELECT a.b AS item1, c.b AS item2, CAST(count(*) AS BIGINT) AS support
  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
  GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT p.item1, p.item2, p.support,
       1000000 * p.support // s1.s AS conf12_fp,
       1000000 * p.support // s2.s AS conf21_fp,
       1000000 * nb.n * p.support // (s1.s * s2.s) AS lift_fp
FROM pairs p
JOIN supp s1 ON s1.b = p.item1
JOIN supp s2 ON s2.b = p.item2
CROSS JOIN nb
"""


# orders_per_status retired from the registry in round 4: its rows are a
# strict subset of orders_cube's (status, ALL) level — the freed gate
# slot went to doc_decontaminate.


def distinct_segments(sf_dir: str):
    """Set op: distinct values of one column (``Dataset.unique`` — a
    shuffle; the materialized value list is small by definition)."""
    vals = _read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate per event type (stream-shaped:
    window key = truncated event time; GROUP BY is the window)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "event_type": df.event_type,
            "hour": df.ts.dt.floor("h").astype("datetime64[us]"),
            "_vc": cents(df.value),
        })
        g = t.groupby(["event_type", "hour"], sort=False).agg(
            _vc=("_vc", "sum"), _n=("_vc", "size")).reset_index()
        return g

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour"],
        {"vc": ("_vc", "sum"), "n": ("_n", "sum")}, num_buckets=16,
    )
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "event_type": df.event_type,
            "hour": df.hour.astype("datetime64[us]"),
            "n": df.n.astype("int64"), "value_cents": df.vc,
        }),
        batch_format="pandas",
    )


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def events_user_stats(sf_dir: str):
    """Per-user aggregates incl. the ORDER-SENSITIVE family Ray Data has
    no kernel for: exact COUNT(DISTINCT event_type), MODE (most frequent
    type, ties → lexicographic min — a deterministic rule both engines
    can state), and ordered STRING_AGG of the distinct types.

    One exchange: per-batch partials at the (user, type) grain (≤ 5
    types/user, so the combiner bounds shuffle volume at users×types
    rows per block regardless of event count), bucketed by user hash so
    ALL of one user's types land in one reduce, where count-distinct /
    mode / ordered-concat are each a vectorized pass over the combined
    partials. Hot users cost one partial row per (batch, type) — the
    same skew posture as the salted combine this query previously
    evidenced."""
    from guac_ray.stages.assemble import fs_exchange_reduce

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    num_buckets = 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "user_id": df.user_id.to_numpy(),
            "event_type": df.event_type.to_numpy(),
            "_vc": cents(df.value),
        })
        out = t.groupby(["user_id", "event_type"], sort=False).agg(
            _vc=("_vc", "sum"), _n=("_vc", "size")).reset_index()
        out["_bucket"] = (out.user_id.to_numpy() % num_buckets).astype("int64")
        return out

    def reduce_fn(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        t = df.groupby(["user_id", "event_type"], sort=False).agg(
            n=("_n", "sum"), vc=("_vc", "sum")).reset_index()
        base = t.groupby("user_id", sort=False).agg(
            n=("n", "sum"), value_cents=("vc", "sum"),
            n_types=("event_type", "size")).reset_index()
        # mode: one sort of the (user, type) grain — count desc, type asc
        s = t.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = s.drop_duplicates("user_id")[["user_id", "event_type"]]
        top = top.rename(columns={"event_type": "top_type"})
        # ordered string_agg over the distinct types
        o = t.sort_values(["user_id", "event_type"], kind="mergesort")
        tl = o.groupby("user_id", sort=False)["event_type"].agg(
            ",".join).reset_index().rename(columns={"event_type": "types_list"})
        out = base.merge(top, on="user_id").merge(tl, on="user_id")
        out = out.astype({"user_id": "int64", "n": "int64",
                          "value_cents": "int64", "n_types": "int64"})
        return table_from_pandas(
            out[["user_id", "n", "value_cents", "n_types",
                 "top_type", "types_list"]])

    red = fs_exchange_reduce(ds.map_batches(partial, batch_format="pandas"),
                             _exchange("events_user_stats"), reduce_fn)
    if red is None:
        return pa.schema(
            [("user_id", pa.int64()), ("n", pa.int64()),
             ("value_cents", pa.int64()), ("n_types", pa.int64()),
             ("top_type", pa.string()), ("types_list", pa.string())],
        ).empty_table()
    return red


EVENTS_USER_SQL = """
WITH tc AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
), top AS (
  SELECT user_id, event_type AS top_type FROM tc
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY c DESC, event_type) = 1
), base AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents,
         count(DISTINCT event_type) AS n_types,
         string_agg(DISTINCT event_type, ',' ORDER BY event_type)
             AS types_list
  FROM events GROUP BY user_id
)
SELECT base.user_id, n, value_cents, n_types, top_type, types_list
FROM base JOIN top USING (user_id)
"""


def events_sessions(sf_dir: str):
    """Gap-based session windows (30 min) per user — the stream-shaped
    session operator; oracle uses SQL window functions."""
    from guac_ray.functions.streams import sessionize

    return sessionize(_read(sf_dir, "events",
                            ["event_id", "user_id", "ts", "value"]))


EVENTS_SESSIONS_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM t
)
SELECT user_id, min(ts) AS session_start, count(*) AS n,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM s GROUP BY user_id, sess
"""


def events_sliding(sf_dir: str):
    """HOPPING (sliding) window aggregate: 1-hour windows every 15 min —
    each event lands in exactly 4 windows. The window explode is a
    vectorized ×4 repeat inside map_batches (no per-row loop), then the
    standard partial-combine → bucketed groupby. Stream-shaped operator
    #3 next to tumbling (events_hourly) and sessions (events_sessions)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    HOP, LEN = 900, 3600  # seconds
    K = LEN // HOP

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_type": pd.Series(dtype="str"),
                                 "w": pd.Series(dtype="int64"),
                                 "_vc": pd.Series(dtype="int64"),
                                 "_n": pd.Series(dtype="int64")})
        epoch = df.ts.astype("datetime64[s]").astype("int64").to_numpy()
        base = (epoch // HOP) * HOP
        vc = cents(df.value)
        et = df.event_type.to_numpy()
        n = len(df)
        w = np.repeat(base, K) - np.tile(np.arange(K, dtype=np.int64) * HOP, n)
        t = pd.DataFrame({
            "event_type": np.repeat(et, K),
            "w": w,
            "_vc": np.repeat(vc, K),
        })
        g = t.groupby(["event_type", "w"], sort=False).agg(
            _vc=("_vc", "sum"), _n=("_vc", "size")).reset_index()
        return g

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "w"],
        {"vc": ("_vc", "sum"), "n": ("_n", "sum")}, num_buckets=16,
    )
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "event_type": df.event_type,
            "window_start": pd.to_datetime(df.w, unit="s").astype("datetime64[us]"),
            "n": df.n.astype("int64"),
            "value_cents": df.vc,
        }),
        batch_format="pandas",
    )


EVENTS_SLIDING_SQL = """
SELECT event_type,
       CAST(to_timestamp(CAST(floor(epoch(ts)/900)*900 AS BIGINT) - k*900)
            AS TIMESTAMP) AS window_start,
       count(*) AS n,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks
GROUP BY 1, 2
"""


def events_windows(sf_dir: str):
    """Tumbling (1 h) AND hopping (1 h / 15 min) window aggregates in one
    driver row: a tagged UNION of the two stream-window operators (the
    former separate events_hourly / events_sliding entries — both
    pipelines run unchanged; ``kind`` disambiguates)."""
    hourly = events_hourly(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            "kind": np.repeat("tumbling", len(df)),
            "event_type": df.event_type,
            "window_start": df.hour,
            "n": df.n, "value_cents": df.value_cents,
        }),
        batch_format="pandas",
    )
    sliding = events_sliding(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            "kind": np.repeat("sliding", len(df)),
            "event_type": df.event_type,
            "window_start": df.window_start,
            "n": df.n, "value_cents": df.value_cents,
        }),
        batch_format="pandas",
    )
    return hourly.union(sliding)


EVENTS_WINDOWS_SQL = f"""
SELECT 'tumbling' AS kind, event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS kind, * FROM ({EVENTS_SLIDING_SQL})
"""


def priority_revenue_hashjoin(sf_dir: str):
    """Large-large partitioned hash join (lineitem ⋈ orders through the
    filesystem exchange — no broadcast side) → revenue per order priority."""
    from guac_ray.functions.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda t: t.rename_columns(["orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    ex = "/dev/shm/guac_ray_exchange/priority_join" if os.path.isdir("/dev/shm") \
        else "/tmp/guac_ray_exchange/priority_join"
    def partial_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = pd.DataFrame({
            "o_orderpriority": df.o_orderpriority,
            "_rc": cents(df.l_extendedprice.to_numpy() * (1 - df.l_discount.to_numpy())),
        }).groupby("o_orderpriority", sort=False)._rc.sum().reset_index()
        return table_from_pandas(g, preserve_index=False)

    joined = hash_join(li, orders, on="orderkey", exchange_dir=ex,
                       partial_fn=partial_fn)
    agg = grouped_agg(joined, ["o_orderpriority"], {"rc": ("_rc", "sum")},
                      num_buckets=4)
    return agg.map_batches(
        lambda df: pd.DataFrame({"o_orderpriority": df.o_orderpriority,
                                 "revenue": df.rc / 100.0}),
        batch_format="pandas",
    )


PRIORITY_REVENUE_SQL = """
SELECT o_orderpriority,
       sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def events_customer_outer(sf_dir: str):
    """FULL OUTER partitioned hash join (reconciliation shape): per-user
    event totals ⟗ the BUILDING customer segment. Users whose customer
    record is in another segment survive with null customer columns;
    BUILDING accounts that produced no events survive with null totals.
    Exercises ``hash_join(how="outer")`` — union-of-buckets reduce, no
    probe split (joins.py)."""
    from guac_ray.functions.joins import default_exchange, hash_join

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"user_id": df.user_id, "_vc": cents(df.value)})
        return t.groupby("user_id", sort=False).agg(
            _vc=("_vc", "sum"), _n=("_vc", "size")).reset_index()

    agg = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"vc": ("_vc", "sum"), "n": ("_n", "sum")}, num_buckets=8,
    )
    import pyarrow.compute as pc

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), "BUILDING"))
                   .select(["c_custkey", "c_name"])
                   .rename_columns(["user_id", "c_name"]),
        batch_format="pyarrow",
    )
    joined = hash_join(agg, cust, on="user_id", how="outer",
                       exchange_dir=default_exchange("events_cust_outer"),
                       num_buckets=8)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df.user_id.astype("int64"),
            "n_events": df.n.astype("float64"),
            "value_cents": df.vc.astype("float64"),
            "c_name": df.c_name.astype("object"),
        })

    return joined.map_batches(final, batch_format="pandas")


EVENTS_CUST_OUTER_SQL = """
SELECT COALESCE(e.user_id, c.c_custkey) AS user_id,
       CAST(e.n AS DOUBLE) AS n_events,
       CAST(e.vc AS DOUBLE) AS value_cents,
       c.c_name
FROM (SELECT user_id, count(*) AS n,
             sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS vc
      FROM events GROUP BY user_id) e
FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer
                 WHERE c_mktsegment = 'BUILDING') c
  ON e.user_id = c.c_custkey
"""


_PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_returnflag", "l_linestatus"]


def lineitem_profile(sf_dir: str):
    """ANALYZE-style column profile (count / nulls / min / max per
    column, values normalized to strings for a type-stable result) —
    one per-batch partial pass + the two-phase grouped aggregate; the
    widest table never leaves the workers. Exact for integer and string
    columns (float/date formatting differs across engines, so those are
    profiled via pytest, not the SQL oracle)."""
    ds = _read(sf_dir, "lineitem", _PROFILE_COLS)

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in _PROFILE_COLS:
            v = t[c]
            nn = v.null_count
            vals = v.drop_null()
            s = vals.cast(pa.string()) if len(vals) else None
            import pyarrow.compute as pc

            rows.append({
                "column": c,
                "n": t.num_rows,
                "nnull": nn,
                "mn": pc.min(s).as_py() if s is not None else None,
                "mx": pc.max(s).as_py() if s is not None else None,
            })
        return table_from_pandas(pd.DataFrame(rows), preserve_index=False)

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["column"],
        {"n": ("n", "sum"), "nnull": ("nnull", "sum"),
         "mn": ("mn", "min"), "mx": ("mx", "max")},
        num_buckets=2)


LINEITEM_PROFILE_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column, count(*) AS n, "
    f"count(*) - count({c}) AS nnull, "
    f"CAST(min(CAST({c} AS VARCHAR)) AS VARCHAR) AS mn, "
    f"max(CAST({c} AS VARCHAR)) AS mx FROM lineitem"
    for c in _PROFILE_COLS
)


def orders_cube(sf_dir: str):
    """CUBE(status, priority) — every grouping set, a strict superset of
    the former ROLLUP query's levels (same gate slot, more operator).
    Finest level aggregated distributed (two-phase fs exchange), all
    2^k coarser grouping sets derived from the finest result on the
    driver (functions/reshape.py:cube_agg). Revenue in integer cents
    through the shuffle so every level is order-independent."""
    from guac_ray.functions.reshape import cube_agg

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "o_orderstatus": df["o_orderstatus"].to_numpy(),
            "o_orderpriority": df["o_orderpriority"].to_numpy(),
            "_tc": cents(df["o_totalprice"].to_numpy()),
        })

    r = cube_agg(ds.map_batches(prep, batch_format="pandas"),
                 ["o_orderstatus", "o_orderpriority"],
                 {"n_orders": ("_tc", "count"), "_tc": ("_tc", "sum")},
                 num_buckets=4)
    r["revenue"] = r["_tc"] / 100.0
    return r.drop(columns=["_tc"])


ORDERS_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n_orders,
       sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))/100.0 AS revenue
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def events_type_pivot(sf_dir: str):
    """Long→wide pivot: per-user counts of each event type. One-hot per
    batch (pure map), summed through the fs-exchange aggregate — the
    wide row never exists as Python objects
    (functions/reshape.py:pivot_counts)."""
    from guac_ray.functions.reshape import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(ds, "user_id", "event_type",
                        ["click", "view", "purchase", "signup", "error"],
                        num_buckets=8)


EVENTS_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events GROUP BY user_id
"""


def events_stratified_sample(sf_dir: str):
    """Stratified deterministic sample: per-stratum rates (errors 50%,
    purchases 25%, everything else ~5%) as a pure function of
    md5(event_id) — the train_test_split discipline generalized to
    per-group rates, so the sample is reproducible under resume,
    backfill, and engine swap. Rates are expressed in /256 units (one
    digest byte) to stay oracle-exact."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def pick(t: pa.Table) -> pa.Table:
        from guac_ray.pipelines.curation import md5_first_byte

        ids = t["event_id"].to_numpy(zero_copy_only=False).astype("int64")
        et = t["event_type"].to_numpy(zero_copy_only=False)
        first = md5_first_byte(ids)
        thr = np.select([et == "error", et == "purchase"],
                        [np.uint8(0x80), np.uint8(0x40)], np.uint8(0x0D))
        keep = first < thr
        return pa.table({"event_id": pa.array(ids[keep]),
                         "event_type": pa.array(et[keep])})

    return ds.map_batches(pick, batch_format="pyarrow")


EVENTS_STRATIFIED_SQL = """
SELECT event_id, event_type FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
      CASE event_type WHEN 'error' THEN '80'
                      WHEN 'purchase' THEN '40'
                      ELSE '0d' END
"""


def click_days_no_purchase(sf_dir: str):
    """Anti-join with an oracle: (user, day) pairs with click activity
    but no purchase that day — broadcast key-set anti-join on the
    composite key (functions/joins.py:anti_join, the certifier re-scan
    pattern), then exact dedup."""
    import pyarrow.compute as pc

    from guac_ray.functions.dedup import dedup_exact
    from guac_ray.functions.joins import anti_join

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def keyed(kind: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], kind))
            ts = t["ts"].to_numpy(zero_copy_only=False)
            day = np.datetime_as_string(
                ts.astype("datetime64[D]"), unit="D")
            uid = t["user_id"].to_numpy(zero_copy_only=False).astype("int64")
            comp = np.char.add(np.char.add(uid.astype("U20"), "|"), day)
            return pa.table({
                "user_id": pa.array(uid),
                "day": pa.array(day),
                "_k": pa.array(comp),
            })

        return f

    purchase_keys = set(
        ev.map_batches(keyed("purchase"), batch_format="pyarrow").unique("_k"))
    clicks = ev.map_batches(keyed("click"), batch_format="pyarrow")
    out = anti_join(clicks, purchase_keys, "_k")
    out = dedup_exact(out.select_columns(["user_id", "day"]),
                      ["user_id", "day"], num_buckets=4)
    return out


CLICK_DAYS_SQL = """
SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
FROM events e
WHERE event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
      AND strftime(p.ts, '%Y-%m-%d') = strftime(e.ts, '%Y-%m-%d'))
"""


def events_sample_k_per_type(sf_dir: str, k: int = 5):
    """Deterministic fixed-k per-stratum sample: the k events per type
    with the smallest md5(event_id) — 'random' under the hash ordering,
    yet a pure function of the data (resume/backfill/engine-swap
    stable). Per-batch partial top-k bounds the shuffle at k rows per
    (type, batch)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def hashed(t: pa.Table) -> pd.DataFrame:
        import hashlib

        ids = t["event_id"].to_numpy(zero_copy_only=False).astype("int64")
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pd.DataFrame({
            "event_id": ids,
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "_h": h,
        })

    def partial(t: pa.Table) -> pa.Table:
        df = hashed(t)
        out = (df.sort_values(["event_type", "_h"], kind="mergesort")
               .groupby("event_type", sort=False).head(k))
        return table_from_pandas(out, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = (df.sort_values(["event_type", "_h"], kind="mergesort")
               .groupby("event_type", sort=False).head(k)
               .drop(columns=["_h"]))
        return table_from_pandas(out, preserve_index=False)

    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["_bucket"] = (stable_hash(df, ["event_type"]) % 4).astype("int64")
        return table_from_pandas(df, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pandas")
    out = fs_exchange_reduce(partials, _exchange("sample_k"), final)
    import ray.data as rd

    return out if out is not None else rd.from_items([])


EVENTS_SAMPLE_K_SQL = """
SELECT event_id, event_type FROM events
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY md5(CAST(event_id AS VARCHAR))) <= 5
"""


def events_samples(sf_dir: str):
    """Both deterministic sampling disciplines in one driver row,
    union-tagged by method: per-stratum RATE sampling (md5-threshold,
    resume/backfill-stable) and fixed-K per-stratum sampling (k smallest
    md5 per type, per-batch partial top-k bounds the shuffle)."""

    def tag(method):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "method": pa.array([method] * t.num_rows, type=pa.string()),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
            })
        return f

    rate = events_stratified_sample(sf_dir).map_batches(
        tag("rate"), batch_format="pyarrow")
    topk = events_sample_k_per_type(sf_dir).map_batches(
        tag("topk"), batch_format="pyarrow")
    return rate.union(topk)


def EVENTS_SAMPLES_SQL(sf_dir: str) -> str:
    return f"""
SELECT 'rate' AS method, event_id, event_type FROM ({EVENTS_STRATIFIED_SQL})
UNION ALL
SELECT 'topk' AS method, event_id, event_type FROM ({EVENTS_SAMPLE_K_SQL})
"""


def events_type_long(sf_dir: str):
    """Pivot→unpivot round trip: the wide per-user counts melted back to
    long (user_id, event_type, n), zero-count combinations dropped —
    equals the plain GROUP BY. Exercises unpivot end-to-end against a
    SQL oracle (functions/reshape.py:unpivot)."""
    from guac_ray.functions.reshape import unpivot

    cats = ["click", "view", "purchase", "signup", "error"]
    wide = events_type_pivot(sf_dir)
    import pyarrow.compute as pc

    long = unpivot(wide, "user_id", [f"n_{c}" for c in cats],
                   var_name="event_type", value_name="n", var_labels=cats)
    return long.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 0)), batch_format="pyarrow")


EVENTS_TYPE_LONG_SQL = """
SELECT user_id, event_type, count(*) AS n
FROM events GROUP BY user_id, event_type
"""


def events_window_funcs(sf_dir: str):
    """The window-function family in ONE co-partitioned pass (one sort
    per bucket computes every column — functions/window.py): per user
    ordered by (ts, event_id): gap to previous event (lag; -1 for the
    first event so the NULL never crosses engines), running total of
    value (cumsum — both engines add the same doubles in the same
    order), row_number, a 3-row moving sum expressed as
    value + lag1 + lag2 with explicit left-assoc float addition so the
    doubles match the SQL bit-for-bit, and the rolling-aggregate family
    (moving_sum/avg/min/max over ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW) on an integer-cents column so the sliding-window sums are
    exact in both engines."""
    from guac_ray.functions.window import windowed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_vc(df: pd.DataFrame) -> pd.DataFrame:
        df["vc"] = cents(df["value"])
        return df

    ev = ev.map_batches(add_vc, batch_format="pandas")
    w = windowed(ev, by="user_id", order=["ts", "event_id"],
                 ops={"prev_ts": ("lag", "ts"),
                      "running_value": ("cumsum", "value"),
                      "rn": ("row_number",),
                      "l1": ("lag", "value"),
                      "l2": ("lag", "value", 2),
                      # positional/fractional ops are deterministic here
                      # because (ts, event_id) is tie-free
                      "nt4": ("ntile", 4),
                      "prank": ("percent_rank",),
                      "msum3": ("moving_sum", "vc", 3),
                      "mavg3": ("moving_avg", "vc", 3),
                      "mmin3": ("moving_min", "vc", 3),
                      "mmax3": ("moving_max", "vc", 3),
                      "first_vc": ("first_value", "vc"),
                      "last_vc": ("last_value", "vc")},
                 exchange_base=_exchange("window_funcs"), num_buckets=8)

    def finish(df: pd.DataFrame) -> pa.Table:
        ts = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        pv = df["prev_ts"].to_numpy().astype("datetime64[us]").view("int64")
        gap = np.where(df["prev_ts"].notna(), ts - pv, -1)
        mov3 = (df["value"].to_numpy()
                + df["l1"].fillna(0.0).to_numpy()) + df["l2"].fillna(0.0).to_numpy()
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy().astype("int64")),
            "gap_us": pa.array(gap.astype("int64")),
            "running_value": pa.array(df["running_value"].to_numpy()),
            "rn": pa.array(df["rn"].to_numpy().astype("int64")),
            "mov3": pa.array(mov3),
            "nt4": pa.array(df["nt4"].to_numpy().astype("int64")),
            "prank": pa.array(df["prank"].to_numpy()),
            # rolling never sees a NULL here (vc is derived, non-null),
            # so sum/min/max round-trip int64 exactly
            "msum3": pa.array(df["msum3"].to_numpy().astype("int64")),
            "mavg3": pa.array(df["mavg3"].to_numpy()),
            "mmin3": pa.array(df["mmin3"].to_numpy().astype("int64")),
            "mmax3": pa.array(df["mmax3"].to_numpy().astype("int64")),
            "first_vc": pa.array(df["first_vc"].to_numpy().astype("int64")),
            "last_vc": pa.array(df["last_vc"].to_numpy().astype("int64")),
        })

    return w.map_batches(finish, batch_format="pandas")


EVENTS_WINDOW_SQL = """
SELECT event_id,
       coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)), -1) AS gap_us,
       sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       (value + coalesce(lag(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id), 0))
        + coalesce(lag(value, 2) OVER
           (PARTITION BY user_id ORDER BY ts, event_id), 0) AS mov3,
       CAST(ntile(4) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS nt4,
       percent_rank() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prank,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w3
            AS BIGINT) AS msum3,
       avg(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w3 AS mavg3,
       min(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w3 AS mmin3,
       max(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w3 AS mmax3,
       first_value(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS first_vc,
       last_value(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_vc
FROM events
WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def events_zscore(sf_dir: str):
    """Grouped feature scaling (functions/scale.py): per event_type,
    z-score + min-max of the integer-cents value — exact group stats
    from the bucketed two-phase aggregate, per-row doubles evaluated in
    the one fixed expression order the SQL oracle mirrors bit-for-bit.
    Zero-variance groups pin to 0.0 in both engines."""
    from guac_ray.functions.scale import feature_scale

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def add_vc(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(vc=cents(df["value"]))

    out = feature_scale(ev.map_batches(add_vc, batch_format="pandas"),
                        by="event_type", col="vc",
                        exchange_base=_exchange("zscore"), num_buckets=8)
    return out.select_columns(["event_id", "z", "mm"])


EVENTS_ZSCORE_SQL = """
WITH b AS (SELECT event_id, event_type,
                  CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
           FROM events),
g AS (SELECT event_type,
             CAST(sum(vc) AS BIGINT) AS s,
             CAST(sum(vc*vc) AS BIGINT) AS q,
             count(*) AS n,
             min(vc) AS mn, max(vc) AS mx
      FROM b GROUP BY event_type)
SELECT b.event_id,
  CASE WHEN g.mn = g.mx THEN 0.0
       ELSE (CAST(b.vc AS DOUBLE) - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
            / sqrt((CAST(g.q AS DOUBLE)
                    - (CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE))
                      / CAST(g.n AS DOUBLE)) / CAST(g.n AS DOUBLE))
  END AS z,
  CASE WHEN g.mn = g.mx THEN 0.0
       ELSE CAST(b.vc - g.mn AS DOUBLE) / CAST(g.mx - g.mn AS DOUBLE)
  END AS mm
FROM b JOIN g USING (event_type)
"""


def events_winsorized(sf_dir: str):
    """Winsorization (functions/scale.py:winsorize): per event_type,
    clip the integer-cents value at its exact [p05, p95] — bounds from
    the distributed exact-quantile operator (quantile_disc rank rule),
    clipping integer-exact, so DuckDB's least/greatest over its own
    quantile_disc reproduces every row."""
    from guac_ray.functions.scale import winsorize

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def add_vc(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(vc=cents(df["value"]))

    out = winsorize(ev.map_batches(add_vc, batch_format="pandas"),
                    "vc", 0.05, 0.95, by="event_type", out="vw",
                    num_buckets=8)
    return out.select_columns(["event_id", "vw"])


EVENTS_WINSOR_SQL = """
WITH b AS (SELECT event_id, event_type,
                  CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
           FROM events),
g AS (SELECT event_type,
             quantile_disc(vc, 0.05) AS qlo,
             quantile_disc(vc, 0.95) AS qhi
      FROM b GROUP BY event_type)
SELECT b.event_id, least(greatest(b.vc, g.qlo), g.qhi) AS vw
FROM b JOIN g USING (event_type)
"""


def events_intervals(sf_dir: str):
    """Interval coalescing (functions/streams.py:coalesce_intervals):
    each event becomes a span [ts, ts + value-cents milliseconds]; per
    user, overlapping-or-touching spans merge into islands (min start /
    max end / member count) — the spans analog of sessionization.
    Integer microsecond endpoints keep both engines exact; oracle is
    the classic SQL gaps-and-islands window idiom."""
    from guac_ray.functions.streams import coalesce_intervals

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        s = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        # value-cents × 10 s ⇒ day-scale spans: ~3.5× rows merge at sf0.01
        e = s + cents(df["value"]) * 10_000_000
        return pd.DataFrame({"user_id": df["user_id"], "s": s, "e": e})

    out = coalesce_intervals(
        ev.map_batches(spans, batch_format="pandas"), by="user_id",
        start_col="s", end_col="e",
        exchange_base=_exchange("intervals"), num_buckets=8)
    return out


EVENTS_INTERVALS_SQL = """
WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts)
                   + CAST(floor(value*100 + 0.5) AS BIGINT) * 10000000 AS e
            FROM events),
o AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM iv),
isl AS (SELECT user_id, s, e,
               sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS gid
        FROM o)
SELECT user_id, min(s) AS start, max(e) AS "end",
       count(*) AS n_merged
FROM isl GROUP BY user_id, gid
"""


def events_rank_dense(sf_dir: str):
    """rank / dense_rank with SQL tie semantics: per user, events ranked
    by event_type (a deliberately tie-rich order key — both ranks are
    functions of the order-key VALUE, so the result is deterministic
    and hash-checkable even though the physical tie order is not)."""
    from guac_ray.functions.window import windowed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
    w = windowed(ev, by="user_id", order=["event_type"],
                 ops={"rk": ("rank",), "dr": ("dense_rank",)},
                 exchange_base=_exchange("window_rank"), num_buckets=8)
    return w.select_columns(["event_id", "rk", "dr"])


EVENTS_RANK_SQL = """
SELECT event_id,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS rk,
       CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS dr
FROM events
"""


def events_latest_per_user(sf_dir: str):
    """Keep-latest compaction (the CDC/upsert primitive): one row per
    user — their newest event. Per-batch partial keeps the shuffle at
    one row per (user, batch) (functions/window.py:keep_latest)."""
    from guac_ray.functions.window import keep_latest

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "ts"])
    out = keep_latest(ev, by="user_id", order=["ts", "event_id"],
                      exchange_base=_exchange("keep_latest"), num_buckets=8)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "last_event_id": t["event_id"],
            "last_type": t["event_type"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


EVENTS_LATEST_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def events_value_quantiles(sf_dir: str):
    """Distributed EXACT grouped percentiles without a global sort:
    sample → range-bucket counts through the fs exchange → one filtered
    refinement pass (functions/quantiles.py). Matches DuckDB
    ``quantile_disc`` element-for-element."""
    from guac_ray.functions.quantiles import exact_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return exact_quantiles(
        ev, "value", {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        by=["event_type"], num_range_buckets=128, num_buckets=8)


def events_quantiles_cont(sf_dir: str):
    """Interpolated grouped percentiles (``quantile_cont`` parity —
    functions/quantiles.py interpolate mode): DOUBLE rank h=p(n-1)
    (pinned empirically — cont uses double where disc uses exact
    decimal), lerp of the two straddling order statistics in DuckDB's
    pinned ``lo*(1-f)+hi*f`` double order. Same sortless three passes;
    a quantile fetches at most one extra candidate rank."""
    from guac_ray.functions.quantiles import exact_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return exact_quantiles(
        ev, "value", {"p25": 0.25, "p50": 0.5, "p75": 0.75},
        by=["event_type"], num_range_buckets=128, num_buckets=8,
        interpolate=True)


EVENTS_QUANTILES_CONT_SQL = """
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.75) AS p75
FROM events GROUP BY event_type
"""


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90,
       quantile_disc(value, 0.99) AS p99
FROM events GROUP BY event_type
"""


def purchase_signup_asof(sf_dir: str):
    """As-of join: each purchase event paired with the user's most recent
    prior-or-equal signup (co-partitioned merge_asof through the fs
    exchange; oracle = DuckDB native ASOF JOIN)."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def pick(kind, extra=None):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], kind))
            cols = {"user_id": t["user_id"], "ts": t["ts"]}
            if kind == "purchase":
                cols["event_id"] = t["event_id"]
            else:
                cols["signup_ts"] = t["ts"]  # keep right ts under its own name
            return pa.table(cols)

        return f

    left = ev.map_batches(pick("purchase"), batch_format="pyarrow")
    right = ev.map_batches(pick("signup"), batch_format="pyarrow")
    ex = ("/dev/shm" if os.path.isdir("/dev/shm") else "/tmp") + "/guac_ray_exchange/asof"
    out = asof_join(left, right, by="user_id", on="ts", exchange_dir=ex,
                    num_buckets=8)
    return out.select_columns(["event_id", "signup_ts"])


PURCHASE_SIGNUP_SQL = """
SELECT l.event_id, r.ts AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def purchase_click_window(sf_dir: str):
    """Banded range join (one row per match, vs as-of's latest-only):
    every (purchase, click) pair for the same user with the click in the
    30 minutes up to and including the purchase — the attribution-window
    shape. Both sides co-partition on user through the fs exchange; the
    per-bucket banded merge is three vectorized searchsorted calls
    (functions/joins.py:range_join)."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import range_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def pick(kind: str, idname: str):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], kind))
            return pa.table({idname: t["event_id"], "user_id": t["user_id"],
                             "ts": t["ts"]})

        return f

    left = ev.map_batches(pick("purchase", "purchase_id"), batch_format="pyarrow")
    right = ev.map_batches(pick("click", "click_id"), batch_format="pyarrow")
    out = range_join(left, right, by="user_id", on="ts",
                     lower=pd.Timedelta("-30min"), upper=pd.Timedelta(0),
                     exchange_dir=_exchange("rangejoin"), num_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # normalize both ts columns to int64 microseconds regardless of the
        # datetime64 unit pandas surfaced ([us] from parquet, [ns] elsewhere)
        pts = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        cts = df["ts_r"].to_numpy().astype("datetime64[us]").view("int64")
        gap = pd.Series(pts - cts)
        return pd.DataFrame({
            "purchase_id": df["purchase_id"].astype("int64"),
            "click_id": df["click_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "gap_us": gap.astype("int64"),
        })

    return out.map_batches(finish, batch_format="pandas")


PURCHASE_CLICK_WINDOW_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
"""


# ---------------------------------------------------------------------------
# documents / embeddings operators
# ---------------------------------------------------------------------------

def exact_dedup_docs(sf_dir: str):
    from guac_ray.functions.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


EXACT_DEDUP_SQL = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)"


def doc_top_bigrams(sf_dir: str, k: int = 20):
    """Corpus n-gram statistics (text-analysis family): top-k word
    bigrams. Shape: per-batch Counter partials (tokenization is
    inherently per-doc; only the (bigram, cnt) partials enter the
    shuffle — at 100 TB the shuffled bytes are vocab², not corpus
    size), grouped_agg sum, driver-side top-k on the small result."""
    from collections import Counter

    from guac_ray.stages.groupagg import grouped_agg

    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        from guac_ray.functions.text import sql_ws_tokens

        for txt in t["text"].to_pylist():
            w = sql_ws_tokens(txt)
            c.update(map(" ".join, zip(w, w[1:])))
        return pa.table({
            "bigram": pa.array(list(c.keys()), type=pa.string()),
            "cnt": pa.array(list(c.values()), type=pa.int64()),
        })

    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["bigram"], {"cnt": ("cnt", "sum")}, num_buckets=8)
    out = agg.to_pandas()
    if out.empty:
        return pd.DataFrame({"bigram": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    out = out.sort_values(["cnt", "bigram"], ascending=[False, True]).head(k)
    return out.astype({"cnt": "int64"}).reset_index(drop=True)


TOP_BIGRAMS_SQL = r"""
WITH t AS (
  SELECT regexp_split_to_array(lower(text), '\s+') AS w FROM documents
), b AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i)
)
SELECT w1 || ' ' || w2 AS bigram, CAST(count(*) AS BIGINT) AS cnt
FROM b WHERE w1 <> '' AND w2 <> ''
GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20
"""


def doc_tfidf(sf_dir: str):
    """Per-doc top-3 terms by integer fixed-point tf-idf
    (``score_fp = tf*1e6 // df`` — exact in every engine; see
    functions/text.py:tfidf_top_terms). The df table shuffles
    vocabulary-scale partials and broadcasts once; the per-doc top-k is
    batch-local (a doc is one row), so no token-scale data moves."""
    from guac_ray.functions.text import tfidf_top_terms

    return tfidf_top_terms(_read(sf_dir, "documents", ["doc_id", "text"]),
                           top_k=3)


DOC_TFIDF_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
), dfr AS (
  SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfr.doc_freq,
         tf.tf * 1000000 // dfr.doc_freq AS score_fp,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * 1000000 // dfr.doc_freq DESC, tf.term
         ) AS rn
  FROM tf JOIN dfr USING (term)
)
SELECT doc_id, term, tf, doc_freq, score_fp FROM scored WHERE rn <= 3
"""


def doc_postings(sf_dir: str):
    """Full inverted-index build (functions/text.py
    ``build_postings``): one row per distinct (term, doc) with tf and
    doc_freq — the materialized retrieval artifact, emitted through
    the co-partitioned term hash join rather than a broadcast so the
    path holds when the vocabulary exceeds broadcast budget. The tf
    pass is batch-local; df is the vocabulary-scale grouped_agg."""
    from guac_ray.functions.text import build_postings

    return build_postings(_read(sf_dir, "documents", ["doc_id", "text"]),
                          exchange_base=_exchange("postings"))


DOC_POSTINGS_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
), dfr AS (
  SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY 1
)
SELECT tf.term, tf.doc_id, tf.tf, dfr.doc_freq
FROM tf JOIN dfr USING (term)
"""


def doc_domain_terms(sf_dir: str):
    """Top-30 domain-discriminative terms (functions/text.py
    ``domain_log_odds``): smoothed log-odds ratio between the md5-split
    target side (≥ 0xCC, the doc_dsir split) and the raw pool, in
    exact integer micro-nats with ct ≥ 5 — the per-TERM feature table
    the doc_dsir per-DOC weights derive from. Two vocab-scale
    exchanges (one corpus scan total); scoring over the union
    vocabulary, the engine's accepted size-guarded driver product."""
    from guac_ray.functions.text import domain_log_odds
    from guac_ray.pipelines.curation import md5_first_byte

    def side(want_target: bool):
        ds = _read(sf_dir, "documents", ["doc_id", "text"])

        def pick(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
            keep = (md5_first_byte(ids) >= 0xCC) == want_target
            return t.filter(pa.array(keep))

        return ds.map_batches(pick, batch_format="pyarrow")

    return domain_log_odds(side(True), side(False))


DOC_DOMAIN_TERMS_SQL = r"""
WITH lab AS (
  SELECT doc_id, lower(text) AS txt,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'cc'
              THEN 'target' ELSE 'raw' END AS side
  FROM documents
), tok AS (
  SELECT side, unnest(regexp_split_to_array(txt, '\s+')) AS term
  FROM lab
), tok2 AS (
  SELECT side, term FROM tok WHERE term <> ''
), vocab AS (
  SELECT term,
         CAST(sum(CASE WHEN side = 'target' THEN 1 ELSE 0 END)
              AS BIGINT) AS ct,
         CAST(sum(CASE WHEN side = 'raw' THEN 1 ELSE 0 END)
              AS BIGINT) AS cr
  FROM tok2 GROUP BY 1
), tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
  FROM vocab
)
SELECT term, ct, cr,
       CAST(floor(1000000 * (((ln(ct + 1) - ln(nt - ct + 1))
                              - ln(cr + 1)) + ln(nr - cr + 1))
                  + 0.5) AS BIGINT) AS score_fp
FROM vocab, tot
WHERE ct >= 5
ORDER BY score_fp DESC, term
LIMIT 30
"""


def doc_quality(sf_dir: str):
    """Per-doc quality metrics + whitespace-normalized md5 fingerprint in
    ONE pass (the former separate doc_fingerprints query is folded in —
    both are per-row maps over the same table, so one driver row checks
    the zero-copy utf8 scanner AND the Fingerprinter)."""
    from guac_ray.functions.text import Fingerprinter, QualityScorer

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    class IntQuality(QualityScorer):
        def __init__(self):
            super().__init__()
            self._fp = Fingerprinter()

        def __call__(self, batch: pa.Table) -> pa.Table:
            from guac_ray.functions.text import utf8_stats

            # zero-copy byte scan; n_alpha (ASCII alpha chars) ==
            # length after regexp_replace('[^A-Za-z]','') in the oracle
            n_tok, n_alpha, n_chars = utf8_stats(batch["text"])
            fps = [self._fp.fp(t) for t in batch["text"].to_pylist()]
            return pa.table({
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(n_chars, type=pa.int64()),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "n_alpha": pa.array(n_alpha, type=pa.int64()),
                "fingerprint": pa.array(fps, type=pa.string()),
            })

    return ds.map_batches(IntQuality, batch_format="pyarrow", concurrency=(1, 2))


DOC_QUALITY_SQL = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(coalesce(array_length(regexp_extract_all(text, '[A-Za-z0-9_]+')), 0) AS BIGINT) AS n_tokens,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\v]+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def doc_lang_id(sf_dir: str):
    """Heuristic language ID — no SQL oracle (model-style scoring);
    accuracy asserted against the ``lang`` label column in pytest."""
    from guac_ray.functions.text import lang_id

    return lang_id(_read(sf_dir, "documents", ["doc_id", "text"]))


def knn_brute_q0(sf_dir: str, k: int = 10):
    """Exact cosine top-k for query = embedding of vec_id 0. Returns the
    neighbor id list only (scores differ across engines in the last float
    bits; the ID SET is the deterministic contract)."""
    from guac_ray.functions.ann import knn_brute

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(q[q.vec_id == 0].embedding.iloc[0], dtype=np.float64)
    out = knn_brute(emb, [0], qvec[None, :], k=k)
    return out.select_columns(["vec_id"])


KNN_SQL = """
SELECT vec_id FROM embeddings
ORDER BY list_cosine_similarity(embedding,
        (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
LIMIT 10
"""


def knn_ivf_full_q0(sf_dir: str, k: int = 10):
    """IVF with ``nprobe = n_clusters`` probes EVERY inverted list —
    exhaustive, so the result must equal exact brute force. This pins
    the IVF assign/score path against the same SQL oracle as
    ``knn_brute`` (the PRUNED variant — nprobe < n_clusters — is
    pytest-bounded on recall in tests/test_ann.py; its former SUITE
    entry was rows-only and folded into this one)."""
    from guac_ray.functions.ann import knn_ivf

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(q[q.vec_id == 0].embedding.iloc[0], dtype=np.float64)
    out = knn_ivf(emb, [0], qvec[None, :], k=k, n_clusters=8, nprobe=8)
    return out.select_columns(["vec_id"])


def knn_search_q0(sf_dir: str, k: int = 10):
    """Brute-force AND exhaustive-probe IVF top-k in one driver row: the
    two paths are asserted IDENTICAL in-query (a divergence raises →
    driver error), then the brute result is checked against the SQL
    oracle. Folds the former separate knn_brute / knn_ivf_full entries;
    the PRUNED IVF (nprobe < n_clusters) stays recall-bounded in
    tests/test_ann.py."""
    brute = knn_brute_q0(sf_dir, k=k).to_pandas()
    ivf = knn_ivf_full_q0(sf_dir, k=k).to_pandas()
    if brute.vec_id.tolist() != ivf.vec_id.tolist():
        raise AssertionError(
            f"IVF(nprobe=all) diverged from brute force: "
            f"{ivf.vec_id.tolist()} != {brute.vec_id.tolist()}")
    return brute


def neardup_docs_minhash(sf_dir: str):
    """MinHash-LSH near-dup pairs over documents, signature-verified
    through the distributed fs-exchange joins (rows-only; exact-Jaccard
    verification covered in pytest on crafted near-dups).

    Banding 128 perms as 16 bands × 8 rows puts the LSH threshold at
    (1/16)^(1/8) ≈ 0.71 — matched to the 0.7 verify threshold. The old
    32×4 banding (threshold ≈ 0.42) generated ~2000 false candidates per
    true pair at sf0.1; precision at the banding stage is what bounds
    the candidate shuffle at 100 TB."""
    from guac_ray.functions.dedup import MinHasher, lsh_candidate_pairs, minhash_bands

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # materialize: the signature table feeds both banding and the final
    # verification — without pinning it the MinHasher would execute twice
    sigs = ds.map_batches(MinHasher, batch_format="pyarrow",
                          batch_size=256, concurrency=(2, 8)).materialize()
    return lsh_candidate_pairs(minhash_bands(sigs, 16), threshold=0.7, sigs=sigs)


def neardup_docs_simhash(sf_dir: str):
    from guac_ray.functions.dedup import simhash_pairs

    return simhash_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                         max_hamming=3, concurrency=(1, 2))


def neardup_embeddings(sf_dir: str):
    """Embedding near-dup pairs via the size-guarded planner: at suite
    scale the table is under ``exact_limit`` so the plan is all-pairs
    exact cosine (recall 1.0 ⇒ byte-stable vs the brute-force SQL oracle
    even for pairs at exactly the threshold). The LSH and join-verify
    regimes engage above the guards and are pytest-covered."""
    from guac_ray.functions.ann import embedding_neardup

    out = embedding_neardup(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                            threshold=0.95).to_pandas()
    if out.empty:
        # Ray's to_pandas drops columns on a fully-empty Dataset; the
        # oracle compare needs the typed (a, b) frame either way
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return out[["a", "b"]].astype({"a": "int64", "b": "int64"})


NEARDUP_EMB_SQL = """
SELECT l.vec_id AS a, r.vec_id AS b
FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
WHERE list_cosine_similarity(l.embedding, r.embedding) >= 0.95
"""


def simjoin_docs(sf_dir: str):
    """EXACT n-gram Jaccard similarity join (prefix-filtered — see
    functions/simjoin.py): every pair ≥ 0.8, no LSH misses, verified by
    full-set intersection, byte-identical to the O(n²) SQL oracle.
    Shingles are 10-grams: this corpus is template-heavy, and a 5-gram
    vocabulary saturates (~2k distinct grams over 5k docs at sf0.1) so
    NO exact algorithm can prune — 10-grams give a 50k-gram vocabulary
    and the prefix filter cuts raw candidates 60M → ~2M (measured)."""
    from guac_ray.functions.simjoin import jaccard_similarity_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_similarity_join(
        docs, threshold=0.8, shingle_n=10,
        exchange_base=_exchange("simjoin"), num_buckets=8)


SIMJOIN_SQL = """
WITH docs AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
  FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(length(s) - 9, 1)),
             i -> substr(s, i, 10)))) AS g
  FROM docs),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
co AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
       FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT da, db, c * 1.0 / (sa.n + sb.n - c) AS j
FROM co
JOIN sz sa ON co.da = sa.doc_id
JOIN sz sb ON co.db = sb.doc_id
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
"""


def supplier_name_matches(sf_dir: str):
    """EXACT edit-distance-≤1 entity self-join (functions/simjoin.py
    ``edit1_join`` — FastSS deletion neighborhoods + exact verify):
    supplier names within one typo of each other. The sequentially
    numbered names make the answer dense and position-structured
    (digit substitutions), exercising both the candidate banding and
    the distance-2 rejections; DuckDB's ``levenshtein`` is the
    brute-force oracle."""
    from guac_ray.functions.simjoin import edit1_join

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return edit1_join(ds, col="s_name", id_col="s_suppkey",
                      exchange_base=_exchange("edit1"))


SUPPLIER_NAME_MATCHES_SQL = """
SELECT a.s_suppkey AS a, b.s_suppkey AS b,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS d
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


def corpus_curation(sf_dir: str):
    """The flagship TRAINING-DATA pipeline: quality filter → exact
    dedup → EXACT near-dup removal (prefix-filtered Jaccard join +
    connected components) → split assignment, composed end-to-end from
    the engine's operators (pipelines/curation.py) — and, because every
    stage is deterministic, reproduced exactly by one SQL statement
    (recursive CTE for the components)."""
    from guac_ray.pipelines.curation import curate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return curate(docs, exchange_base=_exchange("curation"), num_buckets=8)


CORPUS_CURATION_SQL = """
WITH RECURSIVE q AS (
  SELECT doc_id, text FROM documents
  WHERE coalesce(array_length(regexp_extract_all(text, '[A-Za-z0-9_]+')), 0) >= 20
    AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100
        >= 60 * length(text)
),
ded AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
surv AS (SELECT q.doc_id, q.text FROM q JOIN ded USING (doc_id)),
docs3 AS (SELECT doc_id,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
          FROM surv),
sh AS (SELECT doc_id,
              unnest(list_distinct(list_transform(
                  generate_series(1, greatest(length(s) - 9, 1)),
                  i -> substr(s, i, 10)))) AS g
       FROM docs3),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
co AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
       FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
pairs AS (SELECT da, db FROM co
          JOIN sz sa ON co.da = sa.doc_id
          JOIN sz sb ON co.db = sb.doc_id
          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
e2 AS (SELECT da AS a, db AS b FROM pairs
       UNION ALL SELECT db AS a, da AS b FROM pairs),
rr(node, lbl) AS (
  SELECT doc_id, doc_id FROM surv
  UNION
  SELECT e2.b, rr.lbl FROM rr JOIN e2 ON e2.a = rr.node WHERE rr.lbl < e2.b
),
roots AS (SELECT node, min(lbl) AS root FROM rr GROUP BY node)
SELECT s.doc_id,
       CASE WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < 'cc'
            THEN 'train' ELSE 'test' END AS split
FROM surv s JOIN roots r ON r.node = s.doc_id
WHERE r.root = s.doc_id
"""


def doc_train_test_split(sf_dir: str):
    """Deterministic, engine-portable dataset split: a document's split
    is a pure function of md5(doc_id) — the first two hex chars compared
    against 'cc' (204/256 ≈ 80% train). No RNG, no state: any engine,
    any partitioning, any rerun produces the same assignment (the only
    sampling discipline that survives resume/backfill at 100 TB)."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        from guac_ray.pipelines.curation import md5_first_byte

        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        first = md5_first_byte(ids)
        return pa.table({
            "doc_id": pa.array(ids),
            "split": pa.array(np.where(first < 0xCC, "train", "test")),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


TRAIN_TEST_SQL = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
            THEN 'train' ELSE 'test' END AS split
FROM documents
"""


def doc_decontaminate(sf_dir: str):
    """Train/test contamination audit over the md5 split: per test doc,
    distinct word-trigram shingles shared with ANY train doc. Composes
    the large-large semi hash join (on the shingle), a partial-combine
    grouped count, and a left hash join for the totals
    (pipelines/curation.py:decontaminate). The corpus's planted
    duplicates make the answer non-trivial at every sf."""
    from guac_ray.pipelines.curation import decontaminate, md5_first_byte

    def side(want_train: bool):
        ds = _read(sf_dir, "documents", ["doc_id", "text"])

        def pick(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
            keep = (md5_first_byte(ids) < 0xCC) == want_train
            return t.filter(pa.array(keep))

        return ds.map_batches(pick, batch_format="pyarrow")

    return decontaminate(side(True), side(False))


_BM25_QUERIES = {
    1: ["hash", "join", "batch"],
    2: ["window", "stream", "filter"],
    3: ["vector", "column", "scan", "nonexistenttermxyz"],
}


def doc_bm25(sf_dir: str):
    """Fixed-point BM25 top-10 retrieval (functions/text.py
    ``bm25_topk``) for three fixed term queries over the documents
    table — the lexical-search complement of knn_search. Query 3
    carries a term absent from every corpus (contributes nothing on
    both engines). Integer-exact scoring; the oracle evaluates the
    SAME quantized recurrence with window-function top-k."""
    from guac_ray.functions.text import bm25_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(docs, _BM25_QUERIES, k=10)


def _bm25_sql(queries: dict, k: int = 10, scale: int = 1_000_000) -> str:
    qvals = ", ".join(f"({q}, '{t}')"
                      for q, ts in sorted(queries.items()) for t in ts)
    return f"""
WITH q(qid, term) AS (VALUES {qvals}),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok2 GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS total
  FROM dl
), df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok2 WHERE term IN (SELECT term FROM q) GROUP BY 1
), idf AS (
  SELECT term,
         CAST(floor({scale}.0 * ln(CAST(2 * (n - df) + 1 AS DOUBLE) /
                                   CAST(2 * df + 1 AS DOUBLE) + 1.0)
                    + 0.5) AS BIGINT) AS idf
  FROM df, stats
), tf AS (
  SELECT t.doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
  FROM tok2 t JOIN (SELECT DISTINCT term FROM q) qt USING (term)
  GROUP BY 1, 2
), kd AS (
  SELECT dl.doc_id,
         (1200 * (250 + (750 * dl.dl * s.n) // s.total)) // 1000 AS kd
  FROM dl, stats s
), scores AS (
  SELECT q.qid, tf.doc_id,
         CAST(sum((idf.idf * tf.tf * 2200) // (tf.tf * 1000 + kd.kd))
              AS BIGINT) AS score_fp
  FROM q JOIN tf USING (term)
  JOIN idf USING (term)
  JOIN kd ON kd.doc_id = tf.doc_id
  GROUP BY 1, 2
  HAVING sum((idf.idf * tf.tf * 2200) // (tf.tf * 1000 + kd.kd)) > 0
)
SELECT qid, doc_id, score_fp,
       CAST(row_number() OVER (PARTITION BY qid
                               ORDER BY score_fp DESC, doc_id) AS BIGINT)
           AS rank
FROM scores
QUALIFY rank <= {k}
"""


DOC_BM25_SQL = _bm25_sql(_BM25_QUERIES)


def doc_ngram_novelty(sf_dir: str):
    """Per-doc 5-gram novelty under first-occurrence (min doc_id)
    attribution (pipelines/curation.py ``ngram_novelty``): the
    keep-first complement of doc_dup_passages' order-free coverage —
    planted duplicates score 0 on their later copies. One by-shingle
    exchange (in-bucket min IS the global owner) + the grouped_agg
    combine; novelty_fp is int64 floor division."""
    from guac_ray.pipelines.curation import ngram_novelty

    return ngram_novelty(_read(sf_dir, "documents", ["doc_id", "text"]),
                         ngram=5)


DOC_NOVELTY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
), w AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ts, i, i + 4), ' ') AS s
  FROM (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) >= 5) tt,
       LATERAL (SELECT unnest(generate_series(1, n - 4)) AS i) g
), own AS (
  SELECT s, min(doc_id) AS owner FROM w GROUP BY 1
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN w.doc_id = own.owner THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(1000000 * sum(CASE WHEN w.doc_id = own.owner
                               THEN 1 ELSE 0 END) // count(*)
            AS BIGINT) AS novelty_fp
FROM w JOIN own USING (s)
GROUP BY 1
"""


_HYBRID_CAND = 20   # candidates taken from each retriever
_HYBRID_K = 10      # fused results returned
_RRF_BASE = 60      # the standard reciprocal-rank-fusion constant


def doc_hybrid_search(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009)
    of the fixed-point BM25 lexical ranking (query terms 'hash join
    batch') and the exact cosine kNN vector ranking (query = vec 0's
    embedding, doc_id ≡ vec_id) — the fusion step every modern RAG /
    search stack runs over its two retriever legs. Each leg returns
    its top-20 through its own distributed path (bm25_topk /
    knn_brute); fusion itself touches only those 2 × 20 candidate rows
    on the driver — final-top-k merges are driver-sized by
    construction. RRF is pure integer arithmetic
    (``1_000_000 // (60 + rank)`` summed over the legs that returned
    the doc, absent legs contribute 0), so the fused ranking is
    bit-exact; only RANKS cross the float boundary, and both engines'
    cosine orderings agree wherever adjacent-candidate gaps exceed the
    float32/float64 kernel delta (~1e-7; measured ≥ 9e-5 here —
    knn_search pins the same property in the gate)."""
    from guac_ray.functions.ann import knn_brute
    from guac_ray.functions.text import bm25_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    lex = bm25_topk(docs, {1: _BM25_QUERIES[1]},
                    k=_HYBRID_CAND).to_pandas()[["doc_id", "rank"]]
    lex = lex.rename(columns={"rank": "lex_rank"})

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qvec = np.asarray(q[q.vec_id == 0].embedding.iloc[0], dtype=np.float64)
    vec = knn_brute(emb, [0], qvec[None, :], k=_HYBRID_CAND).to_pandas()
    vec = (vec.sort_values(["score", "vec_id"], ascending=[False, True])
           .reset_index(drop=True))
    vec["vec_rank"] = np.arange(1, len(vec) + 1, dtype="int64")
    vec = vec[["vec_id", "vec_rank"]].rename(columns={"vec_id": "doc_id"})

    from guac_ray.functions.ann import rrf_fuse

    return rrf_fuse([("lex_rank", lex), ("vec_rank", vec)],
                    key="doc_id", base=_RRF_BASE, k=_HYBRID_K)


DOC_HYBRID_SQL = f"""
WITH lex AS (
  SELECT doc_id, rank AS lex_rank
  FROM ({_bm25_sql({1: _BM25_QUERIES[1]}, k=_HYBRID_CAND)})
), vec AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (
              ORDER BY list_cosine_similarity(embedding,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
              vec_id) AS BIGINT) AS vec_rank
  FROM embeddings
  QUALIFY vec_rank <= {_HYBRID_CAND}
), fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         COALESCE(lex.lex_rank, 0) AS lex_rank,
         COALESCE(vec.vec_rank, 0) AS vec_rank,
         (CASE WHEN lex.lex_rank IS NULL THEN 0
               ELSE 1000000 // ({_RRF_BASE} + lex.lex_rank) END
          + CASE WHEN vec.vec_rank IS NULL THEN 0
                 ELSE 1000000 // ({_RRF_BASE} + vec.vec_rank) END) AS rrf_fp
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT doc_id, lex_rank, vec_rank, CAST(rrf_fp AS BIGINT) AS rrf_fp
FROM fused ORDER BY rrf_fp DESC, doc_id LIMIT {_HYBRID_K}
"""


def doc_pmi_collocations(sf_dir: str):
    """Top-30 bigram collocations by fixed-point PMI
    (functions/text.py ``pmi_bigrams``) — the Church-&-Hanks
    collocation statistic a corpus pipeline mines multi-word
    expressions with before tokenizer training. Micro-nat ``ln``
    quantization (the surprisal expression-tree discipline) keeps the
    score integer-exact on any engine; ranking is (pmi_fp DESC,
    bigram ASC) over bigrams with count ≥ 5."""
    from guac_ray.functions.text import pmi_bigrams

    return pmi_bigrams(_read(sf_dir, "documents", ["text"]),
                       min_count=5, top_k=30)


DOC_PMI_SQL = r"""
WITH t AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), tok AS (
  SELECT unnest(w) AS term FROM t
), uni AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM uni
), b AS (
  SELECT w[CAST(i AS INT) + 1] AS w1, w[CAST(i AS INT) + 2] AS w2
  FROM t, LATERAL (SELECT unnest(range(len(w) - 1)) AS i) li
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
  FROM b GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT big.w1 || ' ' || big.w2 AS bigram, big.c_xy AS cnt,
       CAST(floor(1000000.0 * (ln(CAST(big.c_xy AS DOUBLE)) +
                               ln(CAST(tot.n AS DOUBLE)) -
                               ln(CAST(u1.c AS DOUBLE)) -
                               ln(CAST(u2.c AS DOUBLE))) + 0.5)
            AS BIGINT) AS pmi_fp
FROM big
JOIN uni u1 ON u1.term = big.w1
JOIN uni u2 ON u2.term = big.w2
CROSS JOIN tot
ORDER BY pmi_fp DESC, bigram LIMIT 30
"""


def doc_lm_xent(sf_dir: str):
    """Bigram-LM cross-entropy per document (functions/text.py
    ``bigram_lm_xent``) — the CCNet/KenLM-style perplexity quality
    filter (Wenzek et al. 2020): a Laplace-smoothed bigram LM trained
    on the corpus scores every document's total/mean conditional
    surprisal in exact integer micro-nats (perplexity = exp(mean) is
    monotone in ``mean_xent``, so ranking on the integer column IS the
    perplexity filter). Shares ``_vocab_counts`` + ``_bigram_counts``
    with tfidf/surprisal/PMI; the per-doc sum is one vectorized
    ``ws_shingles`` + searchsorted + ``np.add.at`` pass per batch —
    batch-local, no token-scale shuffle."""
    from guac_ray.functions.text import bigram_lm_xent

    return bigram_lm_xent(_read(sf_dir, "documents", ["doc_id", "text"]))


DOC_LM_XENT_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), tok AS (
  SELECT unnest(w) AS term FROM t
), uni AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
), vsz AS (
  SELECT CAST(count(*) AS BIGINT) AS v FROM uni
), b AS (
  SELECT doc_id, w[CAST(i AS INT) + 1] AS w1, w[CAST(i AS INT) + 2] AS w2
  FROM t, LATERAL (SELECT unnest(range(len(w) - 1)) AS i) li
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy FROM b GROUP BY 1, 2
), q AS (
  SELECT w1, w2,
         CAST(floor(1000000.0 * (ln(CAST(u.c + vsz.v AS DOUBLE)) -
                                 ln(CAST(big.cxy + 1 AS DOUBLE))) + 0.5)
              AS BIGINT) AS q
  FROM big JOIN uni u ON u.term = big.w1 CROSS JOIN vsz
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(q.q) AS BIGINT) AS xent_micronats,
       CAST(sum(q.q) // count(*) AS BIGINT) AS mean_xent
FROM b JOIN q USING (w1, w2)
GROUP BY 1
"""


def doc_dsir(sf_dir: str):
    """DSIR importance weights (pipelines/curation.py
    ``dsir_importance``): the md5-split minority side (≥ 0xCC, ~20%)
    plays the TARGET domain, the rest is the raw pool being selected
    from; every raw doc gets the exact micro-nat log-likelihood ratio
    of the two Laplace-smoothed unigram LMs. The corpus's planted
    duplicates and per-source templates make both LMs non-degenerate
    at every sf."""
    from guac_ray.pipelines.curation import dsir_importance, md5_first_byte

    def side(want_target: bool):
        ds = _read(sf_dir, "documents", ["doc_id", "text"])

        def pick(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
            keep = (md5_first_byte(ids) >= 0xCC) == want_target
            return t.filter(pa.array(keep))

        return ds.map_batches(pick, batch_format="pyarrow")

    return dsir_importance(side(True), side(False))


DOC_DSIR_SQL = r"""
WITH lab AS (
  SELECT doc_id, lower(text) AS txt,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'cc'
              THEN 'target' ELSE 'raw' END AS side
  FROM documents
), tok AS (
  SELECT doc_id, side,
         unnest(regexp_split_to_array(txt, '\s+')) AS term
  FROM lab
), tok2 AS (
  SELECT doc_id, side, term FROM tok WHERE term <> ''
), vocab AS (
  SELECT term,
         CAST(sum(CASE WHEN side = 'target' THEN 1 ELSE 0 END)
              AS BIGINT) AS ct,
         CAST(sum(CASE WHEN side = 'raw' THEN 1 ELSE 0 END)
              AS BIGINT) AS cr
  FROM tok2 GROUP BY 1
), tot AS (
  SELECT CAST(sum(ct) AS BIGINT) + CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(cr) AS BIGINT) + CAST(count(*) AS BIGINT) AS nr
  FROM vocab
), w AS (
  SELECT term,
         CAST(floor(1000000.0 * (ln(CAST(nr AS DOUBLE)) -
                                 ln(CAST(cr + 1 AS DOUBLE))) + 0.5)
              AS BIGINT)
         - CAST(floor(1000000.0 * (ln(CAST(nt AS DOUBLE)) -
                                   ln(CAST(ct + 1 AS DOUBLE))) + 0.5)
                AS BIGINT) AS w
  FROM vocab, tot
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(w.w) AS BIGINT) AS logw_micronats
FROM tok2 t JOIN w USING (term)
WHERE t.side = 'raw'
GROUP BY 1
"""


def doc_dup_passages(sf_dir: str):
    """Repeated-passage coverage (pipelines/curation.py
    ``dup_passage_stats``): per document, tokens covered by any
    10-token passage occurring ≥ 2 times anywhere in the corpus — the
    Lee et al. 2022 ExactSubstr measurement at token-window grain.
    Two fs exchanges (by passage, then by doc), vectorized
    interval-union coverage; exact DuckDB oracle."""
    from guac_ray.pipelines.curation import dup_passage_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_passage_stats(
        docs, window=10, min_count=2, exchange_dir=_exchange("passages"))


DOC_DUP_PASSAGES_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents),
t AS (SELECT doc_id, ts, len(ts) AS n FROM d WHERE len(ts) >= 10),
w AS (SELECT doc_id, i, array_to_string(list_slice(ts, i, i + 9), ' ') AS w
      FROM t, LATERAL (SELECT unnest(generate_series(1, n - 9)) AS i) g),
dup AS (SELECT w FROM w GROUP BY w HAVING count(*) >= 2),
f AS (SELECT w.doc_id, w.i FROM w JOIN dup USING (w)),
cov AS (SELECT doc_id, count(DISTINCT j) AS dup_tokens
        FROM f, LATERAL (SELECT unnest(generate_series(i, i + 9)) AS j) gg
        GROUP BY doc_id)
SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
       CAST(coalesce(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM t LEFT JOIN cov USING (doc_id)
"""


def doc_remove_passages(sf_dir: str):
    """Repeated-passage REMOVAL (pipelines/curation.py
    ``remove_dup_passages``): rewrite every document dropping tokens
    covered by any 10-token passage occurring ≥ 2 times in the corpus
    — the dedup ACTION paired with ``doc_dup_passages``'s measurement.
    Exchanges + left hash join + one vectorized rewrite pass; exact
    DuckDB oracle over the normalized token stream."""
    from guac_ray.pipelines.curation import remove_dup_passages

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return remove_dup_passages(
        docs, window=10, min_count=2,
        exchange_dir=_exchange("passages_rm"))


DOC_REMOVE_PASSAGES_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents),
t AS (SELECT doc_id, ts, len(ts) AS n FROM d WHERE len(ts) >= 10),
w AS (SELECT doc_id, i, array_to_string(list_slice(ts, i, i + 9), ' ') AS w
      FROM t, LATERAL (SELECT unnest(generate_series(1, n - 9)) AS i) g),
dup AS (SELECT w FROM w GROUP BY w HAVING count(*) >= 2),
f AS (SELECT w.doc_id, w.i FROM w JOIN dup USING (w)),
cov AS (SELECT doc_id, j
        FROM f, LATERAL (SELECT unnest(generate_series(i, i + 9)) AS j) gg
        GROUP BY doc_id, j),
tok AS (SELECT doc_id, j, ts[j] AS tk
        FROM d, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS j) g),
agg AS (SELECT tok.doc_id,
               coalesce(string_agg(CASE WHEN cov.j IS NULL THEN tok.tk END,
                                   ' ' ORDER BY tok.j), '') AS clean_text,
               CAST(count(cov.j) AS BIGINT) AS n_removed
        FROM tok LEFT JOIN cov
          ON tok.doc_id = cov.doc_id AND tok.j = cov.j
        GROUP BY tok.doc_id)
SELECT d.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       CAST(coalesce(agg.n_removed, 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN agg USING (doc_id)
"""


DOC_DECONTAMINATE_SQL = r"""
WITH lab AS (
  SELECT doc_id, lower(text) AS txt,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
              THEN 'train' ELSE 'test' END AS split
  FROM documents
), tok AS (
  SELECT doc_id, split, regexp_split_to_array(txt, '\s+') AS w FROM lab
), sh AS (
  SELECT doc_id, split, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM tok, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i)
  WHERE w[i] <> '' AND w[i+1] <> '' AND w[i+2] <> ''
), te AS (SELECT DISTINCT doc_id, s FROM sh WHERE split = 'test'),
   tr AS (SELECT DISTINCT s FROM sh WHERE split = 'train')
SELECT te.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
FROM te LEFT JOIN tr ON te.s = tr.s
GROUP BY te.doc_id
"""


def top_orders_per_status(sf_dir: str):
    """Per-group top-k (window-function family): the 3 highest-value
    orders per status. Plan: per-batch partial top-k per group (bounded
    rows into the shuffle), then a coarse-bucketed final top-k — the
    grouped analog of sort+limit."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    K = 3

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "o_orderstatus": df.o_orderstatus,
            "o_orderkey": df.o_orderkey,
            "_tc": cents(df.o_totalprice),
        })
        return (
            t.sort_values(["_tc", "o_orderkey"], ascending=[False, True])
            .groupby("o_orderstatus", sort=False)
            .head(K)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.sort_values(["_tc", "o_orderkey"], ascending=[False, True])
            .groupby("o_orderstatus", sort=False)
            .head(K)
        )
        return pd.DataFrame({
            "o_orderstatus": out.o_orderstatus,
            "o_orderkey": out.o_orderkey.astype("int64"),
            "o_totalprice": out._tc / 100.0,
        })

    # statuses are low-cardinality: one coarse group suffices; the
    # partial phase already bounded rows to K per (group, batch)
    parts = ds.map_batches(partial, batch_format="pandas")
    return (
        parts.map_batches(
            lambda df: df.assign(_cb=0), batch_format="pandas")
        .groupby("_cb")
        .map_groups(lambda g: final(g.drop(columns=["_cb"])),
                    batch_format="pandas")
    )


TOP_ORDERS_SQL = """
SELECT o_orderstatus, o_orderkey,
       CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)/100.0 AS o_totalprice
FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY floor(o_totalprice*100 + 0.5) DESC,
                                     o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def events_user_approx(sf_dir: str):
    """Approximate distinct users per event type (HyperLogLog p=12,
    ~1.6% std error) — the sketch shuffle carries one 4 KB register blob
    per (key, block) instead of the user ids. No SQL oracle (the
    estimate is approximate by construction); the ≤5% accuracy bound vs
    exact counts is asserted in pytest."""
    from guac_ray.functions.sketch import approx_ndistinct_grouped

    out = approx_ndistinct_grouped(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        ["event_type"], "user_id",
    )
    return out.map_batches(
        lambda df: df.assign(approx_n=df.approx_n.round().astype("int64")),
        batch_format="pandas",
    )


def media_decode(sf_dir: str):
    """Multimodal plumbing: deterministic fake media table → decode
    actor pool (stubbed kernel) → feature rows."""
    from guac_ray.functions.multimodal import decode_images, make_fake_media

    media = rd.from_arrow(make_fake_media(256))
    return decode_images(media, concurrency=(1, 2))


def media_video(sf_dir: str):
    """Video leg of the multimodal triad: deterministic Y4M table (real
    YUV4MPEG2 parse — functions/multimodal.py:decode_y4m) → feature
    actor pool with in-decode frame SAMPLING (every 5th frame) →
    integer luma features. No SQL oracle (DuckDB cannot parse Y4M);
    golden-pinned with a drift test like media_decode/media_audio."""
    from guac_ray.functions.multimodal import decode_video, make_fake_video

    media = rd.from_arrow(make_fake_video(192))
    return decode_video(media, stride=5, concurrency=(1, 2))


def media_neardup(sf_dir: str):
    """Image near-duplicate pairs — the MULTIMODAL member of the dedup
    family: deterministic BMP fleet with 6 planted (clean, ±1-jittered)
    near-dup pairs → integer dHash fingerprints (real decode, area-mean
    8×9 grid, gradient-sign bits) → the SAME 4×16-bit pigeonhole
    banding + fs-exchange verify the text SimHash path uses
    (functions/dedup.py:hamming64_pairs). No SQL oracle (DuckDB cannot
    decode BMP); golden-pinned with a drift test — the expected answer
    is exactly the 6 planted pairs at hamming 0."""
    from guac_ray.functions.multimodal import (image_neardup_pairs,
                                               make_fake_media_with_neardups)

    media = rd.from_arrow(make_fake_media_with_neardups(256, dups=6))
    return image_neardup_pairs(media, max_hamming=3, concurrency=(1, 2))


def media_audio(sf_dir: str):
    """Audio leg of the multimodal triad: deterministic PCM-WAV table
    (real RIFF parse — functions/multimodal.py:decode_wav) → feature
    actor pool → integer features (duration/peak/mean-square energy).
    No SQL oracle (DuckDB cannot parse WAV); golden-pinned with a drift
    test like media_decode."""
    from guac_ray.functions.multimodal import decode_audio, make_fake_audio

    media = rd.from_arrow(make_fake_audio(256))
    return decode_audio(media, concurrency=(1, 2))


# ---------------------------------------------------------------------------
# KG queries over the deterministic transcript fixtures
# (oracle SQL reads the same /tmp fixture parquet via read_parquet())
# ---------------------------------------------------------------------------

def _fix(sf_dir: str) -> str:
    """Fixture dir for a testdata sf dir — matches corpus_for_sf's
    mapping so Ray side and oracle SQL always read the SAME corpus."""
    return os.path.join(FIXTURE_ROOT, os.path.basename(os.path.normpath(sf_dir)))


def _t(sf_dir: str) -> str:
    return f"read_parquet('{_fix(sf_dir)}/transcripts/*.parquet')"


_VALID = f"text <> '' AND role IN {VALID_ROLES_SQL}"
# canonicalization of this corpus's raw purl surfaces, expressed in SQL
# (qualifier-order normalization + the one escaped namespace)


def _purl_canon(col: str) -> str:
    return (
        f"replace(replace({col}, '?os=linux&arch=amd64', '?arch=amd64&os=linux'),"
        f" ':npm/@scope/', ':npm/%40scope/')"
    )


_PURL_CANON = _purl_canon("m")


def kg_turn_text(sf_dir: str):
    from guac_ray.pipelines.kg import turn_text

    c = corpus_for_sf(sf_dir)
    return turn_text(c["transcripts"])


def KG_TURN_TEXT_SQL(sf_dir: str) -> str:
    return f"""
SELECT conv_id, turn_idx, text FROM {_t(sf_dir)} WHERE {_VALID}
"""


def kg_tool_usage(sf_dir: str):
    """Turns per canonical tool — the salted two-phase combine on the
    40%-hot key, plus the broadcast alias link."""
    from guac_ray.pipelines.kg import filter_valid, read_transcripts
    from guac_ray.stages.assemble import salted_count
    from guac_ray.stages.linker import load_link_map
    from guac_ray.canonical import entity_key

    c = corpus_for_sf(sf_dir)
    link = load_link_map(c["catalog"])
    lref = ray.put(link)
    ds = filter_valid(read_transcripts(c["transcripts"], columns=["conv_id", "turn_idx", "role", "text", "tool"]))

    class ToolKey:
        def __init__(self):
            self.link = ray.get(lref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df.tool != ""]
            keys = [
                self.link.get(k, k)
                for k in (entity_key("tool", t) for t in df.tool)
            ]
            return pd.DataFrame({"tool_key": pd.Series(keys, dtype="str")})

    keyed = ds.map_batches(ToolKey, batch_format="pandas", concurrency=(1, 2))
    return salted_count(keyed, ["tool_key"], alias="n")


def KG_TOOL_USAGE_SQL(sf_dir: str) -> str:
    return f"""
SELECT coalesce(c.ent_key, 'ent:tool/' || t.tool) AS tool_key, count(*) AS n
FROM {_t(sf_dir)} t
LEFT JOIN read_parquet('{_fix(sf_dir)}/entity_catalog.parquet') c
       ON c.surface = t.tool AND c.ent_type = 'tool'
WHERE t.tool <> '' AND t.text <> '' AND t.role IN {VALID_ROLES_SQL}
GROUP BY 1
"""


_HH_K = 80  # heavy hitter = tool on > 1/80 of the valid tool-bearing turns
# (catches the ~40%-hot canonical 'search' surface AND the ~1.5% alias
# tier, so the driver row checks a multi-row answer, not one obvious key)


def kg_heavy_tools(sf_dir: str):
    """EXACT heavy hitters over the corpus's raw tool column (the
    40%-hot 'search' key plus whichever aliases clear 1/80) via the
    two-pass candidate-sketch + verify-rescan operator — the streaming
    answer to "which tools dominate the corpus" that never shuffles
    token-scale data (see functions/sketch.py:heavy_hitters)."""
    from guac_ray.functions.sketch import heavy_hitters
    from guac_ray.pipelines.kg import filter_valid, read_transcripts

    c = corpus_for_sf(sf_dir)
    ds = filter_valid(read_transcripts(
        c["transcripts"], columns=["conv_id", "turn_idx", "role", "text", "tool"]))
    import pyarrow.compute as pc

    ds = ds.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("tool"), "")).select(["tool"]),
        batch_format="pyarrow",
    )
    return heavy_hitters(ds, "tool", k=_HH_K, num_buckets=8)


def KG_HEAVY_TOOLS_SQL(sf_dir: str) -> str:
    return f"""
WITH t AS (
  SELECT tool FROM {_t(sf_dir)}
  WHERE tool <> '' AND text <> '' AND role IN {VALID_ROLES_SQL}
)
SELECT tool, count(*) AS n FROM t
GROUP BY tool HAVING count(*) * {_HH_K} > (SELECT count(*) FROM t)
"""


# one graph build per (process, sf_dir): six kg_* queries share the
# assembled edge/node tables instead of re-running extraction each
_GRAPH_CACHE: dict[str, dict] = {}


def _corpus_edges(sf_dir: str):
    g = _GRAPH_CACHE.get(sf_dir)
    if g is None:
        from guac_ray.pipelines.kg import build_graph

        c = corpus_for_sf(sf_dir)
        raw = build_graph(
            c["transcripts"], catalog_path=c["catalog"], sort=False, num_buckets=32
        )
        edges = raw["edges"].materialize()
        # derive nodes from the PINNED edges (raw["nodes"] would re-run
        # the whole extraction pipeline on materialize)
        from guac_ray.stages.assemble import nodes_from_edges

        g = {"edges": edges,
             "nodes": nodes_from_edges(edges, num_buckets=16).materialize()}
        _GRAPH_CACHE[sf_dir] = g
    return g


def kg_mentions(sf_dir: str):
    """Distinct mention targets across ALL THREE mention families
    (artifact / vuln / package) in one pass over the assembled edge
    table — the classifier-chain coverage of the former per-family
    queries folded into a single driver row (family, ent_key). Distinct
    via the engine's bucketed dedup (Ray's Unique aggregate trips over
    mixed empty blocks at larger SFs)."""
    import pyarrow.compute as pc

    from guac_ray.stages.assemble import dedup_exact

    g = _corpus_edges(sf_dir)
    fams = ["mentions_artifact", "mentions_vuln", "mentions_package"]

    def pick(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch["pred"],
                                  value_set=pa.array(fams)))
        fam = pc.replace_substring(t["pred"], "mentions_", "")
        return pa.table({"family": fam, "ent_key": t["obj_key"]})

    vals = dedup_exact(
        g["edges"].map_batches(pick, batch_format="pyarrow"),
        ["family", "ent_key"], num_buckets=4,
    ).to_pandas()
    return vals.sort_values(["family", "ent_key"]).reset_index(drop=True)


def KG_MENTIONS_SQL(sf_dir: str) -> str:
    return f"""
SELECT 'artifact' AS family, artifact_key AS ent_key FROM ({KG_ARTIFACT_SQL(sf_dir)})
UNION ALL
SELECT 'vuln' AS family, vuln_key AS ent_key FROM ({KG_VULN_SQL(sf_dir)})
UNION ALL
SELECT 'package' AS family, pkg_key AS ent_key FROM ({KG_PACKAGE_SQL(sf_dir)})
"""


def KG_ARTIFACT_SQL(sf_dir: str) -> str:
    return f"""
SELECT DISTINCT lower(m) AS artifact_key FROM (
  SELECT unnest(regexp_extract_all(text,
      '(?:sha256|sha1|sha512|md5):[0-9a-fA-F]{{32,128}}')) AS m
  FROM {_t(sf_dir)} WHERE {_VALID})
"""


def KG_VULN_SQL(sf_dir: str) -> str:
    return f"""
SELECT DISTINCT 'vuln://' || split_part(lower(m), '-', 1) || '/' || lower(m) AS vuln_key
FROM (
  SELECT unnest(regexp_extract_all(text,
      '(?:[Cc][Vv][Ee]-[0-9]{{4}}-[0-9]{{4,}}|[Gg][Hh][Ss][Aa]-[0-9a-zA-Z]{{4}}-[0-9a-zA-Z]{{4}}-[0-9a-zA-Z]{{4,}})')) AS m
  FROM {_t(sf_dir)} WHERE {_VALID})
"""


def KG_PACKAGE_SQL(sf_dir: str) -> str:
    return f"""
SELECT DISTINCT {_PURL_CANON} AS pkg_key FROM (
  SELECT unnest(regexp_extract_all(text, 'pkg:[A-Za-z0-9.+-]+/[^ ]+')) AS m
  FROM {_t(sf_dir)} WHERE {_VALID})
"""


def kg_certify_vuln(sf_dir: str):
    """Full enrichment path: assembled package nodes → vulndb lookup →
    certify_vuln incl. noVuln negatives (subject, object keys)."""
    from guac_ray.stages.enrich import certify_vulns

    c = corpus_for_sf(sf_dir)
    g = _corpus_edges(sf_dir)
    edges = certify_vulns(g["nodes"], c["vulndb"])
    return edges.select_columns(["subj_key", "obj_key"])


def KG_CERTIFY_SQL(sf_dir: str) -> str:
    # the certifier scans EVERY package node in the graph: version-level
    # mention keys plus the name-level trie nodes they materialize
    # (version_of / MatchFlags analog)
    return f"""
WITH mentioned AS (
  SELECT DISTINCT {_PURL_CANON} AS ent_key FROM (
    SELECT unnest(regexp_extract_all(text, 'pkg:[A-Za-z0-9.+-]+/[^ ]+')) AS m
    FROM {_t(sf_dir)} WHERE {_VALID})
), pkgs AS (
  SELECT ent_key FROM mentioned
  UNION
  SELECT DISTINCT split_part(ent_key, '@', 1) AS ent_key
  FROM mentioned WHERE ent_key LIKE '%@%'
)
SELECT p.ent_key AS subj_key,
       coalesce('vuln://' || split_part(v.vuln_id, '-', 1) || '/' || v.vuln_id,
                'vuln://novuln/novuln') AS obj_key
FROM pkgs p
LEFT JOIN (SELECT DISTINCT ent_key, vuln_id
           FROM read_parquet('{_fix(sf_dir)}/vulndb.parquet')) v USING (ent_key)
"""


def kg_conv_stats(sf_dir: str):
    """Per-conversation aggregates (turn counts, time span) — the
    conversation-grouped operator over valid turns."""
    from guac_ray.pipelines.kg import filter_valid, read_transcripts

    c = corpus_for_sf(sf_dir)
    ds = filter_valid(
        read_transcripts(c["transcripts"], columns=["conv_id", "turn_idx", "role", "text", "ts"])
    )
    agg = grouped_agg(
        ds, ["conv_id"],
        {"n_turns": ("turn_idx", "count"),
         "first_ts": ("ts", "min"), "last_ts": ("ts", "max")},
        num_buckets=16,
    )
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "conv_id": df.conv_id,
            "n_turns": df.n_turns.astype("int64"),
            "first_ts": df.first_ts.astype("datetime64[us]"),
            "last_ts": df.last_ts.astype("datetime64[us]"),
        }),
        batch_format="pandas",
    )


def KG_CONV_STATS_SQL(sf_dir: str) -> str:
    return f"""
SELECT conv_id, count(*) AS n_turns, min(ts) AS first_ts, max(ts) AS last_ts
FROM {_t(sf_dir)} WHERE {_VALID}
GROUP BY conv_id
"""


def kg_certify_legal(sf_dir: str):
    """Distinct (package, license) certify_legal pairs from compound
    SPDX-style expressions (ParseLicenses semantics — license.go:72-88).
    LicenseRef-FNV pairs are excluded from the ORACLE comparison (DuckDB
    has no fnv32a); the hash path is golden-tested in pytest."""
    g = _corpus_edges(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.and_(
            pc.equal(batch["pred"], "certify_legal"),
            pc.invert(pc.starts_with(batch["obj_key"], "license:LicenseRef-")),
        ))
        return pa.table({"pkg_key": t["subj_key"], "license_key": t["obj_key"]})

    from guac_ray.stages.assemble import dedup_exact

    return dedup_exact(
        g["edges"].map_batches(pick, batch_format="pyarrow"),
        ["pkg_key", "license_key"], num_buckets=4,
    )


def KG_CERTIFY_LEGAL_SQL(sf_dir: str) -> str:
    return f"""
SELECT DISTINCT {_purl_canon("split_part(m, ' ', 1)")} AS pkg_key,
       'license:' || name AS license_key
FROM (
  SELECT m, trim(part, '()+') AS name
  FROM (
    SELECT m, unnest(string_split(
        regexp_replace(rtrim(m, ';'), '^pkg:[^ ]+ is licensed under ', ''),
        ' ')) AS part
    FROM (SELECT unnest(regexp_extract_all(text,
              'pkg:[^ ]+ is licensed under [^;"]+;')) AS m
          FROM {_t(sf_dir)} WHERE {_VALID})
  )
  WHERE trim(part, '()+') NOT IN ('AND', 'OR', 'WITH')
    AND trim(part, '()+') <> ''
)
"""


def kg_version_of(sf_dir: str):
    """Distinct version-level → name-level package trie edges (the
    MatchFlags / AllVersions analog — helpers.go:125-131): every
    versioned purl mention materializes its name-level node."""
    g = _corpus_edges(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch["pred"], "version_of"))
        return pa.table({"pkg_version": t["subj_key"], "pkg_name": t["obj_key"]})

    from guac_ray.stages.assemble import dedup_exact

    return dedup_exact(
        g["edges"].map_batches(pick, batch_format="pyarrow"),
        ["pkg_version", "pkg_name"], num_buckets=4,
    )


def KG_VERSION_OF_SQL(sf_dir: str) -> str:
    return f"""
SELECT DISTINCT canon AS pkg_version, split_part(canon, '@', 1) AS pkg_name
FROM (
  SELECT {_PURL_CANON} AS canon FROM (
    SELECT unnest(regexp_extract_all(text, 'pkg:[A-Za-z0-9.+-]+/[^ ]+')) AS m
    FROM {_t(sf_dir)} WHERE {_VALID})
)
WHERE canon LIKE '%@%'
"""


def kg_version_range(sf_dir: str, rng: str = "^1.2"):
    """Version-range filter over the graph's versioned package nodes
    (guacone query patch-style): which mentioned package versions
    satisfy ``^1.2``. Range semantics come from functions/depversion
    (the reference's depversion.go heuristics); the oracle expands the
    caret range to explicit major/minor bounds in SQL."""
    import pyarrow.compute as pc

    from guac_ray.functions.depversion import in_range
    from guac_ray.stages.assemble import dedup_exact

    g = _corpus_edges(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], "version_of"))
        return pa.table({"pkg_version": t["subj_key"]})

    distinct = dedup_exact(
        g["edges"].map_batches(pick, batch_format="pyarrow"),
        ["pkg_version"], num_buckets=4,
    )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"pkg_version": pd.Series(dtype="str")})
        vers = df.pkg_version.str.split("@").str[1].str.split("?").str[0]
        keep = np.array([in_range(v, rng) for v in vers])
        return df[keep][["pkg_version"]]

    return distinct.map_batches(match, batch_format="pandas")


def KG_VERSION_RANGE_SQL(sf_dir: str) -> str:
    # ^1.2 ⇔ >=1.2.0 <2.0.0 ⇔ major = 1 AND minor >= 2
    return f"""
WITH v AS (
  SELECT DISTINCT canon AS pkg_version,
         split_part(split_part(canon, '@', 2), '?', 1) AS ver
  FROM (
    SELECT {_PURL_CANON} AS canon FROM (
      SELECT unnest(regexp_extract_all(text, 'pkg:[A-Za-z0-9.+-]+/[^ ]+')) AS m
      FROM {_t(sf_dir)} WHERE {_VALID})
  )
  WHERE canon LIKE '%@%'
)
SELECT pkg_version FROM v
WHERE TRY_CAST(split_part(ver, '.', 1) AS INTEGER) = 1
  AND TRY_CAST(split_part(ver, '.', 2) AS INTEGER) >= 2
"""


def kg_depends_on(sf_dir: str):
    """IsDependency analog (assembler.go:58-63) from BOTH producers:
    grammar-extracted statement edges (SPDX relationship parsing —
    parse_spdx.go:263-304) UNION the deps.dev-style certifier
    (deps_dev.go:44-132) run over every assembled package node, emitting
    name-level AllVersions dep objects. ``source`` (edge origin)
    distinguishes provenance; distinct on the full triple."""
    import pyarrow.compute as pc

    from guac_ray.stages.assemble import dedup_exact
    from guac_ray.stages.enrich import certify_deps

    c = corpus_for_sf(sf_dir)
    g = _corpus_edges(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], "depends_on"))
        return pa.table({"subj_key": t["subj_key"], "dep_key": t["obj_key"],
                         "source": t["origin"]})

    extracted = g["edges"].map_batches(pick, batch_format="pyarrow")
    enriched = certify_deps(g["nodes"], c["depdb"]).map_batches(
        pick, batch_format="pyarrow")
    return dedup_exact(extracted.union(enriched),
                       ["subj_key", "dep_key", "source"], num_buckets=4)


def KG_DEPENDS_ON_SQL(sf_dir: str) -> str:
    sub = _purl_canon("split_part(m, ' depends on ', 1)")
    obj = _purl_canon("split_part(m, ' depends on ', 2)")
    return f"""
WITH mentioned AS (
  SELECT DISTINCT {_PURL_CANON} AS ent_key FROM (
    SELECT unnest(regexp_extract_all(text, 'pkg:[A-Za-z0-9.+-]+/[^ ]+')) AS m
    FROM {_t(sf_dir)} WHERE {_VALID})
), pkgs AS (
  SELECT ent_key FROM mentioned
  UNION
  SELECT DISTINCT split_part(ent_key, '@', 1) AS ent_key
  FROM mentioned WHERE ent_key LIKE '%@%'
), grammar AS (
  SELECT {sub} AS subj_key, {obj} AS dep_key
  FROM (SELECT unnest(regexp_extract_all(text,
          'pkg:[A-Za-z0-9.+-]+/[^ ]+ depends on pkg:[A-Za-z0-9.+-]+/[^ ]+')) AS m
        FROM {_t(sf_dir)} WHERE {_VALID})
), enrich AS (
  SELECT p.ent_key AS subj_key, d.dep_name AS dep_key
  FROM pkgs p
  JOIN read_parquet('{_fix(sf_dir)}/depdb.parquet') d
    ON split_part(p.ent_key, '@', 1) = d.pkg_name
)
SELECT DISTINCT subj_key, dep_key, source FROM (
  SELECT subj_key, dep_key, 'guac_ray/transcripts' AS source
  FROM grammar WHERE subj_key <> dep_key
  UNION ALL
  SELECT subj_key, dep_key, 'guac_ray/depdb' AS source FROM enrich
)
"""


def kg_patch_radius(sf_dir: str, max_depth: int = 3):
    """The reference's flagship patch-planning workload
    (guacanalytics/patchPlanning.go:56-115) as an ORACLE-CHECKED query:
    pick the most-depended-on package (deterministic: max distinct
    dependents, ties → smallest key) and BFS REVERSE over the full
    depends_on edge set (grammar + depdb enrichment) for the dependents
    blast radius → (node_key, depth). Depth bounds the traversal like
    the reference's maxPathLength (inmem/path.go:42); the oracle is a
    bounded recursive CTE with min-depth aggregation."""
    from guac_ray.query.graph import bfs_reach
    from guac_ray.stages.assemble import dedup_exact

    deps = kg_depends_on(sf_dir)

    def pair(batch: pa.Table) -> pa.Table:
        return pa.table({"subj_key": batch["subj_key"],
                         "obj_key": batch["dep_key"]})

    pairs = dedup_exact(deps.map_batches(pair, batch_format="pyarrow"),
                        ["subj_key", "obj_key"], num_buckets=4)
    # the distinct name-level pair set is bounded by catalog size (not
    # corpus size) — driver-small by construction, like the top-k frames
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"node_key": pd.Series(dtype="object"),
                             "depth": pd.Series(dtype="int64")})
    cnt = pdf.groupby("obj_key")["subj_key"].nunique()
    target = cnt.sort_index().sort_values(kind="stable", ascending=False).index[0]

    # BFS rounds re-scan their edge Dataset; feed them the already-
    # materialized pair frame instead of the lazy pipeline (which would
    # re-run extraction+enrichment once per round)
    import ray.data as rd

    edges = rd.from_pandas(pdf.assign(pred="depends_on"))
    reached = bfs_reach(edges, target, max_depth=max_depth,
                        preds=["depends_on"], direction="in")
    out = pd.DataFrame({
        "node_key": list(reached.keys()),
        "depth": pd.Series(list(reached.values()), dtype="int64"),
    })
    return out.sort_values(["depth", "node_key"]).reset_index(drop=True)


def KG_PATCH_RADIUS_SQL(sf_dir: str) -> str:
    return f"""
WITH RECURSIVE deps AS (
  SELECT DISTINCT subj_key, dep_key FROM ({KG_DEPENDS_ON_SQL(sf_dir)})
), target AS (
  SELECT dep_key AS node_key
  FROM (SELECT dep_key, count(DISTINCT subj_key) AS c
        FROM deps GROUP BY dep_key)
  ORDER BY c DESC, node_key ASC LIMIT 1
), reach(node_key, depth) AS (
  SELECT node_key, 0 FROM target
  UNION ALL
  SELECT d.subj_key, r.depth + 1
  FROM reach r JOIN deps d ON d.dep_key = r.node_key
  WHERE r.depth < 3
)
SELECT node_key, CAST(min(depth) AS BIGINT) AS depth
FROM reach GROUP BY node_key
"""


def kg_pkg_equal(sf_dir: str):
    """PkgEqual analog (assembler.go:181-186): equivalence statements →
    sorted distinct package pairs (same sorted-pair discipline as
    hash_equal / vuln_equal)."""
    import pyarrow.compute as pc

    from guac_ray.stages.assemble import dedup_exact

    g = _corpus_edges(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], "pkg_equal"))
        return pa.table({"pkg_a": t["subj_key"], "pkg_b": t["obj_key"]})

    return dedup_exact(
        g["edges"].map_batches(pick, batch_format="pyarrow"),
        ["pkg_a", "pkg_b"], num_buckets=4,
    )


def KG_PKG_EQUAL_SQL(sf_dir: str) -> str:
    a = _purl_canon("split_part(m, ' is the same as ', 1)")
    b = _purl_canon("split_part(m, ' is the same as ', 2)")
    return f"""
SELECT DISTINCT least(a, b) AS pkg_a, greatest(a, b) AS pkg_b FROM (
  SELECT {a} AS a, {b} AS b
  FROM (SELECT unnest(regexp_extract_all(text,
          'pkg:[A-Za-z0-9.+-]+/[^ ]+ is the same as pkg:[A-Za-z0-9.+-]+/[^ ]+')) AS m
        FROM {_t(sf_dir)} WHERE {_VALID})
) WHERE a <> b
"""


_PAGERANK_SCALE = 10**12
_PAGERANK_ITERS = 10


def kg_pagerank_top(sf_dir: str):
    """Top-20 nodes by PageRank over the assembled edge table —
    iterative dataflow on static exchange bucket files (edges shuffled
    once, only the rank table moves per round; functions/pagerank.py).
    Runs in QUANTIZED fixed-point mode (int64 ranks, floor-div
    recurrence): integer sums are order-independent, so the result is
    bit-exact against the unrolled SQL recurrence in the DuckDB oracle
    — an iterative-dataflow operator hash-checked like any relational
    query. Finalize is distributed: top-k via Dataset sort+limit over
    the final rank buckets, never the whole rank table on the driver."""
    from guac_ray.functions.pagerank import pagerank

    g = _corpus_edges(sf_dir)
    pr = pagerank(g["edges"], exchange_base=_exchange("pagerank"),
                  num_buckets=8, max_iters=_PAGERANK_ITERS,
                  quantize_scale=_PAGERANK_SCALE)
    return pr.sort(["rank", "node_key"], descending=[True, False]).limit(20)


def KG_PAGERANK_SQL(sf_dir: str) -> str:
    """The same fixed-point recurrence unrolled: rank_0 = Q//N;
    rank_{i+1} = (3Q)//(20N) + (17*(Σ_in rank_i//outdeg + dang_i//N))//20
    with d = 0.85 = 17/20 exactly (matches pagerank(quantize_scale=Q))."""
    Q, K = _PAGERANK_SCALE, _PAGERANK_ITERS
    # every r{i} is referenced twice by level i+1 (contribution join +
    # dangling sum): AS MATERIALIZED is load-bearing — DuckDB's default
    # CTE inlining would otherwise expand the chain 2^K times
    parts = [f"""
WITH edges0 AS MATERIALIZED (
  SELECT DISTINCT subj_key AS src, obj_key AS dst
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges0 GROUP BY src),
edges AS MATERIALIZED (
  SELECT e.src, e.dst, d.outdeg FROM edges0 e JOIN deg d USING (src)),
nodes AS MATERIALIZED (
  SELECT src AS node_key FROM edges0 UNION SELECT dst FROM edges0),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
r0 AS MATERIALIZED (SELECT node_key, {Q} // nn.n AS rank FROM nodes, nn)"""]
    for i in range(K):
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0) // (SELECT n FROM nn) AS m
  FROM r{i} WHERE node_key NOT IN (SELECT src FROM deg)),
r{i + 1} AS MATERIALIZED (
  SELECT n.node_key,
         (3 * {Q}) // (20 * (SELECT n FROM nn))
         + (17 * (COALESCE(s.c, 0) + d{i}.m)) // 20 AS rank
  FROM nodes n
  LEFT JOIN (SELECT e.dst, SUM(r.rank // e.outdeg) AS c
             FROM edges e JOIN r{i} r ON r.node_key = e.src
             GROUP BY e.dst) s ON s.dst = n.node_key
  CROSS JOIN d{i}
)""")
    parts.append(f"""
SELECT node_key, CAST(rank AS BIGINT) AS rank FROM r{K}
ORDER BY rank DESC, node_key LIMIT 20""")
    return "".join(parts)


def kg_ppr_vuln(sf_dir: str):
    """PERSONALIZED PageRank (random walk with restart) seeded on the
    vulnerability nodes — "which entities sit closest to vulns", the
    proximity query a security KG consumer asks right after plain
    PageRank. Same quantized fixed-point machinery (functions/
    pagerank.py, seed_prefix='vuln:'): teleport and dangling mass
    restart ONLY to seeds (r_0 = Q//|S| on seeds, 0 elsewhere); the
    seed predicate is a vectorized string prefix — SQL-expressible and
    never a driver-resident list. Top-20 non-seed nodes by rank (seeds
    themselves trivially dominate), bit-exact vs the unrolled seeded
    integer recurrence in the oracle."""
    from guac_ray.functions.pagerank import pagerank

    g = _corpus_edges(sf_dir)
    pr = pagerank(g["edges"], exchange_base=_exchange("ppr"),
                  num_buckets=8, max_iters=_PAGERANK_ITERS,
                  quantize_scale=_PAGERANK_SCALE, seed_prefix="vuln:")

    def non_seed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.invert(
            pc.starts_with(t["node_key"], "vuln:")))

    return (pr.map_batches(non_seed, batch_format="pyarrow")
            .sort(["rank", "node_key"], descending=[True, False])
            .limit(20))


def KG_PPR_SQL(sf_dir: str) -> str:
    """Seeded fixed-point recurrence unrolled: rank_0 = Q//|S| on
    seeds else 0; rank_{i+1} = seed*(3Q)//(20|S|)
    + (17*(Σ_in rank_i//outdeg + seed*(dang_i//|S|)))//20 — matches
    pagerank(quantize_scale=Q, seed_prefix='vuln:') exactly."""
    Q, K = _PAGERANK_SCALE, _PAGERANK_ITERS
    parts = [f"""
WITH edges0 AS MATERIALIZED (
  SELECT DISTINCT subj_key AS src, obj_key AS dst
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges0 GROUP BY src),
edges AS MATERIALIZED (
  SELECT e.src, e.dst, d.outdeg FROM edges0 e JOIN deg d USING (src)),
nodes AS MATERIALIZED (
  SELECT src AS node_key FROM edges0 UNION SELECT dst FROM edges0),
ns AS MATERIALIZED (
  SELECT count(*) AS n FROM nodes WHERE node_key LIKE 'vuln:%'),
r0 AS MATERIALIZED (
  SELECT node_key,
         CASE WHEN node_key LIKE 'vuln:%' THEN {Q} // ns.n ELSE 0 END
             AS rank
  FROM nodes, ns)"""]
    for i in range(K):
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0) // (SELECT n FROM ns) AS m
  FROM r{i} WHERE node_key NOT IN (SELECT src FROM deg)),
r{i + 1} AS MATERIALIZED (
  SELECT n.node_key,
         CASE WHEN n.node_key LIKE 'vuln:%'
              THEN (3 * {Q}) // (20 * (SELECT n FROM ns)) ELSE 0 END
         + (17 * (COALESCE(s.c, 0)
                  + CASE WHEN n.node_key LIKE 'vuln:%'
                         THEN d{i}.m ELSE 0 END)) // 20 AS rank
  FROM nodes n
  LEFT JOIN (SELECT e.dst, SUM(r.rank // e.outdeg) AS c
             FROM edges e JOIN r{i} r ON r.node_key = e.src
             GROUP BY e.dst) s ON s.dst = n.node_key
  CROSS JOIN d{i}
)""")
    parts.append(f"""
SELECT node_key, CAST(rank AS BIGINT) AS rank FROM r{K}
WHERE node_key NOT LIKE 'vuln:%'
ORDER BY rank DESC, node_key LIMIT 20""")
    return "".join(parts)


_HITS_SCALE = 1 << 20
_HITS_ITERS = 8


def kg_hits(sf_dir: str):
    """HITS hubs & authorities over the assembled edge table
    (functions/hits.py) — which nodes vouch (hub) vs are vouched for
    (authority), the spectral complement of kg_pagerank_top. Quantized
    fixed-point with max-normalization: every half-step is integer
    sums + one floor-div normalization, bit-exact vs the unrolled SQL
    recurrence; edges are shuffled twice at setup (by-src and by-dst
    layouts), then only the score table moves per half-step with a
    B-scalar max fold on the driver. Top-20 by authority."""
    from guac_ray.functions.hits import hits

    g = _corpus_edges(sf_dir)
    hs = hits(g["edges"], exchange_base=_exchange("hits"),
              num_buckets=8, max_iters=_HITS_ITERS,
              quantize_scale=_HITS_SCALE)
    return hs.sort(["auth_fp", "node_key"],
                   descending=[True, False]).limit(20)


def KG_HITS_SQL(sf_dir: str) -> str:
    """The same max-normalized fixed-point recurrence unrolled:
    h_0 = Q; a_i(v) = Σ_in (h_{i-1}·Q)//max(h_{i-1});
    h_i(u) = Σ_out (a_i·Q)//max(a_i); final both normalized once more
    — matches hits(quantize_scale=Q, max_iters=K) exactly."""
    Q, K = _HITS_SCALE, _HITS_ITERS
    # AS MATERIALIZED is load-bearing (the pagerank-oracle rule):
    # every level is referenced multiple times (join + its max)
    parts = [f"""
WITH edges0 AS MATERIALIZED (
  SELECT DISTINCT subj_key AS src, obj_key AS dst
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
),
nodes AS MATERIALIZED (
  SELECT src AS node_key FROM edges0 UNION SELECT dst FROM edges0),
h0 AS MATERIALIZED (
  SELECT node_key, CAST({Q} AS BIGINT) AS rank FROM nodes)"""]
    for i in range(1, K + 1):
        parts.append(f""",
a{i} AS MATERIALIZED (
  SELECT n.node_key, COALESCE(s.c, 0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst,
           SUM((h.rank * {Q}) // (SELECT max(rank) FROM h{i - 1})) AS c
    FROM edges0 e JOIN h{i - 1} h ON h.node_key = e.src
    GROUP BY e.dst) s ON s.dst = n.node_key),
h{i} AS MATERIALIZED (
  SELECT n.node_key, COALESCE(s.c, 0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.src,
           SUM((a.rank * {Q}) // (SELECT max(rank) FROM a{i})) AS c
    FROM edges0 e JOIN a{i} a ON a.node_key = e.dst
    GROUP BY e.src) s ON s.src = n.node_key)""")
    parts.append(f"""
SELECT node_key,
       CAST((h.rank * {Q}) // (SELECT max(rank) FROM h{K})
            AS BIGINT) AS hub_fp,
       CAST((a.rank * {Q}) // (SELECT max(rank) FROM a{K})
            AS BIGINT) AS auth_fp
FROM a{K} a JOIN h{K} h USING (node_key)
ORDER BY auth_fp DESC, node_key LIMIT 20""")
    return "".join(parts)


_LPA_ROUNDS = 4


def kg_label_prop(sf_dir: str):
    """Synchronous deterministic label propagation (functions/
    graph_algs.py ``label_propagation``): community detection over the
    KG's undirected simple graph — every node adopts the most frequent
    label among neighbors + its own (self-vote), smallest-label
    tie-break, exactly 4 synchronous rounds. Async LPA is
    order-dependent and unverifiable; the synchronous self-vote form
    is a pure function of the graph, so the oracle unrolls the
    IDENTICAL vote-argmax recurrence and the full (node, label) table
    is hash-exact. Stubs shuffle once (bucketed by vote source);
    per round only (node, label, count) partials move."""
    from guac_ray.functions.graph_algs import label_propagation

    g = _corpus_edges(sf_dir)
    return label_propagation(g["edges"], rounds=_LPA_ROUNDS,
                             exchange_base=_exchange("labelprop"),
                             num_buckets=8)


def KG_LABEL_PROP_SQL(sf_dir: str) -> str:
    """The same synchronous recurrence unrolled: l_0 = own key;
    l_i = argmax (count DESC, label ASC) over neighbor votes ∪ the
    node's own l_{i-1} label."""
    K = _LPA_ROUNDS
    parts = [f"""
WITH edges0 AS MATERIALIZED (
  SELECT DISTINCT subj_key AS src, obj_key AS dst
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key IS NOT NULL AND obj_key IS NOT NULL
    AND subj_key <> obj_key),
stubs AS MATERIALIZED (
  SELECT src AS node, dst AS nbr FROM edges0
  UNION SELECT dst, src FROM edges0),
nodes AS MATERIALIZED (SELECT DISTINCT node AS node_key FROM stubs),
l0 AS MATERIALIZED (SELECT node_key, node_key AS label FROM nodes)"""]
    for i in range(1, K + 1):
        parts.append(f""",
v{i} AS MATERIALIZED (
  SELECT node, lbl, count(*) AS c FROM (
    SELECT s.node, p.label AS lbl
    FROM stubs s JOIN l{i - 1} p ON p.node_key = s.nbr
    UNION ALL
    SELECT node_key, label FROM l{i - 1}
  ) GROUP BY node, lbl),
l{i} AS MATERIALIZED (
  SELECT node AS node_key, lbl AS label FROM v{i}
  QUALIFY row_number() OVER (PARTITION BY node
                             ORDER BY c DESC, lbl) = 1)""")
    parts.append(f"""
SELECT node_key, label FROM l{K}""")
    return "".join(parts)


def kg_ktruss(sf_dir: str):
    """4-truss of the KG (functions/triangles.py ``k_truss``): the
    triangle-support peel that extracts the cohesive core — every
    surviving edge sits in ≥ 2 triangles WITHIN the truss (stricter
    than kg_kcore's degree condition, cheaper than cliques). Iterative
    dataflow: each peel round reuses the triangle family's
    wedge + closing-semi-join shape with the per-triangle 3-edge credit
    fused into the join's reduce; the driver sees one edge-count scalar
    per round. No SQL form (peeling cascades); correctness is pinned by
    bit-parity tests against the pure-Python reference and the
    committed sf0.001 golden."""
    from guac_ray.functions.triangles import k_truss

    g = _corpus_edges(sf_dir)
    return k_truss(g["edges"], 4, exchange_base=_exchange("ktruss"),
                   num_buckets=8)


def kg_edge_pred_counts(sf_dir: str):
    """Distinct-edge count per predicate from the full pipeline. Oracle:
    the fixture's GOLDEN edge table — derived at generation time from the
    template parameters, a fully independent path from text extraction
    (FIXTURES.md F5) — must produce identical per-predicate counts."""
    g = _corpus_edges(sf_dir)
    out = grouped_agg(g["edges"], ["pred"], {"n": ("pred", "count")},
                      num_buckets=4)
    return out.map_batches(lambda df: df.assign(n=df.n.astype("int64")),
                           batch_format="pandas")


def KG_PRED_COUNTS_SQL(sf_dir: str) -> str:
    return f"""
SELECT pred, count(*) AS n
FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
GROUP BY pred
"""


def kg_degree_top(sf_dir: str):
    """Top-20 subjects by distinct-edge degree (salted two-phase count
    over the assembled edge table); golden edge table is the oracle,
    ties broken by subj_key on both sides."""
    from guac_ray.stages.assemble import salted_count

    g = _corpus_edges(sf_dir)
    return (
        salted_count(g["edges"], ["subj_key"], alias="degree")
        .sort(["degree", "subj_key"], descending=[True, False])
        .limit(20)
    )


def KG_DEGREE_TOP_SQL(sf_dir: str) -> str:
    return f"""
SELECT subj_key, count(*) AS degree
FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
GROUP BY subj_key
ORDER BY degree DESC, subj_key
LIMIT 20
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def kg_triangles(sf_dir: str):
    """Exact triangle count over the assembled KG
    (functions/triangles.py): degree-ordered orientation keeps the
    40%-hot tool hub from exploding the wedge stage, wedges close
    against the canonical edge set via a large-large semi join with the
    count fused into the join reduce. Oracle: the classic 3-way
    self-join on the golden edge table."""
    from guac_ray.functions.triangles import triangle_count

    g = _corpus_edges(sf_dir)
    return triangle_count(
        g["edges"], "subj_key", "obj_key",
        exchange_base=_exchange("triangles"), num_buckets=8)


def KG_TRIANGLES_SQL(sf_dir: str) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT least(subj_key, obj_key) AS u,
         greatest(subj_key, obj_key) AS v
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key)
SELECT count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


# package-linkage predicates: the sparse identity/derivation subgraph
# (unlike the mention/metadata hubs that fuse everything into one blob)
_LINKAGE_PREDS = ("depends_on", "pkg_equal", "version_of",
                  "hash_equal", "vuln_equal")


def kg_components(sf_dir: str):
    """Connected components over the package-LINKAGE subgraph
    (depends_on / pkg_equal / version_of / hash_equal / vuln_equal):
    per-node component assignment where the component id is the MIN
    node key (lexicographic). String-keyed min-label propagation on the
    filesystem exchange (functions/dedup.py:connected_components_ds —
    the same exchange-native algorithm the curation pipeline runs on
    int doc ids, reused for KG node keys). Oracle: recursive-CTE label
    propagation over the golden edge table."""
    import pyarrow.compute as pc

    from guac_ray.functions.dedup import connected_components_ds

    g = _corpus_edges(sf_dir)

    def pairs(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t["pred"], value_set=pa.array(_LINKAGE_PREDS)),
            pc.not_equal(t["subj_key"], t["obj_key"]))
        f = t.filter(m)
        return pa.table({"a": f["subj_key"].cast(pa.string()),
                         "b": f["obj_key"].cast(pa.string())})

    cc = connected_components_ds(
        g["edges"].map_batches(pairs, batch_format="pyarrow"),
        exchange_dir=_exchange("kg_cc"), num_buckets=8)
    return cc.map_batches(
        lambda t: pa.table({"node_key": t["doc_id"], "root": t["root"]}),
        batch_format="pyarrow")


def KG_COMPONENTS_SQL(sf_dir: str) -> str:
    preds = ", ".join(f"'{p}'" for p in _LINKAGE_PREDS)
    return f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT subj_key AS a, obj_key AS b
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE pred IN ({preds}) AND subj_key <> obj_key),
e2 AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT a AS node FROM e2),
rr(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e2.b, rr.lbl FROM rr JOIN e2 ON e2.a = rr.node
  WHERE rr.lbl < e2.b),
roots AS (SELECT node, min(lbl) AS root FROM rr GROUP BY node)
SELECT node AS node_key, root FROM roots
"""


_KCORE_K = 5
_KCORE_ROUNDS = 8


def kg_kcore(sf_dir: str):
    """k-core of the full KG (k=5): iterative peeling on distributed
    primitives — exchange dedup canonicalizes the undirected simple
    edge set once, each round recounts degrees with the bucketed
    two-phase aggregate and drops <k nodes via a size-guarded semi
    join (functions/graph_algs.py:kcore). Output: surviving nodes with
    their degree INSIDE the core. Oracle: the peel recurrence unrolled
    to the same round cap (both engines run fixed-round semantics; the
    sf fixture converges well inside the cap — pinned by pytest)."""
    from guac_ray.functions.graph_algs import kcore

    g = _corpus_edges(sf_dir)
    out = kcore(g["edges"], "subj_key", "obj_key", k=_KCORE_K,
                exchange_base=_exchange("kg_kcore"), num_buckets=8,
                max_rounds=_KCORE_ROUNDS)
    return out.map_batches(
        lambda t: pa.table({"node_key": t["node"], "deg": t["deg"]}),
        batch_format="pyarrow")


def KG_KCORE_SQL(sf_dir: str) -> str:
    K, R = _KCORE_K, _KCORE_ROUNDS
    parts = [f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(subj_key, obj_key) AS a,
         greatest(subj_key, obj_key) AS b
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key),
e2 AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
a0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM e2)"""]
    for i in range(R):
        parts.append(f""",
a{i + 1} AS MATERIALIZED (
  SELECT e2.a AS node FROM e2
  JOIN a{i} x ON x.node = e2.a
  JOIN a{i} y ON y.node = e2.b
  GROUP BY e2.a HAVING count(*) >= {K})""")
    parts.append(f"""
SELECT e2.a AS node_key, CAST(count(*) AS BIGINT) AS deg
FROM e2
JOIN a{R} x ON x.node = e2.a
JOIN a{R} y ON y.node = e2.b
GROUP BY e2.a
""")
    return "".join(parts)


def _pii_enrich_batch(t: pa.Table) -> pa.Table:
    """Deterministic contact-line enrichment shared by doc_pii_scrub and
    doc_pii_inventory: the synthetic documents carry no PII, so both
    queries derive one from (doc_id, source) — pure Arrow string
    kernels, mirrored exactly by the oracle's ``||`` expression
    (``_PII_ENRICH``) so every row carries ≥4 real matches."""
    import pyarrow.compute as pc

    did = t["doc_id"]
    d = did.to_numpy(zero_copy_only=False).astype("int64")
    s = lambda a: pc.cast(pa.array(a), pa.string())  # noqa: E731
    txt = pc.binary_join_element_wise(
        t["text"], " contact user", s(d), "@", t["source"],
        ".org or +1 555-", s(1000 + d % 9000),
        " from 10.", s(d % 256), ".0.", s((d * 7) % 256),
        " see https://", t["source"], ".example/", s(d),
        "")
    return pa.table({"doc_id": did, "text": txt})


def doc_pii_inventory(sf_dir: str):
    """Token-anchored PII EXTRACTION (functions/text.py
    ``pattern_inventory``) — the explode surface of the PII family
    (``doc_pii_scrub`` redacts; this emits the matched values): one row
    per (doc, kind, matched token) with its occurrence count, for the
    token-shaped categories (email/url/ipv4 — whitespace-delimited by
    construction). Whole stage is RE2 C++ kernels (split → flatten →
    anchored match) — Arrow has no extract-all kernel, and tokenizing
    first is what keeps this both loop-free AND oracle-exact. Same
    deterministic enrichment as doc_pii_scrub so every doc carries
    real matches."""
    from guac_ray.functions.text import PII_PATTERNS, pattern_inventory

    pats = {k: PII_PATTERNS[k] for k in ("email", "url", "ipv4")}
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return pattern_inventory(
        ds.map_batches(_pii_enrich_batch, batch_format="pyarrow"), pats)


def _pii_inventory_sql() -> str:
    from guac_ray.functions.text import PII_PATTERNS

    arms = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, '{kind}' AS kind, tok FROM tok\n"
        f"  WHERE regexp_matches(tok, '^(?:{PII_PATTERNS[kind]})$')"
        for kind in ("email", "url", "ipv4"))
    return f"""
WITH enriched AS (SELECT doc_id, {{enrich}} AS text FROM documents),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, '[\t\n\f\r ]+')) AS tok
  FROM enriched
), hits AS (
{arms}
)
SELECT doc_id, kind, tok AS pii, CAST(count(*) AS BIGINT) AS n
FROM hits GROUP BY 1, 2, 3
"""


def doc_pii_scrub(sf_dir: str):
    """PII redaction (functions/text.py:scrub_pii): URLs, emails, IPv4s
    and phone numbers redacted + counted per category, all via RE2
    kernels (``pc.count_substring_regex`` / ``replace_substring_regex``)
    so DuckDB's identical RE2 reproduces the output byte-for-byte.

    The synthetic documents carry no PII, so the query first derives a
    deterministic contact line from (doc_id, source) — pure Arrow
    string kernels, mirrored exactly by the oracle's ``||`` expression —
    then scrubs the enriched text. The scrub operator itself is the
    general-purpose stage; the enrichment exists only to give the
    oracle real redactions to check (every row scrubs ≥4 spans)."""
    from guac_ray.functions.text import scrub_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return scrub_pii(
        ds.map_batches(_pii_enrich_batch, batch_format="pyarrow"),
        text_col="text")


def _pii_sql_exprs() -> tuple[str, str, str]:
    from guac_ray.functions.text import PII_PATTERNS

    enrich = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@' || "
        "source || '.org or +1 555-' || "
        "CAST(1000 + doc_id % 9000 AS VARCHAR) || ' from 10.' || "
        "CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
        "CAST((doc_id * 7) % 256 AS VARCHAR) || ' see https://' || "
        "source || '.example/' || CAST(doc_id AS VARCHAR)"
    )
    red = "text"
    for cat, pat in PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{esc}', '[{cat.upper()}]', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{cat}"
        for cat, pat in PII_PATTERNS.items())
    return enrich, red, counts


_PII_ENRICH, _PII_RED, _PII_COUNTS = _pii_sql_exprs()

# .replace, not .format — the regex bodies contain {2,} quantifiers
DOC_PII_INVENTORY_SQL = _pii_inventory_sql().replace(
    "{enrich}", _PII_ENRICH)

DOC_PII_SQL = f"""
WITH enriched AS (SELECT doc_id, {_PII_ENRICH} AS text FROM documents)
SELECT doc_id, {_PII_RED} AS text, {_PII_COUNTS}
FROM enriched
"""


def kg_strip_boilerplate(sf_dir: str):
    """Cross-conversation boilerplate turn removal
    (functions/boilerplate.py): a turn text recurring in ≥50 DISTINCT
    conversations is template preamble, not signal. Distinct-group
    counting is two chained ``grouped_agg`` exchanges over md5 digests
    (never text); the boilerplate set is bounded by turns/50 and
    broadcasts once. Output: per-conversation kept/boiler turn counts."""
    from guac_ray.functions.boilerplate import (
        boilerplate_digests, flag_boilerplate)
    from guac_ray.pipelines.kg import filter_valid, read_transcripts

    c = corpus_for_sf(sf_dir)
    ds = filter_valid(read_transcripts(
        c["transcripts"], columns=["conv_id", "turn_idx", "role", "text"]))
    digests = boilerplate_digests(
        ds, "text", "conv_id", min_groups=50, num_buckets=8)
    flagged = flag_boilerplate(ds, "text", digests)

    def to_int(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": t["conv_id"],
            "b": pa.compute.cast(t["is_boiler"], pa.int64()),
        })

    out = grouped_agg(
        flagged.map_batches(to_int, batch_format="pyarrow"),
        ["conv_id"],
        {"n_turns": ("b", "count"), "n_boiler": ("b", "sum")},
        num_buckets=8,
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        df = df.assign(
            n_turns=df["n_turns"].astype("int64"),
            n_boiler=df["n_boiler"].astype("int64"),
        )
        df["n_kept"] = df["n_turns"] - df["n_boiler"]
        return table_from_pandas(df, preserve_index=False)

    return out.map_batches(finish, batch_format="pandas")


def KG_BOILER_SQL(sf_dir: str) -> str:
    return f"""
WITH t AS (SELECT conv_id, text FROM {_t(sf_dir)} WHERE {_VALID}),
bp AS (SELECT text FROM t GROUP BY text HAVING count(DISTINCT conv_id) >= 50)
SELECT conv_id,
       count(*) AS n_turns,
       CAST(coalesce(sum(CASE WHEN text IN (SELECT text FROM bp)
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_boiler,
       count(*) - CAST(coalesce(sum(CASE WHEN text IN (SELECT text FROM bp)
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept
FROM t GROUP BY conv_id
"""


def doc_strip_lines(sf_dir: str):
    """LINE-level boilerplate removal
    (functions/boilerplate.py:strip_boiler_lines): drop every line
    recurring in ≥20 distinct documents, rewrite the docs in place,
    count the drops. The synthetic documents are single-line, so the
    query first wraps each in a deterministic per-source header/footer
    plus a unique id line — pure Arrow string kernels mirrored by the
    oracle's ``||`` expression — giving the rule real cross-document
    template lines to strip (header+footer recur ~50×/source; the id
    line never does; payload only when the corpus truly duplicates
    it)."""
    import pyarrow.compute as pc

    from guac_ray.functions.boilerplate import strip_boiler_lines

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def enrich(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        txt = pc.binary_join_element_wise(
            "== site ", t["source"], " ==\n",
            "doc ", did, "\n",
            t["text"],
            "\nvisit https://", t["source"], ".example for more",
            "")
        return pa.table({"doc_id": t["doc_id"], "text": txt})

    out = strip_boiler_lines(
        ds.map_batches(enrich, batch_format="pyarrow"),
        "text", "doc_id", min_docs=20, num_buckets=8)
    return out.select_columns(["doc_id", "text", "n_dropped"])


DOC_STRIP_LINES_SQL = """
WITH d AS (SELECT doc_id,
                  '== site ' || source || ' ==' || chr(10) ||
                  'doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                  text || chr(10) ||
                  'visit https://' || source || '.example for more' AS text
           FROM documents),
s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
l AS (SELECT doc_id, unnest(ls) AS line,
             generate_subscripts(ls, 1) AS i
      FROM s),
b AS (SELECT line FROM l GROUP BY line
      HAVING count(DISTINCT doc_id) >= 20),
lb AS (SELECT l.doc_id, l.line, l.i, (b.line IS NOT NULL) AS isb
       FROM l LEFT JOIN b ON l.line = b.line)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT isb THEN line END,
                           chr(10) ORDER BY i), '') AS text,
       CAST(sum(CASE WHEN isb THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM lb GROUP BY doc_id
"""


_PCA_SCALE = 1_000_000
_PCA_Q = 1 << 20
_PCA_ITERS = 12


def emb_pca_top(sf_dir: str):
    """Distributed EXACT PCA top component (functions/pca.py): the
    principal direction of the embedding table via quantized integer
    Gram partials (one streaming pass, dims²·blocks partial rows — no
    shuffle at all), an arbitrary-precision driver fold of the
    centered covariance NUMERATOR, and fixed-point power iteration
    with truncating (SQL-semantics) max-abs normalization — the
    kg_hits recurrence discipline applied to a dense 64×64 operator,
    so the whole spectral pipeline is hash-exact vs the unrolled
    HUGEINT oracle. Output one row per dimension (dim,
    component_fp)."""
    from guac_ray.functions.pca import pca_top_component

    ds = _read(sf_dir, "embeddings", ["embedding"])
    return pca_top_component(ds, "embedding", scale=_PCA_SCALE,
                             quantize=_PCA_Q, iters=_PCA_ITERS)


def EMB_PCA_SQL(sf_dir: str) -> str:
    """The same recurrence unrolled: quantize → exact Gram + means →
    Cn = N·Σxy − Σx·Σy → 12 power steps with (w·Q) // max(|w|)
    truncating normalization (HUGEINT everywhere)."""
    S, Q, K = _PCA_SCALE, _PCA_Q, _PCA_ITERS
    parts = [f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {S} + 0.5)
              AS BIGINT) AS x
  FROM embeddings
),
nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
m1 AS MATERIALIZED (
  SELECT dim, CAST(sum(x) AS HUGEINT) AS sx FROM q GROUP BY dim),
g AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, CAST(sum(a.x*b.x) AS HUGEINT) AS sxy
  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY a.dim, b.dim),
cn AS MATERIALIZED (
  SELECT g.i, g.j,
         (SELECT n FROM nn) * g.sxy - ma.sx * mb.sx AS c
  FROM g JOIN m1 ma ON ma.dim = g.i JOIN m1 mb ON mb.dim = g.j),
v0 AS MATERIALIZED (
  SELECT dim, CAST({Q} AS HUGEINT) AS val FROM m1)"""]
    for k in range(1, K + 1):
        parts.append(f""",
w{k} AS MATERIALIZED (
  SELECT cn.i AS dim, SUM(cn.c * v.val) AS wv
  FROM cn JOIN v{k - 1} v ON v.dim = cn.j GROUP BY cn.i),
v{k} AS MATERIALIZED (
  SELECT dim, (wv * {Q}) // (SELECT max(abs(wv)) FROM w{k}) AS val
  FROM w{k})""")
    parts.append(f"""
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(val AS BIGINT) AS component_fp
FROM v{K}""")
    return "".join(parts)


def emb_kmeans(sf_dir: str):
    """Fixed-point k-means over the embedding table
    (functions/kmeans.py): k=8, 3 Lloyd iterations, init = the 8
    smallest vec_ids. Every engine reproduces the assignment exactly —
    quantize-to-int64 via floor, integer distances, integer-mean
    centroids — so the oracle is the same algorithm unrolled as
    materialized CTEs (the fixed-point-PageRank discipline)."""
    from guac_ray.functions.kmeans import kmeans_fixed_point

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_fixed_point(
        ds, vec_col="embedding", id_col="vec_id", k=8, iters=3)


def _kmeans_sql(k: int = 8, iters: int = 3, scale: int = 4096) -> str:
    """Unrolled k-means oracle: q = quantized vectors, c0 = init
    centroids; per iteration t: a{t} assigns under c{t-1} (ties →
    lowest cid, the numpy argmin rule), s{t}/u{t} integer-mean update,
    c{t} carries previous centroids for empty clusters."""
    dist = ("list_sum(list_transform(list_zip(q.v, c.v), "
            "p -> (p[1]-p[2])*(p[1]-p[2])))")
    parts = [f"""
WITH q AS (
  SELECT vec_id, list_transform(embedding,
      x -> CAST(floor((CAST(x AS DOUBLE) + 1.0) * {scale}) AS BIGINT)) AS v
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v
  FROM q ORDER BY vec_id LIMIT {k}
)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
a{t} AS (
  SELECT vec_id, cid FROM (
    SELECT q.vec_id, c.cid,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {dist}, c.cid) AS rn
    FROM q CROSS JOIN c{t - 1} AS c) WHERE rn = 1
),
s{t} AS (
  SELECT cid, i, sum(x) AS sx, count(*) AS n FROM (
    SELECT a.cid, unnest(q.v) AS x, unnest(range(len(q.v))) AS i
    FROM q JOIN a{t} a USING (vec_id))
  GROUP BY cid, i
),
u{t} AS (
  SELECT cid, list(CAST(sx // n AS BIGINT) ORDER BY i) AS v
  FROM s{t} GROUP BY cid
),
c{t} AS (
  SELECT c{t - 1}.cid, coalesce(u{t}.v, c{t - 1}.v) AS v
  FROM c{t - 1} LEFT JOIN u{t} USING (cid)
)""")
    final = f"""
SELECT vec_id, cid AS cluster FROM (
  SELECT q.vec_id, c.cid,
    row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {dist}, c.cid) AS rn
  FROM q CROSS JOIN c{iters} AS c) WHERE rn = 1"""
    return "".join(parts), final


def _kmeans_full_sql(**kw) -> str:
    with_parts, final = _kmeans_sql(**kw)
    return with_parts + final + "\n"


EMB_KMEANS_SQL = _kmeans_full_sql()


def emb_semdedup(sf_dir: str):
    """SemDeDup-style semantic dedup (functions/kmeans.py): k-means
    buckets (k=8, 3 iterations — the exact emb_kmeans assignment) then
    within-cluster near-dup pruning on quantized int64 L2. kept=0 rows
    are the semantic duplicates a curation pipeline would drop. The
    radius here is 23.5e6 ≈ cosine 0.30: the synthetic embeddings are
    near-orthogonal (max pairwise cosine 0.6 — no pairs exist at the
    paper's 0.95, the function's default), so the gate radius sits
    where BOTH branches are exercised (~40% of rows drop at every sf).
    The oracle unrolls the SAME kmeans CTEs as EMB_KMEANS_SQL plus one
    within-cluster self-join — so this query transitively re-verifies
    the kmeans assignment too."""
    from guac_ray.functions.kmeans import semdedup_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup_embeddings(
        ds, k=8, iters=3, dist2_max=23_500_000,
        exchange_base=_exchange("semdedup"))


def _semdedup_sql(k: int = 8, iters: int = 3, d2: int = 23_500_000) -> str:
    """EMB_KMEANS_SQL's unrolled CTEs + final assignment as a CTE + one
    within-cluster lower-id pair join: j is dropped iff SOME i<j in its
    cluster has quantized ‖qi−qj‖² ≤ d2 (all-integer arithmetic)."""
    with_parts, _ = _kmeans_sql(k=k, iters=iters)
    dist = ("list_sum(list_transform(list_zip(q.v, c.v), "
            "p -> (p[1]-p[2])*(p[1]-p[2])))")
    pair = ("list_sum(list_transform(list_zip(qa.v, qb.v), "
            "p -> (p[1]-p[2])*(p[1]-p[2])))")
    return with_parts + f""",
fin AS (
  SELECT vec_id, cid FROM (
    SELECT q.vec_id, c.cid,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {dist}, c.cid) AS rn
    FROM q CROSS JOIN c{iters} AS c) WHERE rn = 1
),
dup AS (
  SELECT DISTINCT b.vec_id AS j
  FROM fin a JOIN fin b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN q qa ON qa.vec_id = a.vec_id
  JOIN q qb ON qb.vec_id = b.vec_id
  WHERE {pair} <= {d2}
)
SELECT f.vec_id, f.cid AS cluster,
       CAST(CASE WHEN d.j IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM fin f LEFT JOIN dup d ON f.vec_id = d.j
"""


EMB_SEMDEDUP_SQL = _semdedup_sql()


def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals
    (functions/text.py:RepetitionScorer): per-doc token/distinct/bigram
    counts, max bigram multiplicity, and its lexicographically-smallest
    witness — all int64/string, engine-exact under the shared
    RE2-whitespace token grammar."""
    from guac_ray.functions.text import repetition_scores

    return repetition_scores(_read(sf_dir, "documents", ["doc_id", "text"]))


DOC_REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents),
base AS (
  SELECT doc_id, len(w) AS n_tokens,
         len(list_distinct(w)) AS n_distinct_tokens,
         CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END AS n_bigrams,
         list_transform(range(greatest(len(w) - 1, 0)),
                        i -> w[i+1] || ' ' || w[i+2]) AS bg
  FROM w),
bgc AS (
  SELECT doc_id, b, count(*) AS n
  FROM (SELECT doc_id, unnest(bg) AS b FROM base) GROUP BY doc_id, b),
top AS (
  SELECT doc_id, n AS max_bigram_n, b AS top_bigram FROM bgc
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, b) = 1)
SELECT base.doc_id, n_tokens, n_distinct_tokens, n_bigrams,
       coalesce(top.max_bigram_n, 0) AS max_bigram_n,
       coalesce(top.top_bigram, '') AS top_bigram
FROM base LEFT JOIN top USING (doc_id)
"""


def emb_cluster_sample(sf_dir: str, k_per_cluster: int = 5):
    """Cluster-balanced sampling — the curation move AFTER clustering
    (sample evenly across semantic clusters instead of by volume):
    fixed-k per k-means cluster under the md5(id) hash ordering
    (deterministic, resume/engine-swap stable — the
    events_sample_k_per_type discipline on a COMPUTED stratum). The
    shuffle is bounded at k rows per (cluster, batch)."""
    import hashlib

    from guac_ray.functions.kmeans import kmeans_fixed_point
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    assign = kmeans_fixed_point(
        ds, vec_col="embedding", id_col="vec_id", k=8, iters=3)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        df = pd.DataFrame({
            "vec_id": ids,
            "cluster": t["cluster"].to_numpy(zero_copy_only=False),
            "_h": [hashlib.md5(str(i).encode()).hexdigest() for i in ids],
        })
        out = (df.sort_values(["cluster", "_h"], kind="mergesort")
               .groupby("cluster", sort=False).head(k_per_cluster))
        out["_bucket"] = (stable_hash(out, ["cluster"]) % 4).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = (df.sort_values(["cluster", "_h"], kind="mergesort")
               .groupby("cluster", sort=False).head(k_per_cluster)
               .drop(columns=["_h"]))
        return table_from_pandas(out, preserve_index=False)

    partials = assign.map_batches(partial, batch_format="pyarrow")
    out = fs_exchange_reduce(partials, _exchange("cluster_sample"), final)
    return out if out is not None else rd.from_items([])


def _cluster_sample_sql(k_per_cluster: int = 5) -> str:
    with_parts, final = _kmeans_sql()
    return f"""{with_parts},
assign AS ({final})
SELECT vec_id, cluster FROM assign
QUALIFY row_number() OVER (PARTITION BY cluster
                           ORDER BY md5(CAST(vec_id AS VARCHAR)))
        <= {k_per_cluster}
"""


EMB_CLUSTER_SAMPLE_SQL = _cluster_sample_sql()


# mixture weights for the doc_source_mixture query — exact 1/256ths
# only, so floor(frac·256) is float-hazard-free on both engines
_MIXTURE_WEIGHTS = {"src0": 2.5, "src1": 2.0, "src2": 0.25,
                    "src3": 0.5, "src4": 0.0}


def doc_source_mixture(sf_dir: str):
    """Domain-reweighted resampling (pipelines/curation.py:
    source_mixture): upsample src0/src1, downsample src2/src3, drop
    src4, keep the rest at 1.0 — deterministic md5-byte fractions, one
    output row per kept copy."""
    from guac_ray.pipelines.curation import source_mixture

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return source_mixture(ds, _MIXTURE_WEIGHTS, default=1.0)


def _mixture_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _MIXTURE_WEIGHTS.items())
    return f"""
WITH w AS (
  SELECT doc_id, source,
         CASE source {cases} ELSE 1.0 END AS wt
  FROM documents),
tot AS (
  SELECT doc_id, source,
         CAST(floor(wt) AS BIGINT)
         + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                     < printf('%02x',
                              CAST(floor((wt - floor(wt)) * 256) AS BIGINT))
                THEN 1 ELSE 0 END AS copies
  FROM w)
SELECT doc_id, source, CAST(u AS BIGINT) AS copy
FROM (SELECT doc_id, source, unnest(range(copies)) AS u FROM tot)
"""


DOC_MIXTURE_SQL = _mixture_sql()


def events_funnel(sf_dir: str):
    """signup → click → purchase funnel per user, window anchored at
    signup (7 days): the ordered-sequence analytics operator
    (functions/funnel.py — co-partitioned by user, k vectorized passes
    per bucket, non-step rows pruned before the exchange)."""
    from guac_ray.functions.funnel import funnel

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel(ds, "user_id", "ts", "event_type",
                  ["signup", "click", "purchase"],
                  within=pd.Timedelta(days=7),
                  exchange_base=_exchange("events_funnel"))


EVENTS_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND epoch_us(e.ts) - epoch_us(s1.t1) <= 604800000000
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND epoch_us(e.ts) - epoch_us(s1.t1) <= 604800000000
  GROUP BY e.user_id
)
SELECT s1.user_id,
       1 + CAST(t2 IS NOT NULL AS BIGINT)
         + CAST(t3 IS NOT NULL AS BIGINT) AS funnel_level,
       t1, t2, t3
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def events_span_join(sf_dir: str):
    """Interval OVERLAP join (functions/joins.py:interval_join): purchase
    spans × error spans per user (same value-cents×10s span derivation
    as events_intervals — integer-µs endpoints keep both engines exact),
    plus the overlap length. Co-partitioned by user; candidates via the
    max-right-length window bound, one vectorized verify pass."""
    from guac_ray.functions.joins import interval_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value",
                                  "event_type"])

    def spans(kind: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            m = df[df.event_type == kind]
            s = m["ts"].to_numpy().astype("datetime64[us]").view("int64")
            e = s + cents(m["value"]) * 10_000_000
            return pd.DataFrame({"user_id": m["user_id"].to_numpy(),
                                 "event_id": m["event_id"].to_numpy(),
                                 "s": s, "e": e})
        return fn

    j = interval_join(
        ev.map_batches(spans("purchase"), batch_format="pandas"),
        ev.map_batches(spans("error"), batch_format="pandas"),
        by="user_id", left_start="s", left_end="e",
        right_start="s", right_end="e",
        exchange_dir=_exchange("span_join"), num_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df.user_id.astype("int64"),
            "purchase_id": df.event_id.astype("int64"),
            "error_id": df.event_id_r.astype("int64"),
            "overlap_us": (np.minimum(df.e, df.e_r)
                           - np.maximum(df.s, df.s_r)).astype("int64"),
        })
        return out

    return j.map_batches(finish, batch_format="pandas")


EVENTS_SPAN_JOIN_SQL = """
WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                  epoch_us(ts)
                  + CAST(floor(value*100 + 0.5) AS BIGINT) * 10000000 AS e
           FROM events WHERE event_type = 'purchase'),
r AS (SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts)
             + CAST(floor(value*100 + 0.5) AS BIGINT) * 10000000 AS e
      FROM events WHERE event_type = 'error')
SELECT l.user_id, l.event_id AS purchase_id, r.event_id AS error_id,
       least(l.e, r.e) - greatest(l.s, r.s) AS overlap_us
FROM l JOIN r ON l.user_id = r.user_id AND l.s <= r.e AND r.s <= l.e
"""


_CHUNK_SIZE, _CHUNK_STRIDE = 200, 150


def doc_chunks(sf_dir: str):
    """Overlapping context-window chunking (functions/chunking.py):
    200-codepoint windows every 150 — a pure map, no shuffle; the
    chunk-count rule is the same DOUBLE expression in both engines."""
    from guac_ray.functions.chunking import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, "text", _CHUNK_SIZE, _CHUNK_STRIDE)


DOC_CHUNKS_SQL = f"""
WITH c AS (
  SELECT doc_id, text,
         CASE WHEN length(text) <= {_CHUNK_SIZE} THEN 1
              ELSE CAST(ceil((length(text) - {_CHUNK_SIZE})
                             / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1
         END AS nc
  FROM documents)
SELECT doc_id, CAST(u AS BIGINT) AS chunk_idx,
       substring(text, CAST(u AS BIGINT) * {_CHUNK_STRIDE} + 1,
                 {_CHUNK_SIZE}) AS chunk
FROM (SELECT doc_id, text, unnest(range(nc)) AS u FROM c)
"""


def events_corr(sf_dir: str):
    """Exact grouped Pearson correlation + population covariance
    (functions/stats.py): value-cents vs second-of-day per event type —
    int64 moment sums through the two-phase aggregate, one fixed double
    expression mirrored by the oracle over HUGEINT sums."""
    from guac_ray.functions.stats import grouped_corr

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "x": cents(df["value"]),
            "y": (us // 1_000_000) % 86_400,
        })

    return grouped_corr(ev.map_batches(derive, batch_format="pandas"),
                        "event_type", "x", "y", num_buckets=4)


EVENTS_CORR_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS x,
         (epoch_us(ts) // 1000000) % 86400 AS y
  FROM events),
m AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         sum(x*x) AS sxx, sum(y*y) AS syy,
         min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
  FROM t GROUP BY event_type)
SELECT event_type, n,
  CASE WHEN mnx = mxx OR mny = mxy THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE)
     - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
    / CAST(n AS DOUBLE) END AS cov,
  CASE WHEN mnx = mxx OR mny = mxy THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE)
     - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
    / (sqrt(CAST(sxx AS DOUBLE)
            - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
       * sqrt(CAST(syy AS DOUBLE)
              - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                / CAST(n AS DOUBLE))) END AS corr
FROM m
"""


def events_setops(sf_dir: str):
    """SQL INTERSECT + EXCEPT (functions/setops.py) in one result:
    distinct (user, day-index) click days split into those that are also
    purchase days ('both') and those that are not ('click_only') — one
    tagged union of the two set operators, each a single tuple-hash
    exchange with per-batch local dedup combiners."""
    from guac_ray.functions.setops import except_distinct, intersect_distinct

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def days(kind: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            m = df[df.event_type == kind]
            us = m["ts"].to_numpy().astype("datetime64[us]").view("int64")
            return pd.DataFrame({"user_id": m["user_id"].to_numpy(),
                                 "day": us // 86_400_000_000})
        return fn

    clicks = ev.map_batches(days("click"), batch_format="pandas")
    purchases = ev.map_batches(days("purchase"), batch_format="pandas")
    cols = ["user_id", "day"]
    both = intersect_distinct(clicks, purchases, cols, num_buckets=4,
                              exchange_base=_exchange("setop_i"))
    only = except_distinct(clicks, purchases, cols, num_buckets=4,
                           exchange_base=_exchange("setop_e"))

    def tag(t: str):
        return lambda df: df.assign(tag=t)

    return both.map_batches(tag("both"), batch_format="pandas").union(
        only.map_batches(tag("click_only"), batch_format="pandas"))


EVENTS_SETOPS_SQL = """
WITH c AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
           FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events WHERE event_type = 'purchase')
SELECT user_id, day, 'both' AS tag
FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
UNION ALL
SELECT user_id, day, 'click_only' AS tag
FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
"""


def events_transitions(sf_dir: str):
    """Event-sequence transition counts (Markov bigrams): lag(event_type)
    per user under the deterministic (ts, event_id) order, then a
    two-phase grouped count over (prev, cur) — a pure COMPOSITION of the
    windowed-lag and bucketed-aggregate operators, no new machinery."""
    from guac_ray.functions.window import windowed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    w = windowed(ev, by="user_id", order=["ts", "event_id"],
                 ops={"prev_type": ("lag", "event_type")},
                 exchange_base=_exchange("transitions"), num_buckets=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df.prev_type.notna()]
        t = pd.DataFrame({"prev_type": m.prev_type.to_numpy(),
                          "event_type": m.event_type.to_numpy()})
        return t.groupby(["prev_type", "event_type"], sort=False) \
            .size().rename("_n").reset_index()

    agg = grouped_agg(w.map_batches(partial, batch_format="pandas"),
                      ["prev_type", "event_type"], {"n": ("_n", "sum")},
                      num_buckets=4)
    return agg.map_batches(
        lambda df: df.assign(n=df.n.astype("int64")),
        batch_format="pandas")


EVENTS_TRANSITIONS_SQL = """
WITH t AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type, count(*) AS n
FROM t WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def events_quantile_buckets(sf_dir: str):
    """Equi-depth bucketing at EXACT global quartiles: the sortless
    exact-quantile operator yields the three bounds (a scalar-sized
    result — the one legitimate driver pull), broadcast into a bucket
    map (1 + Σ value > bound, ties stay low), finished by the two-phase
    grouped aggregate — quantiles ∘ map ∘ aggregate composition."""
    from guac_ray.functions.quantiles import exact_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    q = exact_quantiles(ev, "value",
                        {"b1": 0.25, "b2": 0.5, "b3": 0.75},
                        num_range_buckets=64, num_buckets=4)
    b1 = float(q["b1"].iloc[0])
    b2 = float(q["b2"].iloc[0])
    b3 = float(q["b3"].iloc[0])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy()
        t = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "bucket": (1 + (v > b1).astype("int64") + (v > b2)
                       + (v > b3)).astype("int64"),
            "_vc": cents(v),
        })
        return t.groupby(["event_type", "bucket"], sort=False).agg(
            _n=("_vc", "size"), _vc=("_vc", "sum")).reset_index()

    agg = grouped_agg(ev.map_batches(bucketize, batch_format="pandas"),
                      ["event_type", "bucket"],
                      {"n": ("_n", "sum"), "vc": ("_vc", "sum")},
                      num_buckets=4)
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "event_type": df.event_type, "bucket": df.bucket.astype("int64"),
            "n": df.n.astype("int64"), "value_cents": df.vc.astype("int64")}),
        batch_format="pandas")


EVENTS_QBUCKETS_SQL = """
WITH b AS (SELECT quantile_disc(value, 0.25) AS b1,
                  quantile_disc(value, 0.5)  AS b2,
                  quantile_disc(value, 0.75) AS b3
           FROM events),
t AS (SELECT event_type,
             1 + CAST(value > b1 AS BIGINT) + CAST(value > b2 AS BIGINT)
               + CAST(value > b3 AS BIGINT) AS bucket,
             CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
      FROM events, b)
SELECT event_type, bucket, count(*) AS n,
       CAST(sum(vc) AS BIGINT) AS value_cents
FROM t GROUP BY event_type, bucket
"""


_PATCH_COST_HOPS = 4


def kg_patch_cost(sf_dir: str):
    """Cost-weighted patch radius: single-source WEIGHTED shortest paths
    (functions/paths.py — k-iteration Bellman-Ford on static edge
    buckets, only the frontier-sized dist table moves per round) over
    the reverse depends_on graph from the same most-depended-on target
    kg_patch_radius uses. Integer edge weights derive from key lengths
    (1 + (|subj|+|dep|) % 7 — deterministic in both engines); dist(v) =
    min cost over ≤4-edge paths, bit-exact vs the bounded recursive-CTE
    oracle."""
    from guac_ray.functions.paths import shortest_paths
    from guac_ray.stages.assemble import dedup_exact

    deps = kg_depends_on(sf_dir)

    def pair(batch: pa.Table) -> pa.Table:
        return pa.table({"subj_key": batch["subj_key"],
                         "obj_key": batch["dep_key"]})

    pairs = dedup_exact(deps.map_batches(pair, batch_format="pyarrow"),
                        ["subj_key", "obj_key"], num_buckets=4)
    # name-level pair set is catalog-bounded (driver-small), the same
    # materialization precedent as kg_patch_radius's target selection
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"node_key": pd.Series(dtype="object"),
                             "dist": pd.Series(dtype="int64")})
    cnt = pdf.groupby("obj_key")["subj_key"].nunique()
    target = cnt.sort_index().sort_values(kind="stable",
                                          ascending=False).index[0]
    ew = pd.DataFrame({
        "src": pdf["obj_key"],        # reverse traversal: dependents
        "dst": pdf["subj_key"],
        "w": (1 + (pdf["subj_key"].str.len()
                   + pdf["obj_key"].str.len()) % 7).astype("int64"),
    })
    return shortest_paths(rd.from_pandas(ew), target,
                          k=_PATCH_COST_HOPS, num_buckets=4,
                          exchange_base=_exchange("patch_cost"))


def KG_PATCH_COST_SQL(sf_dir: str) -> str:
    return f"""
WITH RECURSIVE deps AS (
  SELECT DISTINCT subj_key, dep_key FROM ({KG_DEPENDS_ON_SQL(sf_dir)})
), w AS (
  SELECT subj_key, dep_key,
         1 + (length(subj_key) + length(dep_key)) % 7 AS w
  FROM deps
), target AS (
  SELECT dep_key AS node_key
  FROM (SELECT dep_key, count(DISTINCT subj_key) AS c
        FROM deps GROUP BY dep_key)
  ORDER BY c DESC, node_key ASC LIMIT 1
), reach(node_key, dist, hops) AS (
  SELECT node_key, 0, 0 FROM target
  UNION ALL
  SELECT w.subj_key, r.dist + w.w, r.hops + 1
  FROM reach r JOIN w ON w.dep_key = r.node_key
  WHERE r.hops < {_PATCH_COST_HOPS}
)
SELECT node_key, CAST(min(dist) AS BIGINT) AS dist
FROM reach GROUP BY node_key
"""


def events_mad(sf_dir: str):
    """Grouped MEDIAN ABSOLUTE DEVIATION — the robust-statistics
    composition: exact grouped median (sortless quantile operator) →
    broadcast the 5-row med table → derive |v - med| in a streaming map
    → exact grouped median of the deviations. All integer-cents, so
    both medians are quantile_disc-exact in both engines (DuckDB's
    builtin mad() interpolates; the oracle spells the same disc-disc
    composition instead)."""
    from guac_ray.functions.quantiles import exact_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "vc": cents(df["value"])})

    dsc = ev.map_batches(to_cents, batch_format="pandas")
    med = exact_quantiles(dsc, "vc", {"med": 0.5}, by=["event_type"],
                          num_range_buckets=64, num_buckets=4)
    med_map = dict(zip(med["event_type"], med["med"].astype("int64")))

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].map(med_map).to_numpy().astype("int64")
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "dev": np.abs(df["vc"].to_numpy() - m)})

    mad = exact_quantiles(dsc.map_batches(dev, batch_format="pandas"),
                          "dev", {"mad": 0.5}, by=["event_type"],
                          num_range_buckets=64, num_buckets=4)
    out = med.merge(mad, on="event_type")
    return pd.DataFrame({
        "event_type": out["event_type"],
        "median_cents": out["med"].astype("int64"),
        "mad_cents": out["mad"].astype("int64")})


EVENTS_MAD_SQL = """
WITH t AS (
  SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events),
m AS (
  SELECT event_type, CAST(quantile_disc(vc, 0.5) AS BIGINT) AS med
  FROM t GROUP BY event_type),
d AS (
  SELECT t.event_type, med, abs(vc - med) AS dev
  FROM t JOIN m USING (event_type))
SELECT event_type,
       CAST(any_value(med) AS BIGINT) AS median_cents,
       CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad_cents
FROM d GROUP BY event_type
"""


_CENTROID_Q = 1_000_000


def emb_label_centroids(sf_dir: str):
    """Grouped VECTOR aggregation: per-label centroid of the embedding
    column in fixed-point (each element quantized once with the same
    IEEE expression in both engines, int64 sums are order-independent,
    mean = floor(sum/n) in double — bit-exact vs the unnest-WITH-
    ORDINALITY oracle). Per batch: one matrix stack + one wide groupby
    melted to (label, dim) partials; the exchange moves labels×64 rows
    per block, never vectors."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy())
        q = np.floor(mat.astype("float64") * _CENTROID_Q + 0.5).astype("int64")
        w = pd.DataFrame(q)
        w["label"] = df["label"].to_numpy().astype("int64")
        g = w.groupby("label", sort=False)
        s = g.sum()
        n = g.size().rename("_n")
        long = s.reset_index().melt(id_vars="label", var_name="dim",
                                    value_name="_s")
        long["dim"] = long["dim"].astype("int64")
        return long.merge(n.reset_index(), on="label")

    agg = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                      ["label", "dim"],
                      {"s": ("_s", "sum"), "n": ("_n", "sum")},
                      num_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "label": df["label"].astype("int64"),
            "dim": df["dim"].astype("int64"),
            "n": df["n"].astype("int64"),
            "centroid_q": np.floor(
                df["s"].to_numpy().astype("float64")
                / df["n"].to_numpy().astype("float64")).astype("int64"),
        })

    return agg.map_batches(finish, batch_format="pandas")


EMB_CENTROIDS_SQL = f"""
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                    * {_CENTROID_Q} + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(range(len(embedding))) AS t(i))
SELECT label, dim, count(*) AS n,
       CAST(floor(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT)
           AS centroid_q
FROM e GROUP BY label, dim
"""


def events_range_windows(sf_dir: str):
    """TIME-RANGE moving aggregates (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW): value-defined frames with peer
    inclusion, computed per bucket with three vectorized searchsorteds
    on the dense-rank composite + prefix-sum differences
    (functions/window.py range_sum/range_count) — the variable-width
    complement of the ROWS-based rolling family."""
    from guac_ray.functions.window import windowed

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_vc(df: pd.DataFrame) -> pd.DataFrame:
        df["vc"] = cents(df["value"])
        return df

    w = windowed(ev.map_batches(add_vc, batch_format="pandas"),
                 by="user_id", order="ts",
                 ops={"w_sum": ("range_sum", "vc", pd.Timedelta(hours=1)),
                      "w_n": ("range_count", "vc", pd.Timedelta(hours=1))},
                 exchange_base=_exchange("range_windows"), num_buckets=8)

    def finish(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy().astype("int64")),
            # vc is derived non-null ⇒ no empty frames ⇒ exact int64
            "w_sum": pa.array(df["w_sum"].to_numpy().astype("int64")),
            "w_n": pa.array(df["w_n"].to_numpy().astype("int64")),
        })

    return w.map_batches(finish, batch_format="pandas")


EVENTS_RANGE_WINDOWS_SQL = """
WITH t AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events)
SELECT event_id,
       CAST(sum(vc) OVER w AS BIGINT) AS w_sum,
       count(vc) OVER w AS w_n
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def events_props_agg(sf_dir: str):
    """Semi-structured field extraction: pull the integer ``k`` field
    out of the JSON ``props`` column with ONE vectorized Arrow
    ``extract_regex`` kernel (no per-row json.loads — flat numeric
    fields need no parser), then the two-phase grouped aggregate.
    Oracle uses real ``json_extract``; the regex matches it exactly on
    flat integer fields."""
    import pyarrow.compute as pc

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], pattern=r'"k":\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({"event_type": batch["event_type"], "k": k})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False)["k"]
        out = g.agg(_n="count", _s="sum", _mn="min", _mx="max").reset_index()
        return out.astype({"_n": "int64", "_s": "int64",
                           "_mn": "int64", "_mx": "int64"})

    agg = grouped_agg(
        ev.map_batches(extract, batch_format="pyarrow")
          .map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"n": ("_n", "sum"), "sum_k": ("_s", "sum"),
         "min_k": ("_mn", "min"), "max_k": ("_mx", "max")},
        num_buckets=4)
    return agg.map_batches(
        lambda df: df.assign(n=df.n.astype("int64"),
                             sum_k=df.sum_k.astype("int64"),
                             min_k=df.min_k.astype("int64"),
                             max_k=df.max_k.astype("int64")),
        batch_format="pandas")


EVENTS_PROPS_SQL = """
WITH t AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM t GROUP BY event_type
"""


def events_ohlc(sf_dir: str):
    """Per-(user, hour) OHLC bars — open/high/low/close/count over the
    event value stream, the time-series resample every metrics store
    runs. Exercises the ARGMIN/ARGMAX aggregate kernel
    (stages/groupagg.py ``grouped_first_last``): open/close are the
    values at the lexicographic min/max of (ts, event_id) — event_id
    makes the order tuple unique, so the merge is deterministic under
    any partitioning — combined with plain min/max/count partials in
    ONE two-phase exchange (cardinality × blocks rows, never the event
    stream). high/low/open/close are untouched copies of input doubles,
    so the hash compare is exact."""
    from guac_ray.stages.groupagg import grouped_first_last

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hr = (us // 3_600_000_000) * 3_600_000_000
        return pa.table({
            "user_id": t["user_id"], "hr": pa.array(hr).cast(pa.timestamp("us")),
            "ts": t["ts"], "event_id": t["event_id"], "value": t["value"],
        })

    return grouped_first_last(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["user_id", "hr"], order_cols=["ts", "event_id"],
        spec={"open": ("value", "first"), "high": ("value", "max"),
              "low": ("value", "min"), "close": ("value", "last"),
              "n": ("value", "count")},
        num_buckets=8)


EVENTS_OHLC_SQL = """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS hr, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events)
SELECT user_id, hr,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM r GROUP BY 1, 2
"""


def user_streaks(sf_dir: str):
    """Consecutive-active-day streaks per user (functions/streams.py
    ``daily_streaks``) — the calendar-day gaps-and-islands operator
    engagement/retention analytics runs: distinct active days, longest
    consecutive-day run and run count per user, all exact int64. One
    user-hash fs exchange after an in-batch (user, day) combiner; the
    islands math is one vectorized sort + cumcount per bucket."""
    from guac_ray.functions.streams import daily_streaks

    return daily_streaks(_read(sf_dir, "events", ["user_id", "ts"]),
                         exchange_base=_exchange("streaks"))


USER_STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
              AS INT) AS rn
  FROM d
), i AS (
  SELECT user_id, day - rn AS anchor, CAST(count(*) AS BIGINT) AS len
  FROM r GROUP BY user_id, day - rn
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS active_days,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM i GROUP BY user_id
"""


def events_cohort_retention(sf_dir: str):
    """Daily cohort retention matrix (functions/streams.py
    ``cohort_retention``, period_days=1 — the events table spans one
    month, so daily cohorts give a non-degenerate matrix) — users
    cohorted by FIRST active epoch-day, each (cohort, offset) cell
    counting distinct users of that cohort active that many days
    later; all int64. ONE user-hash fs exchange after an in-batch
    (user, day) combiner (a user lives in exactly one bucket, so
    per-bucket cell counts are exact disjoint partials), then the
    standard grouped_agg combine over a cells × buckets table."""
    from guac_ray.functions.streams import cohort_retention

    return cohort_retention(_read(sf_dir, "events", ["user_id", "ts"]),
                            period_days=1,
                            exchange_base=_exchange("cohort"))


EVENTS_COHORT_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS week
  FROM events
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM d GROUP BY user_id
)
SELECT c.cohort_week, d.week - c.cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id)
GROUP BY 1, 2
"""


def events_dau_wau(sf_dir: str):
    """DAU + trailing-7-day distinct active users per observed day
    (functions/streams.py ``rolling_active_users``) — the windowed
    COUNT(DISTINCT) no plain window op can express, distributed as
    per-user interval COVERAGE: gap≤6 islands merge [d, d+6] unions
    inside ONE user-hash fs exchange, vectorized repeat/arange
    expansion emits per-day disjoint partials (≤7× the user-day pairs,
    never event-scale), grouped_agg sums per day. Both counts exact
    int64."""
    from guac_ray.functions.streams import rolling_active_users

    return rolling_active_users(
        _read(sf_dir, "events", ["user_id", "ts"]),
        window_days=7, exchange_base=_exchange("rollact"))


EVENTS_DAU_WAU_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS epoch_day
  FROM events
), days AS (
  SELECT DISTINCT epoch_day FROM d
)
SELECT days.epoch_day,
       CAST(count(DISTINCT CASE WHEN dd.epoch_day = days.epoch_day
                            THEN dd.user_id END) AS BIGINT) AS dau,
       CAST(count(DISTINCT dd.user_id) AS BIGINT) AS wau
FROM days JOIN d dd
  ON dd.epoch_day BETWEEN days.epoch_day - 6 AND days.epoch_day
GROUP BY 1
"""


_WSAMPLE_K = 100


def doc_weighted_sample(sf_dir: str):
    """Weighted sampling WITHOUT replacement (functions/sampling.py,
    Efraimidis–Spirakis): 100 documents weighted by length — the
    md5-deterministic ln(u)/w key makes the sample itself
    oracle-checkable, not just its size."""
    from guac_ray.functions.sampling import weighted_sample_k

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars", "source"])
    return weighted_sample_k(ds, _WSAMPLE_K, "n_chars", "doc_id",
                             keep_cols=["n_chars", "source"])


DOC_WSAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id, n_chars, source,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
             AS BIGINT) + 0.5) / 4503599627370496.0)
         / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0)
SELECT doc_id, n_chars, source FROM t
QUALIFY row_number() OVER (ORDER BY key DESC, doc_id) <= {_WSAMPLE_K}
"""


def doc_surprisal(sf_dir: str):
    """Corpus-unigram surprisal per document (functions/text.py:
    unigram_surprisal) — the LM-style quality signal training-data
    curation uses as a cheap perplexity stand-in. Per-term micro-nat
    quantization makes the per-doc INTEGER sums order-independent, so
    the whole score is oracle-exact; the vocabulary count table is the
    only shuffle (vocab × blocks rows) and the per-doc sum is
    batch-local (a doc is one row — no token-scale data moves)."""
    from guac_ray.functions.text import unigram_surprisal

    return unigram_surprisal(_read(sf_dir, "documents", ["doc_id", "text"]))


DOC_SURPRISAL_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok2 GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab
), q AS (
  SELECT term,
         CAST(floor(1000000.0 * (ln(CAST(n AS DOUBLE)) -
                                 ln(CAST(c AS DOUBLE))) + 0.5)
              AS BIGINT) AS q
  FROM vocab, tot
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(q.q) AS BIGINT) AS surprisal_micronats,
       CAST(sum(q.q) // count(*) AS BIGINT) AS mean_surprisal
FROM tok2 t JOIN q USING (term)
GROUP BY 1
"""


def events_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution in
    EXACT integer micro-nats — the behavioral-diversity signal (and the
    same quantization contract as doc_surprisal): each (user, type)
    term is quantized ``q = floor(1e6*(ln n − ln c) + 0.5)`` with
    SCALAR libm logs over the handful of DISTINCT count values (numpy's
    vectorized log may differ from DuckDB's libm in the last ulp — the
    lookup keeps both engines on the identical double), and the user's
    entropy is the int64 dot product ``Σ c·q // n`` — floor division,
    order-independent, bit-exact.

    Shape: per-batch (user, type) count partials (the combiner bounds
    shuffle volume at users × types rows per block), one user-hash
    exchange, per-bucket vectorized reduce. Nothing event-scale moves.
    """
    import math

    from guac_ray.stages.assemble import fs_exchange_reduce

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    num_buckets = 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["user_id", "event_type"], sort=False).agg(
            _n=("event_type", "size")).reset_index()
        out["_bucket"] = (out.user_id.to_numpy() % num_buckets).astype("int64")
        return out

    def reduce_fn(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        t = df.groupby(["user_id", "event_type"], sort=False).agg(
            c=("_n", "sum")).reset_index()
        n = t.groupby("user_id", sort=False)["c"].transform("sum").to_numpy()
        c = t["c"].to_numpy().astype("int64")
        lut = {v: math.log(float(v)) for v in
               np.unique(np.concatenate([n, c])).tolist()}
        ln_n = np.array([lut[v] for v in n.tolist()])
        ln_c = np.array([lut[v] for v in c.tolist()])
        q = np.floor(1000000.0 * (ln_n - ln_c) + 0.5).astype("int64")
        t["_cq"] = c * q
        t["_n"] = n
        out = t.groupby("user_id", sort=False).agg(
            n_events=("c", "sum"), n_types=("c", "size"),
            cq=("_cq", "sum"), n=("_n", "first")).reset_index()
        out["entropy_micronats"] = (
            out["cq"].to_numpy() // out["n"].to_numpy()).astype("int64")
        out = out.astype({"user_id": "int64", "n_events": "int64",
                          "n_types": "int64"})
        return table_from_pandas(
            out[["user_id", "n_events", "n_types", "entropy_micronats"]])

    red = fs_exchange_reduce(ds.map_batches(partial, batch_format="pandas"),
                             _exchange("events_entropy"), reduce_fn)
    if red is None:
        return pa.schema(
            [("user_id", pa.int64()), ("n_events", pa.int64()),
             ("n_types", pa.int64()), ("entropy_micronats", pa.int64())],
        ).empty_table()
    return red


EVENTS_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), t AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_types
  FROM c GROUP BY 1
)
SELECT c.user_id,
       t.n AS n_events, t.n_types,
       CAST(sum(c.c * CAST(floor(1000000.0 * (ln(CAST(t.n AS DOUBLE)) -
                                              ln(CAST(c.c AS DOUBLE)))
                                 + 0.5) AS BIGINT)) // t.n
            AS BIGINT) AS entropy_micronats
FROM c JOIN t USING (user_id)
GROUP BY 1, t.n, t.n_types
"""


def kg_clustering(sf_dir: str):
    """Per-node local clustering coefficient over the assembled KG
    (functions/triangles.py:clustering_coefficient): the triangle
    machinery with sources carried through the closing semi join so
    every triangle credits its three vertices; fixed-point
    ``2e6·T // (deg·(deg−1))`` floor division keeps the coefficient
    integer-exact against the 3-way self-join oracle."""
    from guac_ray.functions.triangles import clustering_coefficient

    g = _corpus_edges(sf_dir)
    return clustering_coefficient(
        g["edges"], "subj_key", "obj_key",
        exchange_base=_exchange("clustcoef"), num_buckets=8)


def KG_CLUSTERING_SQL(sf_dir: str) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT least(subj_key, obj_key) AS u,
         greatest(subj_key, obj_key) AS v
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
  GROUP BY 1
), tri AS (
  SELECT node, CAST(count(*) AS BIGINT) AS t
  FROM (
    SELECT unnest([e1.u, e1.v, e2.v]) AS node
    FROM e e1
    JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
    JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
  ) GROUP BY 1
)
SELECT d.n AS node, d.deg,
       CAST(coalesce(t.t, 0) AS BIGINT) AS n_triangles,
       CAST(2000000 * coalesce(t.t, 0) // (d.deg * (d.deg - 1))
            AS BIGINT) AS coeff_fp
FROM deg d LEFT JOIN tri t ON t.node = d.n
WHERE d.deg >= 2
"""


def kg_neighbor_deg(sf_dir: str):
    """Per-node neighbor-degree statistics over the assembled KG
    (functions/triangles.py:neighbor_degree_stats) — the local
    assortativity signal: is a node attached to hubs or leaves? All
    linear exchanges (no wedge expansion); the fixed-point mean keeps
    it integer-exact."""
    from guac_ray.functions.triangles import neighbor_degree_stats

    g = _corpus_edges(sf_dir)
    return neighbor_degree_stats(
        g["edges"], "subj_key", "obj_key",
        exchange_base=_exchange("nbrdeg"), num_buckets=8)


def KG_NEIGHBOR_DEG_SQL(sf_dir: str) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT least(subj_key, obj_key) AS u,
         greatest(subj_key, obj_key) AS v
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
  GROUP BY 1
), nbr AS (
  SELECT e.u AS node, d.deg AS nd FROM e JOIN deg d ON d.n = e.v
  UNION ALL
  SELECT e.v AS node, d.deg AS nd FROM e JOIN deg d ON d.n = e.u
)
SELECT node, CAST(count(*) AS BIGINT) AS deg,
       CAST(sum(nd) AS BIGINT) AS sum_nbr_deg,
       CAST(max(nd) AS BIGINT) AS max_nbr_deg,
       CAST(1000000 * sum(nd) // count(*) AS BIGINT) AS mean_nbr_deg_fp
FROM nbr GROUP BY 1
"""


def kg_assortativity(sf_dir: str):
    """Degree assortativity of the KG (functions/triangles.py
    ``degree_assortativity``) — Newman's hubs-link-hubs statistic:
    Pearson correlation of endpoint degrees over directed stubs (both
    orientations of every canonical edge). Shares _canon_deg with the
    triangle family and grouped_corr's int64 moment sums + fixed
    double expression with events_corr, so the oracle replays it
    exactly."""
    from guac_ray.functions.triangles import degree_assortativity

    g = _corpus_edges(sf_dir)
    return degree_assortativity(
        g["edges"], "subj_key", "obj_key",
        exchange_base=_exchange("assort"), num_buckets=8)


def KG_ASSORTATIVITY_SQL(sf_dir: str) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT least(subj_key, obj_key) AS u,
         greatest(subj_key, obj_key) AS v
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
  GROUP BY 1
), stubs AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
  UNION ALL
  SELECT dv.deg AS x, du.deg AS y
  FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
), m AS (
  SELECT 'all' AS graph, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         sum(x*x) AS sxx, sum(y*y) AS syy,
         min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
  FROM stubs)
SELECT graph, CAST(n AS BIGINT) AS n,
  CASE WHEN mnx = mxx OR mny = mxy THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE)
     - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
    / CAST(n AS DOUBLE) END AS cov,
  CASE WHEN mnx = mxx OR mny = mxy THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE)
     - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
    / (sqrt(CAST(sxx AS DOUBLE)
            - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
       * sqrt(CAST(syy AS DOUBLE)
              - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                / CAST(n AS DOUBLE))) END AS corr
FROM m
"""


def kg_degree_hist(sf_dir: str):
    """Degree distribution of the KG's undirected simple graph
    (functions/triangles.py ``degree_histogram``): one row per
    distinct degree value with its node count — the power-law-tail /
    hub-count diagnostic. Three strictly-shrinking exchanges
    (edges → nodes → distinct degrees); all int64."""
    from guac_ray.functions.triangles import degree_histogram

    g = _corpus_edges(sf_dir)
    return degree_histogram(
        g["edges"], "subj_key", "obj_key",
        exchange_base=_exchange("deghist"), num_buckets=8)


def KG_DEGREE_HIST_SQL(sf_dir: str) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT least(subj_key, obj_key) AS u,
         greatest(subj_key, obj_key) AS v
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
  GROUP BY 1
)
SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1
"""


def kg_reciprocity(sf_dir: str):
    """Directed-edge reciprocity of the KG (functions/triangles.py
    ``reciprocity``): the fraction of distinct directed edges whose
    reverse also exists — the one graph statistic here that keeps
    direction (~40% on this corpus: version_of/pkg_equal families are
    symmetric, mentions/has_metadata are not). Pure int64 floor
    division; ONE canonical-pair exchange."""
    from guac_ray.functions.triangles import reciprocity

    g = _corpus_edges(sf_dir)
    return reciprocity(
        g["edges"], "subj_key", "obj_key",
        exchange_base=_exchange("recip"), num_buckets=8)


def KG_RECIPROCITY_SQL(sf_dir: str) -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT subj_key AS a, obj_key AS b
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_directed,
         CAST((SELECT count(*) FROM d
               JOIN d d2 ON d2.a = d.b AND d2.b = d.a)
              AS BIGINT) AS n_mutual
  FROM d)
SELECT 'all' AS graph, n_directed, n_mutual,
       CAST(1000000 * n_mutual // n_directed AS BIGINT) AS reciprocity_fp
FROM m
"""


def events_user_gaps(sf_dir: str):
    """Per-user inter-arrival-gap distribution (functions/streams.py
    ``gap_quantiles``) — the engagement-cadence operator, and the
    engine's HIGH-cardinality grouped EXACT quantile: groups ≈ users,
    so the low-cardinality histogram-exchange shape (events_mad,
    events_value_quantiles) is wrong here; instead ONE user-hash fs
    exchange of 3 int64 columns co-locates each user's stream and a
    single lexsort + diff + np.unique offset pass computes every
    user's exact disc-rank p50/p90/max gap with no per-user Python
    loop. Order is (ts, event_id) — the deterministic tie-break —
    and all outputs are int64 µs, exact on any engine."""
    from guac_ray.functions.streams import gap_quantiles

    return gap_quantiles(_read(sf_dir, "events",
                               ["event_id", "ts", "user_id"]),
                         exchange_base=_exchange("gapq"))


EVENTS_USER_GAPS_SQL = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS tu,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS ptu
  FROM events
), g AS (
  SELECT user_id, tu - ptu AS gap_us FROM o WHERE ptu IS NOT NULL
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS p50_gap_us,
       CAST(quantile_disc(gap_us, 0.9) AS BIGINT) AS p90_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id
"""


def events_twap(sf_dir: str):
    """Per-user TIME-weighted average value (functions/streams.py
    ``time_weighted_mean``) — each value held until the user's next
    event, the resample every pricing/telemetry store runs and a
    weighted mean NO plain GROUP BY can express (the weight is a
    window function of the neighbor row). Values enter as exact cents;
    ``twap_cents = vw_sum // dur_us`` is pure int64 floor division —
    with the remainder recoverable from the emitted (vw_sum, dur_us)
    pair, so nothing is lost to rounding. Same one-exchange per-user
    stream shape as events_user_gaps."""
    from guac_ray.functions.streams import time_weighted_mean

    return time_weighted_mean(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        exchange_base=_exchange("twap"))


EVENTS_TWAP_SQL = """
WITH o AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS vc,
         epoch_us(ts) AS tu,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS ntu
  FROM events
), g AS (
  SELECT user_id, vc, ntu - tu AS dt FROM o WHERE ntu IS NOT NULL
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(dt) AS BIGINT) AS dur_us,
       CAST(sum(vc * dt) AS BIGINT) AS vw_sum,
       CAST(sum(vc * dt) // sum(dt) AS BIGINT) AS twap_cents
FROM g GROUP BY user_id
"""


def doc_bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING (functions/bpe.py ``bpe_train_merges``):
    learn the first 40 merge rules over the documents corpus — the
    vocabulary-learning step every LLM data stack runs before token
    counting/packing/perplexity exist, and the engine's only iterative
    vocabulary-building operator. Corpus-scale work is exactly ONE
    distributed word-count pass (the tf-idf exchange); the merge loop
    iterates over the top-50k distinct-word table (the documented
    size-guarded driver product — how production trainers cap it) in
    vectorized numpy. No SQL form (40 chained recounts); correctness
    is pinned by the committed sf0.001 golden + bit-parity tests
    against the pure-Python Sennrich reference."""
    from guac_ray.functions.bpe import bpe_train_merges

    return bpe_train_merges(
        _read(sf_dir, "documents", ["text"]), n_merges=40)


def events_running_distinct(sf_dir: str):
    """Running distinct-event-type count per user (functions/streams.py
    ``running_distinct``) — after each event, how many distinct types
    the user has produced so far: the activation-funnel curve, and a
    windowed COUNT(DISTINCT) plain frames cannot express (distinct is
    not frame-decomposable — the rolling_active_users argument, here in
    its RUNNING form). Distributes because first-occurrence FLAGS are
    decomposable: one extra lexsort flags each (user, type)'s earliest
    event, the running count is a per-user cumsum in (ts, event_id)
    order. Event-scale output, all int64, exact on any engine."""
    from guac_ray.functions.streams import running_distinct

    return running_distinct(
        _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                 "event_type"]),
        exchange_base=_exchange("rundist"))


EVENTS_RUNNING_DISTINCT_SQL = """
WITH r AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_id,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct
FROM r
"""


def events_user_mad(sf_dir: str):
    """Per-user exact median + MAD of event value (functions/
    quantiles.py ``grouped_robust_stats``) — HIGH-cardinality grouped
    robust statistics, the per-user complement of events_mad (whose
    histogram-exchange shape is built for FEW groups): the per-user
    outlier-threshold table anomaly pipelines join events back against.
    One user-hash fs exchange of 2 int64 columns; per bucket two
    vectorized sort+offset passes (median, then deviation median) with
    DuckDB quantile_disc rank semantics — no per-user Python loop.
    All int64 cents, exact on any engine."""
    from guac_ray.functions.quantiles import grouped_robust_stats

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                             "vc": cents(df["value"])})

    return grouped_robust_stats(
        ds.map_batches(to_cents, batch_format="pandas"),
        key_col="user_id", val_col="vc",
        exchange_base=_exchange("umad"))


EVENTS_USER_MAD_SQL = """
WITH t AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events
), m AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(quantile_disc(vc, 0.5) AS BIGINT) AS median_cents
  FROM t GROUP BY user_id
)
SELECT m.user_id, m.n, m.median_cents,
       CAST(quantile_disc(abs(t.vc - m.median_cents), 0.5) AS BIGINT)
           AS mad_cents
FROM t JOIN m USING (user_id)
GROUP BY m.user_id, m.n, m.median_cents
"""


def events_scd2(sf_dir: str):
    """SCD-Type-2 validity intervals (functions/streams.py
    ``scd2_intervals``): compress each (user, event_type) value stream
    into change-run rows with half-open [valid_from, valid_to)
    microsecond bounds, NULL valid_to while current, and the run's
    observation count — the gaps-and-islands dimension build every
    warehouse runs on a change log, and the history-preserving
    complement of events_latest_per_user's latest-only compaction (a
    reverted value opens a NEW interval here). Values enter as exact
    cents so run equality is a cross-engine contract; one user-hash
    exchange, per-bucket lexsort + shifted-compare run detection, no
    per-key Python."""
    from guac_ray.functions.streams import scd2_intervals

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"], "ts": df["ts"],
            "user_id": df["user_id"], "event_type": df["event_type"],
            "value_cents": cents(df["value"])})

    return scd2_intervals(ds.map_batches(to_cents, batch_format="pandas"),
                          exchange_base=_exchange("scd2"))


EVENTS_SCD2_SQL = """
WITH t AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tu,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events
), s AS (
  SELECT *, CASE WHEN lag(vc) OVER w IS NULL
                   OR lag(vc) OVER w <> vc THEN 1 ELSE 0 END AS chg
  FROM t
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id)
), r AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id, event_type
                           ORDER BY tu, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s
), runs AS (
  SELECT user_id, event_type, run_id,
         CAST(min(vc) AS BIGINT) AS value_cents,
         CAST(min(tu) AS BIGINT) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM r GROUP BY user_id, event_type, run_id
)
SELECT user_id, event_type, value_cents, valid_from_us,
       lead(valid_from_us) OVER (PARTITION BY user_id, event_type
                                 ORDER BY valid_from_us) AS valid_to_us,
       n_obs
FROM runs
"""


def events_cdc_merge(sf_dir: str):
    """MERGE INTO / CDC upsert+delete (functions/streams.py
    ``cdc_merge``): the lakehouse compact-then-merge cycle over the
    event log — the stream's first half compacts into a keyed base
    snapshot (``keep_latest``, the upsert primitive the registry
    already carries), the second half replays as a changelog where
    ``event_type = 'error'`` rows are DELETE markers and everything
    else upserts the user's value, and the merge applies
    last-writer-wins per user with delete semantics (a delete followed
    by a later upsert re-inserts). One row per surviving user:
    ``(user_id, value_cents, updated_us, n_changes)``.

    The epoch cutoff is the exact integer µs midpoint
    ``(min_ts + max_ts) // 2`` — computed distributed on the Ray side
    (per-batch min/max partials, block-count-sized fold) and by the
    same integer expression in the oracle, so no float or calendar
    arithmetic enters the contract. Scale shape: the snapshot build is
    keep_latest's partial-combine exchange; the merge itself unions
    two 5-int64-column projections through ONE user-hash fs exchange
    (streams.py ``cdc_merge``)."""
    import pyarrow.compute as pc

    from guac_ray.functions.streams import cdc_merge
    from guac_ray.functions.window import keep_latest

    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def _ts_bounds() -> tuple[int, int]:
        def part(t: pa.Table) -> pa.Table:
            arr = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            return pa.table({"mn": pa.array([pc.min(arr).as_py()],
                                            pa.int64()),
                             "mx": pa.array([pc.max(arr).as_py()],
                                            pa.int64())})
        parts = (_read(sf_dir, "events", ["ts"])
                 .map_batches(part, batch_format="pyarrow").to_pandas())
        parts = parts.dropna()
        if parts.empty:
            raise ValueError("events_cdc_merge: empty events table")
        return int(parts["mn"].min()), int(parts["mx"].max())

    mn, mx = _ts_bounds()
    cut = (mn + mx) // 2

    def narrow(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "_tu": df["ts"].to_numpy().astype("datetime64[us]")
                           .astype("int64"),
            "ts": df["ts"],
            "user_id": df["user_id"].astype("int64"),
            "op": (df["event_type"].to_numpy() == "error")
                  .astype("int64"),
            "value_cents": cents(df["value"]),
        })

    ev = _read(sf_dir, "events", cols).map_batches(
        narrow, batch_format="pandas")

    def side(lt: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (pc.less(t["_tu"], cut) if lt
                 else pc.greater_equal(t["_tu"], cut))
            return t.filter(m)
        return f

    before = ev.map_batches(side(True), batch_format="pyarrow")
    after = ev.map_batches(side(False), batch_format="pyarrow")

    snap = keep_latest(before, by="user_id", order=["_tu", "event_id"],
                       exchange_base=_exchange("cdc_snap"), num_buckets=8)

    def snap_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "value_cents": df["value_cents"],
            "updated_us": df["_tu"],
        })

    base = snap.map_batches(snap_cols, batch_format="pandas")
    return cdc_merge(base, after,
                     exchange_base=_exchange("cdc_merge"))


EVENTS_CDC_MERGE_SQL = """
WITH c AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS cut FROM events
), t AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS op,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events
), base AS (
  SELECT user_id, tu, vc FROM t, c WHERE tu < cut
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY tu DESC, event_id DESC) = 1
), unioned AS (
  SELECT user_id, tu, -1 AS ord, 0 AS op, vc, 0 AS src FROM base
  UNION ALL
  SELECT user_id, tu, event_id AS ord, op, vc, 1 AS src
  FROM t, c WHERE tu >= cut
), w AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY tu DESC, ord DESC) AS rn,
         sum(src) OVER (PARTITION BY user_id) AS nc
  FROM unioned
)
SELECT user_id, vc AS value_cents, tu AS updated_us,
       CAST(nc AS BIGINT) AS n_changes
FROM w WHERE rn = 1 AND op = 0
"""


def events_anomalies(sf_dir: str):
    """Robust per-user outlier detection — the pipeline the per-user
    MAD table exists FOR: events_user_mad's grouped_robust_stats output
    joins back against the event stream through the partitioned hash
    join, and each event is flagged by the Iglewicz–Hoaglin modified
    z-score rule (0.6745·|v − median| / MAD > 3.5) in EXACT integer
    cross-multiplication (6745·dev > 35000·mad — no float division
    anywhere), emitting only the outlier rows (~4.5% on this corpus's
    lognormal values). Stats side is user-cardinality (grows with the
    corpus), so the join is the co-partitioned fs-exchange hash join,
    not a broadcast."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join
    from guac_ray.functions.quantiles import grouped_robust_stats

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                             "vc": cents(df["value"])})

    stats = grouped_robust_stats(
        ds.map_batches(to_cents, batch_format="pandas"),
        key_col="user_id", val_col="vc",
        exchange_base=_exchange("anom_mad"))

    def ev_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_id": df["event_id"].astype("int64"),
                             "user_id": df["user_id"].astype("int64"),
                             "value_cents": cents(df["value"])})

    joined = hash_join(ds.map_batches(ev_cents, batch_format="pandas"),
                       stats.drop_columns(["n"]),
                       on="user_id", exchange_dir=_exchange("anom_join"),
                       num_buckets=16)

    def flag(t: pa.Table) -> pa.Table:
        vc = t["value_cents"].to_numpy(zero_copy_only=False)
        med = t["median_cents"].to_numpy(zero_copy_only=False)
        mad = t["mad_cents"].to_numpy(zero_copy_only=False)
        dev = np.abs(vc - med)
        keep = dev * 6745 > 35000 * mad
        return pa.table({
            "event_id": pa.array(t["event_id"].to_numpy(
                zero_copy_only=False)[keep]),
            "user_id": pa.array(t["user_id"].to_numpy(
                zero_copy_only=False)[keep]),
            "value_cents": pa.array(vc[keep]),
            "median_cents": pa.array(med[keep]),
            "mad_cents": pa.array(mad[keep]),
            "dev_cents": pa.array(dev[keep]),
        })

    return joined.map_batches(flag, batch_format="pyarrow")


EVENTS_ANOMALIES_SQL = """
WITH t AS (
  SELECT event_id, user_id,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events
), m AS (
  SELECT user_id, CAST(quantile_disc(vc, 0.5) AS BIGINT) AS median_cents
  FROM t GROUP BY user_id
), d AS (
  SELECT t.event_id, t.user_id, t.vc, m.median_cents,
         CAST(abs(t.vc - m.median_cents) AS BIGINT) AS dev_cents
  FROM t JOIN m USING (user_id)
), md AS (
  SELECT user_id,
         CAST(quantile_disc(dev_cents, 0.5) AS BIGINT) AS mad_cents
  FROM d GROUP BY user_id
)
SELECT d.event_id, d.user_id, d.vc AS value_cents, d.median_cents,
       md.mad_cents, d.dev_cents
FROM d JOIN md USING (user_id)
WHERE d.dev_cents * 6745 > 35000 * md.mad_cents
"""


def orders_profile(sf_dir: str):
    """Column profiling (functions/profile.py ``table_profile``) over
    the orders table — the Deequ/whylogs-style analyzer pass: per
    column, row/null counts, EXACT distinct cardinality (one
    (col, value)-hash fs exchange; in-bucket distinct IS global) and
    typed min/max, one long-format row per column. Money profiles as
    exact cents, timestamps as epoch µs (the injective per-kind maps
    mirrored in the oracle); the driver folds only parallelism-bounded
    partials."""
    from guac_ray.functions.profile import table_profile

    spec = {"o_orderkey": "int", "o_custkey": "int",
            "o_orderstatus": "str", "o_totalprice": "cents",
            "o_orderdate": "ts_us", "o_orderpriority": "str"}
    return table_profile(_read(sf_dir, "orders", sorted(spec)), spec,
                         exchange_base=_exchange("profile"))


def _profile_sql_col(col: str, kind: str) -> str:
    if kind == "str":
        expr, mn = col, "CAST(NULL AS BIGINT)"
        return f"""
SELECT '{col}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({col}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       {mn} AS min_num, {mn} AS max_num,
       CAST(min({col}) AS VARCHAR) AS min_str,
       CAST(max({col}) AS VARCHAR) AS max_str
FROM orders"""
    if kind == "int":
        expr = col
    elif kind == "cents":
        expr = f"CAST(floor({col}*100 + 0.5) AS BIGINT)"
    else:  # ts_us
        expr = f"epoch_us({col})"
    return f"""
SELECT '{col}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({col}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       CAST(min({expr}) AS BIGINT) AS min_num,
       CAST(max({expr}) AS BIGINT) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders"""


ORDERS_PROFILE_SQL = " UNION ALL ".join(
    _profile_sql_col(c, k) for c, k in [
        ("o_custkey", "int"), ("o_orderdate", "ts_us"),
        ("o_orderkey", "int"), ("o_orderpriority", "str"),
        ("o_orderstatus", "str"), ("o_totalprice", "cents")])


def events_expectations(sf_dir: str):
    """Data-quality expectations (functions/expectations.py
    ``check_table``) over the event stream — the Great-Expectations /
    dbt-test constraint suite run before promoting a table: unique key
    (key-hash exchange; in-bucket dup count IS global), not-null and
    accepted-values and cents-range (one shared row-local pass),
    referential integrity against customer (partitioned ANTI join —
    the parent is not assumed broadcast-small). A healthy mix by
    design: the type allow-list excludes 'error' rows and the range
    caps value at 300.00, both real violation counts; the other three
    pass at zero — the report shape a production DQ gate emits."""
    from guac_ray.functions.expectations import check_table

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "value", "props"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return check_table(ev, [
        {"kind": "unique", "col": "event_id"},
        {"kind": "not_null", "col": "props"},
        {"kind": "accepted_values", "col": "event_type",
         "values": ["click", "view", "purchase", "signup"]},
        {"kind": "range_cents", "col": "value", "lo": 1, "hi": 30000},
        {"kind": "fk", "col": "user_id", "parent": cust,
         "parent_col": "c_custkey"},
    ], exchange_base=_exchange("expect"))


EVENTS_EXPECTATIONS_SQL = """
WITH raw AS (
  SELECT 'unique:event_id' AS check_name,
         (SELECT count(*) FROM events) AS n_checked,
         (SELECT count(*) - count(DISTINCT event_id) FROM events)
             AS n_violations
  UNION ALL
  SELECT 'not_null:props', (SELECT count(*) FROM events),
         (SELECT count(*) - count(props) FROM events)
  UNION ALL
  SELECT 'accepted_values:event_type', (SELECT count(*) FROM events),
         (SELECT count(*) FROM events
          WHERE event_type IS NOT NULL AND event_type NOT IN
                ('click', 'view', 'purchase', 'signup'))
  UNION ALL
  SELECT 'range_cents:value', (SELECT count(*) FROM events),
         (SELECT count(*) FROM events
          WHERE CAST(floor(value*100 + 0.5) AS BIGINT) NOT BETWEEN
                1 AND 30000)
  UNION ALL
  SELECT 'fk:user_id', (SELECT count(*) FROM events),
         (SELECT count(*) FROM events
          WHERE user_id NOT IN (SELECT c_custkey FROM customer))
)
SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_violations = 0 AS BIGINT) AS passed
FROM raw
"""


def q18_large_orders(sf_dir: str):
    """TPC-H Q18 shape (large-volume customers): HAVING-gated
    aggregate → partitioned hash join → broadcast dimension → top-k.
    The per-order quantity aggregate (two-phase, cents-exact) gates at
    > 200 units BEFORE any join, so the join probe side is the ~6% of
    orders that survive — the aggregate-then-join plan every optimizer
    picks for Q18; customer is the broadcast dimension (searchsorted
    lookup); top-100 by (o_totalprice DESC, o_orderkey) is a
    distributed sort+limit over the joined survivors."""
    from guac_ray.functions.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"orderkey": df["l_orderkey"],
                             "qc": cents(df["l_quantity"])})

    per_order = grouped_agg(
        li.map_batches(qty_cents, batch_format="pandas"),
        ["orderkey"], {"qty_cents": ("qc", "sum")}, num_buckets=8)

    def keep_big(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kept = t.filter(pc.greater(
            pc.cast(t["qty_cents"], pa.int64()), 20000))
        return pa.table({"orderkey": kept["orderkey"],
                         "qty_cents": kept["qty_cents"].cast(pa.int64())})

    big = per_order.map_batches(keep_big, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(
            ["orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        batch_format="pyarrow")
    joined = hash_join(orders, big, on="orderkey",
                       exchange_dir=_exchange("q18"), num_buckets=8)

    cref = _bcast_df(sf_dir, "customer", ["c_custkey", "c_name"])

    class CustName:
        def __init__(self):
            c = ray.get(cref).sort_values("c_custkey")
            self.keys = c.c_custkey.to_numpy()
            self.names = c.c_name.to_numpy()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            idx = _dim_idx(self.keys, df.o_custkey.to_numpy(), "customer dim")
            return pd.DataFrame({
                "c_custkey": df.o_custkey.astype("int64"),
                "c_name": self.names[idx],
                "o_orderkey": df.orderkey.astype("int64"),
                "o_orderdate": df.o_orderdate,
                "o_totalprice": df.o_totalprice,
                "qty_cents": df.qty_cents.astype("int64"),
            })

    return (joined.map_batches(CustName, batch_format="pandas",
                               concurrency=(1, 4))
            .sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(100))


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))
              AS BIGINT) AS qty_cents
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) > 20000
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.qty_cents
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
"""


def q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape (returned-item revenue per customer): the DEEP
    join pipeline — returned lineitems (l_returnflag = 'R', ~33%) join
    the 1996-H1 order window (~7% of orders) through the
    co-partitioned fs-exchange hash join with the per-CUSTOMER revenue
    partial fused into the join's reduce tasks (the payload never
    re-enters the object store at lineitem grain); the custkey
    aggregate finalizes two-phase; customer (name, acctbal,
    nationkey) and nation (25 rows) are broadcast dimensions resolved
    by one searchsorted pass; top-20 by (revenue DESC, custkey) is a
    distributed sort+limit. Revenue is the house cents expression
    ``floor(extprice·(1−disc)·100 + 0.5)`` — identical in both
    engines (the q3 contract)."""
    from guac_ray.functions.joins import hash_join

    cut_lo = pd.Timestamp("1996-01-01")
    cut_hi = pd.Timestamp("1996-07-01")

    import pyarrow.compute as pc

    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "orderkey": df.l_orderkey,
            "_rc": cents(df.l_extendedprice.to_numpy()
                         * (1 - df.l_discount.to_numpy())),
        }), preserve_index=False)

    # both filters push into the SCAN (row-group pruning) — at 100 TB
    # the 67% non-returned lineitems and 93% out-of-window orders
    # never leave storage
    # the filter column must stay in the scan schema (pyarrow binds
    # the predicate against it); the map projects it away
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_returnflag"],
               filter=(pc.field("l_returnflag") == "R")
               ).map_batches(li_f, batch_format="pandas")

    def ord_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "orderkey": df.o_orderkey, "custkey": df.o_custkey,
        }), preserve_index=False)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pc.field("o_orderdate") >= cut_lo)
                           & (pc.field("o_orderdate") < cut_hi))
                   ).map_batches(ord_f, batch_format="pandas")

    joined = hash_join(li, orders, on="orderkey",
                       exchange_dir=_exchange("q10"), num_buckets=8,
                       partial_fn=_rc_sum_partial("custkey"))
    per_cust = grouped_agg(joined, ["custkey"],
                           {"revenue_cents": ("_rc", "sum")},
                           num_buckets=8)

    cref = _bcast_df(sf_dir, "customer",
                     ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    nref = _bcast_df(sf_dir, "nation", ["n_nationkey", "n_name"])

    class Dims:
        def __init__(self):
            c = ray.get(cref).sort_values("c_custkey")
            self.ck = c.c_custkey.to_numpy()
            self.cn = c.c_name.to_numpy()
            self.cb = c.c_acctbal.to_numpy()
            n = ray.get(nref).sort_values("n_nationkey")
            self.cnat = n.n_name.to_numpy()[
                _dim_idx(n.n_nationkey.to_numpy(),
                         c.c_nationkey.to_numpy(), "nation dim")]

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            i = _dim_idx(self.ck, df.custkey.to_numpy(), "customer dim")
            return pd.DataFrame({
                "c_custkey": df.custkey.astype("int64"),
                "c_name": self.cn[i],
                "c_acctbal": self.cb[i],
                "n_name": self.cnat[i],
                "revenue_cents": df.revenue_cents.astype("int64"),
            })

    return (per_cust.map_batches(Dims, batch_format="pandas",
                                 concurrency=(1, 4))
            .sort(["revenue_cents", "c_custkey"],
                  descending=[True, False]).limit(20))


Q10_SQL = """
WITH rl AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
              AS BIGINT) AS rc
  FROM lineitem WHERE l_returnflag = 'R'
), ro AS (
  SELECT o_custkey, rc
  FROM rl JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1996-07-01'
), pc AS (
  SELECT o_custkey AS c_custkey, CAST(sum(rc) AS BIGINT) AS revenue_cents
  FROM ro GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name, p.revenue_cents
FROM pc p
JOIN customer c ON c.c_custkey = p.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY p.revenue_cents DESC, c.c_custkey LIMIT 20
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape (forecast-revenue scan): the pure
    predicate-pushdown aggregate — shipdate year window AND discount
    band AND quantity cap all push into the parquet SCAN
    (``_read(filter=…)``: row groups whose statistics exclude any
    predicate never leave storage — at 100 TB this is the query zone
    maps and row-group stats exist for), then one cents partial per
    batch and a block-count-sized driver fold. Revenue here is
    ``extprice·discount`` (the discount give-back Q6 measures), cents
    via the house expression; output one row
    ``(revenue_cents, n_rows)``."""
    import pyarrow.compute as pc

    cut_lo = pd.Timestamp("1996-01-01")
    cut_hi = pd.Timestamp("1997-01-01")
    flt = ((pc.field("l_shipdate") >= cut_lo)
           & (pc.field("l_shipdate") < cut_hi)
           & (pc.field("l_discount") >= 0.05)
           & (pc.field("l_discount") <= 0.07)
           & (pc.field("l_quantity") < 24.0))

    def part(t: pa.Table) -> pa.Table:
        rc = cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                   * t["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({"rc": pa.array([int(rc.sum())], pa.int64()),
                         "n": pa.array([len(rc)], pa.int64())})

    parts = (_read(sf_dir, "lineitem",
                   ["l_extendedprice", "l_discount", "l_shipdate",
                    "l_quantity"], filter=flt)
             .map_batches(part, batch_format="pyarrow").to_pandas())
    return pa.table({
        "revenue_cents": pa.array([int(parts["rc"].sum())], pa.int64()),
        "n_rows": pa.array([int(parts["n"].sum())], pa.int64())})


Q6_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice*l_discount*100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0
"""


def q14_promo_share(sf_dir: str):
    """TPC-H Q14 shape (promo revenue share): conditional aggregate
    over a fact ⋈ dimension join — one shipdate-month window pushes
    into the lineitem SCAN, part's p_type broadcasts once
    (searchsorted lookup, the q18 dimension discipline), and the two
    conditional revenue sums flow as exact int64 cents partials
    (2 ints per batch) to a driver fold. The share is ONE fixed-order
    double — (100·promo as double) / (total as double) — identical in
    both engines. Output one row
    ``(promo_cents, total_cents, promo_pct)``."""
    import pyarrow.compute as pc

    cut_lo = pd.Timestamp("1996-01-01")
    cut_hi = pd.Timestamp("1996-02-01")
    flt = ((pc.field("l_shipdate") >= cut_lo)
           & (pc.field("l_shipdate") < cut_hi))

    pref = _bcast_df(sf_dir, "part", ["p_partkey", "p_type"])

    class Promo:
        def __init__(self):
            p = ray.get(pref).sort_values("p_partkey")
            self.keys = p.p_partkey.to_numpy()
            self.is_promo = (p.p_type.to_numpy() == "PROMO")

        def __call__(self, t: pa.Table) -> pa.Table:
            rc = cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                       * (1 - t["l_discount"]
                          .to_numpy(zero_copy_only=False)))
            i = _dim_idx(
                self.keys, t["l_partkey"].to_numpy(zero_copy_only=False),
                "part dim")
            promo = self.is_promo[i]
            return pa.table({
                "pc": pa.array([int(rc[promo].sum())], pa.int64()),
                "tc": pa.array([int(rc.sum())], pa.int64())})

    parts = (_read(sf_dir, "lineitem",
                   ["l_partkey", "l_extendedprice", "l_discount",
                    "l_shipdate"], filter=flt)
             .map_batches(Promo, batch_format="pyarrow",
                          concurrency=(1, 4))
             .to_pandas())
    promo_c, total_c = int(parts["pc"].sum()), int(parts["tc"].sum())
    pct = float(np.float64(100 * promo_c) / np.float64(total_c)) \
        if total_c else 0.0
    return pa.table({
        "promo_cents": pa.array([promo_c], pa.int64()),
        "total_cents": pa.array([total_c], pa.int64()),
        "promo_pct": pa.array([pct], pa.float64())})


Q14_SQL = """
WITH t AS (
  SELECT CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
              AS BIGINT) AS rc,
         p_type = 'PROMO' AS is_promo
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-02-01'
)
SELECT CAST(coalesce(sum(rc) FILTER (is_promo), 0) AS BIGINT)
         AS promo_cents,
       CAST(sum(rc) AS BIGINT) AS total_cents,
       CAST(100 * coalesce(sum(rc) FILTER (is_promo), 0) AS DOUBLE)
         / CAST(sum(rc) AS DOUBLE) AS promo_pct
FROM t
"""


def q13_order_distribution(sf_dir: str):
    """TPC-H Q13 shape (customer order-count distribution): the
    LEFT-join double aggregation — count non-urgent orders per
    customer WITH the zero-order customers kept (the whole point of
    Q13's left join: a distribution that silently drops the empty
    class is wrong), then the distribution of those counts. Plan:
    filtered per-custkey order counts via the two-phase grouped
    aggregate (the shuffle moves partials, not orders); customer LEFT
    joins the count table through the co-partitioned fs-exchange hash
    join (both sides are customer-cardinality and grow with the
    corpus — never assumed broadcast-small); nulls fill to 0 and the
    second aggregate runs over the count-domain-sized frame. Output:
    ``(c_count, custdist)``, both int64."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def non_urgent(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.not_equal(t["o_orderpriority"], "1-URGENT"))
        return pa.table({"c_custkey": kept["o_custkey"]})

    per_cust = grouped_agg(
        orders.map_batches(non_urgent, batch_format="pyarrow"),
        ["c_custkey"], {"c_count": ("c_custkey", "count")},
        num_buckets=8)

    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = hash_join(cust, per_cust, on="c_custkey",
                       exchange_dir=_exchange("q13"), how="left",
                       num_buckets=8)

    def fill_zero(t: pa.Table) -> pa.Table:
        c = pc.fill_null(pc.cast(t["c_count"], pa.int64()), 0)
        return pa.table({"c_count": c})

    return grouped_agg(
        joined.map_batches(fill_zero, batch_format="pyarrow"),
        ["c_count"], {"custdist": ("c_count", "count")}, num_buckets=4)


Q13_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""


def orders_reconcile(sf_dir: str):
    """Keyed table reconciliation (functions/setops.py ``reconcile``):
    the migration-validation diff — orders vs a deterministically
    "restated" copy where md5(o_orderkey)'s first byte drops ~1.2% of
    rows (→ only_left), bumps ~1.2% of totals by one dollar
    (→ differs) and appends ~0.8% synthetic keys (→ only_right);
    everything else must come back ``equal``. All four statuses carry
    real counts at every SF, and the md5 rules are the engine-portable
    split discipline (doc_train_test_split), so the oracle restates
    the right side with identical arithmetic. Both sides ride ONE
    shared key-hash exchange (the CDC-merge multi-input shape);
    uniqueness-per-side is validated in-bucket."""
    from guac_ray.functions.setops import reconcile
    from guac_ray.pipelines.curation import md5_first_byte

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "tp_cents": cents(df["o_totalprice"]),
            "o_orderstatus": df["o_orderstatus"],
        })

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    left = _read(sf_dir, "orders", cols).map_batches(
        base, batch_format="pandas")

    def restate(df: pd.DataFrame) -> pd.DataFrame:
        out = base(df)
        b = md5_first_byte(out["o_orderkey"].to_numpy())
        out = out[b >= 0x03].copy()
        bk = b[b >= 0x03]
        out["tp_cents"] = (out["tp_cents"].to_numpy()
                           + np.where(bk < 0x06, 100, 0))
        extra = out[(bk >= 0x06) & (bk < 0x08)].copy()
        extra["o_orderkey"] = extra["o_orderkey"] + 100_000_000
        return pd.concat([out, extra], ignore_index=True)

    right = _read(sf_dir, "orders", cols).map_batches(
        restate, batch_format="pandas")
    t = reconcile(left, right, "o_orderkey",
                  ["tp_cents", "o_orderstatus"],
                  exchange_base=_exchange("reconcile"), num_buckets=8)
    return rd.from_arrow(t)


ORDERS_RECONCILE_SQL = """
WITH l AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS tp_cents,
         o_orderstatus
  FROM orders
), hb AS (
  SELECT l.*, substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS h
  FROM l
), kept AS (
  SELECT o_orderkey,
         tp_cents + CASE WHEN h < '06' THEN 100 ELSE 0 END AS tp_cents,
         o_orderstatus, h
  FROM hb WHERE h >= '03'
), r AS (
  SELECT o_orderkey, tp_cents, o_orderstatus FROM kept
  UNION ALL
  SELECT o_orderkey + 100000000, tp_cents, o_orderstatus
  FROM kept WHERE h >= '06' AND h < '08'
), j AS (
  SELECT CASE
           WHEN r.o_orderkey IS NULL THEN 'only_left'
           WHEN l.o_orderkey IS NULL THEN 'only_right'
           WHEN l.tp_cents = r.tp_cents
                AND l.o_orderstatus = r.o_orderstatus THEN 'equal'
           ELSE 'differs' END AS status
  FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
)
SELECT status, CAST(count(*) AS BIGINT) AS n_keys
FROM j GROUP BY status
"""


def events_hourly_spine(sf_dir: str):
    """Gap-filled hourly time series (the date-spine idiom): one row
    per (event_type, hour) over the table's FULL [min, max] hour
    range, zeros where no event landed — what every dashboard and
    forecasting pipeline needs before windows or trend fits (a series
    with silent holes lies about rates; 215 zero cells at sf0.01,
    2732 at sf0.001). Shape: hourly counts via the two-phase
    aggregate; hour bounds via per-batch min/max partials (two
    scalars); the spine GENERATES distributed (``rd.range`` over the
    hour span × the label-cardinality type list — never a driver
    loop) and LEFT-joins the counts through the co-partitioned hash
    join (counts and spine both scale with span × types, not with
    data, but neither is assumed broadcast-small); nulls fill to 0.
    ``hour`` is epoch-hours (µs // 3.6e9) on both engines."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    HOUR_US = 3_600_000_000

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        tu = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"event_type": df["event_type"],
                             "hour": tu // HOUR_US,
                             "vc": cents(df["value"])})

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    counts = grouped_agg(
        ev.map_batches(keyed, batch_format="pandas"),
        ["event_type", "hour"],
        {"n": ("hour", "count"), "value_cents": ("vc", "sum")},
        num_buckets=8)

    def hpart(t: pa.Table) -> pa.Table:
        arr = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"mn": pa.array([pc.min(arr).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(arr).as_py()], pa.int64())})

    bounds = (_read(sf_dir, "events", ["ts"])
              .map_batches(hpart, batch_format="pyarrow")
              .to_pandas().dropna())
    if bounds.empty:
        return rd.from_arrow(pa.schema(
            [("event_type", pa.string()), ("hour", pa.int64()),
             ("n", pa.int64()), ("value_cents", pa.int64())]
        ).empty_table())
    lo = int(bounds["mn"].min()) // HOUR_US
    hi = int(bounds["mx"].max()) // HOUR_US

    # label-cardinality type list (the grouping_sets driver-fold rule)
    types = sorted(grouped_agg(
        ev.map_batches(lambda df: df[["event_type"]],
                       batch_format="pandas"),
        ["event_type"], {"n": ("event_type", "count")}, num_buckets=4
    ).to_pandas()["event_type"])

    def expand(df: pd.DataFrame) -> pa.Table:
        hours = lo + df["id"].to_numpy().astype("int64")
        return pa.table({
            "event_type": pa.array(np.repeat(types, len(hours))),
            "hour": pa.array(np.tile(hours, len(types))),
        })

    spine = rd.range(hi - lo + 1).map_batches(
        expand, batch_format="pandas")
    joined = hash_join(spine, counts, on=["event_type", "hour"],
                       how="left", exchange_dir=_exchange("spine"),
                       num_buckets=8)

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": t["hour"],
            "n": pc.fill_null(pc.cast(t["n"], pa.int64()), 0),
            "value_cents": pc.fill_null(
                pc.cast(t["value_cents"], pa.int64()), 0),
        })

    return joined.map_batches(fill, batch_format="pyarrow")


EVENTS_HOURLY_SPINE_SQL = """
WITH b AS (
  SELECT min(epoch_us(ts)) // 3600000000 AS lo,
         max(epoch_us(ts)) // 3600000000 AS hi
  FROM events
), types AS (
  SELECT DISTINCT event_type FROM events
), hours AS (
  SELECT unnest(generate_series((SELECT lo FROM b),
                                (SELECT hi FROM b))) AS hour
), spine AS (
  SELECT t.event_type, h.hour FROM types t, hours h
), c AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY event_type, hour
)
SELECT s.event_type, CAST(s.hour AS BIGINT) AS hour,
       coalesce(c.n, 0) AS n,
       coalesce(c.value_cents, 0) AS value_cents
FROM spine s
LEFT JOIN c ON c.event_type = s.event_type AND c.hour = s.hour
"""


def events_asof_state(sf_dir: str):
    """Time travel over the SCD2 dimension (the warehouse AS OF
    query): the state of every (user, event_type) key AT the table's
    integer-µs midpoint instant — the interval containing T under the
    half-open [valid_from, valid_to) convention, NULL valid_to
    meaning current. Pure composition: scd2_intervals (one user-hash
    exchange) → one vectorized interval-containment filter; the
    cutoff uses the events_cdc_merge midpoint discipline so no
    calendar arithmetic enters the contract. Output one row per key
    live at T: (user_id, event_type, value_cents, valid_from_us)."""
    import pyarrow.compute as pc

    from guac_ray.functions.streams import scd2_intervals

    t_us = _ts_midpoint_us(sf_dir, "events_asof_state")

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"], "ts": df["ts"],
            "user_id": df["user_id"], "event_type": df["event_type"],
            "value_cents": cents(df["value"])})

    iv = scd2_intervals(ds.map_batches(to_cents, batch_format="pandas"),
                        exchange_base=_exchange("asof_scd2"))

    def live_at(t: pa.Table) -> pa.Table:
        vf = t["valid_from_us"]
        vt = t["valid_to_us"]
        m = pc.and_(pc.less_equal(vf, t_us),
                    pc.or_kleene(pc.is_null(vt), pc.greater(vt, t_us)))
        kept = t.filter(pc.fill_null(m, False))
        return pa.table({
            "user_id": kept["user_id"],
            "event_type": kept["event_type"],
            "value_cents": kept["value_cents"],
            "valid_from_us": kept["valid_from_us"],
        })

    return iv.map_batches(live_at, batch_format="pyarrow")


EVENTS_ASOF_STATE_SQL = """
WITH c AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS t FROM events
), t0 AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tu,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events
), s AS (
  SELECT *, CASE WHEN lag(vc) OVER w IS NULL
                   OR lag(vc) OVER w <> vc THEN 1 ELSE 0 END AS chg
  FROM t0
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id)
), r AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id, event_type
                           ORDER BY tu, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s
), runs AS (
  SELECT user_id, event_type,
         CAST(min(vc) AS BIGINT) AS value_cents,
         CAST(min(tu) AS BIGINT) AS valid_from_us
  FROM r GROUP BY user_id, event_type, run_id
), iv AS (
  SELECT *, lead(valid_from_us) OVER (PARTITION BY user_id, event_type
                                      ORDER BY valid_from_us)
            AS valid_to_us
  FROM runs
)
SELECT user_id, event_type, value_cents, valid_from_us
FROM iv, c
WHERE valid_from_us <= t AND (valid_to_us IS NULL OR valid_to_us > t)
"""


def events_trend(sf_dir: str):
    """Per-type OLS trend line (functions/stats.py ``grouped_linreg``):
    regress value cents on second-of-day per event_type — the drift
    detector completing the grouped_corr family (same exact int64
    moment sums through the two-phase aggregate, same fixed-order
    double expressions, bit-exact vs the SQL oracle; constant-x groups
    pin slope 0.0 / intercept mean-y in both engines). Slope is
    cents-per-second of day time."""
    from guac_ray.functions.stats import grouped_linreg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def xy(df: pd.DataFrame) -> pd.DataFrame:
        tu = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "event_type": df["event_type"],
            "x": (tu // 1_000_000) % 86400,
            "y": cents(df["value"]),
        })

    return grouped_linreg(
        ds.map_batches(xy, batch_format="pandas"),
        ["event_type"], "x", "y", num_buckets=8)


EVENTS_TREND_SQL = """
WITH t AS (
  SELECT event_type,
         (epoch_us(ts) // 1000000) % 86400 AS x,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx,
         min(x) AS mnx, max(x) AS mxx
  FROM t GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n,
  CASE WHEN mnx = mxx THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE)
     - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
    / (CAST(sxx AS DOUBLE)
       - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
  END AS slope,
  CASE WHEN mnx = mxx THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) ELSE
    (CAST(sy AS DOUBLE)
     - ((CAST(sxy AS DOUBLE)
         - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
        / (CAST(sxx AS DOUBLE)
           - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)))
       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
  END AS intercept
FROM m
"""


def events_user_mode(sf_dir: str):
    """EXACT grouped mode (stages/groupagg.py ``grouped_mode``): each
    user's most frequent event_type with the deterministic smallest-
    value tie-break — the argmax-per-group aggregate (dominant
    category per user / majority label per cluster) COUNT partials
    distribute but sum/min/max partials cannot express. With ~5 types
    per user at near-uniform rates this corpus carries real ties, so
    the tie-break is exercised, not decorative. In-batch count
    combiner → one key-hash exchange → per-bucket argmax."""
    from guac_ray.stages.groupagg import grouped_mode

    return grouped_mode(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        ["user_id"], "event_type",
        exchange_base=_exchange("user_mode"), num_buckets=8)


EVENTS_USER_MODE_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode, n AS n_mode
FROM c
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) = 1
"""


def events_debounce(sf_dir: str):
    """Burst filter (functions/streams.py ``debounce``): keep an event
    only if it is the user's first or arrives more than 1 hour after
    the user's previous event — the lag-throttle stream-hygiene pass
    that strips double-fires / retry storms / duplicate webhooks
    before sessionization (drops ~9% of this corpus). One row per KEPT
    event with its inter-arrival gap (NULL on each user's first).
    Same one-exchange per-user stream shell as gap_quantiles; the
    predicate compares against the previous EVENT (SQL lag semantics —
    the sequential previous-KEPT variant is a per-key recurrence with
    no vectorized or SQL form and is deliberately not offered)."""
    from guac_ray.functions.streams import debounce

    return debounce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        gap_us=3_600_000_000,
        exchange_base=_exchange("debounce"))


EVENTS_DEBOUNCE_SQL = """
WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS gap
  FROM events
)
SELECT user_id, event_id, ts_us, CAST(gap AS BIGINT) AS gap_us
FROM t WHERE gap IS NULL OR gap > 3600000000
"""


def events_chi2(sf_dir: str):
    """Pearson chi-squared independence grid (functions/stats.py
    ``chi2_contingency``) over event_type × weekday — the
    feature-dependence screen run before feature selection or
    stratified sampling, and the engine's contingency-table operator.
    One row per cell of the FULL observed-label cross product (absent
    cells carry n_obs = 0 but still contribute expected count — the
    understated-χ² bug a GROUP-BY-only plan would have). Weekday is
    ``(epoch_day + 4) % 7`` on both engines (the grouping-sets idiom);
    counts flow exact int64 through the two-phase aggregate, the cell
    deviation d = n_obs·N − n_row·n_col is exact int64, and the one
    double expression (d·d)/((N·r)·c) is evaluated in the identical
    operation order in both engines, so per-cell doubles are
    bit-exact. Per-CELL output keeps float summation order out of the
    contract; the total χ² is one fold over the 35-cell grid."""
    from guac_ray.functions.stats import chi2_contingency

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        return pd.DataFrame({"event_type": df["event_type"],
                             "weekday": (day + 4) % 7})

    return chi2_contingency(
        ds.map_batches(keyed, batch_format="pandas"),
        "event_type", "weekday", num_buckets=4)


EVENTS_CHI2_SQL = """
WITH t AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS weekday
  FROM events
), cells AS (
  SELECT event_type, weekday, CAST(count(*) AS BIGINT) AS n_obs
  FROM t GROUP BY event_type, weekday
), grid AS (
  SELECT r.event_type, c.weekday,
         COALESCE(x.n_obs, 0) AS n_obs
  FROM (SELECT DISTINCT event_type FROM cells) r
  CROSS JOIN (SELECT DISTINCT weekday FROM cells) c
  LEFT JOIN cells x USING (event_type, weekday)
), tot AS (
  SELECT event_type, weekday, CAST(n_obs AS BIGINT) AS n_obs,
         CAST(sum(n_obs) OVER (PARTITION BY event_type) AS BIGINT)
           AS n_row,
         CAST(sum(n_obs) OVER (PARTITION BY weekday) AS BIGINT)
           AS n_col,
         CAST(sum(n_obs) OVER () AS BIGINT) AS n_total
  FROM grid
)
SELECT event_type, weekday, n_obs, n_row, n_col, n_total,
       (CAST(n_obs*n_total - n_row*n_col AS DOUBLE)
        * CAST(n_obs*n_total - n_row*n_col AS DOUBLE))
       / ((CAST(n_total AS DOUBLE) * CAST(n_row AS DOUBLE))
          * CAST(n_col AS DOUBLE)) AS chi2_cell
FROM tot
"""


def events_grouping_sets(sf_dir: str):
    """Arbitrary GROUPING SETS (functions/reshape.py
    ``grouping_sets_agg``) — the general lattice selection ROLLUP
    (orders_cube's prefix sets) and CUBE (all subsets) are special
    cases of: here a 4-set selection over (event_type, weekday,
    value-tier) that is neither a rollup nor a cube. Weekday is
    computed as ``(epoch_day + 4) % 7`` on BOTH engines (1970-01-01
    was a Thursday) so no calendar-function dialect leaks in. One
    distributed finest-level aggregate; each requested set derives
    from the finest frame (bounded by group cardinality, never input
    size)."""
    from guac_ray.functions.reshape import grouping_sets_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        return pd.DataFrame({
            "event_type": df["event_type"],
            "dow": ((day + 4) % 7).astype(str),
            "tier": np.where(df["value"].to_numpy() >= 100.0,
                             "hi", "lo"),
            "vc": cents(df["value"]),
        })

    out = grouping_sets_agg(
        ds.map_batches(prep, batch_format="pandas"),
        keys=["event_type", "dow", "tier"],
        sets=[("event_type", "dow"), ("event_type", "tier"),
              ("dow",), ()],
        spec={"n": ("vc", "count"), "value_cents": ("vc", "sum")})
    return rd.from_pandas(out)


EVENTS_GROUPING_SETS_SQL = """
WITH t AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS VARCHAR) AS dow,
         CASE WHEN value >= 100.0 THEN 'hi' ELSE 'lo' END AS tier,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(dow, 'ALL') AS dow,
       coalesce(tier, 'ALL') AS tier,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vc) AS BIGINT) AS value_cents
FROM t
GROUP BY GROUPING SETS ((event_type, dow), (event_type, tier),
                        (dow), ())
"""


def doc_bpe_tokens(sf_dir: str):
    """APPLY side of the trained tokenizer (functions/bpe.py
    ``bpe_token_counts``): per-doc token counts under the corpus's OWN
    learned 40-merge BPE vocabulary — the budget signal packing and
    context-window planning consume, completing the train→apply loop
    doc_bpe_merges opens. The merge table is tiny and ships once per
    actor; encoding is memoized per DISTINCT word (work bounded by
    vocabulary growth, never token count) and the per-doc arithmetic is
    one np.unique + segment sum. Deterministic; golden-pinned (the
    trained vocabulary itself has no SQL form)."""
    from guac_ray.functions.bpe import bpe_token_counts, bpe_train_merges

    merges_df = bpe_train_merges(
        _read(sf_dir, "documents", ["text"]), n_merges=40).to_pandas()
    merges = list(zip(merges_df["left"], merges_df["right"]))
    return bpe_token_counts(
        _read(sf_dir, "documents", ["doc_id", "text"]), merges)


def orders_basket_sig(sf_dir: str):
    """Canonical per-order basket signature (stages/groupagg.py
    ``grouped_sorted_concat``) — the ORDER-SENSITIVE list aggregate
    (``string_agg(v, '|' ORDER BY v)`` / sorted ``collect_list``) the
    partial-agg workhorse cannot express, because a concatenation does
    not commute. One row per order with its distinct part brands sorted
    ASC and joined — the signature entity-resolution and
    basket-clustering pipelines key on. The part dimension broadcasts
    once (searchsorted lookup); baskets co-locate through ONE
    by-order fs exchange; the join itself is ``pc.binary_join`` over
    group-offset ListArrays — no per-group Python call anywhere."""
    from guac_ray.stages.groupagg import grouped_sorted_concat

    pref = _bcast_df(sf_dir, "part", ["p_partkey", "p_brand"])

    class BrandMap:
        def __init__(self):
            part = ray.get(pref).sort_values("p_partkey")
            self.keys = part.p_partkey.to_numpy()
            self.brands = part.p_brand.to_numpy()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            idx = _dim_idx(self.keys, df.l_partkey.to_numpy(), "part dim")
            return pd.DataFrame({"o_orderkey": df.l_orderkey.to_numpy(),
                                 "b": self.brands[idx]})

    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(BrandMap, batch_format="pandas", concurrency=(1, 4))
    return grouped_sorted_concat(
        items, keys=["o_orderkey"], val_col="b", sep="|",
        out_col="basket_sig", distinct=True,
        exchange_base=_exchange("bsig"))


ORDERS_BASKET_SIG_SQL = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o_orderkey, p.p_brand AS b
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
       string_agg(b, '|' ORDER BY b) AS basket_sig
FROM ob GROUP BY o_orderkey
"""


def events_percentile(sf_dir: str):
    """GLOBAL percent-rank of event value WITHOUT a global sort
    (functions/scale.py:percentile_rank): distinct-value histogram
    through the two-phase exchange, cumulative counts broadcast once,
    pure map second pass — the scale path for whole-dataset ranking.
    Fixed-point ``1e6·(#below) // (n−1)`` matches SQL percent_rank's
    tie behavior exactly (#strictly-below == rank()−1)."""
    from guac_ray.functions.scale import percentile_rank

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "value_cents": cents(df["value"]),
        })

    return percentile_rank(
        ds.map_batches(to_cents, batch_format="pandas"),
        "value_cents", keep_cols=["event_id"])


EVENTS_PERCENTILE_SQL = """
WITH v AS (
  SELECT event_id,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS value_cents
  FROM events
)
SELECT event_id, value_cents,
       CAST((1000000 * (rank() OVER (ORDER BY value_cents) - 1))
            // (count(*) OVER () - 1) AS BIGINT) AS pr_fp
FROM v
"""


def doc_entropy(sf_dir: str):
    """Per-doc token-distribution entropy
    (functions/text.py:doc_token_entropy) — the repetitiveness signal,
    entirely batch-local (a doc is one row: no vocabulary pass, no
    broadcast, no shuffle). Same micro-nat quantization contract as
    doc_surprisal/events_entropy, so the score is oracle-exact."""
    from guac_ray.functions.text import doc_token_entropy

    return doc_token_entropy(_read(sf_dir, "documents", ["doc_id", "text"]))


DOC_ENTROPY_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), c AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
  FROM tok2 GROUP BY 1, 2
), t AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM c GROUP BY 1
)
SELECT c.doc_id, t.n AS n_tokens, t.n_distinct,
       CAST(sum(c.c * CAST(floor(1000000.0 * (ln(CAST(t.n AS DOUBLE)) -
                                              ln(CAST(c.c AS DOUBLE)))
                                 + 0.5) AS BIGINT)) // t.n
            AS BIGINT) AS entropy_micronats
FROM c JOIN t USING (doc_id)
GROUP BY 1, t.n, t.n_distinct
"""


def kg_link_predict(sf_dir: str):
    """Common-neighbor / Jaccard link prediction over the assembled KG
    (functions/triangles.py:common_neighbors): node pairs sharing ≥ 2
    neighbors via centers of degree ≤ 64 (the cap is the semantic AND
    the scale control — hub-mediated common neighbors carry little
    signal, and it bounds wedge volume at cap·2m), fixed-point Jaccard
    over the FULL degrees."""
    from guac_ray.functions.triangles import common_neighbors

    g = _corpus_edges(sf_dir)
    return common_neighbors(
        g["edges"], "subj_key", "obj_key",
        exchange_base=_exchange("linkpred"), num_buckets=8,
        max_center_degree=64, min_common=2)


def KG_LINK_PREDICT_SQL(sf_dir: str) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT least(subj_key, obj_key) AS u,
         greatest(subj_key, obj_key) AS v
  FROM read_parquet('{_fix(sf_dir)}/golden/edges.parquet')
  WHERE subj_key <> obj_key
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
  GROUP BY 1
), nb AS (
  SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e
), nbc AS (
  SELECT nb.a, nb.b FROM nb JOIN deg ON deg.n = nb.a
  WHERE deg.deg <= 64
), cn AS (
  SELECT n1.b AS x, n2.b AS y, CAST(count(*) AS BIGINT) AS common
  FROM nbc n1 JOIN nbc n2 ON n1.a = n2.a AND n1.b < n2.b
  GROUP BY 1, 2
)
SELECT cn.x, cn.y, cn.common, d1.deg AS deg_x, d2.deg AS deg_y,
       CAST(1000000 * cn.common // (d1.deg + d2.deg - cn.common)
            AS BIGINT) AS jaccard_fp
FROM cn
JOIN deg d1 ON d1.n = cn.x
JOIN deg d2 ON d2.n = cn.y
WHERE cn.common >= 2
"""


def resolve_sql(sql, sf_dir: str) -> str | None:
    """SUITE oracle entries are either literal SQL (relational queries —
    table views are pre-registered by the driver) or builders of
    ``sf_dir`` (KG queries — their SQL reads the deterministic fixture
    parquet matched to that sf_dir)."""
    return sql(sf_dir) if callable(sql) else sql


# name → (ray callable, oracle SQL string / builder(sf_dir) / None)
#
# ORDER MATTERS: the driver's correctness gate checks the FIRST 50
# entries of SUITE (registry size: assert at the bottom of this file,
# which also pins that all 50 in-gate entries carry a SQL oracle —
# hash-exact driver rows). Rotation policy (committed round 4,
# applied again at round-5 start; the full policy text sits directly
# above the SUITE literal): a gate slot goes to an
# --------------------------------------------------------------------------
# SPDX-JSON SBOM ingest parity (sources/spdx.py vs parse_spdx.go)
# --------------------------------------------------------------------------


def _fleet_fresh(out: str, src_path: str) -> "str | None":
    """Freshness check for a /tmp document-fleet cache: returns the
    source fingerprint to commit when (re)generation is needed, or
    None when the existing cache matches. The sentinel carries the
    source parquet's (size, mtime_ns) — a bare existence check would
    feed the Ray side a STALE fleet after the synth data regenerates
    in place (or when a second checkout shares the sf basename) while
    the DuckDB oracle reads the live table. On mismatch the whole
    directory is cleared first: leftover per-group files from a
    vanished group would otherwise still be globbed as extra
    documents."""
    import shutil as _sh

    st = os.stat(src_path)
    fp = f"{st.st_size}:{st.st_mtime_ns}"
    done = f"{out}/_done"
    if os.path.exists(done):
        try:
            with open(done) as fh:
                if fh.read() == fp:
                    return None
        except OSError:
            pass
        _sh.rmtree(out, ignore_errors=True)
    return fp


def _fleet_commit(out: str, fp: str) -> None:
    done = f"{out}/_done"
    with open(done + ".tmp", "w") as fh:
        fh.write(fp)
    os.replace(done + ".tmp", done)


def _spdx_fleet_for_sf(sf_dir: str) -> str:
    """Deterministic SPDX-2.2 JSON fleet synthesized FROM the ``part``
    table (one document per ``p_brand``, 25 at any sf) — a pure string
    function of the rows, so the DuckDB oracle reconstructs the exact
    same triples straight from ``part`` with string algebra and the
    comparison is a real independent derivation, not a pinned golden.
    Exercises: purl external refs, package checksums, DEPENDS_ON vs
    CONTAINED_BY direction spellings, CONTAINS→file edges with the
    file-purl canonical escaping, license expressions (MIT /
    "Apache-2.0 AND MIT"), SECURITY cpe refs, topLevelPackage metadata.
    Cached under /tmp per sf; regeneration is atomic per file."""
    import hashlib as _hl
    import json as _json

    out = f"/tmp/guac_ray_spdx/{os.path.basename(os.path.normpath(sf_dir))}"
    _fp = _fleet_fresh(out, f"{sf_dir}/part.parquet")
    if _fp is None:
        return out
    import pyarrow.parquet as _pq

    df = _pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_size"],
    ).to_pandas().sort_values("p_partkey")
    os.makedirs(out, exist_ok=True)
    for brand, g in df.groupby("p_brand", sort=True):
        slug = brand.lower().replace("#", "-")
        pkgs = [{"SPDXID": "SPDXRef-TOP", "name": slug, "versionInfo": "1",
                 "externalRefs": [{"referenceCategory": "PACKAGE_MANAGER",
                                   "referenceType": "purl",
                                   "referenceLocator": f"pkg:generic/{slug}"}]}]
        rels = [{"spdxElementId": "SPDXRef-DOCUMENT",
                 "relationshipType": "DESCRIBES",
                 "relatedSpdxElement": "SPDXRef-TOP"}]
        files = []
        for r in g.itertuples():
            k, name, size = int(r.p_partkey), r.p_name, int(r.p_size)
            purl = f"pkg:generic/{name.replace(' ', '-')}-{k}@{size}"
            digest = _hl.md5(f"{name}-{k}".encode()).hexdigest()
            pac = {"SPDXID": f"SPDXRef-P{k}", "name": name,
                   "versionInfo": str(size),
                   "checksums": [{"algorithm": "SHA256",
                                  "checksumValue": digest}],
                   "externalRefs": [{"referenceCategory": "PACKAGE_MANAGER",
                                     "referenceType": "purl",
                                     "referenceLocator": purl}]}
            if size % 3 == 0:
                pac["licenseConcluded"] = "MIT"
            elif size % 3 == 1:
                pac["licenseConcluded"] = "Apache-2.0 AND MIT"
            if size % 4 == 0:
                pac["externalRefs"].append(
                    {"referenceCategory": "SECURITY",
                     "referenceType": "cpe23Type",
                     "referenceLocator": f"cpe:2.3:a:corp:part-{k}:{size}"})
            pkgs.append(pac)
            # both direction spellings of "top depends on part"
            if k % 2 == 0:
                rels.append({"spdxElementId": "SPDXRef-TOP",
                             "relationshipType": "DEPENDS_ON",
                             "relatedSpdxElement": f"SPDXRef-P{k}"})
            else:
                rels.append({"spdxElementId": f"SPDXRef-P{k}",
                             "relationshipType": "CONTAINED_BY",
                             "relatedSpdxElement": "SPDXRef-TOP"})
            if k % 5 == 0:
                files.append({"SPDXID": f"SPDXRef-F{k}",
                              "fileName": f"lib/part-{k}.so",
                              "checksums": [{"algorithm": "SHA1",
                                             "checksumValue":
                                                 _hl.md5(name.encode()).hexdigest()}]})
                rels.append({"spdxElementId": f"SPDXRef-P{k}",
                             "relationshipType": "CONTAINS",
                             "relatedSpdxElement": f"SPDXRef-F{k}"})
        doc = {"SPDXID": "SPDXRef-DOCUMENT", "name": slug,
               "spdxVersion": "SPDX-2.2",
               "creationInfo": {"created": "2024-01-01T00:00:00Z",
                                "licenseListVersion": "3.18"},
               "documentNamespace": f"https://sbom.test/spdx/{slug}",
               "packages": pkgs, "files": files, "relationships": rels}
        tmp = f"{out}/{slug}.json.tmp"
        with open(tmp, "w") as f:
            _json.dump(doc, f, sort_keys=True)
        os.replace(tmp, f"{out}/{slug}.json")
    _fleet_commit(out, _fp)
    return out


_SPDX_COLS = ["subj_type", "subj_key", "pred", "obj_type", "obj_key",
              "justification"]


def kg_spdx_ingest(sf_dir: str):
    """Real-format SBOM ingestion: the SPDX-JSON reader plugin
    (sources/spdx.py, field-level parse_spdx.go parity — verified
    against the reference's own alpine golden, counts exact) over the
    deterministic per-brand fleet → distinct edge rows. props/origin
    are excluded here only because the has_sbom digest is a sha256 of
    the raw blob (not SQL-derivable); the full payload is covered by
    tests/test_spdx.py."""
    from guac_ray.sources.spdx import read_spdx
    from guac_ray.stages.assemble import dedup_exact

    fleet = _spdx_fleet_for_sf(sf_dir)
    edges = read_spdx(fleet).map_batches(
        lambda t: t.select(_SPDX_COLS), batch_format="pyarrow")
    return dedup_exact(edges, _SPDX_COLS, num_buckets=8)


def KG_SPDX_INGEST_SQL(sf_dir: str) -> str:
    return f"""
WITH p AS (
  SELECT p_partkey AS k, p_name AS name, p_size AS size,
         lower(replace(p_brand, '#', '-')) AS slug,
         'pkg:generic/' || replace(p_name, ' ', '-') || '-' || p_partkey
             || '@' || p_size AS purl,
         'pkg:generic/' || lower(replace(p_brand, '#', '-')) AS top
  FROM part
), docs AS (
  SELECT DISTINCT slug, top FROM p
), fpurl AS (
  SELECT k, name, purl,
         'pkg:guac/files/sha1%3A' || md5(name) || '#lib%2Fpart-' || k
             || '.so' AS fp
  FROM p WHERE k % 5 = 0
)
SELECT DISTINCT * FROM (
  SELECT 'package' AS subj_type, top AS subj_key, 'has_sbom' AS pred,
         'manifest' AS obj_type, 'https://sbom.test/spdx/' || slug AS obj_key,
         'spdx document manifest' AS justification
  FROM docs
  UNION ALL
  SELECT 'package', top, 'depends_on', 'package', purl,
         CASE WHEN k % 2 = 0
              THEN 'Derived from SPDX DEPENDS_ON relationship'
              ELSE 'Derived from SPDX CONTAINED_BY relationship' END
  FROM p
  UNION ALL
  SELECT 'package', purl, 'depends_on', 'package', fp,
         'Derived from SPDX CONTAINS relationship'
  FROM fpurl
  UNION ALL
  SELECT 'package', purl, 'is_occurrence', 'artifact',
         'sha256:' || md5(name || '-' || k), 'spdx package with checksum'
  FROM p
  UNION ALL
  SELECT 'package', fp, 'is_occurrence', 'artifact', 'sha1:' || md5(name),
         'spdx file with checksum'
  FROM fpurl
  UNION ALL
  SELECT 'package', purl, 'certify_legal', 'license', 'license:MIT:3.18',
         'Found in SPDX document.'
  FROM p WHERE size % 3 IN (0, 1)
  UNION ALL
  SELECT 'package', purl, 'certify_legal', 'license',
         'license:Apache-2.0:3.18', 'Found in SPDX document.'
  FROM p WHERE size % 3 = 1
  UNION ALL
  SELECT 'package', purl, 'has_metadata', 'metadata',
         'cpe:cpe:2.3:a:corp:part-' || k || ':' || size,
         'spdx cpe external reference'
  FROM p WHERE size % 4 = 0
  UNION ALL
  SELECT 'package', purl, 'has_metadata', 'metadata',
         'topLevelPackage:' || top, 'spdx top level package reference'
  FROM p
  UNION ALL
  SELECT 'package', top, 'has_metadata', 'metadata',
         'topLevelPackage:' || top, 'spdx top level package reference'
  FROM docs
)
"""


def _cdx_fleet_for_sf(sf_dir: str) -> str:
    """Deterministic CycloneDX-JSON fleet from the ``part`` table (one
    BOM per ``p_brand``) — the CycloneDX sibling of
    :func:`_spdx_fleet_for_sf`, same pure-string-function-of-the-rows
    oracle discipline. Exercises: container top-level purl synthesis
    (registry/name:tag → ?tag qualifier), the unconditional top-level
    fan-out, SHA-256 hash occurrences, the explicit dependencies graph
    (top→evens metadata-only + a per-brand chain of CDX BOM Dependency
    edges), and one VEX vulnerability per BOM (exploitable on even
    brand index → certify_vuln, not_affected on odd) with a CVSSv31
    rating."""
    import hashlib as _hl
    import json as _json

    out = f"/tmp/guac_ray_cdx/{os.path.basename(os.path.normpath(sf_dir))}"
    _fp = _fleet_fresh(out, f"{sf_dir}/part.parquet")
    if _fp is None:
        return out
    import pyarrow.parquet as _pq

    df = _pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_size"],
    ).to_pandas().sort_values("p_partkey")
    os.makedirs(out, exist_ok=True)
    for brand, g in df.groupby("p_brand", sort=True):
        slug = brand.lower().replace("#", "-")
        idx = int(brand.split("#")[1])
        comps, deps, evens, prev = [], [], [], None
        for r in g.itertuples():
            k, name, size = int(r.p_partkey), r.p_name, int(r.p_size)
            purl = f"pkg:generic/{name.replace(' ', '-')}-{k}@{size}"
            comps.append({
                "bom-ref": f"P{k}", "type": "library", "name": name,
                "version": str(size), "purl": purl,
                "hashes": [{"alg": "SHA-256",
                            "content": _hl.md5(f"{name}-{k}".encode()).hexdigest()}],
            })
            if k % 2 == 0:
                evens.append(f"P{k}")
            if prev is not None:
                deps.append({"ref": prev, "dependsOn": [f"P{k}"]})
            prev = f"P{k}"
        deps.insert(0, {"ref": "top", "dependsOn": evens})
        first_purl = comps[0]["purl"]
        vuln = {
            "id": f"CVE-2024-{1000 + idx}",
            "analysis": ({"state": "exploitable"} if idx % 2 == 0 else
                         {"state": "not_affected",
                          "justification": "code_not_present"}),
            "published": "2024-02-02T00:00:00Z",
            "affects": [{"ref": f"urn:sbom:cdx:{slug}#{first_purl}"}],
            "ratings": [{"method": "CVSSv31", "score": float(idx)}],
        }
        doc = {
            "bomFormat": "CycloneDX", "specVersion": "1.4",
            "serialNumber": f"urn:sbom:cdx:{slug}",
            "metadata": {"timestamp": "2024-02-02T00:00:00Z",
                         "component": {"bom-ref": "top", "type": "container",
                                       "name": f"registry.test/{slug}:v1",
                                       "version": "1"}},
            "components": comps, "dependencies": deps,
            "vulnerabilities": [vuln],
        }
        tmp = f"{out}/{slug}.json.tmp"
        with open(tmp, "w") as f:
            _json.dump(doc, f, sort_keys=True)
        os.replace(tmp, f"{out}/{slug}.json")
    _fleet_commit(out, _fp)
    return out


def kg_cdx_ingest(sf_dir: str):
    """CycloneDX SBOM ingestion parity (sources/cyclonedx.py,
    parser_cyclonedx.go semantics — verified against the reference's
    own alpine/distroless/quarkus/VEX fixtures): the per-brand BOM
    fleet → distinct edge rows; props/origin excluded for the same
    blob-sha256 reason as kg_spdx_ingest (payloads covered by
    tests/test_cyclonedx.py)."""
    from guac_ray.sources.cyclonedx import read_cyclonedx
    from guac_ray.stages.assemble import dedup_exact

    fleet = _cdx_fleet_for_sf(sf_dir)
    edges = read_cyclonedx(fleet).map_batches(
        lambda t: t.select(_SPDX_COLS), batch_format="pyarrow")
    return dedup_exact(edges, _SPDX_COLS, num_buckets=8)


def KG_CDX_INGEST_SQL(sf_dir: str) -> str:
    return f"""
WITH p AS (
  SELECT p_partkey AS k, p_name AS name, p_size AS size,
         lower(replace(p_brand, '#', '-')) AS slug,
         CAST(replace(p_brand, 'Brand#', '') AS INT) AS idx,
         'pkg:generic/' || replace(p_name, ' ', '-') || '-' || p_partkey
             || '@' || p_size AS purl,
         'pkg:guac/cdx/registry.test/' || lower(replace(p_brand, '#', '-'))
             || '@1?tag=v1' AS top
  FROM part
), chain AS (
  SELECT slug, purl,
         lead(purl) OVER (PARTITION BY slug ORDER BY k) AS nxt
  FROM p
), docs AS (
  SELECT slug, any_value(top) AS top, any_value(idx) AS idx,
         'vuln://cve/cve-2024-' || (1000 + any_value(idx)) AS vkey,
         arg_min(purl, k) AS fpurl
  FROM p GROUP BY slug
)
SELECT DISTINCT * FROM (
  SELECT 'package' AS subj_type, top AS subj_key, 'has_sbom' AS pred,
         'manifest' AS obj_type, 'urn:sbom:cdx:' || slug AS obj_key,
         'cdx document manifest' AS justification
  FROM docs
  UNION ALL
  SELECT 'package', top, 'has_metadata', 'metadata',
         'topLevelPackage:' || top,
         'CycloneDX top level package self reference'
  FROM docs
  UNION ALL
  SELECT 'package', top, 'depends_on', 'package', purl,
         'top-level package GUAC heuristic connecting to each file/package'
  FROM p
  UNION ALL
  SELECT 'package', purl, 'is_occurrence', 'artifact',
         'sha-256:' || md5(name || '-' || k), 'cdx package with checksum'
  FROM p
  UNION ALL
  SELECT 'package', purl, 'depends_on', 'package', nxt,
         'CDX BOM Dependency'
  FROM chain WHERE nxt IS NOT NULL
  UNION ALL
  -- topLevelPackage reference rows: deps of top (even k) ∪ chain
  -- dependents (every non-first part of the brand); DISTINCT merges
  SELECT 'package', purl, 'has_metadata', 'metadata',
         'topLevelPackage:' || top, 'CycloneDX top level package reference'
  FROM p WHERE k % 2 = 0
  UNION ALL
  SELECT 'package', c.nxt, 'has_metadata', 'metadata',
         'topLevelPackage:' || d.top,
         'CycloneDX top level package reference'
  FROM chain c JOIN docs d USING (slug) WHERE c.nxt IS NOT NULL
  UNION ALL
  SELECT 'package', fpurl, 'affected_by', 'vulnerability', vkey,
         'cdx vulnerability analysis'
  FROM docs
  UNION ALL
  SELECT 'package', fpurl, 'certify_vuln', 'vulnerability', vkey,
         'cdx vulnerability scan'
  FROM docs WHERE idx % 2 = 0
  UNION ALL
  SELECT 'vulnerability', vkey, 'vuln_metadata', 'metric',
         'ent:metric/cvssv31', 'cdx vulnerability rating'
  FROM docs
)
"""


def _vex_fleet_for_sf(sf_dir: str) -> tuple[str, str]:
    """Deterministic OpenVEX + CSAF fleets from the ``supplier`` table
    (one document of each format per nation) — same pure-string oracle
    discipline as the SBOM fleets. OpenVEX: one statement per supplier,
    status cycling by suppkey%4 (affected / not_affected+justification /
    fixed / under_investigation). CSAF: one vulnerability per nation
    whose product tree resolves per-supplier two-hop (relationship →
    branch purl helper); evens known_affected with a remediation, odds
    fixed."""
    import json as _json

    base = f"/tmp/guac_ray_vex/{os.path.basename(os.path.normpath(sf_dir))}"
    ov_dir, cs_dir = f"{base}/openvex", f"{base}/csaf"
    _fp = _fleet_fresh(base, f"{sf_dir}/supplier.parquet")
    if _fp is None:
        return ov_dir, cs_dir
    import pyarrow.parquet as _pq

    df = _pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]
                        ).to_pandas().sort_values("s_suppkey")
    os.makedirs(ov_dir, exist_ok=True)
    os.makedirs(cs_dir, exist_ok=True)
    ts = "2024-03-03T00:00:00Z"
    for nat, g in df.groupby("s_nationkey", sort=True):
        nat = int(nat)
        stmts, branches, rels, affected, fixed = [], [], [], [], []
        for r in g.itertuples():
            k = int(r.s_suppkey)
            purl = f"pkg:generic/supplier-{k}@1"
            m = k % 4
            stmt = {"vulnerability": {"name": f"CVE-2024-{2000 + k}"},
                    "products": [{"@id": purl}]}
            if m == 0:
                stmt["status"] = "affected"
                stmt["action_statement"] = f"upgrade supplier-{k}"
            elif m == 1:
                stmt["status"] = "not_affected"
                stmt["justification"] = "vulnerable_code_not_present"
                stmt["impact_statement"] = "code not reachable"
            elif m == 2:
                stmt["status"] = "fixed"
            else:
                stmt["status"] = "under_investigation"
            stmts.append(stmt)
            branches.append({"name": f"SUP{k}",
                             "product": {"product_id": f"SUP{k}",
                                         "product_identification_helper":
                                             {"purl": purl}}})
            rels.append({"product_reference": f"SUP{k}",
                         "full_product_name":
                             {"product_id": f"SUP{k}-on-plat"}})
            (affected if k % 2 == 0 else fixed).append(f"SUP{k}-on-plat")
        ov = {"@context": "https://openvex.dev/ns/v0.2.0",
              "@id": f"https://vex.test/openvex/{nat}",
              "timestamp": ts, "statements": stmts}
        cs = {"document": {"tracking": {
                  "id": f"CSAF-2024:{nat}",
                  "current_release_date": ts}},
              "product_tree": {"branches": [{"name": "vendor",
                                             "branches": branches}],
                               "relationships": rels},
              "vulnerabilities": [{
                  "cve": f"CVE-2024-{3000 + nat}",
                  "product_status": {"known_affected": affected,
                                     "fixed": fixed},
                  "remediations": [{"details": "apply patch",
                                    "product_ids": affected}]}]}
        for d, path in ((ov, f"{ov_dir}/n{nat}.json"),
                        (cs, f"{cs_dir}/n{nat}.json")):
            with open(path + ".tmp", "w") as f:
                _json.dump(d, f, sort_keys=True)
            os.replace(path + ".tmp", path)
    _fleet_commit(base, _fp)
    return ov_dir, cs_dir


def kg_vex_ingest(sf_dir: str):
    """VEX-family ingestion parity: the OpenVEX reader
    (parser_open_vex.go semantics — verified against the reference's
    affected/not-affected fixtures) UNION the CSAF reader
    (parser_csaf.go — exactly the 3-entry CsafVexIngest golden on the
    reference's rhsa fixture) over the per-nation fleets → distinct
    edge rows (same 6-col discipline as the SBOM ingest queries)."""
    from guac_ray.sources.csaf import read_csaf
    from guac_ray.sources.openvex import read_openvex
    from guac_ray.stages.assemble import dedup_exact

    ov_dir, cs_dir = _vex_fleet_for_sf(sf_dir)
    edges = read_openvex(ov_dir).union(read_csaf(cs_dir)).map_batches(
        lambda t: t.select(_SPDX_COLS), batch_format="pyarrow")
    return dedup_exact(edges, _SPDX_COLS, num_buckets=8)


def KG_VEX_INGEST_SQL(sf_dir: str) -> str:
    return f"""
WITH s AS (
  SELECT s_suppkey AS k, s_nationkey AS nat,
         'pkg:generic/supplier-' || s_suppkey || '@1' AS purl
  FROM supplier
)
SELECT DISTINCT * FROM (
  -- OpenVEX: one statement per supplier
  SELECT 'package' AS subj_type, purl AS subj_key,
         'affected_by' AS pred, 'vulnerability' AS obj_type,
         'vuln://cve/cve-2024-' || (2000 + k) AS obj_key,
         'openvex statement' AS justification
  FROM s
  UNION ALL
  SELECT 'package', purl, 'certify_vuln', 'vulnerability',
         'vuln://cve/cve-2024-' || (2000 + k),
         'openvex vulnerability scan'
  FROM s WHERE k % 4 IN (0, 3)  -- affected / under_investigation
  UNION ALL
  -- CSAF: one vulnerability per nation over its suppliers
  SELECT 'package', purl, 'affected_by', 'vulnerability',
         'vuln://cve/cve-2024-' || (3000 + nat), 'csaf vex statement'
  FROM s
)
"""


def _ite6_fleet_for_sf(sf_dir: str) -> str:
    """Deterministic ITE-6 fleet from the ``part`` table, one PAIR of
    documents per brand: a vuln attestation (subjects = the brand's
    part purls, one brand-level CVE result) and a DSSE-wrapped SLSA
    v0.2 provenance (subjects = per-part generic names with
    md5-derived digests, one brand-level VCS material + builder) —
    mixed in ONE directory so the query exercises the content-sniffing
    fan-in including the DSSE unwrap."""
    import base64 as _b64
    import hashlib as _hl
    import json as _json

    base = f"/tmp/guac_ray_ite6/{os.path.basename(os.path.normpath(sf_dir))}"
    _fp = _fleet_fresh(base, f"{sf_dir}/part.parquet")
    if _fp is None:
        return base
    import pyarrow.parquet as _pq

    df = _pq.read_table(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"]
                        ).to_pandas().sort_values("p_partkey")
    os.makedirs(base, exist_ok=True)
    md5 = lambda s: _hl.md5(s.encode()).hexdigest()  # noqa: E731
    for brand, g in df.groupby("p_brand", sort=True):
        b = brand.lower().replace("brand#", "")       # 'Brand#13' → '13'
        keys = [int(r.p_partkey) for r in g.itertuples()]
        vuln = {
            "_type": "https://in-toto.io/Statement/v0.1",
            "predicateType": "https://in-toto.io/attestation/vuln/v0.1",
            "subject": [{"name": f"pkg:generic/part-{k}@1"} for k in keys],
            "predicate": {
                "scanner": {"uri": "osv.test", "version": "1.0",
                            "result": [{"vulnerability_id":
                                        f"CVE-2025-{b}"}]},
                "metadata": {"scannedOn": "2025-06-06T00:00:00Z"},
            },
        }
        slsa = {
            "_type": "https://in-toto.io/Statement/v0.1",
            "predicateType": "https://slsa.dev/provenance/v0.2",
            "subject": [{"name": f"part-{k}",
                         "digest": {"sha256": md5(f"part-{k}")}}
                        for k in keys],
            "predicate": {
                "builder": {"id": f"https://builders.test/brand-{b}"},
                "buildType": "https://build.test/parts@v1",
                "metadata": {"buildStartedOn": "2025-06-06T00:00:00Z"},
                "materials": [
                    {"uri": f"git+https://github.com/parts/brand-{b}@v1",
                     "digest": {"sha1": md5(f"brand-{b}")}}],
            },
        }
        dsse = {"payloadType": "application/vnd.in-toto+json",
                "payload": _b64.standard_b64encode(
                    _json.dumps(slsa, sort_keys=True).encode()).decode(),
                "signatures": [{"keyid": f"brand-{b}", "sig": "unverified"}]}
        for d, path in ((vuln, f"{base}/b{b}-vuln.json"),
                        (dsse, f"{base}/b{b}-dsse.json")):
            with open(path + ".tmp", "w") as f:
                _json.dump(d, f, sort_keys=True)
            os.replace(path + ".tmp", path)
    _fleet_commit(base, _fp)
    return base


def kg_ite6_ingest(sf_dir: str):
    """Attestation-family ingestion parity: the per-brand ITE-6 fleet
    (vuln attestations + DSSE-wrapped SLSA provenance) through the
    mixed-directory content-sniffing reader — the DSSE docs exercise
    the envelope unwrap + re-guess chain (processor/dsse/dsse.go) and
    the SLSA docs the getSlsaEntity purl/VCS/generic fallback. props
    excluded as in kg_spdx_ingest (the flattened SLSA predicate is not
    SQL-derivable; payloads are covered by tests/test_ite6_parsers.py)."""
    from guac_ray.sources.spdx import read_documents_any
    from guac_ray.stages.assemble import dedup_exact

    fleet = _ite6_fleet_for_sf(sf_dir)
    edges = read_documents_any(fleet).map_batches(
        lambda t: t.select(_SPDX_COLS), batch_format="pyarrow")
    return dedup_exact(edges, _SPDX_COLS, num_buckets=8)


def KG_ITE6_INGEST_SQL(sf_dir: str) -> str:
    return """
WITH p AS (
  SELECT p_partkey AS k,
         replace(lower(p_brand), 'brand#', '') AS b
  FROM part
), brands AS (
  SELECT DISTINCT b FROM p
)
SELECT DISTINCT * FROM (
  -- vuln attestation: one OSV↔CVE equivalence per brand
  SELECT 'vulnerability' AS subj_type,
         'vuln://osv/cve-2025-' || b AS subj_key,
         'vuln_equal' AS pred, 'vulnerability' AS obj_type,
         'vuln://cve/cve-2025-' || b AS obj_key,
         'Decoded OSV data' AS justification
  FROM brands
  UNION ALL
  -- ... and one certify_vuln per subject part
  SELECT 'package', 'pkg:generic/part-' || k || '@1', 'certify_vuln',
         'vulnerability', 'vuln://osv/cve-2025-' || b,
         'ite6 vulnerability attestation'
  FROM p
  UNION ALL
  -- SLSA: per-part subject occurrence (generic purl → md5 digest)
  SELECT 'package', 'pkg:guac/generic/part-' || k, 'is_occurrence',
         'artifact', 'sha256:' || md5('part-' || k),
         'from SLSA definition of checksums for subject/materials'
  FROM p
  UNION ALL
  -- ... the brand material occurrence (VCS source → sha1 artifact)
  SELECT 'source', 'src:git/github.com/parts/brand-' || b || '/tag=v1',
         'is_occurrence', 'artifact', 'sha1:' || md5('brand-' || b),
         'from SLSA definition of checksums for subject/materials'
  FROM brands
  UNION ALL
  -- ... and has_slsa from every subject artifact to the brand builder
  SELECT 'artifact', 'sha256:' || md5('part-' || k), 'has_slsa',
         'builder',
         'ent:builder/https%3A%2F%2Fbuilders.test%2Fbrand-' || b,
         'ite6 slsa provenance'
  FROM p
)
"""


def _depsdev_fleet_for_sf(sf_dir: str) -> str:
    """Deterministic scorecard + deps.dev fleet from the ``customer``
    table, one pair per nation: an ossf-scorecard result for the
    nation repo (date-only timestamp exercising the parser's midnight
    fallback) and a deps.dev PackageComponent whose DepPackages are
    the nation's customers (sources only for even custkeys, scorecards
    only for custkey%4==0) with one IsDepPackages edge per customer."""
    import json as _json

    base = f"/tmp/guac_ray_depsdev/{os.path.basename(os.path.normpath(sf_dir))}"
    _fp = _fleet_fresh(base, f"{sf_dir}/customer.parquet")
    if _fp is None:
        return base
    import hashlib as _hl

    import pyarrow.parquet as _pq

    df = _pq.read_table(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"]
                        ).to_pandas().sort_values("c_custkey")
    os.makedirs(base, exist_ok=True)
    md5 = lambda s: _hl.md5(s.encode()).hexdigest()  # noqa: E731
    pkg = lambda name, ver: {"type": "generic", "namespace": "",  # noqa: E731
                             "name": name, "version": ver,
                             "qualifiers": None, "subpath": ""}
    for nat, g in df.groupby("c_nationkey", sort=True):
        n = int(nat)
        h = md5(f"nation-{n}")
        sc = {"date": "2025-06-06",
              "repo": {"name": f"github.com/nations/nation-{n}",
                       "commit": h + h[:8]},
              "scorecard": {"version": "v5.0.0", "commit": "ab" * 20},
              "score": (n % 10) + 0.5,
              "checks": [{"name": "Maintained", "score": n % 11},
                         {"name": "License", "score": 10}]}
        deps, isdeps = [], []
        for r in g.itertuples():
            k = int(r.c_custkey)
            comp = {"CurrentPackage": pkg(f"customer-{k}", "1"),
                    "Source": ({"type": "git",
                                "namespace": "github.com/custs",
                                "name": f"cust-{k}", "tag": None,
                                "commit": None} if k % 2 == 0 else None),
                    "Scorecard": ({"checks": [{"check": "CI-Tests",
                                               "score": k % 11}],
                                   "aggregateScore": float(k % 10),
                                   "timeScanned": "2025-06-06T00:00:00Z",
                                   "scorecardVersion": "v5.0.0",
                                   "scorecardCommit": "cd" * 20}
                                  if k % 4 == 0 else None),
                    "DepPackages": None, "IsDepPackages": None,
                    "UpdateTime": "2025-06-06T01:00:00Z"}
            deps.append(comp)
            isdeps.append({"CurrentPackageInput": pkg(f"nation-{n}", "1"),
                           "DepPackageInput": pkg(f"customer-{k}", "1"),
                           "IsDependency": {"versionRange": "^1",
                                            "dependencyType": "DIRECT",
                                            "justification": "",
                                            "origin": "", "collector": ""}})
        dd = {"CurrentPackage": pkg(f"nation-{n}", "1"),
              "Source": {"type": "git", "namespace": "github.com/nations",
                         "name": f"nation-{n}", "tag": None, "commit": None},
              "Scorecard": {"checks": [{"check": "Maintained", "score": 7}],
                            "aggregateScore": 5.5,
                            "timeScanned": "2025-06-06T00:00:00Z",
                            "scorecardVersion": "v5.0.0",
                            "scorecardCommit": "ab" * 20},
              "DepPackages": deps, "IsDepPackages": isdeps,
              "UpdateTime": "2025-06-06T02:00:00Z"}
        for d, path in ((sc, f"{base}/n{n}-scorecard.json"),
                        (dd, f"{base}/n{n}-depsdev.json")):
            with open(path + ".tmp", "w") as f:
                _json.dump(d, f, sort_keys=True)
            os.replace(path + ".tmp", path)
    _fleet_commit(base, _fp)
    return base


def kg_depsdev_ingest(sf_dir: str):
    """Scorecard + deps.dev ingestion parity over the per-nation
    fleet through the mixed-directory content-sniffing reader
    (parser_scorecard.go / deps_dev.go semantics; props excluded as in
    kg_spdx_ingest — scorecard check payloads are covered by
    tests/test_ite6_parsers.py)."""
    from guac_ray.sources.spdx import read_documents_any
    from guac_ray.stages.assemble import dedup_exact

    fleet = _depsdev_fleet_for_sf(sf_dir)
    edges = read_documents_any(fleet).map_batches(
        lambda t: t.select(_SPDX_COLS), batch_format="pyarrow")
    return dedup_exact(edges, _SPDX_COLS, num_buckets=8)


def KG_DEPSDEV_INGEST_SQL(sf_dir: str) -> str:
    return """
WITH c AS (
  SELECT c_custkey AS k, c_nationkey AS n FROM customer
), nations AS (
  SELECT DISTINCT n, md5('nation-' || n) AS h FROM c
)
SELECT DISTINCT * FROM (
  -- scorecard document: nation repo with commit
  SELECT 'source' AS subj_type,
         'src:git/github.com/nations/nation-' || n || '/commit=' || h
             || substr(h, 1, 8) AS subj_key,
         'certify_scorecard' AS pred, 'scorecard' AS obj_type,
         'scorecard:src:git/github.com/nations/nation-' || n
             || '/commit=' || h || substr(h, 1, 8) AS obj_key,
         'ossf scorecard' AS justification
  FROM nations
  UNION ALL
  -- deps.dev: nation package → nation source
  SELECT 'package', 'pkg:generic/nation-' || n || '@1', 'has_source_at',
         'source', 'src:git/github.com/nations/nation-' || n,
         'collected via deps.dev'
  FROM nations
  UNION ALL
  -- ... nation source scorecard
  SELECT 'source', 'src:git/github.com/nations/nation-' || n,
         'certify_scorecard', 'scorecard',
         'scorecard:src:git/github.com/nations/nation-' || n,
         'collected via deps.dev'
  FROM nations
  UNION ALL
  -- ... even customers carry sources
  SELECT 'package', 'pkg:generic/customer-' || k || '@1', 'has_source_at',
         'source', 'src:git/github.com/custs/cust-' || k,
         'collected via deps.dev'
  FROM c WHERE k % 2 = 0
  UNION ALL
  -- ... every fourth customer also a scorecard
  SELECT 'source', 'src:git/github.com/custs/cust-' || k,
         'certify_scorecard', 'scorecard',
         'scorecard:src:git/github.com/custs/cust-' || k,
         'collected via deps.dev'
  FROM c WHERE k % 4 = 0
  UNION ALL
  -- ... one depends_on per customer
  SELECT 'package', 'pkg:generic/nation-' || n || '@1', 'depends_on',
         'package', 'pkg:generic/customer-' || k || '@1',
         'dependency collected via deps.dev'
  FROM c
)
"""


def q4_priority_check(sf_dir: str):
    """TPC-H Q4 shape (order-priority checking): the large-large SEMI
    join as a standalone relational entry — orders in a one-quarter
    window that have AT LEAST ONE returned lineitem, counted per
    priority. Both predicates push into their SCANs (the 75% of orders
    outside the window and the 67% non-returned lineitems never leave
    storage); the EXISTS is ``hash_join(how="semi")`` — only deduped
    right KEYS enter the exchange, so the shuffled payload is
    order-cardinality int64s on both sides, never lineitem rows; the
    priority count finalizes two-phase. Both sides grow with the
    corpus — the broadcast-set ``semi_join`` is deliberately NOT used."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    cut_lo = pd.Timestamp("1996-01-01")
    cut_hi = pd.Timestamp("1996-04-01")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_orderdate"],
                   filter=((pc.field("o_orderdate") >= cut_lo)
                           & (pc.field("o_orderdate") < cut_hi))
                   ).map_batches(
        lambda t: t.select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"],
               filter=(pc.field("l_returnflag") == "R")
               ).map_batches(
        lambda t: pa.table({"o_orderkey": t["l_orderkey"]}),
        batch_format="pyarrow")
    kept = hash_join(orders, li, on="o_orderkey",
                     exchange_dir=_exchange("q4"), how="semi",
                     num_buckets=8)
    return grouped_agg(kept, ["o_orderpriority"],
                       {"order_count": ("o_orderkey", "count")},
                       num_buckets=4)


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape (small-quantity-order revenue): the
    DECORRELATED average subquery — revenue of lineitems whose
    quantity is below 20% of their part's average quantity. The
    correlated ``avg(l_quantity) WHERE l_partkey = ...`` decorrelates
    into one per-part two-phase aggregate (partials move, not the
    fact table), and the fact re-scan joins that part-cardinality
    stats table through the co-partitioned fs-exchange hash join
    (parts grow with the corpus — never assumed broadcast-small). The
    threshold predicate is EXACT integer cross-multiplication —
    ``5·qty_cents·n < sum_qty_cents`` avoids the float division whose
    rounding the two engines would disagree on — and it runs fused
    inside the join's reduce tasks (``partial_fn``), so matched rows
    collapse to 2 int64s per task before re-entering the object
    store. Output one row ``(revenue_cents, n_rows)``."""
    from guac_ray.functions.joins import hash_join

    def prep(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "l_partkey": df.l_partkey.astype("int64"),
            "qc": cents(df.l_quantity),
            "ec": cents(df.l_extendedprice),
        }), preserve_index=False)

    def fact():
        return _read(sf_dir, "lineitem",
                     ["l_partkey", "l_quantity", "l_extendedprice"]
                     ).map_batches(prep, batch_format="pandas")

    stats = grouped_agg(fact(), ["l_partkey"],
                        {"qsum": ("qc", "sum"), "qn": ("qc", "count")},
                        num_buckets=8)

    def small(t: pa.Table) -> pa.Table:
        qc = t["qc"].to_numpy(zero_copy_only=False)
        qn = t["qn"].to_numpy(zero_copy_only=False)
        qs = t["qsum"].to_numpy(zero_copy_only=False)
        keep = 5 * qc * qn < qs
        ec = t["ec"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"rc": pa.array([int(ec.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    parts = hash_join(fact(), stats, on="l_partkey",
                      exchange_dir=_exchange("q17"), num_buckets=8,
                      partial_fn=small).to_pandas()
    return pa.table({
        "revenue_cents": pa.array([int(parts["rc"].sum())], pa.int64()),
        "n_rows": pa.array([int(parts["n"].sum())], pa.int64())})


Q17_SQL = """
WITH f AS (
  SELECT l_partkey,
         CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS qc,
         CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS ec
  FROM lineitem
), s AS (
  SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS qsum,
         CAST(count(*) AS BIGINT) AS qn
  FROM f GROUP BY l_partkey
)
SELECT CAST(coalesce(sum(f.ec), 0) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM f JOIN s USING (l_partkey)
WHERE 5 * f.qc * s.qn < s.qsum
"""


def q19_brand_band_revenue(sf_dir: str):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    an OR-of-conjuncts over fact×dimension attributes — three
    (brand, quantity-band) disjuncts, deliberately overlapping at the
    band edges as in the real Q19. The quantity ENVELOPE of the
    disjunction ([1, 30] — the union of the bands) pushes into the
    lineitem SCAN as a row-group prune even though the full predicate
    cannot; part's brand broadcasts once per actor (searchsorted) and
    the disjunction evaluates vectorized per batch; revenue flows as
    exact int64 cents partials to a driver fold. Output one row
    ``(revenue_cents, n_rows)``."""
    import pyarrow.compute as pc

    bands = [("Brand#1", 1.0, 11.0), ("Brand#2", 10.0, 20.0),
             ("Brand#3", 20.0, 30.0)]
    flt = ((pc.field("l_quantity") >= 1.0)
           & (pc.field("l_quantity") <= 30.0))
    pref = _bcast_df(sf_dir, "part", ["p_partkey", "p_brand"])

    class Bands:
        def __init__(self):
            p = ray.get(pref).sort_values("p_partkey")
            self.keys = p.p_partkey.to_numpy()
            self.brand = p.p_brand.to_numpy()

        def __call__(self, t: pa.Table) -> pa.Table:
            q = t["l_quantity"].to_numpy(zero_copy_only=False)
            b = self.brand[_dim_idx(
                self.keys,
                t["l_partkey"].to_numpy(zero_copy_only=False),
                "part dim")]
            keep = np.zeros(len(q), dtype=bool)
            for br, lo, hi in bands:
                keep |= (b == br) & (q >= lo) & (q <= hi)
            rc = cents(
                t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
                * (1 - t["l_discount"]
                   .to_numpy(zero_copy_only=False)[keep]))
            return pa.table({
                "rc": pa.array([int(rc.sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64())})

    parts = (_read(sf_dir, "lineitem",
                   ["l_partkey", "l_quantity", "l_extendedprice",
                    "l_discount"], filter=flt)
             .map_batches(Bands, batch_format="pyarrow",
                          concurrency=(1, 4))
             .to_pandas())
    return pa.table({
        "revenue_cents": pa.array([int(parts["rc"].sum())], pa.int64()),
        "n_rows": pa.array([int(parts["n"].sum())], pa.int64())})


Q19_SQL = """
SELECT CAST(coalesce(sum(CAST(floor(
           l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)), 0)
         AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
"""


def q22_dormant_customers(sf_dir: str):
    """TPC-H Q22 shape (global-sales-opportunity / dormant wealthy
    customers): the SCALAR subquery + large-large ANTI join —
    customers whose balance exceeds the average POSITIVE balance and
    who placed no order since 2000-01-01, grouped by nation. The
    scalar average folds as 2 int64 partials per batch (sum of
    positive cents, count) and the comparison is exact integer
    cross-multiplication (``bc·n > sum``) — no float average enters
    the contract. The NOT EXISTS is ``hash_join(how="anti")`` against
    the window-pruned orders scan: both sides are customer-cardinality
    and grow with the corpus, and only deduped custkeys enter the
    exchange. Output ``(c_nationkey, n_custs, bal_cents)``."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    # materialized ONCE: the positive-average fold and the rich filter
    # both consume the customer scan (dimension-cardinality — safe)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]).materialize()

    def pos_partial(df: pd.DataFrame) -> pa.Table:
        bc = cents(df.c_acctbal)
        pos = bc[df.c_acctbal.to_numpy() > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    parts = cust.map_batches(pos_partial, batch_format="pandas").to_pandas()
    s, n = int(parts["s"].sum()), int(parts["n"].sum())

    def rich(df: pd.DataFrame) -> pa.Table:
        bc = cents(df.c_acctbal)
        keep = bc * n > s
        return table_from_pandas(pd.DataFrame({
            "c_custkey": df.c_custkey[keep].astype("int64"),
            "c_nationkey": df.c_nationkey[keep].astype("int64"),
            "bc": bc[keep],
        }), preserve_index=False)

    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate")
                           >= pd.Timestamp("2000-01-01"))
                   ).map_batches(
        lambda t: pa.table({"c_custkey": t["o_custkey"]}),
        batch_format="pyarrow")
    dormant = hash_join(cust.map_batches(rich, batch_format="pandas"),
                        recent, on="c_custkey",
                        exchange_dir=_exchange("q22"), how="anti",
                        num_buckets=8)
    return grouped_agg(dormant, ["c_nationkey"],
                       {"n_custs": ("c_custkey", "count"),
                        "bal_cents": ("bc", "sum")}, num_buckets=4)


Q22_SQL = """
WITH pos AS (
  SELECT CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0
), rich AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bc
  FROM customer, pos
  WHERE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) * pos.n > pos.s
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(bc) AS BIGINT) AS bal_cents
FROM rich
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_nationkey
"""


def q16_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape (supplier variety per part class): COUNT
    DISTINCT over a derived part-supplier relation — there is no
    partsupp table here, so the relation is the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem (an fs-exchange
    ``dedup_exact`` — fact-scale in, pair-scale out). Part attributes
    (brand ≠ Brand#1, type ≠ PROMO, size ∈ squares) resolve by one
    broadcast searchsorted; the "complaint" supplier exclusion
    (negative balance) is a broadcast key set (suppliers are a true
    dimension). The distinct-supplier count is a SECOND exact dedup on
    (brand, type, size, suppkey) followed by a two-phase count — both
    shuffles move shrinking key tuples, never lineitem rows. Output
    ``(p_brand, p_type, p_size, supplier_cnt)``."""
    from guac_ray.stages.assemble import dedup_exact

    pref = _bcast_df(sf_dir, "part",
                     ["p_partkey", "p_brand", "p_type", "p_size"])
    sref = _bcast_df(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    sizes = (1, 4, 9, 16, 25, 36, 49)

    class ClassFilter:
        """Part/supplier predicates are functions of the KEYS alone,
        so they commute with the pair dedup — pushing them before the
        FIRST exchange keeps ~91% of lineitem out of it (brand/type/
        size keep ~9%; the class attributes ride along so the second
        dedup needs no rescan)."""

        def __init__(self):
            p = ray.get(pref).sort_values("p_partkey")
            self.pk = p.p_partkey.to_numpy()
            self.brand = p.p_brand.to_numpy()
            self.ptype = p.p_type.to_numpy()
            self.size = p.p_size.to_numpy().astype("int64")
            keep = ((self.brand != "Brand#1") & (self.ptype != "PROMO")
                    & np.isin(self.size, sizes))
            self.keep_part = keep
            sup = ray.get(sref)
            self.bad = np.sort(
                sup.s_suppkey[sup.s_acctbal < 0].to_numpy())

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            i = _dim_idx(self.pk, df.l_partkey.to_numpy(), "part dim")
            sk = df.l_suppkey.to_numpy().astype("int64")
            bad_i = np.searchsorted(self.bad, sk)
            is_bad = (bad_i < len(self.bad)) & (
                self.bad[np.minimum(bad_i, max(len(self.bad) - 1, 0))]
                == sk) if len(self.bad) else np.zeros(len(sk), bool)
            keep = self.keep_part[i] & ~is_bad
            return pd.DataFrame({
                "p_brand": self.brand[i][keep],
                "p_type": self.ptype[i][keep],
                "p_size": self.size[i][keep],
                "s_suppkey": sk[keep],
            })

    classed = dedup_exact(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]
              ).map_batches(ClassFilter, batch_format="pandas",
                            concurrency=(1, 4)),
        ["p_brand", "p_type", "p_size", "s_suppkey"], num_buckets=8)
    return grouped_agg(classed, ["p_brand", "p_type", "p_size"],
                       {"supplier_cnt": ("s_suppkey", "count")},
                       num_buckets=4)


Q16_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, CAST(p_size AS BIGINT)
"""


def q5_local_revenue(sf_dir: str):
    """TPC-H Q5 shape (local-supplier revenue per nation): the deep
    join whose defining trick is an EQUALITY between two different
    dimension paths — customer's nation (via orders) must equal
    supplier's nation (via lineitem). The 1996 order window pushes
    into the orders SCAN; lineitem ⋈ orders is the co-partitioned
    fs-exchange hash join (both fact-scale), and BOTH nation lookups +
    the equality filter + the per-nation revenue partial fuse into the
    join's reduce tasks (``partial_fn`` ray.gets the two broadcast key
    maps from shared memory once per task) — each reduce emits ≤ 25
    rows, so the nation-equality join never materializes at lineitem
    grain. Finalize: two-phase sum, nation names by one searchsorted.
    Output ``(n_name, revenue_cents)``."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "orderkey": df.l_orderkey,
            "suppkey": df.l_suppkey,
            "_rc": cents(df.l_extendedprice.to_numpy()
                         * (1 - df.l_discount.to_numpy())),
        }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(li_f, batch_format="pandas")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pc.field("o_orderdate")
                            >= pd.Timestamp("1996-01-01"))
                           & (pc.field("o_orderdate")
                              < pd.Timestamp("1997-01-01")))
                   ).map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"],
                            "custkey": t["o_custkey"]}),
        batch_format="pyarrow")

    cref = _bcast_df(sf_dir, "customer", ["c_custkey", "c_nationkey"],
                     sort_by="c_custkey")
    sref = _bcast_df(sf_dir, "supplier", ["s_suppkey", "s_nationkey"],
                     sort_by="s_suppkey")

    def local_partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)  # shared-memory read, once per reduce task
        sup = ray.get(sref)
        ck, cn = c.c_custkey.to_numpy(), c.c_nationkey.to_numpy()
        sk, sn = sup.s_suppkey.to_numpy(), sup.s_nationkey.to_numpy()
        cnat = cn[_dim_idx(
            ck, t["custkey"].to_numpy(zero_copy_only=False),
            "customer dim")]
        snat = sn[_dim_idx(
            sk, t["suppkey"].to_numpy(zero_copy_only=False),
            "supplier dim")]
        keep = cnat == snat
        g = (pd.DataFrame({
            "nationkey": cnat[keep].astype("int64"),
            "_rc": t["_rc"].to_numpy(zero_copy_only=False)[keep]})
            .groupby("nationkey", sort=False)._rc.sum().reset_index())
        return table_from_pandas(g, preserve_index=False)

    joined = hash_join(li, orders, on="orderkey",
                       exchange_dir=_exchange("q5"), num_buckets=8,
                       partial_fn=local_partial)
    per_nation = grouped_agg(joined, ["nationkey"],
                             {"revenue_cents": ("_rc", "sum")},
                             num_buckets=4)

    nref = _bcast_df(sf_dir, "nation", ["n_nationkey", "n_name"])

    class Names:
        def __init__(self):
            nat = ray.get(nref).sort_values("n_nationkey")
            self.nk = nat.n_nationkey.to_numpy()
            self.nm = nat.n_name.to_numpy()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            i = _dim_idx(self.nk, df.nationkey.to_numpy(), "nation dim")
            return pd.DataFrame({
                "n_name": self.nm[i],
                "revenue_cents": df.revenue_cents.astype("int64")})

    return per_nation.map_batches(Names, batch_format="pandas",
                                  concurrency=(1, 2))


Q5_LOCAL_SQL = """
WITH w AS (
  SELECT l_suppkey, o_custkey,
         CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
              AS BIGINT) AS rc
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1997-01-01'
)
SELECT n_name, CAST(sum(rc) AS BIGINT) AS revenue_cents
FROM w
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = c_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    double-correlated EXISTS / NOT EXISTS self-join — "late"
    (returned) lineitems in finalized orders where ANOTHER supplier
    shares the order but NO OTHER supplier is late (this corpus has no
    receipt/commit dates, so late maps to ``l_returnflag = 'R'``; the
    correlation structure — two self-subqueries on the fact table —
    is the point; cf. reference issue-certify patterns in
    ``SURVEY.md §2.5``). Decorrelated into ONE order-hash exchange: an
    order lives in one bucket, so per bucket a single lexsort +
    reduceat pass yields each order's distinct-supplier and
    distinct-LATE-supplier counts, and an order emits AT MOST ONE row
    — (orderkey, the sole late supplier, its late-row count) —
    collapsing lineitem grain before anything else moves. The
    ``o_orderstatus = 'F'`` gate is then a large-large SEMI join at
    ORDER cardinality (status pushed into the orders scan, deduped
    keys on the exchange); supplier + nation resolve as broadcast
    dimensions; top-100 by (numwait DESC, s_name) is a distributed
    sort+limit. Output ``(s_name, numwait)`` for NATION_3."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join
    from guac_ray.stages.assemble import fs_exchange_reduce, stable_hash

    def project(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "orderkey": df.l_orderkey.astype("int64"),
            "suppkey": df.l_suppkey.astype("int64"),
            "late": (df.l_returnflag.to_numpy() == "R").astype("int64"),
        })
        out["_bucket"] = (stable_hash(out, ["orderkey"])
                          % 16).astype("int64")
        return table_from_pandas(out, preserve_index=False)

    def sole_late(t: pa.Table) -> pa.Table:
        empty = pa.schema([("orderkey", pa.int64()),
                           ("suppkey", pa.int64()),
                           ("nw", pa.int64())]).empty_table()
        ok = t["orderkey"].to_numpy(zero_copy_only=False)
        n = len(ok)
        if n == 0:
            return empty
        sk = t["suppkey"].to_numpy(zero_copy_only=False)
        lt = t["late"].to_numpy(zero_copy_only=False)
        o = np.lexsort((sk, ok))
        ok, sk, lt = ok[o], sk[o], lt[o]
        # distinct (order, supplier) pairs, with per-pair late-row sums
        pair_start = np.ones(n, dtype=bool)
        pair_start[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        ps = np.flatnonzero(pair_start)
        late_per_pair = np.add.reduceat(lt, ps)
        p_ok, p_sk = ok[ps], sk[ps]
        m = len(ps)
        # per-order supplier / late-supplier counts over the pair table
        ord_start = np.ones(m, dtype=bool)
        ord_start[1:] = p_ok[1:] != p_ok[:-1]
        os_ = np.flatnonzero(ord_start)
        n_supp = np.diff(np.append(os_, m))
        late_pair = late_per_pair > 0
        n_late = np.add.reduceat(late_pair.astype("int64"), os_)
        oidx = np.cumsum(ord_start) - 1
        keep = late_pair & (n_supp[oidx] >= 2) & (n_late[oidx] == 1)
        if not keep.any():
            return empty
        return pa.table({
            "orderkey": pa.array(p_ok[keep].astype("int64")),
            "suppkey": pa.array(p_sk[keep].astype("int64")),
            "nw": pa.array(late_per_pair[keep].astype("int64")),
        })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_returnflag"]
               ).map_batches(project, batch_format="pandas")
    per_order = fs_exchange_reduce(li, _exchange("q21"), sole_late)
    if per_order is None:
        return rd.from_arrow(pa.schema(
            [("s_name", pa.string()),
             ("numwait", pa.int64())]).empty_table())

    fin = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"],
                filter=(pc.field("o_orderstatus") == "F")).map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"]}),
        batch_format="pyarrow")
    kept = hash_join(per_order, fin, on="orderkey",
                     exchange_dir=_exchange("q21s"), how="semi",
                     num_buckets=8)
    per_supp = grouped_agg(kept, ["suppkey"],
                           {"numwait": ("nw", "sum")}, num_buckets=4)

    sref = _bcast_df(sf_dir, "supplier",
                     ["s_suppkey", "s_name", "s_nationkey"])
    nref = _bcast_df(sf_dir, "nation", ["n_nationkey", "n_name"])

    class SuppName:
        def __init__(self):
            s = ray.get(sref).sort_values("s_suppkey")
            nat = ray.get(nref)
            nk = nat.n_nationkey[nat.n_name == "NATION_3"].to_numpy()
            self.keys = s.s_suppkey.to_numpy()
            self.names = s.s_name.to_numpy()
            self.in_nat = np.isin(s.s_nationkey.to_numpy(), nk)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            i = _dim_idx(self.keys, df.suppkey.to_numpy(), "supplier dim")
            keep = self.in_nat[i]
            # typed Arrow output — the q20 empty-nation schema rule
            return pa.table({
                "s_name": pa.array(self.names[i][keep], pa.string()),
                "numwait": pa.array(
                    df.numwait.to_numpy()[keep].astype("int64"),
                    pa.int64())})

    return (per_supp.map_batches(SuppName, batch_format="pandas",
                                 concurrency=(1, 2))
            .sort(["numwait", "s_name"], descending=[True, False])
            .limit(100))


Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (top supplier): the scalar MAX-of-aggregate
    subquery — per-supplier revenue over a one-quarter shipdate window
    (pushed into the scan), keeping the supplier(s) whose revenue
    EQUALS the global maximum. Revenue is exact int64 cents, so the
    max-equality is a true cross-engine contract (the float-revenue
    spelling of Q15 is not portable — ties on doubles are
    engine-dependent). The per-supplier table is supplier-cardinality:
    the max folds from per-batch partials on that small table and the
    filter is one vectorized compare — no second data-sized shuffle.
    Output ``(s_suppkey, s_name, total_revenue_cents)``."""
    import pyarrow.compute as pc

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")

    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "suppkey": df.l_suppkey.astype("int64"),
            "_rc": cents(df.l_extendedprice.to_numpy()
                         * (1 - df.l_discount.to_numpy())),
        }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"],
               filter=((pc.field("l_shipdate") >= lo)
                       & (pc.field("l_shipdate") < hi))
               ).map_batches(li_f, batch_format="pandas")
    per_supp = grouped_agg(li, ["suppkey"],
                           {"total_revenue_cents": ("_rc", "sum")},
                           num_buckets=4)
    empty = pa.schema([("s_suppkey", pa.int64()),
                       ("s_name", pa.string()),
                       ("total_revenue_cents", pa.int64())])
    # materialize the supplier-cardinality aggregate ONCE: both the
    # max fold and the filter pass consume it, and without this the
    # lazy lineage re-runs the windowed fact scan twice
    per_supp = per_supp.materialize()
    parts = per_supp.map_batches(
        lambda t: pa.table({"m": pa.array(
            [pc.max(t["total_revenue_cents"]).as_py()], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    if parts.empty or parts["m"].isna().all():
        # empty shipdate window: a typed empty result, not int(NaN)
        return empty.empty_table()
    best = int(parts["m"].max())

    sref = _bcast_df(sf_dir, "supplier", ["s_suppkey", "s_name"])

    class Best:
        def __init__(self):
            s = ray.get(sref).sort_values("s_suppkey")
            self.keys = s.s_suppkey.to_numpy()
            self.names = s.s_name.to_numpy()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hit = df[df.total_revenue_cents.to_numpy() == best]
            i = _dim_idx(self.keys, hit.suppkey.to_numpy(), "supplier dim")
            return pd.DataFrame({
                "s_suppkey": hit.suppkey.astype("int64"),
                "s_name": self.names[i],
                "total_revenue_cents":
                    hit.total_revenue_cents.astype("int64")})

    return per_supp.map_batches(Best, batch_format="pandas",
                                concurrency=(1, 2))


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue_cents
FROM rev JOIN supplier ON s_suppkey = suppkey
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
"""


def q12_priority_by_flag(sf_dir: str):
    """TPC-H Q12 shape (shipping-priority check): the CASE-based
    two-way conditional count over the fact-fact join — lineitems in a
    one-year shipdate window (pushed into the scan, ~15% of rows)
    join orders through the co-partitioned fs-exchange hash join, and
    the per-returnflag HIGH-priority (1-URGENT / 2-HIGH) vs
    lower-priority counts fold inside the join's reduce via
    ``partial_fn`` (the CASE is row-local per joined row, so
    probe-splitting stays safe) — each reduce emits ≤ 3 partial rows
    and the lineitem-grain join payload never re-enters the object
    store. The grouping label is ``l_returnflag`` (this corpus has no
    l_shipmode; the conditional-aggregate-over-a-join structure is the
    point). Output ``(l_returnflag, high_line_count, low_line_count)``."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"],
               filter=((pc.field("l_shipdate") >= lo)
                       & (pc.field("l_shipdate") < hi))
               ).map_batches(
        lambda t: pa.table({"orderkey": t["l_orderkey"],
                            "l_returnflag": t["l_returnflag"]}),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"],
                            "prio": t["o_orderpriority"]}),
        batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        pr = t["prio"].to_numpy(zero_copy_only=False)
        hi_ = np.isin(pr, ("1-URGENT", "2-HIGH")).astype("int64")
        g = (pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_numpy(
                zero_copy_only=False),
            "high_line_count": hi_, "low_line_count": 1 - hi_})
            .groupby("l_returnflag", sort=False).sum().reset_index())
        return table_from_pandas(g, preserve_index=False)

    joined = hash_join(li, orders, on="orderkey",
                       exchange_dir=_exchange("q12"), num_buckets=8,
                       partial_fn=partial)
    return grouped_agg(joined, ["l_returnflag"],
                       {"high_line_count": ("high_line_count", "sum"),
                        "low_line_count": ("low_line_count", "sum")},
                       num_buckets=2)


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1998-01-01'
GROUP BY l_returnflag
"""


def q7_nation_volume(sf_dir: str):
    """TPC-H Q7 shape (volume shipping between nation pairs): revenue
    flowing between TWO specific nations in EITHER direction
    (supplier-nation → customer-nation), per shipping year. The
    two-year shipdate window pushes into the lineitem SCAN; lineitem ⋈
    orders is the co-partitioned fs-exchange hash join with the pair
    filter, BOTH nation lookups and the (supp_nation, cust_nation,
    year) revenue partial fused into the join's reduce (the Q5
    discipline — broadcast key maps read from shared memory once per
    task, each reduce emitting ≤ 4 rows so the join never materializes
    at lineitem grain). Output ``(supp_nation, cust_nation, l_year,
    revenue_cents)``."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    pair = {"NATION_9", "NATION_6"}
    pair_keys = set(nat.n_nationkey[nat.n_name.isin(pair)].tolist())
    name_of = dict(zip(nat.n_nationkey, nat.n_name))

    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "orderkey": df.l_orderkey.astype("int64"),
            "suppkey": df.l_suppkey.astype("int64"),
            "l_year": df.l_shipdate.dt.year.astype("int64"),
            "_rc": cents(df.l_extendedprice.to_numpy()
                         * (1 - df.l_discount.to_numpy())),
        }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"],
               filter=((pc.field("l_shipdate") >= lo)
                       & (pc.field("l_shipdate") < hi))
               ).map_batches(li_f, batch_format="pandas")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]
                   ).map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"],
                            "custkey": t["o_custkey"]}),
        batch_format="pyarrow")

    cref = _bcast_df(sf_dir, "customer", ["c_custkey", "c_nationkey"],
                     sort_by="c_custkey")
    sref = _bcast_df(sf_dir, "supplier", ["s_suppkey", "s_nationkey"],
                     sort_by="s_suppkey")
    pk = np.array(sorted(pair_keys), dtype="int64")

    def pair_partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        sup = ray.get(sref)
        ck, cn = c.c_custkey.to_numpy(), c.c_nationkey.to_numpy()
        sk, sn = sup.s_suppkey.to_numpy(), sup.s_nationkey.to_numpy()
        cnat = cn[_dim_idx(
            ck, t["custkey"].to_numpy(zero_copy_only=False),
            "customer dim")]
        snat = sn[_dim_idx(
            sk, t["suppkey"].to_numpy(zero_copy_only=False),
            "supplier dim")]
        keep = (np.isin(snat, pk) & np.isin(cnat, pk)
                & (snat != cnat))
        if not keep.any():
            return pa.schema([("snat", pa.int64()), ("cnat", pa.int64()),
                              ("l_year", pa.int64()),
                              ("_rc", pa.int64())]).empty_table()
        g = (pd.DataFrame({
            "snat": snat[keep].astype("int64"),
            "cnat": cnat[keep].astype("int64"),
            "l_year": t["l_year"].to_numpy(zero_copy_only=False)[keep],
            "_rc": t["_rc"].to_numpy(zero_copy_only=False)[keep]})
            .groupby(["snat", "cnat", "l_year"], sort=False)
            ._rc.sum().reset_index())
        return table_from_pandas(g, preserve_index=False)

    joined = hash_join(li, orders, on="orderkey",
                       exchange_dir=_exchange("q7"), num_buckets=8,
                       partial_fn=pair_partial)
    # output cardinality is pairs (2) x window years (2) — a driver
    # fold over the <= buckets x 4 partial rows (the q6 discipline),
    # which also keeps the zero-match schema typed
    parts = joined.to_pandas()
    empty = pa.schema([("supp_nation", pa.string()),
                       ("cust_nation", pa.string()),
                       ("l_year", pa.int64()),
                       ("revenue_cents", pa.int64())]).empty_table()
    if parts.empty:
        return empty
    g = (parts.groupby(["snat", "cnat", "l_year"], as_index=False)
         ._rc.sum())
    return pa.table({
        "supp_nation": pa.array(g.snat.map(name_of), pa.string()),
        "cust_nation": pa.array(g.cnat.map(name_of), pa.string()),
        "l_year": pa.array(g.l_year.astype("int64")),
        "revenue_cents": pa.array(g._rc.astype("int64"))})


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
       OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
GROUP BY 1, 2, 3
"""


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape (national market share): the conditional-share
    aggregate over the deep join — of all revenue shipped to EUROPE
    customers in a two-year order window, the percentage supplied by
    NATION_3, per order year. The window pushes into the orders SCAN;
    lineitem ⋈ orders is the co-partitioned hash join with the
    customer-region filter, the supplier-nation flag and the per-year
    (nation_cents, total_cents) partials all fused into the join's
    reduce — each reduce emits ≤ 2 rows of 3 int64s. The share itself
    is ONE fixed-order double expression ``(100.0 * nation) / total``
    evaluated identically in both engines (the Q14 contract) — int64
    cents until the last operation. Output ``(o_year,
    mkt_share_pct)``."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    eur = set(nat.n_nationkey[nat.n_regionkey.isin(
        reg.r_regionkey[reg.r_name == "EUROPE"])].tolist())
    n3 = set(nat.n_nationkey[nat.n_name == "NATION_3"].tolist())
    eur_keys = np.array(sorted(eur), dtype="int64")
    n3_keys = np.array(sorted(n3), dtype="int64")

    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "orderkey": df.l_orderkey.astype("int64"),
            "suppkey": df.l_suppkey.astype("int64"),
            "_rc": cents(df.l_extendedprice.to_numpy()
                         * (1 - df.l_discount.to_numpy())),
        }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(li_f, batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pc.field("o_orderdate") >= lo)
                           & (pc.field("o_orderdate") < hi))
                   ).map_batches(
        lambda df: table_from_pandas(pd.DataFrame({
            "orderkey": df.o_orderkey.astype("int64"),
            "custkey": df.o_custkey.astype("int64"),
            "o_year": df.o_orderdate.dt.year.astype("int64")}),
            preserve_index=False),
        batch_format="pandas")

    cref = _bcast_df(sf_dir, "customer", ["c_custkey", "c_nationkey"],
                     sort_by="c_custkey")
    sref = _bcast_df(sf_dir, "supplier", ["s_suppkey", "s_nationkey"],
                     sort_by="s_suppkey")

    def share_partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        sup = ray.get(sref)
        ck, cn = c.c_custkey.to_numpy(), c.c_nationkey.to_numpy()
        sk, sn = sup.s_suppkey.to_numpy(), sup.s_nationkey.to_numpy()
        cnat = cn[_dim_idx(
            ck, t["custkey"].to_numpy(zero_copy_only=False),
            "customer dim")]
        snat = sn[_dim_idx(
            sk, t["suppkey"].to_numpy(zero_copy_only=False),
            "supplier dim")]
        keep = np.isin(cnat, eur_keys)
        if not keep.any():
            return pa.schema([("o_year", pa.int64()),
                              ("nat_cents", pa.int64()),
                              ("tot_cents", pa.int64())]).empty_table()
        rc = t["_rc"].to_numpy(zero_copy_only=False)[keep]
        is_n = np.isin(snat[keep], n3_keys).astype("int64")
        g = (pd.DataFrame({
            "o_year": t["o_year"].to_numpy(zero_copy_only=False)[keep],
            "nat_cents": rc * is_n, "tot_cents": rc})
            .groupby("o_year", sort=False).sum().reset_index())
        return table_from_pandas(g, preserve_index=False)

    joined = hash_join(li, orders, on="orderkey",
                       exchange_dir=_exchange("q8"), num_buckets=8,
                       partial_fn=share_partial)
    # output cardinality is window years (2) — driver fold over the
    # <= buckets x 2 partial rows (the q6 discipline)
    parts = joined.to_pandas()
    if parts.empty:
        return pa.schema([("o_year", pa.int64()),
                          ("mkt_share_pct", pa.float64())]).empty_table()
    g = parts.groupby("o_year", as_index=False).sum()
    # the SAME fixed-order double tree the SQL oracle evaluates
    pct = ((100.0 * g.nat_cents.to_numpy().astype("float64"))
           / g.tot_cents.to_numpy().astype("float64"))
    return pa.table({"o_year": pa.array(g.o_year.astype("int64")),
                     "mkt_share_pct": pa.array(pct, pa.float64())})


Q8_SQL = """
WITH w AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
              AS BIGINT) AS rc,
         CASE WHEN n1.n_name = 'NATION_3' THEN 1 ELSE 0 END AS is_n
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n2.n_regionkey AND r_name = 'EUROPE'
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1998-01-01')
SELECT o_year,
       (100.0 * CAST(sum(rc * is_n) AS DOUBLE))
         / CAST(sum(rc) AS DOUBLE) AS mkt_share_pct
FROM w GROUP BY o_year
"""


def events_user_pivot(sf_dir: str):
    """Long → wide pivot (``pivot_wide``): one row per user with an
    int64 count column per event type — the feature-matrix build
    every per-entity model (churn scoring, segment clustering, wide
    regressions) runs on an event log. Labels are EXPLICIT (the
    five-type schema is the oracle's contract — a corpus missing a
    type still emits its all-zero column); discovery mode is
    unit-tested separately. The exchange ships (user, type) cell partials,
    never events; per bucket one vectorized pivot + reindex fills
    absent cells with 0 (a user who never errored must read n_error=0,
    not NULL). Output ``(user_id, n_click, n_error, n_purchase,
    n_signup, n_view)``."""
    from guac_ray.stages.groupagg import pivot_wide

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    # labels EXPLICIT: the oracle hard-codes these five columns, so a
    # corpus missing one type must still emit its all-zero column
    # (discovery mode would make the SCHEMA data-dependent)
    return pivot_wide(ev, ["user_id"], "event_type",
                      labels=["click", "error", "purchase",
                              "signup", "view"],
                      exchange_base=_exchange("upivot"))


EVENTS_USER_PIVOT_SQL = """
SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def events_acf(sf_dir: str):
    """Per-type lag-k autocorrelation (``grouped_acf``): does the
    value series correlate with itself 1 / 2 / 3 events back, per
    event type — the seasonality/memory screen run before trend fits
    or forecasting. Values enter as exact cents; each (type, lag)
    cell is an ordinary grouped_corr over the n−k overlapping pairs
    with the SAME fixed-order double tree, so the oracle (one lagged
    CTE per k, the events_corr moment spelling) reproduces the
    doubles bit-exact. ONE type-hash exchange of 3 int64 columns +
    the label; pair moments complete in-bucket because a type lives
    in one bucket. Output ``(event_type, lag, n, acf)``."""
    from guac_ray.functions.stats import grouped_acf

    ev = _read(sf_dir, "events",
               ["event_type", "ts", "event_id", "value"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "ts": df["ts"],
            "event_id": df["event_id"].to_numpy().astype("int64"),
            "v": cents(df["value"]),
        })

    return grouped_acf(ev.map_batches(derive, batch_format="pandas"),
                       "event_type", "v", "ts", "event_id",
                       lags=(1, 2, 3),
                       exchange_base=_exchange("acf"), num_buckets=4)


_ACF_LAG_BLOCK = """
  SELECT event_type, {k} AS lag, v AS x,
         lead(v, {k}) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS y
  FROM t
"""

EVENTS_ACF_SQL = ("""
WITH t AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS v
  FROM events),
lagged AS (""" + " UNION ALL ".join(
    _ACF_LAG_BLOCK.format(k=k) for k in (1, 2, 3)) + """),
m AS (
  SELECT event_type, lag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         sum(x*x) AS sxx, sum(y*y) AS syy,
         min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
  FROM lagged WHERE y IS NOT NULL GROUP BY event_type, lag)
SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
  CASE WHEN mnx = mxx OR mny = mxy THEN 0.0 ELSE
    (CAST(sxy AS DOUBLE)
     - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
    / (sqrt(CAST(sxx AS DOUBLE)
            - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
       * sqrt(CAST(syy AS DOUBLE)
              - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                / CAST(n AS DOUBLE))) END AS acf
FROM m
""")


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape (minimum-cost supplier): the correlated
    MIN-subquery → per-group argmin JOIN-BACK — for every part of a
    target size class, the supplier(s) offering it at the lowest
    cost. There is no partsupp table here, so the part-supplier cost
    relation derives from lineitem: a part's cost at a supplier is
    the MINIMUM extended price that supplier ever shipped it at (the
    Q16 derived-relation discipline; exact cents so the argmin
    equality is a cross-engine contract). Plan: (partkey, suppkey) →
    min-cents via the bucketed two-phase aggregate (fact-scale in,
    pair-scale out); per-part min via a SECOND grouped_agg over the
    pair table; the argmin join-back is the co-partitioned hash join
    on partkey (both sides pair/part-cardinality — never assumed
    broadcast-small) keeping cost == part-min rows; part size/type
    filter and supplier/nation names resolve broadcast. Output
    ``(p_partkey, s_name, n_name, cost_cents)`` — ties keep ALL
    minimal suppliers."""
    from guac_ray.functions.joins import hash_join

    pref = _bcast_df(sf_dir, "part", ["p_partkey", "p_size", "p_type"])

    class ClassOnly:
        """The size/type predicate is a function of the partkey alone,
        so it commutes with the per-pair min and the per-part min —
        pushing it before the first exchange keeps ~99.7% of lineitem
        out of the cost aggregate (size=15 ∧ STANDARD)."""

        def __init__(self):
            p = ray.get(pref).sort_values("p_partkey")
            self.pk = p.p_partkey.to_numpy()
            self.keep_part = ((p.p_size.to_numpy() == 15)
                              & np.char.startswith(
                                  p.p_type.to_numpy().astype(str),
                                  "STANDARD"))

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            i = _dim_idx(self.pk, df.l_partkey.to_numpy(), "part dim")
            d = df[self.keep_part[i]]
            return table_from_pandas(pd.DataFrame({
                "p_partkey": d.l_partkey.astype("int64"),
                "suppkey": d.l_suppkey.astype("int64"),
                "_c": cents(d.l_extendedprice),
            }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"]
               ).map_batches(ClassOnly, batch_format="pandas",
                             concurrency=(1, 4))
    ps = grouped_agg(li, ["p_partkey", "suppkey"],
                     {"cost_cents": ("_c", "min")}, num_buckets=8)
    part_min = grouped_agg(ps, ["p_partkey"],
                           {"min_cents": ("cost_cents", "min")},
                           num_buckets=8)
    joined = hash_join(ps, part_min, on="p_partkey",
                       exchange_dir=_exchange("q2"), num_buckets=8)

    sref = _bcast_df(sf_dir, "supplier",
                     ["s_suppkey", "s_name", "s_nationkey"])
    nref = _bcast_df(sf_dir, "nation", ["n_nationkey", "n_name"])

    class Finish:
        def __init__(self):
            s = ray.get(sref).sort_values("s_suppkey")
            self.sk = s.s_suppkey.to_numpy()
            self.sname = s.s_name.to_numpy()
            self.snat = s.s_nationkey.to_numpy()
            nat = ray.get(nref).sort_values("n_nationkey")
            self.nk = nat.n_nationkey.to_numpy()
            self.nname = nat.n_name.to_numpy()

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            # the class filter already ran before the first exchange;
            # only the argmin keep + name resolution remain (typed
            # Arrow output — the q20 empty-schema rule)
            keep = df.cost_cents.to_numpy() == df.min_cents.to_numpy()
            d = df[keep]
            si = _dim_idx(self.sk, d.suppkey.to_numpy(),
                          "supplier dim")
            ni = _dim_idx(self.nk, self.snat[si], "nation dim")
            return pa.table({
                "p_partkey": pa.array(
                    d.p_partkey.to_numpy().astype("int64")),
                "s_name": pa.array(self.sname[si], pa.string()),
                "n_name": pa.array(self.nname[ni], pa.string()),
                "cost_cents": pa.array(
                    d.cost_cents.to_numpy().astype("int64"))})

    return joined.map_batches(Finish, batch_format="pandas",
                              concurrency=(1, 4))


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS suppkey,
         CAST(min(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS cost_cents
  FROM lineitem GROUP BY 1, 2)
SELECT ps.p_partkey, s_name, n_name, cost_cents
FROM ps
JOIN part ON part.p_partkey = ps.p_partkey
JOIN supplier ON s_suppkey = suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_size = 15 AND p_type LIKE 'STANDARD%'
  AND cost_cents = (SELECT min(cost_cents) FROM ps p2
                    WHERE p2.p_partkey = ps.p_partkey)
"""


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape (important stock identification): the
    RELATIVE-threshold HAVING — per-part total shipped value, keeping
    parts worth MORE THAN 1.2× THE AVERAGE part (TPC-H scales its
    fraction by SF for exactly this reason — a fixed share either
    keeps everything or nothing as the corpus grows; mean-relative
    adapts by construction). Both global scalars (total cents,
    distinct-part count) fold from the per-part table's partials
    (block-count-sized driver scalars — the q6 discipline); the
    HAVING is exact integer cross-multiplication
    (``v · n_parts · 10 > total · 12`` — no float share enters the
    contract, the q17/q22 discipline; int64 budget total ≤ 2⁶³/12n).
    The relative threshold is what separates this from a plain
    top-k: the cutoff adapts to the corpus instead of hardcoding a
    count. Output ``(p_partkey, value_cents)``."""
    def li_f(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(pd.DataFrame({
            "p_partkey": df.l_partkey.astype("int64"),
            "_v": cents(df.l_extendedprice.to_numpy()
                        * (1 - df.l_discount.to_numpy())),
        }), preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"]
               ).map_batches(li_f, batch_format="pandas")

    # materialized ONCE: the scalar fold and the HAVING filter both
    # consume the part-cardinality table — lazy lineage would re-run
    # the full fact scan for each
    per_part = grouped_agg(li, ["p_partkey"],
                           {"value_cents": ("_v", "sum")},
                           num_buckets=8).materialize()
    scalars = per_part.map_batches(
        lambda t: pa.table({
            "s": pa.array([int(t["value_cents"].to_numpy(
                zero_copy_only=False).sum())], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    total, n_parts = int(scalars["s"].sum()), int(scalars["n"].sum())

    def keep(t: pa.Table) -> pa.Table:
        v = t["value_cents"].to_numpy(zero_copy_only=False)
        # exact integer cross-multiplication: v > 1.2 * total/n_parts
        return t.filter(pa.array(v * n_parts * 10 > total * 12))

    return per_part.map_batches(keep, batch_format="pyarrow")


Q11_SQL = """
WITH pv AS (
  SELECT l_partkey AS p_partkey,
         CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem GROUP BY 1)
SELECT p_partkey, value_cents
FROM pv
WHERE value_cents * (SELECT count(*) FROM pv) * 10
      > (SELECT sum(value_cents) FROM pv) * 12
"""


def events_cume_nth(sf_dir: str):
    """cume_dist + nth_value (completing the SQL window-function
    surface): per user, each event's cumulative distribution over a
    deliberately tie-rich order key (event_type — cume_dist is
    tie-safe, peers share max-rank/n, so the result hashes
    deterministically), plus the user's 3rd event value in the
    tie-free (ts, event_id) order — NULL for users with fewer than
    three events. Values as exact cents; cume_dist's single division
    is the only double and evaluates identically in both engines."""
    from guac_ray.functions.window import windowed

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "ts", "value"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["vc"] = cents(df.pop("value"))
        return df

    w = windowed(ev.map_batches(derive, batch_format="pandas"),
                 by="user_id", order=["event_type"],
                 ops={"cd": ("cume_dist",)},
                 exchange_base=_exchange("window_cume"), num_buckets=8)
    w2 = windowed(w, by="user_id", order=["ts", "event_id"],
                  ops={"third_vc": ("nth_value", "vc", 3)},
                  exchange_base=_exchange("window_nth"), num_buckets=8)
    return w2.select_columns(["event_id", "cd", "third_vc"])


EVENTS_CUME_NTH_SQL = """
SELECT event_id,
       cume_dist() OVER (PARTITION BY user_id ORDER BY event_type)
         AS cd,
       CAST(nth_value(CAST(floor(value*100 + 0.5) AS BIGINT), 3)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING) AS DOUBLE) AS third_vc
FROM events
"""


def q9_product_profit(sf_dir: str):
    """TPC-H Q9 shape (product-type profit): the THREE-fact join chain
    — profit per supplier nation per order year over a part class,
    where profit = revenue − supply cost × quantity. Supply cost
    derives from lineitem as the per-(part, supplier) minimum price
    (the Q2/Q16 derived-relation discipline) — that table is
    pair-cardinality and GROWS with the corpus, so it joins through
    the first co-partitioned hash join on the COMPOSITE key
    (p_partkey, suppkey) — the suite's only multi-column fact-fact
    exchange; the part-class filter (ECONOMY) prunes via one
    broadcast before anything shuffles. The second hash join brings
    in the order year, with the supplier-nation lookup and the
    (nation, year) profit partial fused into its reduce (the Q5
    discipline). All arithmetic is exact int64: profit_cents =
    Σ(rc − cost_cents·qty), |cost·qty| ≤ 5·10⁸/row. Output
    ``(n_name, o_year, profit_cents)``."""
    from guac_ray.functions.joins import hash_join

    pref = _bcast_df(sf_dir, "part", ["p_partkey", "p_type"])
    sref = _bcast_df(sf_dir, "supplier", ["s_suppkey", "s_nationkey"],
                     sort_by="s_suppkey")

    class EconomyOnly:
        def __init__(self):
            p = ray.get(pref).sort_values("p_partkey")
            self.pk = p.p_partkey.to_numpy()
            self.econ = (p.p_type.to_numpy().astype(str) == "ECONOMY")

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            i = _dim_idx(self.pk, df.l_partkey.to_numpy(), "part dim")
            keep = self.econ[i]
            d = df[keep]
            return pd.DataFrame({
                "p_partkey": d.l_partkey.astype("int64"),
                "suppkey": d.l_suppkey.astype("int64"),
                "orderkey": d.l_orderkey.astype("int64"),
                "qty": d.l_quantity.to_numpy().astype("int64"),
                "_rc": cents(d.l_extendedprice.to_numpy()
                             * (1 - d.l_discount.to_numpy())),
            })

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
                "l_extendedprice", "l_discount"]
               ).map_batches(EconomyOnly, batch_format="pandas",
                             concurrency=(1, 4))

    class PsEconomy:
        """Cost-relation scan ALSO prunes to the part class: a pair's
        part class is fixed, so min-over-ECONOMY-rows for ECONOMY
        pairs equals min-over-all-rows for those pairs — 5/6 of
        lineitem never enters the cost aggregate or its exchange, and
        the SQL oracle (ps over all lineitem, join restricted to
        ECONOMY) computes the identical minima."""

        def __init__(self):
            p = ray.get(pref).sort_values("p_partkey")
            self.pk = p.p_partkey.to_numpy()
            self.econ = p.p_type.to_numpy().astype(str) == "ECONOMY"

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            i = _dim_idx(self.pk, df.l_partkey.to_numpy(), "part dim")
            d = df[self.econ[i]]
            return table_from_pandas(pd.DataFrame({
                "p_partkey": d.l_partkey.astype("int64"),
                "suppkey": d.l_suppkey.astype("int64"),
                "_c": cents(d.l_extendedprice),
            }), preserve_index=False)

    ps = grouped_agg(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice"]
              ).map_batches(PsEconomy, batch_format="pandas",
                            concurrency=(1, 4)),
        ["p_partkey", "suppkey"], {"cost_cents": ("_c", "min")},
        num_buckets=8)

    with_cost = hash_join(li, ps, on=["p_partkey", "suppkey"],
                          exchange_dir=_exchange("q9c"), num_buckets=8)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]
                   ).map_batches(
        lambda df: table_from_pandas(pd.DataFrame({
            "orderkey": df.o_orderkey.astype("int64"),
            "o_year": df.o_orderdate.dt.year.astype("int64")}),
            preserve_index=False),
        batch_format="pandas")

    def profit_partial(t: pa.Table) -> pa.Table:
        sup = ray.get(sref)
        sk, sn = sup.s_suppkey.to_numpy(), sup.s_nationkey.to_numpy()
        snat = sn[_dim_idx(
            sk, t["suppkey"].to_numpy(zero_copy_only=False),
            "supplier dim")]
        profit = (t["_rc"].to_numpy(zero_copy_only=False)
                  - t["cost_cents"].to_numpy(zero_copy_only=False)
                  * t["qty"].to_numpy(zero_copy_only=False))
        g = (pd.DataFrame({
            "nationkey": snat.astype("int64"),
            "o_year": t["o_year"].to_numpy(zero_copy_only=False),
            "_p": profit})
            .groupby(["nationkey", "o_year"], sort=False)
            ._p.sum().reset_index())
        return table_from_pandas(g, preserve_index=False)

    joined = hash_join(with_cost, orders, on="orderkey",
                       exchange_dir=_exchange("q9o"), num_buckets=8,
                       partial_fn=profit_partial)
    per_cell = grouped_agg(joined, ["nationkey", "o_year"],
                           {"profit_cents": ("_p", "sum")},
                           num_buckets=2)

    nref = _bcast_df(sf_dir, "nation", ["n_nationkey", "n_name"])

    class Names:
        def __init__(self):
            nat = ray.get(nref).sort_values("n_nationkey")
            self.nk = nat.n_nationkey.to_numpy()
            self.nm = nat.n_name.to_numpy()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            i = _dim_idx(self.nk, df.nationkey.to_numpy(), "nation dim")
            return pd.DataFrame({
                "n_name": self.nm[i],
                "o_year": df.o_year.astype("int64"),
                "profit_cents": df.profit_cents.astype("int64")})

    return per_cell.map_batches(Names, batch_format="pandas",
                                concurrency=(1, 2))


Q9_SQL = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(min(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS cost_cents
  FROM lineitem GROUP BY 1, 2)
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5)
                     AS BIGINT)
                - cost_cents * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS profit_cents
FROM lineitem
JOIN ps ON pk = l_partkey AND sk = l_suppkey
JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1, 2
"""


def q20_surge_suppliers(sf_dir: str):
    """TPC-H Q20 shape (potential part promotion): the nested
    correlated-IN reduced to a pair-grain join + half-sum threshold —
    for NATION_9 suppliers and ECONOMY parts, how many of the
    supplier's parts SURGED in 1996 (the year's shipped quantity
    exceeds half the pair's lifetime quantity; TPC-H compares
    availqty against half the yearly volume — this corpus has no
    stock table, so the same correlated structure runs lifetime vs
    window, and since bare membership saturates here — every supplier
    has SOME surging part — the output keeps the per-supplier COUNT
    instead of the semi-join bit, which preserves the shape and the
    information). Plan: TWO pair-grain aggregates (lifetime, and the
    window-pruned 1996 scan) meet in the co-partitioned COMPOSITE-key
    hash join (both sides pair-cardinality — the Q9 exchange); the
    part-class filter is one broadcast BEFORE the count; the
    threshold is exact integer cross-multiplication (2·q96 > q, no
    float ratio); the per-supplier count is one more shrinking
    aggregate; nation/names broadcast. Output ``(s_name,
    n_surge_parts)``."""
    import pyarrow.compute as pc

    from guac_ray.functions.joins import hash_join

    pref = _bcast_df(sf_dir, "part", ["p_partkey", "p_type"])

    class EconomyQty:
        """The part-class predicate is a function of the partkey
        alone, so it commutes with both pair aggregates — pushing it
        before the exchanges keeps ~83% of lineitem out of them."""

        def __init__(self):
            p = ray.get(pref).sort_values("p_partkey")
            self.pk = p.p_partkey.to_numpy()
            self.econ = p.p_type.to_numpy().astype(str) == "ECONOMY"

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            i = _dim_idx(self.pk, df.l_partkey.to_numpy(), "part dim")
            d = df[self.econ[i]]
            return table_from_pandas(pd.DataFrame({
                "pk": d.l_partkey.astype("int64"),
                "sk": d.l_suppkey.astype("int64"),
                "q": d.l_quantity.to_numpy().astype("int64"),
            }), preserve_index=False)

    tot = grouped_agg(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity"]
              ).map_batches(EconomyQty, batch_format="pandas",
                            concurrency=(1, 4)),
        ["pk", "sk"], {"q": ("q", "sum")}, num_buckets=8)
    w96 = grouped_agg(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
              filter=((pc.field("l_shipdate")
                       >= pd.Timestamp("1996-01-01"))
                      & (pc.field("l_shipdate")
                         < pd.Timestamp("1997-01-01")))
              ).map_batches(EconomyQty, batch_format="pandas",
                            concurrency=(1, 4)),
        ["pk", "sk"], {"q96": ("q", "sum")}, num_buckets=8)

    joined = hash_join(tot, w96, on=["pk", "sk"],
                       exchange_dir=_exchange("q20"), num_buckets=8)

    def surge_filter(df: pd.DataFrame) -> pd.DataFrame:
        # the class filter already ran before both exchanges; only
        # the half-sum threshold remains
        keep = 2 * df.q96.to_numpy() > df.q.to_numpy()
        d = df[keep]
        return pd.DataFrame({"sk": d.sk.astype("int64"),
                             "pk": d.pk.astype("int64")})

    surge = joined.map_batches(surge_filter, batch_format="pandas")
    per_supp = grouped_agg(surge, ["sk"],
                           {"n_surge_parts": ("pk", "count")},
                           num_buckets=4)

    sref = _bcast_df(sf_dir, "supplier",
                     ["s_suppkey", "s_name", "s_nationkey"])
    nref = _bcast_df(sf_dir, "nation", ["n_nationkey", "n_name"])

    class SuppNames:
        def __init__(self):
            s = ray.get(sref).sort_values("s_suppkey")
            nat = ray.get(nref)
            nk = nat.n_nationkey[nat.n_name == "NATION_9"].to_numpy()
            self.keys = s.s_suppkey.to_numpy()
            self.names = s.s_name.to_numpy()
            self.in_nat = np.isin(s.s_nationkey.to_numpy(), nk)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            i = _dim_idx(self.keys, df.sk.to_numpy(), "supplier dim")
            keep = self.in_nat[i]
            # typed Arrow output: an EMPTY pandas frame with an object
            # string column loses its schema in the block layer (the
            # sf0.001 zero-supplier nation is a legit empty result)
            return pa.table({
                "s_name": pa.array(self.names[i][keep], pa.string()),
                "n_surge_parts": pa.array(
                    df.n_surge_parts.to_numpy()[keep].astype("int64"),
                    pa.int64())})

    out = per_supp.map_batches(SuppNames, batch_format="pandas",
                               concurrency=(1, 2)).to_pandas()
    if out.empty:
        # Ray's to_pandas drops columns on a fully-empty Dataset (the
        # neardup_embeddings rule); the zero-supplier nation at
        # sf0.001 is a legit empty result. Output is bounded by the
        # supplier dimension, so the materialization is driver-safe.
        return pd.DataFrame({
            "s_name": pd.Series(dtype="object"),
            "n_surge_parts": pd.Series(dtype="int64")})
    return out


Q20_SQL = """
WITH tot AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
w AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q96
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1997-01-01'
  GROUP BY 1, 2)
SELECT s_name, CAST(count(*) AS BIGINT) AS n_surge_parts
FROM tot
JOIN w ON w.pk = tot.pk AND w.sk = tot.sk
JOIN part ON p_partkey = tot.pk AND p_type = 'ECONOMY'
JOIN supplier ON s_suppkey = tot.sk
JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_9'
WHERE 2 * q96 > q
GROUP BY s_name
"""


def events_value_hist(sf_dir: str):
    """Equi-WIDTH histogram per event type (``width_bucket``): the
    fixed-bin complement of events_quantile_buckets' equi-DEPTH cut —
    distribution plots, drift monitors and alerting thresholds bin on
    fixed edges so counts are comparable ACROSS runs (quantile edges
    move with the data). Bins are integer arithmetic on exact cents —
    ``b = clip(vc // 2500, 0, 11)`` (25-dollar bins, top bin
    open-ended) — so bucket assignment is a cross-engine contract
    with no float edge ambiguity; the aggregate is one two-phase
    (type, bin) count with in-batch combine (the shuffle ships
    type × bin × block partials). Zero-count bins drop (matching
    GROUP BY; the spine idiom fills them when a consumer needs
    density). Output ``(event_type, bin, n)``."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def to_bins(df: pd.DataFrame) -> pa.Table:
        vc = cents(df["value"])
        b = np.clip(vc // 2500, 0, 11)
        g = (pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                           "bin": b.astype("int64")})
             .groupby(["event_type", "bin"], sort=False)
             .size().reset_index(name="c"))
        return table_from_pandas(g, preserve_index=False)

    return grouped_agg(ev.map_batches(to_bins, batch_format="pandas"),
                       ["event_type", "bin"], {"n": ("c", "sum")},
                       num_buckets=4)


EVENTS_VALUE_HIST_SQL = """
SELECT event_type,
       CAST(least(CAST(floor(value*100 + 0.5) AS BIGINT) // 2500, 11)
            AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
"""


def events_share_of_type(sf_dir: str):
    """ratio_to_report / share-of-total: each event type's share of
    the corpus' total value — the composition snapshot every mix
    dashboard opens with. Numerator and denominator are exact int64
    cents from ONE two-phase aggregate (the denominator is the fold
    of the same per-type table — no second scan), and the share is
    ONE fixed-order double ``cents / total`` evaluated identically in
    both engines (the Q8/Q14 contract). Output ``(event_type,
    value_cents, share)``."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def part(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                           "_v": cents(df["value"])})
             .groupby("event_type", sort=False)._v.sum().reset_index())
        return table_from_pandas(g, preserve_index=False)

    per_type = grouped_agg(ev.map_batches(part, batch_format="pandas"),
                           ["event_type"], {"value_cents": ("_v", "sum")},
                           num_buckets=2).to_pandas()
    if per_type.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "value_cents": pa.array([], pa.int64()),
                         "share": pa.array([], pa.float64())})
    total = int(per_type.value_cents.sum())
    # the SAME fixed-order double tree the SQL oracle evaluates
    share = (per_type.value_cents.to_numpy().astype("float64")
             / float(total))
    return pa.table({
        "event_type": pa.array(per_type.event_type, pa.string()),
        "value_cents": pa.array(
            per_type.value_cents.to_numpy().astype("int64")),
        "share": pa.array(share, pa.float64())})


EVENTS_SHARE_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1)
SELECT event_type, value_cents,
       CAST(value_cents AS DOUBLE)
         / CAST((SELECT sum(value_cents) FROM t) AS DOUBLE) AS share
FROM t
"""


def events_ab_ttest(sf_dir: str):
    """Welch's unequal-variance t-test of every event type against the
    'view' control (functions/stats.py ``welch_ttest``) — the
    A/B-experiment readout run straight on the event stream. Exact
    int64 moments (n, Σv, Σv²) through the two-phase aggregate; mean,
    sample variance, t and the Welch–Satterthwaite df evaluate in ONE
    fixed double order mirrored by the oracle, so every double is
    bit-exact. Constant groups pin var 0.0; zero-se² pairs pin
    t = df = 0.0 (the grouped_corr rule)."""
    from guac_ray.functions.stats import welch_ttest

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "v": cents(df["value"])})

    return welch_ttest(ds.map_batches(keyed, batch_format="pandas"),
                       "event_type", "v", "view", num_buckets=4)


EVENTS_AB_TTEST_SQL = """
WITH t AS (
  SELECT event_type AS g,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS v
  FROM events
), m AS (
  SELECT g, count(*) AS n, sum(v) AS sv, sum(v*v) AS svv,
         min(v) AS mn, max(v) AS mx
  FROM t GROUP BY g
), st AS (
  SELECT g, CAST(n AS BIGINT) AS n,
         CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CASE WHEN mn = mx THEN 0.0 ELSE
           (CAST(svv AS DOUBLE)
            - (CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
              / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0) END AS var
  FROM m WHERE n >= 2
), c AS (SELECT * FROM st WHERE g = 'view')
SELECT s.g AS event_type, s.n, s.mean,
       c.n AS n_control, c.mean AS mean_control,
       CASE WHEN s.var / CAST(s.n AS DOUBLE)
                 + c.var / CAST(c.n AS DOUBLE) = 0.0 THEN 0.0
            ELSE (s.mean - c.mean)
                 / sqrt(s.var / CAST(s.n AS DOUBLE)
                        + c.var / CAST(c.n AS DOUBLE)) END AS t_stat,
       CASE WHEN s.var / CAST(s.n AS DOUBLE)
                 + c.var / CAST(c.n AS DOUBLE) = 0.0 THEN 0.0
            ELSE ((s.var / CAST(s.n AS DOUBLE)
                   + c.var / CAST(c.n AS DOUBLE))
                  * (s.var / CAST(s.n AS DOUBLE)
                     + c.var / CAST(c.n AS DOUBLE)))
                 / (((s.var / CAST(s.n AS DOUBLE))
                     * (s.var / CAST(s.n AS DOUBLE)))
                    / (CAST(s.n AS DOUBLE) - 1.0)
                    + ((c.var / CAST(c.n AS DOUBLE))
                       * (c.var / CAST(c.n AS DOUBLE)))
                      / (CAST(c.n AS DOUBLE) - 1.0)) END AS df
FROM st s, c WHERE s.g <> 'view'
"""


def events_mannwhitney(sf_dir: str):
    """Mann–Whitney U rank-sum test (functions/stats.py
    ``mann_whitney_u``) of purchase vs click value distributions — the
    non-parametric A/B readout for skewed values where welch_ttest's
    normality assumption fails. One two-phase aggregate at (value,
    group) grain (the quantile-histogram shape); the driver folds the
    distinct-value table: tie-averaged ranks as exact integers
    (``u_a_x2 = 2·U`` keeps odd halves integral), the tie term
    Σ(t³−t) in arbitrary-precision ints (HUGEINT in the oracle), and
    the tie-corrected z in one fixed double order — bit-exact."""
    from guac_ray.functions.stats import mann_whitney_u

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "v": cents(df["value"])})

    return mann_whitney_u(ds.map_batches(keyed, batch_format="pandas"),
                          "event_type", "v", "purchase", "click",
                          num_buckets=4)


EVENTS_MANNWHITNEY_SQL = """
WITH t AS (
  SELECT event_type AS g,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'click')
), h AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM t GROUP BY v
), r AS (
  SELECT v, ca, cb, ca + cb AS tt,
         COALESCE(sum(ca + cb) OVER (
             ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS cum_before
  FROM h
), agg AS (
  SELECT CAST(sum(ca) AS HUGEINT) AS na,
         CAST(sum(cb) AS HUGEINT) AS nb,
         CAST(sum(ca * (2*cum_before + tt + 1)) AS HUGEINT) AS ra2,
         CAST(sum(CAST(tt AS HUGEINT)*tt*tt - tt) AS HUGEINT) AS tie
  FROM r
), u AS (
  SELECT na, nb, ra2 - na*(na+1) AS ua2, tie FROM agg
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(ua2 AS BIGINT) AS u_a_x2,
       CAST(2*na*nb - ua2 AS BIGINT) AS u_b_x2,
       CASE WHEN (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                 * ((CAST(na + nb AS DOUBLE) + 1.0)
                    - CAST(tie AS DOUBLE)
                      / (CAST(na + nb AS DOUBLE)
                         * (CAST(na + nb AS DOUBLE) - 1.0))) = 0.0
            THEN 0.0
            ELSE (CAST(ua2 AS DOUBLE)
                  - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                 / (2.0 * sqrt(
                     (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                     * ((CAST(na + nb AS DOUBLE) + 1.0)
                        - CAST(tie AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * (CAST(na + nb AS DOUBLE) - 1.0)))))
       END AS z_stat
FROM u
"""


def events_mv_refresh(sf_dir: str):
    """INCREMENTAL materialized-view maintenance (stages/groupagg.py
    ``mv_refresh``): the per-(user, type) count/sum MV built over the
    table's FIRST epoch-half refreshes against a signed changelog —
    second-half rows as inserts, plus deletes replaying the ~10% of
    first-half rows whose md5(event_id) first byte < 0x19 (the
    train_test_split discipline, so the delete set is deterministic in
    both engines and every delete targets a row the base really
    holds). The base MV is never rescanned at fact grain; the
    changelog pre-combines per batch; groups refreshed to n == 0 drop
    exactly as a recompute would. The oracle IS that recompute: one
    scan weighting deleted base rows 0, everything else 1 — bit-equal
    counts and cents prove delta maintenance ≡ full rebuild."""
    from guac_ray.pipelines.curation import md5_first_byte
    from guac_ray.stages.groupagg import mv_refresh
    import pyarrow.compute as pc

    t_us = _ts_midpoint_us(sf_dir, "events_mv_refresh")

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def base_rows(df: pd.DataFrame) -> pa.Table:
        tu = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        m = tu < t_us
        # Arrow out: a fully-filtered batch leaves a 0-row OBJECT
        # column that Ray's pandas size estimator warns on per batch
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy()[m],
                                pa.int64()),
            "event_type": pa.array(df["event_type"].to_numpy()[m],
                                   pa.string()),
            "v": pa.array(cents(df["value"])[m], pa.int64())})

    base_mv = grouped_agg(
        ds.map_batches(base_rows, batch_format="pandas"),
        ["user_id", "event_type"],
        {"n": ("v", "count"), "value_cents": ("v", "sum")},
        num_buckets=8)

    def changelog(df: pd.DataFrame) -> pa.Table:
        tu = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        second = tu >= t_us
        deleted = (~second) & (md5_first_byte(
            df["event_id"].to_numpy()) < 0x19)
        keep = second | deleted
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy()[keep],
                                pa.int64()),
            "event_type": pa.array(df["event_type"].to_numpy()[keep],
                                   pa.string()),
            "sign": pa.array(np.where(second[keep], 1, -1)
                             .astype("int64")),
            "v": pa.array(cents(df["value"])[keep], pa.int64())})

    return mv_refresh(
        base_mv, ds.map_batches(changelog, batch_format="pandas"),
        ["user_id", "event_type"], "n", {"value_cents": "v"},
        exchange_base=_exchange("mvrefresh"), num_buckets=8)


EVENTS_MV_REFRESH_SQL = """
WITH c AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS t FROM events
), w AS (
  SELECT user_id, event_type,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
         CASE WHEN epoch_us(ts) >= c.t THEN 1
              WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '19'
                THEN 0
              ELSE 1 END AS wgt
  FROM events, c
)
SELECT user_id, event_type, CAST(sum(wgt) AS BIGINT) AS n,
       CAST(sum(wgt*v) AS BIGINT) AS value_cents
FROM w GROUP BY user_id, event_type
HAVING sum(wgt) <> 0
"""


def events_user_ewma(sf_dir: str):
    """Per-user fixed-point EWMA (functions/streams.py ``ewma``,
    α = 1/2, scale 10⁶): the streaming smoother whose every step
    depends on the previous smoothed value — an order-sensitive
    recurrence no GROUP BY or window frame expresses. Exact int64
    floor-division recurrence, bit-identical under any partitioning;
    the oracle is the IDENTICAL recurrence as a recursive CTE stepping
    each user's stream in (ts, event_id) order (iteration count = max
    stream length, not row count). Nonnegative cents only — numpy
    floors, SQL truncates, they agree at ≥ 0 (guarded loudly)."""
    from guac_ray.functions.streams import ewma

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def vc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["v"] = cents(df["value"])
        return df.drop(columns=["value"])

    return ewma(ds.map_batches(vc, batch_format="pandas"), "v",
                exchange_base=_exchange("ewma"), num_buckets=8)


EVENTS_USER_EWMA_SQL = """
WITH RECURSIVE t AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events WHERE ts IS NOT NULL
), rec AS (
  SELECT user_id, rn, v * 1000000 AS e FROM t WHERE rn = 1
  UNION ALL
  SELECT t.user_id, t.rn, (1 * t.v * 1000000 + 1 * r.e) // 2
  FROM rec r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1
)
SELECT user_id, CAST(max(rn) AS BIGINT) AS n_events,
       CAST(max_by(e, rn) AS BIGINT) AS ewma_fp
FROM rec GROUP BY user_id
"""


def events_hdr_quantiles(sf_dir: str):
    """HDR-histogram quantile sketch (functions/sketch.py
    ``hdr_quantiles``): p50/p90/p99 of value cents with guaranteed
    relative error < 1/64 from a CONSTANT-size count table — the
    scale path past the exact quantile machinery's distinct_cap
    (sketch state is ≤ 54·64 buckets at ANY cardinality). Bucketing
    is integer-exact (exponent via float64 frexp here ≡
    length(bin(v))−1 in the oracle — no float log anywhere), merging
    is integer addition, so the sketch is bit-identical under any
    partitioning and the APPROXIMATE estimator is EXACTLY
    verifiable."""
    from guac_ray.functions.sketch import hdr_quantiles

    ds = _read(sf_dir, "events", ["value"])

    def vc(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": cents(df["value"])})

    return hdr_quantiles(ds.map_batches(vc, batch_format="pandas"),
                         "v", pcts=(50, 90, 99), m=64, num_buckets=4)


EVENTS_HDR_QUANTILES_SQL = """
WITH t AS (
  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS v FROM events
), b AS (
  SELECT CASE WHEN v = 0 THEN -1 ELSE length(bin(v)) - 1 END AS e,
         CASE WHEN v = 0 THEN 0
              ELSE ((v - (1::BIGINT << (length(bin(v)) - 1))) * 64)
                   >> (length(bin(v)) - 1) END AS sub,
         CAST(count(*) AS BIGINT) AS n
  FROM t GROUP BY 1, 2
), c AS (
  SELECT e, sub, n,
         sum(n) OVER (ORDER BY e, sub) AS cum,
         CASE WHEN e < 0 THEN 0
              ELSE (1::BIGINT << e) + ((sub << e) // 64) END AS lower
  FROM b
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM b),
p AS (SELECT unnest([50, 90, 99]) AS pct)
SELECT CAST(pct AS BIGINT) AS pct,
       CAST((pct * tot.nt + 99) // 100 AS BIGINT) AS rank,
       (SELECT CAST(c.lower AS BIGINT) FROM c
        WHERE c.cum >= (pct * tot.nt + 99) // 100
        ORDER BY c.e, c.sub LIMIT 1) AS est
FROM p, tot
"""


def events_ab_conversion(sf_dir: str):
    """Two-proportion conversion z-test (functions/stats.py
    ``two_proportion_ztest``): users md5-split 50/50 into variants
    'a'/'b' (the train_test_split discipline — deterministic in both
    engines), conversion = the user produced ≥ 1 purchase event;
    variant 'b' tests against control 'a'. The binary-outcome member
    of the experimentation family: exact int64 unit counts through
    per-user flag aggregation, pooled-rate z in one fixed double
    order — bit-exact vs the oracle."""
    from guac_ray.functions.stats import two_proportion_ztest
    from guac_ray.pipelines.curation import md5_first_byte
    from guac_ray.stages.groupagg import grouped_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def flag(df: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "_p": (df["event_type"].to_numpy() == "purchase")
            .astype("int64")})
            .groupby("user_id", sort=False)["_p"].max().reset_index())
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "_p": pa.array(g["_p"], pa.int64())})

    users = grouped_agg(ds.map_batches(flag, batch_format="pandas"),
                        ["user_id"], {"converted": ("_p", "max")},
                        num_buckets=4)

    def add_variant(df: pd.DataFrame) -> pa.Table:
        v = np.where(md5_first_byte(df["user_id"].to_numpy()) >= 0x80,
                     "b", "a")
        return pa.table({
            "variant": pa.array(v, pa.string()),
            "converted": pa.array(
                df["converted"].to_numpy().astype("int64"))})

    return two_proportion_ztest(
        users.map_batches(add_variant, batch_format="pandas"),
        "variant", "converted", "a", num_buckets=2)


EVENTS_AB_CONVERSION_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS f,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) >= '80'
              THEN 'b' ELSE 'a' END AS variant
  FROM events GROUP BY user_id
), m AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(f) AS BIGINT) AS c
  FROM u GROUP BY variant
), ctl AS (SELECT * FROM m WHERE variant = 'a')
SELECT v.variant, v.n, v.c AS conv,
       CAST(v.c AS DOUBLE) / CAST(v.n AS DOUBLE) AS rate,
       ctl.n AS n_control, ctl.c AS conv_control,
       CAST(ctl.c AS DOUBLE) / CAST(ctl.n AS DOUBLE) AS rate_control,
       CASE WHEN ((CAST(v.c AS DOUBLE) + CAST(ctl.c AS DOUBLE))
                  / (CAST(v.n AS DOUBLE) + CAST(ctl.n AS DOUBLE)))
                 * (1.0 - (CAST(v.c AS DOUBLE) + CAST(ctl.c AS DOUBLE))
                          / (CAST(v.n AS DOUBLE)
                             + CAST(ctl.n AS DOUBLE)))
                 * (1.0 / CAST(v.n AS DOUBLE)
                    + 1.0 / CAST(ctl.n AS DOUBLE)) = 0.0
            THEN 0.0
            ELSE (CAST(v.c AS DOUBLE) / CAST(v.n AS DOUBLE)
                  - CAST(ctl.c AS DOUBLE) / CAST(ctl.n AS DOUBLE))
                 / sqrt(((CAST(v.c AS DOUBLE) + CAST(ctl.c AS DOUBLE))
                         / (CAST(v.n AS DOUBLE)
                            + CAST(ctl.n AS DOUBLE)))
                        * (1.0 - (CAST(v.c AS DOUBLE)
                                  + CAST(ctl.c AS DOUBLE))
                                 / (CAST(v.n AS DOUBLE)
                                    + CAST(ctl.n AS DOUBLE)))
                        * (1.0 / CAST(v.n AS DOUBLE)
                           + 1.0 / CAST(ctl.n AS DOUBLE)))
       END AS z_stat
FROM m v, ctl WHERE v.variant <> 'a'
"""


def events_srm(sf_dir: str):
    """Sample-ratio-mismatch guardrail — the FIRST check every
    experimentation platform runs before reading any metric: does the
    observed variant split match the designed 50/50 allocation? Chi-
    square goodness-of-fit over the unit counts with the expected
    cell in EXACT integers: for each variant,

        d = 2·n_v − N                   (exact int64; expected = N/2)
        chi2_cell = (d·d) / (2·N)       (one fixed-order double)

    (the (obs−exp)²/exp cell with exp = N/2, multiplied through by 4
    then divided by 2N — spelled identically in both engines so no
    fractional expectation ever materializes). Output one row per
    variant: (variant, n, n_total, chi2_cell); the total SRM statistic
    is the one-row fold, per the chi2_contingency per-cell contract.
    Unit = user (md5 split, the ab_conversion discipline)."""
    from guac_ray.pipelines.curation import md5_first_byte
    from guac_ray.stages.groupagg import grouped_agg

    ds = _read(sf_dir, "events", ["user_id"])

    def per_user(df: pd.DataFrame) -> pa.Table:
        u = pd.unique(df["user_id"].to_numpy())
        return pa.table({"user_id": pa.array(u, pa.int64())})

    users = grouped_agg(
        ds.map_batches(per_user, batch_format="pandas"),
        ["user_id"], {"_n": ("user_id", "count")}, num_buckets=4)

    def add_variant(df: pd.DataFrame) -> pa.Table:
        v = np.where(md5_first_byte(df["user_id"].to_numpy()) >= 0x80,
                     "b", "a")
        return pa.table({"variant": pa.array(v, pa.string())})

    counts = grouped_agg(
        users.map_batches(add_variant, batch_format="pandas"),
        ["variant"], {"n": ("variant", "count")},
        num_buckets=2).to_pandas()
    if counts.empty:
        return pa.schema([("variant", pa.string()), ("n", pa.int64()),
                          ("n_total", pa.int64()),
                          ("chi2_cell", pa.float64())]).empty_table()
    nt = int(counts["n"].sum())
    nv = counts["n"].to_numpy().astype("int64")
    d = 2 * nv - nt
    df64 = d.astype("float64")
    cell = (df64 * df64) / (2.0 * float(nt))
    return pa.table({
        "variant": pa.array(counts["variant"], pa.string()),
        "n": pa.array(nv),
        "n_total": pa.array(np.full(len(nv), nt, dtype="int64")),
        "chi2_cell": pa.array(cell),
    })


EVENTS_SRM_SQL = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
), v AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) >= '80'
              THEN 'b' ELSE 'a' END AS variant
  FROM u
), m AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY variant
), t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM m)
SELECT m.variant, m.n, t.nt AS n_total,
       (CAST(2*m.n - t.nt AS DOUBLE) * CAST(2*m.n - t.nt AS DOUBLE))
         / (2.0 * CAST(t.nt AS DOUBLE)) AS chi2_cell
FROM m, t
"""


def events_cuped(sf_dir: str):
    """CUPED variance-reduced A/B readout (functions/stats.py
    ``cuped_adjust``, Deng et al. 2013): per-user pre/post cents
    around the table's integer-µs midpoint (the mv_refresh epoch
    discipline), users md5-split into variants; θ from EXACT global
    moments (the integer fold of the per-variant moment rows — never
    a second scan), adjusted means in one fixed double order —
    bit-exact vs the oracle's HUGEINT spelling."""
    from guac_ray.functions.stats import cuped_adjust
    from guac_ray.pipelines.curation import md5_first_byte
    from guac_ray.stages.groupagg import grouped_agg
    import pyarrow.compute as pc

    t_us = _ts_midpoint_us(sf_dir, "events_cuped")

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def split(df: pd.DataFrame) -> pa.Table:
        tu = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        vc = cents(df["value"])
        pre = np.where(tu < t_us, vc, 0)
        post = np.where(tu >= t_us, vc, 0)
        g = (pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                           "_x": pre, "_y": post})
             .groupby("user_id", sort=False)[["_x", "_y"]]
             .sum().reset_index())
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "_x": pa.array(g["_x"].astype("int64")),
                         "_y": pa.array(g["_y"].astype("int64"))})

    users = grouped_agg(ds.map_batches(split, batch_format="pandas"),
                        ["user_id"],
                        {"pre_c": ("_x", "sum"), "post_c": ("_y", "sum")},
                        num_buckets=4)

    def add_variant(df: pd.DataFrame) -> pa.Table:
        v = np.where(md5_first_byte(df["user_id"].to_numpy()) >= 0x80,
                     "b", "a")
        return pa.table({
            "variant": pa.array(v, pa.string()),
            "pre_c": pa.array(df["pre_c"].to_numpy().astype("int64")),
            "post_c": pa.array(df["post_c"].to_numpy().astype("int64"))})

    return cuped_adjust(
        users.map_batches(add_variant, batch_format="pandas"),
        "variant", "pre_c", "post_c", num_buckets=2)


EVENTS_CUPED_SQL = """
WITH c AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS t FROM events
), u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN epoch_us(ts) < c.t
                  THEN CAST(floor(value*100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN epoch_us(ts) >= c.t
                  THEN CAST(floor(value*100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) >= '80'
              THEN 'b' ELSE 'a' END AS variant
  FROM events, c GROUP BY user_id
), m AS (
  SELECT variant, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*y) AS sxy, sum(x*x) AS sxx,
         min(x) AS mnx, max(x) AS mxx
  FROM u GROUP BY variant
), g AS (
  SELECT CAST(sum(n) AS HUGEINT) AS gn,
         CAST(sum(sx) AS HUGEINT) AS gsx,
         CAST(sum(sy) AS HUGEINT) AS gsy,
         CAST(sum(sxy) AS HUGEINT) AS gsxy,
         CAST(sum(sxx) AS HUGEINT) AS gsxx,
         min(mnx) AS gmn, max(mxx) AS gmx
  FROM m
)
SELECT m.variant, CAST(m.n AS BIGINT) AS n,
       CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean_pre,
       CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean_post,
       CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE)
         - (CASE WHEN g.gmn = g.gmx THEN 0.0 ELSE
              (CAST(g.gsxy AS DOUBLE)
               - (CAST(g.gsx AS DOUBLE) * CAST(g.gsy AS DOUBLE))
                 / CAST(g.gn AS DOUBLE))
              / (CAST(g.gsxx AS DOUBLE)
                 - (CAST(g.gsx AS DOUBLE) * CAST(g.gsx AS DOUBLE))
                   / CAST(g.gn AS DOUBLE)) END)
           * (CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE)
              - CAST(g.gsx AS DOUBLE) / CAST(g.gn AS DOUBLE))
         AS mean_adj
FROM m, g
"""


def events_user_hdr(sf_dir: str):
    """PER-KEY HDR quantile sketch (functions/sketch.py
    ``hdr_quantiles_grouped``): per-user p50/p99 of value cents with
    < 1/64 relative error from a per-key constant-size count table —
    the sketch path for per-key tail latencies at key cardinalities
    where even ``grouped_robust_stats``' per-bucket sorts get heavy
    (per-key state is ≤ 54·64 buckets regardless of the key's row
    count). One key-hash exchange of in-batch-combined (key, e, sub)
    count partials; the finalize is one vectorized cumsum +
    searchsorted per bucket. Integer-exact everywhere — hash-exact vs
    the window-partitioned SQL oracle."""
    from guac_ray.functions.sketch import hdr_quantiles_grouped

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def vc(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "v": cents(df["value"])})

    return hdr_quantiles_grouped(
        ds.map_batches(vc, batch_format="pandas"), "user_id", "v",
        pcts=(50, 99), m=64, exchange_base=_exchange("hdrg"),
        num_buckets=8)


EVENTS_USER_HDR_SQL = """
WITH t AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS v
  FROM events
), b AS (
  SELECT user_id,
         CASE WHEN v = 0 THEN -1 ELSE length(bin(v)) - 1 END AS e,
         CASE WHEN v = 0 THEN 0
              ELSE ((v - (1::BIGINT << (length(bin(v)) - 1))) * 64)
                   >> (length(bin(v)) - 1) END AS sub,
         CAST(count(*) AS BIGINT) AS n
  FROM t GROUP BY 1, 2, 3
), c AS (
  SELECT user_id, e, sub, n,
         sum(n) OVER (PARTITION BY user_id ORDER BY e, sub) AS cum,
         sum(n) OVER (PARTITION BY user_id) AS nt,
         CASE WHEN e < 0 THEN 0
              ELSE (1::BIGINT << e) + ((sub << e) // 64) END AS lower
  FROM b
), p AS (SELECT unnest([50, 99]) AS pct),
sel AS (
  SELECT c.user_id, p.pct,
         (p.pct * c.nt + 99) // 100 AS rank, c.lower, c.e, c.sub
  FROM c, p WHERE c.cum >= (p.pct * c.nt + 99) // 100
)
SELECT user_id, CAST(pct AS BIGINT) AS pct,
       CAST(rank AS BIGINT) AS rank, CAST(lower AS BIGINT) AS est
FROM sel
QUALIFY row_number() OVER (PARTITION BY user_id, pct
                           ORDER BY e, sub) = 1
"""


def events_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov test (functions/stats.py
    ``ks_test``) of purchase vs click value distributions — the
    full-CDF shape comparison completing the experimentation family
    (t-test: means; Mann–Whitney: stochastic order; KS: the whole
    distribution). Same one-aggregate (value, group) histogram shape;
    the supremum CDF gap is EXACT cross-multiplied int64
    (max |cum_a·n_b − cum_b·n_a|), and the D/z doubles evaluate in
    one fixed order mirrored by the oracle — bit-exact."""
    from guac_ray.functions.stats import ks_test

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "v": cents(df["value"])})

    return ks_test(ds.map_batches(keyed, batch_format="pandas"),
                   "event_type", "v", "purchase", "click",
                   num_buckets=4)


EVENTS_KS_TEST_SQL = """
WITH t AS (
  SELECT event_type AS g,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'click')
), h AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM t GROUP BY v
), c AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
         sum(cb) OVER (ORDER BY v) AS cum_b
  FROM h
), n AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(cb) AS BIGINT) AS nb FROM h
), agg AS (
  SELECT n.na, n.nb,
         CAST(max(abs(cum_a * n.nb - cum_b * n.na)) AS BIGINT) AS dnum
  FROM c, n GROUP BY n.na, n.nb
)
SELECT na AS n_a, nb AS n_b, dnum AS d_num,
       CAST(dnum AS DOUBLE)
         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d_stat,
       (CAST(dnum AS DOUBLE)
          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
         * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) AS z_stat
FROM agg
"""


def events_multireg(sf_dir: str):
    """EXACT multi-feature OLS (functions/stats.py ``multi_linreg``):
    regress value cents on hour-of-day and weekday — the distributed
    linear-model trainer via normal equations. One int64 Gram partial
    per block (the q6 discipline), arbitrary-precision driver fold,
    fraction-free Bareiss determinants; each coefficient is ONE double
    division of two exact integers, mirrored by the oracle's HUGEINT
    Cramer expansion — bit-exact. Weekday is (epoch_day + 4) % 7 on
    both engines (the grouping-sets idiom)."""
    from guac_ray.functions.stats import multi_linreg

    ds = _read(sf_dir, "events", ["ts", "value"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        tu = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = tu // 86_400_000_000
        return pd.DataFrame({
            "hour": (tu // 3_600_000_000) % 24,
            "weekday": (day + 4) % 7,
            "y": cents(df["value"]),
        })

    return multi_linreg(ds.map_batches(feats, batch_format="pandas"),
                        ["hour", "weekday"], "y")


EVENTS_MULTIREG_SQL = """
WITH t AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS h,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS w,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS y
  FROM events
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(h) AS HUGEINT) AS sh, CAST(sum(w) AS HUGEINT) AS sw,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(h*h) AS HUGEINT) AS shh,
         CAST(sum(h*w) AS HUGEINT) AS shw,
         CAST(sum(w*w) AS HUGEINT) AS sww,
         CAST(sum(h*y) AS HUGEINT) AS shy,
         CAST(sum(w*y) AS HUGEINT) AS swy
  FROM t
), d AS (
  SELECT *,
         n*(shh*sww - shw*shw) - sh*(sh*sww - shw*sw)
           + sw*(sh*shw - shh*sw) AS det,
         sy*(shh*sww - shw*shw) - sh*(shy*sww - shw*swy)
           + sw*(shy*shw - shh*swy) AS det0,
         n*(shy*sww - shw*swy) - sy*(sh*sww - shw*sw)
           + sw*(sh*swy - shy*sw) AS det1,
         n*(shh*swy - shy*shw) - sh*(sh*swy - shy*sw)
           + sy*(sh*shw - shh*sw) AS det2
  FROM m
)
SELECT * FROM (
  SELECT 'intercept' AS term,
         CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS beta,
         CAST(n AS BIGINT) AS n FROM d
  UNION ALL
  SELECT 'hour', CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE),
         CAST(n AS BIGINT) FROM d
  UNION ALL
  SELECT 'weekday', CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE),
         CAST(n AS BIGINT) FROM d
)
"""


# operator that has NEVER had a driver-green row; operators already
# hash-exact on a prior round's driver record (CORRECTNESS_r01–r04)
# and UNCHANGED since rotate past the cap, where their old record plus
# every-run tools/check_oracle.py verification stands as evidence.
# Round-5 rotation: the 20 round-4 wave-4/5/6/7 operators that were
# introduced after the gate was already 50/50 never-checked
# (events_funnel … kg_link_predict) move INTO the gate; 20 r4-driver-
# green stable entries (kg_mentions/certify/version/pkg_equal/
# pred_counts/conv_stats, the stateless doc scans, orders_cube and the
# r2/r3-era window-function queries) cede their slots and stand on
# CORRECTNESS_r04 + check_oracle. Kept in-gate through the rotation:
# the KG flagship core, every exchange-routed workhorse (dedup, hash
# join, grouped agg, curation) and doc_decontaminate — the operators
# round 5 modifies (pyarrow.fs-pluggable exchange, vectorized
# shingling), so the driver re-verifies the NEW code paths. Mid-round
# additions kg_spdx_ingest / kg_cdx_ingest / kg_vex_ingest (real-format
# document parsers, never driver-checked) also enter the gate;
# events_intervals / events_winsorized / events_zscore (r4-driver-green,
# unchanged) cede their slots.
SUITE: dict[str, tuple] = {
    # --- knowledge-graph construction (the BASELINE.json workload) ---
    # never-driver-checked graph analytics (round-4 waves 5–7):
    "kg_patch_cost": (kg_patch_cost, KG_PATCH_COST_SQL),
    "kg_clustering": (kg_clustering, KG_CLUSTERING_SQL),
    "kg_neighbor_deg": (kg_neighbor_deg, KG_NEIGHBOR_DEG_SQL),
    "kg_link_predict": (kg_link_predict, KG_LINK_PREDICT_SQL),
    # round-5 addition, never driver-checked → straight into the gate
    # (events_intervals, r4-driver-green and unchanged, cedes its slot):
    "kg_spdx_ingest": (kg_spdx_ingest, KG_SPDX_INGEST_SQL),
    "kg_cdx_ingest": (kg_cdx_ingest, KG_CDX_INGEST_SQL),
    "kg_vex_ingest": (kg_vex_ingest, KG_VEX_INGEST_SQL),
    # round-5 attestation/metadata parser families, never driver-
    # checked → into the gate (knn_search and events_samples —
    # r4-driver-green, unchanged, NOT exchange-routed — cede slots):
    "kg_ite6_ingest": (kg_ite6_ingest, KG_ITE6_INGEST_SQL),
    "kg_depsdev_ingest": (kg_depsdev_ingest, KG_DEPSDEV_INGEST_SQL),
    # --- training-data / LLM pipeline operators ---
    "corpus_curation": (corpus_curation, CORPUS_CURATION_SQL),
    "doc_decontaminate": (doc_decontaminate, DOC_DECONTAMINATE_SQL),
    # round-5 additions, never driver-checked → into the gate
    # (events_windows — r4-driver-green, window code unchanged — and
    # neardup_embeddings — r4-green but a CONSTANT-EMPTY row on these
    # near-orthogonal embeddings, now superseded in-gate by
    # emb_semdedup's non-trivial split — cede):
    "doc_dup_passages": (doc_dup_passages, DOC_DUP_PASSAGES_SQL),
    "doc_remove_passages": (doc_remove_passages, DOC_REMOVE_PASSAGES_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (exact_dedup_docs — r4-driver-green; the dedup family stays
    # gate-covered by doc_dup_passages/doc_remove_passages/
    # emb_semdedup and corpus_curation's embedded exact dedup —
    # cedes):
    "doc_ngram_novelty": (doc_ngram_novelty, DOC_NOVELTY_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_degree_top — r4-driver-green; the degree/hot-key count
    # family stays gate-covered by kg_neighbor_deg (never-checked)
    # and kg_heavy_tools — cedes):
    "basket_pairs": (basket_pairs, BASKET_PAIRS_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (purchase_click_window — r4-driver-green, banded-join code
    # unchanged, and the same join family is gate-covered by the
    # never-checked events_span_join — cedes):
    "doc_dsir": (doc_dsir, DOC_DSIR_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (events_quantiles_cont — r4-driver-green; the exact-quantile /
    # histogram-exchange family stays gate-covered by the
    # never-checked events_percentile, events_mad and
    # events_quantile_buckets — cedes):
    "supplier_name_matches": (supplier_name_matches,
                              SUPPLIER_NAME_MATCHES_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (doc_tfidf — r4-driver-green; the fixed-point text-scoring
    # family stays gate-covered by the never-checked doc_surprisal,
    # doc_entropy, doc_dsir and doc_bm25 itself — cedes):
    "doc_bm25": (doc_bm25, DOC_BM25_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (events_customer_outer — r4-driver-green, join code unchanged;
    # the partitioned-hash-join family stays gate-covered by
    # priority_revenue_hashjoin — cedes):
    "doc_pmi_collocations": (doc_pmi_collocations, DOC_PMI_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (q3_building_revenue — r4-driver-green, join+agg composition
    # stays gate-covered by priority_revenue_hashjoin — cedes):
    "doc_hybrid_search": (doc_hybrid_search, DOC_HYBRID_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_kcore — r4-driver-green, unchanged; the iterative-graph
    # exchange family stays gate-covered by kg_pagerank_top,
    # kg_components and the never-checked kg_patch_cost — cedes):
    "doc_lm_xent": (doc_lm_xent, DOC_LM_XENT_SQL),
    # round-5 addition, never driver-checked → into the gate. Its
    # oracle embeds the FULL kmeans unroll plus the pair join, so
    # emb_kmeans (r4-driver-green, unchanged) cedes its slot and is
    # re-verified transitively on every semdedup check:
    "emb_semdedup": (emb_semdedup, EMB_SEMDEDUP_SQL),
    # never-driver-checked doc/embedding operators (waves 4–7):
    "doc_chunks": (doc_chunks, DOC_CHUNKS_SQL),
    "doc_weighted_sample": (doc_weighted_sample, DOC_WSAMPLE_SQL),
    "doc_surprisal": (doc_surprisal, DOC_SURPRISAL_SQL),
    "doc_entropy": (doc_entropy, DOC_ENTROPY_SQL),
    "emb_label_centroids": (emb_label_centroids, EMB_CENTROIDS_SQL),
    # --- event streams: windows, samples, quantiles, reshape ---
    # round-5 session-6 additions, never driver-checked → into the
    # gate. Ceding: priority_revenue_hashjoin and kg_heavy_tools —
    # both r4-driver-green; the partitioned-hash-join family stays
    # gate-covered by doc_decontaminate's large-large semi join and
    # doc_hybrid_search's fusion join, the hot-key/salted-count
    # family by every kg_* grouped aggregate in-gate, and BOTH ceded
    # entries keep every-run check_oracle verification past the cap:
    "events_user_gaps": (events_user_gaps, EVENTS_USER_GAPS_SQL),
    "events_twap": (events_twap, EVENTS_TWAP_SQL),
    # round-5 session-6 addition, never driver-checked → into the gate
    # (kg_pagerank_top cedes: r4-driver-green with the fixed-point
    # oracle; the iterative-bucket-IO family it represented stays
    # gate-covered by kg_patch_cost and the exchange machinery by
    # every grouped/joined entry in-gate; it keeps every-run
    # check_oracle verification past the cap):
    "orders_basket_sig": (orders_basket_sig, ORDERS_BASKET_SIG_SQL),
    # never-driver-checked event-stream operators (waves 4–6):
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_span_join": (events_span_join, EVENTS_SPAN_JOIN_SQL),
    "events_corr": (events_corr, EVENTS_CORR_SQL),
    "events_setops": (events_setops, EVENTS_SETOPS_SQL),
    "events_transitions": (events_transitions, EVENTS_TRANSITIONS_SQL),
    "events_quantile_buckets": (events_quantile_buckets, EVENTS_QBUCKETS_SQL),
    "events_mad": (events_mad, EVENTS_MAD_SQL),
    "events_range_windows": (events_range_windows, EVENTS_RANGE_WINDOWS_SQL),
    "events_props_agg": (events_props_agg, EVENTS_PROPS_SQL),
    "events_entropy": (events_entropy, EVENTS_ENTROPY_SQL),
    "events_percentile": (events_percentile, EVENTS_PERCENTILE_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (q1_pricing_summary — r4-driver-green, plain grouped-agg family
    # stays gate-covered by events_props_agg and every kg aggregate —
    # cedes):
    "events_ohlc": (events_ohlc, EVENTS_OHLC_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_triangles — r4-driver-green, unchanged; the wedge/triangle
    # machinery stays gate-covered by the never-checked kg_clustering
    # and kg_link_predict, which share _wedges_fn — cedes):
    "user_streaks": (user_streaks, USER_STREAKS_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_patch_radius — r4-driver-green, unchanged; the BFS/path
    # family stays gate-covered by the never-checked kg_patch_cost,
    # which shares the query/graph traversal machinery — cedes):
    "events_cohort_retention": (events_cohort_retention,
                                EVENTS_COHORT_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_strip_boilerplate — r4-driver-green, unchanged; the
    # vectorized text-scan family stays gate-covered by the
    # never-checked doc_lm_xent / doc_pmi_collocations /
    # doc_ngram_novelty — cedes):
    "events_dau_wau": (events_dau_wau, EVENTS_DAU_WAU_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_components — r4-driver-green, unchanged; the min-label
    # propagation machinery stays exercised in-gate through
    # corpus_curation's embedded connected components, and the
    # iterative-exchange family by kg_pagerank_top + the
    # never-checked kg_patch_cost — cedes):
    "kg_assortativity": (kg_assortativity, KG_ASSORTATIVITY_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_depends_on — r4-driver-green, unchanged; the dependency-edge
    # family stays gate-covered by the never-checked
    # kg_depsdev_ingest, whose IsDepPackages rows ARE depends_on
    # edges, plus kg_version_range — cedes):
    "doc_postings": (doc_postings, DOC_POSTINGS_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_tool_usage — r4-driver-green, unchanged; the hot-key /
    # salted-count family stays gate-covered by kg_heavy_tools on the
    # same 40%-hot key, and the fused broadcast-linking path feeds
    # every in-gate kg query — cedes):
    "doc_domain_terms": (doc_domain_terms, DOC_DOMAIN_TERMS_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (kg_turn_text — r4-driver-green, unchanged; the transcript
    # extraction surface stays exercised by EVERY in-gate kg_* query,
    # which all consume its output, and the five real-format ingest
    # queries cover document→triple parity end-to-end — cedes):
    "kg_degree_hist": (kg_degree_hist, KG_DEGREE_HIST_SQL),
    # round-5 addition, never driver-checked → into the gate
    # (simjoin_docs — r4-driver-green, PPJoin code unchanged; the
    # similarity-join family stays gate-covered by the never-checked
    # supplier_name_matches, and exact set-similarity semantics by
    # doc_dup_passages/doc_ngram_novelty's shingle exchanges — cedes):
    "kg_reciprocity": (kg_reciprocity, KG_RECIPROCITY_SQL),
    # --- past the driver's 50-entry cap ---
    # Every entry below is STILL verified on every tools/check_oracle.py
    # run. Oracle-backed entries here are hash-exact on a prior round's
    # driver record (named below) and unchanged since; no-oracle entries
    # are golden-pinned with drift tests.
    # r4 driver-green (CORRECTNESS_r04), rotated out at round-5 start
    # (kg_heavy_tools + priority_revenue_hashjoin + kg_pagerank_top
    # rotated out mid-round-5 for the session-6 additions — see the
    # gate comments above):
    "kg_pagerank_top": (kg_pagerank_top, KG_PAGERANK_SQL),
    # round-5 session-6 addition (past the cap, same rationale as
    # doc_pii_inventory): personalized PageRank shares kg_pagerank_top's
    # machinery and oracle discipline, hash-exact on every sweep:
    "kg_ppr_vuln": (kg_ppr_vuln, KG_PPR_SQL),
    "kg_heavy_tools": (kg_heavy_tools, KG_HEAVY_TOOLS_SQL),
    "priority_revenue_hashjoin": (priority_revenue_hashjoin,
                                  PRIORITY_REVENUE_SQL),
    "kg_turn_text": (kg_turn_text, KG_TURN_TEXT_SQL),
    "simjoin_docs": (simjoin_docs, SIMJOIN_SQL),
    "kg_patch_radius": (kg_patch_radius, KG_PATCH_RADIUS_SQL),
    "kg_tool_usage": (kg_tool_usage, KG_TOOL_USAGE_SQL),
    "kg_depends_on": (kg_depends_on, KG_DEPENDS_ON_SQL),
    "kg_strip_boilerplate": (kg_strip_boilerplate, KG_BOILER_SQL),
    "kg_components": (kg_components, KG_COMPONENTS_SQL),
    "kg_triangles": (kg_triangles, KG_TRIANGLES_SQL),
    "kg_kcore": (kg_kcore, KG_KCORE_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_building_revenue": (q3_building_revenue, Q3_SQL),
    "kg_degree_top": (kg_degree_top, KG_DEGREE_TOP_SQL),
    "exact_dedup_docs": (exact_dedup_docs, EXACT_DEDUP_SQL),
    "events_customer_outer": (events_customer_outer, EVENTS_CUST_OUTER_SQL),
    "emb_kmeans": (emb_kmeans, EMB_KMEANS_SQL),
    "events_windows": (events_windows, EVENTS_WINDOWS_SQL),
    "neardup_embeddings": (neardup_embeddings, NEARDUP_EMB_SQL),
    "purchase_click_window": (purchase_click_window, PURCHASE_CLICK_WINDOW_SQL),
    "events_quantiles_cont": (events_quantiles_cont, EVENTS_QUANTILES_CONT_SQL),
    "doc_tfidf": (doc_tfidf, DOC_TFIDF_SQL),
    "knn_search": (knn_search_q0, KNN_SQL),
    "events_samples": (events_samples, EVENTS_SAMPLES_SQL),
    "events_zscore": (events_zscore, EVENTS_ZSCORE_SQL),
    "events_winsorized": (events_winsorized, EVENTS_WINSOR_SQL),
    # round-5 session-6 addition registered PAST the cap (same
    # rationale as doc_pii_inventory: the remaining three r4-green gate
    # keepers — corpus_curation, doc_decontaminate, and the flagship
    # composition slots — all carry round-5-rewritten code paths the
    # driver must re-verify; this op is check_oracle-verified
    # hash-exact on every sweep):
    "events_running_distinct": (events_running_distinct,
                                EVENTS_RUNNING_DISTINCT_SQL),
    # round-5 session-6 addition, past the cap (same rationale) —
    # GROUPING SETS generalizes the r3/r4 rollup/cube machinery:
    "events_grouping_sets": (events_grouping_sets,
                             EVENTS_GROUPING_SETS_SQL),
    # round-5 session-6 addition, past the cap (same rationale) — the
    # Q18 aggregate-then-join composite over existing machinery:
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    # round-5 session-6 addition, past the cap (same rationale) —
    # high-cardinality grouped robust stats, sibling of
    # events_user_gaps' per-user quantile shape:
    "events_user_mad": (events_user_mad, EVENTS_USER_MAD_SQL),
    # round-5 session-7 addition, past the cap (same rationale as
    # events_user_mad): SCD2 interval build on the per-user stream
    # shell, check_oracle-verified hash-exact on every sweep:
    "events_scd2": (events_scd2, EVENTS_SCD2_SQL),
    # round-5 session-7 addition, past the cap (same rationale):
    # robust outlier flags — grouped_robust_stats joined back to the
    # stream via the partitioned hash join:
    "events_anomalies": (events_anomalies, EVENTS_ANOMALIES_SQL),
    # round-5 session-7 addition, past the cap (same rationale):
    # Deequ-style column profiler — exact distinct via the pair
    # exchange, typed min/max, long-format contract:
    "orders_profile": (orders_profile, ORDERS_PROFILE_SQL),
    # round-5 session-7 addition, past the cap (same rationale):
    # declarative DQ constraint suite — shared row-local pass +
    # unique exchange + FK anti join:
    "events_expectations": (events_expectations,
                            EVENTS_EXPECTATIONS_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # MERGE INTO / CDC upsert+delete — keep_latest snapshot + one
    # union exchange with last-writer-wins + delete semantics:
    "events_cdc_merge": (events_cdc_merge, EVENTS_CDC_MERGE_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # TPC-H Q13 LEFT-join double aggregation with the zero-order
    # class kept — composition of grouped_agg + left hash_join:
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # TPC-H Q10 deep join pipeline — fused per-customer revenue
    # partial inside the join reduce, broadcast dims, top-20:
    "q10_returned_revenue": (q10_returned_revenue, Q10_SQL),
    # round-5 session-8 additions, past the cap (same rationale):
    # Q6 — the pure predicate-pushdown scan aggregate; Q14 — the
    # conditional fact⋈dim aggregate with a fixed-order double share:
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q14_promo_share": (q14_promo_share, Q14_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # gap-filled hourly spine — distributed series generation LEFT
    # joined to the counts, real zero cells at the gate SF:
    "events_hourly_spine": (events_hourly_spine,
                            EVENTS_HOURLY_SPINE_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # AS OF time travel over the SCD2 dimension — interval
    # containment at the integer-µs midpoint instant:
    "events_asof_state": (events_asof_state, EVENTS_ASOF_STATE_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # chi-squared contingency grid — exact int64 deviations, bit-exact
    # per-cell doubles, full observed-label cross product:
    "events_chi2": (events_chi2, EVENTS_CHI2_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # lag-throttle burst filter on the per-user stream shell:
    "events_debounce": (events_debounce, EVENTS_DEBOUNCE_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # exact grouped mode — count-partial argmax with deterministic
    # tie-break, real ties on this corpus:
    "events_user_mode": (events_user_mode, EVENTS_USER_MODE_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # per-group OLS trend — exact moment sums, bit-exact fixed-order
    # doubles, the grouped_corr family completed:
    "events_trend": (events_trend, EVENTS_TREND_SQL),
    # round-5 session-8 addition, past the cap (same rationale):
    # keyed table reconciliation — the migration-validation diff on
    # the multi-input exchange, all four statuses real:
    "orders_reconcile": (orders_reconcile, ORDERS_RECONCILE_SQL),
    "events_intervals": (events_intervals, EVENTS_INTERVALS_SQL),
    "kg_mentions": (kg_mentions, KG_MENTIONS_SQL),
    "kg_certify_vuln": (kg_certify_vuln, KG_CERTIFY_SQL),
    "kg_conv_stats": (kg_conv_stats, KG_CONV_STATS_SQL),
    "kg_certify_legal": (kg_certify_legal, KG_CERTIFY_LEGAL_SQL),
    "kg_version_of": (kg_version_of, KG_VERSION_OF_SQL),
    "kg_version_range": (kg_version_range, KG_VERSION_RANGE_SQL),
    "kg_pkg_equal": (kg_pkg_equal, KG_PKG_EQUAL_SQL),
    "kg_edge_pred_counts": (kg_edge_pred_counts, KG_PRED_COUNTS_SQL),
    "doc_quality": (doc_quality, DOC_QUALITY_SQL),
    "doc_top_bigrams": (doc_top_bigrams, TOP_BIGRAMS_SQL),
    "doc_pii_scrub": (doc_pii_scrub, DOC_PII_SQL),
    # round-5 session-6 addition registered PAST the cap: every
    # remaining in-gate entry is either never-driver-checked or a
    # flagship whose r05 row re-verifies code round 5 changed, so no
    # slot is cheaper than this op's marginal evidence — it shares
    # doc_pii_scrub's patterns/enrichment and is check_oracle-verified
    # (hash-exact incl. the extracted strings) on every sweep:
    "doc_pii_inventory": (doc_pii_inventory, DOC_PII_INVENTORY_SQL),
    "doc_repetition": (doc_repetition, DOC_REPETITION_SQL),
    "doc_strip_lines": (doc_strip_lines, DOC_STRIP_LINES_SQL),
    "doc_train_test_split": (doc_train_test_split, TRAIN_TEST_SQL),
    "doc_source_mixture": (doc_source_mixture, DOC_MIXTURE_SQL),
    "emb_cluster_sample": (emb_cluster_sample, EMB_CLUSTER_SAMPLE_SQL),
    "orders_cube": (orders_cube, ORDERS_CUBE_SQL),
    "events_user_stats": (events_user_stats, EVENTS_USER_SQL),
    "events_window_funcs": (events_window_funcs, EVENTS_WINDOW_SQL),
    "events_rank_dense": (events_rank_dense, EVENTS_RANK_SQL),
    # r3 driver-green (CORRECTNESS_r03), unchanged since:
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "top_customers": (top_customers, TOP_CUSTOMERS_SQL),
    "top_orders_per_status": (top_orders_per_status, TOP_ORDERS_SQL),
    "purchase_signup_asof": (purchase_signup_asof, PURCHASE_SIGNUP_SQL),
    "click_days_no_purchase": (click_days_no_purchase, CLICK_DAYS_SQL),
    "lineitem_profile": (lineitem_profile, LINEITEM_PROFILE_SQL),
    "events_sessions": (events_sessions, EVENTS_SESSIONS_SQL),
    "events_latest_per_user": (events_latest_per_user, EVENTS_LATEST_SQL),
    "events_value_quantiles": (events_value_quantiles, EVENTS_QUANTILES_SQL),
    "events_type_long": (events_type_long, EVENTS_TYPE_LONG_SQL),
    "distinct_segments": (distinct_segments, DISTINCT_SEGMENTS_SQL),
    "part_type_stats": (part_type_stats, PART_TYPE_SQL),
    # golden/pytest-bounded (no SQL oracle; a driver row would be
    # rows-only anyway):
    "events_user_approx": (events_user_approx, None),
    "doc_lang_id": (doc_lang_id, None),
    "media_decode": (media_decode, None),
    "media_neardup": (media_neardup, None),
    "media_audio": (media_audio, None),
    "media_video": (media_video, None),
    "neardup_docs_minhash": (neardup_docs_minhash, None),
    "neardup_docs_simhash": (neardup_docs_simhash, None),
    # round-5 session 6: iterative vocabulary learning — no SQL form
    # (40 chained pair-recounts); golden-pinned + naive-parity tests:
    "doc_bpe_merges": (doc_bpe_merges, None),
    # round-5 session 6: triangle-support peeling — no SQL form
    # (cascading rounds); golden-pinned + naive-parity tests:
    "kg_ktruss": (kg_ktruss, None),
    # round-5 session 6: trained-vocab token counting (apply side of
    # doc_bpe_merges) — the learned vocabulary has no SQL form;
    # golden-pinned + reference-encode parity tests:
    "doc_bpe_tokens": (doc_bpe_tokens, None),
    # round-5 session 9: the remaining TPC-H composite shapes —
    # Q4 (large-large SEMI join as a standalone relational entry),
    # Q17 (decorrelated avg subquery with the exact-integer threshold
    # fused into the join reduce), Q19 (disjunctive predicate with the
    # quantity-envelope scan pushdown):
    "q4_priority_check": (q4_priority_check, Q4_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q19_brand_band_revenue": (q19_brand_band_revenue, Q19_SQL),
    # round-5 session 9, second wave — Q22 (scalar subquery + large-
    # large ANTI join on the window-pruned orders), Q16 (COUNT DISTINCT
    # over the derived part-supplier relation, double dedup exchange),
    # Q5 (nation-equality deep join fused into the join reduce):
    "q22_dormant_customers": (q22_dormant_customers, Q22_SQL),
    "q16_supplier_variety": (q16_supplier_variety, Q16_SQL),
    "q5_local_revenue": (q5_local_revenue, Q5_LOCAL_SQL),
    # round-5 session 10 — Q21 (double-correlated EXISTS/NOT EXISTS
    # self-join decorrelated into one order-hash exchange), Q15 (scalar
    # MAX-of-aggregate subquery on exact cents), Q12 (conditional
    # two-way counts fused into the join reduce):
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q12_priority_by_flag": (q12_priority_by_flag, Q12_SQL),
    # Q7 (nation-pair volume in either direction, per ship year) and
    # Q8 (conditional market share, fixed-order double) — both fused
    # into the join reduce per the Q5 discipline:
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    # long->wide pivot over the event log (pivot_wide — discovered
    # labels, zero-filled cells, cell-grain exchange):
    "events_user_pivot": (events_user_pivot, EVENTS_USER_PIVOT_SQL),
    # per-type lag-k autocorrelation (grouped_acf — each (type, lag)
    # an exact-moment grouped_corr over the shifted pairs):
    "events_acf": (events_acf, EVENTS_ACF_SQL),
    # Q2 (per-group argmin join-back over the derived cost relation)
    # and Q11 (relative-threshold HAVING via exact integer
    # cross-multiplication):
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    # cume_dist + nth_value complete the SQL window-function surface:
    "events_cume_nth": (events_cume_nth, EVENTS_CUME_NTH_SQL),
    # Q9 — the three-fact join chain with the composite-key exchange
    # and derived supply cost:
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    # Q20 — the correlated half-sum threshold over two pair-grain
    # aggregates in the composite-key exchange (22/22 TPC-H shapes):
    "q20_surge_suppliers": (q20_surge_suppliers, Q20_SQL),
    # equi-width histogram (fixed-bin width_bucket complement of the
    # equi-depth quantile cut) and share-of-total (ratio_to_report):
    "events_value_hist": (events_value_hist, EVENTS_VALUE_HIST_SQL),
    "events_share_of_type": (events_share_of_type, EVENTS_SHARE_SQL),
    # round-5 session 12 — experimentation analytics: Welch's t
    # (exact moments + fixed-order doubles), Mann–Whitney U (tie-
    # corrected rank sums over the value histogram, exact 2U ints),
    # and exact multi-feature OLS (integer Gram partials + Bareiss
    # determinants, one double division per coefficient):
    "events_ab_ttest": (events_ab_ttest, EVENTS_AB_TTEST_SQL),
    "events_mannwhitney": (events_mannwhitney, EVENTS_MANNWHITNEY_SQL),
    "events_ks_test": (events_ks_test, EVENTS_KS_TEST_SQL),
    # HDR-histogram quantile sketch — approximate in value, EXACT as
    # an algorithm (integer bucketing, no float log), so the sketch
    # estimator itself is oracle-verified:
    "events_hdr_quantiles": (events_hdr_quantiles,
                             EVENTS_HDR_QUANTILES_SQL),
    # per-key HDR sketch: per-user p50/p99 tails at unbounded key
    # cardinality, window-partitioned SQL oracle:
    "events_user_hdr": (events_user_hdr, EVENTS_USER_HDR_SQL),
    # binary-outcome A/B (two-proportion conversion z) and CUPED
    # variance-reduced means (Deng et al. 2013):
    "events_ab_conversion": (events_ab_conversion,
                             EVENTS_AB_CONVERSION_SQL),
    "events_cuped": (events_cuped, EVENTS_CUPED_SQL),
    # sample-ratio-mismatch guardrail (exact-integer chi2 cells):
    "events_srm": (events_srm, EVENTS_SRM_SQL),
    # distributed exact PCA top component — quantized Gram partials +
    # fixed-point power iteration, unrolled HUGEINT oracle:
    "emb_pca_top": (emb_pca_top, EMB_PCA_SQL),
    "events_multireg": (events_multireg, EVENTS_MULTIREG_SQL),
    # per-user fixed-point EWMA — the order-sensitive smoother whose
    # recursive-CTE oracle steps the identical integer recurrence:
    "events_user_ewma": (events_user_ewma, EVENTS_USER_EWMA_SQL),
    # incremental MV maintenance: delta refresh ≡ full recompute,
    # proven bit-equal by the recompute oracle:
    "events_mv_refresh": (events_mv_refresh, EVENTS_MV_REFRESH_SQL),
    # HITS hubs/authorities — the quantized iterative-dataflow sibling
    # of kg_pagerank_top, hash-exact vs the unrolled max-normalized
    # integer recurrence:
    "kg_hits": (kg_hits, KG_HITS_SQL),
    # synchronous deterministic label propagation — community
    # detection as a pure function of the graph, full (node, label)
    # table hash-exact vs the unrolled vote-argmax recurrence:
    "kg_label_prop": (kg_label_prop, KG_LABEL_PROP_SQL),
}

# The gate contract, asserted at import: the driver checks the FIRST
# 50 entries, and the rotation policy requires every one of them to be
# oracle-backed. A future edit that inserts an entry above the cap (or
# registers a golden-pinned query in a gate slot) must fail HERE, not
# silently swap which queries the driver verifies.
_gate = list(SUITE)[:50]
_no_sql = [n for n in _gate if SUITE[n][1] is None]
assert not _no_sql, (
    f"SUITE gate violation: first-50 entries without an oracle: "
    f"{_no_sql} — golden-pinned queries go past the cap")

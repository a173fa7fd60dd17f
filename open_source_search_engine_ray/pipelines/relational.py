"""Relational operators demonstrated Ray-Data-first: wide aggregation,
broadcast join, windowed streaming aggregate.

These exercise the generic dataflow machinery (the reference's batch
DocProcess jobs and Statistics aggregation, SURVEY.md §2.6) on the star
schema the driver pre-registers for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns)


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-style: per (returnflag, linestatus) sums/averages — partial
    aggregation happens inside Ray's hash aggregate; read is column-pruned."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    # sums in exact integer cents so float summation order can never flip
    # a rounding boundary (the inputs are 2-decimal money values;
    # disc_price = price × (1-discount) is exact in 10^-4 units)
    def derive(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        qty = b["l_quantity"].to_numpy()
        cents = np.rint(price * 100.0).astype(np.int64)
        disc_e4 = np.rint(price * 100.0).astype(np.int64) * \
            np.rint((1.0 - disc) * 100.0).astype(np.int64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty_i": pa.array(np.rint(qty).astype(np.int64)),
            "price_cents": pa.array(cents),
            "disc_e4": pa.array(disc_e4),
        })

    agg = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_i", alias_name="sum_qty_i"),
                      Sum("price_cents", alias_name="sum_cents"),
                      Sum("disc_e4", alias_name="sum_disc_e4"),
                      Count(alias_name="count_order")))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": b["sum_qty_i"],
            "sum_base_price": pc.divide(
                pc.cast(b["sum_cents"], pa.float64()), pa.scalar(100.0)),
            "sum_disc_price": pc.divide(
                pc.cast(b["sum_disc_e4"], pa.float64()), pa.scalar(10000.0)),
            "count_order": b["count_order"],
        })

    return agg.map_batches(final, batch_format="pyarrow")


def lineitem_pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT) / 100.0 AS sum_base_price,
       sum(round(l_extendedprice * 100)::BIGINT *
           round((1 - l_discount) * 100)::BIGINT) / 10000.0 AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def orders_by_nation(sf_dir: str):
    """Revenue per nation: broadcast join (customer+nation are the small
    side → ``ray.put`` once, dict lookup per batch; orders stream)."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    # sorted-key arrays + searchsorted (the parts_profit_by_nation
    # pattern) — no per-row Python dict lookups in the stream stage
    c_keys = cust["c_custkey"].to_numpy().astype(np.int64)
    c_order = np.argsort(c_keys)
    c_keys = c_keys[c_order]
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    c_nation = np.asarray(
        [nname.get(int(k), "UNKNOWN")
         for k in cust["c_nationkey"].to_numpy()[c_order]])
    ref = ray.put((c_keys, c_nation))

    def attach(b: pa.Table) -> pa.Table:
        ck, cn = ray.get(ref)
        keys = b["o_custkey"].to_numpy().astype(np.int64)
        ci = np.clip(np.searchsorted(ck, keys), 0, len(ck) - 1)
        ok = ck[ci] == keys
        names = np.where(ok, cn[ci], "UNKNOWN")
        cents = np.rint(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({
            "n_name": pa.array(names, pa.string()),
            "price_cents": pa.array(cents),
        })

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    agg = (ds.map_batches(attach, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("price_cents", alias_name="sum_cents"),
                      Count(alias_name="n_orders")))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b["n_name"],
            "total_revenue": pc.divide(
                pc.cast(b["sum_cents"], pa.float64()), pa.scalar(100.0)),
            "n_orders": b["n_orders"],
        })

    return agg.map_batches(final, batch_format="pyarrow")


def orders_by_nation_sql() -> str:
    return """
SELECT n.n_name,
       sum(round(o.o_totalprice * 100)::BIGINT) / 100.0 AS total_revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


def parts_profit_by_nation(sf_dir: str):
    """TPC-H Q9-flavored 3-dim star join: revenue per (supplier nation,
    part brand).  lineitem streams; part / supplier / nation are the small
    sides — broadcast ONCE via ``ray.put`` as sorted-array lookups, joined
    map-side with searchsorted (no shuffle join for dimension tables), then
    a partial-aggregating hash groupby on the tiny key space."""
    import ray
    from ray.data.aggregate import Count, Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    p_keys = part["p_partkey"].to_numpy().astype(np.int64)
    p_order = np.argsort(p_keys)
    p_keys = p_keys[p_order]
    p_brand = part["p_brand"].to_numpy()[p_order]
    s_keys = supp["s_suppkey"].to_numpy().astype(np.int64)
    s_order = np.argsort(s_keys)
    s_keys = s_keys[s_order]
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    s_nation = np.asarray(
        [nname.get(int(k), "UNKNOWN")
         for k in supp["s_nationkey"].to_numpy()[s_order]])
    ref = ray.put((p_keys, p_brand, s_keys, s_nation))

    def attach(b: pa.Table) -> pa.Table:
        pk, pb, sk, sn = ray.get(ref)
        lp = b["l_partkey"].to_numpy().astype(np.int64)
        ls = b["l_suppkey"].to_numpy().astype(np.int64)
        bi = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
        si = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
        ok = (pk[bi] == lp) & (sk[si] == ls)
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        rev_e4 = (np.rint(price * 100.0).astype(np.int64)
                  * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        return pa.table({
            "n_name": pa.array(sn[si][ok], pa.string()),
            "p_brand": pa.array(pb[bi][ok], pa.string()),
            "rev_e4": pa.array(rev_e4[ok], pa.int64()),
        })

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    agg = (ds.map_batches(attach, batch_format="pyarrow")
           .groupby(["n_name", "p_brand"])
           .aggregate(Sum("rev_e4", alias_name="sum_e4"),
                      Count(alias_name="n_items")))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b["n_name"],
            "p_brand": b["p_brand"],
            "revenue": pc.divide(
                pc.cast(b["sum_e4"], pa.float64()), pa.scalar(10000.0)),
            "n_items": b["n_items"],
        })

    return agg.map_batches(final, batch_format="pyarrow")


def parts_profit_by_nation_sql() -> str:
    return """
SELECT n.n_name, p.p_brand,
       sum(round(l.l_extendedprice * 100)::BIGINT *
           round((1 - l.l_discount) * 100)::BIGINT) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name, p.p_brand
ORDER BY n.n_name, p.p_brand
"""


def customers_without_orders(sf_dir: str):
    """TPC-H Q22-flavored ANTI-JOIN: customers with no URGENT orders,
    aggregated per nation.  Both sides are unbroadcastable, so the anti
    join is the union-tag co-partition (bucket on custkey, one groupby,
    vectorized sorted anti-membership in the group kernel) — the same
    data movement as a hash join without Ray ``Dataset.join``'s
    empty-hash-partition crash; the 25-row nation dim is the only
    broadcast."""
    import ray
    from ray.data.aggregate import Count, Sum

    ANTI_BUCKETS = 64
    _tag_schema = pa.schema([
        ("bucket", pa.int64()), ("key", pa.int64()),
        ("c_nationkey", pa.int64()), ("c_acctbal", pa.float64()),
        ("is_o", pa.int64())])

    def tag_cust(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy().astype(np.int64)
        return pa.table({
            "bucket": pa.array(keys % ANTI_BUCKETS),
            "key": pa.array(keys),
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "c_acctbal": pc.cast(b["c_acctbal"], pa.float64()),
            "is_o": pa.array(np.zeros(len(keys), np.int64)),
        }).cast(_tag_schema)

    def tag_orders(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        keys = b["o_custkey"].to_numpy().astype(np.int64)
        return pa.table({
            "bucket": pa.array(keys % ANTI_BUCKETS),
            "key": pa.array(keys),
            "c_nationkey": pa.array(np.zeros(len(keys), np.int64)),
            "c_acctbal": pa.array(np.zeros(len(keys), np.float64)),
            "is_o": pa.array(np.ones(len(keys), np.int64)),
        }).cast(_tag_schema)

    _out_schema = pa.schema([("c_nationkey", pa.int64()),
                             ("c_acctbal", pa.float64())])

    def anti(g: pa.Table) -> pa.Table:
        from ..query.kernel import in_sorted

        iso = g["is_o"].to_numpy()
        keys = g["key"].to_numpy()
        osort = np.sort(keys[iso == 1])
        crows = np.flatnonzero(iso == 0)
        if len(crows) == 0:
            return _out_schema.empty_table()
        crows = crows[~in_sorted(keys[crows], osort)]
        take = pa.array(crows)
        return pa.table({"c_nationkey": g["c_nationkey"].take(take),
                         "c_acctbal": g["c_acctbal"].take(take)})

    no_orders = (_read(sf_dir, "customer",
                       ["c_custkey", "c_nationkey", "c_acctbal"])
                 .map_batches(tag_cust, batch_format="pyarrow")
                 .union(_read(sf_dir, "orders",
                              ["o_custkey", "o_orderpriority"])
                        .map_batches(tag_orders, batch_format="pyarrow"))
                 .groupby("bucket")
                 .map_groups(anti, batch_format="pyarrow"))

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    ref = ray.put(nname)

    def attach(b: pa.Table) -> pa.Table:
        nn = ray.get(ref)
        cents = np.rint(b["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({
            "n_name": pa.array(
                [nn.get(int(k), "UNKNOWN")
                 for k in b["c_nationkey"].to_numpy()], pa.string()),
            "bal_cents": pa.array(cents),
        })

    agg = (no_orders.map_batches(attach, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Count(alias_name="n_customers"),
                      Sum("bal_cents", alias_name="sum_cents")))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b["n_name"],
            "n_customers": b["n_customers"],
            "sum_acctbal": pc.divide(
                pc.cast(b["sum_cents"], pa.float64()), pa.scalar(100.0)),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def customers_without_orders_sql() -> str:
    return """
SELECT n.n_name, count(*) AS n_customers,
       sum(round(c.c_acctbal * 100)::BIGINT) / 100.0 AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY n.n_name
ORDER BY n.n_name
"""


def top_parts_per_brand(sf_dir: str):
    """Top-2 parts per brand by retail price (ties by part key) — the
    top-k-per-group / window-function operator class, expressed as a
    keyed groupby with a vectorized in-group sort (brands are a small,
    balanced key space; at scale a per-partition partial top-k before the
    shuffle caps group size)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["p_retailprice", "p_partkey"],
                          ascending=[False, True]).head(2)
        return pa.table({
            "p_brand": pa.array(g["p_brand"].tolist(), pa.string()),
            "brand_rank": pa.array(
                np.arange(1, len(g) + 1, dtype=np.int64)),
            "p_partkey": pa.array(
                g["p_partkey"].to_numpy().astype(np.int64)),
            "p_retailprice": pa.array(
                np.round(g["p_retailprice"].to_numpy(), 2), pa.float64()),
        })

    return ds.groupby("p_brand").map_groups(topk, batch_format="pandas")


def top_parts_per_brand_sql() -> str:
    return """
SELECT p_brand,
       row_number() OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC, p_partkey) AS brand_rank,
       p_partkey, round(p_retailprice, 2) AS p_retailprice
FROM part
QUALIFY brand_rank <= 2
ORDER BY p_brand, brand_rank
"""


def events_hourly_window(sf_dir: str):
    """Tumbling 1h windows per event_type: (window_start epoch-seconds,
    event_type, n_events, sum_value) — the streaming windowed-aggregate
    operator (map-side window assignment, then a keyed aggregate)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def window(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        win = (ts // 3_600_000_000) * 3600  # epoch seconds, hour floor
        cents = np.rint(b["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({
            "window_start": pa.array(win, pa.int64()),
            "event_type": b["event_type"],
            "value_cents": pa.array(cents),
        })

    agg = (ds.map_batches(window, batch_format="pyarrow")
           .groupby(["window_start", "event_type"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value_cents", alias_name="sum_cents")))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": b["window_start"],
            "event_type": b["event_type"],
            "n_events": b["n_events"],
            "sum_value": pc.divide(
                pc.cast(b["sum_cents"], pa.float64()), pa.scalar(100.0)),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def events_hourly_window_sql() -> str:
    return """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
       event_type,
       count(*) AS n_events,
       sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sessionize(sf_dir: str):
    """Per-user sessionization (30-min gap): → (user_id, n_sessions,
    max_session_events).  Session windows need per-user ordered scans —
    ``groupby(user).map_groups`` with a vectorized gap cumsum."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts) > 30 * 60 * 1_000_000
        sess_id = np.concatenate([[0], np.cumsum(gaps)])
        n_sessions = int(sess_id[-1]) + 1
        counts = np.bincount(sess_id)
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_sessions": [n_sessions],
            "max_session_events": [int(counts.max())],
        })

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def events_sessionize_sql() -> str:
    return """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n FROM sess GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


def events_asof_join(sf_dir: str):
    """As-of join (the time-series point-in-time lookup operator Ray Data
    has no primitive for): each *click* event is joined to the most recent
    *view* event of the SAME user at-or-before its timestamp.

    Ray-Data-first composition: one column-pruned read, a map-side filter
    to the two tagged streams, ONE hash shuffle on the join key
    (``groupby(user_id)``), and a vectorized per-group kernel — both sides
    sorted by time once, then a single ``np.searchsorted`` resolves every
    click's predecessor view.  Partitioning assumption (documented per the
    operator contract): one user's events fit in a worker — the same
    per-key-bounded assumption as ``events_sessionize``; a hot key would be
    salted by time range with boundary handoff of the last pre-boundary
    view row.

    Output per click event: event_id, user_id, ts_us, click_value,
    view_value (null when the user has no prior view), lag_us.
    """
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["click", "view"])))
        ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": pa.array(ts_us, pa.int64()),
            "is_click": pc.equal(b["event_type"], pa.scalar("click")),
            "value": b["value"],
        })

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts_us"].to_numpy()
        is_click = g["is_click"].to_numpy(dtype=bool)
        val = g["value"].to_numpy()
        # (ts, value) lexsort: side='right' lands on the LAST row of a
        # tied-timestamp run, i.e. the max value — a deterministic pick
        # mirrored by the oracle's per-(user, ts) max(value) pre-agg
        vorder = np.lexsort((val[~is_click], ts[~is_click]))
        vts = ts[~is_click][vorder]
        vval = val[~is_click][vorder]
        cts = ts[is_click]
        if len(vts) == 0:          # click-only user: no prior view exists
            n = len(cts)
            view_value = np.full(n, np.nan)
            lag = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
        else:
            idx = np.searchsorted(vts, cts, side="right") - 1
            ok = idx >= 0
            view_value = np.where(ok, vval[np.clip(idx, 0, None)], np.nan)
            lag = np.where(ok, cts - vts[np.clip(idx, 0, None)], 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[is_click],
            "user_id": np.repeat(int(g["user_id"].iloc[0]),
                                 int(is_click.sum())),
            "ts_us": cts,
            "click_value": val[is_click],
            "view_value": view_value,
            # no-match sentinel -1 (COALESCE'd identically in the SQL
            # oracle) keeps the column non-null int64 — type-stable for
            # the driver's value-hash compare
            "lag_us": np.where(ok, lag, -1).astype(np.int64),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("user_id").map_groups(asof, batch_format="pandas"))


def events_asof_join_sql() -> str:
    return """
WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'click'),
     -- max(value) per (user, ts) removes timestamp ties so the ASOF
     -- pick is deterministic (matches the engine's lexsort tie-break)
     views  AS (SELECT user_id, ts, max(value) AS value FROM events
                WHERE event_type = 'view' GROUP BY 1, 2)
SELECT c.event_id AS event_id, c.user_id AS user_id,
       epoch_us(c.ts) AS ts_us, c.value AS click_value,
       v.value AS view_value,
       COALESCE(date_diff('microsecond', v.ts, c.ts), -1) AS lag_us
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
ORDER BY event_id
"""


WINDOW_JOIN_US = 10 * 60 * 1_000_000  # 10-minute look-back band


def events_window_join(sf_dir: str):
    """Time-band (range) join: for each *click*, the count and exact-cents
    sum of the same user's *view* events in the preceding 10 minutes
    (``c.ts - 10min < v.ts <= c.ts``).

    Ray-Data-first: same single ``groupby(user_id)`` shuffle as
    ``events_asof_join``; the per-group kernel is two ``np.searchsorted``
    calls against the time-sorted view stream plus a prefix-sum — every
    click's band resolves in O(log n) with zero pair materialization (a
    naive range join would explode to |clicks|x|views| per user).  Same
    per-key-bounded partitioning assumption as ``events_sessionize``.
    """
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["click", "view"])))
        ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": pa.array(ts_us, pa.int64()),
            "is_click": pc.equal(b["event_type"], pa.scalar("click")),
            # exact integer cents so the sum is order-independent
            "cents": pa.array(np.rint(b["value"].to_numpy() * 100.0)
                              .astype(np.int64)),
        })

    def band(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts_us"].to_numpy()
        is_click = g["is_click"].to_numpy(dtype=bool)
        cents = g["cents"].to_numpy()
        vorder = np.argsort(ts[~is_click], kind="stable")
        vts = ts[~is_click][vorder]
        vprefix = np.concatenate(
            [[0], np.cumsum(cents[~is_click][vorder])])
        cts = ts[is_click]
        lo = np.searchsorted(vts, cts - WINDOW_JOIN_US, side="right")
        hi = np.searchsorted(vts, cts, side="right")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[is_click],
            "user_id": np.repeat(int(g["user_id"].iloc[0]),
                                 int(is_click.sum())),
            "n_views_10m": (hi - lo).astype(np.int64),
            "view_cents_10m": (vprefix[hi] - vprefix[lo]).astype(np.int64),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("user_id").map_groups(band, batch_format="pandas"))


def events_window_join_sql() -> str:
    return """
WITH clicks AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'),
     views  AS (SELECT user_id, ts,
                       CAST(ROUND(value * 100) AS BIGINT) AS cents
                FROM events WHERE event_type = 'view')
SELECT c.event_id AS event_id, c.user_id AS user_id,
       count(v.ts)::BIGINT AS n_views_10m,
       COALESCE(sum(v.cents), 0)::BIGINT AS view_cents_10m
FROM clicks c LEFT JOIN views v
  ON v.user_id = c.user_id
 AND v.ts <= c.ts AND v.ts > c.ts - INTERVAL 10 MINUTE
GROUP BY c.event_id, c.user_id
ORDER BY event_id
"""


HOP_SEC = 900            # 15-minute hop
HOP_WIDTH_HOPS = 4       # 1-hour window = 4 hops


def events_hopping_window(sf_dir: str):
    """Hopping (sliding) 1-hour windows advancing every 15 minutes, per
    event_type: → (window_start, event_type, n_events, sum_value).

    The streaming-window shape the tumbling ``events_hourly_window``
    can't express: each event belongs to ``width/hop`` = 4 overlapping
    windows.  The fan-out is map-side (a 4x ``np.repeat`` tile inside
    the batch — no extra pass over storage, no per-row loop), and the
    only shuffle is the same small keyed aggregate as the tumbling case;
    window cardinality is O(time-range / hop), independent of row count.
    """
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    k = np.arange(HOP_WIDTH_HOPS, dtype=np.int64)

    def fanout(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = (ts_us // (HOP_SEC * 1_000_000)) * HOP_SEC  # epoch sec, hop floor
        cents = np.rint(b["value"].to_numpy() * 100.0).astype(np.int64)
        n = len(base)
        win = np.repeat(base, HOP_WIDTH_HOPS) - np.tile(k * HOP_SEC, n)
        return pa.table({
            "window_start": pa.array(win, pa.int64()),
            "event_type": pa.array(
                np.repeat(b["event_type"].to_numpy(zero_copy_only=False),
                          HOP_WIDTH_HOPS)),
            "value_cents": pa.array(np.repeat(cents, HOP_WIDTH_HOPS)),
        })

    agg = (ds.map_batches(fanout, batch_format="pyarrow")
           .groupby(["window_start", "event_type"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value_cents", alias_name="sum_cents")))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": b["window_start"],
            "event_type": b["event_type"],
            "n_events": b["n_events"],
            "sum_value": pc.divide(
                pc.cast(b["sum_cents"], pa.float64()), pa.scalar(100.0)),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def events_hopping_window_sql() -> str:
    hops = ", ".join(str(i) for i in range(HOP_WIDTH_HOPS))
    return f"""
SELECT (epoch_us(ts) // {HOP_SEC * 1_000_000}) * {HOP_SEC}
         - k.k * {HOP_SEC} AS window_start,
       event_type,
       count(*) AS n_events,
       sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
FROM events CROSS JOIN (SELECT UNNEST([{hops}]) AS k) k
GROUP BY 1, 2
ORDER BY 1, 2
"""


JOIN_BUCKETS = 64


def order_priority_revenue(sf_dir: str):
    """Large-large equi-join (orders ⋈ lineitem on orderkey) → per
    o_orderpriority (n_orders with ≥1 lineitem, revenue = Σ price·(1-disc)).

    Neither side is broadcastable at scale (both grow with SF), so this is
    the partitioned hash join: lineitem revenue is pre-combined per
    orderkey *inside* ``map_batches`` (the map-side combiner — shrinks the
    shuffled lineitem rows to ≤ one per (batch, orderkey)), both sides are
    tagged into ``orderkey % JOIN_BUCKETS`` buckets, and one
    ``groupby(bucket)`` co-locates each key's rows; the per-bucket kernel
    is a vectorized sorted-key ``searchsorted`` probe, not a Python dict.
    Bucket count scales with cluster size; keys are uniform (orderkey is a
    sequence), so no salt is needed.  Final priority rollup is a
    five-group aggregate.  Exact integer 10^-4 units end-to-end.
    """
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount"])

    def tag_orders(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy()
        return pa.table({
            "bucket": pa.array(key % JOIN_BUCKETS),
            "orderkey": pa.array(key),
            "priority": b["o_orderpriority"],
            "rev_e4": pa.array(np.full(len(key), -1, dtype=np.int64)),
        })

    def combine_lineitem(b: pa.Table) -> pa.Table:
        key = b["l_orderkey"].to_numpy()
        price_c = np.rint(b["l_extendedprice"].to_numpy() * 100.0) \
            .astype(np.int64)
        keep_c = np.rint((1.0 - b["l_discount"].to_numpy()) * 100.0) \
            .astype(np.int64)
        rev = price_c * keep_c
        # map-side combine: one row per orderkey per batch
        order = np.argsort(key, kind="stable")
        ks, starts = np.unique(key[order], return_index=True)
        sums = np.add.reduceat(rev[order], starts)
        return pa.table({
            "bucket": pa.array(ks % JOIN_BUCKETS),
            "orderkey": pa.array(ks),
            "priority": pa.array([None] * len(ks), pa.string()),
            "rev_e4": pa.array(sums),
        })

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        lineitem.map_batches(combine_lineitem, batch_format="pyarrow"))

    _empty_join = pa.table({"priority": pa.array([], pa.string()),
                            "n_orders_part": pa.array([], pa.int64()),
                            "rev_e4_part": pa.array([], pa.int64())})

    def bucket_join(g: pa.Table) -> pa.Table:
        # Arrow group block, numpy kernels — no per-group pandas round-trip
        rev_all = g["rev_e4"].to_numpy()
        keys_all = g["orderkey"].to_numpy()
        is_order = rev_all < 0
        okeys = keys_all[is_order]
        if len(okeys) == 0:        # bucket with lineitems but no orders
            return _empty_join
        oprio = g["priority"].to_numpy(zero_copy_only=False)[is_order]
        oorder = np.argsort(okeys, kind="stable")
        okeys, oprio = okeys[oorder], oprio[oorder]
        lkeys = keys_all[~is_order]
        lrev = rev_all[~is_order]
        idx = np.searchsorted(okeys, lkeys)
        hit = (idx < len(okeys))
        idx = np.minimum(idx, len(okeys) - 1)
        hit &= okeys[idx] == lkeys
        if not hit.any():
            return _empty_join
        # revenue per priority: reduceat over priority-sorted matches
        prio = oprio[idx[hit]]
        porder = np.argsort(prio, kind="stable")
        ps, starts = np.unique(prio[porder], return_index=True)
        rev_sums = np.add.reduceat(lrev[hit][porder], starts)
        # distinct matched orders per priority (every orderkey lives in
        # exactly one bucket, so bucket partials sum to the global count)
        uniq_orders = np.unique(idx[hit])
        ops, ocounts = np.unique(oprio[uniq_orders], return_counts=True)
        n_orders = np.zeros(len(ps), dtype=np.int64)
        n_orders[np.searchsorted(ps, ops)] = ocounts
        return pa.table({
            "priority": pa.array(ps, pa.string()),
            "n_orders_part": pa.array(n_orders),
            "rev_e4_part": pa.array(rev_sums.astype(np.int64)),
        })

    joined = tagged.groupby("bucket").map_groups(
        bucket_join, batch_format="pyarrow")

    agg = joined.groupby("priority").aggregate(
        Sum("n_orders_part", alias_name="n_orders"),
        Sum("rev_e4_part", alias_name="rev_e4"))

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": b["priority"],
            "n_orders": b["n_orders"],
            "revenue": pc.divide(pc.cast(b["rev_e4"], pa.float64()),
                                 pa.scalar(10_000.0)),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def order_priority_revenue_sql() -> str:
    return """
SELECT o.o_orderpriority AS o_orderpriority,
       count(DISTINCT o.o_orderkey) AS n_orders,
       sum(round(l.l_extendedprice * 100)::BIGINT
           * round((1 - l.l_discount) * 100)::BIGINT) / 10000.0 AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""


QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def events_value_quantiles(sf_dir: str):
    """Exact discrete quantiles of events.value → (quantile, value).

    The scale shape for exact quantiles over a bounded-resolution domain:
    no global sort.  Values are 2-decimal money, so the full distribution
    compresses to a (cents, count) histogram whose cardinality is bounded
    by the value range — one small ``groupby`` shuffle regardless of row
    count; the quantile lookup is a cumsum over the tiny histogram (a
    driver-side computation over O(distinct-values) rows, not O(rows)).
    For unbounded domains the same pipeline applies after a map-side
    fixed-grid quantization pass (t-digest-style, bounded error).
    """
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({"c": pa.array(
            np.rint(b["value"].to_numpy() * 100.0).astype(np.int64))})

    hist = (ds.map_batches(cents, batch_format="pyarrow")
            .groupby("c").aggregate(Count(alias_name="n"))
            .to_pandas())
    if len(hist) == 0 or "c" not in hist.columns:
        # empty table (Ray drops the schema of an all-empty dataset):
        # the oracle's JOIN yields zero rows too
        return pd.DataFrame({
            "quantile": pd.Series([], dtype=np.float64),
            "value": pd.Series([], dtype=np.float64)})
    hist = hist.sort_values("c").reset_index(drop=True)
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1])
    out_q, out_v = [], []
    for q in QUANTILES:
        rank = max(1, int(np.ceil(q * n)))          # 1-based discrete rank
        i = int(np.searchsorted(cum, rank))
        out_q.append(q)
        out_v.append(int(hist["c"].iloc[i]) / 100.0)
    return pd.DataFrame({"quantile": out_q, "value": out_v})


def events_value_quantiles_sql() -> str:
    qs = ", ".join(str(q) for q in QUANTILES)
    return f"""
WITH s AS (SELECT round(value * 100)::BIGINT AS c FROM events),
ordered AS (SELECT c, row_number() OVER (ORDER BY c) AS rn,
                   count(*) OVER () AS n FROM s),
quantiles AS (SELECT UNNEST([{qs}]) AS q)
SELECT q.q AS quantile, o.c / 100.0 AS value
FROM quantiles q
JOIN ordered o ON o.rn = GREATEST(1, CAST(ceil(q.q * o.n) AS BIGINT))
ORDER BY 1
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(sf_dir: str):
    """Ordered conversion funnel view → click → purchase: → (stage,
    n_users) where a user counts for stage k when the earliest chain
    event-time for stage k exists (stage k's earliest occurrence strictly
    after the user's stage-(k-1) chain time).

    Same single ``groupby(user_id)`` shuffle as sessionize; the per-group
    kernel walks the stage list with one ``searchsorted`` per stage over
    that user's time-sorted events — no pairwise joins, no driver state.
    The stage rollup is a trivial 3-row aggregate.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def chain(g: pd.DataFrame) -> pa.Table:
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        reached = np.zeros(len(FUNNEL_STAGES), dtype=np.int64)
        cursor = -1  # chain time so far (exclusive)
        for k, stage in enumerate(FUNNEL_STAGES):
            st = np.sort(ts[et == stage])
            i = np.searchsorted(st, cursor, side="right")
            if i >= len(st):
                break
            cursor = st[i]
            reached[k] = 1
        return pa.table({
            "stage": pa.array(list(FUNNEL_STAGES), pa.string()),
            "n_part": pa.array(reached),
        })

    return (ds.groupby("user_id").map_groups(chain, batch_format="pandas")
            .groupby("stage").aggregate(Sum("n_part", alias_name="n_users")))


def events_funnel_sql() -> str:
    return """
WITH v AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1)
SELECT 'view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT 'click', count(*) FROM c
UNION ALL SELECT 'purchase', count(*) FROM p
ORDER BY stage
"""

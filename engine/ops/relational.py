"""Generic relational operator layer over the TPC-H-ish fixture tables —
demonstrates the engine's scan/filter/project/aggregate/join/sort surface as
Ray Data pipelines (SURVEY.md §5.5; exercised by the driver's DuckDB oracle).

Float determinism policy for oracle-hash parity: money-like aggregates are
summed as integer cents via ``floor(x*100 + 0.5)`` — the identical IEEE op
sequence in NumPy and DuckDB — because summing doubles in engine-dependent
order diverges in the last ulps and breaks value-hash comparison. Ratios are
single divisions of exact integers (deterministic in both engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.core.context import ensure_hash_shuffle


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def q1_pricing_summary(sf_dir: str, ship_before: str = "1997-09-01"):
    """TPC-H Q1-flavoured: filter + groupby + multi-aggregate over lineitem.

    Vectorised pre-aggregation inside map_batches (partial combine per batch)
    → tiny final groupby — the sum shuffle moves ~|groups| rows per batch,
    not 600k rows (SURVEY.md §4 'pre-aggregate inside map_batches')."""
    cutoff = np.datetime64(ship_before, "us")

    def partial(batch: pa.Table) -> pd.DataFrame:
        mask = batch["l_shipdate"].to_numpy() < cutoff
        df = pd.DataFrame(
            {
                "l_returnflag": np.asarray(batch["l_returnflag"])[mask],
                "l_linestatus": np.asarray(batch["l_linestatus"])[mask],
                "qty_c": cents(batch["l_quantity"].to_numpy()[mask]),
                "price_c": cents(batch["l_extendedprice"].to_numpy()[mask]),
                "disc_c": cents(batch["l_discount"].to_numpy()[mask]),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_cents=("qty_c", "sum"),
            sum_price_cents=("price_c", "sum"),
            sum_disc_cents=("disc_c", "sum"),
            count_order=("qty_c", "size"),
        )
        return g

    ensure_hash_shuffle()
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536)
    from ray.data.aggregate import Sum

    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out = out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    for c in ["sum_qty_cents", "sum_price_cents", "sum_disc_cents", "count_order"]:
        out[c] = out[c].astype("int64")
    return out


def nation_revenue(sf_dir: str):
    """Broadcast join (nation, tiny → ray.put) + hash join
    (orders ⋈ customer via Dataset.join) + grouped sum (SURVEY.md §2.5-J1
    pattern: small side broadcast, large sides shuffled on the key)."""
    import ray

    ensure_hash_shuffle()
    nation = _read(sf_dir, "nation").to_pandas()  # 25 rows — broadcast
    nation_map = dict(zip(nation["n_nationkey"], nation["n_name"]))
    nation_ref = ray.put(nation_map)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def orders_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "price_c": pa.array(cents(batch["o_totalprice"].to_numpy()), type=pa.int64()),
            }
        )

    # join partitions sized to the cluster (a hardcoded 8 becomes the
    # bottleneck the moment the cluster outgrows it — VERDICT r01 #9);
    # aggregator CPUs sized so the join pool can't starve map stages
    from engine.core.context import join_args

    jargs = join_args(n_joins=1)
    joined = orders.map_batches(orders_cents, batch_format="pyarrow", zero_copy_batch=True).join(
        cust, join_type="inner", num_partitions=jargs.pop("num_partitions"),
        on=("o_custkey",), right_on=("c_custkey",), **jargs
    )

    def attach_nation(batch: pa.Table) -> pd.DataFrame:
        nm = ray.get(nation_ref)
        df = pd.DataFrame(
            {
                "n_name": [nm[k] for k in batch["c_nationkey"].to_numpy()],
                "price_c": batch["price_c"].to_numpy(),
            }
        )
        return df.groupby("n_name", as_index=False).agg(
            revenue_cents=("price_c", "sum"), n_orders=("price_c", "size")
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(attach_nation, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def top_orders(sf_dir: str, k: int = 25):
    """Global top-k by sort key with deterministic tie-break
    (o_totalprice cents desc, o_orderkey asc)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "price_cents": pa.array(cents(batch["o_totalprice"].to_numpy()), type=pa.int64()),
            }
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        # per-batch partial top-k: only k rows per block leave the task, so
        # the "global sort" is a tiny driver-side merge, not an all-to-all
        # (same pattern as ann.cosine_topk — VERDICT r01 #9)
        pc_ = batch["price_cents"].to_numpy()
        ok = batch["o_orderkey"].to_numpy()
        order = np.lexsort((ok, -pc_))[:k]
        return batch.take(pa.array(order))

    out = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    out = out.sort_values(["price_cents", "o_orderkey"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate (1h) per event_type over the events table
    (streaming-shaped workload realised as bucket + groupby — SURVEY §2.9)."""
    ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        # epoch seconds (int64) — timestamp representations hash differently
        # across engines, epoch integers don't
        hour_epoch = hour.cast(pa.int64()).to_numpy() // 1_000_000
        df = pd.DataFrame(
            {
                "hour_epoch": hour_epoch,
                "event_type": np.asarray(batch["event_type"]),
                "value_micro": np.floor(batch["value"].to_numpy() * 1e6 + 0.5).astype(np.int64),
            }
        )
        return df.groupby(["hour_epoch", "event_type"], as_index=False).agg(
            n_events=("value_micro", "size"), sum_value_micro=("value_micro", "sum")
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536)
        .groupby(["hour_epoch", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value_micro", alias_name="sum_value_micro"))
        .to_pandas()
        .sort_values(["hour_epoch", "event_type"])
        .reset_index(drop=True)
    )
    out["hour_epoch"] = out["hour_epoch"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value_micro"] = out["sum_value_micro"].astype("int64")
    return out


def events_json_stats(sf_dir: str):
    """JSON scalar-function demo (SURVEY §2.3-F8): parse props, aggregate k."""
    import json

    ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ks = np.fromiter(
            (json.loads(p)["k"] for p in batch["props"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        df = pd.DataFrame({"event_type": np.asarray(batch["event_type"]), "k": ks})
        return df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max")
        )

    from ray.data.aggregate import Max, Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ["n", "sum_k", "max_k"]:
        out[c] = out[c].astype("int64")
    return out


def events_sliding(sf_dir: str, window_hours: int = 24):
    """SLIDING-window aggregate (SURVEY §2.9 follow-up): per event_type, the
    trailing ``window_hours`` sum of event count and value over the hourly
    series — SQL's RANGE BETWEEN (w-1)h PRECEDING AND CURRENT ROW.

    Scale shape: the heavy reduction is the tumbling hourly aggregate
    (events_hourly — per-batch partial then groupby-sum, linear); the window
    pass then runs over the ALREADY-AGGREGATED series, partitioned by
    event_type via groupby.map_groups with a vectorized two-pointer range
    window inside each group. Hours×types rows move, never raw events."""
    import ray.data as rd

    hourly = events_hourly(sf_dir)  # small: |hours| x |types|
    window_sec = (window_hours - 1) * 3600

    def window_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour_epoch").reset_index(drop=True)
        ep = g["hour_epoch"].to_numpy()
        cn = np.concatenate(([0], np.cumsum(g["n_events"].to_numpy())))
        cv = np.concatenate(([0], np.cumsum(g["sum_value_micro"].to_numpy())))
        # rows with hour_epoch in [ep[i] - window_sec, ep[i]]
        left = np.searchsorted(ep, ep - window_sec, side="left")
        idx = np.arange(len(ep)) + 1
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "hour_epoch": ep,
                "w_events": cn[idx] - cn[left],
                "w_value_micro": cv[idx] - cv[left],
            }
        )

    out = (
        rd.from_pandas(hourly)
        .groupby("event_type")
        .map_groups(window_group, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "hour_epoch"])
        .reset_index(drop=True)
    )
    for c in ["hour_epoch", "w_events", "w_value_micro"]:
        out[c] = out[c].astype("int64")
    return out


def events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per user, split the event stream into sessions at
    inactivity gaps > ``gap_minutes``. Columns: user_id, n_events,
    n_sessions, max_session_events.

    Scale shape: events hash-partition by user_id (groupby.map_groups);
    inside each group a vectorized ts-diff marks session starts — no
    per-event Python, no global sort. At 100 TB the per-user event stream
    is the unit of locality, exactly what a keyed shuffle provides."""
    import ray.data as rd

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        starts = np.concatenate(([True], np.diff(ts) > gap_us))
        sid = np.cumsum(starts)  # 1-based session id per event
        sizes = np.bincount(sid)[1:]
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(ts)],
                "n_sessions": [int(sid[-1])],
                "max_session_events": [int(sizes.max())],
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    out = (
        ds.groupby("user_id")
        .map_groups(sessionize, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype({c: "int64" for c in out.columns})


def events_heavy_hitters(sf_dir: str, k: int = 25):
    """Heavy hitters: the k users with the highest total event value —
    per-batch partial (user, sum, count) rows (≤ users-in-block leave each
    block) → one user-keyed groupby-sum → per-block top-k is unnecessary
    because the rollup is already |users| rows; values are micro-fixed ints
    so distributed summation order cannot change the answer. Columns:
    user_id, rank, n_events, sum_value_micro."""
    ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_pylist(),
            "value_micro": np.floor(batch["value"].to_numpy() * 1e6 + 0.5).astype(np.int64),
        })
        return df.groupby("user_id", as_index=False).agg(
            n_events=("value_micro", "size"),
            sum_value_micro=("value_micro", "sum"),
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value_micro", alias_name="sum_value_micro"))
        .to_pandas()
        .sort_values(["sum_value_micro", "user_id"], ascending=[False, True],
                     kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out = out[["user_id", "rank", "n_events", "sum_value_micro"]]
    return out.astype({"rank": "int64", "n_events": "int64",
                       "sum_value_micro": "int64"})


def events_pipeline_aggs(sf_dir: str):
    """Pipeline aggregations (ES `derivative`, `cumulative_sum`,
    `moving_fn` as parent-pipeline aggs over a date_histogram): per
    event_type daily buckets carrying day-over-day delta of the count,
    the running count total, and a trailing 3-BUCKET moving sum of the
    micro value (sum, not avg, to stay integer-exact end to end).
    First-bucket derivative uses lag-default 0 (ES omits it; a column of
    BIGINTs can't hold a hole, and delta-from-zero is the natural join).

    Scale shape: the heavy reduction is the daily tumbling aggregate
    (per-batch partial then ONE groupby-sum — linear, the events_hourly
    shape); pipeline passes then run per event_type over the ALREADY
    aggregated series via groupby.map_groups, vectorized (np.diff /
    cumsum / sliding-row window). Days × types rows move, never raw
    events. Columns: event_type, day_epoch, n_events, deriv_events,
    cum_events, mv3_value_micro."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch["ts"], unit="day")
        day_epoch = day.cast(pa.int64()).to_numpy() // 1_000_000
        df = pd.DataFrame({
            "day_epoch": day_epoch,
            "event_type": np.asarray(batch["event_type"]),
            "value_micro": np.floor(batch["value"].to_numpy() * 1e6 + 0.5).astype(np.int64),
        })
        return df.groupby(["day_epoch", "event_type"], as_index=False).agg(
            n_events=("value_micro", "size"), sum_value_micro=("value_micro", "sum")
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .groupby(["day_epoch", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value_micro", alias_name="sum_value_micro"))
    )

    def pipeline_pass(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day_epoch").reset_index(drop=True)
        n = g["n_events"].to_numpy().astype(np.int64)
        vm = g["sum_value_micro"].to_numpy().astype(np.int64)
        cv = np.concatenate(([0], np.cumsum(vm)))
        idx = np.arange(n.size) + 1
        left = np.maximum(idx - 3, 0)  # trailing 3-row window
        return pd.DataFrame({
            "event_type": g["event_type"],
            "day_epoch": g["day_epoch"].to_numpy().astype(np.int64),
            "n_events": n,
            "deriv_events": np.diff(n, prepend=0),
            "cum_events": np.cumsum(n),
            "mv3_value_micro": cv[idx] - cv[left],
        })

    out = (
        daily.groupby("event_type")
        .map_groups(pipeline_pass, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "day_epoch"])
        .reset_index(drop=True)
    )
    for c in ["day_epoch", "n_events", "deriv_events", "cum_events", "mv3_value_micro"]:
        out[c] = out[c].astype("int64")
    return out


def events_cumulative_cardinality(sf_dir: str):
    """Cumulative-cardinality pipeline aggregation (ES
    `cumulative_cardinality`: distinct users ever seen, per day) — EXACT,
    via the first-seen decomposition: min(day) per user is ONE keyed
    groupby (linear, associative), daily new-user counts are a tiny
    second groupby, and the running total is a vectorized cumsum over the
    |days|-row series. No per-day distinct-set unions, no sketch error.
    Columns: day_epoch, new_users, cum_users."""
    import ray.data as rd
    from ray.data.aggregate import Min

    ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch["ts"], unit="day")
        day_epoch = day.cast(pa.int64()).to_numpy() // 1_000_000
        df = pd.DataFrame({"user_id": batch["user_id"].to_numpy(),
                           "day_epoch": day_epoch})
        return df.groupby("user_id", as_index=False)["day_epoch"].min()

    first_seen = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .groupby("user_id")
        .aggregate(Min("day_epoch", alias_name="first_day"))
    )

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("first_day", as_index=False).size()
        return g.rename(columns={"first_day": "day_epoch", "size": "n"})

    from ray.data.aggregate import Sum

    daily = (
        first_seen.map_batches(day_counts, batch_format="pandas")
        .groupby("day_epoch")
        .aggregate(Sum("n", alias_name="new_users"))
        .to_pandas()
        .sort_values("day_epoch")
        .reset_index(drop=True)
    )
    daily["cum_users"] = daily["new_users"].astype("int64").cumsum()
    return daily.astype({"day_epoch": "int64", "new_users": "int64",
                         "cum_users": "int64"})


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_H = 72  # whole funnel must complete within this many hours


def events_funnel(sf_dir: str):
    """Ordered funnel analysis (the behavioral-analytics staple; ES
    eventstream transforms / product-analytics funnels): per user, the
    deepest prefix of FUNNEL_STEPS completable at STRICTLY increasing
    timestamps with total extent ≤ FUNNEL_WINDOW_H hours — the exact
    chain-existence question the positional span engine answers, so the
    per-user check IS positions.ordered_chain_match on µs timestamps
    (greedy minimizes extent per start ⟹ existence is exact). Output:
    one row per step with the user count reaching it.

    Scale shape: events hash-partition ONCE by user_id (groupby.map_groups
    — the sessionize shape); each group reduces to a 1-row step vector;
    the final reduction is a tiny column sum. Columns: step, event_type,
    n_users."""
    import ray.data as rd

    from engine.index.positions import ordered_chain_match

    ensure_hash_shuffle()
    window_us = FUNNEL_WINDOW_H * 3_600_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        if ts.dtype != np.int64:
            ts = ts.astype(np.int64)
        # pandas may hold ns resolution; normalize to µs
        if ts.size and ts.max() > 4_000_000_000_000_000_000 // 1000:
            ts = ts // 1000
        et = g["event_type"].to_numpy()
        sides = [np.sort(ts[et == s]) for s in FUNNEL_STEPS]
        reach = np.zeros(len(FUNNEL_STEPS), dtype=np.int64)
        for k in range(1, len(FUNNEL_STEPS) + 1):
            if ordered_chain_match(sides[:k], window_us):
                reach[k - 1] = 1
        return pd.DataFrame([{f"s{k}": int(reach[k - 1])
                              for k in range(1, len(FUNNEL_STEPS) + 1)}])

    per = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    rows = []
    for k, step in enumerate(FUNNEL_STEPS, start=1):
        rows.append({"step": k, "event_type": step,
                     "n_users": int(per[f"s{k}"].sum()) if len(per) else 0})
    return pd.DataFrame(rows).astype({"step": "int64", "n_users": "int64"})


RETENTION_DAYS = (7, 13)  # week-1 retention window, inclusive day offsets


def events_retention(sf_dir: str):
    """Cohort retention (product-analytics classic): users cohorted by
    first-seen day; a user is week-1 retained when they have ANY event
    between day first+7 and first+13 (inclusive). Exact, via the same
    first-seen decomposition as cumulative cardinality: per-user day sets
    reduce inside ONE keyed groupby (vectorized searchsorted window
    check), cohort rollup is a tiny second groupby. Columns:
    cohort_day_epoch, n_users, n_retained_w1."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ensure_hash_shuffle()
    lo, hi = RETENTION_DAYS
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        day = (g["ts"].dt.floor("D") - pd.Timestamp(0)).dt.total_seconds()
        days = np.unique(day.to_numpy().astype(np.int64))
        first = int(days[0])
        w0, w1 = first + lo * 86400, first + hi * 86400
        j = np.searchsorted(days, w0)
        retained = int(j < days.size and days[j] <= w1)
        return pd.DataFrame([{"cohort_day_epoch": first, "n": 1,
                              "ret": retained}])

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("cohort_day_epoch")
        .aggregate(Sum("n", alias_name="n_users"),
                   Sum("ret", alias_name="n_retained_w1"))
        .to_pandas()
        .sort_values("cohort_day_epoch")
        .reset_index(drop=True)
    )
    return out.astype({"cohort_day_epoch": "int64", "n_users": "int64",
                       "n_retained_w1": "int64"})


def events_anomaly(sf_dir: str, k: int = 3):
    """Hourly-count anomaly flags (the ops-dashboard "3-sigma spike" check)
    in EXACT integer arithmetic: an hour is anomalous iff
    |x - mean| > k·sigma over the per-event_type hourly count series, tested
    as (n·x - S)² > k²·(n·Q - S²) with S = Σx, Q = Σx² — the ft_extended_stats
    integer-variance identity, so no float mean/std ever enters the
    comparison and SQL reproduces it bit-for-bit.

    Shape: the heavy pass is the distributed hourly partial-combine +
    ONE (hour × type)-sized groupby (events_hourly's exchange); the series
    itself (≤ hours × types rows — ~10⁴ for a year of one pipeline) is then
    scanned per type with vectorized numpy. Python ints would be needed
    beyond ~3e9 events/hour (n·x overflowing int64) — counts here are far
    below that; the SQL side uses HUGEINT and would catch drift.

    Columns: event_type, hour_epoch, n_events, is_anomaly (int64 0/1)."""
    hourly = events_hourly(sf_dir)[["hour_epoch", "event_type", "n_events"]]
    out = []
    for et, g in hourly.groupby("event_type", sort=True):
        x = g["n_events"].to_numpy().astype(object)  # exact bigint math
        n = len(x)
        S = x.sum()
        Q = (x * x).sum()
        lhs = (n * x - S) ** 2
        rhs = (k * k) * (n * Q - S * S)
        flag = (lhs > rhs).astype(np.int64)
        out.append(pd.DataFrame({
            "event_type": et,
            "hour_epoch": g["hour_epoch"].to_numpy(),
            "n_events": g["n_events"].to_numpy(),
            "is_anomaly": flag,
        }))
    res = pd.concat(out, ignore_index=True).sort_values(
        ["event_type", "hour_epoch"]).reset_index(drop=True)
    res["event_type"] = res["event_type"].astype(str)
    return res.astype({"hour_epoch": "int64", "n_events": "int64",
                       "is_anomaly": "int64"})


ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # last-click attribution window


def events_attribution(sf_dir: str) -> pd.DataFrame:
    """As-of join (last-click attribution): every `purchase` event joins the
    same user's most recent PRIOR `click` — "prior" in strict (ts, event_id)
    order (event_id breaks timestamp ties deterministically) — kept only
    when the gap is within 24 h. The inequality-join class Ray Data lacks
    natively (SURVEY J4), expressed as sort-within-group + forward-fill.

    Scale shape: the corpus reduces to slim (user_id, event_id, ts_us,
    is_click) rows in ONE column-pruned scan; ONE keyed
    groupby(user_id).map_groups sorts each user's stream and forward-fills
    the last click index (np vectorized) — users are the natural partition
    key, no cross-user state exists, and group size is user-activity-bounded.

    Columns: purchase_id, user_id, click_id, gap_us (all int64)."""
    import ray.data as rd

    def slim(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array(["click", "purchase"]))
        t = batch.filter(m)
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "is_click": pc.cast(pc.equal(t["event_type"], "click"), pa.int8()),
        })

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="stable").reset_index(drop=True)
        is_click = g["is_click"].to_numpy() == 1
        idx = np.arange(len(g))
        last_click = np.where(is_click, idx, -1)
        # forward-fill the most recent click STRICTLY before each row
        last_click = np.maximum.accumulate(last_click)
        prior = np.concatenate(([-1], last_click[:-1]))
        pm = (~is_click) & (prior >= 0)
        if not pm.any():
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                 ("purchase_id", "user_id", "click_id", "gap_us")})
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        gap = ts[pm] - ts[prior[pm]]
        keep = gap <= ATTR_WINDOW_US
        return pd.DataFrame({
            "purchase_id": eid[pm][keep],
            "user_id": g["user_id"].to_numpy(np.int64)[pm][keep],
            "click_id": eid[prior[pm]][keep],
            "gap_us": gap[keep],
        })

    out = (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(attribute, batch_format="pandas")
        .to_pandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    return out.astype("int64")


HLL_P = 6                 # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_SUFFIX_BITS = 64 - HLL_P


def events_hll_registers(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) over distinct
    user_ids: hash = first-16-hex of md5(user_id) (the engine's
    SQL-replayable 64-bit idiom), register = hash mod 64, rank = leading
    zeros of the remaining 58 bits + 1 (suffix 0 ⇒ 59), register value =
    MAX rank. The registers ARE the sketch state — mergeable across
    partitions by elementwise max, which is exactly what the groupby(Max)
    combine does — and the bounded-memory sibling of the exact
    count-distinct (X24): 64 small ints at ANY corpus size. The float
    harmonic-mean ESTIMATE stays out of the hashed contract (pytest audits
    its relative error; registers are the exact artifact).

    Columns: reg (0..63), max_rank (0 = register never hit)."""
    import hashlib

    import ray.data as rd
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pd.DataFrame:
        uids = np.unique(batch["user_id"].to_numpy())
        hv = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:16], 16)
             for u in uids), count=uids.size, dtype=np.uint64)
        reg = (hv % np.uint64(HLL_M)).astype(np.int64)
        suffix = hv >> np.uint64(HLL_P)
        # vectorized bit_length: shift loop (58 iterations of vector ops)
        bl = np.zeros(suffix.size, dtype=np.int64)
        tmp = suffix.copy()
        while tmp.any():
            bl += (tmp > 0).astype(np.int64)
            tmp >>= np.uint64(1)
        rank = np.where(suffix == 0, HLL_SUFFIX_BITS + 1,
                        HLL_SUFFIX_BITS - bl + 1).astype(np.int64)
        df = pd.DataFrame({"reg": reg, "max_rank": rank})
        return df.groupby("reg", as_index=False)["max_rank"].max()

    got = (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("reg")
        .aggregate(Max("max_rank", alias_name="max_rank"))
        .to_pandas()
    )
    out = pd.DataFrame({"reg": np.arange(HLL_M, dtype=np.int64),
                        "max_rank": np.zeros(HLL_M, dtype=np.int64)})
    out.loc[got["reg"].to_numpy(), "max_rank"] = got["max_rank"].to_numpy()
    return out.astype("int64")


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"  # segment cutoff, TPC-H Q3's classic parameters
Q3_TOPK = 10


def shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 (shipping priority): revenue of undelivered orders from one
    market segment — customer ⋈ orders ⋈ lineitem with date predicates on
    BOTH fact tables, grouped by order, top-10 by revenue. The canonical
    multi-join + filter-pushdown benchmark query.

    Scale shape: predicates apply AT THE SCAN (segment filter on customer,
    date filters inside the map stage before any exchange — only
    surviving slim rows shuffle); two keyed hash joins sized to the
    cluster; revenue as exact integer cents Σ floor(price·(1−disc)·100+0.5)
    (single fused float expression, identical IEEE sequence in SQL);
    per-block partial top-k + tiny driver merge, no global sort.

    Columns: o_orderkey, o_orderdate_epoch, revenue_cents."""
    import ray.data as rd

    from engine.core.context import join_args

    ensure_hash_shuffle()
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def cust_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["c_mktsegment"], Q3_SEGMENT)).select(["c_custkey"])

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_filter(b: pa.Table) -> pa.Table:
        cutoff = pa.scalar(np.datetime64(Q3_DATE, "us"))
        b = b.filter(pc.less(b["o_orderdate"], cutoff))
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_orderdate_epoch": pc.cast(b["o_orderdate"], pa.int64()),
        })

    line = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_extendedprice", "l_discount",
                          "l_shipdate"])

    def line_rev(b: pa.Table) -> pa.Table:
        cutoff = pa.scalar(np.datetime64(Q3_DATE, "us"))
        b = b.filter(pc.greater(b["l_shipdate"], cutoff))
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "rev_c": pa.array(rev, type=pa.int64()),
        })

    jargs = join_args(n_joins=2)
    np_parts = jargs.pop("num_partitions")
    oc = orders.map_batches(ord_filter, batch_format="pyarrow",
                            zero_copy_batch=True).join(
        cust.map_batches(cust_filter, batch_format="pyarrow",
                         zero_copy_batch=True),
        join_type="inner", num_partitions=np_parts,
        on=("o_custkey",), right_on=("c_custkey",), **jargs)
    joined = line.map_batches(line_rev, batch_format="pyarrow",
                              zero_copy_batch=True).join(
        oc, join_type="inner", num_partitions=np_parts,
        on=("l_orderkey",), right_on=("o_orderkey",), **jargs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "o_orderdate_epoch"],
                       as_index=False)["rev_c"].sum()
        return g.rename(columns={"l_orderkey": "o_orderkey",
                                 "rev_c": "revenue_cents"})

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["o_orderkey", "o_orderdate_epoch"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "o_orderkey"],
                              ascending=[False, True]).head(Q3_TOPK)

    out = (
        agg.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["revenue_cents", "o_orderkey"], ascending=[False, True])
        .head(Q3_TOPK)
        .reset_index(drop=True)
    )
    return out[["o_orderkey", "o_orderdate_epoch", "revenue_cents"]].astype("int64")

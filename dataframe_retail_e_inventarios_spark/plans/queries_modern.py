"""Modern SQL surface (Spark 4.x parity-plus): recursive CTEs, the
VARIANT semi-structured type, and SQL-defined scalar functions.

These exercise engine features the reference's pandas scripts have no
analogue for, but that a user migrating a warehouse workload expects:

- `inventory_projection_recursive` — a WITH RECURSIVE simulation of the
  reorder policy the flagship computes statically: week-by-week on-hand
  depletion with reorder-point triggered replenishment. Runs as a
  genuine recursive CTE in BOTH engines (Spark 4 SPARK-24497 /
  DuckDB), identical SQL semantics.
- `events_props_variant` — parse_json into a VARIANT column and
  variant_get extraction (the Spark 4 path for schema-on-read JSON;
  the DuckDB oracle uses json_extract on the same predicate).
- `sql_udf_discount_bands` — CREATE TEMPORARY FUNCTION (SQL UDF,
  Spark 4): a reusable scalar banding function that Catalyst inlines
  into the plan — zero Python, zero serialization, same codegen as
  writing the CASE inline (the oracle IS the inlined CASE).

Scale posture: the recursion depth is bounded (trailing
PROJECTION_WEEKS weeks), each recursion step is one narrow join
against a per-product position frame — state per step is one row per
product, so the simulation is linear in products and constant-factor
in weeks. VARIANT extraction and SQL UDFs are per-row expressions
(embarrassingly parallel, no shuffle beyond their aggregates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from . import oracle_fragments as _OF
from ..registry import register
from ..sources.readers import load_table

_R4_SQL = "round_even(({x}) * 10000.0, 0) / 10000.0"

PROJECTION_WEEKS = 52  # trailing fit window AND recursion-depth bound


# -- recursive-CTE inventory projection ------------------------------------
# Policy constants: reorder point = 2x average weekly demand, order
# quantity = 4x average weekly demand, starting stock = ROP + Q.
# (The flagship computes the analytic ROP/Q; this PROJECTS the policy
# forward through observed demand to count orders and stockouts.)
_SIM_SQL = """
WITH RECURSIVE
pos AS (SELECT product_id, t, demand, rop, oq FROM {src}),
sim AS (
  SELECT product_id, CAST(0 AS BIGINT) AS t,
         rop + oq AS on_hand,
         CAST(0 AS BIGINT) AS orders_placed, CAST(0 AS BIGINT) AS stockout_weeks
  FROM pos WHERE t = 1
  UNION ALL
  SELECT s.product_id, s.t + 1,
         CASE WHEN greatest(s.on_hand - p.demand, 0.0) < p.rop
              THEN greatest(s.on_hand - p.demand, 0.0) + p.oq
              ELSE greatest(s.on_hand - p.demand, 0.0) END,
         s.orders_placed + (CASE WHEN greatest(s.on_hand - p.demand, 0.0) < p.rop THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
         s.stockout_weeks + (CASE WHEN s.on_hand - p.demand < 0.0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
  FROM sim s JOIN pos p ON p.product_id = s.product_id AND p.t = s.t + 1
),
last_t AS (SELECT product_id, max(t) AS m FROM pos GROUP BY 1)
SELECT s.product_id, l.m AS n_weeks,
       {round_fn}(s.on_hand * 10000.0, 0) / 10000.0 AS end_on_hand,
       s.orders_placed, s.stockout_weeks
FROM sim s JOIN last_t l ON s.product_id = l.product_id AND s.t = l.m
"""


def _positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-product trailing-window position frame: t (1-based week
    position), integral weekly demand, and the policy constants derived
    from exact BIGINT sums (so both engines simulate from bit-identical
    inputs)."""
    from ..operators.cleaning import clean_sales
    from ..operators.resample import weekly_dense_resample

    sales = clean_sales(load_table(spark, sf_dir, "lineitem"))
    dense = weekly_dense_resample(sales, ["product_id"], "invoice_date", "units_sold")
    w = Window.partitionBy("product_id").orderBy("week")
    wp = Window.partitionBy("product_id")
    pos = (
        dense.select(
            "product_id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.bround(F.col("units_sold"), 0).cast("long").alias("demand"),
        )
        .withColumn("n_all", F.count("*").over(wp))
        .withColumn("off", F.greatest(F.col("n_all") - PROJECTION_WEEKS, F.lit(0)))
        .filter((F.col("rn") > F.col("off")) & (F.col("n_all") >= 12))
        .select(
            "product_id",
            (F.col("rn") - F.col("off")).alias("t"),
            F.col("demand").cast("double").alias("demand"),
        )
    )
    avg = pos.groupBy("product_id").agg(
        (F.sum("demand") / F.count("*")).alias("avg_w")
    )
    return pos.join(avg, "product_id").select(
        "product_id",
        "t",
        "demand",
        (2.0 * F.col("avg_w")).alias("rop"),
        (4.0 * F.col("avg_w")).alias("oq"),
    )


TOPK_PRODUCTS = 2000  # recursion population bound (see q docstring)


def _topk_positions(pos: DataFrame, k: int = TOPK_PRODUCTS) -> DataFrame:
    """Restrict the position frame to the top-k products by exact
    total trailing demand (ties broken by product_id)."""
    totals = pos.groupBy("product_id").agg(
        F.sum("demand").cast("long").alias("tot")
    )
    topk = (
        totals.orderBy(F.col("tot").desc(), "product_id")
        .limit(k)
        .select("product_id")
    )
    return pos.join(F.broadcast(topk), "product_id")


def q_inventory_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. The recursion is Spark 4's native
    WITH RECURSIVE (depth = PROJECTION_WEEKS ≤ the engine's recursion
    limit of 100); the same SQL text (modulo source binding) runs as
    the DuckDB oracle.

    The simulated population is the TOP-2000 products by trailing
    demand: a recursive CTE executes one sequential join per level
    (52 engine round-trips), so its row count must be a PLANNING
    choice, not a corpus-proportional one — at sf0.1 the unbounded
    form walked products × weeks ≈ 1.04M recursion rows in ~49 s of
    lockstep levels. Capped, the recursion is 2000 × 52 rows at ANY
    scale factor (sub-second, and comfortably inside Spark's default
    1e6-row recursion valve, which this query no longer touches).
    The uncapped every-product simulation is the FOLD twin below
    (inventory_projection_folded) — same policy arithmetic, one
    shuffle, no lockstep levels."""
    # Materialize the position frame once: every recursion level
    # reads `pos`, and without the cut each of the 52 levels would
    # re-derive the whole dense-resample pipeline (52 full scans).
    # After the checkpoint each level joins a small in-memory frame
    # — the same rule as the PageRank loop in queries_trend. The
    # 4-partition layout cuts the per-level task count: the frame is
    # ≤ 2000x52 rows, and at 32 default partitions each of the 52
    # UnionLoop levels schedules 8x the tasks for the same data
    # (measured 14.2 s -> 9.9 s at sf0.1 from this one change; a
    # BROADCAST(pos) hint is WORSE — the build is re-broadcast every
    # level, 24 s cold).
    # _topk_positions consumes the position frame TWICE (totals +
    # join), so cut its lineage first or the dense-resample pipeline
    # runs two full passes (measured: half the 10 s pos-build wall).
    pos_all = _positions(spark, sf_dir).localCheckpoint(eager=True)
    pos = (
        _topk_positions(pos_all)
        .repartition(4, "product_id")
        .localCheckpoint(eager=True)
    )
    pos.createOrReplaceTempView("_inv_pos")
    # Same SQL text as the oracle modulo the half-even rounding
    # builtin name (Spark: bround, DuckDB: round_even).
    return spark.sql(_SIM_SQL.format(src="_inv_pos", round_fn="bround"))


def q_inventory_projection_folded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB path for the SAME simulation over EVERY product: the
    recursion is sequential per product but independent ACROSS
    products, so it folds as a per-series array aggregate — one
    product shuffle, a calendar-bounded (≤52-element) array per group,
    and a single F.aggregate pass replaying the identical double
    arithmetic in the identical order. No lockstep levels, no
    recursion valve. The DuckDB oracle IS the recursive CTE over all
    products — the two formulations must agree bit-for-bit."""
    pos = _positions(spark, sf_dir)
    grouped = pos.groupBy("product_id").agg(
        F.sort_array(F.collect_list(F.struct("t", "demand"))).alias("arr"),
        F.first("rop").alias("rop"),
        F.first("oq").alias("oq"),
        F.count("*").alias("n_weeks"),
    )
    state0 = F.struct(
        (F.col("rop") + F.col("oq")).alias("on_hand"),
        F.lit(0).cast("long").alias("orders"),
        F.lit(0).cast("long").alias("stk"),
    )

    def step(s, x):
        depleted = F.greatest(s["on_hand"] - x["demand"], F.lit(0.0))
        reorder = depleted < F.col("rop")
        return F.struct(
            F.when(reorder, depleted + F.col("oq")).otherwise(depleted).alias("on_hand"),
            (s["orders"] + reorder.cast("long")).alias("orders"),
            (s["stk"] + (s["on_hand"] - x["demand"] < 0).cast("long")).alias("stk"),
        )

    final = F.aggregate("arr", state0, step)
    return grouped.select(
        "product_id",
        "n_weeks",
        (F.bround(final["on_hand"] * 10000.0, 0) / 10000.0).alias("end_on_hand"),
        final["orders"].alias("orders_placed"),
        final["stk"].alias("stockout_weeks"),
    )


_ORACLE_POS = f"""
WITH {_OF.CLEAN_SALES_CTE.strip()},
weekly AS (
  SELECT product_id,
         CAST(invoice_date AS DATE)
           + CAST((7 - isodow(CAST(invoice_date AS DATE))) % 7 AS INTEGER) AS week,
         sum(units_sold) AS units_sold
  FROM sales GROUP BY 1, 2
),
bounds AS (
  SELECT product_id, min(week) AS mn, max(week) AS mx FROM weekly GROUP BY 1
),
spine AS (
  SELECT product_id,
         CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
                                     INTERVAL 7 DAY)) AS DATE) AS week
  FROM bounds
),
dense AS (
  SELECT s.product_id, s.week, coalesce(w.units_sold, 0.0) AS units_sold
  FROM spine s LEFT JOIN weekly w USING (product_id, week)
),
ranked AS (
  SELECT product_id,
         CAST(row_number() OVER (PARTITION BY product_id ORDER BY week) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY product_id) AS BIGINT) AS n_all,
         CAST(round_even(units_sold, 0) AS BIGINT) AS demand
  FROM dense
),
trimmed AS (
  SELECT product_id, rn - greatest(n_all - {PROJECTION_WEEKS}, 0) AS t,
         CAST(demand AS DOUBLE) AS demand
  FROM ranked
  WHERE rn > greatest(n_all - {PROJECTION_WEEKS}, 0) AND n_all >= 12
),
avg_w AS (
  SELECT product_id, sum(demand) / count(*) AS avg_w FROM trimmed GROUP BY 1
),
src AS (
  SELECT t.product_id, t.t, t.demand,
         2.0::DOUBLE * a.avg_w AS rop, 4.0::DOUBLE * a.avg_w AS oq
  FROM trimmed t JOIN avg_w a USING (product_id)
)
"""

# DuckDB requires WITH RECURSIVE up front; splice the position CTEs in.
_ORACLE_SIM = _SIM_SQL.format(src="src", round_fn="round_even").replace(
    "WITH RECURSIVE\npos", _ORACLE_POS.replace("WITH ", "WITH RECURSIVE ", 1) + ",\npos"
)

# Top-k-restricted oracle for the registered recursive form: same
# position CTEs plus the deterministic top-k cut.
_TOPK_CTES = f"""
tot AS (SELECT product_id, CAST(sum(demand) AS BIGINT) AS tot FROM src GROUP BY 1),
topk AS (SELECT product_id FROM tot ORDER BY tot DESC, product_id LIMIT {TOPK_PRODUCTS}),
src2 AS (SELECT s.* FROM src s JOIN topk USING (product_id))
"""
_ORACLE_SIM_TOPK = _SIM_SQL.format(src="src2", round_fn="round_even").replace(
    "WITH RECURSIVE\npos",
    _ORACLE_POS.replace("WITH ", "WITH RECURSIVE ", 1) + "," + _TOPK_CTES + ",\npos",
)

register("inventory_projection_recursive", q_inventory_projection, _ORACLE_SIM_TOPK)
register("inventory_projection_folded", q_inventory_projection_folded, _ORACLE_SIM)


# -- VARIANT semi-structured extraction ------------------------------------
def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the event props JSON via Spark 4's VARIANT
    type: parse once, extract typed paths with variant_get, aggregate.
    Deciles of the extracted k per event type — the pattern for
    semi-structured telemetry where columns aren't known at write time.
    (events_props_json is the from_json/schema-known twin.)"""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_ev_variant")
    # Parse each props string ONCE in a subquery (not three times per
    # row), and via try_parse_json so a malformed payload degrades to
    # NULL — matching the oracle's json_extract semantics — instead of
    # failing the whole query.
    return spark.sql(
        """
        SELECT event_type,
               CAST(floor(k / 10.0) AS INT) AS k_decile,
               count(*) AS n,
               sum(CAST(k AS BIGINT)) AS k_sum
        FROM (
          SELECT event_type,
                 variant_get(try_parse_json(props), '$.k', 'int') AS k
          FROM _ev_variant
        )
        WHERE k IS NOT NULL
        GROUP BY 1, 2
        """
    )


register(
    "events_props_variant",
    q_events_props_variant,
    """
SELECT event_type,
       CAST(floor(CAST(json_extract(props, '$.k') AS INTEGER) / 10.0) AS INTEGER) AS k_decile,
       count(*) AS n,
       -- sum(BIGINT) is HUGEINT in DuckDB and pandas-fetches as
       -- float64; re-cast so the driver hash sees int64 like Spark
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
FROM events
WHERE CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL
GROUP BY 1, 2
""",
)


# -- VARIANT construction + shredding round-trip ----------------------------
def q_events_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write side of the VARIANT story (r7 verdict #8):
    ``to_variant_object`` packs each event's typed columns AND its
    schema-on-read JSON payload into ONE variant, then typed paths are
    shredded back out with ``variant_get`` and aggregated. The oracle
    computes the same aggregate from the raw columns, so a hash match
    proves the build->shred round-trip is lossless for every row —
    the guarantee a lakehouse needs before storing telemetry as
    VARIANT instead of N typed columns. (events_props_variant is the
    read-side twin over raw JSON strings.)"""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_ev_shred")
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n,
               sum(CAST(k AS BIGINT)) AS k_sum,
               CAST(sum(CAST(bround(val * 10000, 0) AS BIGINT))
                    AS BIGINT) AS val_e4_sum
        FROM (
          SELECT variant_get(v, '$.type', 'string') AS event_type,
                 variant_get(v, '$.val', 'double') AS val,
                 variant_get(v, '$.payload.k', 'int') AS k
          FROM (
            SELECT to_variant_object(named_struct(
                     'type', event_type,
                     'val', value,
                     'payload', try_parse_json(props))) AS v
            FROM _ev_shred
          )
        )
        WHERE k IS NOT NULL
        GROUP BY 1
        """
    )


register(
    "events_variant_shred",
    q_events_variant_shred,
    """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(sum(CAST(round_even(value * 10000, 0) AS BIGINT)) AS BIGINT)
         AS val_e4_sum
FROM events
WHERE CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL
GROUP BY 1
""",
)


# -- SQL-defined scalar function (CREATE FUNCTION) -------------------------
def q_sql_udf_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reusable banding logic as a SQL UDF (Spark 4 CREATE FUNCTION):
    declared once, inlined by Catalyst wherever referenced — the
    governed-semantics answer to copy-pasted CASE expressions, with
    none of a Python UDF's serialization cost. The oracle inlines the
    identical CASE, proving the UDF is pure sugar over the same plan."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_udf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION discount_band(d DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN d < 0.02 THEN 'none'
                    WHEN d < 0.06 THEN 'light'
                    ELSE 'deep' END
        """
    )
    return spark.sql(
        """
        SELECT discount_band(l_discount) AS band,
               count(*) AS n,
               -- divide by 1e4, not 10000.0: in SQL text a decimal
               -- literal makes BIGINT/DECIMAL a DECIMAL division, so
               -- toPandas yields object-dtype Decimal cells where the
               -- DuckDB oracle yields float64 (r3 driver hash miss)
               sum(CAST(bround(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 1e4 AS revenue
        FROM _li_udf
        GROUP BY 1
        """
    )


register(
    "sql_udf_discount_bands",
    q_sql_udf_bands,
    """
SELECT CASE WHEN l_discount < 0.02 THEN 'none'
            WHEN l_discount < 0.06 THEN 'light'
            ELSE 'deep' END AS band,
       count(*) AS n,
       sum(CAST(round_even(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 1e4 AS revenue
FROM lineitem
GROUP BY 1
""",
)


# -- built-in session_window (batch) ---------------------------------------
def q_session_window_builtin(
    spark: SparkSession, sf_dir: str, *, gap_min: int = 30
) -> DataFrame:
    """Spark's native session_window(ts, gap) run in batch — the same
    gap semantics events_sessionization derives from first
    principles (lag + cumulative flag). Registering BOTH against
    independent oracles cross-validates Spark's built-in operator
    against the gaps-and-islands construction: window.end is
    last_event + gap by definition, which the oracle reproduces as
    max(ts) + INTERVAL gap MINUTE. One user-keyed shuffle; the session
    merge happens inside the aggregate (no self-join). Gap geometry is
    fuzz-injectable (tools/fuzz_oracles.py) — the closed-interval
    merge boundary is re-proved at every drawn gap."""
    from ..functions.timewall import wall_epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", f"{gap_min} minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            wall_epoch_seconds(F.col("session_window.start")).alias("start_epoch"),
            wall_epoch_seconds(F.col("session_window.end")).alias("end_epoch"),
            "n_events",
        )
    )


def session_window_builtin_sql(gap_min: int = 30) -> str:
    return f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         -- Spark merges on a CLOSED interval: an event at exactly
         -- prev + gap still joins the session (probed on 4.1.2; the
         -- boundary unit test locks it in) -> new session only when
         -- the gap strictly exceeds the gap interval.
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL {gap_min} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM seq
),
numbered AS (
  -- The running sum MUST tie-break on event_id exactly like the lag()
  -- above: with ts-only ordering, two boundary events sharing a ts
  -- could fold into the wrong session depending on scan order.
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id,
       CAST(floor(epoch_us(min(ts)) / 1000000) AS BIGINT) AS start_epoch,
       CAST(floor(epoch_us(max(ts) + INTERVAL {gap_min} MINUTE) / 1000000) AS BIGINT) AS end_epoch,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_no
"""


register(
    "events_session_window_builtin",
    q_session_window_builtin,
    session_window_builtin_sql(),
)


# -- time-RANGE window frame (trailing 28 days) ----------------------------
def q_trailing_28d_range(
    spark: SparkSession, sf_dir: str, *, window_days: int = 28
) -> DataFrame:
    """Trailing-window_days demand per product per day using a RANGE
    frame over epoch-day ordering — the time-based frame the
    rowsBetween family can't express (rows != days when days are
    missing; a RANGE frame weights actual dates, so gaps shrink the
    window's content instead of stretching its span). One
    product-keyed sort; integral demand sums stay BIGINT-exact inside
    the frame. Frame geometry is fuzz-injectable
    (tools/fuzz_oracles.py) — the N-1 PRECEDING off-by-one between
    'trailing N days' and the frame bound is re-proved per draw. The
    output column stays named units_28d at every drawn width (schema
    stability across draws)."""
    from ..operators.cleaning import clean_sales

    sales = clean_sales(load_table(spark, sf_dir, "lineitem"))
    daily = (
        sales.groupBy(
            "product_id", F.to_date("invoice_date").alias("day")
        )
        .agg(F.sum(F.bround("units_sold", 0).cast("long")).alias("units"))
        .withColumn("epoch_day", F.unix_date(F.col("day")).cast("long"))
    )
    w = (
        Window.partitionBy("product_id")
        .orderBy("epoch_day")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "product_id",
        "epoch_day",
        "units",
        F.sum("units").over(w).alias("units_28d"),
    )


def trailing_28d_range_sql(window_days: int = 28) -> str:
    return f"""
WITH {_OF.CLEAN_SALES_CTE.strip()},
daily AS (
  -- CAST around both sums: DuckDB's sum(BIGINT) (incl. window sum)
  -- is HUGEINT -> float64 on pandas fetch, mismatching Spark's int64
  SELECT product_id, CAST(invoice_date AS DATE) AS day,
         CAST(sum(CAST(round_even(units_sold, 0) AS BIGINT)) AS BIGINT) AS units
  FROM sales GROUP BY 1, 2
),
keyed AS (
  SELECT product_id, CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS epoch_day, units
  FROM daily
)
SELECT product_id, epoch_day, units,
       CAST(sum(units) OVER (PARTITION BY product_id ORDER BY epoch_day
                             RANGE BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS units_28d
FROM keyed
"""


register("trailing_28d_range_frame", q_trailing_28d_range, trailing_28d_range_sql())


# -- SQL LATERAL correlated subquery ---------------------------------------
_LATERAL_SQL = """
SELECT b.p_brand, t.l_partkey, t.rev_cents
FROM (SELECT DISTINCT p_brand FROM part) b,
LATERAL (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem l JOIN part p2 ON l.l_partkey = p2.p_partkey
  WHERE p2.p_brand = b.p_brand
  GROUP BY l.l_partkey
  ORDER BY rev_cents DESC, l.l_partkey
  LIMIT 3
) t
"""


def q_lateral_topk_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts per brand via a correlated LATERAL subquery
    — the SQL-standard form of per-group top-k (identical text runs on
    DuckDB as the oracle; the window-function form of the same shape
    is topk_parts_per_supplier). Catalyst decorrelates the lateral
    into a join + per-group limit, so this is a declarative-surface
    query, not a nested-loop: revenue sums are exact integer cents."""
    for t in ("part", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


register("lateral_topk_per_brand", q_lateral_topk_per_brand, _LATERAL_SQL)


# -- pandas GROUPED_AGG UDF (Series -> scalar) -----------------------------
def q_geomean_grouped_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric-mean quantity per return flag via a pandas
    GROUPED_AGG UDF — the Arrow-batched aggregate-UDF surface
    (Series -> scalar, usable in groupBy().agg() like any builtin).
    The UDF returns the scaled-BIGINT sum of logs (exact, order-
    independent); the geometric mean closes natively as
    exp(sum/n/1e6), so the result is hash-comparable to the SQL
    oracle despite Python in the loop. The all-native twin (same
    expression without the UDF) is differential-tested in
    tests/test_grouped_udf.py — at 100 TB you'd ship the native form;
    this query pins the API surface."""
    from ..functions.udafs import sum_scaled_log_udf

    sum_scaled_log = sum_scaled_log_udf()
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    # Spark disallows mixing GROUPED_AGG UDFs with native aggregates in
    # one agg(): close counts in a second tiny aggregate and join on
    # the 3-key group (broadcast).
    g_udf = li.groupBy("l_returnflag").agg(
        sum_scaled_log("l_quantity").alias("slog")
    )
    g_n = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    g = g_udf.join(F.broadcast(g_n), "l_returnflag")
    return g.select(
        "l_returnflag",
        "n",
        F.round(F.exp(F.col("slog") / F.col("n") / 1e6), 6).alias("geomean_qty"),
    )


register(
    "geomean_demand_grouped_udf",
    q_geomean_grouped_udf,
    """
SELECT l_returnflag, count(*) AS n,
       round(exp(sum(CAST(round(ln(l_quantity) * 1e6, 0) AS BIGINT))
                 / CAST(count(*) AS DOUBLE) / 1e6), 6) AS geomean_qty
FROM lineitem WHERE l_quantity > 0
GROUP BY l_returnflag
""",
)


# -- SQL pipe syntax (Spark 4 |> operators) ----------------------------------
def q_sql_pipe_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pricing-summary shape written in Spark 4's SQL pipe syntax
    (FROM ... |> WHERE ... |> AGGREGATE ... |> ORDER BY): each |> stage
    is parsed into the SAME logical operators as the classic form, so
    Catalyst's pushdown/pruning/whole-stage-codegen apply unchanged —
    the oracle is the classic-syntax equivalent, proving the sugar is
    plan-neutral. Money stays on the exact-cents discipline
    (scaled-BIGINT sums, one double division in the projection)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_pipe")
    return spark.sql(
        """
        FROM _li_pipe
        |> WHERE l_shipdate <= DATE'1998-09-02'
        |> AGGREGATE
             count(*) AS n_rows,
             sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
             sum(CAST(bround(l_extendedprice * 100, 0) AS BIGINT)) AS _base_cents,
             sum(CAST(bround(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
               AS _disc_tenths
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_rows, sum_qty,
                  _base_cents / 1e2 AS sum_base_price,
                  _disc_tenths / 1e4 AS sum_disc_price
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


register(
    "sql_pipe_pricing_summary",
    q_sql_pipe_pricing,
    """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       sum(CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)) / 1e2
         AS sum_base_price,
       sum(CAST(round_even(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 1e4
         AS sum_disc_price
FROM lineitem
WHERE l_shipdate <= DATE'1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)


# -- ordered string aggregation (LISTAGG, Spark 4.0+) ------------------------
def q_priority_order_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG WITHIN GROUP (Spark 4.0's ANSI ordered string
    aggregation): per (priority, status) bucket, a deterministic
    comma-joined manifest of the 5 highest-value order keys plus the
    bucket stats — the human-readable rollup shape (top examples per
    cell) every ops report needs. The top-5 cut is a bounded
    per-bucket window (25 buckets x rows, partition-parallel, never
    global); the LISTAGG orders by the EXACT integer price so the
    string is engine-independent. DuckDB twin: string_agg(...ORDER
    BY...) over the same window cut."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    cents = F.bround(F.col("o_totalprice") * 100, 0).cast("long")
    w = Window.partitionBy("o_orderpriority", "o_orderstatus").orderBy(
        F.col("price_i").desc(), F.col("o_orderkey")
    )
    top = (
        orders.select(
            "o_orderpriority",
            "o_orderstatus",
            "o_orderkey",
            cents.alias("price_i"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    top.createOrReplaceTempView("_manifest_top")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_top,
               listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY price_i DESC, o_orderkey) AS top_orders,
               CAST(max(price_i) AS BIGINT) / 1e2 AS max_price
        FROM _manifest_top
        GROUP BY 1, 2
        """
    )


register(
    "priority_order_manifest",
    q_priority_order_manifest,
    """
WITH top AS (
  SELECT o_orderpriority, o_orderstatus, o_orderkey,
         CAST(round_even(o_totalprice * 100, 0) AS BIGINT) AS price_i,
         row_number() OVER (PARTITION BY o_orderpriority, o_orderstatus
                            ORDER BY CAST(round_even(o_totalprice * 100, 0) AS BIGINT) DESC,
                                     o_orderkey) AS rn
  FROM orders
)
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_top,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY price_i DESC, o_orderkey)
         AS top_orders,
       CAST(max(price_i) AS BIGINT) / 1e2 AS max_price
FROM top
WHERE rn <= 5
GROUP BY 1, 2
""",
)

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** One registered, DuckDB-oracle-checked query per relational operator
  * category of SURVEY.md §2.2.
  *
  * The reference (`/root/reference/src/catenae/catenae.py:456-461`) has a
  * single data-shaping operator — the per-message `transform` with
  * falsy-drop — so the relational surface here is the engine's own, built
  * Spark-first: declarative DataFrame plans, broadcast hints on dimension
  * tables, no collect, total ORDER BY + rounded floats for oracle
  * determinism (SURVEY.md §5.2).
  */
object RelationalQueries {

  /** A registered query: Spark plan + optional DuckDB oracle SQL. */
  final case class Q(name: String,
                     fn: (SparkSession, String) => DataFrame,
                     oracle: Option[String])

  private def q(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  private def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  // ---------------------------------------------------------------- scans+agg

  /** Flagship: TPC-H-Q1-style pricing summary — scan → filter → groupBy →
    * agg → orderBy. Exercises the reference's whole transform surface (O3)
    * in one declarative plan; filter + pruning reach the parquet scan. */
  val q01PricingSummary: Q = q("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 2) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ------------------------------------------------------------------- joins

  /** TPC-H-Q5-style 6-table join chain: revenue by nation for one region
    * and one order year. Dimensions (region, nation, supplier) are
    * broadcast; the lineitem⋈orders join shuffles on the key both sides
    * already share. */
  val q02JoinChain: Q = q("q02_join_chain",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_rows
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val c = Tables.customer(s, d)
    val su = broadcast(Tables.supplier(s, d))
    val n = broadcast(Tables.nation(s, d))
    val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_rows"))
      .orderBy("n_name")
  }

  /** Explicit broadcast join: fact ⋈ small dim, agg per brand. */
  val q03BroadcastJoin: Q = q("q03_broadcast_join",
    """SELECT p_brand,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  round(avg(l_quantity), 2) AS avg_qty, count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'PROMO'
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           round(avg("l_quantity"), 2).as("avg_qty"),
           count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Left-semi join (EXISTS): customers having a big order. */
  val q04SemiJoin: Q = q("q04_semi_join",
    """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no urgent order. */
  val q05AntiJoin: Q = q("q05_anti_join",
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  round(sum(c_acctbal), 2) AS sum_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("sum_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** Theta join: nation pairs within a region (equi on region + `<` on key).
    * Planned as a broadcast join with the non-equi residual. */
  val q06ThetaJoin: Q = q("q06_theta_join",
    """SELECT r_name, n1.n_name AS nation_a, n2.n_name AS nation_b
      |FROM nation n1
      |JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
      |               AND n1.n_nationkey < n2.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |ORDER BY r_name, nation_a, nation_b""".stripMargin) { (s, d) =>
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("k1"),
      col("n_name").as("nation_a"), col("n_regionkey").as("rk1"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("k2"),
      col("n_name").as("nation_b"), col("n_regionkey").as("rk2"))
    n1.join(broadcast(n2), col("rk1") === col("rk2") && col("k1") < col("k2"))
      .join(broadcast(Tables.region(s, d)), col("rk1") === col("r_regionkey"))
      .select("r_name", "nation_a", "nation_b")
      .orderBy("r_name", "nation_a", "nation_b")
  }

  /** As-of join, Spark-first: instead of a per-row lookup join, union both
    * sides with a tag and forward-fill the most recent left-side timestamp
    * with a window — one shuffle on (user_id), linear in input, no join.
    * For each purchase event: the latest click by the same user at or
    * before it. Oracle uses DuckDB's native ASOF JOIN. */
  val q07AsofJoin: Q = q("q07_asof_join",
    """SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS purchase_ms,
      |       epoch_ms(c.ts) AS last_click_ms
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    // join at MICROsecond precision like the oracle's ASOF (p.ts >= c.ts
    // compares full timestamps — a millisecond-truncated join key would
    // admit a same-millisecond click the oracle rejects); only the OUTPUT
    // is milliseconds
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
      .withColumn("last_click_us", col("c_us"))
    graft.ops.Relational.asOfJoin(purchases, clicks, key = Seq("user_id"),
        leftTs = "p_us", rightTs = "c_us", rightCols = Seq("last_click_us"))
      .select(col("event_id"), col("user_id"),
        expr("p_us div 1000").as("purchase_ms"),
        expr("last_click_us div 1000").as("last_click_ms"))
      .orderBy("event_id")
  }

  /** Range (interval) join: equi key + range predicate on time — lineitems
    * shipped within 90 days of their order, rolled up by order month. */
  val q24RangeJoin: Q = q("q24_range_join",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |  count(*) AS n_shipped_90d
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      |GROUP BY 1 ORDER BY order_month""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAY"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(count(lit(1)).as("n_shipped_90d"))
      .orderBy("order_month")
  }

  /** Pure interval join (no shared equi-key) via
    * [[graft.ops.Relational.bucketedIntervalJoin]]: how many lineitems
    * (corpus-wide, ANY order) shipped inside each sampled order's
    * 30-day window. Without bucketing this is a broadcast nested loop —
    * every point compared against every interval; bucketized it is a
    * hash equi-join on 32-day epoch-day buckets plus the exact range
    * filter (plan-asserted in RelationalOpsSpec). The oracle states the
    * plain interval-predicate semantics directly. */
  val q135BucketedRangeJoin: Q = q("q135_bucketed_range_join",
    """WITH iv AS (SELECT o_orderkey, o_orderdate AS lo FROM orders
      |            WHERE o_orderkey % 150 = 0)
      |SELECT o_orderkey, count(*) AS n_in_window
      |FROM iv JOIN lineitem
      |  ON l_shipdate >= lo AND l_shipdate <= lo + INTERVAL 29 DAY
      |GROUP BY 1 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val iv = Tables.orders(s, d).filter(col("o_orderkey") % 150 === 0)
      .select(col("o_orderkey"),
        unix_date(col("o_orderdate").cast("date")).cast("long").as("lo"))
      .withColumn("hi", col("lo") + 29)
    val pts = Tables.lineitem(s, d)
      .select(unix_date(col("l_shipdate").cast("date")).cast("long").as("pt"))
    graft.ops.Relational.bucketedIntervalJoin(pts, iv, "pt", "lo", "hi",
        bucketWidth = 32)
      .groupBy("o_orderkey").agg(count(lit(1)).as("n_in_window"))
      .orderBy("o_orderkey")
  }

  /** GROUPING SETS (beyond rollup/cube): two independent 1-D rollups in one
    * pass. */
  val q25GroupingSets: Q = q("q25_grouping_sets",
    """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
      |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY orderstatus, orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |  count(*) AS n_orders
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY orderstatus, orderpriority""".stripMargin)
  }

  /** Unpivot (wide → long) via stack — the melt surface. */
  val q26Unpivot: Q = q("q26_unpivot",
    """SELECT o_orderkey, metric, round(value, 2) AS value FROM (
      |  SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders)
      |WHERE o_orderkey < 100
      |ORDER BY o_orderkey, metric""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        expr("stack(2, 'custkey', CAST(o_custkey AS DOUBLE), " +
          "'totalprice', o_totalprice) AS (metric, value)"))
      .select(col("o_orderkey"), col("metric"), round(col("value"), 2).as("value"))
      .orderBy("o_orderkey", "metric")
  }

  /** Batch analog of the streaming tumbling window: `window()` in a batch
    * groupBy (the streaming form is validated on MemoryStream in
    * StreamingOpsSpec; DuckDB mirrors with epoch-aligned time_bucket). */
  val q27TumblingBatch: Q = q("q27_tumbling_batch",
    """SELECT epoch_ms(time_bucket(INTERVAL 6 HOUR, ts)) AS bucket_ms,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1 ORDER BY bucket_ms""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("bucket_ms"), col("n"), col("sum_value"))
      .orderBy("bucket_ms")
  }

  /** Time-series gap fill: per-user dense hourly series (sequence +
    * explode) left-joined against actual counts, zero-filled — hours with
    * no events appear with n = 0. */
  val q61GapFill: Q = q("q61_gap_fill",
    """WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h, value
      |            FROM events WHERE user_id < 10),
      |counts AS (SELECT user_id, h, CAST(count(*) AS BIGINT) AS n,
      |           round(sum(value), 2) AS sum_value FROM ev GROUP BY 1, 2),
      |spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY 1),
      |dense AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |          FROM spans)
      |SELECT d.user_id, epoch_ms(d.h) AS hour_ms,
      |  CAST(coalesce(n, 0) AS BIGINT) AS n,
      |  round(coalesce(sum_value, 0), 2) AS sum_value
      |FROM dense d LEFT JOIN counts c ON d.user_id = c.user_id AND d.h = c.h
      |ORDER BY d.user_id, hour_ms""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("user_id") < 10)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
    val counts = ev.groupBy("user_id", "h")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    val dense = ev.groupBy("user_id").agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    dense.join(counts, Seq("user_id", "h"), "left")
      .select(col("user_id"), unix_millis(col("h")).as("hour_ms"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("sum_value"), lit(0d)), 2).as("sum_value"))
      .orderBy("user_id", "hour_ms")
  }

  // ------------------------------------------------------------ aggregations

  /** Distinct aggregation: exact count_distinct + plain aggs per status. */
  val q08AggDistinct: Q = q("q08_agg_distinct",
    """SELECT o_orderstatus, count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  round(sum(o_totalprice), 2) AS sum_price,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price,
      |  round(median(o_totalprice), 2) AS median_price,
      |  round(stddev_samp(o_totalprice), 2) AS sd_price,
      |  round(corr(o_totalprice, o_custkey), 4) AS price_cust_corr
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           countDistinct(col("o_custkey")).as("n_customers"),
           round(sum("o_totalprice"), 2).as("sum_price"),
           round(min("o_totalprice"), 2).as("min_price"),
           round(max("o_totalprice"), 2).as("max_price"),
           round(median(col("o_totalprice")), 2).as("median_price"),
           round(stddev_samp(col("o_totalprice")), 2).as("sd_price"),
           round(corr(col("o_totalprice"), col("o_custkey")), 4).as("price_cust_corr"))
      .orderBy("o_orderstatus")
  }

  /** ROLLUP hierarchy totals (nulls folded to 'ALL' for stable ordering
    * across engines). */
  val q09Rollup: Q = q("q09_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("n_rows"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")
  }

  /** CUBE over two order dimensions. */
  val q10Cube: Q = q("q10_cube",
    """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
      |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
              col("n_orders"), col("sum_price"))
      .orderBy("orderstatus", "orderpriority")
  }

  /** HLL approximate distinct — estimator differs across engines by design,
    * so no value oracle; ScalaTest bounds the relative error instead. */
  val q11ApproxDistinct: Q = rowsOnly("q11_approx_distinct") { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
           approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")
  }

  /** Boolean / bitwise / regression aggregate battery. */
  val q49StatAggs: Q = q("q49_stat_aggs",
    """SELECT o_orderstatus,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      |  bit_and(o_custkey) AS key_and,
      |  bit_or(o_custkey) AS key_or,
      |  bit_xor(o_custkey) AS key_xor,
      |  round(regr_slope(o_totalprice, o_custkey), 4) AS slope,
      |  round(regr_intercept(o_totalprice, o_custkey), 2) AS icept,
      |  round(covar_samp(o_totalprice, o_custkey), 2) AS cov
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d).groupBy("o_orderstatus")
      .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
           bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
           bit_and(col("o_custkey")).as("key_and"),
           bit_or(col("o_custkey")).as("key_or"),
           bit_xor(col("o_custkey")).as("key_xor"),
           round(regr_slope(col("o_totalprice"), col("o_custkey")), 4).as("slope"),
           round(regr_intercept(col("o_totalprice"), col("o_custkey")), 2).as("icept"),
           round(covar_samp("o_totalprice", "o_custkey"), 2).as("cov"))
      .orderBy("o_orderstatus")
  }

  // ----------------------------------------------------------------- windows

  /** Ranking window: top-3 orders per customer (deterministic tie-break). */
  val q12WindowTopk: Q = q("q12_window_topk",
    """SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 2) AS totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    graft.ops.Relational.topKPerGroup(Tables.orders(s, d), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
              round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Analytic windows: lag / lead / running sum / rank over event time. */
  val q13WindowRunning: Q = q("q13_window_running",
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type,
      |  round(value, 2) AS value,
      |  round(sum(value) OVER w_run, 2) AS running_value,
      |  lag(event_type) OVER w AS prev_type,
      |  lead(event_type) OVER w AS next_type,
      |  rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |    RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW), 2) AS sum_10min,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  round(percent_rank() OVER w, 4) AS pct_rank,
      |  round(cume_dist() OVER w, 4) AS cdist,
      |  first_value(event_type) OVER w AS first_type
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  w_run AS (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val wRank = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d).filter(col("user_id") < 30)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_type"), round(col("value"), 2).as("value"),
        round(sum("value").over(wRun), 2).as("running_value"),
        lag("event_type", 1).over(w).as("prev_type"),
        lead("event_type", 1).over(w).as("next_type"),
        rank().over(wRank).cast("long").as("value_rank"),
        round(sum("value").over(Window.partitionBy("user_id")
          .orderBy(unix_millis(col("ts"))).rangeBetween(-600000, 0)), 2).as("sum_10min"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cdist"),
        first("event_type").over(w).as("first_type"))
      .orderBy("event_id")
  }

  /** Batch sessionization (gaps-and-islands): session = events of a user
    * separated by ≤ 30 min; one shuffle on user_id, two window passes. */
  val q14Sessionize: Q = q("q14_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, event_id,
      |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
      |           OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events WHERE user_id < 40),
      |sessions AS (
      |  SELECT user_id, ms, event_id,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id_raw
      |  FROM flagged)
      |SELECT user_id, CAST(session_id_raw AS BIGINT) AS session_id,
      |  min(ms) AS session_start_ms,
      |  max(ms) AS session_end_ms, count(*) AS n_events
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val base = Tables.events(s, d).filter(col("user_id") < 40)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"))
    graft.ops.Relational.sessionize(base, Seq("user_id"), "ms",
        gapMs = 1800000, tieBreak = Seq("event_id"))
      .groupBy("user_id", "session_id")
      .agg(min("ms").as("session_start_ms"), max("ms").as("session_end_ms"),
           count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  // ------------------------------------------------------------ sorts/setops

  /** Global top-k: Catalyst plans TakeOrderedAndProject (no full sort). */
  val q15SortLimit: Q = q("q15_sort_limit",
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
      |  o_orderpriority
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice"), 2).as("totalprice"), col("o_orderpriority"))
  }

  /** Set operations: UNION / INTERSECT / EXCEPT (all distinct semantics),
    * tagged and stacked into one deterministic result. */
  val q16SetOps: Q = q("q16_set_ops",
    """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
    |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7500)
    |SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    |UNION ALL
    |SELECT 'only_auto' AS tag, c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    |UNION ALL
    |SELECT 'either' AS tag, c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
    |ORDER BY tag, c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val a = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    val b = c.filter(col("c_acctbal") > 7500).select("c_custkey")
    a.intersect(b).select(lit("both").as("tag"), col("c_custkey"))
      .unionAll(a.except(b).select(lit("only_auto").as("tag"), col("c_custkey")))
      .unionAll(a.union(b).distinct().select(lit("either").as("tag"), col("c_custkey")))
      .orderBy("tag", "c_custkey")
  }

  // -------------------------------------------------------------- scalar fns

  /** String function battery (row-level, bounded slice). */
  val q17StringFns: Q = q("q17_string_fns",
    """SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
      |  length(c_name) AS name_len, substring(c_name, 1, 8) AS name_prefix,
      |  concat_ws('|', c_mktsegment, c_name) AS tagged,
      |  replace(c_name, 'Customer', 'C') AS short_name,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
      |  split_part(c_name, '#', 2) AS name_num,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      |  c_name LIKE 'Customer%' AS is_customer,
      |  trim(reverse(c_name)) AS rev_name,
      |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
      |  CAST(ascii(c_name) AS BIGINT) AS first_char_code,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
      |  repeat(substring(c_name, 1, 2), 2) AS doubled_prefix
      |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
        // literal replace / split_part (not regex / element_at): exact
        // parity with the oracle's literal semantics — regex metachars in
        // the needle and absent delimiters ('' vs NULL) diverge otherwise
        expr("replace(c_name, 'Customer', 'C')").as("short_name"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        expr("split_part(c_name, '#', 2)").as("name_num"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        col("c_name").startsWith("Customer").as("is_customer"),
        trim(reverse(col("c_name"))).as("rev_name"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        ascii(col("c_name")).cast("long").as("first_char_code"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        repeat(substring(col("c_name"), 1, 2), 2).as("doubled_prefix"))
      .orderBy("c_custkey")
  }

  /** Date/time rollup: orders per month with epoch bounds. */
  val q18DateTrunc: Q = q("q18_date_trunc",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price,
      |  min(epoch_ms(o_orderdate)) AS first_ms, max(epoch_ms(o_orderdate)) AS last_ms
      |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"),
           min(unix_millis(col("o_orderdate").cast("timestamp"))).as("first_ms"),
           max(unix_millis(col("o_orderdate").cast("timestamp"))).as("last_ms"))
      .orderBy("order_month")
  }

  /** Date/time scalar battery (row-level, bounded slice). */
  val q19DateScalar: Q = q("q19_date_scalar",
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
      |  year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
      |  day(o_orderdate) AS o_day, quarter(o_orderdate) AS o_quarter,
      |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
      |  CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
      |  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
      |  epoch_ms(o_orderdate) AS odate_ms,
      |  last_day(o_orderdate) AS month_end,
      |  CAST(dayofyear(o_orderdate) AS BIGINT) AS o_doy,
      |  CAST(weekofyear(o_orderdate) AS BIGINT) AS o_week,
      |  make_date(CAST(year(o_orderdate) AS INTEGER),
      |            CAST(month(o_orderdate) AS INTEGER), 1) AS month_start
      |FROM orders WHERE o_orderkey < 150 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 150)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"),
        year(col("o_orderdate")).cast("long").as("o_year"), month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"), quarter(col("o_orderdate")).cast("long").as("o_quarter"),
        add_months(col("o_orderdate"), 1).as("next_month"),
        date_add(col("o_orderdate"), 90).as("due_date"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long").as("days_since_95"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
        last_day(col("o_orderdate")).as("month_end"),
        dayofyear(col("o_orderdate")).cast("long").as("o_doy"),
        weekofyear(col("o_orderdate")).cast("long").as("o_week"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .as("month_start"))
      .orderBy("o_orderkey")
  }

  /** Math scalar battery (row-level, bounded slice; per-row rounding keeps
    * cross-engine float drift below the hash compare's resolution). */
  val q20MathFns: Q = q("q20_math_fns",
    """SELECT l_orderkey, l_linenumber,
      |  round(sqrt(l_quantity), 4) AS sqrt_qty,
      |  round(ln(l_extendedprice), 4) AS ln_price,
      |  round(pow(l_discount, 2), 6) AS disc_sq,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
      |  abs(l_discount - l_tax) > 0.05 AS spread_gt5,
      |  l_linenumber % 3 AS ln_mod3,
      |  round(greatest(l_discount, l_tax), 2) AS max_rate,
      |  round(least(l_discount, l_tax), 2) AS min_rate,
      |  CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
      |  round(exp(l_discount), 4) AS exp_disc,
      |  round(log10(l_extendedprice), 4) AS log10_price,
      |  round(sin(l_discount), 6) AS sin_disc,
      |  round(atan2(l_discount, l_tax + 0.01), 4) AS angle,
      |  round(degrees(l_discount), 4) AS disc_deg
      |FROM lineitem WHERE l_orderkey < 60 ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") < 60)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        floor(col("l_extendedprice")).as("floor_price"),
        (abs(col("l_discount") - col("l_tax")) > 0.05).as("spread_gt5"),
        (col("l_linenumber") % 3).as("ln_mod3"),
        round(greatest(col("l_discount"), col("l_tax")), 2).as("max_rate"),
        round(least(col("l_discount"), col("l_tax")), 2).as("min_rate"),
        signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
        round(exp(col("l_discount")), 4).as("exp_disc"),
        round(log10(col("l_extendedprice")), 4).as("log10_price"),
        round(sin(col("l_discount")), 6).as("sin_disc"),
        round(atan2(col("l_discount"), col("l_tax") + 0.01), 4).as("angle"),
        round(degrees(col("l_discount")), 4).as("disc_deg"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** JSON extraction (`events.props` is a JSON string, reference O13:
    * `utils.py:19-39`) aggregated by extracted key. */
  val q21JsonFns: Q = q("q21_json_fns",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |  count(*) AS n, round(sum(value), 2) AS sum_value,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT) AS k_check
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, d) =>
    // from_json with an explicit schema: one codegen'd parse per row
    // (get_json_object re-parses per extraction path)
    Tables.events(s, d)
      .groupBy(from_json(col("props"), "k INT",
        Map.empty[String, String]).getField("k").as("k"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
           // same extraction via the per-path API — proves both JSON surfaces
           min(get_json_object(col("props"), "$.k").cast("int")).as("k_check"))
      .orderBy("k")
  }

  /** Array/higher-order battery on tokenized text (row-level slice). */
  val q22ArrayFns: Q = q("q22_array_fns",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), ' ') AS first3,
      |  list_contains(string_split(text, ' '), 'data') AS has_data,
      |  len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long_tokens,
      |  len(list_filter(string_split(text, ' '), t -> length(t) > 7)) > 0 AS any_len8,
      |  len(list_filter(string_split(text, ' '), t -> length(t) >= 1))
      |    = len(string_split(text, ' ')) AS all_nonempty
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 3), " ").as("first3"),
        array_contains(toks, "data").as("has_data"),
        size(filter(toks, t => length(t) > 4)).cast("long").as("n_long_tokens"),
        exists(toks, t => length(t) > 7).as("any_len8"),
        forall(toks, t => length(t) >= 1).as("all_nonempty"))
      .orderBy("doc_id")
  }

  /** Conditional aggregation (pivot-style counts per event type). */
  val q23ConditionalAgg: Q = q("q23_conditional_agg",
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0))
    Tables.events(s, d).groupBy("user_id")
      .agg(cnt("click").as("n_click"), cnt("view").as("n_view"),
           cnt("purchase").as("n_purchase"), cnt("error").as("n_error"),
           cnt("signup").as("n_signup"),
           round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0d)), 2)
             .as("purchase_value"))
      .orderBy("user_id")
  }

  /** Real `.pivot()` (long → wide) with pinned pivot values — the inverse
    * of q26's unpivot; oracle via conditional aggregation. */
  val q28Pivot: Q = q("q28_pivot",
    """SELECT o_orderpriority,
      |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS sum_f,
      |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS sum_o,
      |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS sum_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      // pinned pivot values: no extra distinct-values job, stable schema
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .select(col("o_orderpriority"), col("F").as("sum_f"),
              col("O").as("sum_o"), col("P").as("sum_p"))
      .orderBy("o_orderpriority")
  }

  /** MapType battery: JSON → map, map_concat, map_keys, element_at,
    * transform_values, map_filter. The oracle computes the same values
    * from the JSON text directly. */
  val q29MapFns: Q = q("q29_map_fns",
    """SELECT event_id, 'k,src' AS keys,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  CAST(2 AS BIGINT) AS n_entries,
      |  upper(event_type) AS src_upper,
      |  CAST(1 AS BIGINT) AS n_k
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, d) =>
    val m = from_json(col("props"), "map<string,string>", Map.empty[String, String])
    val m2 = map_concat(m, map(lit("src"), col("event_type")))
    Tables.events(s, d).filter(col("event_id") < 200)
      .select(col("event_id"),
        array_join(array_sort(map_keys(m2)), ",").as("keys"),
        element_at(m, "k").cast("long").as("k_val"),
        size(m2).cast("long").as("n_entries"),
        element_at(transform_values(m2, (_, v) => upper(v)), "src").as("src_upper"),
        size(map_filter(m2, (k, _) => k === "k")).cast("long").as("n_k"))
      .orderBy("event_id")
  }

  /** Generator / UDTF surface: posexplode (ordinal-preserving flatten).
    * DuckDB mirrors with zipped unnests. */
  val q37Posexplode: Q = q("q37_posexplode",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS s
      |           FROM documents WHERE doc_id < 50)
      |SELECT doc_id, CAST(unnest(range(0, len(s))) AS BIGINT) AS pos,
      |       unnest(s) AS tok
      |FROM t ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
      .orderBy("doc_id", "pos")
  }

  /** Exact quantiles via ANSI `percentile_disc` — value-returning (no
    * interpolation), so results are bit-identical across engines; the
    * interpolating `percentile`/quantile_cont form drifts by an ulp at
    * round-half boundaries, and the sketch-based approx_percentile path is
    * engine-specific (tested like q11's HLL). */
  val q38Quantiles: Q = q("q38_quantiles",
    """SELECT l_returnflag,
      |  round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p25,
      |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p50,
      |  round(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p75,
      |  round(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p90,
      |  round(percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    // ONE sorted-array aggregate serving all five quantiles, not five
    // independent percentile_disc aggregates (each buffers every group
    // value — 5× the memory and 7s vs <2s at sf0.1). ANSI
    // percentile_disc(p) = the smallest value whose cumulative
    // distribution ≥ p = the 1-based ceil(p·n)-th element in sort order
    // (holds under ties too).
    def pd(p: Double) = element_at(col("arr"),
      ceil(lit(p) * size(col("arr"))).cast("int"))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(sort_array(collect_list(col("l_extendedprice"))).as("arr"))
      .select(col("l_returnflag"),
        round(pd(0.25), 2).as("p25"), round(pd(0.5), 2).as("p50"),
        round(pd(0.75), 2).as("p75"), round(pd(0.9), 2).as("p90"),
        round(pd(0.99), 2).as("p99"))
      .orderBy("l_returnflag")
  }

  /** Interpolated quantiles — ANSI percentile_cont, the continuous
    * sibling of q38's percentile_disc: h = 1 + p·(n−1) over the sorted
    * values, result = a[⌊h⌋] + (h−⌊h⌋)·(a[⌊h⌋+1] − a[⌊h⌋]). The chain is
    * bit-identical to DuckDB's native percentile_cont (probed exact on
    * the fixtures before registering); one sorted-array aggregate serves
    * all four quantiles, like q38. */
  val q105PercentileCont: Q = q("q105_percentile_cont",
    """SELECT l_returnflag,
      |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25,
      |  round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50,
      |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p75,
      |  round(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    def pc(p: Double) = {
      val arr = col("arr")
      val h = lit(1.0) + lit(p) * (size(arr) - 1).cast("double")
      val lo = element_at(arr, floor(h).cast("int"))
      val hi = element_at(arr, least(floor(h) + 1, size(arr).cast("long")).cast("int"))
      lo + (h - floor(h)) * (hi - lo)
    }
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(sort_array(collect_list(col("l_extendedprice"))).as("arr"))
      .select(col("l_returnflag"),
        round(pc(0.25), 4).as("p25"), round(pc(0.5), 4).as("p50"),
        round(pc(0.75), 4).as("p75"), round(pc(0.95), 4).as("p95"))
      .orderBy("l_returnflag")
  }

  /** Window frame battery: bounded ROWS frames (moving average,
    * centered window), nth_value / last_value over an explicit frame —
    * the frame variants q13's running battery doesn't touch. */
  val q48WindowFrames: Q = q("q48_window_frames",
    """SELECT event_id, user_id,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS centered3,
      |  round(nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS second_value,
      |  round(last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS final_value
      |FROM events WHERE user_id < 20 ORDER BY event_id""".stripMargin) { (s, d) =>
    val base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d).filter(col("user_id") < 20)
      .select(col("event_id"), col("user_id"),
        round(avg("value").over(base.rowsBetween(-2, 0)), 4).as("mavg3"),
        round(sum("value").over(base.rowsBetween(-1, 1)), 2).as("centered3"),
        round(nth_value(col("value"), 2)
          .over(base.rowsBetween(Window.unboundedPreceding, 0)), 2).as("second_value"),
        round(last("value").over(
          base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 2)
          .as("final_value"))
      .orderBy("event_id")
  }

  /** Ordered string aggregation (listagg/string_agg — SQL:2023). */
  val q39StringAgg: Q = q("q39_string_agg",
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  count(*) AS n
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
    Tables.nation(s, d).createOrReplaceTempView("nation_sa")
    Tables.region(s, d).createOrReplaceTempView("region_sa")
    s.sql(
      """SELECT r_name,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation_sa JOIN region_sa ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  }

  // -------------------------------------------------------------- subqueries

  /** Scalar subquery: Catalyst plans the aggregate once and broadcasts the
    * scalar into the filter (no per-row re-evaluation). */
  val q45ScalarSubquery: Q = q("q45_scalar_subquery",
    """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
      |FROM orders
      |WHERE o_totalprice > 1.8 * (SELECT round(avg(o_totalprice), 2) FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    // the avg is rounded BEFORE the threshold compare: partial-agg
    // summation order differs across engines by last ulps, and 60k raw
    // row-membership tests against an unrounded scalar would ride on
    // that drift (every other float oracle masks drift the same way)
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    s.sql(
      """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        |FROM orders_sq
        |WHERE o_totalprice > 1.8 * (SELECT round(avg(o_totalprice), 2) FROM orders_sq)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated EXISTS subquery — the SQL-planner path (rewritten to a
    * left-semi join); q04 covers the same semantics via the DataFrame API. */
  val q46ExistsSubquery: Q = q("q46_exists_subquery",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE c_acctbal > 9000 AND EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer_sq")
    Tables.orders(s, d).createOrReplaceTempView("orders_sq2")
    s.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM customer_sq c
        |WHERE c_acctbal > 9000 AND EXISTS (
        |  SELECT 1 FROM orders_sq2 o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** IN subquery (rewritten to semi join on the inner distinct). */
  val q47InSubquery: Q = q("q47_in_subquery",
    """SELECT p_partkey, p_brand
      |FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d).createOrReplaceTempView("part_sq")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sq")
    s.sql(
      """SELECT p_partkey, p_brand
        |FROM part_sq
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem_sq WHERE l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** Table profiler ([[graft.ops.Profile.profile]]): per-column non-null
    * count, exact distinct count, and min/max over every lineitem column —
    * the ANALYZE surface. A union of column-pruned single-column
    * aggregate arms (same total bytes as one scan on a columnar source;
    * the one-agg Expand alternative measured 27 s vs 1.5 s — see the
    * op's scaladoc); the oracle recomputes each column's stats
    * independently. Min/max/counts are raw values, no arithmetic →
    * engine-exact. */
  val q91TableProfile: Q = q("q91_table_profile",
    """SELECT 'l_orderkey' AS col_name, 'bigint' AS dtype, count(l_orderkey) AS n_nonnull, count(DISTINCT l_orderkey) AS n_distinct, CAST(min(l_orderkey) AS DOUBLE) AS min_num, CAST(max(l_orderkey) AS DOUBLE) AS max_num, CAST(NULL AS VARCHAR) AS min_text, CAST(NULL AS VARCHAR) AS max_text FROM lineitem
      |UNION ALL SELECT 'l_partkey', 'bigint', count(l_partkey), count(DISTINCT l_partkey), CAST(min(l_partkey) AS DOUBLE), CAST(max(l_partkey) AS DOUBLE), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_suppkey', 'bigint', count(l_suppkey), count(DISTINCT l_suppkey), CAST(min(l_suppkey) AS DOUBLE), CAST(max(l_suppkey) AS DOUBLE), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_linenumber', 'int', count(l_linenumber), count(DISTINCT l_linenumber), CAST(min(l_linenumber) AS DOUBLE), CAST(max(l_linenumber) AS DOUBLE), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_quantity', 'double', count(l_quantity), count(DISTINCT l_quantity), min(l_quantity), max(l_quantity), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_extendedprice', 'double', count(l_extendedprice), count(DISTINCT l_extendedprice), min(l_extendedprice), max(l_extendedprice), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_discount', 'double', count(l_discount), count(DISTINCT l_discount), min(l_discount), max(l_discount), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_tax', 'double', count(l_tax), count(DISTINCT l_tax), min(l_tax), max(l_tax), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_returnflag', 'string', count(l_returnflag), count(DISTINCT l_returnflag), NULL, NULL, min(l_returnflag), max(l_returnflag) FROM lineitem
      |UNION ALL SELECT 'l_linestatus', 'string', count(l_linestatus), count(DISTINCT l_linestatus), NULL, NULL, min(l_linestatus), max(l_linestatus) FROM lineitem
      |UNION ALL SELECT 'l_shipdate', 'timestamp_ntz', count(l_shipdate), count(DISTINCT l_shipdate), NULL, NULL, strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'), strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') FROM lineitem
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    graft.ops.Profile.profile(Tables.lineitem(s, d)).orderBy("col_name")
  }

  /** Key-skew histogram ([[graft.ops.Profile.keyHistogram]]): the 20
    * heaviest `user_id` keys in events with share-of-total and skew
    * factor vs the mean key load — the diagnostic a skew-join / salting
    * decision reads. Keys are stringified (generic over key type); the
    * (total, n_keys) scalar is a one-row broadcast. The skew factor is
    * floor'd milli-units — round() would sit exactly on .5 ties here
    * (see the op's scaladoc). */
  val q92KeySkew: Q = q("q92_key_skew",
    """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
      |           FROM events GROUP BY 1),
      |t AS (SELECT sum(n) AS total, count(*) AS n_keys FROM c)
      |SELECT key, n,
      |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 4) AS share,
      |  CAST(floor(CAST(n AS DOUBLE) * CAST(n_keys AS DOUBLE) * 1000.0
      |        / CAST(total AS DOUBLE)) AS BIGINT) AS skew_x1000
      |FROM c CROSS JOIN t
      |ORDER BY n DESC, key LIMIT 20""".stripMargin) { (s, d) =>
    graft.ops.Profile.keyHistogram(Tables.events(s, d), "user_id", topN = 20)
  }

  /** Z-order (Morton) encoding ([[graft.ops.Layout.zvalue2]]): the
    * space-filling-curve key behind multi-dimensional data-skipping
    * layout (`Layout.zorderBy`; LayoutSpec quantifies the pruning win).
    * Pure integer shift/mask arithmetic — the oracle mirrors every
    * mask-doubling step, so a green hash proves the encoding bit-exact.
    * Top-100 by z keeps the output bounded; (orderkey, linenumber) is a
    * unique tiebreak. */
  val q93Zorder: Q = q("q93_zorder",
    """WITH b AS (SELECT l_orderkey, l_linenumber,
      |             l_partkey & 65535 AS x, l_suppkey & 65535 AS y FROM lineitem),
      |s1 AS (SELECT *, (x | (x << 8)) & 16711935 AS xa,
      |               (y | (y << 8)) & 16711935 AS ya FROM b),
      |s2 AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb,
      |               (ya | (ya << 4)) & 252645135 AS yb FROM s1),
      |s3 AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc,
      |               (yb | (yb << 2)) & 858993459 AS yc FROM s2),
      |s4 AS (SELECT *, (xc | (xc << 1)) & 1431655765 AS xd,
      |               (yc | (yc << 1)) & 1431655765 AS yd FROM s3)
      |SELECT l_orderkey, l_linenumber, xd | (yd << 1) AS zvalue
      |FROM s4 ORDER BY zvalue, l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (s, d) =>
    import graft.ops.Layout
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        Layout.zvalue2(col("l_partkey").bitwiseAND(lit(65535L)),
          col("l_suppkey").bitwiseAND(lit(65535L))).as("zvalue"))
      .orderBy(col("zvalue"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** Time-range sliding window: per-user rolling 1-hour sum/count over
    * events (RANGE frame on epoch seconds — the time-based analog of
    * q48's row frames). The rolling sum is computed over integer micros
    * (exact, order-free — window-sum float accumulation differs across
    * engines) and divided back once. */
  val q94TimeWindow: Q = q("q94_time_window",
    """WITH e AS (SELECT event_id, user_id,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |             CAST(round(value * 1000000.0, 0) AS BIGINT) AS v_micros
      |           FROM events)
      |SELECT event_id, user_id,
      |  round(CAST(sum(v_micros) OVER w AS DOUBLE) / 1000000.0, 4) AS rolling_sum,
      |  count(*) OVER w AS n_window
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("ts").cast("long").as("ts_sec"),
      round(col("value") * lit(1000000.0), 0).cast("long").as("v_micros"))
    val w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, 0)
    e.select(col("event_id"), col("user_id"),
        round(sum("v_micros").over(w).cast("double") / lit(1000000.0), 4).as("rolling_sum"),
        count(lit(1)).over(w).as("n_window"))
      .orderBy("event_id")
  }

  /** Ordered funnel ([[graft.ops.Funnel.funnelTimes]]): per-user earliest
    * view → first click strictly after it → first purchase after that.
    * LEFT-join stages keep drop-off users (nulls from the first missed
    * step). Raw timestamp output — the strongest possible check. */
  val q95Funnel: Q = q("q95_funnel",
    """WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
      |            WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT t1.user_id, t1.ts1, min(e.ts) AS ts2
      |       FROM t1 LEFT JOIN events e
      |         ON e.user_id = t1.user_id AND e.event_type = 'click'
      |            AND e.ts > t1.ts1
      |       GROUP BY 1, 2),
      |t3 AS (SELECT t2.user_id, t2.ts1, t2.ts2, min(e.ts) AS ts3
      |       FROM t2 LEFT JOIN events e
      |         ON e.user_id = t2.user_id AND e.event_type = 'purchase'
      |            AND e.ts > t2.ts2
      |       GROUP BY 1, 2, 3)
      |SELECT user_id, ts1, ts2, ts3 FROM t3 ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.ops.Funnel.funnelTimes(Tables.events(s, d),
        steps = Seq("view", "click", "purchase"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention ([[graft.ops.Funnel.cohortRetention]]):
    * users cohorted by Monday-aligned first-event week; n_users active
    * per (cohort, week offset). Integer counts + date arithmetic only. */
  val q96Retention: Q = q("q96_retention",
    """WITH f AS (SELECT user_id,
      |             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      |           FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id,
      |        CAST(date_trunc('week', ts) AS DATE) AS week FROM events)
      |SELECT cohort_week,
      |  CAST(datediff('day', cohort_week, week) // 7 AS INTEGER) AS week_offset,
      |  count(*) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    graft.ops.Funnel.cohortRetention(Tables.events(s, d))
      .orderBy("cohort_week", "week_offset")
  }

  /** Equal-width histogram ([[graft.ops.Profile.histogram]]): 20 bins
    * over l_extendedprice. The bin chain (shared width, floor, clamp) is
    * the same IEEE op sequence in both engines — floor is tie-free. */
  val q97Histogram: Q = q("q97_histogram",
    """WITH mm AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS mn,
      |              CAST(max(l_extendedprice) AS DOUBLE) AS mx FROM lineitem),
      |b AS (SELECT CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - mn)
      |               / ((mx - mn) / 20.0)), 19) AS INTEGER) AS bin,
      |             mn, (mx - mn) / 20.0 AS width
      |      FROM lineitem CROSS JOIN mm)
      |SELECT bin, round(mn + CAST(bin AS DOUBLE) * width, 4) AS bin_lo,
      |       round(mn + CAST(bin + 1 AS DOUBLE) * width, 4) AS bin_hi,
      |       count(*) AS n
      |FROM b GROUP BY bin, mn, width ORDER BY bin""".stripMargin) { (s, d) =>
    graft.ops.Profile.histogram(Tables.lineitem(s, d), "l_extendedprice", bins = 20)
  }

  /** Forward as-of join with tolerance ([[graft.ops.Relational.asOfJoin]]
    * `merge_asof` parity): each view event picks the FIRST purchase by
    * the same user within the next 10 minutes (null past tolerance).
    * The oracle re-derives it with a min-aggregate over a bounded range
    * join + payload re-attach; (user, ts) is unique on the purchase side
    * so both formulations are deterministic. */
  val q98AsofTolerance: Q = q("q98_asof_tolerance",
    """WITH v AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'view'),
      |p AS (SELECT user_id, ts, value FROM events
      |      WHERE event_type = 'purchase'),
      |m AS (SELECT v.event_id, v.user_id, v.ts, min(p.ts) AS p_ts
      |      FROM v LEFT JOIN p ON p.user_id = v.user_id AND p.ts >= v.ts
      |                        AND p.ts <= v.ts + INTERVAL 10 MINUTE
      |      GROUP BY 1, 2, 3)
      |SELECT m.event_id, m.user_id, m.ts, m.p_ts, p.value AS p_value
      |FROM m LEFT JOIN p ON p.user_id = m.user_id AND p.ts = m.p_ts
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import graft.ops.Relational
    val ev = Tables.events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    Relational.asOfJoin(v, p, Seq("user_id"), "ts_us", "p_us",
        Seq("p_ts", "p_value"), direction = "forward",
        tolerance = Some(600000000L)) // 10 min in micros
      .select(col("event_id"), col("user_id"), col("ts"),
        col("p_ts"), col("p_value"))
      .orderBy("event_id")
  }

  /** Event-transition matrix (sequence mining): per-user next-event via
    * lead, transition counts and per-source probabilities. One window
    * pass + one aggregate. */
  val q99Transitions: Q = q("q99_transitions",
    """WITH o AS (SELECT user_id, event_type,
      |             lead(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS next_type
      |           FROM events),
      |c AS (SELECT event_type, next_type, count(*) AS n FROM o
      |      WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, next_type, n,
      |  round(CAST(n AS DOUBLE)
      |        / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 4) AS p
      |FROM c ORDER BY event_type, next_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wt = Window.partitionBy("event_type")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(wt).cast("double"), 4))
      .orderBy("event_type", "next_type")
  }

  /** Median absolute deviation per event type
    * ([[graft.ops.Profile.medianAbsDeviation]]): robust spread where
    * q49's stddev is outlier-sensitive. Exact discrete medians (q38's
    * percentile_disc convention) — engine-exact element picks. */
  val q100Mad: Q = q("q100_mad",
    """WITH med AS (SELECT event_type,
      |               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      |             FROM events GROUP BY 1),
      |d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
      |      FROM events e JOIN med m USING (event_type))
      |SELECT event_type, round(max(med), 4) AS median_value,
      |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad), 4) AS mad
      |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    graft.ops.Profile.medianAbsDeviation(Tables.events(s, d), "event_type", "value")
      .orderBy("event_type")
  }

  /** Distribution-rank battery: ntile deciles, dense_rank, percent_rank,
    * cume_dist per event type — the rank family q12/q48 don't touch.
    * percent_rank/cume_dist are emitted RAW: each is a single exact
    * integer division, deterministic in both engines with no rounding
    * step at all. (value, event_id) gives ties a total order. */
  val q101RankBattery: Q = q("q101_rank_battery",
    """SELECT event_id, event_type,
      |  CAST(ntile(10) OVER w AS INTEGER) AS decile,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        ntile(10).over(w).as("decile"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
      .orderBy("event_id")
  }

  /** One-pass approximate profile ([[graft.ops.Profile.profileApprox]]):
    * the extreme-scale ANALYZE — HLL distincts, single scan, no Expand.
    * Rows-only (estimates are engine-specific); ProfileSearchSpec bounds
    * the error vs the exact profiler. */
  val q104ProfileApprox: Q = rowsOnly("q104_profile_approx") { (s, d) =>
    graft.ops.Profile.profileApprox(Tables.lineitem(s, d)).orderBy("col_name")
  }

  /** Deterministic hash sampling ([[graft.ops.Profile.sampleByHash]]):
    * ~10% of orders by content-keyed md5 bucket — engine- and
    * re-shard-stable, no RNG (the library form of the q64/q76/q85
    * bucket rule). The oracle recomputes the identical keep rule. */
  val q106HashSample: Q = q("q106_hash_sample",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6))::BIGINT
      |      < 0.1 * 16777216
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    graft.ops.Profile.sampleByHash(Tables.orders(s, d), "o_orderkey", rate = 0.1)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Mergeable-sketch quantiles (approx_percentile) per return flag —
    * rows-only: the sketch estimator is engine-specific (DuckDB has no
    * GK/KLL twin); SketchSpec bounds the error against exact quantiles.
    * The at-scale complement to q38/q105's exact forms: the sketch
    * merges associatively map-side, no per-group value buffering. */
  val q107ApproxQuantiles: Q = rowsOnly("q107_approx_quantiles") { (s, d) =>
    // Quartiles exploded to (flag, p, value) rows: scalar columns only, so
    // the harness' row comparator can hash the output (arrays can't be).
    val ps = array(lit(0.25), lit(0.5), lit(0.75))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), ps, lit(10000)).as("qs"))
      // _outer: a group whose values are all null keeps its (null) row
      // instead of vanishing from the output
      .select(col("l_returnflag"), posexplode_outer(col("qs")).as(Seq("i", "value")))
      .select(col("l_returnflag"),
        element_at(ps, col("i") + 1).as("p"), col("value"))
      .orderBy("l_returnflag", "p")
  }

  /** Per-user union coverage of overlapping time intervals
    * ([[graft.ops.Relational.intervalUnionLength]]): each event opens a
    * `[ts, ts + value·1µs·10⁶)` interval and the sweep-line window sums
    * only uncovered span — the aggregation a naive sum(hi−lo) gets
    * wrong whenever intervals overlap. All integer micros (`floor`
    * before the cast: DuckDB CAST rounds where Spark truncates); the
    * oracle runs the identical running-max window. */
  val q154IntervalUnion: Q = q("q154_interval_union",
    """WITH iv AS (SELECT user_id, epoch_us(ts) AS lo,
      |  epoch_us(ts) + GREATEST(0, CAST(floor(value * 1000000) AS BIGINT)) AS hi
      |  FROM events),
      |sw AS (SELECT user_id, lo, hi,
      |  max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_hi
      |  FROM iv)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(GREATEST(0, hi - GREATEST(lo, COALESCE(prev_hi, lo))))
      |    AS BIGINT) AS covered
      |FROM sw GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val iv = graft.Tables.events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) +
          greatest(lit(0L), floor(col("value") * 1000000).cast("long"))).as("hi"))
    graft.ops.Relational.intervalUnionLength(iv, Seq("user_id"), "lo", "hi")
      .select(col("user_id"), col("n_intervals"),
        col("covered").cast("long").as("covered"))
      .orderBy("user_id")
  }

  /** Winsorized robust mean ([[graft.ops.Profile.winsorizedStats]]):
    * per-flag prices clamped to the group's interpolated [p05, p95] and
    * averaged — exact by construction (sorted-array fold in integer
    * cents; the only float op is one division of two exact integers).
    * The oracle interpolates, clamps, and folds identically. */
  val q157Winsorized: Q = q("q157_winsorized",
    """WITH g AS (SELECT l_returnflag, list_sort(list(l_extendedprice)) AS arr
      |  FROM lineitem GROUP BY l_returnflag),
      |h AS (SELECT l_returnflag, arr, len(arr) AS n,
      |  1 + 0.05 * (len(arr) - 1) AS h05,
      |  1 + 0.95 * (len(arr) - 1) AS h95 FROM g),
      |t AS (SELECT l_returnflag, arr, n,
      |  CAST(round((arr[CAST(floor(h05) AS INT)] + (h05 - floor(h05)) *
      |    (arr[LEAST(CAST(floor(h05) AS INT) + 1, n)]
      |     - arr[CAST(floor(h05) AS INT)])) * 100) AS BIGINT) AS loc,
      |  CAST(round((arr[CAST(floor(h95) AS INT)] + (h95 - floor(h95)) *
      |    (arr[LEAST(CAST(floor(h95) AS INT) + 1, n)]
      |     - arr[CAST(floor(h95) AS INT)])) * 100) AS BIGINT) AS hic
      |  FROM h)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  loc / 100.0 AS lo_clamp, hic / 100.0 AS hi_clamp,
      |  round(CAST(list_sum(list_transform(arr, x ->
      |    LEAST(GREATEST(CAST(round(x * 100) AS BIGINT), loc), hic)))
      |    AS DOUBLE) / n / 100, 2) AS winsorized_mean
      |FROM t ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    graft.ops.Profile.winsorizedStats(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(
    q154IntervalUnion, q157Winsorized,
    q01PricingSummary, q02JoinChain, q03BroadcastJoin, q04SemiJoin, q05AntiJoin,
    q06ThetaJoin, q07AsofJoin, q24RangeJoin, q135BucketedRangeJoin,
    q25GroupingSets, q26Unpivot,
    q27TumblingBatch, q28Pivot, q29MapFns, q37Posexplode, q38Quantiles,
    q39StringAgg, q48WindowFrames, q45ScalarSubquery, q46ExistsSubquery, q47InSubquery,
    q61GapFill, q08AggDistinct, q09Rollup, q10Cube, q49StatAggs,
    q11ApproxDistinct, q12WindowTopk, q13WindowRunning, q14Sessionize,
    q15SortLimit, q16SetOps, q17StringFns, q18DateTrunc, q19DateScalar,
    q20MathFns, q21JsonFns, q22ArrayFns, q23ConditionalAgg,
    q91TableProfile, q92KeySkew, q93Zorder, q94TimeWindow,
    q95Funnel, q96Retention, q97Histogram, q98AsofTolerance,
    q99Transitions, q100Mad, q101RankBattery, q104ProfileApprox, q105PercentileCont, q106HashSample, q107ApproxQuantiles)
}

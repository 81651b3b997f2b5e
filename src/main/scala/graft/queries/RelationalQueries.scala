package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Group B — the relational core (SURVEY §2.B): the general-purpose
  * query engine the reference's downstream analytics (Athena /
  * Redshift Spectrum over its parquet output) would run, expressed
  * natively.
  */
object RelationalQueries {

  /** B1 — grouped aggregation, TPC-H Q1 shape: partial-agg friendly,
    * single shuffle on the grouping keys.
    */
  def b1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  val b1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** B2 — dim-chain broadcast join: fact ⋈ customer ⋈ nation ⋈
    * region, every dim broadcast (zero shuffle on the dims).
    */
  def b2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))

  val b2Sql: String =
    """SELECT r_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** B3 — fact ⋈ fact shuffle join on the order key; AQE handles
    * runtime partition sizing / skew.
    */
  def b3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))

  val b3Sql: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** B4 — semi + anti join: customers with vs without orders, one
    * result with a membership label.
    */
  def b4(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("has_orders", lit(true))
    val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("has_orders", lit(false))
    withO.unionByName(without)
  }

  val b4Sql: String =
    """SELECT c_mktsegment, count(*) AS n, TRUE AS has_orders
      |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, count(*) AS n, FALSE AS has_orders
      |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment""".stripMargin

  /** B5 — window functions: row_number, rank, lag, running sum per
    * customer ordered by (orderdate, orderkey) — total order, so
    * the running frame is deterministic.
    */
  def b5(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(w).cast("long").as("rn"),
      rank().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")))
        .cast("long").as("price_rank"),
      coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)).as("prev_price"),
      sum(col("o_totalprice").cast("decimal(18,2)")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"))
  }

  val b5Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w1 AS rn,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
      |  coalesce(lag(o_totalprice, 1) OVER w1, 0.0) AS prev_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** B6 — top-k per group: 3 priciest parts per brand via the
    * bounded-heap [[graft.functions.TopKAgg]] aggregate — partial
    * aggregation ships at most k rows per group per partition,
    * unlike a window row_number() which sorts and shuffles every
    * row (TopKAggSpec proves result parity with that formulation,
    * which remains the oracle).
    */
  def b6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy("p_brand")
      .agg(graft.functions.TopKAgg.top_k(
        col("p_retailprice"), col("p_partkey"), 3).as("top"))
      .select(col("p_brand"), posexplode(col("top")))
      .select(col("p_brand"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("p_partkey"), col("col.score").as("p_retailprice"))

  val b6Sql: String =
    """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice DESC, p_partkey) AS rk
      |  FROM part) WHERE rk <= 3""".stripMargin

  /** B7 — global ordered top-n: plans as TakeOrderedAndProject (no
    * full sort at scale).
    */
  def b7(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val b7Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** B8 — hierarchical rollup with explicit ALL labels (stable
    * across engines' NULL-for-subtotal conventions).
    */
  def b8(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))

  val b8Sql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |       coalesce(o_orderstatus, 'ALL') AS status,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin

  /** B9 — scalar function suite (string/math/conditional), all
    * whole-stage-codegen built-ins.
    */
  def b9(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(substring(col("p_name"), 1, 8)).as("name8"),
      length(col("p_name")).cast("int").as("name_len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      (col("p_size") % 7).cast("int").as("size_mod"),
      abs(col("p_size") - 25).cast("int").as("size_dist"),
      when(col("p_retailprice") > 1500, "premium")
        .when(col("p_retailprice") > 1000, "standard")
        .otherwise("budget").as("tier"))

  val b9Sql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_u,
      |  lower(substr(p_name, 1, 8)) AS name8,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  CAST(p_size % 7 AS INT) AS size_mod,
      |  CAST(abs(p_size - 25) AS INT) AS size_dist,
      |  CASE WHEN p_retailprice > 1500 THEN 'premium'
      |       WHEN p_retailprice > 1000 THEN 'standard'
      |       ELSE 'budget' END AS tier
      |FROM part""".stripMargin

  /** B10 — exact interpolated percentiles per group: Spark
    * `percentile` ≡ DuckDB `quantile_cont`.
    */
  def b10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"))

  val b10Sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** B11 — JSON field extraction from the events `props` payload. */
  def b11(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  val b11Sql: String =
    """SELECT k % 10 AS k_mod, count(*) AS n, min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      |GROUP BY 1""".stripMargin

  /** B12 — multi-column shuffle distinct. */
  def b12(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select("user_id", "event_type").distinct()

  val b12Sql: String =
    "SELECT DISTINCT user_id, event_type FROM events"

  /** B13 — correlated scalar subquery through the engine's SQL
    * surface: parts priced above their brand's average. Exercises
    * view registration + spark.sql end-to-end (the oracle runs the
    * equivalent SQL in DuckDB).
    */
  def b13(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_v")
    s.sql(
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part_v p
        |WHERE p_retailprice > (
        |  SELECT avg(p2.p_retailprice) * 1.05 FROM part_v p2
        |  WHERE p2.p_brand = p.p_brand)""".stripMargin)
  }

  val b13Sql: String =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part p
      |WHERE p_retailprice > (
      |  SELECT avg(p2.p_retailprice) * 1.05 FROM part p2
      |  WHERE p2.p_brand = p.p_brand)""".stripMargin

  /** B14 — set operations: customers seen in events but with no
    * orders (EXCEPT) and with both (INTERSECT).
    */
  def b14(s: SparkSession, dir: String): DataFrame = {
    val active = events(s, dir).select(col("user_id").as("id")).distinct()
    val buyers = t(s, dir, "orders").select(col("o_custkey").as("id")).distinct()
    active.except(buyers).withColumn("relation", lit("active_no_orders"))
      .unionByName(active.intersect(buyers)
        .withColumn("relation", lit("active_with_orders")))
  }

  val b14Sql: String =
    """SELECT id, 'active_no_orders' AS relation FROM (
      |  SELECT DISTINCT user_id AS id FROM events
      |  EXCEPT SELECT DISTINCT o_custkey FROM orders)
      |UNION ALL
      |SELECT id, 'active_with_orders' AS relation FROM (
      |  SELECT DISTINCT user_id AS id FROM events
      |  INTERSECT SELECT DISTINCT o_custkey FROM orders)""".stripMargin

  /** B15 — supplier accounting rollup: dim⋈dim broadcast chain with
    * per-nation balance stats and a deterministic rank (completes
    * coverage of every test-corpus table).
    */
  def b15(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    joined.groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        moneySum(col("s_acctbal")).as("total_bal"),
        max(col("s_acctbal")).as("max_bal"))
      .withColumn("bal_rank",
        rank().over(Window.orderBy(col("total_bal").desc, col("n_name"))).cast("long"))
  }

  val b15Sql: String =
    """SELECT r_name, n_name, count(*) AS n_suppliers,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |  max(s_acctbal) AS max_bal,
      |  rank() OVER (ORDER BY CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) DESC,
      |               n_name) AS bal_rank
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** B16 — sketch accuracy contract: HyperLogLog++ distinct counts
    * (`approx_count_distinct`, rsd 2%) and approximate quantiles
    * (`percentile_approx`, accuracy 10000) beside their exact twins.
    * Sketch VALUES are engine-specific, so the oracle checks the
    * engine-independent CONTRACT instead: exact values plus
    * within-bound flags that must all be true (10% ≈ 5σ for the HLL;
    * rank error ≤ n/accuracy for the quantile — far inside 10% on
    * this data). Sketches are what survive at 100 TB: mergeable
    * per-partition state, no global shuffle of distinct keys.
    */
  def b16(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("n_approx"),
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("percentile_approx(value, 0.5, 10000)").as("p50_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) * 1000 <=
          col("n_exact") * 100).as("hll_ok"),
        round(col("p50_exact"), 4).as("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          abs(col("p50_exact")) * 0.1 + lit(0.01)).as("quantile_ok"))

  val b16Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS hll_ok,
      |  round(quantile_cont(value, 0.5), 4) AS p50_exact, true AS quantile_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** B17 — unpivot (wide → long reshape, the inverse of A9's pivot):
    * four lineitem measures melt into (measure, value) rows via the
    * native `unpivot` (plans as Expand — one pass, no shuffle, output
    * is 4× the scan with no join).
    */
  def b17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "value")

  val b17Sql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       'l_quantity' AS measure, l_quantity AS value FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_extendedprice', l_extendedprice FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount', l_discount FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_tax', l_tax FROM lineitem""".stripMargin

  /** B18 — explicit skew-salted fact⋈fact join: hot keys (above a
    * frequency threshold) take the salted path (key spread over 4
    * salt partitions, right side replicated), cold keys the plain
    * hash join ([[graft.operators.SkewJoin.hybridSkewJoin]]).
    * Salting is result-invariant, so the oracle is the plain join —
    * proving the skew machinery preserves semantics exactly.
    */
  def b18(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
    val r = t(s, dir, "orders")
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.operators.SkewJoin
      .hybridSkewJoin(l, r, "okey", saltFactor = 4, hotThreshold = 5)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("sum_price"))
  }

  val b18Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** B19 — CUBE aggregation (all grouping-set combinations of
    * status × priority), with `grouping_id` to disambiguate
    * subtotal rows from genuine NULL keys. Plans as a single Expand
    * + partial agg — one shuffle for all four grouping sets.
    */
  def b19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("gid"), col("n"), col("sum_price"))

  val b19Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** B20 — time-RANGE window frame: trailing 1-hour count and exact
    * decimal sum per sensor, a frame defined by the ORDER BY value
    * (epoch ms) rather than row position — C4's row-frame twin.
    * Deterministic without tie-breakers: peers share one frame.
    */
  def b20(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t_ms")
      .rangeBetween(-3600000L, 0L)
    events(s, dir)
      .select(col("event_id"), col("user_id"),
        epochMs(col("ts")).as("t_ms"), col("value"))
      .select(col("event_id"), col("user_id"), col("t_ms"),
        count(lit(1)).over(w).as("trail_n"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("trail_sum"))
  }

  val b20Sql: String =
    """SELECT event_id, user_id, epoch_ms(ts) AS t_ms,
      |  count(*) OVER w AS trail_n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** B21 — the SQL-text surface: graft's native expressions
    * registered on the Catalyst function registry
    * ([[graft.engine.GraftExtensions]]) and invoked from plain SQL
    * over a temp view — proving the library is usable by SQL-only
    * clients, not just the Column API.
    */
  def b21(s: SparkSession, dir: String): DataFrame = {
    graft.engine.GraftExtensions.register(s)
    t(s, dir, "documents").createOrReplaceTempView("b21_docs")
    s.sql("""
      SELECT doc_id,
             poly_hash(text) AS text_hash,
             poly_hash(lower(trim(text))) AS norm_hash,
             size(word_gram_hashes(text, 2, true)) AS n_bigrams
      FROM b21_docs""")
  }

  private def b21Hash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($e)+1),
       |    ch_i -> CAST(unicode($e[ch_i]) AS BIGINT))),
       |  (ch_a, ch_x) -> (ch_a*31 + ch_x) % 1000000007)""".stripMargin

  val b21Sql: String =
    s"""WITH th AS (
       |  SELECT doc_id, text,
       |    list_transform(string_split_regex(trim(lower(text)), '\\s+'),
       |      tk -> ${b21Hash("tk")}) AS h
       |  FROM documents)
       |SELECT doc_id,
       |  ${b21Hash("text")} AS text_hash,
       |  ${b21Hash("lower(trim(text))")} AS norm_hash,
       |  CAST(len(list_distinct(list_transform(range(1, len(h)),
       |    bg_i -> (h[bg_i]*31 + h[bg_i+1]) % 1000000007))) AS INTEGER)
       |    AS n_bigrams
       |FROM th""".stripMargin

  /** B22 — distribution-rank window suite: ntile, percent_rank,
    * cume_dist over per-segment spend (completes the window-function
    * surface beyond B5's rank/lag). Doubles are exact rationals of
    * row counts — engine-stable without rounding.
    */
  def b22(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  val b22Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** B23 — GROUPING SETS with independent (non-hierarchical) sets:
    * per-status and per-priority subtotals in ONE pass — the shape
    * neither ROLLUP (B8) nor CUBE (B19) can express (no pair cell,
    * no grand total). Plans as a single Expand + hash aggregate:
    * each input row is expanded once per set, so the whole report is
    * one shuffle regardless of how many sets are requested — at
    * 100 TB this replaces N separate groupBy jobs (N full scans)
    * with one scan.
    */
  def b23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("gid"), col("n"), col("sum_price"))

  val b23Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin

  val queries: Map[String, QFn] = Map(
    "b23_grouping_sets" -> (b23 _),
    "b22_rank_suite" -> (b22 _),
    "b21_sql_surface" -> (b21 _),
    "b20_range_frame" -> (b20 _),
    "b19_cube" -> (b19 _),
    "b18_skew_salted_join" -> (b18 _),
    "b17_unpivot" -> (b17 _),
    "b16_sketch_contract" -> (b16 _),
    "b15_supplier_stats" -> (b15 _),
    "b13_subquery" -> (b13 _),
    "b14_setops" -> (b14 _),
    "b1_agg" -> (b1 _),
    "b2_join_broadcast" -> (b2 _),
    "b3_join_shuffle" -> (b3 _),
    "b4_join_semi_anti" -> (b4 _),
    "b5_window_funcs" -> (b5 _),
    "b6_topk_group" -> (b6 _),
    "b7_topn_global" -> (b7 _),
    "b8_rollup" -> (b8 _),
    "b9_scalar_funcs" -> (b9 _),
    "b10_percentiles" -> (b10 _),
    "b11_json_extract" -> (b11 _),
    "b12_distinct" -> (b12 _))

  val oracles: Map[String, String] = Map(
    "b23_grouping_sets" -> b23Sql,
    "b22_rank_suite" -> b22Sql,
    "b21_sql_surface" -> b21Sql,
    "b20_range_frame" -> b20Sql,
    "b19_cube" -> b19Sql,
    "b18_skew_salted_join" -> b18Sql,
    "b17_unpivot" -> b17Sql,
    "b16_sketch_contract" -> b16Sql,
    "b15_supplier_stats" -> b15Sql,
    "b13_subquery" -> b13Sql,
    "b14_setops" -> b14Sql,
    "b1_agg" -> b1Sql,
    "b2_join_broadcast" -> b2Sql,
    "b3_join_shuffle" -> b3Sql,
    "b4_join_semi_anti" -> b4Sql,
    "b5_window_funcs" -> b5Sql,
    "b6_topk_group" -> b6Sql,
    "b7_topn_global" -> b7Sql,
    "b8_rollup" -> b8Sql,
    "b9_scalar_funcs" -> b9Sql,
    "b10_percentiles" -> b10Sql,
    "b11_json_extract" -> b11Sql,
    "b12_distinct" -> b12Sql)
}

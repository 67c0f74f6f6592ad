package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational query surface: scans/filters (SURVEY P4/P6),
  * aggregation (A1/A2 + extensions), joins (J1/J2 + extensions),
  * windows (W0/W1 + extensions), sorts/top-k (T1-T3), set ops,
  * scalar functions (F-series extensions).
  *
  * Scale notes are per query; the common principles: dims broadcast,
  * fact-fact joins shuffle on join keys with AQE, aggregations are
  * partial+final (map-side combine free from Catalyst), filters and
  * projections sit directly on the parquet scan (pushdown + pruning).
  */
object CoreQueries extends QueryDsl {

  def all: Seq[Q] = Seq(

    // ---- aggregation ----------------------------------------------------
    q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
        |  cast(sum(cast(l_extendedprice*(1-l_discount) AS decimal(18,4))) AS double) AS sum_disc_price,
        |  round(avg(cast(l_quantity AS double)), 4) AS avg_qty,
        |  round(avg(cast(l_extendedprice AS double)), 4) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { c =>
      import c.t
      t("lineitem").groupBy($"l_returnflag", $"l_linestatus").agg(
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        round(avg($"l_quantity".cast("double")), 4).as("avg_qty"),
        round(avg($"l_extendedprice".cast("double")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
    },

    // A1 parity: the reference's one read query, COUNT(DISTINCT ...)
    q("q02_count_distinct",
      """SELECT count(DISTINCT l_orderkey) AS distinct_orders,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(*) AS total_rows
        |FROM lineitem""".stripMargin) { c =>
      import c.t
      t("lineitem").agg(
        countDistinct($"l_orderkey").as("distinct_orders"),
        countDistinct($"l_partkey").as("distinct_parts"),
        count(lit(1)).as("total_rows"))
    },

    q("q03_orders_by_year",
      """SELECT cast(date_part('year', o_orderdate) AS int) AS order_year, o_orderpriority,
        |  count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total_value
        |FROM orders GROUP BY 1, 2""".stripMargin) { c =>
      import c.t
      t("orders").groupBy(year($"o_orderdate").as("order_year"), $"o_orderpriority").agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total_value"))
    },

    q("q04_rollup_geo",
      """SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
        |  count(*) AS n_customers,
        |  cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin) { c =>
      import c.t
      t("customer")
        .join(broadcast(t("nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t("region")), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name").agg(
          count(lit(1)).as("n_customers"),
          sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("total_bal"))
        .select(coalesce($"r_name", lit("ALL")).as("region_name"),
          coalesce($"n_name", lit("ALL")).as("nation_name"),
          $"n_customers", $"total_bal")
    },

    q("q05_cube_lineitem",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_rows, cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { c =>
      import c.t
      t("lineitem").cube($"l_returnflag", $"l_linestatus").agg(
        count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n_rows", $"sum_qty")
    },

    q("q06_stats_by_brand",
      """SELECT p_brand, count(*) AS n_parts,
        |  round(min(cast(p_retailprice AS double)), 4) AS min_price,
        |  round(max(cast(p_retailprice AS double)), 4) AS max_price,
        |  round(avg(cast(p_retailprice AS double)), 4) AS avg_price,
        |  round(stddev_samp(cast(p_retailprice AS double)), 4) AS sd_price
        |FROM part GROUP BY p_brand""".stripMargin) { c =>
      import c.t
      t("part").groupBy($"p_brand").agg(
        count(lit(1)).as("n_parts"),
        round(min($"p_retailprice".cast("double")), 4).as("min_price"),
        round(max($"p_retailprice".cast("double")), 4).as("max_price"),
        round(avg($"p_retailprice".cast("double")), 4).as("avg_price"),
        round(stddev_samp($"p_retailprice".cast("double")), 4).as("sd_price"))
    },

    // ---- filters (P4 point lookup / P6 date range parity) ---------------
    q("q07_point_lookup",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_quantity AS quantity
        |FROM lineitem WHERE l_orderkey = 1""".stripMargin) { c =>
      import c.t
      t("lineitem").filter($"l_orderkey" === 1)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"l_quantity".as("quantity"))
    },

    q("q08_date_range",
      """SELECT o_orderstatus, count(*) AS n,
        |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o_orderstatus""".stripMargin) { c =>
      import c.t
      t("orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .groupBy($"o_orderstatus").agg(
          count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
    },

    // ---- joins ----------------------------------------------------------
    q("q10_join_broadcast_dims",
      """SELECT r_name, count(*) AS n_customers,
        |  cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin) { c =>
      import c.t
      // dims are tiny: broadcast both, zero shuffle until the final agg
      t("customer")
        .join(broadcast(t("nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t("region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name").agg(
          count(lit(1)).as("n_customers"),
          sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("total_bal"))
    },

    q("q11_join_fact_fact",
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  cast(sum(cast(l_extendedprice*(1-l_discount) AS decimal(18,4))) AS double) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { c =>
      import c.t
      // fact-fact: shuffle join on the key both sides are large on;
      // at cluster scale this is the SMJ/shuffled-hash case AQE tunes
      t("lineitem").join(t("orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(
          count(lit(1)).as("n_lines"),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,4)")).cast("double").as("revenue"))
    },

    // J1 parity: existence probe as a set-based semi join
    q("q12_semi_join",
      """SELECT c_mktsegment, count(*) AS n_with_orders
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment""".stripMargin) { c =>
      import c.t
      t("customer").join(t("orders").filter($"o_totalprice" > 300000),
          $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    },

    q("q13_anti_join",
      """SELECT c_mktsegment, count(*) AS n_without_orders
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment""".stripMargin) { c =>
      import c.t
      t("customer").join(t("orders").filter($"o_totalprice" > 300000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    },

    q("q14_outer_join_histogram",
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders""".stripMargin) { c =>
      import c.t
      t("customer").join(t("orders"), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey").agg(count($"o_orderkey").as("n_orders"))
        .groupBy($"n_orders").agg(count(lit(1)).as("n_customers"))
    },

    q("q15_range_join",
      """SELECT p_brand, count(*) AS n_matches
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        |GROUP BY p_brand""".stripMargin) { c =>
      import c.t
      // equi key carries the join; the band predicate is a post-join
      // filter. part is broadcast-sized at any SF that matters.
      t("lineitem").join(broadcast(t("part")),
          $"l_partkey" === $"p_partkey" &&
          $"l_quantity".between($"p_size" - 5, $"p_size" + 5))
        .groupBy($"p_brand").agg(count(lit(1)).as("n_matches"))
    },

    // TPC-H Q3 shape: 3-table join chain (dim -> fact -> fact) with
    // selective filters on all three inputs, grouped revenue, global
    // top-10. The filters push to each scan; customer is the
    // broadcast-able side of its join; lineitem⋈orders shuffles on
    // the shared key; the final top-k is TakeOrderedAndProject.
    q("q16_shipping_priority",
      """SELECT l_orderkey,
        |  cast(sum(cast(l_extendedprice*(1-l_discount) AS decimal(18,4))) AS double) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1997-03-15' AND l_shipdate > DATE '1997-03-15'
        |GROUP BY l_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { c =>
      import c.t
      val cutoff = lit("1997-03-15").cast("timestamp")
      t("customer").filter($"c_mktsegment" === "BUILDING")
        .join(t("orders").filter($"o_orderdate" < cutoff), $"c_custkey" === $"o_custkey")
        .join(t("lineitem").filter($"l_shipdate" > cutoff), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
          $"o_orderpriority")
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,4)"))
          .cast("double").as("revenue"))
        .select($"l_orderkey", $"revenue", $"orderdate", $"o_orderpriority")
        .orderBy($"revenue".desc, $"l_orderkey").limit(10)
    },

    // TPC-H Q5 shape: 6-table star-plus-constraint join — the
    // c_nationkey = s_nationkey condition links the two dimension arms
    // so it is NOT a pure star. region/nation/supplier broadcast;
    // customer⋈orders⋈lineitem carry the shuffles on their keys.
    q("q17_local_supplier_volume",
      """SELECT n_name,
        |  cast(sum(cast(l_extendedprice*(1-l_discount) AS decimal(18,4))) AS double) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name""".stripMargin) { c =>
      import c.t
      t("customer")
        .join(t("orders").filter(
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp")),
          $"c_custkey" === $"o_custkey")
        .join(t("lineitem"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(t("supplier")),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(t("nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t("region")), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(18,4)"))
          .cast("double").as("revenue"))
    },

    // Bloom-pre-filtered semi-join (operators.BloomPrune): the keeper
    // set (urgent orders) is aggregated into one bloom sketch, the
    // sketch is evaluated as a scalar subquery in a Filter ON THE
    // PROBE SCAN — most non-matching lineitem rows die before the
    // exchange — and the exact semi-join removes the bloom's false
    // positives, so the result is exactly the plain semi-join (and
    // the oracle is the plain IN-subquery). At 100 TB this is the
    // shape for "filter a huge fact by a persisted keeper set too big
    // to broadcast as rows": the sketch is fixed-size and the probe
    // shuffle carries survivors only.
    q("q49_bloom_semi_join",
      """SELECT l_orderkey, count(*) AS n_items,
        |  cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_orderkey""".stripMargin) { c =>
      import c.t
      val urgent = t("orders").filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      graft.operators.BloomPrune.semiJoin(
          t("lineitem"), urgent, "l_orderkey", "o_orderkey",
          expectedItems = 1000000L, fpp = 0.01)
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
    },

    q("q05b_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { c =>
      import c.t
      // native Dataset.groupingSets (Spark 4) — no temp-view catalog
      // side effect, no SQL detour
      t("lineitem")
        .groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_rows"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n_rows")
    },

    q("q06b_correlation",
      """SELECT l_returnflag,
        |  round(corr(cast(l_quantity AS double), cast(l_extendedprice AS double)), 4) AS qty_price_corr,
        |  round(covar_samp(cast(l_quantity AS double), cast(l_discount AS double)), 4) AS qty_disc_cov
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { c =>
      import c.t
      t("lineitem").groupBy($"l_returnflag").agg(
        round(corr($"l_quantity".cast("double"), $"l_extendedprice".cast("double")), 4)
          .as("qty_price_corr"),
        round(covar_samp($"l_quantity".cast("double"), $"l_discount".cast("double")), 4)
          .as("qty_disc_cov"))
    },

    q("q56_array_funcs",
      """SELECT vec_id, len(embedding) AS dim,
        |  round(cast(embedding[1] AS double), 4) AS first_elem,
        |  round(cast(list_min(embedding) AS double), 4) AS min_elem,
        |  round(cast(list_max(embedding) AS double), 4) AS max_elem,
        |  round(list_sum(embedding::DOUBLE[]), 4) AS sum_elems
        |FROM embeddings WHERE vec_id < 100""".stripMargin) { c =>
      import c.t
      t("embeddings").filter($"vec_id" < 100)
        .select($"vec_id",
          size($"embedding").as("dim"),
          round(element_at($"embedding", 1).cast("double"), 4).as("first_elem"),
          round(array_min($"embedding").cast("double"), 4).as("min_elem"),
          round(array_max($"embedding").cast("double"), 4).as("max_elem"),
          round(aggregate($"embedding", lit(0.0), (acc, x) => acc + x.cast("double")), 4)
            .as("sum_elems"))
    },

    // ---- windows --------------------------------------------------------
    q("q20_window_rank",
      """SELECT o_orderpriority, o_orderkey, o_totalprice AS price, rnk
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3""".stripMargin) { c =>
      import c.t
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey")
      t("orders").withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"o_orderpriority", $"o_orderkey",
          $"o_totalprice".as("price"), $"rnk")
    },

    q("q21_window_lag",
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day', prev_date, o_orderdate) AS gap_days
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS prev_date
        |      FROM orders WHERE o_custkey <= 100)
        |WHERE prev_date IS NOT NULL""".stripMargin) { c =>
      import c.t
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t("orders").filter($"o_custkey" <= 100)
        .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
        .filter($"prev_date".isNotNull)
        .select($"o_custkey", $"o_orderkey",
          datediff($"o_orderdate", $"prev_date").cast("long").as("gap_days"))
    },

    q("q22_window_running_sum",
      """SELECT l_orderkey, l_linenumber,
        |  cast(sum(cast(l_quantity AS decimal(18,2)))
        |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS running_qty
        |FROM lineitem WHERE l_orderkey <= 2000""".stripMargin) { c =>
      import c.t
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t("lineitem").filter($"l_orderkey" <= 2000)
        .select($"l_orderkey", $"l_linenumber",
          sum($"l_quantity".cast("decimal(18,2)")).over(w).cast("double").as("running_qty"))
    },

    q("q22b_range_frame",
      """SELECT l_orderkey, l_linenumber,
        |  cast(sum(cast(l_quantity AS decimal(18,2)))
        |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |          RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS double) AS near_qty
        |FROM lineitem WHERE l_orderkey <= 1000""".stripMargin) { c =>
      import c.t
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
        .rangeBetween(-2, Window.currentRow)
      t("lineitem").filter($"l_orderkey" <= 1000)
        .select($"l_orderkey", $"l_linenumber",
          sum($"l_quantity".cast("decimal(18,2)")).over(w)
            .cast("double").as("near_qty"))
    },

    q("q24_window_first_last",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) { c =>
      import c.t
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t("orders").filter($"o_custkey" <= 100)
        .select($"o_custkey", $"o_orderkey",
          first($"o_orderkey").over(w).as("first_order"),
          last($"o_orderkey").over(wAll).as("last_order"),
          nth_value($"o_orderkey", 2).over(w).as("second_order"))
    },

    // W0 parity: latest row per key via max_by (no window sort)
    q("q23_latest_event_per_user",
      """WITH ranked AS (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events)
        |SELECT user_id, event_type AS last_type, event_id AS last_event_id, n_events
        |FROM ranked WHERE rn = 1""".stripMargin) { c =>
      import c.t
      // max_by on a (ts, event_id) struct: one partial+final agg, no
      // window shuffle+sort — the scalable form of "top-1 per key"
      t("events").groupBy($"user_id").agg(
        max_by($"event_type", struct($"ts", $"event_id")).as("last_type"),
        max_by($"event_id", struct($"ts", $"event_id")).as("last_event_id"),
        count(lit(1)).as("n_events"))
    },

    q("q25_collect_agg",
      """SELECT n_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey""".stripMargin) { c =>
      import c.t
      // collect_set + sort + join to a string: deterministic scalar
      // encoding of an array aggregate (comparable across engines)
      t("customer").join(broadcast(t("nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_nationkey")
        .agg(array_join(array_sort(collect_set($"c_mktsegment")), ",").as("segments"))
    },

    q("q57_regex_funcs",
      """SELECT doc_id,
        |  regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
        |  regexp_matches(text, '[.!?]$') AS ends_sentence
        |FROM documents""".stripMargin) { c =>
      import c.t
      t("documents").select($"doc_id",
        regexp_extract($"text", "([A-Za-z]+)", 1).as("first_word"),
        regexp_count($"text", lit("[0-9]+")).cast("long").as("n_numbers"),
        // \z anchors at absolute end-of-string in Java regex, matching
        // the oracle's RE2 '$' (Java's '$' also matches before a final
        // newline)
        ($"text" rlike "[.!?]\\z").as("ends_sentence"))
    },

    // ---- sorts / top-k --------------------------------------------------
    q("q30_global_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { c =>
      import c.t
      // plans as TakeOrderedAndProject: per-partition top-k + driver
      // merge, never a global sort
      t("orders").orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice".as("price"))
        .limit(10)
    },

    q("q31_multi_col_sort",
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal AS bal
        |FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey LIMIT 100""".stripMargin) { c =>
      import c.t
      t("customer").orderBy($"c_nationkey", $"c_acctbal".desc, $"c_custkey")
        .select($"c_custkey", $"c_name", $"c_nationkey",
          $"c_acctbal".as("bal"))
        .limit(100)
    },

    // Mixed distinct + conditional aggregation in one GROUP BY: two
    // DISTINCT aggregates force Catalyst's Expand-based rewrite (each
    // distinct column gets its own duplicated stream, partial+final on
    // top), and the FILTER clause is the conditional-count form. All
    // planned as one pass over lineitem.
    q("q18_distinct_agg_mix",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS dparts,
        |  cast(sum(DISTINCT cast(l_quantity AS bigint)) AS bigint) AS sum_dqty,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { c =>
      import c.t
      t("lineitem").groupBy($"l_returnflag").agg(
        countDistinct($"l_partkey").as("dparts"),
        sum_distinct($"l_quantity".cast("bigint")).cast("bigint").as("sum_dqty"),
        count(when($"l_discount" > 0.05, 1)).as("n_disc"))
    },

    // Relative-rank window functions over a bounded slice.
    q("q26_window_dist",
      """SELECT o_orderkey,
        |  round(percent_rank() OVER w, 4) AS prank,
        |  round(cume_dist() OVER w, 4) AS cdist,
        |  ntile(4) OVER w AS quartile
        |FROM orders WHERE o_orderkey <= 2000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin) { c =>
      import c.t
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      t("orders").filter($"o_orderkey" <= 2000)
        .select($"o_orderkey",
          round(percent_rank().over(w), 4).as("prank"),
          round(cume_dist().over(w), 4).as("cdist"),
          ntile(4).over(w).as("quartile"))
    },

    // NULL placement in sort order: nullif plants nulls, NULLS FIRST
    // must behave identically under descending order in both engines.
    q("q32_nulls_ordering",
      """SELECT p_partkey, nullif(p_size, 25) AS sz
        |FROM part
        |ORDER BY sz DESC NULLS FIRST, p_partkey LIMIT 50""".stripMargin) { c =>
      import c.t
      t("part").select($"p_partkey", nullif($"p_size", lit(25)).as("sz"))
        .orderBy($"sz".desc_nulls_first, $"p_partkey")
        .limit(50)
    },

    // Z-order (Morton) curve arithmetic, oracle-checked: the exact bit
    // interleave layout.ZOrder.writeClustered clusters files by, here
    // aggregated into curve cells so every row's z-value feeds the
    // hash. Spark column and DuckDB SQL are generated from the SAME
    // bit-placement loop (zValue / zValueSql), so the layout
    // definition provably means the same thing to both engines — what
    // makes a Z-ordered 100 TB table portable across readers. The
    // layout writer + file-pruning payoff are ZOrderSpec's subject.
    q("q33_zorder_cells",
      s"""SELECT ${graft.layout.ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 10)} >> 12 AS z_cell,
        |  count(*) AS n_rows,
        |  min(${graft.layout.ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 10)}) AS z_min,
        |  max(${graft.layout.ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 10)}) AS z_max
        |FROM lineitem GROUP BY 1""".stripMargin) { c =>
      import c.t
      val z = graft.layout.ZOrder.zValue(Seq($"l_partkey", $"l_suppkey"), 10)
      t("lineitem")
        .select(shiftright(z, 12).as("z_cell"), z.as("z"))
        .groupBy($"z_cell")
        .agg(count(lit(1)).as("n_rows"), min($"z").as("z_min"), max($"z").as("z_max"))
    },

    // ---- set operations -------------------------------------------------
    q("q40_union",
      """SELECT nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  UNION SELECT DISTINCT s_nationkey AS nationkey FROM supplier)""".stripMargin) { c =>
      import c.t
      t("customer").select($"c_nationkey".as("nationkey")).distinct()
        .union(t("supplier").select($"s_nationkey".as("nationkey")).distinct())
        .distinct()
    },

    q("q41_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin) { c =>
      import c.t
      t("customer").select($"c_nationkey".as("nationkey"))
        .intersect(t("supplier").select($"s_nationkey".as("nationkey")))
    },

    q("q42_except",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000""".stripMargin) { c =>
      import c.t
      t("customer").select($"c_custkey")
        .except(t("orders").filter($"o_totalprice" > 300000)
          .select($"o_custkey".as("c_custkey")))
    },

    // Multiset (bag) semantics: INTERSECT ALL keeps min(m,n) copies,
    // EXCEPT ALL keeps max(m-n, 0) — duplicate COUNTS matter, not just
    // membership. Aggregated so the output is stable and small.
    q("q41b_intersect_all",
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey""".stripMargin) { c =>
      import c.t
      t("customer").select($"c_nationkey".as("nationkey"))
        .intersectAll(t("supplier").select($"s_nationkey".as("nationkey")))
        .groupBy($"nationkey").agg(count(lit(1)).as("n"))
    },

    q("q42b_except_all",
      """SELECT l_suppkey, count(*) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity >= 40
        |  EXCEPT ALL SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48)
        |GROUP BY l_suppkey ORDER BY n DESC, l_suppkey LIMIT 25""".stripMargin) { c =>
      import c.t
      t("lineitem").filter($"l_quantity" >= 40).select($"l_suppkey")
        .exceptAll(t("lineitem").filter($"l_quantity" >= 48).select($"l_suppkey"))
        .groupBy($"l_suppkey").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"l_suppkey").limit(25)
    },

    // ---- scalar function suite -----------------------------------------
    q("q50_string_funcs",
      """SELECT p_partkey, upper(p_name) AS name_upper, length(p_name) AS name_len,
        |  replace(p_brand, '#', '_') AS brand_clean,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  concat(p_brand, ':', p_type) AS brand_type
        |FROM part WHERE p_partkey <= 500 AND p_name LIKE '%a%'""".stripMargin) { c =>
      import c.t
      t("part").filter($"p_partkey" <= 500 && $"p_name".like("%a%"))
        .select($"p_partkey", upper($"p_name").as("name_upper"),
          length($"p_name").as("name_len"),
          regexp_replace($"p_brand", "#", "_").as("brand_clean"),
          substring($"p_type", 1, 5).as("type_prefix"),
          concat($"p_brand", lit(":"), $"p_type").as("brand_type"))
    },

    q("q51_date_funcs",
      """SELECT o_orderkey,
        |  cast(date_part('year', o_orderdate) AS int) AS y,
        |  cast(date_part('month', o_orderdate) AS int) AS m,
        |  cast(date_part('day', o_orderdate) AS int) AS dom,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch
        |FROM orders WHERE o_orderkey <= 500""".stripMargin) { c =>
      import c.t
      t("orders").filter($"o_orderkey" <= 500)
        .select($"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("dom"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("iso_day"),
          datediff(to_date($"o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since_epoch"))
    },

    q("q52_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(cast(l_extendedprice AS double) - 1000.0), 4) AS abs_diff,
        |  floor(cast(l_quantity AS double)) AS qty_floor,
        |  ceil(cast(l_discount AS double) * 100) AS disc_pct_ceil,
        |  round(sqrt(cast(l_extendedprice AS double)), 4) AS price_sqrt,
        |  round(ln(cast(l_extendedprice AS double) + 1), 4) AS price_ln,
        |  round(power(cast(l_tax AS double) + 1, 2), 4) AS tax_sq
        |FROM lineitem WHERE l_orderkey <= 300""".stripMargin) { c =>
      import c.t
      t("lineitem").filter($"l_orderkey" <= 300)
        .select($"l_orderkey", $"l_linenumber",
          round(abs($"l_extendedprice".cast("double") - 1000.0), 4).as("abs_diff"),
          floor($"l_quantity".cast("double")).cast("double").as("qty_floor"),
          ceil($"l_discount".cast("double") * 100).cast("double").as("disc_pct_ceil"),
          round(sqrt($"l_extendedprice".cast("double")), 4).as("price_sqrt"),
          round(log($"l_extendedprice".cast("double") + 1), 4).as("price_ln"),
          round(pow($"l_tax".cast("double") + 1, 2), 4).as("tax_sq"))
    },

    q("q53_case_when",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice >= 200000 THEN 'high'
        |       WHEN o_totalprice >= 100000 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  CASE o_orderstatus WHEN 'F' THEN 'finished'
        |       WHEN 'O' THEN 'open' ELSE 'other' END AS status_word
        |FROM orders WHERE o_orderkey <= 1000""".stripMargin) { c =>
      import c.t
      t("orders").filter($"o_orderkey" <= 1000)
        .select($"o_orderkey",
          when($"o_totalprice" >= 200000, "high")
            .when($"o_totalprice" >= 100000, "mid")
            .otherwise("low").as("price_band"),
          when($"o_orderstatus" === "F", "finished")
            .when($"o_orderstatus" === "O", "open")
            .otherwise("other").as("status_word"))
    },

    // FULLTEXT-analog substring search (reference ix_software idiom,
    // nvd2mysqlloader.py:173-177): predicate on a long text column
    q("q54_text_search",
      """SELECT lang, count(*) AS n_docs
        |FROM documents WHERE text LIKE '%the%' GROUP BY lang""".stripMargin) { c =>
      import c.t
      t("documents").filter($"text".like("%the%"))
        .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
    },

    q("q09_percentiles",
      """SELECT o_orderpriority,
        |  round(quantile_cont(cast(o_totalprice AS double), 0.25), 4) AS p25,
        |  round(quantile_cont(cast(o_totalprice AS double), 0.50), 4) AS p50,
        |  round(quantile_cont(cast(o_totalprice AS double), 0.75), 4) AS p75
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { c =>
      import c.t
      // exact percentile (linear interpolation) — matches quantile_cont
      t("orders").groupBy($"o_orderpriority").agg(
        round(percentile($"o_totalprice".cast("double"), lit(0.25)), 4).as("p25"),
        round(percentile($"o_totalprice".cast("double"), lit(0.50)), 4).as("p50"),
        round(percentile($"o_totalprice".cast("double"), lit(0.75)), 4).as("p75"))
    },

    // HLL sketch: approx result has no cross-engine oracle; the checked
    // contract is the error bound vs the exact count (rsd=0.02, bound
    // at 3 sigma — the default 5%-rsd sketch breached 5% at sf0.001)
    q("q09b_approx_distinct",
      """SELECT true AS approx_within_bound""".stripMargin) { c =>
      import c.t
      t("lineitem").agg(
        approx_count_distinct($"l_orderkey", 0.02).as("approx"),
        countDistinct($"l_orderkey").as("exact"))
        .select((abs($"approx" - $"exact") / $"exact" < 0.06).as("approx_within_bound"))
    },

    // Approx-percentile sketch (Greenwald-Khanna): like the HLL query,
    // the sketch value has no cross-engine oracle, so the checked
    // contract is rank containment — accuracy 10000 bounds rank error
    // at N/10000, so the sketch median (always a real data point, vs
    // the interpolating exact percentile) must land inside the exact
    // [P49, P51] rank window at every scale.
    q("q09c_approx_percentile",
      """SELECT o_orderpriority, true AS approx_within_bound
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { c =>
      import c.t
      t("orders").groupBy($"o_orderpriority").agg(
        percentile_approx($"o_totalprice".cast("double"), lit(0.5), lit(10000)).as("approx"),
        percentile($"o_totalprice".cast("double"), lit(0.49)).as("lo"),
        percentile($"o_totalprice".cast("double"), lit(0.51)).as("hi"))
        .select($"o_orderpriority",
          ($"approx" >= $"lo" && $"approx" <= $"hi").as("approx_within_bound"))
    },

    // MERGEABLE sketches (Datasketches HLL): per-day sketches built
    // once, unioned into any larger window without touching raw data —
    // the precompute-and-merge pattern that makes incremental distinct
    // counts tractable at 100 TB (a day's sketch is ~KB; re-scanning a
    // day is ~TB). Like q09b, the sketch value has no cross-engine
    // oracle, so the checked contract is merge fidelity: the estimate
    // from unioning daily sketches must agree with the exact global
    // distinct count within HLL(lgK=12) error (~1.6% rsd; 5% ≈ 3σ).
    q("q19_hll_mergeable",
      """SELECT true AS merged_within_bound""") { c =>
      import c.t
      val ev = t("events")
      val daily = ev.groupBy(date_trunc("DAY", $"ts").as("d"))
        .agg(hll_sketch_agg($"user_id").as("sk"))
      val merged = daily.agg(
        hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      val exact = ev.agg(countDistinct($"user_id").as("exact"))
      merged.join(exact)
        .select((abs($"est" - $"exact") / $"exact" < 0.05).as("merged_within_bound"))
    },

    q("q43_union_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey <= 400
        |  UNION ALL SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 400)
        |GROUP BY k""".stripMargin) { c =>
      import c.t
      t("lineitem").filter($"l_orderkey" <= 400).select($"l_orderkey".as("k"))
        .unionAll(t("orders").filter($"o_orderkey" <= 400).select($"o_orderkey".as("k")))
        .groupBy($"k").agg(count(lit(1)).as("n"))
    },

    // Map-typed column surface (SURVEY §2.8 extension): construct a
    // map, merge the JSON props map into it (map_concat), read/keys/
    // entries. Output rendered as sorted k=v strings — engine-neutral
    // (DuckDB's MAP accessors return lists, so its oracle builds the
    // same strings directly).
    q("q58_map_funcs",
      """SELECT event_id,
        |  array_to_string(list_sort(['type=' || event_type,
        |    'uid=' || cast(user_id AS varchar),
        |    'pk=' || json_extract_string(props, '$.k')]), ',') AS kv,
        |  event_type AS type_val,
        |  3 AS n_keys
        |FROM events WHERE event_id <= 300""".stripMargin) { c =>
      import c.t
      t("events").filter($"event_id" <= 300)
        .select($"event_id",
          map(
            lit("type"), $"event_type",
            lit("uid"), $"user_id".cast("string")).as("m0"),
          from_json($"props",
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)).as("pm"))
        .select($"event_id",
          map_concat($"m0",
            map(lit("pk"), element_at($"pm", "k"))).as("m"))
        .select($"event_id",
          array_join(array_sort(transform(map_entries($"m"),
            e => concat(e.getField("key"), lit("="), e.getField("value")))), ",").as("kv"),
          element_at($"m", "type").as("type_val"),
          size(map_keys($"m")).as("n_keys"))
    },

    // Map higher-order functions: map_zip_with / map_filter /
    // transform_keys / transform_values chained, flattened to a
    // sorted entries string. DuckDB has no map HOFs, so the oracle
    // expands the per-key arithmetic literally — with IDENTICAL
    // floating-point op order ((v*2+1)+1.0, never v*2+2: IEEE
    // addition does not reassociate).
    // The oracle mirrors the QUERY semantics, not the data domain:
    // every map_filter branch gets the same guard (coalesce included)
    // on the oracle side, so rows with negative or null values would
    // still agree — even though today's events.value is positive and
    // non-null.
    q("q59_map_hof",
      """SELECT event_id,
        |  array_to_string(list_sort(list_filter([
        |    CASE WHEN coalesce(v, 0) >= 1
        |      THEN 'A=' || cast(round(coalesce(v, 0), 2) AS varchar) END,
        |    CASE WHEN coalesce(v*2+1, 0) + 1.0 >= 1
        |      THEN 'B=' || cast(round(coalesce(v*2+1, 0) + 1.0, 2) AS varchar) END,
        |    'C=' || cast(round(3.0, 2) AS varchar)
        |  ], x -> x IS NOT NULL)), ',') AS kv
        |FROM (SELECT event_id, cast(value AS double) AS v
        |      FROM events WHERE event_id <= 300)""".stripMargin) { c =>
      import c.t
      t("events").filter($"event_id" <= 300)
        .select($"event_id", $"value".cast("double").as("v"))
        .select($"event_id",
          map(lit("a"), $"v", lit("b"), $"v" * 2 + 1).as("m1"),
          map(lit("b"), lit(1.0), lit("c"), lit(3.0)).as("m2"))
        .select($"event_id",
          map_zip_with($"m1", $"m2",
            (_, x, y) => coalesce(x, lit(0.0)) + coalesce(y, lit(0.0))).as("z"))
        .select($"event_id", map_filter($"z", (_, x) => x >= lit(1.0)).as("f"))
        .select($"event_id",
          transform_values(transform_keys($"f", (k, _) => upper(k)),
            (_, x) => round(x, 2)).as("r"))
        .select($"event_id",
          array_join(array_sort(transform(map_entries($"r"),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast("string")))), ",").as("kv"))
    },

    q("q55_json_funcs",
      """SELECT event_id, cast(json_extract_string(props, '$.k') AS int) AS k
        |FROM events WHERE event_id <= 500""".stripMargin) { c =>
      import c.t
      t("events").filter($"event_id" <= 500)
        .select($"event_id",
          get_json_object($"props", "$.k").cast("int").as("k"))
    },

    // Declarative data-quality gate (see operators.DataAudit): all five
    // row-local checks fold into ONE aggregation pass over lineitem;
    // referential integrity adds a semi-join count against orders. The
    // oracle replays every ratio and the rounded-then-compared pass
    // rule, so metric arithmetic AND gating semantics are both checked.
    q("q147_quality_audit",
      """WITH m AS (SELECT
        |    count(*)::DOUBLE AS n,
        |    count(l_quantity)::DOUBLE AS c1,
        |    sum(CASE WHEN l_discount IS NOT NULL AND l_discount >= 0 AND l_discount <= 0.1
        |        THEN 1 ELSE 0 END)::DOUBLE AS c2,
        |    sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END)::DOUBLE AS c3,
        |    sum(CASE WHEN regexp_matches(l_linestatus, '^[OF]$') THEN 1 ELSE 0 END)::DOUBLE AS c4,
        |    count(DISTINCT (l_orderkey, l_linenumber))::DOUBLE AS c5
        |  FROM lineitem),
        |ri AS (SELECT count(*)::DOUBLE AS hits FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
        |SELECT 'completeness' AS check_name, 'l_quantity' AS col_name,
        |  round(c1 / n, 6) AS metric, 0.99 AS threshold, round(c1 / n, 6) >= 0.99 AS passed FROM m
        |UNION ALL SELECT 'in_range', 'l_discount',
        |  round(c2 / n, 6), 0.95, round(c2 / n, 6) >= 0.95 FROM m
        |UNION ALL SELECT 'in_set', 'l_returnflag',
        |  round(c3 / n, 6), 1.0, round(c3 / n, 6) >= 1.0 FROM m
        |UNION ALL SELECT 'matches_regex', 'l_linestatus',
        |  round(c4 / n, 6), 1.0, round(c4 / n, 6) >= 1.0 FROM m
        |UNION ALL SELECT 'uniqueness', 'l_orderkey,l_linenumber',
        |  round(c5 / n, 6), 1.0, round(c5 / n, 6) >= 1.0 FROM m
        |UNION ALL SELECT 'referential_integrity', 'l_orderkey->o_orderkey',
        |  round(hits / n, 6), 1.0, round(hits / n, 6) >= 1.0 FROM ri, m""".stripMargin) { c =>
      import c.t
      import graft.operators.DataAudit._
      run(t("lineitem"), Seq(
        Completeness("l_quantity", 0.99),
        InRange("l_discount", 0.0, 0.1, 0.95),
        InSet("l_returnflag", Seq("A", "N", "R"), 1.0),
        MatchesRegex("l_linestatus", "^[OF]$", 1.0),
        Uniqueness(Seq("l_orderkey", "l_linenumber"), 1.0),
        ReferentialIntegrity("l_orderkey", t("orders"), "o_orderkey", 1.0)))
    })
}

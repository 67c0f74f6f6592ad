package graft.queries

/** Subquery SQL surface: uncorrelated + correlated scalar subqueries,
  * EXISTS, IN / NOT IN, and correlated LATERAL with per-row top-k.
  *
  * These run through `spark.sql` over the registered harness views —
  * deliberately NOT the DataFrame API: the surface under test is
  * Catalyst's subquery handling (predicate subqueries rewritten to
  * semi/anti joins, correlated scalar aggregates decorrelated into
  * joins, lateral subqueries planned as correlated joins). The oracle
  * runs the IDENTICAL SQL text in DuckDB, so the two engines must
  * agree on the full subquery semantics, not just on a rewritten
  * DataFrame approximation.
  *
  * Scale notes: every decorrelation below lands on an equi-join
  * shuffle keyed by the correlation key (custkey/suppkey), the same
  * shape a hand-written join would produce — no nested-loop
  * per-row re-execution survives planning. q48's lateral top-k plans
  * the per-group sort under the join, bounded by LIMIT 2 per group.
  */
object SqlQueries extends QueryDsl {

  /** Same SQL text on both engines; Spark side over temp views. Only
    * the tables the statement references are registered — view
    * registration costs a parquet footer read per table, paid on
    * every invocation. */
  private def sqlQ(name: String, sql: String): Q =
    q(name, sql) { c =>
      graft.GraftSql.tableNames
        .filter(t => sql.matches(s"(?s).*\\b$t\\b.*"))
        .foreach(t => graft.Tables.load(c.spark, c.dir, t).createOrReplaceTempView(t))
      c.spark.sql(sql)
    }

  def all: Seq[Q] = Seq(

    // uncorrelated scalar subquery: global-average threshold
    sqlQ("q44_scalar_subquery",
      """SELECT p_brand, count(*) AS n_premium
        |FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |GROUP BY p_brand""".stripMargin),

    // correlated EXISTS -> left-semi join after RewritePredicateSubquery
    sqlQ("q45_exists_correlated",
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |GROUP BY c_mktsegment""".stripMargin),

    // correlated scalar AGGREGATE subquery -> decorrelated aggregate+join
    sqlQ("q46_correlated_scalar",
      """SELECT o_orderpriority, count(*) AS n_above
        |FROM orders o
        |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
        |                      FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority""".stripMargin),

    // IN -> semi join; NOT IN -> null-aware anti join (keys non-null
    // here). Order-level membership: an order has ~4 lineitems, so
    // both subqueries actually discriminate (supplier/part-level
    // membership saturates — every supplier hits every quantity
    // bucket in the uniform testdata).
    sqlQ("q47_in_subquery",
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09)
        |GROUP BY o_orderpriority""".stripMargin),

    // correlated LATERAL with per-row ORDER BY ... LIMIT: top-2 orders
    // per customer (unique o_orderkey tie-break keeps it deterministic)
    sqlQ("q48_lateral_topk",
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |WHERE c.c_custkey <= 100""".stripMargin))
}

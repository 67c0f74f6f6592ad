package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSqlSpec extends AnyFunSuite {

  test("SQL entry: views + custom kernels work in one pure-SQL session") {
    val spark = GraftSql.session(cpus = 4)
    try {
      GraftSql.registerTables(spark, "/root/testdata/sf0.001")
      val geo = spark.sql(
        """SELECT r_name, count(*) AS n FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name""".stripMargin)
      assert(geo.count() === 5)
      // custom kernel reachable from SQL over a real table
      val selfdot = spark.sql(
        """SELECT vec_id, round(vec_dot(embedding, embedding), 4) AS sq_norm
          |FROM embeddings WHERE vec_id < 3""".stripMargin).collect()
      assert(selfdot.length === 3)
      selfdot.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-3))
      // repetition-stats kernel from pure SQL
      val ts = spark.sql(
        """SELECT token_stats(split(trim(lower(text)), '\\s+')) AS ts
          |FROM documents WHERE length(trim(text)) > 0 LIMIT 5""".stripMargin).collect()
      assert(ts.length === 5)
      ts.foreach { r =>
        val s = r.getStruct(0)
        assert(s.getLong(0) >= s.getLong(1) && s.getLong(1) >= 1 && s.getLong(2) >= 1)
      }
      // entropy kernel from pure SQL: bounded by ln(n_tokens)
      val ent = spark.sql(
        """SELECT token_entropy(split(trim(lower(text)), '\\s+')) AS h,
          |  size(split(trim(lower(text)), '\\s+')) AS n
          |FROM documents WHERE length(trim(text)) > 0 LIMIT 5""".stripMargin).collect()
      assert(ent.length === 5)
      ent.foreach { r =>
        assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= math.log(r.getInt(1).toDouble) + 1e-12)
      }
    } finally spark.stop()
  }
}

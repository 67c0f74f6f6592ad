package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: the Spark dataflow plus (where SQL can
  * express it) the equivalent DuckDB SQL the driver runs on the same
  * parquet tables. Column names are aligned on both sides — the
  * harness sorts columns by name and hashes values, so every computed
  * column is aliased identically in the Spark code and the SQL.
  *
  * Determinism rules applied throughout (the harness reads Spark
  * parquet through pandas but the oracle through DuckDB's pandas
  * bridge, so OUTPUT TYPES must agree down to the dtype family):
  *  - no decimal ever leaves a query: money aggregates SUM in
  *    decimal(18,2|4) for exactness, then cast the result to double —
  *    a decimal output renders '28.00' on one side and '28.0' on the
  *    other;
  *  - integer outputs are integer on BOTH sides (DuckDB sum(int) is
  *    HUGEINT and floor/ceil are DOUBLE — cast in the SQL);
  *  - top-k / limit queries always carry a unique total tie-break;
  *  - double aggregates are rounded ONCE, after casting to double;
  *  - no raw timestamp outputs (epoch longs / formatted strings
  *    instead) — the events table is ns-precision parquet which the
  *    two engines surface at different precisions.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    CoreQueries.all ++ SqlQueries.all ++ TextQueries.all ++ EventQueries.all ++
      NvdQueries.all ++ SearchQueries.all ++ MlQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Shared helpers for query definition files. */
trait QueryDsl {
  final class Ctx(val spark: SparkSession, val dir: String) {
    def t(name: String): DataFrame = graft.Tables.load(spark, dir, name)
  }

  protected def q(name: String, oracle: String = null)(body: Ctx => DataFrame): Q =
    Q(name, (s, d) => body(new Ctx(s, d)), Option(oracle))

  /** $"col" sugar without a SparkSession-bound implicits import. */
  protected implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.col(sc.s(args: _*))
  }
}

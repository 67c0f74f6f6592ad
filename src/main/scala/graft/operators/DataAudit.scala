package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/Great-Expectations shape):
  * a set of constraints over a table evaluated into one result row per
  * check — `(check_name, col_name, metric, threshold, passed)` — the
  * gate a 100 TB ingest pipeline runs before publishing a snapshot.
  *
  * Plan shape: every ROW-LOCAL check (completeness, range, set
  * membership, regex) folds into a SINGLE aggregation pass over the
  * table — adding a check adds a conditional-count expression, not a
  * scan. Uniqueness rides the same pass as a distinct count (Spark
  * plans the mixed distinct/non-distinct agg via expand). Referential
  * integrity is the one check that genuinely needs a second input: a
  * semi-join count against the reference keys (broadcast when small,
  * shuffle otherwise — Catalyst's choice).
  *
  * Metrics are pass ratios in [0,1], rounded to 6dp; a check passes
  * when `metric >= threshold`.
  */
object DataAudit {

  sealed trait Check
  /** non-null fraction of `col` ≥ threshold */
  final case class Completeness(col: String, threshold: Double) extends Check
  /** fraction of rows with `lo <= col <= hi` (nulls fail) */
  final case class InRange(col: String, lo: Double, hi: Double, threshold: Double) extends Check
  /** fraction of rows whose `col` is one of `values` (nulls fail) */
  final case class InSet(col: String, values: Seq[String], threshold: Double) extends Check
  /** fraction of rows whose `col` RLIKE `regex` (nulls fail) */
  final case class MatchesRegex(col: String, regex: String, threshold: Double) extends Check
  /** distinct(cols)/count ≥ threshold (exact distinct) */
  final case class Uniqueness(cols: Seq[String], threshold: Double) extends Check
  /** fraction of rows whose `col` exists in `refCol` of `ref` */
  final case class ReferentialIntegrity(
      col: String, ref: DataFrame, refCol: String, threshold: Double) extends Check

  private def ratio(hit: Column) =
    sum(when(hit, 1L).otherwise(0L)).cast("double") / count(lit(1)).cast("double")

  private def name(c: Check): (String, String) = c match {
    case Completeness(col, _) => ("completeness", col)
    case InRange(col, _, _, _) => ("in_range", col)
    case InSet(col, _, _) => ("in_set", col)
    case MatchesRegex(col, _, _) => ("matches_regex", col)
    case Uniqueness(cols, _) => ("uniqueness", cols.mkString(","))
    case ReferentialIntegrity(col, _, refCol, _) => ("referential_integrity", s"$col->$refCol")
  }

  private def threshold(c: Check): Double = c match {
    case Completeness(_, t) => t
    case InRange(_, _, _, t) => t
    case InSet(_, _, t) => t
    case MatchesRegex(_, _, t) => t
    case Uniqueness(_, t) => t
    case ReferentialIntegrity(_, _, _, t) => t
  }

  /** One row per check: (check_name, col_name, metric, threshold, passed). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val local = checks.filter(!_.isInstanceOf[ReferentialIntegrity])
    val ri = checks.collect { case c: ReferentialIntegrity => c }

    val frames = localFrame(df, local).toSeq ++ ri.map(riFrame(df, _))
    frames.reduce(_.unionByName(_))
      .withColumn("metric", round(col("metric"), 6))
      .withColumn("passed", col("metric") >= col("threshold"))
      .select("check_name", "col_name", "metric", "threshold", "passed")
  }

  /** All row-local checks in ONE aggregation pass, exploded to rows. */
  private def localFrame(df: DataFrame, local: Seq[Check]): Option[DataFrame] = {
    if (local.isEmpty) return None
    val metricCols = local.zipWithIndex.map { case (c, i) =>
      val m = c match {
        case Completeness(cn, _) => ratio(col(cn).isNotNull)
        case InRange(cn, lo, hi, _) =>
          ratio(col(cn).isNotNull && col(cn) >= lo && col(cn) <= hi)
        case InSet(cn, vs, _) => ratio(col(cn).isInCollection(vs))
        case MatchesRegex(cn, re, _) => ratio(col(cn).rlike(re))
        case Uniqueness(cols, _) =>
          countDistinct(struct(cols.map(col): _*)).cast("double") /
            count(lit(1)).cast("double")
        case _: ReferentialIntegrity =>
          throw new IllegalStateException("RI is not row-local")
      }
      m.as(s"__m$i")
    }
    val agged = df.agg(metricCols.head, metricCols.tail: _*)
    val rows = local.zipWithIndex.map { case (c, i) =>
      val (cn, coln) = name(c)
      struct(lit(cn).as("check_name"), lit(coln).as("col_name"),
        col(s"__m$i").as("metric"), lit(threshold(c)).as("threshold"))
    }
    Some(agged.select(explode(array(rows: _*)).as("r")).select("r.*"))
  }

  /** Containment ratio via semi-join count: two scalar counts joined
    * into one row (both one-row frames — a trivial join). */
  private def riFrame(df: DataFrame, c: ReferentialIntegrity): DataFrame = {
    val refKeys = c.ref.select(col(c.refCol).as(c.col)).distinct()
    val hits = df.join(refKeys, Seq(c.col), "left_semi")
      .agg(count(lit(1)).cast("double").as("__hits"))
    val total = df.agg(count(lit(1)).cast("double").as("__total"))
    val (cn, coln) = name(c)
    hits.crossJoin(total).select(
      lit(cn).as("check_name"), lit(coln).as("col_name"),
      (col("__hits") / col("__total")).as("metric"),
      lit(c.threshold).as("threshold"))
  }
}

package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc plan/timing probe (not part of the library surface). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q02_count_distinct")(spark, sfDir).count() // warmup
    for (name <- args.drop(1)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name")
      df.explain("formatted")
      val t0 = System.nanoTime(); df.count()
      println(f"$name time: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}

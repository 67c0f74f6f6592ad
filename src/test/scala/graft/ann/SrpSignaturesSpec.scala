package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Pins the fused SrpSignatures kernel bit-for-bit against the composed
  * per-table srpSignature Column form it replaced on the production
  * signing sites (optimization r16). The composed form stays in the
  * codebase as the contract oracles' independent derivation, so this
  * equality is also a standing kernel-vs-composed cross-check. */
class SrpSignaturesSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("fused == composed per table on the harness embeddings (8x8x64)") {
    val composed = emb.select(col("vec_id"),
      array((0 until 8).map(t =>
        Ann.srpSignature(col("embedding"), 8, 64, 42L + t)): _*).as("sig"))
    val fused = emb.select(col("vec_id"),
      Ann.srpSignatures(col("embedding"), 8, 64, 42L, 8).as("sig"))
    assert(composed.exceptAll(fused).isEmpty && fused.exceptAll(composed).isEmpty)
  }

  test("fused == composed at the 12-bit single-table family (lshTopK)") {
    val composed = emb.select(col("vec_id"),
      Ann.srpSignature(col("embedding"), 12, 64, 42L).as("sig"))
    val fused = emb.select(col("vec_id"),
      Ann.srpSignatures(col("embedding"), 12, 64, 42L, 1).getItem(0).as("sig"))
    assert(composed.exceptAll(fused).isEmpty && fused.exceptAll(composed).isEmpty)
  }

  test("null vector yields all-zero signatures (the when/otherwise fallthrough), never null") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.add(org.apache.spark.sql.Row(1L, null))
    rows.add(org.apache.spark.sql.Row(2L,
      Seq.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat)))
    // null ELEMENT reads as 0.0, like the VecBinaryKernel dot
    rows.add(org.apache.spark.sql.Row(3L,
      Seq.tabulate(64)(i => if (i == 7) null else (math.cos(i) * 2).toFloat)))
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(col("id"),
        Ann.srpSignatures(col("v"), 8, 64, 42L, 8).as("sig"),
        array((0 until 8).map(t =>
          Ann.srpSignature(col("v"), 8, 64, 42L + t)): _*).as("composed"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Int](1), r.getSeq[Int](2))).sortBy(_._1)
    assert(out(0)._2 === Seq.fill(8)(0))
    out.foreach { case (_, fused, composed) => assert(fused === composed) }
  }

  test("length mismatch fails loud, like the DotProduct it fuses") {
    val df = spark.range(1).select(
      array((0 until 8).map(i => lit(i.toFloat)): _*).as("v"))
    val e = intercept[Exception] {
      df.select(Ann.srpSignatures(col("v"), 8, 64, 42L, 8)).collect()
    }
    assert(e.getMessage.contains("vector length") ||
      Option(e.getCause).exists(_.getMessage.contains("vector length")))
  }

  test("interpreted eval matches codegen (double-element input)") {
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    (0 until 16).foreach { r =>
      rows.add(org.apache.spark.sql.Row(r.toLong,
        Seq.tabulate(64)(i => math.sin(r * 64 + i + 1) * 2)))
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(rows, schema)
    val viaCodegen = df.select(col("id"),
      Ann.srpSignatures(col("v"), 8, 64, 42L, 8).as("sig"))
    val composed = df.select(col("id"),
      array((0 until 8).map(t =>
        Ann.srpSignature(col("v"), 8, 64, 42L + t)): _*).as("sig"))
    assert(viaCodegen.exceptAll(composed).isEmpty &&
      composed.exceptAll(viaCodegen).isEmpty)
    // interpreted path: eval() over a bound reference per row
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val expr = SrpSignatures(
      BoundReference(0, ArrayType(DoubleType, containsNull = false),
        nullable = true), 8, 64, 42L, 8)
    val composedById = composed.orderBy("id").collect().map(_.getSeq[Int](1))
    (0 until 16).foreach { r =>
      val v = new GenericArrayData(
        Array.tabulate(64)(i => math.sin(r * 64 + i + 1) * 2))
      val interp = expr.eval(InternalRow(v))
        .asInstanceOf[ArrayData].toIntArray.toSeq
      assert(interp === composedById(r))
    }
    // null input: interpreted path agrees with the zeros contract
    assert(expr.eval(InternalRow(null))
      .asInstanceOf[ArrayData].toIntArray.toSeq === Seq.fill(8)(0))
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** SimHash (Charikar) 64-bit fingerprints for near-duplicate text.
  *
  * Implemented as a custom Catalyst `Expression` rather than a UDF or
  * an explode/groupBy dataflow: the per-document loop (hash each
  * token, accumulate 64 signed bit counts, emit the sign vector) is
  * imperative and tiny, so a single-pass expression evaluates it
  * with zero shuffle and no serialization boundary — the idiomatic
  * Spark escape hatch when built-ins would need 64 aggregates.
  * Codegen calls the static `compute` kernel, keeping the expression
  * inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.dedup.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared interpreted/codegen kernel. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

object SimHash {

  /** simhash64 over a token-array column. */
  def simhash(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }

  /** Hamming distance between two int64 fingerprints (bit_count is
    * codegen'd). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by SimHash: fingerprint, then block by
    * 16-bit chunks (a doc pair within hamming distance <= 3 must agree
    * on at least one of 4 chunks — pigeonhole), join per block, verify
    * hamming distance. Same shuffle profile as banded MinHash LSH —
    * including the same skew guard: a popular chunk value (near-empty
    * docs fingerprint alike, so e.g. chunk values of 0 pile up) would
    * otherwise make one bucket's self-join quadratic at scale.
    * Dropping an oversized bucket trades recall for a bounded join,
    * exactly like MinHash's `maxBucketSize`. NOTE the pigeonhole
    * guarantee only survives the drop when SOME agreeing chunk bucket
    * stays under the cap: a pair whose every agreeing chunk lands in a
    * dropped bucket is lost, not recovered elsewhere.
    *
    * @param maxBucketSize drop (blk, key) buckets larger than this
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    // Fingerprints are CACHED (16 bytes/doc): the blocked frame feeds
    // a self-join, and without the cache the simhash kernel runs once
    // per join side.
    val fp = graft.operators.Partitioning.spread(docs).select(
      col(idCol).as("doc"),
      simhash(TextFunctions.wsTokens(lower(col(textCol)))).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairsFromFingerprints(fp, maxHamming, maxBucketSize,
      chunks = 4, chunkBits = 16) // pigeonhole blocks for maxHamming <= 3
  }

  /** The pigeonhole Hamming join over ANY int64 fingerprint frame
    * (`doc`, `fp`) — shared by text SimHash and the perceptual-hash
    * image dedup (graft.multimodal.ImageDedup): block by `chunks`
    * chunks of `chunkBits` bits, join per block, verify `bit_count` of
    * the XOR. Exact (every pair within `maxHamming` found) as long as
    * `chunks > maxHamming` and no agreeing bucket was dropped: a pair
    * differing in <= maxHamming bits must agree on at least one of
    * maxHamming+1 chunks.
    *
    * Fingerprints narrower than 64 bits just leave the high chunks
    * constant-zero — those blocks then bucket EVERYTHING together, so
    * callers with an n-bit hash should pass chunks*chunkBits = n. */
  def pairsFromFingerprints(
      fp: DataFrame,
      maxHamming: Int,
      maxBucketSize: Int,
      chunks: Int,
      chunkBits: Int): DataFrame = {
    require(chunks > maxHamming,
      s"pigeonhole needs chunks ($chunks) > maxHamming ($maxHamming)")
    require(chunks * chunkBits <= 64,
      s"chunks*chunkBits must fit in 64 bits, got ${chunks * chunkBits}")
    val mask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1L
    val blocked = fp.select(
      col("doc"), col("fp"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("blk"),
          col("fp").bitwiseAND(lit(mask << (chunkBits * c))).as("key"))
      }: _*)).as("b"))
      .select(col("doc"), col("fp"), col("b.blk"), col("b.key"))
    val sized = MinHashLSH.dropOversizedBuckets(blocked, Seq("blk", "key"), maxBucketSize)

    val a = sized.as("a")
    val b = sized.as("b")
    a.join(b,
        col("a.blk") === col("b.blk") &&
        col("a.key") === col("b.key") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        hammingDist(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}

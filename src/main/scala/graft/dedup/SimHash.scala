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
    // caching of the fingerprints (the blocked frame feeds a
    // self-join) is owned by pairsFromFingerprints, which also
    // RELEASES it — a caller-side persist leaked per call
    val fp = graft.operators.Partitioning.spread(docs).select(
      col(idCol).as("doc"),
      simhash(TextFunctions.wsTokens(lower(col(textCol)))).as("fp"))
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
    val spark = fp.sparkSession
    // fingerprints are CACHED (16 bytes/row — the blocked frame feeds a
    // self-join, and without the cache the fingerprint kernel runs once
    // per join side) and RELEASED before returning
    val cached = fp.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cached.count()
    // DRIVER route for a bounded fingerprint set (the CoPresence /
    // LabelPropagation precedent): the blocked self-join + distinct is
    // ~6 shuffle stages of integer work that fits in one core's cache
    // for a 16-byte-per-doc frame. Integer popcounts — bit-identical
    // to the distributed bit_count verify in any evaluation order; the
    // candidate-work cap bounds degenerate bucket skew with the
    // distributed fallback. Corpus-scale inputs blow the row gate and
    // nothing changes.
    val driverMax = spark.conf.getOption(DriverMaxFingerprintsKey)
      .map(_.toLong).getOrElse(512L * 1024)
    if (n <= driverMax &&
        cached.schema("doc").dataType == LongType) {
      driverPairs(spark, cached.collect(), maxHamming, maxBucketSize,
          chunks, chunkBits, mask) match {
        case Some(res) => cached.unpersist(); return res
        case None => () // candidate-work cap tripped — serve distributed
      }
    }
    val blocked = cached.select(
      col("doc"), col("fp"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("blk"),
          col("fp").bitwiseAND(lit(mask << (chunkBits * c))).as("key"))
      }: _*)).as("b"))
      .select(col("doc"), col("fp"), col("b.blk"), col("b.key"))
    val sized = MinHashLSH.dropOversizedBuckets(blocked, Seq("blk", "key"), maxBucketSize)

    val a = sized.as("a")
    val b = sized.as("b")
    val pairs = a.join(b,
        col("a.blk") === col("b.blk") &&
        col("a.key") === col("b.key") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        hammingDist(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    // eagerly materialize (dup-density-sized) so the fingerprint cache
    // can be released — a lazy return would pin it for the session
    // (guide §5; the SemanticContamination.lshReport convention)
    val out = pairs.localCheckpoint()
    cached.unpersist()
    out
  }

  /** Conf key bounding the driver pigeonhole route (max fingerprint
    * rows collected; 16 bytes each). */
  val DriverMaxFingerprintsKey = "spark.graft.simhash.driverMaxFingerprints"

  /** Candidate-work backstop for the driver route: past this many
    * in-bucket pair checks (degenerate skew the distributed route
    * would also crawl through) fall back rather than stall the
    * driver. */
  val MaxDriverPairChecks: Long = 1L << 26

  /** The pigeonhole join resolved on the driver — value-identical to
    * the distributed route: same bucket keys, same oversized-bucket
    * drop (counts over ALL rows, null-doc included, exactly like the
    * count aggregate), pairs per bucket under `a.doc < b.doc`, integer
    * XOR+popcount verify, distinct over (doc_a, doc_b, hamming). */
  private def driverPairs(
      spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row],
      maxHamming: Int,
      maxBucketSize: Int,
      chunks: Int,
      chunkBits: Int,
      mask: Long): Option[DataFrame] = {
    import scala.collection.mutable
    // bucket -> member rows (pairable: doc AND fp non-null) + total
    // row count (the drop gate counts every blocked row)
    val members = mutable.HashMap.empty[(Int, Long), mutable.ArrayBuffer[(Long, Long)]]
    val sizes = mutable.HashMap.empty[(Int, Long), Long]
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        val f = r.getLong(1)
        var c = 0
        while (c < chunks) {
          val k = (c, f & (mask << (chunkBits * c)))
          sizes.update(k, sizes.getOrElse(k, 0L) + 1L)
          if (!r.isNullAt(0))
            members.getOrElseUpdate(k,
              mutable.ArrayBuffer.empty[(Long, Long)]) += ((r.getLong(0), f))
          c += 1
        }
      }
    }
    val kept = members.iterator
      .filter { case (k, _) => sizes(k) <= maxBucketSize }.toArray
    var work = 0L
    kept.foreach { case (_, m) =>
      work += m.length.toLong * (m.length - 1) / 2 }
    if (work > MaxDriverPairChecks) return None
    val out = mutable.HashSet.empty[(Long, Long, Int)]
    kept.foreach { case (_, m) =>
      var i = 0
      while (i < m.length) {
        var j = i + 1
        while (j < m.length) {
          val (di, fi) = m(i); val (dj, fj) = m(j)
          if (di != dj) {
            val h = java.lang.Long.bitCount(fi ^ fj)
            if (h <= maxHamming) {
              if (di < dj) out += ((di, dj, h)) else out += ((dj, di, h))
            }
          }
          j += 1
        }
        i += 1
      }
    }
    val rws = out.iterator
      .map { case (a, b, h) => org.apache.spark.sql.Row(a, b, h) }.toSeq
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(rws, 1),
      StructType(Seq(
        StructField("doc_a", LongType, nullable = false),
        StructField("doc_b", LongType, nullable = false),
        StructField("hamming", IntegerType, nullable = false)))))
  }
}

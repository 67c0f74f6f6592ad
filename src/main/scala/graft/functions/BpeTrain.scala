package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training (Sennrich et al. 2016, the
  * word-dictionary formulation): learn the top-k byte-pair merges of
  * a corpus.
  *
  * Scale shape: the CORPUS is touched exactly once — one linear
  * tokenize + groupBy into the word-frequency dictionary (distinct
  * words with counts), which is orders of magnitude smaller than the
  * corpus and bounded by vocabulary, not data size. The k training
  * iterations run over THAT dictionary: each scores adjacent symbol
  * pairs (explode + weighted groupBy — map-side combined), takes the
  * argmax (driver collect of ONE row), and rewrites the merged pair
  * into the symbol sequences (codegen'd regexp_replace). Lineage is
  * localCheckpoint'ed every few rounds, the PageRank pattern for
  * driver-loop operators.
  *
  * Determinism: argmax ties break on (count desc, left asc, right
  * asc), so the merge sequence is reproducible across partitionings
  * and engines.
  */
object BpeTrain {

  /** `(rank, left, right, n)` — the learned merge table, rank 0 first.
    *
    * @param docs corpus frame
    * @param textCol text column (whitespace-tokenized, lowercased)
    * @param merges how many merges to learn (k driver rounds)
    * @param endOfWord terminator symbol appended to each word (the
    *        standard trick so merges cannot cross word boundaries and
    *        suffixes learn distinct units)
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      merges: Int,
      endOfWord: String = "</w>"): Seq[(Int, String, String, Long)] = {
    require(merges >= 0, s"merges must be >= 0: $merges")
    // corpus -> word dict: the ONLY corpus-wide pass
    val words = docs
      .select(explode(TextFunctions.wsTokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    // initial symbol sequence: characters space-joined + terminator.
    // Spark's split(w, "") keeps a trailing empty element (limit -1
    // semantics) — array_remove drops it, matching String#split.
    var dict = words.select(
      concat(array_join(array_remove(split(col("w"), ""), ""), " "),
        lit(" " + endOfWord)).as("sym"),
      col("n"))
      .localCheckpoint()

    // DRIVER route for a driver-bounded dictionary (the CC/Truss/LPA
    // precedent): the k merge rounds are pure integer pair-counting
    // over the word dict — distributed they cost one
    // explode+groupBy+argmax JOB per round, ~20 jobs of fixed stage
    // latency for microseconds of arithmetic. Tie-breaks compare
    // strings as unsigned UTF-8 bytes, exactly Spark's string
    // ordering, so the merge sequence is bit-identical to the
    // distributed argmax. The dict is vocabulary-bound (not corpus-
    // bound), so real corpora often qualify too; past the conf'd
    // bound the distributed loop below runs unchanged.
    val maxWords = docs.sparkSession.conf
      .getOption(DriverMaxWordsKey).map(_.toLong).getOrElse(512L * 1024)
    if (dict.count() <= maxWords)
      return driverLearn(
        dict.collect().map(r => (r.getString(0).split(" "), r.getLong(1))),
        merges)

    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    while (rank < merges) {
      // adjacent pair scores, weighted by word frequency
      val best = dict
        .select(col("n"), split(col("sym"), " ").as("s"))
        .select(col("n"),
          posexplode(slice(col("s"), lit(1), size(col("s")) - 1)).as(Seq("i", "l")),
          col("s"))
        .select(col("n"), col("l"), element_at(col("s"), col("i") + 2).as("r"))
        .groupBy(col("l"), col("r")).agg(sum(col("n")).as("pn"))
        .orderBy(col("pn").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) return out.result()
      val l: String = best.head.getString(0)
      val r: String = best.head.getString(1)
      val pn: Long = best.head.getLong(2)
      if (pn <= 0L) return out.result()
      out += ((rank, l, r, pn))

      // merge the winning pair inside every symbol sequence. The
      // lookahead does not consume the trailing separator, so runs
      // like "a a a" merge left-to-right greedily (reference BPE).
      val pat = s"(?<=^|\\s)${Pattern.quote(l)} ${Pattern.quote(r)}(?=\\s|$$)"
      val rep = Matcher.quoteReplacement(l + r)
      dict = dict.select(
        regexp_replace(col("sym"), pat, rep).as("sym"), col("n"))
      if (rank % 4 == 3) dict = dict.localCheckpoint()
      rank += 1
    }
    out.result()
  }

  /** Conf key bounding [[learnMerges]]'s driver route (max distinct
    * words collected). */
  val DriverMaxWordsKey = "spark.graft.bpe.driverMaxWords"

  /** Unsigned byte-wise UTF-8 comparison — Spark's string ordering
    * (UTF8String.compareTo), NOT Java's UTF-16 compareTo: the two
    * differ on supplementary characters, and the driver argmax must
    * tie-break exactly like the distributed orderBy. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-local merge rounds over the collected word dict. Pair
    * counts are exact longs; the per-round rewrite is the greedy
    * left-to-right non-overlapping merge — the same semantics as the
    * distributed loop's lookaround regexp_replace. */
  private def driverLearn(
      dict: Array[(Array[String], Long)],
      merges: Int): Seq[(Int, String, String, Long)] = {
    val words = dict.map { case (s, n) => (s, n) }
    var syms: Array[Array[String]] = words.map(_._1)
    val ns: Array[Long] = words.map(_._2)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    while (rank < merges) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val n = ns(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) return out.result()
      var bestL: String = null; var bestR: String = null; var bestN = 0L
      counts.foreach { case ((l, r), n) =>
        if (bestL == null || n > bestN ||
            (n == bestN && (utf8Less(l, bestL) ||
              (l == bestL && utf8Less(r, bestR))))) {
          bestL = l; bestR = r; bestN = n
        }
      }
      if (bestN <= 0L) return out.result()
      out += ((rank, bestL, bestR, bestN))
      val merged = bestL + bestR
      syms = syms.map { s =>
        if (s.length < 2) s
        else {
          val b = Array.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == bestL && s(i + 1) == bestR) {
              b += merged; i += 2
            } else { b += s(i); i += 1 }
          }
          b.result()
        }
      }
      rank += 1
    }
    out.result()
  }

  /** [[learnMerges]] as a DataFrame `(rank, left, right, n)` for the
    * query surface. */
  def learnMergesDf(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, merges)
      .toDF("rank", "left", "right", "n")
  }

  /** Apply a learned merge table and report per-document token stats:
    * `(idCol, n_words, n_bpe_tokens, fertility)` where fertility is
    * BPE tokens per whitespace word (the tokenizer-efficiency metric
    * corpora are screened with — text a tokenizer shatters is a
    * quality signal).
    *
    * Scale shape: the merges fold into ONE projection chain of k
    * codegen regexp_replace steps over the DISTINCT-WORD dictionary
    * (rank order = application order, exactly as trained), so the
    * expensive rewriting is vocabulary-bound; the corpus-side work is
    * a tokenize + a join on the word (dict broadcast when small) + a
    * per-doc sum. */
  def tokenizeStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      endOfWord: String = "</w>"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextFunctions.wsTokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
    val dict0 = words.select(col("w")).distinct().select(col("w"),
      concat(array_join(array_remove(split(col("w"), ""), ""), " "),
        lit(" " + endOfWord)).as("sym"))
    val dict = merges.foldLeft(dict0) { case (d, (l, r)) =>
      val pat = s"(?<=^|\\s)${Pattern.quote(l)} ${Pattern.quote(r)}(?=\\s|$$)"
      d.withColumn("sym", regexp_replace(col("sym"), pat, Matcher.quoteReplacement(l + r)))
    }
    val tokPerWord = dict.select(col("w"),
      size(split(col("sym"), " ")).cast("long").as("t"))
    words.join(tokPerWord, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("t")).as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double") / col("n_words").cast("double"), 6))
  }
}

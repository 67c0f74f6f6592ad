package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  /** Deterministic anisotropic cloud in 4d: variance concentrated on
    * the (1,1,0,0)/sqrt(2) direction, small noise elsewhere. */
  private def planted = {
    val sp = spark; import sp.implicits._
    val rows = (0 until 400).map { n =>
      // hash-derived pseudo-noise, no RNG state
      def u(salt: Int): Double =
        (((n * 2654435761L + salt * 40503L) & 0xffff) / 65536.0) - 0.5
      val t = (n % 40) - 20.0 // strong signal in [-20, 20)
      (n.toLong, Seq(
        (t / math.sqrt(2) + 0.01 * u(1)).toFloat,
        (t / math.sqrt(2) + 0.01 * u(2)).toFloat,
        (0.3 * u(3)).toFloat,
        (0.2 * u(4)).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fitStats: count, mean and covariance match hand computation on a 2d fixture") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val st = Pca.fitStats(df, "embedding", 2)
    assert(st.n == 3)
    assert(math.abs(st.mean(0) - 3.0) < 1e-12)
    assert(math.abs(st.mean(1) - 6.0) < 1e-12)
    val c = st.covMatrix
    // var x = ((1-3)^2 + 0 + (5-3)^2)/3 = 8/3; y = 2x exactly
    assert(math.abs(c(0)(0) - 8.0 / 3) < 1e-9)
    assert(math.abs(c(1)(1) - 32.0 / 3) < 1e-9)
    assert(math.abs(c(0)(1) - 16.0 / 3) < 1e-9)
  }

  test("eigSym recovers a known symmetric spectrum") {
    // A = [[2,1],[1,2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (vals, vecs) = Pca.eigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-9)
    assert(math.abs(vals(1) - 1.0) < 1e-9)
    val v0 = vecs(0)
    assert(math.abs(math.abs(v0(0)) - math.abs(v0(1))) < 1e-9)
  }

  test("planted direction is PC1; variances are descending; components orthonormal") {
    val m = Pca.fit(planted, "embedding", dim = 4, k = 4)
    // PC1 aligns with (1,1,0,0)/sqrt(2) up to sign
    val p = m.components(0)
    val align = math.abs(p(0) / math.sqrt(2) * math.sqrt(2) + p(1)) / math.sqrt(2) // |p·dir|
    val dir = Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0, 0.0)
    val dot = p.zip(dir).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) > 0.999, s"PC1 alignment ${math.abs(dot)}")
    // descending variances
    assert(m.variances.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    // orthonormal rows
    for (i <- m.components.indices; j <- m.components.indices) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-8, s"<c$i,c$j> = $d")
    }
  }

  test("projection: pc0 variance equals eigenvalue 0; total projected variance preserved at k=d") {
    val m = Pca.fit(planted, "embedding", dim = 4, k = 4)
    val proj = Pca.project(planted, "embedding", m)
    val stats = proj.agg(
      var_pop(col("pc0")).as("v0"), var_pop(col("pc1")).as("v1"),
      var_pop(col("pc2")).as("v2"), var_pop(col("pc3")).as("v3"))
      .head()
    val vs = (0 until 4).map(i => stats.getDouble(i))
    assert(math.abs(vs(0) - m.variances(0)) < 1e-6 * math.max(1.0, m.variances(0)))
    val total = m.variances.sum
    assert(math.abs(vs.sum - total) < 1e-6 * total,
      s"projected variance ${vs.sum} vs trace $total")
  }

  test("mahalanobis flags a low-variance-direction outlier that cosine misses") {
    val sp = spark; import sp.implicits._
    // cluster around (10, 0): wide along dim0, whisper-thin along dim1
    val cluster = (0 until 200).map { n =>
      val t = (n % 20) - 10.0
      (n.toLong, Seq((10.0 + t).toFloat, (0.001 * ((n % 7) - 3)).toFloat))
    }
    val outlier = Seq((999L, Seq(10.0f, 1.0f))) // 1 unit off the thin axis
    val df = (cluster ++ outlier).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 2, k = 2)
    val maha = Pca.mahalanobis(df, "embedding", model)
      .orderBy(col("maha").desc).select("vec_id").head().getLong(0)
    assert(maha == 999L, "Mahalanobis must rank the thin-axis deviation first")
    // centroid cosine does NOT rank it first: its angle to the centroid
    // is tiny because dim0 dominates the norms
    val byCos = df.withColumn("label", lit(0))
    val cosWorst = EmbeddingOutliers.outliers(byCos, "label", "vec_id", "embedding", k = 1)
      .select("vec_id").head().getLong(0)
    assert(cosWorst != 999L,
      s"cosine screen flagged $cosWorst — the planted case should separate the two screens")
  }

  test("mat-vec kernels survive Java serialization (executor task shipping)") {
    // regression: an eager field in the kernels' shared superclass NPE'd
    // during deserialization (the initializer runs before case-class
    // fields restore) — every multi-partition run failed
    import java.io._
    val e = graft.functions.MahalanobisDistSq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(0.0, 0.0), Array(1.0, 1.0))
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos); oos.writeObject(e); oos.close()
    val back = new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.functions.MahalanobisDistSq]
    // the restored kernel still evaluates: (1,2) under identity, w=1 -> 1+4
    assert(math.abs(back.nullSafeEval(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0f, 2.0f)))
      .asInstanceOf[Double] - 5.0) < 1e-12)
  }

  test("projection on a multi-partition frame is identical to single-partition") {
    val m = Pca.fit(planted, "embedding", dim = 4, k = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      Pca.mahalanobis(df, "embedding", m)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("maha")).toMap
    val one = rows(planted.coalesce(1))
    val many = rows(planted.repartition(13))
    assert(one.keySet == many.keySet)
    one.foreach { case (k2, v) => assert(math.abs(v - many(k2)) < 1e-12) }
  }

  test("covarianceDf on the harness embeddings: 64x65/2 rows, diagonal positive") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val cdf = Pca.covarianceDf(emb, "embedding", 64)
    assert(cdf.count() == 64 * 65 / 2)
    val diag = cdf.filter(col("i") === col("j")).select("cov").collect().map(_.getDouble(0))
    assert(diag.length == 64 && diag.forall(_ > 0))
  }

  test("q167b contract: eigen-route and inverse-route Mahalanobis agree per row on the real corpus") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val st = Pca.fitStats(emb, "embedding", 64)
    val cov = st.covMatrix
    val inv = Pca.invertSymmetric(cov)
    // the Gauss-Jordan inverse really inverts Σ
    val d = cov.length
    var prodErr = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      var t = 0
      while (t < d) { s += cov(i)(t) * inv(t)(j); t += 1 }
      prodErr = math.max(prodErr, math.abs(s - (if (i == j) 1.0 else 0.0)))
    }
    assert(prodErr < 1e-8, s"|cov*inv - I| = $prodErr")
    // per-row agreement of the two formulations (no shared linear
    // algebra: Jacobi eigendecomposition vs Gauss-Jordan inverse)
    val model = Pca.fit(emb, "embedding", 64, 64)
    val diffs = Pca.mahalanobis(emb, "embedding", model)
      .join(Pca.mahalanobisByMatrix(emb, "embedding", st.mean, inv)
        .select(col("vec_id"), col("maha2")), Seq("vec_id"))
      .select(abs(col("maha") - col("maha2")).as("d"), col("maha"))
      .collect()
    assert(diffs.nonEmpty)
    // the q167b bound (1e-4 relative) with margin: the real corpus
    // sits around 1e-5 — float32 cancellation noise, not algebra
    diffs.foreach { r =>
      assert(r.getDouble(0) < 1e-4 * math.max(1.0, r.getDouble(1)),
        s"formulations diverge: diff=${r.getDouble(0)} at maha=${r.getDouble(1)}")
    }
    // sensitivity: a perturbed inverse must NOT pass the q167b bound
    // (the contract actually detects a broken ingredient)
    val broken = inv.map(_.clone())
    broken(0)(0) *= 1.1
    val worst = Pca.mahalanobis(emb, "embedding", model)
      .join(Pca.mahalanobisByMatrix(emb, "embedding", st.mean, broken)
        .select(col("vec_id"), col("maha2")), Seq("vec_id"))
      .agg(max(abs(col("maha") - col("maha2")) / greatest(lit(1.0), col("maha"))))
      .head.getDouble(0)
    assert(worst > 1e-4, s"perturbed inverse went undetected (worst rel diff $worst)")
  }
}

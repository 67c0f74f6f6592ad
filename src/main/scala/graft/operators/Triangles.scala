package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting + local clustering coefficients over an
  * undirected edge frame — the cohesion layer of the graph family:
  * where ConnectedComponents answers reachability and LPA answers
  * community, the clustering coefficient answers "is this node's
  * neighborhood a dense near-dup clique or a thin star" — a strong
  * boilerplate/template signal on similarity graphs (template families
  * form cliques; topical neighborhoods do not).
  *
  * Algorithm: degree-ordered ORIENTATION — the standard scale-correct
  * formulation. Each undirected edge is directed from its
  * lower-(degree, id) endpoint to the higher one; every triangle then
  * has exactly ONE node with two out-edges, so
  *
  *   triangles = oriented(a,b) ⋈ oriented(a,c), b < c  ⋉ oriented(b,c)
  *
  * counts each triangle once, and the wedge join fans out by the
  * ORIENTED out-degree, which the orientation bounds by O(sqrt(|E|))
  * per node on any graph — the naive neighbor-join explodes on hubs,
  * this does not. All shuffles are keyed on node ids; nothing lands on
  * the driver.
  */
object Triangles {

  /** Per-node report `(node, degree, triangles, lcc)` over the
    * undirected graph given as one-directional pairs (deduplicated
    * internally; self-loops dropped). lcc = 2T / (deg (deg-1)), 0 for
    * degree < 2. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
      .localCheckpoint() // degrees + orientation + wedge + closure all re-read it
    val sym = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // orient by (degree, id): lower endpoint -> higher endpoint
    val oriented = sym
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("a").as("src"), col("b").as("dst"))
    // wedges from each node's oriented out-neighborhood (x < y by id),
    // closed by membership of the undirected {x, y} edge — an EQUI
    // join against the id-ordered pair set, never a theta join
    val w1 = oriented.select(col("src"), col("dst").as("x"))
    val w2 = oriented.select(col("src"), col("dst").as("y"))
    val wedges = w1.join(w2, "src").filter(col("x") < col("y"))
    val triangles = wedges.join(e0,
        col("x") === col("a") && col("y") === col("b"))
      .select(col("src"), col("x"), col("y"))
    val perNodeT = triangles
      .select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(perNodeT, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") < 2, 0.0)
          .otherwise(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("deg") * (col("deg") - lit(1L)))).as("lcc"))
  }

  /** Maintain the per-node triangle report under an EDGE-INSERTION
    * batch — ONE pass, no iteration: every triangle created by the
    * batch contains at least one inserted edge, so the new triangles
    * are exactly { sorted(a, b, w) : (a,b) ∈ fresh, w ∈ N'(a) ∩ N'(b) }
    * deduplicated (a triangle with 2 or 3 fresh edges surfaces once
    * per fresh edge; the sorted-triple `distinct` collapses it to
    * one). Degrees are a linear re-aggregation; the per-node triangle
    * counts are old + increments. The expensive stage of a
    * from-scratch [[perNode]] — the corpus-wide oriented wedge join —
    * never runs: the wedge work here fans out from the DELTA edges'
    * neighborhoods only.
    *
    * `oldCounts` must be [[perNode]]'s output on `oldEdges`; the
    * result equals `perNode(oldEdges ∪ delta)` exactly
    * (TrianglesSpec, planted + randomized). Replay-tolerant like the
    * k-core maintenance: already-present delta edges are anti-joined
    * away, so a redelivered batch is a no-op. */
  def maintainAfterInsert(
      oldCounts: DataFrame,
      oldEdges: DataFrame,
      delta: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
    val e0 = canon(oldEdges).localCheckpoint()
    val fresh = canon(delta).join(e0, Seq("a", "b"), "left_anti").localCheckpoint()
    val all = e0.unionByName(fresh).localCheckpoint()
    val sym = all.union(all.select(col("b").as("a"), col("a").as("b")))
      .toDF("u", "v")
    // common neighbors of each fresh edge's endpoints in the NEW graph
    val triples = fresh
      .join(sym.select(col("u").as("a"), col("v").as("w")), Seq("a"))
      .join(sym.select(col("u").as("b"), col("v").as("w")), Seq("b", "w"))
      .filter(col("w") =!= col("a") && col("w") =!= col("b"))
      .select(array_sort(array(col("a"), col("b"), col("w"))).as("t"))
      .distinct()
    val inc = triples
      .select(explode(col("t")).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("__inc"))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    deg
      .join(oldCounts.select(col("node"), col("triangles").as("__oldT")),
        Seq("node"), "left")
      .join(inc, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        (coalesce(col("__oldT"), lit(0L)) + coalesce(col("__inc"), lit(0L)))
          .as("triangles"))
      .withColumn("lcc",
        when(col("degree") < 2, 0.0)
          .otherwise(lit(2.0) * col("triangles") /
            (col("degree") * (col("degree") - lit(1L)))))
  }
}

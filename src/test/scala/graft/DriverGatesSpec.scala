package graft

/** The [[graft.operators.DriverGates]] contract: every size-gated
  * operator must land IDENTICALLY with the cap forced to 0 (distributed
  * path) and to ∞ (driver fast path) — the gate is an execution-strategy
  * choice, never a semantics choice. One random graph, all seven gated
  * operators, exact row equality. */
class DriverGatesSpec extends SparkSpec {
  import graft.operators.Graph
  import graft.llm.TextDedup

  test("every size-gated operator lands identically with caps 0 and ∞") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    val pairs = (0 until 120).map { _ =>
      val a = rnd.nextInt(40).toLong
      val b = (a + 1 + rnd.nextInt(38)) % 40
      (math.min(a, b), math.max(a, b))
    }.distinct
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val symDf = sym.toDF("src", "dst")
    val wDf = sym.map { case (a, b) => (a, b, (a + b) % 5 + 1) }
      .toDF("src", "dst", "w")
    val seeds = Seq(0L, 1L, 2L).toDF("node")

    def cmp(name: String, f: Long => org.apache.spark.sql.DataFrame): Unit = {
      val drv = f(Long.MaxValue).collect().map(_.toSeq).toSeq
      val dist = f(0L).collect().map(_.toSeq).toSeq
      assert(drv.nonEmpty, s"$name produced nothing")
      assert(drv == dist, s"$name diverged between the gated paths")
    }

    cmp("pageRank",
      cap => Graph.pageRank(symDf, iters = 3, smallGraphCap = cap))
    cmp("weightedPageRank",
      cap => Graph.weightedPageRank(wDf, iters = 3, smallGraphCap = cap))
    cmp("personalizedPageRank", cap =>
      Graph.personalizedPageRank(symDf, seeds, iters = 3, smallGraphCap = cap))
    cmp("hits", cap =>
      Graph.hits(sym.toDF("hub", "auth"), iters = 3, smallGraphCap = cap))
    cmp("triangleCounts", cap =>
      Graph.triangleCounts(pairs.toDF("src", "dst"), smallGraphCap = cap))
    cmp("dedupClusters", cap =>
      TextDedup.dedupClusters(pairs.toDF("doc_a", "doc_b"),
        smallGraphCap = cap))
    cmp("incrTriangles", cap => {
      val (h1, h2) = pairs.splitAt(pairs.size / 2)
      val s1 = Graph.incrTriangles(None, h1.toDF("doc_a", "doc_b"),
        smallGraphCap = cap)
      Graph.incrTrianglesFinalize(Graph.incrTriangles(Some(s1),
        h2.toDF("doc_a", "doc_b"), smallGraphCap = cap))
    })
  }
}

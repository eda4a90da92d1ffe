package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the transitive
  * closure a near-dup drop rule needs (greedy drop-higher-id of each
  * pair under-drops: for edges (a,c),(b,c) with a<b<c it keeps both a
  * and b even though all three are one duplicate cluster).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each
  * round is a groupBy + join on node id, and the edge set converges to
  * a forest of stars rooted at each component's minimum id in
  * O(log² n) rounds (2–3 in practice for LSH dup graphs, whose
  * components are near-cliques). Per-round lineage is truncated with
  * localCheckpoint so iteration cost stays linear.
  */
object GraphOps {

  /** Connected components of the undirected graph given by two id
    * columns. Returns one row per node appearing in any pair:
    * (node, component) where component is the minimum node id in the
    * node's component. */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 30): DataFrame = {
    val init = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val nodes = init.select(col("u").as("node"))
      .union(init.select(col("v").as("node"))).distinct()

    // large-star: every node connects its LARGER neighbors to its
    // minimum neighborhood member (incl itself)
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: every node connects its smaller neighbors (and
    // itself) to its minimum neighbor, operating on larger→smaller
    // directed edges
    def smallStar(e: DataFrame): DataFrame = {
      val d = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val m = d.groupBy("u").agg(min("v").as("m"))
      d.join(m, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(m.select(col("u").as("a"), col("m").as("b")))
        .select(col("a").as("u"), col("b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // cheap order-insensitive digest of the edge set: candidate
    // convergence is fingerprint equality (one narrow aggregate per
    // round instead of two anti-join jobs); only a fingerprint HIT
    // pays for the exact except() confirmation
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)),
        coalesce(sum(hash(col("u"), col("v")).cast("long")), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }

    var edges = init.localCheckpoint()
    var fp = fingerprint(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp &&
        next.except(edges).isEmpty && edges.except(next).isEmpty
      edges = next
      fp = nfp
      i += 1
    }
    // converged edges are (node, root) stars; roots carry themselves.
    // (groupBy-min instead of a bare join so a maxIter bailout still
    // yields one row per node)
    val labels = edges.groupBy(col("u").as("node")).agg(min("v").as("component"))
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}

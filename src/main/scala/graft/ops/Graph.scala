package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed connected components over an edge list, via alternating
  * large-star / small-star rounds (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14 — the same public algorithm behind
  * every web-scale dedup clusterer). The reference has no graph operators
  * (SURVEY.md §2.4); this is the piece that turns near-dup PAIRS into
  * duplicate CLUSTERS, which a curation pipeline needs before it can keep
  * one survivor per group of transitively-connected documents.
  *
  * Scale design: each round is two self-contained shuffle stages (a
  * groupBy-min over node neighborhoods and a re-join), the edge set never
  * grows beyond the input neighborhood size, and convergence is
  * O(log n) rounds — no driver-side graph state, no all-pairs anything.
  * Each round's edge set is [[graft.Tables.materialize]]d: the
  * convergence check needs an action per round anyway, and materializing
  * keeps lineage flat (an unmaterialized loop doubles the plan depth per
  * round and re-executes every prior round at each action).
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`
    * (first two columns = endpoint ids, any orientation, self-loops and
    * duplicates tolerated). Returns (node, label) with label = MIN node
    * id of the component, one row per non-isolated node. Isolated nodes
    * never appear (callers `coalesce` their own id as the label).
    *
    * `tag` keys the per-round materializations (unique per call site).
    * Throws after `maxIter` non-converged rounds rather than returning a
    * partially-contracted (wrong) labeling — the algorithm's bound is
    * O(log n) rounds, so 25 covers any graph that fits in storage. */
  def connectedComponents(edges: DataFrame, tag: String,
      maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val cols = edges.columns
    // canonical (hi, lo) pairs, lo < hi, dedup'd
    var e = Tables.materialize(
      edges.select(
          greatest(col(cols(0)), col(cols(1))).as("hi"),
          least(col(cols(0)), col(cols(1))).as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct(),
      s"cc-$tag-0")
    var prev = checksum(e)
    var it = 0
    var converged = prev._1 == 0L
    while (!converged) {
      it += 1
      if (it > maxIter) throw new IllegalStateException(
        s"connectedComponents($tag) did not converge in $maxIter rounds")
      e = Tables.materialize(smallStar(largeStar(e)), s"cc-$tag-${it % 2}")
      val cur = checksum(e)
      converged = cur == prev
      prev = cur
    }
    // fixpoint = disjoint stars: every edge is (member, component-min)
    e.select(col("hi").as("node"), col("lo").as("label"))
      .unionByName(e.select(col("lo").as("node"), col("lo").as("label")))
      .distinct()
  }

  /** (count, order-independent hash) of the canonical edge set — one cheap
    * action per round; equality with the previous round's pair means the
    * star rounds changed nothing, i.e. fixpoint. */
  private def checksum(e: DataFrame): (Long, Long) = {
    // bit_xor, not sum: order-independent like sum but cannot overflow
    // (ANSI mode makes a long-sum of 2^63-scale hashes throw)
    val r = e.agg(count(lit(1)),
      expr("bit_xor(xxhash64(hi, lo))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Large-star: every node u connects each STRICTLY LARGER neighbor to
    * the minimum of its closed neighborhood. Needs symmetric
    * neighborhoods, so the canonical pairs are viewed in both
    * orientations; emitted pairs (v, m) always satisfy m <= u < v, so the
    * output is canonical by construction. */
  private[ops] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("hi").as("u"), col("lo").as("v"))
      .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("hi"), least(col("mn"), col("u")).as("lo"))
      .distinct()
  }

  /** Small-star: every node u connects its smaller neighbors (and itself)
    * to the minimum of those neighbors. Operates directly on the
    * canonical large-to-small orientation; emitted pairs keep lo < hi. */
  private[ops] def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("hi").agg(min(col("lo")).as("mn"))
    val relink = e.join(mins, "hi")
      .filter(col("lo") =!= col("mn"))
      .select(col("lo").as("hi"), col("mn").as("lo"))
    relink
      .unionByName(mins.select(col("hi"), col("mn").as("lo")))
      .distinct()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over near-duplicate candidate pairs → dedup clusters
 * with a canonical survivor per cluster (the step after MinHash/SimHash
 * candidate generation in a training-data dedup pipeline).
 *
 * Algorithm: alternating LARGE-STAR / SMALL-STAR edge rewriting (the
 * MapReduce connected-components construction of Kiveris et al., "Connected
 * Components in MapReduce and Beyond", SoCC'14):
 *
 *  - large-star: every node connects its LARGER neighbors to the minimum of
 *    its neighborhood (incl. itself),
 *  - small-star: every node connects its smaller-or-equal neighbors (and
 *    itself) to that minimum.
 *
 * Each round is a constant number of shuffles and the component diameter
 * roughly HALVES per round, so a length-d chain converges in O(log d)
 * rounds — unlike plain neighbor-min label propagation, whose round count
 * is O(d) (a 10k-long near-dup chain would need 10k shuffles). At fixpoint
 * the edge set is a forest of stars rooted at each component's minimum id.
 *
 * Scale hygiene: every round `localCheckpoint`s the new edge set, so plan
 * lineage stays O(1) across iterations instead of growing per round, and
 * convergence is detected from a two-scalar signature (count + sum of
 * xxhash64(a,b)) rather than a driver-side set comparison; a signature
 * match is then CONFIRMED exactly by one distributed anti-join, so a
 * hash-sum collision can never end the loop before the true fixpoint.
 */
object DedupClusters {

  /** one large-star + small-star rewrite */
  private def rewriteRound(e: DataFrame): DataFrame = {
    // large-star over the symmetric adjacency: m(u) = min(Γ(u) ∪ {u});
    // emit (v, m(u)) for v ∈ Γ(u), v > u
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val mLarge = sym.groupBy("a")
      .agg(least(min("b"), first("a")).as("m"))
    val large = sym.join(mLarge, "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .distinct()
    // small-star over down-pointing edges: emit (v, m(u)) for v ≤ u plus
    // (u, m(u)) — with edges oriented (hi → lo), Γ(u) is all-smaller
    val dir = large.select(greatest(col("a"), col("b")).as("a"),
      least(col("a"), col("b")).as("b"))
    val mSmall = dir.groupBy("a").agg(min("b").as("m"))
    dir.join(mSmall, "a")
      .select(col("b").as("a"), col("m").as("b"))
      .union(mSmall.select(col("a"), col("m").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** (count, hash-sum) signature — equal signatures ⇒ edge set unchanged.
    * Terms are reduced mod a large prime so the sum stays inside a long
    * under ANSI overflow checking (~9e9 edges of headroom). */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      sum(pmod(xxhash64(col("a"), col("b")), lit(1000000007L)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** @param pairs DataFrame with two long columns (a, b), a != b
    * @return ((id, cluster), rounds) — cluster = min doc id reachable;
    *         singletons absent from `pairs` are not emitted */
  def connectedComponentsWithStats(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", maxIter: Int = 50): (DataFrame, Int) = {
    val raw = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val nodes = raw.select(col("a").as("id"))
      .union(raw.select(col("b").as("id")))
      .distinct()
    var edges = raw.distinct().localCheckpoint()
    var sig = signature(edges)
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = rewriteRound(edges).localCheckpoint() // truncate lineage
      val nextSig = signature(next)
      // signature equality is a candidate fixpoint, not proof — a (count,
      // hash-sum) collision between DIFFERENT edge sets could otherwise end
      // the loop early and mislabel. Confirm EXACTLY with one anti-join:
      // counts match, so next ⊆ edges ⇒ next == edges. Runs once per
      // apparent convergence (normally once per call), never per round.
      converged = nextSig == sig &&
        (next.join(edges, Seq("a", "b"), "left_anti").isEmpty)
      sig = nextSig
      edges = next
      iter += 1
    }
    // At fixpoint edges are (member → root) stars; roots label themselves.
    // The min-aggregate keeps the one-row-per-id invariant even if the loop
    // exited at maxIter before fixpoint (signature collisions can no longer
    // cause an early exit — convergence is exactness-confirmed): a node
    // with several residual out-edges still labels once, to its minimum
    // reachable — never two conflicting rows.
    val labels = nodes
      .join(edges.select(col("a").as("id"), col("b").as("cluster")),
        Seq("id"), "left")
      .groupBy("id")
      .agg(min(coalesce(col("cluster"), col("id"))).as("cluster"))
    (labels, iter)
  }

  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b",
                          maxIter: Int = 50): DataFrame =
    connectedComponentsWithStats(pairs, aCol, bCol, maxIter)._1

  /** cluster candidates and pick the survivor (min id) per cluster:
    * returns (id, cluster, survivor Boolean). */
  def withSurvivors(pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    cc.withColumn("survivor", col("id") === col("cluster"))
  }
}

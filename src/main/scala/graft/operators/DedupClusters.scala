package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over near-duplicate candidate pairs → dedup clusters
 * with a canonical survivor per cluster (the step after MinHash/SimHash
 * candidate generation in a training-data dedup pipeline).
 *
 * Algorithm: large-star/small-star-style min-label propagation — each node
 * repeatedly adopts the minimum label in its neighborhood until fixpoint.
 * Each iteration is one shuffle (groupBy node) and converges in
 * O(log(diameter)) rounds for the short chains near-dup graphs produce;
 * the driver only checks a single converged count per round (no row
 * collection).
 */
object DedupClusters {

  /** @param pairs DataFrame with two long columns (a, b), a != b
    * @return (id, cluster) — cluster = min doc id reachable; singletons
    *         absent from `pairs` are not emitted (their cluster = self) */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b",
                          maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .persist()
    // undirected adjacency
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label per node: min over its own and neighbors' labels
      val viaNeighbors = sym
        .join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("cluster"))
      val next = labels.select(col("id"), col("cluster"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .persist()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.cluster") =!= col("o.cluster"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** cluster candidates and pick the survivor (min id) per cluster:
    * returns (id, cluster, survivor Boolean). */
  def withSurvivors(pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    cc.withColumn("survivor", col("id") === col("cluster"))
  }
}

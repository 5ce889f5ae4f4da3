package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-document entity canonicalization (SURVEY §2.3 J10 — the north rule's
  * connected-components generalization of the reference's content-hash node
  * identity, enhanced_hypergraph_builder_agent_v2.py:1300-1303 /
  * graph_extraction_agent.py:510-519).
  *
  * Implementation: iterative DataFrame hash-min label propagation — a driver
  * loop of join+groupBy/min steps with `localCheckpoint()` per iteration to
  * truncate lineage. No GraphX: plain Catalyst plans keep AQE (incl. skew-join
  * splitting) in charge of the physical layout, which matters because hub
  * entities ("Intel" in a third of pages) make the edge list heavily skewed.
  *
  * Skew handling (SURVEY §4.1): the per-key min-aggregation is two-phase
  * salted — an explicit salt column gives S-way parallel partial mins before
  * the final per-key min, bounding any single reducer even when one component
  * key covers a large fraction of all edges. (Spark's hash aggregate already
  * performs map-side partial aggregation; the explicit salt additionally
  * protects the exchange when a single key dominates entire partitions.)
  */
object Canonicalize {

  /** Connected components over an undirected edge list.
    *
    * @param edges DataFrame with two string columns (src, dst)
    * @return DataFrame (id, component) — component = min id in the component
    */
  def connectedComponents(
      spark: SparkSession,
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 50,
      salt: Int = 8): DataFrame = {
    import spark.implicits._

    // Undirected: symmetrize once; self-loops dropped.
    val e = edges
      .select(col(srcCol).cast("string").as("a"), col(dstCol).cast("string").as("b"))
      .where($"a" =!= $"b")
    val sym = e.union(e.select($"b".as("a"), $"a".as("b"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val vertices = sym.select($"a".as("id")).distinct()

    // localCheckpoint persists its RDD in the block manager and Dataset has
    // no handle to unpersist it; track the ids each checkpoint adds so the
    // superseded snapshot can be freed — otherwise the loop retains
    // O(iterations) cached label tables (real memory at 10⁹ entities).
    val sc = spark.sparkContext
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    var (labels, labelRddIds) = checkpointTracked(vertices.withColumn("comp", $"id"))

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate labels: own label ∪ each neighbor's label
      val neighborLabels = sym
        .join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .select($"b".as("id"), $"comp")
      val candidates = labels.select($"id", $"comp").union(neighborLabels)

      // two-phase salted min: (id, salt) partial min → id min
      val partial = candidates
        .withColumn("s", pmod(xxhash64($"comp"), lit(salt)))
        .groupBy($"id", $"s").agg(min($"comp").as("comp"))
      val (newLabels, newIds) = checkpointTracked(partial.groupBy($"id").agg(min($"comp").as("comp")))

      val changed = newLabels.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .where(col("n.comp") =!= col("o.comp"))
        .limit(1).count()
      converged = changed == 0
      // the convergence check above was the last reader of the previous
      // snapshot — free it; at most 2 label snapshots are ever live
      free(labelRddIds)
      labels = newLabels
      labelRddIds = newIds
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("id", "id").withColumnRenamed("comp", "component")
  }

  /** Canonicalize node keys: same-content merge (exact, the reference's
    * md5(lower(content)) identity) extended with an alias dictionary
    * (alias → canonical) — the edges of the equivalence graph are
    * (key, aliasTarget) pairs; connected components assign one canonical id
    * per cluster. Alias dict is broadcast (small dimension, J5 pattern).
    *
    * @param nodeKeys DataFrame with column `key` (e.g. lower(content))
    * @param aliases  DataFrame (alias, canonical) — may be empty
    * @return DataFrame (key, canonical_key)
    */
  def canonicalKeys(spark: SparkSession, nodeKeys: DataFrame, aliases: DataFrame): DataFrame = {
    import spark.implicits._
    val keys = nodeKeys.select(lower($"key").as("key")).distinct()
    val edgePairs = aliases
      .select(lower($"alias").as("src"), lower($"canonical").as("dst"))
      .where($"src" =!= $"dst")
    if (edgePairs.isEmpty) return keys.select($"key", $"key".as("canonical_key"))

    val comps = connectedComponents(spark, edgePairs)
    keys.join(broadcastIfSmall(comps), keys("key") === comps("id"), "left")
      .select($"key", coalesce($"component", $"key").as("canonical_key"))
  }

  private def broadcastIfSmall(df: DataFrame): DataFrame = df // let AQE decide; hook for hints
}

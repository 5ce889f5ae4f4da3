package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table I/O seam (SURVEY §7.0): the engine targets Iceberg-style
  * catalog-managed tables, but no Iceberg runtime jar exists in this
  * environment — so the default implementation is partitioned Parquet under
  * a warehouse directory, and a real Iceberg catalog is a config swap
  * (`spark.sql.catalog.* = org.apache.iceberg.spark.SparkCatalog`) plus an
  * `IcebergTableIO` that appends via `writeTo(table).append()`.
  * All pipeline writes/reads go through this trait; nothing else in the
  * engine knows the storage format.
  */
trait TableIO {
  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit
  def read(spark: SparkSession, table: String): DataFrame
  def exists(table: String): Boolean

  /** Atomic run-commit protocol (resume safety): every pipeline row carries
    * a run_id; a run becomes VISIBLE only once its commit marker exists —
    * one atomic file-create after all appends (with Iceberg this collapses
    * into the snapshot commit). A crash mid-run leaves orphan rows with an
    * uncommitted run_id that every reader filters out, so resume can safely
    * reprocess those urls without duplicating data.
    */
  def commit(runId: String): Unit
  def committedRuns(): Set[String]

  /** Read a table with uncommitted (crashed-run) rows filtered out. */
  def readCommitted(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, table).where(col("run_id").isin(committedRuns().toSeq: _*))
  }
}

/** Parquet-under-warehouse implementation (the environment default). */
final class ParquetTableIO(warehouse: String) extends TableIO {
  private def path(table: String) = s"$warehouse/$table"

  override def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(table))
  }

  // mergeSchema: table schemas have grown across versions (round 4 added
  // temporal_index/temporal_category to nodes/edges), and resume=true into a
  // directory written by an older binary leaves mixed-schema files — plain
  // parquet reads sample ONE footer, so the new columns could silently
  // vanish (or appear) depending on which file wins. Merging footers pins
  // the union schema; older files surface the new columns as null. At
  // catalog scale Iceberg's own schema evolution replaces this option.
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path(table))

  override def exists(table: String): Boolean =
    new java.io.File(path(table)).exists()

  override def commit(runId: String): Unit = {
    // the marker NAME is the run_id readers filter on, so it must be a safe
    // path component as-is (silently sanitizing would break the marker ↔
    // run_id correspondence) — reject escaping ids instead
    require(runId == Redact.sanitizeKeyComponent(runId),
      s"runId '$runId' is not a safe path component — use [a-zA-Z0-9-_.], <=50 chars")
    val dir = java.nio.file.Paths.get(warehouse, "_commits")
    java.nio.file.Files.createDirectories(dir)
    // CREATE_NEW: committing the same runId twice would retroactively expose
    // a crashed attempt's orphan rows next to the retry's rows (duplicates);
    // each attempt must commit exactly once under a fresh id
    java.nio.file.Files.write(dir.resolve(runId),
      java.lang.Long.toString(System.currentTimeMillis()).getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
  }

  override def committedRuns(): Set[String] = {
    val dir = new java.io.File(s"$warehouse/_commits")
    if (!dir.exists()) Set.empty
    else dir.listFiles().map(_.getName).toSet
  }
}

/** Exports (SURVEY §2.1 S11 — neptune_customer_graph_reader.py:376-440):
  * per-customer nodes/edges as CSV or JSON plus a driver-side text summary.
  * Export hygiene (F12/F13): string columns are PII-redacted and the
  * customer-id path component sanitized, mirroring the reference's
  * boundary sanitization (graph_extraction_agent.py:245-285, 705-712).
  */
object Exports {
  def exportCustomer(nodes: DataFrame, edges: DataFrame, customerId: String,
                     outDir: String, format: String = "json",
                     redactPii: Boolean = true): Unit = {
    import org.apache.spark.sql.functions._
    def prep(df: DataFrame) = {
      val f = df.where(col("customer_id") === customerId)
      if (redactPii) Redact.redactFrame(f) else f
    }
    val n = prep(nodes)
    val e = prep(edges)
    val dir = s"$outDir/${Redact.sanitizeKeyComponent(customerId)}"
    format match {
      case "csv" =>
        // CSV cannot carry arrays — stringify evidence like the reference's
        // pandas to_csv did
        n.write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/nodes_csv")
        e.withColumn("evidence", concat_ws("|", col("evidence")))
          .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/edges_csv")
      case _ =>
        n.write.mode(SaveMode.Overwrite).json(s"$dir/nodes_json")
        e.write.mode(SaveMode.Overwrite).json(s"$dir/edges_json")
    }
  }

  /** Small text summary collected to the driver (type histograms). */
  def summary(nodes: DataFrame, edges: DataFrame, customerId: String): String = {
    import org.apache.spark.sql.functions._
    val nh = nodes.where(col("customer_id") === customerId)
      .groupBy("node_type").count().orderBy(desc("count"), asc("node_type")).collect()
    val eh = edges.where(col("customer_id") === customerId)
      .groupBy("relationship_type").count().orderBy(desc("count"), asc("relationship_type")).collect()
    val sb = new StringBuilder(s"customer: $customerId\nnodes:\n")
    nh.foreach(r => sb.append(s"  ${r.get(0)}: ${r.get(1)}\n"))
    sb.append("edges:\n")
    eh.foreach(r => sb.append(s"  ${r.get(0)}: ${r.get(1)}\n"))
    sb.toString
  }
}

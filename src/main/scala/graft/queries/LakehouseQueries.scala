package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.SnapshotOps

/** Lakehouse table-layout family: versioned manifests, time-travel
  * reads — the storage seam between curation runs and reproducible
  * training sets.
  */
object LakehouseQueries extends QueryPack {

  /** Deterministic per-source-fingerprint table dir (the
    * src_csv_roundtrip caching idiom): rebuilt only when the input
    * parquet changes, so repeated Verify/Bench runs reuse the layout.
    */
  private def snapshotTable(s: SparkSession, dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val srcFiles: Seq[java.io.File] =
      if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName)
      else Seq(src)
    val fpInput = srcFiles.map(f =>
      s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_))
      .mkString
    val path = s"/tmp/graft_snaptbl_$fp"
    val done = new java.io.File(path, "_LAYOUT_DONE")
    if (!done.exists()) {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      // v1 units: the %3∈{0,1} corpus in four id-bucket units
      (0 to 3).foreach { b =>
        docs.filter(col("doc_id") % 3 =!= 2 && col("doc_id") % 4 === b)
          .write.mode("overwrite").parquet(s"$path/data/b$b")
      }
      // the append unit (late-arriving re-crawl)
      docs.filter(col("doc_id") % 3 === 2)
        .write.mode("overwrite").parquet(s"$path/data/b4")
      SnapshotOps.commitManifest(path, 1,
        Seq("data/b0", "data/b1", "data/b2", "data/b3"))
      // v2 = v1 + append(b4) − remove(b1): additions and a retirement
      // in one commit
      SnapshotOps.commitManifest(path, 2,
        Seq("data/b0", "data/b2", "data/b3", "data/b4"))
      done.createNewFile()
    }
    path
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TIME-TRAVEL READ (SnapshotOps.readVersion): table@1 and table@2
    // resolved from immutable version manifests — never a directory
    // listing, so the b4 append and the b1 retirement are invisible to
    // v1 and both visible to v2, and re-reading v1 AFTER v2 committed
    // returns the identical corpus (the reproducible-training-set
    // contract). Emits per-version membership aggregates the oracle
    // replays from the bucket rules; SnapshotOpsSpec machine-asserts
    // the scan's file list is exactly the manifest's units.
    "src_snapshot_read" -> ((s, dir) => {
      val path = snapshotTable(s, dir)
      def agg(v: Int): DataFrame =
        SnapshotOps.readVersion(s, path, v)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("sum_ids"),
            sum(col("n_chars")).as("sum_chars"))
          .select(lit(v.toLong).as("version"), col("n_docs"),
            col("sum_ids"), col("sum_chars"))
      agg(1).unionAll(agg(2)).orderBy(col("version"))
    }))

  override def oracle: Map[String, String] = Map(

    // v1 = %3∈{0,1}; v2 drops the %4=1 bucket of v1 and gains the
    // %3=2 append — membership replayed straight from the rules
    "src_snapshot_read" ->
      """SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 <> 2
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents
        |WHERE (doc_id % 3 <> 2 AND doc_id % 4 <> 1) OR doc_id % 3 = 2
        |ORDER BY version""".stripMargin)
}

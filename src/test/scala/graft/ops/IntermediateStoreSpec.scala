package graft.ops

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The optional parquet-checkpoint path for corpus-sized dedup
  * intermediates (DedupOps.materialize behind IntermediateDirKey): at
  * 100 TB the MEMORY_AND_DISK persist is a single-box assumption, so a
  * configured dir must swap it for a write-then-scan table — with
  * bit-identical operator output.
  */
class IntermediateStoreSpec extends SparkSuite {

  private lazy val docs = {
    import spark.implicits._
    ((0 until 12).map(i => (i.toLong, "shared boilerplate text body here")) ++
      (0 until 12).map(i => (100L + i,
        s"doc$i words p$i q$i r$i s$i t$i u$i v$i w$i x$i y$i")))
      .toDF("doc_id", "text")
  }

  private def withDir[A](f: String => A): A = {
    val dir = Files.createTempDirectory("graft-intermediate").toString
    spark.conf.set(DedupOps.IntermediateDirKey, dir)
    try f(dir)
    finally spark.conf.unset(DedupOps.IntermediateDirKey)
  }

  test("checkpoint dir set: band table lands as parquet, pairs unchanged") {
    val defaultPairs = DedupOps.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withDir { dir =>
      val pairs = DedupOps.minhashCandidates(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == defaultPairs)
      val written = new java.io.File(dir).listFiles()
      assert(written.exists(_.getName.startsWith("minhash-bands-")),
        s"expected a minhash-bands checkpoint under $dir, found " +
          written.map(_.getName).mkString(", "))
    }
  }

  test("checkpoint dir set: jaccard + substring runs unchanged vs persist path") {
    val jDefault = DedupOps.ngramJaccardPairs(docs, "doc_id", "text")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6))
      .collect().map(_.toSeq).toSet
    val sDefault = DedupOps.substringRuns(docs, "doc_id", "text",
        shingleN = 3, minRunTokens = 3)
      .collect().map(_.toSeq).toSet
    withDir { dir =>
      val j = DedupOps.ngramJaccardPairs(docs, "doc_id", "text")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6))
        .collect().map(_.toSeq).toSet
      val s = DedupOps.substringRuns(docs, "doc_id", "text",
          shingleN = 3, minRunTokens = 3)
        .collect().map(_.toSeq).toSet
      assert(j == jDefault)
      assert(s == sDefault)
      val names = new java.io.File(dir).listFiles().map(_.getName)
      assert(names.exists(_.startsWith("jaccard-shingles-")))
      assert(names.exists(_.startsWith("substr-shingles-")))
    }
  }
}

package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** applyChangelog edges the oracle construction doesn't reach: seq
  * ties (lexicographic struct max — deterministic on any engine),
  * delete-only ids, and log-only inserts on an empty base.
  */
class SnapshotOpsSpec extends SparkSuite {
  import spark.implicits._

  private val baseCols = Seq("id", "v")

  test("seq tie resolves by lexicographic payload max, deterministically") {
    val base = Seq((1L, "old")).toDF(baseCols: _*)
    // two upserts with the SAME seq — (seq, op, v) max picks v="zz"
    val log = Seq(
      (1L, 5L, "upsert", "aa"),
      (1L, 5L, "upsert", "zz")).toDF("id", "seq", "op", "v")
    val out = SnapshotOps.applyChangelog(base, log, "id", "seq", "op")
      .collect()
    assert(out.length == 1 && out(0).getString(1) == "zz")
  }

  test("delete beats earlier upsert; later upsert beats delete") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF(baseCols: _*)
    val log = Seq(
      (1L, 1L, "upsert", "a2"), (1L, 2L, "delete", "a2"), // net delete
      (2L, 1L, "delete", "b"), (2L, 2L, "upsert", "b2"),  // net upsert
      (9L, 1L, "upsert", "new")).toDF("id", "seq", "op", "v")
    val out = SnapshotOps.applyChangelog(base, log, "id", "seq", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((2L, "b2"), (3L, "c"), (9L, "new")))
  }

  test("unknown op fails loudly instead of silently tombstoning the id") {
    val base = Seq((1L, "a")).toDF(baseCols: _*)
    val log = Seq((1L, 1L, "Upsert", "a2")).toDF("id", "seq", "op", "v")
    val e = intercept[Exception] {
      SnapshotOps.applyChangelog(base, log, "id", "seq", "op").collect()
    }
    assert(e.getMessage.contains("unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op")))
  }
}

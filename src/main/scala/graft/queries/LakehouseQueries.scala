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
    }),

    // SCD TYPE-2 HISTORY (SnapshotOps.scd2History): the
    // history-preserving fold of a CDC changelog — every state an id
    // ever had, with its validity interval. Fixture: updates at seq 1
    // (ids %4=1), deletes at seq 1 (%4=2), two-step updates (%4=3),
    // and delete-after-update (%8=5), so intervals open, close, chain,
    // and terminate. One keyed window — no global sort; the oracle
    // replays the same lead() fold.
    "src_scd2_history" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      val base = d.select(col("doc_id"), md5(col("text")).as("fp"),
        col("lang"))
      def lg(cond: org.apache.spark.sql.Column, seq: Long, op: String,
             salt: String): DataFrame =
        d.where(cond).select(col("doc_id"), lit(seq).as("seq"),
          lit(op).as("op"),
          md5(concat(col("text"), lit(salt))).as("fp"), col("lang"))
      val log = lg(col("doc_id") % 4 === 1, 1L, "upsert", ":v1")
        .unionByName(lg(col("doc_id") % 4 === 2, 1L, "delete", ""))
        .unionByName(lg(col("doc_id") % 4 === 3, 1L, "upsert", ":v1"))
        .unionByName(lg(col("doc_id") % 4 === 3, 2L, "upsert", ":v2"))
        .unionByName(lg(col("doc_id") % 8 === 5, 2L, "delete", ""))
      SnapshotOps.scd2History(base, log, "doc_id", "seq", "op")
        .orderBy(col("doc_id"), col("valid_from"))
    }),


    // PARTITION-PRUNED scan: the documents table written PARTITIONED BY
    // its language column (once per session — the pay-at-write posture,
    // like the bucketed join), then queried with a partition filter: at
    // 100 TB this is the difference between scanning one language's
    // directories and scanning the corpus. PartitionPruneSpec asserts
    // the physical scan carries the PartitionFilter and reads only the
    // matching directories; the oracle is the plain filtered aggregate —
    // the layout must not change a single row.
    "src_partition_prune" -> ((s, dir) => {
      // Cache key is a CONTENT fingerprint of the source files (name,
      // size, mtime), not just the dir string, and the cached copy is
      // only trusted behind its _SUCCESS marker — a regenerated testdata
      // dir or a crashed partial write can never serve stale rows
      // (r9 ADVICE / the r6 regenerated-testdata failure shape).
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_bylang_$fp"
      val f = new java.io.File(path)
      if (!new java.io.File(f, "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .write.mode("overwrite").partitionBy("lang").parquet(path)
      }
      s.read.parquet(path)
        .filter(col("lang") === "en" || col("lang") === "de")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),


    // Small-file COMPACTION PLAN (the lakehouse OPTIMIZE bin-packer):
    // per TABLE PARTITION (compaction never merges across partitions),
    // the streaming first-fit fold — files in arrival order, bin =
    // floor(cumulative-bytes-before / target) — assigns every file to
    // a target-sized output without driver state. The window runs over
    // FILE METADATA (one row per file), partitioned by the table
    // partition key, so the plan distributes like any keyed window and
    // never sees data bytes. Derived inventory: partition = lang,
    // size = n_chars, arrival = doc_id.
    "src_compaction_plan" -> ((s, dir) => {
      val target = 4096L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars").as("bytes"))
        .withColumn("__cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("bin", expr(s"__cum div ${target}L"))
        .drop("__cum")
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
          min(col("doc_id")).as("first_file"),
          max(col("doc_id")).as("last_file"))
        .orderBy(col("lang"), col("bin"))
    }),


    // CSV dialect sniffing (ops.CsvSniff — the csv.Sniffer/read_csv
    // inference): per doc a 4-line CSV built with a doc_id-chosen
    // delimiter (comma/semicolon/tab/pipe), every 11th doc raw prose
    // that must sniff to NULL, not a guess. Oracle states the dialect
    // as the construction closed form.
    "src_csv_sniff" -> ((s, dir) => {
      val did = col("doc_id") % 4
      val d = when(did === 0, ",").when(did === 1, ";")
        .when(did === 2, "\t").otherwise("|")
      val ws = split(trim(col("text")), "\\s+")
      def f(k: Int) = coalesce(try_element_at(ws, lit(k)), lit("x"))
      val rows = (0 until 4).map(j =>
        concat(f(3 * j + 1), d, f(3 * j + 2), d, f(3 * j + 3)))
      val file = when(col("doc_id") % 11 === 0, col("text"))
        .otherwise(array_join(array(rows: _*), "\n"))
      // materialize the constructed file BEHIND a projection boundary:
      // the sniffer references its input ~16 times (4 candidates ×
      // counts/head/forall) and codegen re-evaluates the whole
      // construction tree per reference otherwise (measured 75 s → sub-
      // second at sf0.1)
      Tables.documents(s, dir)
        .select(col("doc_id"), file.as("file"))
        .localCheckpoint(true)
        .withColumn("sn", graft.ops.CsvSniff.sniff(col("file")))
        .select(col("doc_id"), col("sn.delimiter").as("delimiter"),
          col("sn.n_fields").as("n_fields"))
        .orderBy(col("doc_id"))
    }),


    // BINARY-column parquet sink + scan round trip — the multimodal
    // lakehouse posture: media blobs (here the deterministic docx of
    // each document, real non-UTF-8 deflate bytes inside) written as a
    // parquet BINARY column next to typed metadata and re-read with
    // bit-exact fingerprints. Certified like the ORC/CSV trips: the
    // re-read blob must hash identically to the oracle's closed-form
    // expectation — the oracle fingerprints the TEXT the blob round-
    // trips back to (docx_text ∘ scan == clean), never parquet bytes.
    "src_binary_roundtrip" -> ((s, dir) => {
      graft.functions.ZipDocx.register(s)
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_bin_$fp"
      if (!new java.io.File(new java.io.File(path), "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            call_function("docx_doc",
              regexp_replace(col("text"), "[^ -~]", " ").cast("binary"))
              .as("blob"))
          .write.mode("overwrite").parquet(path)
      }
      s.read.parquet(path)
        .select(col("doc_id"), col("lang"),
          md5(call_function("docx_text", col("blob")).cast("binary"))
            .as("text_md5"))
        .orderBy(col("doc_id"))
    }),


    // ORC sink + scan round trip (source-format breadth next to
    // parquet/CSV): the documents table written as zlib ORC and read
    // back must reproduce every row bit-exactly — certified by emitting
    // per-row md5 fingerprints FROM THE ORC SCAN while the oracle
    // computes the same fingerprints from the parquet source. Same
    // fingerprint-keyed, _SUCCESS-gated cache discipline as
    // src_partition_prune (the r6/r9 stale-cache lessons).
    "src_orc_roundtrip" -> ((s, dir) => {
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_orc_$fp"
      val f = new java.io.File(path)
      if (!new java.io.File(f, "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .write.mode("overwrite").option("compression", "zlib").orc(path)
      }
      s.read.orc(path)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),


    // AVRO round trip (functions.AvroOcf — a from-spec Object
    // Container File reader/writer pair, since no spark-avro module
    // ships here; the independent Java avro library cross-validates
    // both directions in AvroOcfSpec): every doc becomes an OCF —
    // even docs carry TWO records (multi-record block), every third
    // doc deflate-compressed — then the records are read back by the
    // engine's own parser. The oracle replays the record construction
    // closed-form, never touching container bytes, so varint framing,
    // codec handling, schema validation, and sync checking all sit
    // under the hash.
    "src_avro_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType), StructField("text", StringType)))
      graft.functions.AvroOcf.register(s, docSchema)
      val rec1 = struct(col("doc_id"), col("lang"), col("n_chars"),
        col("text"))
      val rec2 = struct((col("doc_id") + 1000000L).as("doc_id"),
        upper(col("lang")).as("lang"), (col("n_chars") * 2).as("n_chars"),
        concat(lit("copy:"), col("text")).as("text"))
      val arr = when(col("doc_id") % 2 === 0, array(rec1, rec2))
        .otherwise(array(rec1))
      val codec = when(col("doc_id") % 3 === 0, lit("deflate"))
        .otherwise(lit("null"))
      Tables.documents(s, dir)
        .withColumn("__blob", call_function("avro_file", arr, codec))
        .select(col("doc_id").as("src_doc"),
          posexplode(call_function("avro_rows", col("__blob")))
            .as(Seq("rec_idx", "r")))
        .select(col("src_doc"), col("rec_idx").cast("long").as("rec_idx"),
          col("r.doc_id").as("rec_id"), col("r.lang").as("lang"),
          col("r.n_chars").as("n_chars"),
          md5(col("r.text").cast("binary")).as("text_md5"))
        .orderBy(col("src_doc"), col("rec_idx"))
    }),


    // CSV sink + scan round trip: the hard part of CSV is QUOTING —
    // embedded newlines, quotes, and delimiters must survive
    // write+read (multiLine scan, doubled-quote escaping). Certified
    // the same way as ORC: per-row fingerprints from the CSV scan vs
    // the oracle's fingerprints from the parquet source. FAILFAST mode:
    // a malformed row aborts rather than silently dropping.
    "src_csv_roundtrip" -> ((s, dir) => {
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_csv_$fp"
      if (!new java.io.File(new java.io.File(path), "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
          .write.mode("overwrite")
          .option("header", "true").option("quoteAll", "true")
          .option("escape", "\"")
          .csv(path)
      }
      s.read
        .schema("doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING")
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"").option("mode", "FAILFAST")
        .csv(path)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),


    // JSON-lines round trip (the interchange format most crawl/corpus
    // tooling actually speaks): unicode escapes, embedded quotes and
    // newlines ride JSON string escaping; FAILFAST scan with an explicit
    // schema. Same fingerprint certification.
    "src_jsonl_roundtrip" -> ((s, dir) => {
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_jsonl_$fp"
      if (!new java.io.File(new java.io.File(path), "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
          .write.mode("overwrite").json(path)
      }
      s.read
        .schema("doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING")
        .option("mode", "FAILFAST")
        .json(path)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
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
        |ORDER BY version""".stripMargin,

    // the same union-of-events + keyed lead() fold, replayed in SQL
    "src_scd2_history" ->
      """WITH ev AS (
        |  SELECT doc_id, 0 AS seq, 'upsert' AS op, md5(text) AS fp, lang
        |    FROM documents
        |  UNION ALL SELECT doc_id, 1, 'upsert', md5(text || ':v1'), lang
        |    FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL SELECT doc_id, 1, 'delete', md5(text), lang
        |    FROM documents WHERE doc_id % 4 = 2
        |  UNION ALL SELECT doc_id, 1, 'upsert', md5(text || ':v1'), lang
        |    FROM documents WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 2, 'upsert', md5(text || ':v2'), lang
        |    FROM documents WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 2, 'delete', md5(text), lang
        |    FROM documents WHERE doc_id % 8 = 5),
        |h AS (SELECT doc_id, fp, lang, seq, op,
        |    lead(seq) OVER (PARTITION BY doc_id ORDER BY seq, op)
        |      AS valid_to
        |  FROM ev)
        |SELECT doc_id, fp, lang, CAST(seq AS BIGINT) AS valid_from,
        |  CAST(valid_to AS BIGINT) AS valid_to,
        |  valid_to IS NULL AS is_current
        |FROM h WHERE op = 'upsert'
        |ORDER BY doc_id, valid_from""".stripMargin,


    // the partitioned layout must not change a row: plain filtered agg
    "src_partition_prune" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY lang ORDER BY lang""".stripMargin,


    // dialect as the construction closed form; prose docs must be NULL
    "src_csv_sniff" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN NULL
        |       WHEN doc_id % 4 = 0 THEN ','
        |       WHEN doc_id % 4 = 1 THEN ';'
        |       WHEN doc_id % 4 = 2 THEN chr(9)
        |       ELSE '|' END AS delimiter,
        |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL ELSE 3 END AS BIGINT)
        |    AS n_fields
        |FROM documents ORDER BY doc_id""".stripMargin,


    // replay of the per-partition streaming first-fit fold
    "src_compaction_plan" ->
      """WITH f AS (SELECT lang, doc_id, n_chars AS bytes,
        |    coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM documents)
        |SELECT lang, CAST(cum // 4096 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |  min(doc_id) AS first_file, max(doc_id) AS last_file
        |FROM f GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,


    // the oracle fingerprints the clean text the stored blob must
    // round-trip back to — it never touches parquet or zip bytes
    "src_binary_roundtrip" ->
      """SELECT doc_id, lang,
        |  md5(regexp_replace(text, '[^ -~]', ' ', 'g')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,


    // the same rows fingerprinted straight from the parquet source: the
    // ORC write+read must not change a byte
    "src_orc_roundtrip" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // record construction replayed closed-form; the container bytes
    // (varints, codecs, sync markers) live entirely under the hash
    "src_avro_roundtrip" ->
      """WITH av1 AS (SELECT doc_id AS src_doc, CAST(0 AS BIGINT) AS rec_idx,
        |    doc_id AS rec_id, lang, n_chars, md5(text) AS text_md5
        |  FROM documents),
        |av2 AS (SELECT doc_id AS src_doc, CAST(1 AS BIGINT) AS rec_idx,
        |    doc_id + 1000000 AS rec_id, upper(lang) AS lang,
        |    n_chars * 2 AS n_chars, md5('copy:' || text) AS text_md5
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT src_doc, rec_idx, rec_id, lang, CAST(n_chars AS BIGINT)
        |    AS n_chars, text_md5
        |FROM (SELECT * FROM av1 UNION ALL SELECT * FROM av2)
        |ORDER BY src_doc, rec_idx""".stripMargin,

    "src_csv_roundtrip" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "src_jsonl_roundtrip" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin)
}

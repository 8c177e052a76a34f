package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AvroOcf

/** Apache Iceberg TABLE-METADATA chain — the other half of real
  * lakehouse drops beside the Delta `_delta_log`
  * ([[SnapshotOps.deltaFiles]]): `metadata/vN.metadata.json` (schemas,
  * snapshots, manifest-list pointer per the public Iceberg table spec)
  * → manifest-list Avro (one row per manifest) → manifest Avro (one
  * `manifest_entry` row per data file, with the spec's nested
  * `data_file` record), resolved to exactly one snapshot's file set —
  * never a data-directory listing.
  *
  * Same contract as the Delta reader: time travel picks any snapshot
  * listed in the CURRENT metadata json; refusals are loud
  * (format-version above 1, missing snapshot id, torn manifest bytes)
  * rather than silent partial reads.
  *
  * Subset honesty: the manifests travel through this repo's from-spec
  * [[AvroOcf]] decoder, whose schema subset is primitives + nested
  * records (no unions/maps/arrays). The JSON metadata layer reads any
  * conformant v1 table; the Avro layer reads chains whose manifests
  * stay inside that subset — in practice the chains this engine's own
  * writer emits, which carry the spec's REQUIRED v1 fields (optional
  * union'd columns omitted, as the spec allows). Library-written
  * manifests that union-wrap every field refuse loudly instead of
  * misreading — the MP3/brotli posture, recorded in BASELINE.md.
  *
  * Scale shape: the metadata walk is driver-side and O(snapshots +
  * manifests) — tiny JSON + Avro files, exactly how Iceberg itself
  * plans scans; the DATA read stays a parquet `spark.read` over the
  * resolved file list, with all pushdown intact.
  */
object IcebergOps {

  /** manifest_entry (v1 required fields): status 0=existing / 1=added /
    * 2=deleted, snapshot_id, and the nested data_file record.
    */
  val manifestEntrySchema: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("data_file", StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("file_format", StringType, nullable = false),
      // unpartitioned spec → empty partition record (spec: the
      // partition field is a record of the spec's fields, here none)
      StructField("partition", StructType(Nil), nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false))),
      nullable = false)))

  /** manifest_file (v1 required fields of the manifest list). */
  val manifestFileSchema: StructType = StructType(Seq(
    StructField("manifest_path", StringType, nullable = false),
    StructField("manifest_length", LongType, nullable = false),
    StructField("partition_spec_id", IntegerType, nullable = false),
    StructField("added_snapshot_id", LongType, nullable = false)))

  private def metadataDir(tableDir: String): java.io.File =
    new java.io.File(tableDir, "metadata")

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def utf8Rows(schema: StructType,
      rows: Seq[Seq[Any]]): GenericArrayData =
    new GenericArrayData(rows.map { vals =>
      new GenericInternalRow(vals.toArray)
    }.toArray[Any])

  private def writeFile(f: java.io.File, bytes: Array[Byte]): Unit = {
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, bytes)
  }

  /** Resolve a manifest-list/manifest path from the metadata: absolute
    * paths and `file:` URIs pass through, relative paths anchor at the
    * table root (this writer emits relative paths for hermetic
    * fixtures; real tables store absolute URIs).
    */
  private def resolve(tableDir: String, p: String): java.io.File = {
    val clean = p.stripPrefix("file:")
    if (clean.startsWith("/")) new java.io.File(clean)
    else new java.io.File(tableDir, clean)
  }

  /** Append snapshot `snapshotId` (0-based, consecutive): the new live
    * set is (previous live ++ adds -- removes). Writes one full
    * manifest for the snapshot (status 1 for the new adds, 0 for
    * carried-over files — the compaction-write shape), a manifest list
    * pointing at it, and `v<snapshotId+1>.metadata.json` carrying ALL
    * snapshots so any later metadata resolves any earlier snapshot
    * (time travel). `version-hint.text` advances last, so a torn
    * multi-file write never publishes a half-committed snapshot.
    */
  def icebergCommit(tableDir: String, snapshotId: Long,
                    adds: Seq[String], removes: Seq[String] = Nil): Unit = {
    require(snapshotId >= 0, "iceberg snapshot ids start at 0")
    val md = metadataDir(tableDir)
    val m = mapper
    val (prevLive, prevSnapshots) =
      if (snapshotId == 0L) (Seq.empty[String], Seq.empty[Long])
      else {
        val priorFile = new java.io.File(md, s"v$snapshotId.metadata.json")
        require(priorFile.exists(),
          s"iceberg snapshot $snapshotId must follow ${snapshotId - 1} " +
            s"(no ${priorFile.getName})")
        val prior = m.readTree(
          java.nio.file.Files.readAllBytes(priorFile.toPath))
        require(prior.get("current-snapshot-id").asLong() == snapshotId - 1,
          s"iceberg snapshot $snapshotId must follow ${snapshotId - 1}")
        val snaps = prior.get("snapshots").elements()
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (snaps.hasNext) ids += snaps.next().get("snapshot-id").asLong()
        (liveFiles(tableDir, snapshotId - 1), ids.toSeq)
      }
    val removed = removes.toSet
    val carried = prevLive.filterNot(removed)
    require(adds.forall(a => !carried.contains(a)),
      "iceberg add of an already-live path")
    val entries = carried.map(p => (0, p)) ++ adds.map(p => (1, p))
    val manifestRel = s"metadata/m-$snapshotId.avro"
    val manifestBytes = AvroOcf.file(
      utf8Rows(manifestEntrySchema, entries.map { case (status, p) =>
        Seq(status, snapshotId, new GenericInternalRow(Array[Any](
          UTF8String.fromString(p), UTF8String.fromString("PARQUET"),
          new GenericInternalRow(Array.empty[Any]), 0L, 0L)))
      }), manifestEntrySchema, "null")
    writeFile(new java.io.File(tableDir, manifestRel), manifestBytes)
    val listRel = s"metadata/snap-$snapshotId.avro"
    val listBytes = AvroOcf.file(
      utf8Rows(manifestFileSchema, Seq(Seq(
        UTF8String.fromString(manifestRel),
        manifestBytes.length.toLong, 0, snapshotId))),
      manifestFileSchema, "null")
    writeFile(new java.io.File(tableDir, listRel), listBytes)
    val root = m.createObjectNode()
    root.put("format-version", 1)
    root.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
      ("iceberg:" + tableDir).getBytes("UTF-8")).toString)
    root.put("location", tableDir)
    root.put("last-updated-ms", 0L)
    root.put("last-column-id", 0)
    val schema = root.putObject("schema")
    schema.put("type", "struct")
    schema.putArray("fields")
    root.putObject("partition-spec") // v1 single-spec form (deprecated but required)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    root.put("default-spec-id", 0)
    root.putObject("properties")
    root.put("current-snapshot-id", snapshotId)
    val snapArr = root.putArray("snapshots")
    (prevSnapshots :+ snapshotId).foreach { sid =>
      val sn = snapArr.addObject()
      sn.put("snapshot-id", sid)
      sn.put("timestamp-ms", sid)
      sn.put("manifest-list", s"metadata/snap-$sid.avro")
    }
    val vFile = new java.io.File(md, s"v${snapshotId + 1}.metadata.json")
    if (vFile.exists()) {
      val prior = new String(
        java.nio.file.Files.readAllBytes(vFile.toPath), "UTF-8")
      require(prior == m.writeValueAsString(root),
        s"iceberg metadata v${snapshotId + 1} exists with different content")
    } else writeFile(vFile, m.writeValueAsBytes(root))
    writeFile(new java.io.File(md, "version-hint.text"),
      String.valueOf(snapshotId + 1).getBytes("UTF-8"))
  }

  /** Live data-file paths of `snapshotId`, resolved through the
    * CURRENT metadata json (version-hint, falling back to the highest
    * vN.metadata.json) → that snapshot's manifest list → manifests.
    * Refuses loudly on format-version ≠ 1, an unknown snapshot id, or
    * a manifest outside the Avro subset (null from the decoder).
    */
  def icebergFiles(spark: org.apache.spark.sql.SparkSession,
                   tableDir: String, snapshotId: Long): Seq[String] = {
    val md = metadataDir(tableDir)
    require(md.isDirectory, s"no iceberg metadata dir at $tableDir")
    val m = mapper
    val hintFile = new java.io.File(md, "version-hint.text")
    val version: Long =
      if (hintFile.exists())
        new String(java.nio.file.Files.readAllBytes(hintFile.toPath),
          "UTF-8").trim.toLong
      else {
        val vs = Option(md.list()).getOrElse(Array.empty)
          .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
          .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong)
        require(vs.nonEmpty, s"no vN.metadata.json under $md")
        vs.max
      }
    val metaFile = new java.io.File(md, s"v$version.metadata.json")
    require(metaFile.exists(), s"iceberg metadata v$version missing")
    val root = m.readTree(java.nio.file.Files.readAllBytes(metaFile.toPath))
    val fv = root.get("format-version").asInt()
    require(fv == 1,
      s"iceberg format-version $fv unsupported (reader is v1)")
    var manifestList: String = null
    val snaps = root.get("snapshots").elements()
    while (snaps.hasNext && manifestList == null) {
      val sn = snaps.next()
      if (sn.get("snapshot-id").asLong() == snapshotId)
        manifestList = sn.get("manifest-list").asText()
    }
    require(manifestList != null,
      s"iceberg snapshot $snapshotId not in metadata v$version")
    val listBytes = java.nio.file.Files.readAllBytes(
      resolve(tableDir, manifestList).toPath)
    val listRows = AvroOcf.rows(listBytes, manifestFileSchema)
    require(listRows != null,
      s"iceberg manifest list unreadable: $manifestList")
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < listRows.numElements()) {
      val mf = listRows.getStruct(i, manifestFileSchema.length)
      val mPath = mf.getUTF8String(0).toString
      val mBytes = java.nio.file.Files.readAllBytes(
        resolve(tableDir, mPath).toPath)
      require(mf.getLong(1) == mBytes.length,
        s"iceberg manifest length mismatch: $mPath")
      val entries = AvroOcf.rows(mBytes, manifestEntrySchema)
      require(entries != null, s"iceberg manifest unreadable: $mPath")
      var j = 0
      while (j < entries.numElements()) {
        val e = entries.getStruct(j, manifestEntrySchema.length)
        val status = e.getInt(0)
        val path = e.getStruct(2, 5).getUTF8String(0).toString
        if (status == 2) out.remove(path) else out.add(path)
        j += 1
      }
      i += 1
    }
    out.toSeq
  }

  /** The live set as of `snapshotId` per the metadata chain available
    * AT that commit (used by the writer to carry files forward without
    * a SparkSession — manifests resolve driver-side).
    */
  private def liveFiles(tableDir: String, snapshotId: Long): Seq[String] = {
    val listBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(tableDir, s"metadata/snap-$snapshotId.avro").toPath)
    val listRows = AvroOcf.rows(listBytes, manifestFileSchema)
    require(listRows != null, s"iceberg manifest list $snapshotId unreadable")
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < listRows.numElements()) {
      val mf = listRows.getStruct(i, manifestFileSchema.length)
      val mBytes = java.nio.file.Files.readAllBytes(
        resolve(tableDir, mf.getUTF8String(0).toString).toPath)
      val entries = AvroOcf.rows(mBytes, manifestEntrySchema)
      require(entries != null, "iceberg manifest unreadable")
      var j = 0
      while (j < entries.numElements()) {
        val e = entries.getStruct(j, manifestEntrySchema.length)
        val path = e.getStruct(2, 5).getUTF8String(0).toString
        if (e.getInt(0) == 2) out.remove(path) else out.add(path)
        j += 1
      }
      i += 1
    }
    out.toSeq
  }

  /** Time-travel read: exactly snapshot `snapshotId`'s file set. */
  def readIcebergSnapshot(spark: org.apache.spark.sql.SparkSession,
                          tableDir: String, snapshotId: Long): DataFrame = {
    val paths = icebergFiles(spark, tableDir, snapshotId)
    require(paths.nonEmpty, s"iceberg snapshot $snapshotId has no files")
    spark.read.parquet(paths.map(p =>
      resolve(tableDir, p).getAbsolutePath): _*)
  }
}

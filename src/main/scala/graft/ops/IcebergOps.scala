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
  * Interop: the manifests travel through [[AvroOcf.rowsResolved]] —
  * SCHEMA RESOLUTION against the writer's full Avro schema (unions,
  * arrays, maps, nested records, arbitrary field order), projecting
  * only the v1 REQUIRED fields this reader consumes and discarding
  * writer-only columns (counts, bounds, field summaries). That is the
  * layout real library writers (Java Iceberg, Trino, Flink) emit:
  * every optional field union-wrapped `[null, T]`, bounds as
  * logical-map arrays of key/value records — so library-written v1
  * manifest chains parse, not just this engine's own (held to file-set
  * identity against a Java-avro-written chain in IcebergOpsSpec).
  * Remaining refusals are loud: enums/fixed in a manifest schema, a
  * required field actually null, torn framing.
  *
  * Scale shape: the metadata walk is driver-side and O(snapshots +
  * manifests) — tiny JSON + Avro files, exactly how Iceberg itself
  * plans scans; the DATA read stays a parquet `spark.read` over the
  * resolved file list, with all pushdown intact.
  */
object IcebergOps {

  /** manifest_entry (v1 required fields): status 0=existing / 1=added /
    * 2=deleted, snapshot_id, and the nested data_file record. The
    * partition field is a record of the spec's fields (identity
    * transforms over string columns in this writer's subset);
    * unpartitioned tables carry an empty record.
    */
  def manifestEntrySchema(partCols: Seq[String]): StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("data_file", StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("file_format", StringType, nullable = false),
      StructField("partition", StructType(partCols.map(c =>
        StructField(c, StringType, nullable = false))), nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false))),
      nullable = false)))

  /** The unpartitioned entry schema (back-compat surface). */
  val manifestEntrySchemaUnpartitioned: StructType =
    manifestEntrySchema(Nil)

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
                    adds: Seq[String], removes: Seq[String] = Nil): Unit =
    icebergCommitPartitioned(tableDir, snapshotId, Nil,
      adds.map(p => p -> Seq.empty[String]), removes)

  /** Partitioned variant: `partCols` declares the spec (identity
    * transforms over string columns — this writer's subset), each add
    * carries its partition tuple in spec order, and every manifest
    * entry's nested `partition` record stores the tuple — which is
    * what makes MANIFEST-LEVEL PRUNING ([[readIcebergPruned]]) possible
    * without listing or opening a single data file, Iceberg's actual
    * 100 TB value.
    */
  def icebergCommitPartitioned(tableDir: String, snapshotId: Long,
      partCols: Seq[String], adds: Seq[(String, Seq[String])],
      removes: Seq[String] = Nil): Unit = {
    require(snapshotId >= 0, "iceberg snapshot ids start at 0")
    require(adds.forall(_._2.length == partCols.length),
      "every add must carry one value per partition column")
    val md = metadataDir(tableDir)
    val m = mapper
    val entrySchema = manifestEntrySchema(partCols)
    val (prevLive, prevSnapshots) =
      if (snapshotId == 0L)
        (Seq.empty[(String, Seq[String])], Seq.empty[Long])
      else {
        val priorFile = new java.io.File(md, s"v$snapshotId.metadata.json")
        require(priorFile.exists(),
          s"iceberg snapshot $snapshotId must follow ${snapshotId - 1} " +
            s"(no ${priorFile.getName})")
        val prior = m.readTree(
          java.nio.file.Files.readAllBytes(priorFile.toPath))
        require(prior.get("current-snapshot-id").asLong() == snapshotId - 1,
          s"iceberg snapshot $snapshotId must follow ${snapshotId - 1}")
        require(specColsOf(prior) == partCols,
          s"iceberg partition spec changed mid-table (was " +
            s"${specColsOf(prior).mkString(",")})")
        val snaps = prior.get("snapshots").elements()
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (snaps.hasNext) ids += snaps.next().get("snapshot-id").asLong()
        (liveEntries(tableDir, snapshotId - 1, partCols), ids.toSeq)
      }
    val removed = removes.toSet
    val carried = prevLive.filterNot(e => removed(e._1))
    require(adds.forall(a => !carried.exists(_._1 == a._1)),
      "iceberg add of an already-live path")
    val entries = carried.map(e => (0, e._1, e._2)) ++
      adds.map(a => (1, a._1, a._2))
    // Build EVERY artifact before touching disk: a divergent re-commit
    // must refuse (below) without having overwritten the published
    // manifest/list files of the existing snapshot — the same
    // nothing-half-committed discipline as deltaCommit.
    val manifestRel = s"metadata/m-$snapshotId.avro"
    val manifestBytes = AvroOcf.file(
      utf8Rows(entrySchema, entries.map { case (status, p, pv) =>
        Seq(status, snapshotId, new GenericInternalRow(Array[Any](
          UTF8String.fromString(p), UTF8String.fromString("PARQUET"),
          new GenericInternalRow(
            pv.map(v => UTF8String.fromString(v): Any).toArray),
          0L, 0L)))
      }), entrySchema, "null")
    val listRel = s"metadata/snap-$snapshotId.avro"
    val listBytes = AvroOcf.file(
      utf8Rows(manifestFileSchema, Seq(Seq(
        UTF8String.fromString(manifestRel),
        manifestBytes.length.toLong, 0, snapshotId))),
      manifestFileSchema, "null")
    val root = m.createObjectNode()
    root.put("format-version", 1)
    root.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
      ("iceberg:" + tableDir).getBytes("UTF-8")).toString)
    root.put("location", tableDir)
    root.put("last-updated-ms", 0L)
    root.put("last-column-id", partCols.length)
    val schema = root.putObject("schema")
    schema.put("type", "struct")
    val sFields = schema.putArray("fields")
    partCols.zipWithIndex.foreach { case (c, i) =>
      val f = sFields.addObject()
      f.put("id", i + 1); f.put("name", c)
      f.put("required", true); f.put("type", "string")
    }
    root.putObject("partition-spec") // v1 single-spec form (deprecated but required)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    val pFields = spec0.putArray("fields")
    partCols.zipWithIndex.foreach { case (c, i) =>
      val f = pFields.addObject()
      f.put("name", c); f.put("transform", "identity")
      f.put("source-id", i + 1); f.put("field-id", 1000 + i)
    }
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
      // idempotent re-commit: the identity checks run BEFORE any write,
      // so a divergent retry leaves the published chain byte-identical.
      // The metadata json alone can't see the file set — the MANIFEST
      // bytes are the divergence detector for a changed add list.
      val prior = new String(
        java.nio.file.Files.readAllBytes(vFile.toPath), "UTF-8")
      require(prior == m.writeValueAsString(root),
        s"iceberg metadata v${snapshotId + 1} exists with different content")
      val priorManifest = java.nio.file.Files.readAllBytes(
        new java.io.File(tableDir, manifestRel).toPath)
      require(java.util.Arrays.equals(priorManifest, manifestBytes),
        s"iceberg snapshot $snapshotId exists with different file actions")
    } else {
      writeFile(new java.io.File(tableDir, manifestRel), manifestBytes)
      writeFile(new java.io.File(tableDir, listRel), listBytes)
      writeFile(vFile, m.writeValueAsBytes(root))
    }
    // hint only ever ADVANCES: an idempotent replay of snapshot k after
    // k+1.. exist must not regress the hint, or icebergEntries would
    // resolve through the older metadata json and later snapshots would
    // become unreachable ("not in metadata")
    val hintFile = new java.io.File(md, "version-hint.text")
    val priorHint: Long =
      if (hintFile.exists())
        new String(java.nio.file.Files.readAllBytes(hintFile.toPath),
          "UTF-8").trim.toLong
      else 0L
    if (snapshotId + 1 > priorHint)
      writeFile(hintFile,
        String.valueOf(snapshotId + 1).getBytes("UTF-8"))
  }

  /** The default spec's partition columns from a metadata json node —
    * identity transforms only (anything else refuses: bucket/truncate/
    * temporal transforms are outside this reader's subset and pruning
    * against them would silently drop matching files).
    */
  private def specColsOf(
      root: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    val specId = if (root.has("default-spec-id"))
      root.get("default-spec-id").asInt() else 0
    val specs = root.get("partition-specs")
    if (specs == null) return Nil
    val it = specs.elements()
    while (it.hasNext) {
      val sp = it.next()
      if (sp.get("spec-id").asInt() == specId) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val fs = sp.get("fields").elements()
        while (fs.hasNext) {
          val f = fs.next()
          val tr = f.get("transform").asText()
          require(tr == "identity",
            s"iceberg partition transform '$tr' unsupported (identity only)")
          out += f.get("name").asText()
        }
        return out.toSeq
      }
    }
    throw new IllegalArgumentException(
      s"iceberg default-spec-id $specId not in partition-specs")
  }

  /** Live data-file paths of `snapshotId`, resolved through the
    * CURRENT metadata json (version-hint, falling back to the highest
    * vN.metadata.json) → that snapshot's manifest list → manifests.
    * Refuses loudly on format-version ≠ 1, an unknown snapshot id, or
    * a manifest outside the Avro subset (null from the decoder).
    */
  def icebergFiles(spark: org.apache.spark.sql.SparkSession,
                   tableDir: String, snapshotId: Long): Seq[String] =
    icebergEntries(tableDir, snapshotId)._2.map(_._1)

  /** The snapshot's live entries through the CURRENT metadata json:
    * (partition columns, (path, partition tuple) in commit order).
    * Refuses loudly on format-version ≠ 1, a non-identity transform,
    * an unknown snapshot id, or a manifest outside the Avro subset.
    */
  def icebergEntries(tableDir: String, snapshotId: Long)
      : (Seq[String], Seq[(String, Seq[String])]) = {
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
    val partCols = specColsOf(root)
    var manifestList: String = null
    val snaps = root.get("snapshots").elements()
    while (snaps.hasNext && manifestList == null) {
      val sn = snaps.next()
      if (sn.get("snapshot-id").asLong() == snapshotId)
        manifestList = sn.get("manifest-list").asText()
    }
    require(manifestList != null,
      s"iceberg snapshot $snapshotId not in metadata v$version")
    (partCols, foldManifestList(tableDir, manifestList, partCols,
      pinLengths = true))
  }

  /** Manifest-list → manifests fold, last action per path. */
  private def foldManifestList(tableDir: String, manifestList: String,
      partCols: Seq[String], pinLengths: Boolean)
      : Seq[(String, Seq[String])] = {
    val entrySchema = manifestEntrySchema(partCols)
    val listBytes = java.nio.file.Files.readAllBytes(
      resolve(tableDir, manifestList).toPath)
    val listRows = AvroOcf.rowsResolved(listBytes, manifestFileSchema)
    require(listRows != null,
      s"iceberg manifest list unreadable: $manifestList")
    val out =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    var i = 0
    while (i < listRows.numElements()) {
      val mf = listRows.getStruct(i, manifestFileSchema.length)
      val mPath = mf.getUTF8String(0).toString
      val mBytes = java.nio.file.Files.readAllBytes(
        resolve(tableDir, mPath).toPath)
      if (pinLengths)
        require(mf.getLong(1) == mBytes.length,
          s"iceberg manifest length mismatch: $mPath")
      val entries = AvroOcf.rowsResolved(mBytes, entrySchema)
      require(entries != null, s"iceberg manifest unreadable: $mPath")
      var j = 0
      while (j < entries.numElements()) {
        val e = entries.getStruct(j, entrySchema.length)
        val status = e.getInt(0)
        val df = e.getStruct(2, 5)
        val path = df.getUTF8String(0).toString
        if (status == 2) out.remove(path)
        else {
          val part = df.getStruct(2, partCols.length)
          out(path) = partCols.indices.map(k =>
            part.getUTF8String(k).toString)
        }
        j += 1
      }
      i += 1
    }
    out.toSeq
  }

  /** The live set as of `snapshotId` per the metadata chain available
    * AT that commit (used by the writer to carry files + partition
    * tuples forward without a SparkSession — manifests resolve
    * driver-side).
    */
  private def liveEntries(tableDir: String, snapshotId: Long,
      partCols: Seq[String]): Seq[(String, Seq[String])] =
    foldManifestList(tableDir, s"metadata/snap-$snapshotId.avro", partCols,
      pinLengths = false)

  /** Time-travel read: exactly snapshot `snapshotId`'s file set. */
  def readIcebergSnapshot(spark: org.apache.spark.sql.SparkSession,
                          tableDir: String, snapshotId: Long): DataFrame = {
    val paths = icebergFiles(spark, tableDir, snapshotId)
    require(paths.nonEmpty, s"iceberg snapshot $snapshotId has no files")
    spark.read.parquet(paths.map(p =>
      resolve(tableDir, p).getAbsolutePath): _*)
  }

  /** ORPHAN-FILE audit — the vacuum precursor: data directories under
    * the table root that NO retained snapshot references. The live set
    * is the union over EVERY snapshot in the current metadata json
    * (time travel keeps a file removed at v1 reachable through
    * snapshot 0 — deleting it would corrupt history, so it is NOT an
    * orphan until its snapshots expire). Driver-side O(snapshots ×
    * manifest rows) metadata plus one directory listing — never a
    * recursive data scan; at 100 TB the listing is the storage
    * inventory feed, the decision stays metadata-sized.
    */
  def orphanFiles(tableDir: String): Seq[String] = {
    val md = metadataDir(tableDir)
    require(md.isDirectory, s"no iceberg metadata dir at $tableDir")
    val m = mapper
    val hintFile = new java.io.File(md, "version-hint.text")
    require(hintFile.exists(), s"no version-hint.text under $md")
    val version = new String(
      java.nio.file.Files.readAllBytes(hintFile.toPath), "UTF-8").trim.toLong
    val root = m.readTree(java.nio.file.Files.readAllBytes(
      new java.io.File(md, s"v$version.metadata.json").toPath))
    require(root.get("format-version").asInt() == 1,
      "iceberg format-version unsupported (reader is v1)")
    val partCols = specColsOf(root)
    val referenced = scala.collection.mutable.HashSet.empty[String]
    val snaps = root.get("snapshots").elements()
    while (snaps.hasNext) {
      val sn = snaps.next()
      foldManifestList(tableDir, sn.get("manifest-list").asText(),
        partCols, pinLengths = false).foreach { case (p, _) =>
        referenced += resolve(tableDir, p).getCanonicalPath
      }
    }
    val dataDir = new java.io.File(tableDir, "data")
    if (!dataDir.isDirectory) return Nil
    Option(dataDir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => !referenced.contains(f.getCanonicalPath))
      .map(f => "data/" + f.getName).sorted
  }

  /** METADATA-ONLY migration of a Delta snapshot into a fresh Iceberg
    * chain — how real lakehouse migrations work (Iceberg's own
    * `snapshot` mode): the Delta log resolves version `deltaVersion`'s
    * live file set, and snapshot 0 of the new Iceberg table points at
    * THOSE SAME parquet files by absolute path — zero bytes of data
    * copied or rewritten, so a 100 TB table migrates in O(files) of
    * metadata. The source `_delta_log` stays untouched; both tables
    * read the same files afterwards.
    */
  def importDelta(spark: org.apache.spark.sql.SparkSession,
      deltaDir: String, icebergDir: String, deltaVersion: Long): Unit = {
    val files = SnapshotOps.deltaFiles(spark, deltaDir, deltaVersion)
    require(files.nonEmpty,
      s"delta version $deltaVersion of $deltaDir has no files")
    icebergCommit(icebergDir, 0, files.map(p =>
      new java.io.File(deltaDir, p).getAbsolutePath))
  }

  /** MANIFEST-LEVEL PARTITION PRUNING: resolve the snapshot, keep only
    * the entries whose partition tuple matches every (column → value)
    * in `partFilter`, and plan the parquet read over THAT file list —
    * files outside the predicate are never listed, opened, or footered,
    * which is the reason partitioned Iceberg tables scale: the scan
    * plan is built from O(manifest rows) of metadata, not O(files) of
    * storage round trips. Unknown filter columns refuse loudly (a typo
    * must not silently read the whole table).
    */
  def readIcebergPruned(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, snapshotId: Long,
      partFilter: Map[String, String]): DataFrame = {
    val (partCols, entries) = icebergEntries(tableDir, snapshotId)
    val unknown = partFilter.keySet -- partCols.toSet
    require(unknown.isEmpty,
      s"iceberg partition filter on non-partition columns: " +
        s"${unknown.mkString(",")}")
    val keep = entries.filter { case (_, pv) =>
      partFilter.forall { case (c, v) => pv(partCols.indexOf(c)) == v }
    }
    require(keep.nonEmpty,
      s"iceberg snapshot $snapshotId has no files matching $partFilter")
    spark.read.parquet(keep.map(e =>
      resolve(tableDir, e._1).getAbsolutePath): _*)
  }
}

package graft.queries

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Iceberg v1 metadata chain written the way REAL library writers
  * (Java Iceberg, Trino, Flink) lay it out — the interop counterpart
  * of [[graft.ops.IcebergOps]]' own minimal writer:
  *
  *   - manifests and manifest lists written by the INDEPENDENT Java
  *     avro library (avro-1.12.1, a different codebase than this
  *     repo's [[graft.functions.AvroOcf]]), with a random sync marker
  *     and the library's own framing;
  *   - the spec's FULL v1 schemas: every optional field union-wrapped
  *     `[null, T]`, per-column stats as `logicalType: map` arrays of
  *     key/value records, `split_offsets` as an `array<long>`,
  *     `block_size_in_bytes` present (required in v1, absent from the
  *     engine's own subset writer);
  *   - absolute `file:` URIs for data files and manifest lists (real
  *     tables store URIs; the engine's writer emits relative paths).
  *
  * Reading THIS chain is what "reads Iceberg" means beyond "reads its
  * own chains": IcebergOps resolves it through AvroOcf.rowsResolved
  * (schema resolution by name, writer-only columns discarded), and
  * IcebergOpsSpec holds the file sets to identity against the
  * self-written chain over the same history.
  */
object IcebergInteropFixture {

  /** manifest_entry, Iceberg spec v1 (field ids as custom attrs, the
    * way the Java implementation serializes them). */
  private val entrySchemaJson =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"field-id":1},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104},
      |{"name":"block_size_in_bytes","type":"long","field-id":105},
      |{"name":"column_sizes","type":["null",{"type":"array","items":{"type":"record","name":"k117_v118","fields":[{"name":"key","type":"int","field-id":117},{"name":"value","type":"long","field-id":118}]},"logicalType":"map"}],"field-id":108},
      |{"name":"value_counts","type":["null",{"type":"array","items":{"type":"record","name":"k119_v120","fields":[{"name":"key","type":"int","field-id":119},{"name":"value","type":"long","field-id":120}]},"logicalType":"map"}],"field-id":109},
      |{"name":"null_value_counts","type":["null",{"type":"array","items":{"type":"record","name":"k121_v122","fields":[{"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]},"logicalType":"map"}],"field-id":110},
      |{"name":"lower_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k126_v127","fields":[{"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]},"logicalType":"map"}],"field-id":125},
      |{"name":"upper_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k129_v130","fields":[{"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]},"logicalType":"map"}],"field-id":128},
      |{"name":"key_metadata","type":["null","bytes"],"field-id":131},
      |{"name":"split_offsets","type":["null",{"type":"array","items":"long"}],"field-id":132}
      |]},"field-id":2}]}""".stripMargin

  /** manifest_file, Iceberg spec v1 (the manifest-list row). */
  private val listSchemaJson =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"added_snapshot_id","type":["null","long"],"field-id":503},
      |{"name":"added_data_files_count","type":["null","int"],"field-id":504},
      |{"name":"existing_data_files_count","type":["null","int"],"field-id":505},
      |{"name":"deleted_data_files_count","type":["null","int"],"field-id":506},
      |{"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[
      |{"name":"contains_null","type":"boolean","field-id":509},
      |{"name":"lower_bound","type":["null","bytes"],"field-id":510},
      |{"name":"upper_bound","type":["null","bytes"],"field-id":511}]}}],"field-id":507},
      |{"name":"added_rows_count","type":["null","long"],"field-id":512},
      |{"name":"existing_rows_count","type":["null","long"],"field-id":513},
      |{"name":"deleted_rows_count","type":["null","long"],"field-id":514}
      |]}""".stripMargin

  private def avroFile(schema: Schema, metas: Seq[(String, String)],
      recs: Seq[GenericRecord], deflate: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    if (deflate)
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    metas.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out)
    recs.foreach(w.append)
    w.close()
    out.toByteArray
  }

  private def kvRecords(arrSchema: Schema,
      pairs: Seq[(Int, Long)]): java.util.List[GenericRecord] = {
    val itemSchema = arrSchema.getElementType
    val l = new java.util.ArrayList[GenericRecord]()
    pairs.foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k)
      r.put("value", java.lang.Long.valueOf(v))
      l.add(r)
    }
    l
  }

  private def nonNullBranch(union: Schema): Schema =
    union.getTypes.stream().filter(t =>
      t.getType != Schema.Type.NULL).findFirst().get()

  /** Write the 3-snapshot history (snapshot 0 adds dirs 0,1; snapshot 1
    * adds dir 2 and removes dir 1; snapshot 2 adds dir 3) over the four
    * given ABSOLUTE data directories, in the library layout described
    * above. Even-indexed manifest entries carry populated stats maps
    * and split offsets (both union branches and the blocked array/map
    * encodings get exercised); odd-indexed entries carry nulls.
    */
  def write(tableDir: String, dataDirs: Seq[String]): Unit = {
    require(dataDirs.length == 4, "fixture expects four data dirs")
    val md = new java.io.File(tableDir, "metadata")
    md.mkdirs()
    val entrySchema = new Schema.Parser().parse(entrySchemaJson)
    val listSchema = new Schema.Parser().parse(listSchemaJson)
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val live = Seq(
      Seq(1 -> 0, 1 -> 1),           // s0: add b0, b1
      Seq(0 -> 0, 1 -> 2),           // s1: carry b0, add b2 (b1 removed)
      Seq(0 -> 0, 0 -> 2, 1 -> 3))   // s2: carry b0,b2, add b3
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    live.zipWithIndex.foreach { case (entries, sid) =>
      val recs = entries.zipWithIndex.map { case ((status, dirIdx), i) =>
        val df = new GenericData.Record(dfSchema)
        df.put("file_path", "file:" + dataDirs(dirIdx))
        df.put("file_format", "PARQUET")
        df.put("partition", new GenericData.Record(partSchema))
        df.put("record_count", java.lang.Long.valueOf(100L + dirIdx))
        df.put("file_size_in_bytes", java.lang.Long.valueOf(4096L))
        df.put("block_size_in_bytes", java.lang.Long.valueOf(67108864L))
        if (i % 2 == 0) {
          df.put("column_sizes", kvRecords(
            nonNullBranch(dfSchema.getField("column_sizes").schema()),
            Seq(1 -> 321L, 2 -> 654L)))
          df.put("value_counts", kvRecords(
            nonNullBranch(dfSchema.getField("value_counts").schema()),
            Seq(1 -> (100L + dirIdx))))
          df.put("null_value_counts", kvRecords(
            nonNullBranch(dfSchema.getField("null_value_counts").schema()),
            Seq(1 -> 0L)))
          val offs = new java.util.ArrayList[java.lang.Long]()
          offs.add(4L)
          df.put("split_offsets", offs)
        }
        val e = new GenericData.Record(entrySchema)
        e.put("status", java.lang.Integer.valueOf(status))
        e.put("snapshot_id", java.lang.Long.valueOf(sid.toLong))
        e.put("data_file", df)
        e
      }
      val manifestBytes = avroFile(entrySchema,
        Seq("schema" -> "{}", "partition-spec" -> "[]",
          "format-version" -> "1"),
        recs, deflate = sid % 2 == 1) // both codecs across the chain
      val mFile = new java.io.File(md, s"m-$sid.avro")
      java.nio.file.Files.write(mFile.toPath, manifestBytes)
      val mf = new GenericData.Record(listSchema)
      mf.put("manifest_path", "file:" + mFile.getAbsolutePath)
      mf.put("manifest_length", java.lang.Long.valueOf(manifestBytes.length.toLong))
      mf.put("partition_spec_id", java.lang.Integer.valueOf(0))
      mf.put("added_snapshot_id", java.lang.Long.valueOf(sid.toLong))
      mf.put("added_data_files_count",
        java.lang.Integer.valueOf(entries.count(_._1 == 1)))
      mf.put("existing_data_files_count",
        java.lang.Integer.valueOf(entries.count(_._1 == 0)))
      mf.put("deleted_data_files_count", java.lang.Integer.valueOf(0))
      mf.put("added_rows_count", java.lang.Long.valueOf(100L))
      val listBytes = avroFile(listSchema,
        Seq("format-version" -> "1"), Seq(mf), deflate = false)
      java.nio.file.Files.write(
        new java.io.File(md, s"snap-$sid.avro").toPath, listBytes)
      // vN.metadata.json: same v1 JSON shape IcebergOps emits, but with
      // absolute file: URIs for the manifest lists (the library habit)
      val root = mapper.createObjectNode()
      root.put("format-version", 1)
      root.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
        ("iceberg-interop:" + tableDir).getBytes("UTF-8")).toString)
      root.put("location", tableDir)
      root.put("last-updated-ms", 0L)
      root.put("last-column-id", 0)
      val schema = root.putObject("schema")
      schema.put("type", "struct")
      schema.putArray("fields")
      root.putObject("partition-spec")
      val specs = root.putArray("partition-specs")
      val spec0 = specs.addObject()
      spec0.put("spec-id", 0)
      spec0.putArray("fields")
      root.put("default-spec-id", 0)
      root.putObject("properties")
      root.put("current-snapshot-id", sid)
      val snapArr = root.putArray("snapshots")
      (0 to sid).foreach { s =>
        val sn = snapArr.addObject()
        sn.put("snapshot-id", s)
        sn.put("timestamp-ms", s.toLong)
        sn.put("manifest-list",
          "file:" + new java.io.File(md, s"snap-$s.avro").getAbsolutePath)
      }
      java.nio.file.Files.write(
        new java.io.File(md, s"v${sid + 1}.metadata.json").toPath,
        mapper.writeValueAsBytes(root))
    }
    java.nio.file.Files.write(
      new java.io.File(md, "version-hint.text").toPath,
      String.valueOf(live.length).getBytes("UTF-8"))
  }
}

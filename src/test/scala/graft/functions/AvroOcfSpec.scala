package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro OCF reader/writer vs the INDEPENDENT Java avro implementation
  * (avro-1.12.1, the library Spark itself builds spark-avro on): the
  * Java library must read every file our writer emits bit-for-bit
  * (both codecs), and our reader must walk Java-written files —
  * including multi-block files with the library's RANDOM sync marker
  * and its own deflate stream. Plus the refusal matrix.
  */
class AvroOcfSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("ok", BooleanType), StructField("score", DoubleType)))

  private def row(id: Long, name: String, ok: Boolean, d: Double) =
    new GenericInternalRow(
      Array[Any](id, UTF8String.fromString(name), ok, d))

  private def ours(rows: Seq[GenericInternalRow], codec: String): Array[Byte] =
    AvroOcf.file(new GenericArrayData(rows.toArray[Any]), schema, codec)

  test("java avro reads our writer's files, both codecs, exact values") {
    for (codec <- Seq("null", "deflate")) {
      val blob = ours(Seq(
        row(1L, "alpha", ok = true, 1.5),
        row(-2L, "béta ☃", ok = false, -0.25)), codec)
      val rdr = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(blob),
        new GenericDatumReader[GenericRecord]())
      val recs = Iterator.continually(rdr)
        .takeWhile(_.hasNext).map(_.next()).toVector
      rdr.close()
      assert(recs.length == 2, s"codec=$codec")
      assert(recs(0).get("id") == 1L && recs(0).get("name").toString == "alpha")
      assert(recs(0).get("ok") == true && recs(0).get("score") == 1.5)
      assert(recs(1).get("id") == -2L &&
        recs(1).get("name").toString == "béta ☃")
      assert(recs(1).get("ok") == false && recs(1).get("score") == -0.25)
    }
  }

  test("our reader walks java-written multi-block files, both codecs") {
    val js = new org.apache.avro.Schema.Parser().parse(
      AvroOcf.schemaJson(schema))
    for (deflate <- Seq(false, true)) {
      val baos = new java.io.ByteArrayOutputStream
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](js))
      if (deflate) w.setCodec(CodecFactory.deflateCodec(6))
      w.create(js, baos)
      def rec(id: Long, name: String, ok: Boolean, d: Double) = {
        val r = new GenericData.Record(js)
        r.put("id", id); r.put("name", name); r.put("ok", ok); r.put("score", d)
        r
      }
      w.append(rec(10L, "first", ok = true, 0.5))
      w.append(rec(11L, "second", ok = false, -1.0))
      w.sync() // force a block boundary → multi-block walk
      w.append(rec(12L, "third ü", ok = true, 42.0))
      w.close()
      val got = AvroOcf.rows(baos.toByteArray, schema)
      assert(got != null, s"deflate=$deflate: java-written file refused")
      assert(got.numElements() == 3)
      val r0 = got.getStruct(0, 4)
      val r2 = got.getStruct(2, 4)
      assert(r0.getLong(0) == 10L && r0.getUTF8String(1).toString == "first" &&
        r0.getBoolean(2) && r0.getDouble(3) == 0.5)
      assert(r2.getLong(0) == 12L &&
        r2.getUTF8String(1).toString == "third ü" && r2.getDouble(3) == 42.0)
    }
  }

  test("nested records: ours->java and java->ours, exact values") {
    val nested = StructType(Seq(
      StructField("status", IntegerType),
      StructField("data_file", StructType(Seq(
        StructField("file_path", StringType),
        StructField("partition", StructType(Nil)), // empty record
        StructField("record_count", LongType))))))
    // ours -> java
    val blob = AvroOcf.file(new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](1,
        new GenericInternalRow(Array[Any](
          UTF8String.fromString("data/p0"),
          new GenericInternalRow(Array.empty[Any]), 42L)))))),
      nested, "null")
    val rdr = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(blob),
      new GenericDatumReader[GenericRecord]())
    val rec = rdr.next()
    val df = rec.get("data_file").asInstanceOf[GenericRecord]
    assert(rec.get("status") == 1 &&
      df.get("file_path").toString == "data/p0" &&
      df.get("record_count") == 42L)
    assert(!rdr.hasNext)
    rdr.close()
    // java -> ours (java's own schema object, its own random sync)
    val js = new org.apache.avro.Schema.Parser().parse(
      AvroOcf.schemaJson(nested))
    val baos = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](js))
    w.create(js, baos)
    val inner = new GenericData.Record(js.getField("data_file").schema())
    inner.put("file_path", "data/p9")
    inner.put("partition", new GenericData.Record(
      js.getField("data_file").schema().getField("partition").schema()))
    inner.put("record_count", 7L)
    val outer = new GenericData.Record(js)
    outer.put("status", 2)
    outer.put("data_file", inner)
    w.append(outer)
    w.close()
    val got = AvroOcf.rows(baos.toByteArray, nested)
    assert(got != null && got.numElements() == 1)
    val g = got.getStruct(0, 2)
    assert(g.getInt(0) == 2)
    val gdf = g.getStruct(1, 3)
    assert(gdf.getUTF8String(0).toString == "data/p9" &&
      gdf.getLong(2) == 7L)
  }

  test("nested records: seeded mutation fuzz — rows or null, never a crash") {
    val nested = StructType(Seq(
      StructField("status", IntegerType),
      StructField("data_file", StructType(Seq(
        StructField("file_path", StringType),
        StructField("partition", StructType(Nil)),
        StructField("record_count", LongType))))))
    val base = AvroOcf.file(new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](1,
        new GenericInternalRow(Array[Any](
          UTF8String.fromString("data/p0"),
          new GenericInternalRow(Array.empty[Any]), 42L)))))),
      nested, "null")
    val rnd = new scala.util.Random(99)
    var i = 0
    while (i < 3000) {
      val b = base.clone()
      var k = 0
      val flips = 1 + rnd.nextInt(3)
      while (k < flips) {
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        k += 1
      }
      AvroOcf.rows(b, nested) // rows or null — never a throw
      i += 1
    }
  }

  test("round trip through our own pair, empty file, bytes/int fields") {
    val blob = ours(Seq(row(7L, "", ok = false, 0.0)), "null")
    val got = AvroOcf.rows(blob, schema)
    assert(got.numElements() == 1 &&
      got.getStruct(0, 4).getUTF8String(1).toString == "")
    // zero records is a legal OCF
    assert(AvroOcf.rows(ours(Seq.empty, "deflate"), schema).numElements() == 0)
    // int + bytes subset fields
    val s2 = StructType(Seq(StructField("n", IntegerType),
      StructField("payload", BinaryType)))
    val b2 = AvroOcf.file(new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](-5, Array[Byte](0, 1, 2, -1))))),
      s2, "null")
    val g2 = AvroOcf.rows(b2, s2)
    assert(g2.getStruct(0, 2).getInt(0) == -5)
    assert(g2.getStruct(0, 2).getBinary(1).toSeq == Seq[Byte](0, 1, 2, -1))
  }

  test("refusal matrix: magic, codec, schema mismatch, sync, truncation") {
    val good = ours(Seq(row(1L, "x", ok = true, 1.0)), "null")
    def mutate(at: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(at) = v; b
    }
    assert(AvroOcf.rows(mutate(0, 'X'), schema) == null, "bad magic")
    assert(AvroOcf.rows(good.dropRight(1), schema) == null, "truncated")
    assert(AvroOcf.rows(mutate(good.length - 1, '?'), schema) == null,
      "block sync mismatch")
    // wrong schema for the reader
    val other = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    assert(AvroOcf.rows(good, other) == null, "schema arity mismatch")
    // unknown codec in metadata: write with a snappy claim
    val js = new org.apache.avro.Schema.Parser().parse(
      AvroOcf.schemaJson(schema))
    val baos = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](js))
    w.setMeta("user.extra", "decoy") // arbitrary extra metadata is fine
    w.create(js, baos)
    w.close()
    assert(AvroOcf.rows(baos.toByteArray, schema) != null,
      "extra metadata keys must not refuse")
    assert(AvroOcf.rows(Array[Byte](1, 2, 3), schema) == null)
  }

  test("corrupt deflate block bytes refuse (null), never crash") {
    val good = ours(Seq(
      row(1L, "alpha", ok = true, 1.5),
      row(2L, "beta", ok = false, -0.5)), "deflate")
    // flip every payload byte in turn (after magic+header, before the
    // trailing sync): Inflater.inflate throws DataFormatException on
    // most of these — every one must surface as a refusal, not a crash
    var at = 4
    var refusedAtLeastOne = false
    while (at < good.length - 16) {
      val b = good.clone()
      b(at) = (b(at) ^ 0x55).toByte
      val got = AvroOcf.rows(b, schema) // must not throw
      if (got == null) refusedAtLeastOne = true
      at += 1
    }
    assert(refusedAtLeastOne)
    // and a block whose payload is plainly not deflate data
    val js = new org.apache.avro.Schema.Parser().parse(
      AvroOcf.schemaJson(schema))
    val baos = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](js))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(js, baos)
    val r = new GenericData.Record(js)
    r.put("id", 9L); r.put("name", "n"); r.put("ok", true); r.put("score", 2.0)
    w.append(r)
    w.close()
    val blob = baos.toByteArray
    // zero out the last 24 bytes before the final sync (deflate body)
    val bad = blob.clone()
    var k = blob.length - 40
    while (k < blob.length - 16) { bad(k) = 0x07; k += 1 }
    assert(AvroOcf.rows(bad, schema) == null, "garbled deflate must refuse")
  }

  test("writer refuses null records and null fields loudly") {
    val nullRec = new GenericArrayData(Array[Any](null))
    val e1 = intercept[IllegalArgumentException] {
      AvroOcf.file(nullRec, schema, "null")
    }
    assert(e1.getMessage.contains("null record"))
    val nullField = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](1L, null, true, 0.5))))
    val e2 = intercept[IllegalArgumentException] {
      AvroOcf.file(nullField, schema, "null")
    }
    assert(e2.getMessage.contains("null field 'name'"))
  }

  test("round trip holds under seeded random record fuzz, both codecs") {
    val rnd = new scala.util.Random(4242)
    val strings = Array("", "a", "café ☃", "line\nbreak",
      "tab\there", "\"quotes\"", "x" * 500)
    var i = 0
    while (i < 60) {
      val rows = Seq.fill(rnd.nextInt(5))(row(
        rnd.nextLong(), strings(rnd.nextInt(strings.length)),
        rnd.nextBoolean(),
        java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case d if d.isNaN => 0.5 // NaN != NaN would fail equality
          case d => d
        }))
      val codec = if (i % 2 == 0) "null" else "deflate"
      val blob = ours(rows, codec)
      val got = AvroOcf.rows(blob, schema)
      assert(got != null && got.numElements() == rows.length,
        s"fuzz case $i refused")
      rows.zipWithIndex.foreach { case (r, j) =>
        val g = got.getStruct(j, 4)
        assert(g.getLong(0) == r.getLong(0) &&
          g.getUTF8String(1).toString == r.getUTF8String(1).toString &&
          g.getBoolean(2) == r.getBoolean(2) &&
          java.lang.Double.doubleToLongBits(g.getDouble(3)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(3)),
          s"fuzz case $i row $j mismatch")
      }
      // and the independent Java reader agrees on the count
      val rdr = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(blob),
        new GenericDatumReader[GenericRecord]())
      assert(Iterator.continually(rdr).takeWhile(_.hasNext)
        .map(_.next()).size == rows.length)
      rdr.close()
      i += 1
    }
  }

  test("schema JSON parsing tolerates namespaces and object-form types") {
    assert(AvroOcf.parseFields(
      """{"type":"record","name":"r","namespace":"com.example",
        |"doc":"x","fields":[
        |  {"name":"id","type":"long","doc":"pk"},
        |  {"name":"name","type":{"type":"string","avro.java.string":"String"}},
        |  {"name":"ok","type":"boolean"},
        |  {"name":"score","type":"double"}]}""".stripMargin) ==
      Seq("id" -> AvroOcf.FPrim("long"), "name" -> AvroOcf.FPrim("string"),
        "ok" -> AvroOcf.FPrim("boolean"), "score" -> AvroOcf.FPrim("double")))
  }

  test("schema JSON parsing handles nested records recursively") {
    assert(AvroOcf.parseFields(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"r2",
        |    "fields":[
        |      {"name":"file_path","type":"string"},
        |      {"name":"partition","type":{"type":"record","name":"r3",
        |        "fields":[]}},
        |      {"name":"record_count","type":"long"}]}}]}""".stripMargin) ==
      Seq("status" -> AvroOcf.FPrim("int"),
        "data_file" -> AvroOcf.FRec(Seq(
          "file_path" -> AvroOcf.FPrim("string"),
          "partition" -> AvroOcf.FRec(Nil),
          "record_count" -> AvroOcf.FPrim("long")))))
  }

  // ---- rowsResolved: schema resolution over library-written files ----

  /** The real-writer layout: unions, arrays, maps, writer-only fields,
    * arbitrary field order — everything the Java Iceberg/Trino/Flink
    * manifest layer emits that the strict subset reader refuses. */
  private val fullWriterSchemaJson =
    """{"type":"record","name":"r","fields":[
      |{"name":"junk","type":"string"},
      |{"name":"id","type":["null","long"]},
      |{"name":"counts","type":{"type":"array","items":{"type":"record",
      |  "name":"kv","fields":[{"name":"key","type":"int"},
      |  {"name":"value","type":"long"}]},"logicalType":"map"}},
      |{"name":"name","type":"string"},
      |{"name":"note","type":["null","string"]},
      |{"name":"stats","type":{"type":"map","values":"long"}},
      |{"name":"offs","type":["null",{"type":"array","items":"long"}]},
      |{"name":"score","type":"float"},
      |{"name":"small","type":"int"}]}""".stripMargin

  private def fullWriterBlob(deflate: Boolean): Array[Byte] = {
    val js = new org.apache.avro.Schema.Parser().parse(fullWriterSchemaJson)
    val baos = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](js))
    if (deflate) w.setCodec(CodecFactory.deflateCodec(6))
    w.create(js, baos)
    val kvSchema = js.getField("counts").schema().getElementType
    def kv(k: Int, v: Long) = {
      val r = new GenericData.Record(kvSchema)
      r.put("key", k); r.put("value", v); r
    }
    def rec(id: java.lang.Long, name: String, note: String,
        offs: Seq[Long], score: Float, small: Int) = {
      val r = new GenericData.Record(js)
      r.put("junk", "discard-me")
      r.put("id", id)
      val cs = new java.util.ArrayList[GenericRecord]()
      cs.add(kv(1, 11L)); cs.add(kv(2, 22L))
      r.put("counts", cs)
      r.put("name", name)
      r.put("note", note)
      val m = new java.util.LinkedHashMap[String, java.lang.Long]()
      m.put("a", 5L); m.put("b", 7L)
      r.put("stats", m)
      if (offs.nonEmpty) {
        val l = new java.util.ArrayList[java.lang.Long]()
        offs.foreach(o => l.add(o))
        r.put("offs", l)
      }
      r.put("score", java.lang.Float.valueOf(score))
      r.put("small", java.lang.Integer.valueOf(small))
      r
    }
    w.append(rec(9L, "alpha", "hello", Seq(4L, 9L), 2.5f, 3))
    w.append(rec(null, "beta", null, Nil, -0.5f, -4))
    w.close()
    baos.toByteArray
  }

  private val resolvedReaderSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("id", LongType, nullable = true),
    StructField("note", StringType, nullable = true),
    StructField("stats", MapType(StringType, LongType), nullable = false),
    StructField("offs", ArrayType(LongType), nullable = true),
    StructField("score", FloatType, nullable = false),
    StructField("small", LongType, nullable = false))) // int→long widening

  test("rowsResolved: unions/arrays/maps + projection by name, both codecs") {
    for (deflate <- Seq(false, true)) {
      val got = AvroOcf.rowsResolved(fullWriterBlob(deflate),
        resolvedReaderSchema)
      assert(got != null, s"deflate=$deflate: resolution refused")
      assert(got.numElements() == 2)
      val r0 = got.getStruct(0, 7)
      assert(r0.getUTF8String(0).toString == "alpha")
      assert(r0.getLong(1) == 9L) // [null,long] non-null branch
      assert(r0.getUTF8String(2).toString == "hello")
      val m0 = r0.getMap(3)
      val mPairs = (0 until m0.numElements()).map(i =>
        m0.keyArray().getUTF8String(i).toString ->
          m0.valueArray().getLong(i)).toMap
      assert(mPairs == Map("a" -> 5L, "b" -> 7L))
      val offs = r0.getArray(4)
      assert((0 until offs.numElements()).map(offs.getLong) == Seq(4L, 9L))
      assert(r0.getFloat(5) == 2.5f)
      assert(r0.getLong(6) == 3L) // avro int widened to Spark long
      val r1 = got.getStruct(1, 7)
      assert(r1.getUTF8String(0).toString == "beta")
      assert(r1.isNullAt(1) && r1.isNullAt(2)) // null union branches
      assert(r1.isNullAt(4)) // unset offs → the [null, array] null branch
      assert(r1.getLong(6) == -4L)
      // the STRICT reader still refuses the union layout whole
      assert(AvroOcf.rows(fullWriterBlob(deflate), resolvedReaderSchema)
        == null)
    }
  }

  test("rowsResolved refusal matrix: missing field, null-into-required, enum") {
    val blob = fullWriterBlob(deflate = false)
    // a reader field the writer never carried → refuse whole
    assert(AvroOcf.rowsResolved(blob, StructType(Seq(
      StructField("name", StringType),
      StructField("missing_col", LongType)))) == null)
    // record 2 carries null id: a NON-nullable id column must refuse
    assert(AvroOcf.rowsResolved(blob, StructType(Seq(
      StructField("id", LongType, nullable = false)))) == null)
    // type mismatch (string column asked as long) → refuse
    assert(AvroOcf.rowsResolved(blob, StructType(Seq(
      StructField("name", LongType)))) == null)
    // enum in the writer schema: outside the subset, loud refusal
    val ejs = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"e","fields":[
        |{"name":"kind","type":{"type":"enum","name":"k",
        |"symbols":["A","B"]}}]}""".stripMargin)
    val baos = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](ejs))
    w.create(ejs, baos)
    val er = new GenericData.Record(ejs)
    er.put("kind", new GenericData.EnumSymbol(ejs.getField("kind").schema(), "A"))
    w.append(er)
    w.close()
    assert(AvroOcf.rowsResolved(baos.toByteArray, StructType(Seq(
      StructField("kind", StringType)))) == null)
  }

  test("schema depth bomb refuses (both readers), never a stack overflow") {
    // 40-deep nested record schema in the OCF header: past the 32 cap
    def nest(d: Int): String =
      if (d == 0) "\"long\""
      else s"""{"type":"record","name":"n$d","fields":[
              |{"name":"f","type":${nest(d - 1)}}]}""".stripMargin
    val deep = s"""{"type":"record","name":"r","fields":[
                  |{"name":"f","type":${nest(40)}}]}""".stripMargin
    // hand-frame a minimal OCF header carrying the bomb schema and one
    // empty block so both readers reach the schema parse
    val out = new java.io.ByteArrayOutputStream
    out.write(AvroOcf.Magic)
    def vlong(v: Long): Unit = {
      var n = (v << 1) ^ (v >> 63)
      while ((n & ~0x7fL) != 0L) { out.write(((n & 0x7f) | 0x80).toInt); n >>>= 7 }
      out.write(n.toInt)
    }
    def metaPair(k: String, v: String): Unit = {
      vlong(k.getBytes("UTF-8").length.toLong); out.write(k.getBytes("UTF-8"))
      vlong(v.getBytes("UTF-8").length.toLong); out.write(v.getBytes("UTF-8"))
    }
    vlong(2L); metaPair("avro.schema", deep); metaPair("avro.codec", "null")
    vlong(0L)
    out.write(AvroOcf.Sync)
    val blob = out.toByteArray
    def deepStruct(d: Int): DataType =
      if (d == 0) LongType
      else StructType(Seq(StructField("f", deepStruct(d - 1))))
    val target = StructType(Seq(StructField("f", deepStruct(40))))
    assert(AvroOcf.rows(blob, target) == null)
    assert(AvroOcf.rowsResolved(blob, target) == null)
  }

  test("writer arrays (iceberg bounds kv shape): ours->java and java->ours") {
    // the spec's lower_bounds/upper_bounds layout: array of key/value
    // records, int field id + single-value-serialized bytes
    val kv = StructType(Seq(
      StructField("key", IntegerType, nullable = false),
      StructField("value", BinaryType, nullable = false)))
    val sch = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("lower_bounds", ArrayType(kv, containsNull = false),
        nullable = false)))
    def kvRow(k: Int, v: Array[Byte]) =
      new GenericInternalRow(Array[Any](k, v))
    val blob = AvroOcf.file(new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](UTF8String.fromString("f0"),
        new GenericArrayData(Array[Any](
          kvRow(1, Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)),
          kvRow(2, Array[Byte](-1, -1, -1, -1, -1, -1, -1, 127)))))),
      new GenericInternalRow(Array[Any](UTF8String.fromString("f1"),
        new GenericArrayData(Array.empty[Any]))))), sch, "null")
    // ours -> java: the independent decoder must see both arrays exactly
    val rdr = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(blob),
      new GenericDatumReader[GenericRecord]())
    val r0 = rdr.next()
    val arr0 = r0.get("lower_bounds")
      .asInstanceOf[java.util.List[GenericRecord]]
    assert(r0.get("path").toString == "f0" && arr0.size == 2)
    assert(arr0.get(0).get("key") == 1 && arr0.get(1).get("key") == 2)
    assert(arr0.get(0).get("value").asInstanceOf[java.nio.ByteBuffer]
      .remaining == 8)
    val r1 = rdr.next()
    assert(r1.get("path").toString == "f1" &&
      r1.get("lower_bounds").asInstanceOf[java.util.List[_]].isEmpty)
    assert(!rdr.hasNext)
    rdr.close()
    // java -> ours: the java library re-writes the same records with
    // its OWN sync + framing; rowsResolved must decode them back
    val js = new org.apache.avro.Schema.Parser().parse(
      AvroOcf.schemaJson(sch))
    val baos = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](js))
    w.create(js, baos)
    w.append(r0); w.append(r1)
    w.close()
    val got = AvroOcf.rowsResolved(baos.toByteArray, sch)
    assert(got != null && got.numElements() == 2)
    val g0 = got.getStruct(0, 2)
    assert(g0.getUTF8String(0).toString == "f0")
    val ga = g0.getArray(1)
    assert(ga.numElements() == 2)
    assert(ga.getStruct(0, 2).getInt(0) == 1 &&
      ga.getStruct(1, 2).getInt(0) == 2)
    assert(ga.getStruct(1, 2).getBinary(1).toSeq ==
      Seq[Byte](-1, -1, -1, -1, -1, -1, -1, 127))
    assert(got.getStruct(1, 2).getArray(1).numElements() == 0)
    // a null array element refuses loudly at write time (no unions)
    intercept[IllegalArgumentException] {
      AvroOcf.file(new GenericArrayData(Array[Any](
        new GenericInternalRow(Array[Any](UTF8String.fromString("f2"),
          new GenericArrayData(Array[Any](null)))))), sch, "null")
    }
  }
}

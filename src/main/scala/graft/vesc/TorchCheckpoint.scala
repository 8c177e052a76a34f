package graft.vesc

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipFile

import scala.collection.mutable

/** Pure-JVM reader for a PyTorch `.pt` checkpoint (the reference's
  * `best_model.pt`, loaded at application/app.py:83) — removes the last
  * Python dependency from the scoring path: `CnnScorer.loadCheckpoint`
  * now ingests the reference artifact directly, with
  * `tools/export_weights.py` kept only as the independent oracle that
  * produced the golden parquet the spec compares against.
  *
  * A `.pt` file is a ZIP archive: `<name>/data.pkl` is a pickled
  * state_dict whose tensors reference raw little-endian storage blobs at
  * `<name>/data/<key>`. The pickle stream uses a small, fixed opcode
  * vocabulary (protocol 2; torch's DEFAULT_PROTOCOL) — this is a
  * minimal stack-machine for exactly that subset, not a general
  * unpickler: any GLOBAL outside the four torch.save emits for a
  * state_dict (`collections.OrderedDict`, `torch._utils
  * ._rebuild_tensor_v2`, `torch.<T>Storage`) fails loudly, so the
  * reader cannot be steered into instantiating arbitrary classes —
  * the same allow-list stance as the Python exporter's `find_class`.
  *
  * Driver-side I/O by design: the checkpoint is a few hundred KB read
  * once per session and broadcast; there is nothing to distribute.
  */
object TorchCheckpoint {

  // ---- pickle value model ----
  private final case class Global(module: String, name: String)
  private final case class StorageRef(dtype: String, key: String, numel: Long)
  private final case class TensorStub(storage: StorageRef, offset: Long,
                                      size: Seq[Int], stride: Seq[Int])
  private final class Mark // stack sentinel

  /** Element width in bytes per torch storage class. */
  private val DtypeBytes: Map[String, Int] = Map(
    "FloatStorage" -> 4, "DoubleStorage" -> 8, "LongStorage" -> 8,
    "IntStorage" -> 4, "HalfStorage" -> 2, "ByteStorage" -> 1,
    "BoolStorage" -> 1)

  private val AllowedGlobals = Set(
    ("collections", "OrderedDict"),
    ("torch._utils", "_rebuild_tensor_v2")) ++
    DtypeBytes.keySet.map(("torch", _))

  /** Read the checkpoint's state_dict as `name -> (shape, float32 data)`,
    * insertion-ordered, with `num_batches_tracked` counters dropped and
    * every kept tensor materialized contiguous (row-major over its
    * (size, stride) view) and cast to Float — the exact contract of the
    * neutral parquet weight table (tools/export_weights.py:70-80).
    */
  def stateDict(path: String): Map[String, (Seq[Int], Array[Float])] = {
    val zf = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toVector
      val pklName = names.find(_.endsWith("data.pkl")).getOrElse(
        sys.error(s"$path: no data.pkl in archive — not a torch zip checkpoint"))
      val prefix = pklName.stripSuffix("data.pkl")
      // new-format checkpoints record byte order; storages are LE floats
      names.find(_ == prefix + "byteorder").foreach { n =>
        val bo = new String(readEntry(zf, n), StandardCharsets.US_ASCII).trim
        require(bo == "little", s"$path: unsupported byteorder '$bo'")
      }
      val dict = unpickle(readEntry(zf, pklName)) match {
        case m: mutable.LinkedHashMap[_, _] => m
        case other => sys.error(s"$path: state_dict root is ${other.getClass}")
      }
      val storageCache = mutable.Map.empty[String, Array[Float]]
      val out = mutable.LinkedHashMap.empty[String, (Seq[Int], Array[Float])]
      dict.foreach {
        case (name: String, t: TensorStub) if !name.contains("num_batches_tracked") =>
          val flat = storageCache.getOrElseUpdate(t.storage.key,
            decodeStorage(readEntry(zf, s"${prefix}data/${t.storage.key}"),
              t.storage.dtype))
          out(name) = (if (t.size.isEmpty) Seq(1) else t.size,
            materialize(flat, t.offset, t.size, t.stride))
        case _ => () // counters and non-tensor entries
      }
      out.toMap
    } finally zf.close()
  }

  private def readEntry(zf: ZipFile, name: String): Array[Byte] = {
    val e = zf.getEntry(name)
    require(e != null, s"missing zip entry $name")
    val in = zf.getInputStream(e)
    try in.readAllBytes() finally in.close()
  }

  /** Raw little-endian storage blob → Float array (the weight table is
    * float32; wider types narrow exactly like the exporter's
    * `astype(np.float32)`).
    */
  private def decodeStorage(raw: Array[Byte], dtype: String): Array[Float] = {
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    dtype match {
      case "FloatStorage" =>
        val out = new Array[Float](raw.length / 4)
        bb.asFloatBuffer().get(out); out
      case "DoubleStorage" =>
        Array.tabulate(raw.length / 8)(i => bb.getDouble(i * 8).toFloat)
      case "LongStorage" =>
        Array.tabulate(raw.length / 8)(i => bb.getLong(i * 8).toFloat)
      case "IntStorage" =>
        Array.tabulate(raw.length / 4)(i => bb.getInt(i * 4).toFloat)
      case "HalfStorage" =>
        Array.tabulate(raw.length / 2)(i => halfToFloat(bb.getShort(i * 2)))
      case "ByteStorage" => raw.map(b => (b & 0xff).toFloat)
      case "BoolStorage" => raw.map(b => if (b == 0) 0f else 1f)
      case other => sys.error(s"unsupported storage type $other")
    }
  }

  /** IEEE 754 binary16 → binary32 (JDK 17 lacks Float.float16ToFloat). */
  private def halfToFloat(h: Short): Float = {
    val sign = (h >> 15) & 1
    val exp = (h >> 10) & 0x1f
    val frac = h & 0x3ff
    val bits =
      if (exp == 0x1f) (sign << 31) | 0x7f800000 | (frac << 13) // inf/nan
      else if (exp != 0) (sign << 31) | ((exp + 112) << 23) | (frac << 13)
      else if (frac == 0) sign << 31 // signed zero
      else { // subnormal: renormalize
        var e = -1; var f = frac
        while ((f & 0x400) == 0) { f <<= 1; e += 1 }
        (sign << 31) | ((113 - e - 1) << 23) | ((f & 0x3ff) << 13)
      }
    java.lang.Float.intBitsToFloat(bits)
  }

  /** Contiguous row-major copy of the (offset, size, stride) view —
    * numpy's `ascontiguousarray(as_strided(...))` in element units.
    */
  private def materialize(flat: Array[Float], offset: Long,
                          size: Seq[Int], stride: Seq[Int]): Array[Float] = {
    if (size.isEmpty) return Array(flat(offset.toInt))
    require(size.length == stride.length, s"size $size vs stride $stride")
    val total = size.product
    val out = new Array[Float](total)
    val idx = new Array[Int](size.length)
    var i = 0
    while (i < total) {
      var src = offset
      var d = 0
      while (d < size.length) { src += idx(d).toLong * stride(d); d += 1 }
      out(i) = flat(src.toInt)
      // odometer increment, last dimension fastest (row-major)
      d = size.length - 1
      var carry = true
      while (carry && d >= 0) {
        idx(d) += 1
        if (idx(d) == size(d)) { idx(d) = 0; d -= 1 } else carry = false
      }
      i += 1
    }
    out
  }

  // ---- the pickle stack machine (protocol-2 subset torch emits) ----

  private def unpickle(data: Array[Byte]): Any = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[Any]
    val memo = mutable.Map.empty[Int, Any]

    def push(v: Any): Unit = stack += v
    def pop(): Any = { val v = stack.last; stack.dropRightInPlace(1); v }
    def popToMark(): Vector[Any] = {
      val at = stack.lastIndexWhere(_.isInstanceOf[Mark])
      require(at >= 0, "pickle: no MARK on stack")
      val items = stack.slice(at + 1, stack.length).toVector
      stack.dropRightInPlace(stack.length - at)
      items
    }
    def readLine(): String = {
      val sb = new StringBuilder
      var b = bb.get()
      while (b != '\n') { sb.append(b.toChar); b = bb.get() }
      sb.toString
    }
    def readBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); bb.get(a); a
    }

    def reduce(callable: Any, args: Vector[Any]): Any = callable match {
      case Global("collections", "OrderedDict") =>
        mutable.LinkedHashMap.empty[Any, Any]
      case Global("torch._utils", "_rebuild_tensor_v2") =>
        // (storage, storage_offset, size, stride, requires_grad, hooks, ...)
        val Vector(s: StorageRef, off, size: Vector[_], stride: Vector[_], _*) = args: @unchecked
        TensorStub(s, anyToLong(off),
          size.map(anyToLong(_).toInt), stride.map(anyToLong(_).toInt))
      case other => sys.error(s"pickle: blocked callable $other")
    }

    var done = false
    while (!done) {
      val op = bb.get() & 0xff
      op match {
        case 0x80 => bb.get() // PROTO <ver>
        case 0x2e => done = true // STOP
        case 0x28 => push(new Mark) // MARK
        case 0x4e => push(null) // NONE
        case 0x88 => push(true) // NEWTRUE
        case 0x89 => push(false) // NEWFALSE
        case 0x4a => push(bb.getInt().toLong) // BININT
        case 0x4b => push((bb.get() & 0xff).toLong) // BININT1
        case 0x4d => push((bb.getShort() & 0xffff).toLong) // BININT2
        case 0x8a => // LONG1: n bytes little-endian signed
          val n = bb.get() & 0xff
          val bytes = readBytes(n)
          var v = 0L
          var i = n - 1
          while (i >= 0) { v = (v << 8) | (bytes(i) & 0xffL); i -= 1 }
          if (n > 0 && n < 8 && (bytes(n - 1) & 0x80) != 0) v -= (1L << (8 * n))
          push(v)
        case 0x47 => // BINFLOAT: big-endian double
          push(ByteBuffer.wrap(readBytes(8)).order(ByteOrder.BIG_ENDIAN).getDouble())
        case 0x58 => // BINUNICODE: le32 len + utf8
          push(new String(readBytes(bb.getInt()), StandardCharsets.UTF_8))
        case 0x8c => // SHORT_BINUNICODE (protocol 4)
          push(new String(readBytes(bb.get() & 0xff), StandardCharsets.UTF_8))
        case 0x63 => // GLOBAL: module\nname\n — allow-listed only
          val g = Global(readLine(), readLine())
          require(AllowedGlobals.contains((g.module, g.name)),
            s"pickle: blocked global ${g.module}.${g.name}")
          push(g)
        case 0x71 => memo(bb.get() & 0xff) = stack.last // BINPUT
        case 0x72 => memo(bb.getInt()) = stack.last // LONG_BINPUT
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE (protocol 4)
        case 0x68 => push(memo(bb.get() & 0xff)) // BINGET
        case 0x6a => push(memo(bb.getInt())) // LONG_BINGET
        case 0x29 => push(Vector.empty[Any]) // EMPTY_TUPLE
        case 0x85 => push(Vector(pop())) // TUPLE1
        case 0x86 => { val b2 = pop(); val a = pop(); push(Vector(a, b2)) } // TUPLE2
        case 0x87 => { val c = pop(); val b2 = pop(); val a = pop(); push(Vector(a, b2, c)) } // TUPLE3
        case 0x74 => push(popToMark()) // TUPLE
        case 0x7d => push(mutable.LinkedHashMap.empty[Any, Any]) // EMPTY_DICT
        case 0x5d => push(mutable.ArrayBuffer.empty[Any]) // EMPTY_LIST
        case 0x73 => // SETITEM
          val v = pop(); val k = pop()
          stack.last.asInstanceOf[mutable.Map[Any, Any]](k) = v
        case 0x75 => // SETITEMS: mark-delimited k,v pairs
          val items = popToMark()
          val m = stack.last.asInstanceOf[mutable.Map[Any, Any]]
          items.grouped(2).foreach { case Vector(k, v) => m(k) = v }
        case 0x61 => // APPEND
          val v = pop()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v
        case 0x65 => // APPENDS
          val items = popToMark()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items
        case 0x52 => { val args = pop().asInstanceOf[Vector[Any]]; push(reduce(pop(), args)) } // REDUCE
        case 0x62 => pop() // BUILD: drop state (OrderedDict._metadata), keep object
        case 0x51 => // BINPERSID: ('storage', <StorageClass>, key, location, numel)
          pop() match {
            case Vector("storage", Global("torch", st), key: String, _, numel) =>
              push(StorageRef(st, key, anyToLong(numel)))
            case other => sys.error(s"pickle: unsupported persistent id $other")
          }
        case other =>
          sys.error(f"pickle: unsupported opcode 0x$other%02x at ${bb.position() - 1}")
      }
    }
    stack.last
  }

  private def anyToLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => sys.error(s"expected integer, got $other")
  }
}

// Fixture generator for the snappy query registry — lives in tools/
// (not on the library classpath) and runs via:
//   scala -cp /opt/spark/jars/'*' tools/GenSnappyFixtures.scala
// or paste into an sbt console. The INDEPENDENT encoder is snappy-java
// (xerial) from Spark's own jars; outputs land in
// src/test/resources/snappy_fixtures/ as .sn / .raw pairs, with the
// hex + (len, md5) pins printed for the WebQueries registry.
object GenSnappyFixtures {
  def lcg(seed: Long, n: Int): Array[Byte] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L +
      1442695040888963407L).drop(1).map(s => ((s >>> 33) & 0xff).toByte)
      .take(n).toArray

  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File("src/test/resources/snappy_fixtures")
    outDir.mkdirs()
    val phrase = ("jackdaws love my big sphinx of quartz 0123456789 " * 8)
      .getBytes("UTF-8")
    val cases: Seq[(String, Array[Byte], Boolean)] = Seq(
      ("raw_phrase", phrase, false),
      ("raw_rand2k", lcg(11, 2048), false),
      ("framed_phrase", phrase, true),
      ("framed_rand2k", lcg(12, 2048), true),
      ("framed_empty", Array.empty[Byte], true))
    for ((name, raw, framed) <- cases) {
      val blob =
        if (!framed) org.xerial.snappy.Snappy.compress(raw)
        else {
          val bos = new java.io.ByteArrayOutputStream()
          val f = new org.xerial.snappy.SnappyFramedOutputStream(bos)
          f.write(raw); f.close(); bos.toByteArray
        }
      java.nio.file.Files.write(new java.io.File(outDir, name + ".sn").toPath, blob)
      java.nio.file.Files.write(new java.io.File(outDir, name + ".raw").toPath, raw)
      val md = java.security.MessageDigest.getInstance("MD5").digest(raw)
        .map("%02x".format(_)).mkString
      println(s"$name ${raw.length} -> ${blob.length} md5 $md")
      println(blob.map("%02X".format(_)).mkString)
    }
  }
}

package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR, forcing full evaluation through the noop sink
  * (a bare count() lets Catalyst prune the projections being measured).
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and reports
  * the per-query MEDIAN — single runs on a shared VM have shown 10-20×
  * wall-clock spikes, so n=1 numbers are meaningless. A query that throws
  * is recorded as -1 with its error listed under "errors" (never silently
  * counted as ~0 s). The one-line JSON goes to stdout AND to
  * $SPARK_GRAFT_BENCH_OUT (default bench_latest.json) so a parser that
  * can't find the stdout line among sbt noise can read the file.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 5 interleaved passes by default: this VM stalls for minutes at a
    // stretch, and a median needs ⌈runs/2⌉ clean samples per query to
    // survive a stall stripe — 3 passes leave no margin for two stalls
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: touch every table once so first-query numbers measure the
    // query, not parquet footer reads + codegen classloading.
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }

    val wanted = args.toSet
    // v_* are fixed-size fixture-correctness queries (ride-101 golden
    // parity) — they don't scale with sf and would only add constant noise
    // to the throughput headline, so the default set excludes them.
    val selected =
      if (wanted.isEmpty)
        SparkEntry.queries.toSeq.filterNot(_._1.startsWith("v_")).sortBy(_._1)
      else SparkEntry.queries.filter(kv => wanted.contains(kv._1)).toSeq.sortBy(_._1)

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // Untimed warm-up pass: the FIRST execution of a complex plan in a
    // fresh JVM pays Janino codegen + C2 JIT + parquet reader init —
    // measured 7-36 s on this VM for a plan that then runs in ~1 s. Paying
    // it once per query outside the timed window makes the medians measure
    // the plan, not the JVM.
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // INTERLEAVED passes: whole query set per pass, median per query ACROSS
    // passes. This VM stalls for minutes at a time; with back-to-back runs
    // one stall poisons all `runs` samples of a query and the median lies.
    // Interleaved, a stall inflates a stripe of different queries in ONE
    // pass each, and per-query medians stay clean.
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to runs).foreach { _ =>
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              errors.getOrElseUpdate(name,
                (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(200))
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop per-query persisted intermediates (dedup band tables etc.) so
        // cached blocks from earlier queries can't GC-pressure later ones
        spark.catalog.clearCache()
        if (ok) samples(name) = dt :: samples(name)
      }
    }
    // Streaming throughput row: the stateful watermark-expiring resampler
    // over a memory source — rows/s plus the MEASURED state ceiling across
    // watermark cycles (bounded-state evidence in the artifact itself).
    // Single run: processAllAvailable barriers make it stall-insensitive
    // relative to its length, and the median machinery above is per-query.
    val streaming: Option[graft.streaming.StreamBench.Result] =
      if (wanted.isEmpty || wanted.contains("streaming_resample"))
        try Some(graft.streaming.StreamBench.run(spark))
        catch {
          case e: Throwable =>
            errors.getOrElseUpdate("streaming_resample",
              (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(200))
            None
        }
      else None

    // Second streaming row: the LSH band-registry near-dup stream —
    // docs/s plus the measured band-key state ceiling vs the analytic
    // bound (bounded-state evidence for the dedup-at-ingest path).
    val neardup: Option[graft.streaming.NearDupBench.Result] =
      if (wanted.isEmpty || wanted.contains("streaming_neardup"))
        try Some(graft.streaming.NearDupBench.run(spark))
        catch {
          case e: Throwable =>
            errors.getOrElseUpdate("streaming_neardup",
              (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(200))
            None
        }
      else None

    val results = selected.map { case (name, _) =>
      val times = samples(name)
      name -> (if (times.isEmpty) -1.0 else median(times))
    } ++ streaming.map(r => "streaming_resample" -> r.seconds) ++
      neardup.map(r => "streaming_neardup" -> r.seconds)
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val streamJson = streaming.map(r =>
      s""","streaming":{"input_rows":${r.inputRows},"output_rows":${r.outputRows},""" +
        s""""rows_per_sec":${math.round(r.rowsPerSec)},"max_state_rows":${r.maxStateRows},""" +
        s""""active_ride_bound":${r.activeRideBound},"watermark_cycles":${r.watermarkCycles},""" +
        s""""state_bounded":${r.maxStateRows <= r.activeRideBound}}""").getOrElse("") +
      neardup.map(r =>
        s""","streaming_neardup":{"input_docs":${r.inputDocs},"band_rows":${r.bandRows},""" +
          s""""docs_per_sec":${math.round(r.docsPerSec)},"max_state_rows":${r.maxStateRows},""" +
          s""""band_key_bound":${r.bandKeyBound},"horizon_cycles":${r.horizonCycles},""" +
          s""""state_bounded":${r.maxStateRows <= r.bandKeyBound}}""").getOrElse("")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"queries":$qs,"errors":$errJson$streamJson,"sf":${jstr(sfDir)}}"""
    try Files.write(Paths.get(outPath), (line + "\n").getBytes(StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"bench: could not write $outPath: $e") }
    // stdout gets ONLY the compact one-liner. Round 14 showed the
    // harness's stdout capture is byte-capped: the ~12 KB full line
    // flooded the cap and the driver artifact shipped an unparseable
    // mid-line tail two rounds running. With the full map going to
    // `outPath` alone, total stdout stays under ~2 KB and the last
    // line always parses standalone (aggregate, error count, slowest
    // queries at 3 dp, streaming soundness flags, an md5 of the full
    // line for artifact cross-checking, pointer to the full file).
    val slow = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(12)
      .map { case (k, v) => jstr(k) + ":" + (math.floor(v * 1000) / 1000) }
      .mkString("{", ",", "}")
    val fullMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(line.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val compact =
      s"""{"metric":"total","value":${math.floor(total * 1000) / 1000},""" +
        s""""unit":"sec","runs_per_query":$runs,"n_queries":${results.size},""" +
        s""""n_errors":${errors.size},"queries":$slow""" +
        streaming.map(r => s""","streaming_state_bounded":${r.maxStateRows <= r.activeRideBound}""").getOrElse("") +
        neardup.map(r => s""","neardup_state_bounded":${r.maxStateRows <= r.bandKeyBound}""").getOrElse("") +
        s""","full":${jstr(outPath)},"full_md5":${jstr(fullMd5)},"sf":${jstr(sfDir)}}"""
    println(compact)
    spark.stop()
  }
}

package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR, forcing full evaluation through the noop sink
  * (a bare count() lets Catalyst prune the projections being measured).
  *
  * Each query runs up to `SPARK_GRAFT_BENCH_RUNS` times (default 5) and
  * reports the per-query MEDIAN — single runs on a shared VM have shown
  * 10-20× wall-clock spikes, so n=1 numbers are meaningless. A query that
  * throws is recorded as -1 with its error listed under "errors" (never
  * silently counted as ~0 s).
  *
  * CRASH/TIMEOUT SAFETY (the r13-r15 lesson — three driver artifacts in a
  * row were unusable, first from a stdout flood, then from a wall-clock
  * kill mid-suite):
  *  - the full JSON line is re-written ATOMICALLY to $SPARK_GRAFT_BENCH_OUT
  *    after EVERY query execution, so a kill at any instant leaves a
  *    parseable artifact covering everything measured so far;
  *  - a JVM shutdown hook flushes once more AND prints the compact stdout
  *    line, so even a SIGTERM'd run emits both artifacts;
  *  - a wall budget ($SPARK_GRAFT_BENCH_BUDGET_S, default 2400 s) degrades
  *    the pass count gracefully (5→4→…→1) instead of letting the external
  *    timeout kill the run mid-pass: pass 1 always completes (every query
  *    gets ≥1 timed sample), and a further pass starts only if the
  *    previous pass's duration fits in the remaining budget.
  *
  * stdout gets ONLY a compact one-liner (aggregate, error count, slowest
  * queries, state-soundness flags, md5 of the full line): round 14 showed
  * the harness's stdout capture is byte-capped and the ~12 KB full map
  * flooded it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val wallStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - wallStart) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 5 interleaved passes by default: this VM stalls for minutes at a
    // stretch, and a median needs ⌈runs/2⌉ clean samples per query to
    // survive a stall stripe — 3 passes leave no margin for two stalls
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    // Wall budget. The r15 driver gate killed the suite at rc=124: 318
    // entries × (warmup + 5 passes) outgrew the external wall limit. 2400 s
    // sits comfortably inside the observed driver budget while still
    // fitting warmup + ≥3 full passes on a quiet box.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "2400").toDouble
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
    // JSON string escape incl. control characters: error messages carry
    // newlines (multi-line Spark exceptions) and a raw \n inside a JSON
    // string makes the whole artifact unparseable — exactly the failure
    // this rewrite exists to prevent.
    def jstr(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case c if c < ' ' => sb.append("\\u%04x".format(c.toInt))
        case c => sb.append(c)
      }
      sb.append('"').toString
    }

    // ---- shared mutable state read by the flusher / shutdown hook ----
    @volatile var shuttingDown = false
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val errorOrder = scala.collection.mutable.ArrayBuffer.empty[String]
    def recordError(name: String, e: Throwable): Unit = if (!shuttingDown) {
      // During JVM shutdown Spark's own hook stops the context under the
      // in-flight query; that query's "stopped SparkContext" failure is an
      // artifact of the kill, not a bench error — don't record it.
      val msg = (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(200)
      if (errors.putIfAbsent(name, msg) == null) errorOrder.synchronized { errorOrder += name }
    }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    @volatile var streaming: Option[graft.streaming.StreamBench.Result] = None
    @volatile var neardup: Option[graft.streaming.NearDupBench.Result] = None
    @volatile var passesCompleted = 0
    @volatile var budgetHit = false

    /** Render the full JSON line from current state. Thread-safe enough for
      * the shutdown-hook reader: worst case it sees a pass count one behind
      * the sample map, which only makes the artifact slightly conservative.
      */
    def renderFull(): String = {
      val results = samples.synchronized {
        selected.map { case (name, _) =>
          val times = samples(name)
          name -> (if (times.isEmpty) -1.0 else median(times))
        }
      } ++ streaming.map(r => "streaming_resample" -> r.seconds) ++
        neardup.map(r => "streaming_neardup" -> r.seconds)
      val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
      val errJson = errorOrder.synchronized {
        errorOrder.map(k => jstr(k) + ":" + jstr(errors.get(k))).mkString("{", ",", "}")
      }
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
      s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,""" +
        s""""passes_completed":$passesCompleted,"budget_s":$budgetS,"budget_hit":$budgetHit,""" +
        s""""wall_s":${math.floor(elapsedS * 10) / 10},""" +
        s""""queries":$qs,"errors":$errJson$streamJson,"sf":${jstr(sfDir)}}"""
    }

    /** Atomic flush: write to a sibling tmp file, then ATOMIC_MOVE over the
      * target, so a kill mid-write can never leave a torn half-line.
      */
    def flush(): Unit = {
      val line = renderFull()
      try {
        val target = Paths.get(outPath)
        val tmp = Paths.get(outPath + ".tmp")
        Files.write(tmp, (line + "\n").getBytes(StandardCharsets.UTF_8))
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        catch { case _: Throwable =>
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
        }
      } catch { case e: Throwable =>
        System.err.println(s"bench: could not write $outPath: $e")
      }
    }

    def renderCompact(): String = {
      val line = renderFull()
      val results = samples.synchronized {
        selected.map { case (name, _) =>
          val times = samples(name)
          name -> (if (times.isEmpty) -1.0 else median(times))
        }
      } ++ streaming.map(r => "streaming_resample" -> r.seconds) ++
        neardup.map(r => "streaming_neardup" -> r.seconds)
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      val slow = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
        .map { case (k, v) => jstr(k) + ":" + (math.floor(v * 1000) / 1000) }
        .mkString("{", ",", "}")
      val fullMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(line.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      s"""{"metric":"total","value":${math.floor(total * 1000) / 1000},""" +
        s""""unit":"sec","runs_per_query":$runs,"passes_completed":$passesCompleted,""" +
        s""""budget_hit":$budgetHit,"n_queries":${results.size},""" +
        s""""n_errors":${errors.size},"queries":$slow""" +
        streaming.map(r => s""","streaming_state_bounded":${r.maxStateRows <= r.activeRideBound}""").getOrElse("") +
        neardup.map(r => s""","neardup_state_bounded":${r.maxStateRows <= r.bandKeyBound}""").getOrElse("") +
        s""","full":${jstr(outPath)},"full_md5":${jstr(fullMd5)},"sf":${jstr(sfDir)}}"""
    }

    // Printed exactly once — by the shutdown hook on SIGTERM, or at the end
    // of a normal run (the hook no-ops after the normal-path print).
    val printed = new AtomicBoolean(false)
    def printCompactOnce(): Unit =
      if (printed.compareAndSet(false, true)) println(renderCompact())
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      shuttingDown = true
      flush()
      printCompactOnce()
      System.out.flush()
    }, "bench-flush"))

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

    // Streaming rows run BEFORE the timed passes so they land in the
    // artifact even when the budget (or an external kill) truncates the
    // pass loop. Single run each: processAllAvailable barriers make them
    // stall-insensitive relative to their length.
    //  - streaming_resample: stateful watermark-expiring resampler over a
    //    memory source — rows/s + the MEASURED state ceiling across
    //    watermark cycles (bounded-state evidence in the artifact itself).
    //  - streaming_neardup: the LSH band-registry near-dup stream — docs/s
    //    + band-key state ceiling vs the analytic bound.
    if (wanted.isEmpty || wanted.contains("streaming_resample")) {
      try streaming = Some(graft.streaming.StreamBench.run(spark))
      catch { case e: Throwable => recordError("streaming_resample", e) }
      flush()
    }
    if (wanted.isEmpty || wanted.contains("streaming_neardup")) {
      try neardup = Some(graft.streaming.NearDupBench.run(spark))
      catch { case e: Throwable => recordError("streaming_neardup", e) }
      flush()
    }

    // INTERLEAVED passes: whole query set per pass, median per query ACROSS
    // passes. This VM stalls for minutes at a time; with back-to-back runs
    // one stall poisons all `runs` samples of a query and the median lies.
    // Interleaved, a stall inflates a stripe of different queries in ONE
    // pass each, and per-query medians stay clean.
    //
    // Budget discipline: pass 1 ALWAYS completes (every query needs ≥1
    // timed sample for a non-(-1) median); pass p≥2 starts only if the
    // previous pass's wall time fits in what remains of the budget. That
    // degrades 5→4→…→1 passes instead of dying mid-suite.
    var pass = 1
    var lastPassS = 0.0
    var continue = true
    while (continue && pass <= runs) {
      val passStart = System.nanoTime()
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => recordError(name, e); false }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop per-query persisted intermediates (dedup band tables etc.) so
        // cached blocks from earlier queries can't GC-pressure later ones
        spark.catalog.clearCache()
        if (ok) samples.synchronized { samples(name) = dt :: samples(name) }
        flush()
      }
      lastPassS = (System.nanoTime() - passStart) / 1e9
      passesCompleted = pass
      flush()
      pass += 1
      // A further pass must fit: remaining budget ≥ last pass × 1.1 margin.
      if (pass <= runs && elapsedS + lastPassS * 1.1 > budgetS) {
        budgetHit = true
        continue = false
      }
    }
    flush()
    printCompactOnce()
    spark.stop()
  }
}

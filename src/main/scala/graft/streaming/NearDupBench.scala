package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming near-dup throughput micro-bench: drives
  * [[StreamingPipeline.nearDupStream]] through generations of documents
  * whose event times advance past the retention horizon, so the band-key
  * registry exercises its full lifecycle — register, match duplicates
  * across micro-batches, expire on horizon — and the state ceiling is
  * MEASURED against the analytic bound (4 bands × distinct texts in the
  * ≤2 generations the watermark keeps live), not assumed. Every 10th
  * document repeats an earlier text so the duplicate path does real work.
  */
object NearDupBench {

  final case class Result(inputDocs: Long, bandRows: Long, seconds: Double,
                          docsPerSec: Double, maxStateRows: Long,
                          bandKeyBound: Long, horizonCycles: Int)

  def run(spark: SparkSession, docsPerGen: Int = 4000, gens: Int = 4): Result = {
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val maxState = new java.util.concurrent.atomic.AtomicLong(0L)
    val bandRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        e.progress.stateOperators.foreach(so =>
          maxState.getAndAccumulate(so.numRowsTotal, math.max _))
        if (e.progress.sink.numOutputRows > 0)
          bandRows.addAndGet(e.progress.sink.numOutputRows)
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val query = StreamingPipeline
      .nearDupStream(input.toDF().toDF("doc_id", "ts", "text"),
        "ts", "doc_id", "text", watermark = "2 seconds", retainMs = 2000L)
      .writeStream.format("noop")
      .outputMode(OutputMode.Append())
      .start()

    // ~40-token synthetic docs; every 10th repeats base text (i - i%10) so
    // each batch carries real duplicate hits, and the +gen salt keeps
    // generations textually disjoint (their bands must re-register, not
    // match across an expired horizon)
    def text(g: Int, i: Int): String = {
      val base = if (i % 10 == 9) i - (i % 10) else i
      (0 until 40).map(t => s"w${(base * 31 + t * 7) % 4096}_g$g").mkString(" ")
    }

    val baseMs = 1700000000000L
    var inputDocs = 0L
    val t0 = System.nanoTime()
    var seconds = 0.0
    try {
      (0 until gens).foreach { g =>
        val genStart = baseMs + g * 60000L
        val rows = (0 until docsPerGen).map { i =>
          ((g.toLong * docsPerGen + i),
            new java.sql.Timestamp(genStart + i), text(g, i))
        }
        input.addData(rows)
        inputDocs += rows.size
        query.processAllAvailable()
      }
      seconds = (System.nanoTime() - t0) / 1e9
    } finally {
      query.stop()
      Thread.sleep(200)
      query.recentProgress.foreach(p => p.stateOperators.foreach(so =>
        maxState.getAndAccumulate(so.numRowsTotal, math.max _)))
      spark.streams.removeListener(listener)
    }

    // distinct texts per generation = docsPerGen·0.9 (every 10th repeats);
    // the watermark keeps ≤ 2 generations of band keys live
    val bound = 2L * 4L * math.ceil(docsPerGen * 0.9).toLong
    Result(inputDocs, bandRows.get(), seconds,
      docsPerSec = inputDocs / math.max(seconds, 1e-9),
      maxStateRows = maxState.get(),
      bandKeyBound = bound,
      horizonCycles = gens - 1)
  }
}

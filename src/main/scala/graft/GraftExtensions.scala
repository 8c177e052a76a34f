package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session-wide installation of the engine's native Catalyst expressions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * After that, `simhash64`, `cosine_sim`, `vec_dot`, `vec_dot_int`,
  * `vec_norm_l2`, and the multimodal header parsers `image_header` /
  * `audio_header` / `video_header` resolve in SQL and `expr()` on every
  * session of the context — no per-session `register` calls. The
  * operator library also self-registers (idempotently) so it works on
  * plain sessions too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft.functions", name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("simhash64", es => SimHash64(es.head, 60)))
    ext.injectFunction(fn("vec_dot", es => DotProduct(es(0), es(1))))
    ext.injectFunction(fn("cosine_sim", es => CosineSim(es(0), es(1))))
    ext.injectFunction(fn("vec_dot_int", es => DotProductInt(es(0), es(1))))
    ext.injectFunction(fn("vec_norm_l2", es => L2Norm(es.head)))
    ext.injectFunction(fn("interp_state", es => InterpState(es.head, es.tail)))
    ext.injectFunction(fn("image_header", es => ImageHeader(es.head)))
    ext.injectFunction(fn("audio_header", es => AudioHeader(es.head)))
    ext.injectFunction(fn("audio_pcm_stats", es => AudioPcmStats(es.head)))
    ext.injectFunction(fn("video_header", es => VideoHeader(es.head)))
    ext.injectFunction(fn("video_frame_sample", es => VideoFrameSample(es(0), es(1))))
    ext.injectFunction(fn("bloom_agg",
      es => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), es(1), es(2), 0, 0)))
    ext.injectFunction(fn("might_contain",
      es => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es(0), es(1))))
    // web-crawl ingestion family
    ext.injectFunction(fn("gzip_member", es => GzipMember(es.head)))
    ext.injectFunction(fn("gunzip_all", es => GunzipAll(es.head)))
    ext.injectFunction(fn("warc_records", es => WarcRecords(es.head)))
    ext.injectFunction(fn("http_body", es => HttpBody(es.head)))
    ext.injectFunction(fn("http_entity", es => HttpEntity(es.head)))
    ext.injectFunction(fn("http_entity_verdict",
      es => HttpEntityVerdict(es.head)))
    ext.injectFunction(fn("http_status", es => HttpStatus(es.head)))
    ext.injectFunction(fn("html_to_text", es => HtmlToText(es.head)))
    ext.injectFunction(fn("html_links", es => HtmlLinks(es.head)))
    ext.injectFunction(fn("robots_rules", es => RobotsRules(es.head)))
    ext.injectFunction(fn("robots_match_len", es => RobotsMatchLen(es(0), es(1))))
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{DedupOps, ImportanceOps, QualityClassifierOps, TextOps, UrlOps, WebOps}

/** Web-crawl ingestion + curation queries — the first mile of a training
  * pipeline (gzip'd WARC segments → records → HTTP → visible text) and
  * the corpus-selection operators that consume it (line-level dedup,
  * DSIR importance weights, registered-domain statistics), plus the
  * bucketed co-located join.
  *
  * The crawl queries are ROUND-TRIP gates: crawl bytes are assembled
  * scan-side from the documents table with byte-exact framing
  * ([[WebOps.buildRecord]]), pushed through the real read stack
  * (inflate → WARC parse → HTTP split → HTML extract), and the oracle
  * replays only the ORIGINAL row arithmetic — so a drift anywhere in
  * compression, framing, header parse, or entity decoding breaks the
  * hash without the oracle ever touching a byte of the container
  * formats.
  */
object WebQueries extends QueryPack {

  /** Deterministic page markup around a document's text: style/script
    * containers with hostile content (a fake close tag in a JS string,
    * `<` comparisons), an HTML comment, and a trailer exercising named,
    * decimal, and hex character references plus NBSP collapse. The
    * extractor must reduce this to
    * `<text> & ABC <tag> café` (single-spaced).
    */
  private def htmlOf(text: Column): Column = concat(
    lit("<html><head><title>Doc</title><style>p{color:red}\nbody{margin:0}</style>"),
    lit("<script type=\"text/javascript\">var s=\"</closetag>\"; if(a<b){a=1}</script></head>\n"),
    lit("<body><!-- boilerplate -->\n<div class=\"main\"><p>"),
    text,
    lit("</p>\n<p>&amp;&nbsp;ABC&#32;&lt;tag&gt;&nbsp;caf&#xE9;</p></div></body></html>"))

  private def docUrl: Column = WebOps.syntheticUrl(col("doc_id"), col("source"))

  /** Page markup with five real outlinks (double-quoted, single-quoted
    * with an entity-encoded `&`, unquoted, relative, absolute-external)
    * plus two NON-links (an `<a>` inside a JS string, a bare fragment).
    * Link targets are closed-form in doc_id so the oracle reconstructs
    * them without parsing anything.
    */
  private def linkHtmlOf(docId: Column, n: Long): Column = concat(
    lit("<html><body><p>intro</p><a href=\"/doc/"),
    pmod(docId * 7 + 1, lit(n)).cast("string"),
    lit("\">a</a>\n<a href='/doc/"),
    pmod(docId * 13 + 2, lit(n)).cast("string"),
    lit("?a=1&amp;b=2'>b</a>\n<a href=/doc/"),
    pmod(docId * 3 + 5, lit(n)).cast("string"),
    lit(" class=x>c</a>\n<a href=\"rel/page\">d</a>\n"),
    lit("<a href=\"https://ext.example.net/x\">e</a>\n"),
    lit("<script>var s = \"<a href=/evil>\";</script>\n<a href=\"#frag\">f</a></body></html>"))

  /** Shared robots.txt fixture: a disallow-all `*` group plus a
    * graftbot group with overlapping prefix rules.
    */
  private val robotsFixture =
    "# synthetic robots fixture\n" +
      "User-agent: *\nDisallow: /\n\n" +
      "User-agent: graftbot\nUser-agent: otherbot\n" +
      "Disallow: /doc/1\nAllow: /doc/12\nDisallow: /doc/3\n" +
      "Crawl-delay: 10\n"

  /** Oracle-side host replay (the host part of [[urlSql]]). */
  private val hostSql =
    "CASE doc_id % 4 WHEN 0 THEN 'news.' || source || '.co.uk' " +
      "WHEN 1 THEN 'www.' || source || '.example.com' " +
      "WHEN 2 THEN source || '.example.org' " +
      "ELSE 'cdn.' || source || '.com.au' END"

  /** documents → WARC records → record-at-time-gzip'd crawl files. */
  private def crawlFiles(s: SparkSession, dir: String, body: Column): DataFrame = {
    WebOps.registerAll(s)
    val recs = Tables.documents(s, dir)
      .select(col("doc_id"),
        WebOps.buildRecord(col("doc_id"), docUrl, body).as("rec"))
    WebOps.buildCrawlFiles(recs, col("doc_id"), col("rec"), perFile = 5)
  }

  /** The oracle-side url replay (kept next to [[WebOps.syntheticUrl]]).
    * Single-line: it is interpolated into stripMargin'd statements, where
    * a line starting with `||` would lose its first pipe.
    */
  private val urlSql =
    "'https://' || CASE doc_id % 4 WHEN 0 THEN 'news.' || source || '.co.uk' " +
      "WHEN 1 THEN 'www.' || source || '.example.com' " +
      "WHEN 2 THEN source || '.example.org' " +
      "ELSE 'cdn.' || source || '.com.au' END || '/doc/' || CAST(doc_id AS VARCHAR)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Crawl-file READ path over raw-text bodies: every framing field of
    // every record — ids, uris, dates, both Content-Lengths, HTTP status,
    // body bytes — certified against the original rows after a real
    // gzip-member + WARC + HTTP round trip.
    "web_warc_extract" -> ((s, dir) => {
      val files = crawlFiles(s, dir, col("text"))
      WebOps.extractRecords(files, col("blob"))
        .select(
          regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("warc_type"), col("target_uri"), col("warc_date"),
          col("content_length"), col("http_status"),
          octet_length(col("body")).cast("long").as("body_bytes"),
          col("body").cast("string").as("body_text"))
        .orderBy(col("doc_id"))
    }),

    // HTML → visible text alone (no container formats): script/style
    // content dropped, comments dropped, tags to separators, character
    // references decoded, whitespace collapsed.
    "web_html_extract" -> ((s, dir) => {
      WebOps.registerAll(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          call_function("html_to_text", htmlOf(col("text"))).as("page_text"))
        .orderBy(col("doc_id"))
    }),

    // The COMPOSED first mile: html-wrapped bodies through gzip → WARC →
    // HTTP → html_to_text; one hash certifies the whole read stack.
    "web_crawl_e2e" -> ((s, dir) => {
      val files = crawlFiles(s, dir, htmlOf(col("text")))
      WebOps.extractPages(files, col("blob"))
        .select(
          regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), col("text").as("page_text"))
        .orderBy(col("doc_id"))
    }),

    // Registered-domain statistics (the PSL group key of crawl curation:
    // domain caps, per-domain quality): host → eTLD+1 over urls that
    // exercise both plain and multi-part public suffixes. The oracle
    // derives each branch's registered domain INDEPENDENTLY (hand-applied
    // PSL semantics), not by replaying the label arithmetic.
    "web_domain_agg" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          UrlOps.registeredDomain(UrlOps.hostOf(docUrl)).as("domain"),
          col("n_chars"), col("lang"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          count_distinct(col("lang")).as("n_langs"))
        .orderBy(col("domain"))
    }),

    // CCNet line-level dedup over synthetic 10-token lines: corpus-wide
    // keep-first per distinct line, documents re-assembled from their
    // surviving lines.
    "dedup_line_level" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val lines = toks.select(col("doc_id"),
        expr("""transform(
                  sequence(0, greatest(CAST(ceil(size(toks)/10.0) AS INT), 1) - 1),
                  i -> array_join(slice(toks, i*10+1, 10), ' '))""").as("lines"))
      DedupOps.lineDedup(lines, "doc_id", col("lines"))
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("text_kept")).as("kept_md5"))
        .orderBy(col("doc_id"))
    }),

    // DSIR importance weights: hashed-unigram target/raw models (target =
    // the English slice), per-doc average log importance ratio.
    "text_dsir_weights" -> ((s, dir) => {
      ImportanceOps.dsirLogRatio(Tables.documents(s, dir), "doc_id", "text",
          isTarget = col("lang") === "en", numBuckets = 128)
        .orderBy(col("doc_id"))
    }),

    // Page-metadata extraction: title / meta description / canonical
    // link / declared lang — the metadata columns a curation pipeline
    // stores NEXT TO the text (html_to_text deliberately drops <title>
    // from corpus text; html_meta is where it goes instead). The title
    // carries an entity and the fields use mixed quoting styles.
    "web_meta_extract" -> ((s, dir) => {
      WebOps.registerAll(s)
      val html = concat(
        lit("<html lang=\""), col("lang"), lit("\"><head>"),
        lit("<!-- <title>not this one</title> -->"),
        lit("<title> Doc &amp; "), col("doc_id").cast("string"),
        lit(" </title><meta name=description content='chars: "),
        col("n_chars").cast("string"),
        lit("'><link rel=\"canonical\" href="), docUrl,
        lit(" /></head><body>x</body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"), call_function("html_meta", html).as("m"))
        .select(col("doc_id"),
          col("m.title").as("title"),
          col("m.meta_description").as("meta_description"),
          col("m.canonical").as("canonical"),
          col("m.lang").as("page_lang"))
        .orderBy(col("doc_id"))
    }),

    // Sitemap ingestion (frontier seeding): per-host urlset XML built
    // from the host's own documents, <loc> entries extracted with a
    // pure codegen'd regexp chain — no custom code on the read side, so
    // the oracle replays the identical extraction semantics from the
    // url arithmetic.
    "web_sitemap_extract" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), UrlOps.hostOf(docUrl).as("host"), docUrl.as("url"))
      val xml = docs.groupBy(col("host"))
        .agg(concat(lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
          array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("url")))),
            e => concat(lit("  <url><loc> "), e.getField("url"),
              lit(" </loc><changefreq>daily</changefreq></url>\n"))), ""),
          lit("</urlset>")).as("xml"))
      xml.select(col("host"),
          explode(expr("regexp_extract_all(xml, '<loc>\\\\s*([^<]+?)\\\\s*</loc>', 1)"))
            .as("loc"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_locs"),
          min(col("loc")).as("first_loc"), max(col("loc")).as("last_loc"))
        .orderBy(col("host"))
    }),

    // WET (conversion-record) read path: the same gzip+WARC stack with
    // the content block AS the text — no HTTP layer. Certifies the
    // non-HTTP branch (null http fields) end to end.
    "web_wet_extract" -> ((s, dir) => {
      WebOps.registerAll(s)
      val recs = Tables.documents(s, dir)
        .select(col("doc_id"),
          WebOps.buildWetRecord(col("doc_id"), docUrl, col("text")).as("rec"))
      val files = WebOps.buildCrawlFiles(recs, col("doc_id"), col("rec"), perFile = 5)
      WebOps.extractWetText(files, col("blob"))
        .select(
          regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // Per-domain cap (the anti-domination sampler: no single registered
    // domain may contribute more than k documents; deterministic by the
    // shared hash order): the bounded-MinK stratified sampler with
    // eTLD+1 strata.
    "web_domain_cap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("domain", UrlOps.registeredDomain(UrlOps.hostOf(docUrl)))
      graft.ops.SamplingOps.stratifiedSample(docs, "domain", "doc_id", "n_chars", k = 5)
        .select(col("domain"), col("doc_id"), col("n_chars"), col("pick"))
        .orderBy(col("domain"), col("pick"))
    }),

    // Mixed-codec segment QUARANTINE (the whole-or-refuse read posture):
    // per synthetic segment — gzip'd WARC, zstd frame, zstd skippable
    // frame, unknown bytes by doc_id%4 — the sniffed codec, the
    // quarantine verdict, and the record count. Newer crawl dumps move
    // to zstd, for which the JVM has no codec: those segments must be
    // DETECTED and counted, never parsed as garbage or silently dropped.
    // The oracle replays codec/verdict/count from the construction rule.
    "web_segment_audit" -> ((s, dir) => {
      WebOps.registerAll(s)
      val docs = Tables.documents(s, dir)
      val rec = WebOps.buildRecord(col("doc_id"),
        WebOps.syntheticUrl(col("doc_id"), col("source")), col("text"))
      val blob = when(col("doc_id") % 4 === 0,
          call_function("gzip_member", rec.cast("binary")))
        .when(col("doc_id") % 4 === 1,
          concat(unhex(lit("28B52FFD")), col("text").cast("binary")))
        .when(col("doc_id") % 4 === 2,
          concat(unhex(lit("502A4D18")), col("text").cast("binary")))
        .otherwise(concat(unhex(lit("00")), col("text").cast("binary")))
      WebOps.segmentAudit(docs.withColumn("blob", blob),
          col("doc_id"), col("blob"))
        .orderBy(col("segment_id"))
    }),

    // Compression-ratio quality signal (MassiveText-family), CERTIFIED:
    // zlib output size is an implementation detail DuckDB cannot
    // replay, so the gated output carries (a) a per-row ROUND-TRIP
    // invariant over the whole table (gunzip(gzip(text)) == text,
    // computed in the same projection — any codec drift breaks the
    // hash) and (b) committed fixture docs whose exact deflate sizes
    // are pinned from an INDEPENDENT zlib (python, recorded in
    // tools/pin_compression_fixtures.py) and replayed by the oracle;
    // table rows mask the engine-specific size columns to null. The
    // full measurement over table docs still runs (it feeds the
    // roundtrip flag and the bench); ordering semantics stay pinned in
    // CorpusOpsSpec.
    "text_compression_ratio" -> ((s, dir) => {
      import s.implicits._
      val fx = graft.ops.TextQualityOps.compressionRatio(
        compressionFixtures.toDF("doc_id", "text"), "doc_id", "text")
      val tbl = graft.ops.TextQualityOps.compressionRatio(
          Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("raw_bytes"),
          lit(null).cast("long").as("deflated_bytes"),
          lit(null).cast("long").as("ratio_milli"),
          col("roundtrip_ok"))
      fx.unionByName(tbl).orderBy(col("doc_id"))
    }),

    // Outlink extraction + resolution (the frontier side of HTML
    // processing): quoted/unquoted/entity-encoded hrefs, links inside
    // script strings and bare fragments excluded, every RFC 3986
    // resolution branch exercised. The oracle reconstructs all five
    // links per page from the closed-form target arithmetic.
    "web_link_extract" -> ((s, dir) => {
      WebOps.registerAll(s)
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      docs
        .select(col("doc_id"), docUrl.as("base_url"),
          call_function("html_links", linkHtmlOf(col("doc_id"), n)).as("ls"))
        .select(col("doc_id"), col("base_url"),
          posexplode(col("ls")).as(Seq("pos", "href")))
        .select(col("doc_id"), col("pos"),
          UrlOps.resolveUrl(col("base_url"), col("href")).as("link"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // PageRank over the EXTRACTED link graph (composition: html →
    // links → edges → 5 integer-exact iterations). The oracle rebuilds
    // the edges from the same closed-form targets and replays every
    // iteration — certifying extraction, resolution, and the rank
    // arithmetic in one hash.
    "web_pagerank" -> ((s, dir) => {
      WebOps.registerAll(s)
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      val edges = docs
        .select(col("doc_id"), docUrl.as("base_url"),
          explode(call_function("html_links", linkHtmlOf(col("doc_id"), n))).as("href"))
        .select(col("doc_id").as("src"),
          regexp_extract(UrlOps.resolveUrl(col("base_url"), col("href")),
            "/doc/(\\d+)", 1).as("dst_s"))
        .filter(col("dst_s") =!= "")
        .select(col("src"), col("dst_s").cast("long").as("dst"))
      graft.ops.GraphOps.pageRank(edges, "src", "dst", iters = 5)
        .orderBy(col("node"))
    }),

    // robots.txt politeness gate (RFC 9309): every host serves a file
    // whose `*` group disallows everything and whose graftbot group
    // carries overlapping prefix rules — so the verdicts certify group
    // selection (specific group DISCARDS `*`, never merges), longest-
    // match-wins, and allow-beats-disallow-on-tie. The oracle hand-
    // derives each verdict from the prefix semantics, independently of
    // the parser/matcher.
    "web_robots_filter" -> ((s, dir) => {
      WebOps.registerAll(s)
      val urls = Tables.documents(s, dir)
        .select(col("doc_id"),
          UrlOps.hostOf(docUrl).as("host"),
          concat(lit("/doc/"), col("doc_id").cast("string")).as("path"))
      val robots = urls.select(col("host")).distinct()
        .withColumn("txt", lit(robotsFixture))
      WebOps.robotsFilter(urls, robots, "graftbot")
        .select(col("doc_id"), col("host"), col("path"), col("allowed"))
        .orderBy(col("doc_id"))
    }),

    // The COMPOSED crawl→training-set funnel: crawl files (gzip+WARC+
    // HTTP round trip) → robots gate → corpus-wide line-level dedup on
    // the SURVIVING pages → per-doc kept-text fingerprint. One hash
    // certifies the stage composition — in particular that the line
    // keep-first runs on the robots-filtered corpus (a disallowed doc's
    // lines must NOT claim first-occurrence), which no per-stage gate
    // can see.
    "web_corpus_e2e" -> ((s, dir) => {
      val files = crawlFiles(s, dir, col("text"))
      val pages = WebOps.extractRecords(files, col("blob"))
        .filter(col("http_status") === 200)
        .select(
          regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), col("body").cast("string").as("text"))
      val urls = pages.select(col("doc_id"),
        UrlOps.hostOf(col("target_uri")).as("host"),
        regexp_extract(col("target_uri"), "^[a-z]+://[^/]+(/.*)$", 1).as("path"))
      val robots = urls.select(col("host")).distinct()
        .withColumn("txt", lit(robotsFixture))
      val allowedIds = WebOps.robotsFilter(urls, robots, "graftbot")
        .filter(col("allowed")).select(col("doc_id"))
      val kept = pages.join(allowedIds, Seq("doc_id"))
      val toks = kept.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val lines = toks.select(col("doc_id"),
        expr("""transform(
                  sequence(0, greatest(CAST(ceil(size(toks)/10.0) AS INT), 1) - 1),
                  i -> array_join(slice(toks, i*10+1, 10), ' '))""").as("lines"))
      DedupOps.lineDedup(lines, "doc_id", col("lines"))
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("text_kept")).as("kept_md5"))
        .orderBy(col("doc_id"))
    }),

    // Trained quality classifier (fastText shape): hashed
    // unigram+bigram+bias features, integer-state logistic regression,
    // ClassifierRounds momentum-GD rounds. The oracle replays EVERY
    // round (features → score → quantized error → gradient → momentum →
    // weight update) — exact because all cross-row sums are integer and
    // the one float step is a per-doc scalar.
    "text_quality_train" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val feat = QualityClassifierOps.features(docs, "doc_id", "text", 256)
      val labels = docs.select(col("doc_id"),
        (col("n_chars") >= 300).cast("int").as("y"))
      val w = QualityClassifierOps.trainLogReg(feat, labels, "doc_id",
        numBuckets = 256, rounds = ClassifierRounds, lr = 1.0)
      w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toSeq
        .toDF("b", "w").orderBy(col("b"))
    }),

    // The trained model applied back to the corpus: integer scores and
    // the 0.5-boundary prediction per document.
    "text_quality_classify" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val feat = QualityClassifierOps.features(docs, "doc_id", "text", 256)
      val labels = docs.select(col("doc_id"),
        (col("n_chars") >= 300).cast("int").as("y"))
      val w = QualityClassifierOps.trainLogReg(feat, labels, "doc_id",
        numBuckets = 256, rounds = ClassifierRounds, lr = 1.0)
      QualityClassifierOps.classify(feat, "doc_id", w)
        .join(labels, Seq("doc_id"))
        .select(col("doc_id"), col("score_int"), col("pred"), col("y"))
        .orderBy(col("doc_id"))
    }),

    // PARTITION-PRUNED scan: the documents table written PARTITIONED BY
    // its language column (once per session — the pay-at-write posture,
    // like the bucketed join), then queried with a partition filter: at
    // 100 TB this is the difference between scanning one language's
    // directories and scanning the corpus. PartitionPruneSpec asserts
    // the physical scan carries the PartitionFilter and reads only the
    // matching directories; the oracle is the plain filtered aggregate —
    // the layout must not change a single row.
    "src_partition_prune" -> ((s, dir) => {
      // Cache key is a CONTENT fingerprint of the source files (name,
      // size, mtime), not just the dir string, and the cached copy is
      // only trusted behind its _SUCCESS marker — a regenerated testdata
      // dir or a crashed partial write can never serve stale rows
      // (r9 ADVICE / the r6 regenerated-testdata failure shape).
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_bylang_$fp"
      val f = new java.io.File(path)
      if (!new java.io.File(f, "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .write.mode("overwrite").partitionBy("lang").parquet(path)
      }
      s.read.parquet(path)
        .filter(col("lang") === "en" || col("lang") === "de")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),

    // Bucketed co-located join: both sides written bucketed-by-join-key
    // (8 buckets, sorted), then joined bucket-to-bucket — the repeated-
    // join posture at 100 TB (pay the partitioning once at write, every
    // subsequent join/agg on that key runs shuffle-free; the no-Exchange
    // plan is machine-asserted in BucketJoinSpec). The oracle is the
    // plain join — bucketing must not change a single row.
    "j_bucketed_join" -> ((s, dir) => {
      val suffix = dir.replaceAll("[^a-z0-9]", "_")
      val ot = s"g_orders_b$suffix"; val lt = s"g_lineitem_b$suffix"
      // write the bucketed layout ONCE per session (the whole point of
      // bucketing: pay the key-partitioning at write time, then every
      // join on that key is shuffle-free — bench repeats measure the
      // join, not the write). A stray warehouse dir from a previous JVM
      // (whose in-memory catalog is gone) is deleted first, else the
      // managed-table create fails with LOCATION_ALREADY_EXISTS.
      if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(lt)) {
        Seq(ot, lt).foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
          val dirFile = new java.io.File(
            if (wh.getScheme == null) new java.io.File(wh.toString)
            else java.nio.file.Paths.get(wh).toFile, t)
          if (dirFile.exists()) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(dirFile.toPath).iterator().asScala.toSeq
              .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
          }
        }
        Tables.orders(s, dir).write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
        Tables.lineitem(s, dir).write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
      }
      s.table(lt)
        .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderstatus"))
    }))

  /** Rounds of the quality-classifier training loop; the oracle CTEs are
    * GENERATED for the same count, so the gate replays every round.
    */
  val ClassifierRounds = 20

  /** Committed compression fixtures (negative ids keep them disjoint
    * from table docs); exact gzip-member sizes pinned from python zlib —
    * an independent DEFLATE implementation at the same default level —
    * by tools/pin_compression_fixtures.py. Covers the three quality
    * regimes (repetition / prose / noise), the short-doc guard, the
    * empty document, and multi-byte UTF-8.
    */
  private val compressionNoise =
    "UfexM~0HYr#!09sJ^+8[0fyROrU<IzuRexq(}rKD =4(GXwlOBM_ +]<4n6Va@0VujAr8!kr^9kBaF4!u3}3o1%[/f,Pw;YJE&%h" +
      ":xKFEni=s@APAFU3k;4+%[Ih2f0_U76{UR/zE@/t8[Y<S7e9830T#&gJkX>V/x0bet}b4Rq.#5Un8*eFIFs;/H>Dk9EN-z-J#~]" +
      "[AbMTK.c;)H474!kp-fytEx6d>*0=uT4Xkn>~O@a!i&]R69ADg@^D^_C*g7>Ds5Ob-&:5:[O3K9K(w!gDy!OR|JSHeX-H2.eBq<" +
      "cn%v|ji5a;#z}LUPE+>9>_-F?;,5Y[w.YfE=>x]_w@4hO[>~ArKd#xQdypIV/TIt8LgL](q*MJwxAP:_Q~s_|&4dg;:&:ZQ{E7:" +
      "1uN,!0LYh]VE&#=UniBWV/&/l|&8{-D8x>b/_mr2+Q5]<}&o+QL}.I+8BAr,+]3qzc5CJy<YtYh-lS3wJG7][|_2H [cPMXcxQJ" +
      ":r6zo&y<]XeBA7G{Ur:jGl}jc*}vsVwRqLoz>v>Lc;i*i;>(kpg(09ydY9M3:dQ!8+c9s.Q_udcDo_|[?=Cn4duBoD,le!?BSrWLUrUF"
  private val compressionFixtures: Seq[(Long, String)] = Seq(
    (-6L, "the same line over and over " * 40),
    (-5L, ("the quick brown fox jumps over a lazy dog while mixed words " +
      "vary across this sentence and keep entropy moderate ") * 6),
    (-4L, compressionNoise),
    (-3L, "tiny"),
    (-2L, ""),
    (-1L, "naïve café über straße — 文字化けテスト " * 3))

  /** (doc_id, raw_bytes, deflated_bytes) pinned by python zlib for the
    * fixtures above — the oracle joins these, so a single byte of codec
    * drift breaks the gate.
    */
  private val compressionPinnedSql =
    "(-6, 1120, 55), (-5, 672, 116), (-4, 600, 537), " +
      "(-3, 4, 24), (-2, 0, 20), (-1, 159, 79)"

  /** Shared training replay for the quality-classifier oracles: hashed
    * features, then [[ClassifierRounds]] rounds exactly as
    * [[QualityClassifierOps.trainLogReg]] computes them — integer dot
    * products, per-doc sigmoid re-quantized to micro-error, integer
    * gradient, integer floor-div momentum, frequency-normalized half-up
    * weight update. Round 1 inlines the error as `(0.5 − y)` because
    * w₀ = 0 makes every score exactly 0.
    */
  private val classifierTrainCtes: String = {
    val base =
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT doc_id, '1:' || tk AS k
        |  FROM (SELECT doc_id, unnest(t) AS tk FROM toks)
        |  UNION ALL
        |  SELECT doc_id, '2:' || t[i] || ' ' || t[i+1] AS k
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) g
        |  WHERE len(t) >= 2
        |  UNION ALL
        |  SELECT doc_id, '0:bias' AS k FROM documents),
        |feat AS MATERIALIZED (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('ftq:' || k), 1, 15))::BIGINT % 256 AS b,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM grams GROUP BY 1, 2),
        |lab AS MATERIALIZED (SELECT doc_id,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM documents),
        |spine AS MATERIALIZED (SELECT unnest(generate_series(0, 255)) AS b),
        |freqs AS MATERIALIZED (SELECT s.b,
        |    CAST(greatest(coalesce(f.c, 0), 1) AS BIGINT) AS fq
        |  FROM spine s LEFT JOIN
        |    (SELECT b, sum(x) AS c FROM feat GROUP BY b) f USING (b)),
        |e1 AS MATERIALIZED (SELECT doc_id,
        |    CAST(floor((0.5 - y)*1e6 + 0.5) AS BIGINT) AS err FROM lab),
        |g1 AS MATERIALIZED (SELECT f.b, sum(f.x * e.err) AS gr
        |  FROM feat f JOIN e1 e USING (doc_id) GROUP BY f.b),
        |v1 AS MATERIALIZED (SELECT s.b, CAST(coalesce(g.gr, 0) AS BIGINT) AS v
        |  FROM spine s LEFT JOIN g1 g USING (b)),
        |w1 AS MATERIALIZED (SELECT v1.b,
        |    0 - CAST(floor(CAST(v1.v AS DOUBLE) / fq + 0.5) AS BIGINT) AS w
        |  FROM v1 JOIN freqs USING (b))""".stripMargin
    val rounds = (2 to ClassifierRounds).map { k =>
      val p = k - 1
      s"""s$k AS MATERIALIZED (SELECT f.doc_id, sum(w$p.w * f.x) AS s
         |  FROM feat f JOIN w$p USING (b) GROUP BY 1),
         |e$k AS MATERIALIZED (SELECT l.doc_id,
         |    CAST(floor((1.0/(1.0 + exp(-(CAST(coalesce(s.s, 0) AS DOUBLE)/1e6)))
         |      - CAST(y AS DOUBLE))*1e6 + 0.5) AS BIGINT) AS err
         |  FROM lab l LEFT JOIN s$k s USING (doc_id)),
         |g$k AS MATERIALIZED (SELECT f.b, sum(f.x * e.err) AS gr
         |  FROM feat f JOIN e$k e USING (doc_id) GROUP BY f.b),
         |v$k AS MATERIALIZED (SELECT v$p.b,
         |    CAST(CAST(floor(v$p.v * 9 / 10.0) AS BIGINT)
         |      + coalesce(g.gr, 0) AS BIGINT) AS v
         |  FROM v$p LEFT JOIN g$k g USING (b)),
         |w$k AS MATERIALIZED (SELECT w$p.b,
         |    w$p.w - CAST(floor(CAST(v$k.v AS DOUBLE) / fq + 0.5) AS BIGINT) AS w
         |  FROM w$p JOIN v$k USING (b) JOIN freqs USING (b))""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** PageRank oracle: edges from the closed-form link targets, then 5
    * generated iterations of the exact integer arithmetic (`//` is
    * floor division — equal to Spark's `div` truncation because every
    * operand is positive). This graph has no dangling nodes (every doc
    * emits 3 in-graph links), so the dangling share is 0 on both sides;
    * the dangling path is pinned in GraphOpsSpec instead.
    */
  private val pagerankSql: String = {
    val base =
      """WITH n AS (SELECT count(*) AS c FROM documents),
        |edges AS MATERIALIZED (
        |  SELECT doc_id AS src, (doc_id*7+1) % c AS dst FROM documents, n
        |  UNION ALL SELECT doc_id, (doc_id*13+2) % c FROM documents, n
        |  UNION ALL SELECT doc_id, (doc_id*3+5) % c FROM documents, n),
        |nodes AS MATERIALIZED (
        |  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |odeg AS MATERIALIZED (
        |  SELECT src, count(*) AS od FROM edges GROUP BY src),
        |p0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS p FROM nodes)""".stripMargin
    val iters = (1 to 5).map { k =>
      val p = k - 1
      s"""c$k AS MATERIALIZED (SELECT e.dst, (p.p * 85) // (100 * o.od) AS cb
         |  FROM edges e JOIN p$p p ON e.src = p.node
         |  JOIN odeg o ON e.src = o.src),
         |i$k AS MATERIALIZED (SELECT dst, sum(cb) AS s FROM c$k GROUP BY dst),
         |p$k AS MATERIALIZED (SELECT n2.node,
         |    CAST(150000 + coalesce(i.s, 0) AS BIGINT) AS p
         |  FROM nodes n2 LEFT JOIN i$k i ON n2.node = i.dst)""".stripMargin
    }
    (base +: iters).mkString(",\n") + "\nSELECT node, p FROM p5 ORDER BY node"
  }

  override def oracle: Map[String, String] = Map(

    // the partitioned layout must not change a row: plain filtered agg
    "src_partition_prune" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // replay of the segment-audit construction rule: codec and verdict
    // are functions of doc_id % 4; only the gzip'd WARC contributes a
    // record
    "web_segment_audit" ->
      """SELECT doc_id AS segment_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'gzip' WHEN 3 THEN 'unknown'
        |    ELSE 'zstd' END AS codec,
        |  (doc_id % 4 <> 0) AS quarantined,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_records
        |FROM documents ORDER BY segment_id""".stripMargin,

    // pinned python-zlib sizes for the committed fixtures; table rows
    // contribute raw bytes + the roundtrip invariant (their deflate
    // sizes are masked to null — engine-specific, by design)
    "text_compression_ratio" ->
      s"""WITH fx AS (SELECT * FROM (VALUES $compressionPinnedSql)
         |  t(doc_id, raw_bytes, deflated_bytes))
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(raw_bytes AS BIGINT) AS raw_bytes,
         |  CAST(deflated_bytes AS BIGINT) AS deflated_bytes,
         |  CASE WHEN raw_bytes >= 32
         |    THEN CAST(floor(deflated_bytes * 1000.0 / raw_bytes) AS BIGINT)
         |  END AS ratio_milli,
         |  TRUE AS roundtrip_ok
         |FROM fx
         |UNION ALL
         |SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT),
         |  NULL, NULL, TRUE
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    "web_wet_extract" ->
      s"""SELECT doc_id, $urlSql AS target_uri, text
         |FROM documents ORDER BY doc_id""".stripMargin,

    "web_meta_extract" ->
      s"""SELECT doc_id,
         |  'Doc & ' || CAST(doc_id AS VARCHAR) AS title,
         |  'chars: ' || CAST(n_chars AS VARCHAR) AS meta_description,
         |  $urlSql AS canonical,
         |  lang AS page_lang
         |FROM documents ORDER BY doc_id""".stripMargin,

    "web_sitemap_extract" ->
      s"""WITH d AS (SELECT doc_id, $hostSql AS host, $urlSql AS url
         |  FROM documents)
         |SELECT host, count(*) AS n_locs,
         |  min(url) AS first_loc, max(url) AS last_loc
         |FROM d GROUP BY host ORDER BY host""".stripMargin,

    "web_domain_cap" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    CASE doc_id % 4
        |      WHEN 0 THEN source || '.co.uk'
        |      WHEN 1 THEN 'example.com'
        |      WHEN 2 THEN 'example.org'
        |      ELSE source || '.com.au' END AS domain,
        |    ('0x' || substr(md5('str:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY h, doc_id) AS pick
        |  FROM d)
        |SELECT domain, doc_id, n_chars, CAST(pick AS BIGINT) AS pick
        |FROM r WHERE pick <= 5 ORDER BY domain, pick""".stripMargin,

    "web_corpus_e2e" ->
      """WITH surv AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE NOT ((starts_with('/doc/' || CAST(doc_id AS VARCHAR), '/doc/1')
        |              AND NOT starts_with('/doc/' || CAST(doc_id AS VARCHAR), '/doc/12'))
        |             OR starts_with('/doc/' || CAST(doc_id AS VARCHAR), '/doc/3'))),
        |toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM surv),
        |lines AS (
        |  SELECT doc_id, i AS line_pos,
        |    array_to_string(t[(i*10+1):(i*10+10)], ' ') AS line
        |  FROM toks, LATERAL (SELECT unnest(generate_series(0,
        |    CAST(ceil(greatest(len(t), 1)/10.0) AS INT) - 1)) AS i) g),
        |keep AS (SELECT line, min(doc_id*1000000 + line_pos) AS k
        |  FROM lines GROUP BY line),
        |kept AS (SELECT l.doc_id, l.line_pos, l.line
        |  FROM lines l JOIN keep k ON l.line = k.line
        |    AND l.doc_id*1000000 + l.line_pos = k.k),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
        |srv AS (SELECT doc_id, count(*) AS n_kept,
        |    md5(string_agg(line, ' ' ORDER BY line_pos)) AS kept_md5
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, t.n_lines, s.n_kept, s.kept_md5
        |FROM tot t JOIN srv s USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "web_link_extract" ->
      s"""WITH n AS (SELECT count(*) AS c FROM documents),
         |d AS (SELECT doc_id, 'https://' || $hostSql AS origin FROM documents)
         |SELECT doc_id, pos, link FROM (
         |  SELECT d.doc_id, 0 AS pos,
         |    origin || '/doc/' || CAST((doc_id*7+1) % c AS VARCHAR) AS link
         |  FROM d, n
         |  UNION ALL SELECT d.doc_id, 1,
         |    origin || '/doc/' || CAST((doc_id*13+2) % c AS VARCHAR) || '?a=1&b=2'
         |  FROM d, n
         |  UNION ALL SELECT d.doc_id, 2,
         |    origin || '/doc/' || CAST((doc_id*3+5) % c AS VARCHAR)
         |  FROM d, n
         |  UNION ALL SELECT d.doc_id, 3, origin || '/doc/rel/page' FROM d
         |  UNION ALL SELECT d.doc_id, 4, 'https://ext.example.net/x' FROM d
         |) ORDER BY doc_id, pos""".stripMargin,

    "web_pagerank" -> pagerankSql,

    "web_robots_filter" ->
      s"""WITH u AS (SELECT doc_id,
         |    CASE doc_id % 4
         |      WHEN 0 THEN 'news.' || source || '.co.uk'
         |      WHEN 1 THEN 'www.' || source || '.example.com'
         |      WHEN 2 THEN source || '.example.org'
         |      ELSE 'cdn.' || source || '.com.au' END AS host,
         |    '/doc/' || CAST(doc_id AS VARCHAR) AS path
         |  FROM documents)
         |SELECT doc_id, host, path,
         |  NOT ((starts_with(path, '/doc/1') AND NOT starts_with(path, '/doc/12'))
         |       OR starts_with(path, '/doc/3')) AS allowed
         |FROM u ORDER BY doc_id""".stripMargin,

    "text_quality_train" ->
      (classifierTrainCtes +
        s"\nSELECT b, w FROM w$ClassifierRounds ORDER BY b"),

    "text_quality_classify" ->
      (classifierTrainCtes + s""",
        |sc AS (SELECT f.doc_id,
        |    CAST(sum(w$ClassifierRounds.w * f.x) AS BIGINT) AS score_int
        |  FROM feat f JOIN w$ClassifierRounds USING (b) GROUP BY 1)
        |SELECT l.doc_id,
        |  coalesce(s.score_int, 0) AS score_int,
        |  CASE WHEN coalesce(s.score_int, 0) > 0 THEN 1 ELSE 0 END AS pred,
        |  y
        |FROM lab l LEFT JOIN sc s USING (doc_id)
        |ORDER BY l.doc_id""".stripMargin),

    "web_warc_extract" ->
      s"""SELECT doc_id,
         |  'response' AS warc_type,
         |  $urlSql AS target_uri,
         |  '2026-01-01T00:00:00Z' AS warc_date,
         |  CAST(strlen(text) + 77 + length(CAST(strlen(text) AS VARCHAR)) AS BIGINT)
         |    AS content_length,
         |  200 AS http_status,
         |  CAST(strlen(text) AS BIGINT) AS body_bytes,
         |  text AS body_text
         |FROM documents ORDER BY doc_id""".stripMargin,

    "web_html_extract" ->
      """SELECT doc_id,
        |  concat(regexp_replace(trim(text), '\s+', ' ', 'g'),
        |         ' & ABC <tag> café') AS page_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "web_crawl_e2e" ->
      s"""SELECT doc_id,
         |  $urlSql AS target_uri,
         |  concat(regexp_replace(trim(text), '\\s+', ' ', 'g'),
         |         ' & ABC <tag> café') AS page_text
         |FROM documents ORDER BY doc_id""".stripMargin,

    "web_domain_agg" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |    CASE doc_id % 4
        |      WHEN 0 THEN source || '.co.uk'
        |      WHEN 1 THEN 'example.com'
        |      WHEN 2 THEN 'example.org'
        |      ELSE source || '.com.au' END AS domain
        |  FROM documents)
        |SELECT domain, count(*) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM d GROUP BY domain ORDER BY domain""".stripMargin,

    "dedup_line_level" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS line_pos,
        |    array_to_string(t[(i*10+1):(i*10+10)], ' ') AS line
        |  FROM toks, LATERAL (SELECT unnest(generate_series(0,
        |    CAST(ceil(greatest(len(t), 1)/10.0) AS INT) - 1)) AS i) g),
        |keep AS (SELECT line, min(doc_id*1000000 + line_pos) AS k
        |  FROM lines GROUP BY line),
        |kept AS (SELECT l.doc_id, l.line_pos, l.line
        |  FROM lines l JOIN keep k ON l.line = k.line
        |    AND l.doc_id*1000000 + l.line_pos = k.k),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
        |srv AS (SELECT doc_id, count(*) AS n_kept,
        |    md5(string_agg(line, ' ' ORDER BY line_pos)) AS kept_md5
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, t.n_lines,
        |  coalesce(s.n_kept, 0) AS n_kept,
        |  coalesce(s.kept_md5, md5('')) AS kept_md5
        |FROM tot t LEFT JOIN srv s USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "text_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, (lang = 'en') AS t,
        |    ('0x' || substr(md5('dsir:' || tk), 1, 15))::BIGINT % 128 AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk
        |        FROM documents)),
        |model AS (SELECT b,
        |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct, count(*) AS cr
        |  FROM tok GROUP BY b),
        |tot AS (SELECT sum(CASE WHEN t THEN 1 ELSE 0 END) AS nt, count(*) AS nr
        |  FROM tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor(avg(ln((m.ct + 1) / (tot.nt + 128.0))
        |          - ln((m.cr + 1) / (tot.nr + 128.0))) * 1e4 + 0.5) / 1e4
        |    AS log_ratio
        |FROM tok JOIN model m USING (b) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "j_bucketed_join" ->
      """SELECT o_orderstatus,
        |  round(sum(l_extendedprice*(1-l_discount)), 4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{DecontamOps, PiiOps}

/** Release-gate curation operators: PII detection/redaction and
  * benchmark decontamination. The PII fixture is synthesized from
  * `doc_id` arithmetic IDENTICALLY in both engines (same concat/lpad/mod
  * text, dialect differences confined to cast spelling), so the DuckDB
  * oracle replays the Luhn mod-10 and IBAN mod-97 checksums — validity
  * is computed, never pinned.
  */
object CurationQueries extends QueryPack {

  /** doc_id-derived PII planted after the document text. Classes overlap
    * on purpose (a doc can carry several); ~1/10 cards pass Luhn (the
    * trailing check digit cycles doc_id % 10) and ~1/97 IBANs pass
    * mod-97, so both validators provably reject.
    */
  private def fixtureSql(duck: Boolean): String = {
    def c(x: String) = s"CAST($x AS ${if (duck) "VARCHAR" else "STRING"})"
    "concat(text" +
      s", CASE WHEN doc_id % 3 = 0 THEN concat(' reach user', ${c("doc_id")}, " +
      "'@example.com') ELSE '' END" +
      s", CASE WHEN doc_id % 4 = 1 THEN concat(' call 415-555-', " +
      s"lpad(${c("doc_id % 10000")}, 4, '0')) ELSE '' END" +
      s", CASE WHEN doc_id % 7 = 2 THEN concat(' ssn 078-05-', " +
      s"lpad(${c("(doc_id * 31) % 10000")}, 4, '0')) ELSE '' END" +
      s", CASE WHEN doc_id % 5 = 0 THEN concat(' host 10.', " +
      s"${c("doc_id % 300")}, '.', ${c("doc_id % 256")}, '.', " +
      s"${c("(doc_id * 7) % 256")}, ' up') ELSE '' END" +
      s", CASE WHEN doc_id % 6 = 2 THEN concat(' card 4539', " +
      s"lpad(${c("(doc_id * 2654435761) % 100000000000")}, 11, '0'), " +
      s"${c("doc_id % 10")}, ' on file') ELSE '' END" +
      s", CASE WHEN doc_id % 10 = 3 THEN concat(' pay DE', ${ibanChk(duck)}, " +
      s"${bban(duck)}, ' thanks') " +
      s"WHEN doc_id % 10 = 8 THEN concat(' pay DE', " +
      s"lpad(${c("(doc_id * 13) % 100")}, 2, '0'), " +
      s"${bban(duck)}, ' thanks') " +
      "ELSE '' END)"
  }

  /** 18-digit doc_id-derived BBAN. */
  private def bban(duck: Boolean): String = {
    def c(x: String) = s"CAST($x AS ${if (duck) "VARCHAR" else "STRING"})"
    s"concat(lpad(${c("(doc_id * 2654435761) % 1000000000")}, 9, '0'), " +
      s"lpad(${c("(doc_id * 97 + 11) % 1000000000")}, 9, '0'))"
  }

  /** CORRECT ISO 13616 check digits for [[bban]] — 98 minus the mod-97
    * of BBAN+'131400', computed with the same chunked fold the
    * validator replays, so doc_id % 10 = 3 rows are valid by
    * construction and doc_id % 10 = 8 rows are valid only by 1-in-97
    * accident. Both validator branches fire in the oracle.
    */
  private def ibanChk(duck: Boolean): String = {
    def c(x: String) = s"CAST($x AS ${if (duck) "VARCHAR" else "STRING"})"
    val rem = graft.ops.PiiOps.sql.mod97Of24(s"concat(${bban(duck)}, '131400')")
    s"lpad(${c(s"98 - $rem")}, 2, '0')"
  }

  private val DecontamN = 5

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Checksum-validated PII counts per document. Scan-side projection
    // only — the physical plan has no exchange below the final sort
    // (PiiSpec asserts it), so this runs at scan speed on 100 TB.
    "text_pii_detect" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), expr(fixtureSql(duck = false)).as("t"))
      PiiOps.detect(docs, "t").drop("t").orderBy(col("doc_id"))
    }),

    // Shape-level redaction (over-redact by design): typed placeholders,
    // md5 + length of the scrubbed text, shape-match count.
    "text_pii_redact" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), expr(fixtureSql(duck = false)).as("t"))
      docs.select(col("doc_id"),
        md5(expr(PiiOps.sql.redacted("t", duck = false))).as("red_md5"),
        length(expr(PiiOps.sql.redacted("t", duck = false)))
          .cast("long").as("red_len"),
        (expr(PiiOps.sql.shapeCount("t", PiiOps.sql.Email, duck = false)) +
          expr(PiiOps.sql.shapeCount("t", PiiOps.sql.Phone, duck = false)) +
          expr(PiiOps.sql.shapeCount("t", PiiOps.sql.Ssn, duck = false)) +
          expr(PiiOps.sql.shapeCount("t", PiiOps.sql.Ipv4, duck = false)) +
          expr(PiiOps.sql.shapeCount("t", PiiOps.sql.Card, duck = false)) +
          expr(PiiOps.sql.shapeCount("t", PiiOps.sql.IbanDe, duck = false)))
          .as("n_shapes"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: every 37th document donates its token
    // window [4, 4+11] as an "eval question"; any training doc sharing a
    // 5-gram with that set is flagged. Bench side is broadcast — the
    // corpus never shuffles (PiiSpec asserts broadcast, no cartesian).
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.where(col("doc_id") % 37 === 0)
        .select(expr("concat_ws(' ', slice(regexp_extract_all(lower(text), " +
          "'[a-z0-9]+', 0), 4, 12))").as("q"))
      DecontamOps.ngramOverlap(docs, "doc_id", "text", bench, "q", DecontamN)
        .orderBy(col("doc_id"))
    }),

    // FUZZY decontamination: MinHash(8, 3-shingles) banded 4×2 against
    // the same benchmark windows — catches partial/paraphrase overlap
    // the exact 5-gram gate misses. Corpus side is one scan-side
    // signature projection (native MinHashSig, no shuffle); the banded
    // benchmark broadcasts; the oracle replays the salted-md5 minima,
    // band joins, and agreement estimate verbatim.
    "text_decontaminate_fuzzy" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.where(col("doc_id") % 37 === 0)
        .select(expr("concat_ws(' ', slice(split(trim(lower(text)), " +
          "'\\\\s+'), 4, 12))").as("q"))
      DecontamOps.minhashOverlap(docs, "doc_id", "text", bench, "q",
        estMilliThreshold = 250)
        .orderBy(col("doc_id"))
    }),

    // RELEASE DATASHEET — the per-source summary panel every corpus
    // drop ships (docs/tokens, PII incidence on the planted fixture,
    // benchmark contamination, exact-dup mass): one statement
    // composing the round's gates, so the oracle certifies their
    // interaction, not just each stage alone.
    "corpus_datasheet" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val withPii = PiiOps.detect(
        docs.select(col("doc_id"), col("source"), col("n_chars"),
          col("text"), expr(fixtureSql(duck = false)).as("t")), "t")
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
          col("pii_total"))
      val bench = docs.where(col("doc_id") % 37 === 0)
        .select(expr("concat_ws(' ', slice(regexp_extract_all(lower(text), " +
          "'[a-z0-9]+', 0), 4, 12))").as("q"))
      val dec = DecontamOps.ngramOverlap(docs, "doc_id", "text", bench, "q",
        DecontamN).select(col("doc_id"), col("is_contaminated"))
      val dupKeys = docs.groupBy(md5(col("text")).as("__k"))
        .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
        .select(col("__k"))
      val flagged = withPii
        .join(dec, Seq("doc_id"))
        .join(dupKeys.hint("broadcast"), md5(col("text")) === col("__k"),
          "left")
      flagged.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("size(split(trim(lower(text)), '\\\\s+'))"))
            .as("n_tokens"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(when(col("pii_total") > 0, 1L).otherwise(0L)).as("n_pii_docs"),
          sum(when(col("is_contaminated"), 1L).otherwise(0L))
            .as("n_contaminated"),
          sum(when(col("__k").isNotNull, 1L).otherwise(0L)).as("n_exact_dup"))
        .orderBy(col("source"))
    }),

    // UL2 mixture-of-denoisers: R (span 3 / window 20), X (span 8 /
    // window 16), S (prefix-LM split) drawn per doc from the id hash.
    // The oracle replays all three branches and the draw.
    "text_ul2_mixture" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.DenoisingOps.ul2Mixture(docs, "doc_id", "text")
        .select(col("doc_id"), col("denoiser"), col("n_spans"),
          size(col("inputs")).cast("long").as("n_inputs"),
          size(col("targets")).cast("long").as("n_targets"),
          md5(concat_ws(" ", col("inputs"))).as("inputs_md5"),
          md5(concat_ws(" ", col("targets"))).as("targets_md5"))
        .orderBy(col("doc_id"))
    }),

    // T5-style span corruption with the derandomized span schedule
    // (hash-offset span per full 20-token window, span length 3): one
    // scan-side HOF projection, no explode, no shuffle below the
    // ORDER BY. The oracle rebuilds both token streams string-for-
    // string AND states the sentinel accounting identities as closed
    // forms (|inputs| = n − 2w, |targets| = 4w + 1).
    "text_span_corrupt" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.DenoisingOps.spanCorrupt(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_spans"),
          size(col("inputs")).cast("long").as("n_inputs"),
          size(col("targets")).cast("long").as("n_targets"),
          md5(concat_ws(" ", col("inputs"))).as("inputs_md5"),
          md5(concat_ws(" ", col("targets"))).as("targets_md5"))
        .orderBy(col("doc_id"))
    })
  )

  private def detectOracle: String = {
    val t = "t"
    s"""WITH px AS (SELECT doc_id, ${fixtureSql(duck = true)} AS t FROM documents),
       |c AS (SELECT doc_id,
       |  ${PiiOps.sql.shapeCount(t, PiiOps.sql.Email, duck = true)} AS n_email,
       |  ${PiiOps.sql.shapeCount(t, PiiOps.sql.Phone, duck = true)} AS n_phone,
       |  ${PiiOps.sql.shapeCount(t, PiiOps.sql.Ssn, duck = true)} AS n_ssn,
       |  ${PiiOps.sql.ipv4ValidCount(t, duck = true)} AS n_ipv4_valid,
       |  ${PiiOps.sql.cardLuhnCount(t, duck = true)} AS n_card_luhn,
       |  ${PiiOps.sql.ibanValidCount(t, duck = true)} AS n_iban_valid
       |FROM px)
       |SELECT doc_id, n_email, n_phone, n_ssn, n_ipv4_valid, n_card_luhn,
       |  n_iban_valid,
       |  n_email + n_phone + n_ssn + n_ipv4_valid + n_card_luhn +
       |    n_iban_valid AS pii_total
       |FROM c ORDER BY doc_id""".stripMargin
  }

  private def redactOracle: String = {
    val sh = Seq(PiiOps.sql.Email, PiiOps.sql.Phone, PiiOps.sql.Ssn,
      PiiOps.sql.Ipv4, PiiOps.sql.Card, PiiOps.sql.IbanDe)
      .map(p => PiiOps.sql.shapeCount("t", p, duck = true)).mkString(" + ")
    s"""WITH px AS (SELECT doc_id, ${fixtureSql(duck = true)} AS t FROM documents)
       |SELECT doc_id,
       |  md5(${PiiOps.sql.redacted("t", duck = true)}) AS red_md5,
       |  CAST(length(${PiiOps.sql.redacted("t", duck = true)}) AS BIGINT)
       |    AS red_len,
       |  $sh AS n_shapes
       |FROM px ORDER BY doc_id""".stripMargin
  }

  private def decontamOracle: String = {
    val n = DecontamN
    s"""WITH tok AS (SELECT doc_id,
       |    regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS l
       |  FROM documents),
       |btok AS (SELECT regexp_extract_all(lower(
       |    array_to_string(l[4:15], ' ')), '[a-z0-9]+', 0) AS l
       |  FROM tok WHERE doc_id % 37 = 0),
       |cg AS (SELECT DISTINCT doc_id,
       |    md5(array_to_string(l[i:i+${n - 1}], ' ')) AS h
       |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l) - ${n - 1}))
       |    AS i) g
       |  WHERE len(l) >= $n),
       |bg AS (SELECT DISTINCT md5(array_to_string(l[i:i+${n - 1}], ' ')) AS h
       |  FROM btok, LATERAL (SELECT unnest(generate_series(1, len(l) - ${n - 1}))
       |    AS i) g
       |  WHERE len(l) >= $n),
       |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
       |  FROM cg JOIN bg USING (h) GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(h.n_contaminated, 0) AS n_contaminated,
       |  COALESCE(h.n_contaminated, 0) > 0 AS is_contaminated
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private def fuzzyOracle: String = {
    val sigAggs = (i: String) => (0 until 8)
      .map(k => s"min(md5('$k:' || s)) AS mh$k").mkString(", ")
    val bandJoin = (0 until 4).map { b =>
      s"""SELECT s.doc_id, b.bid FROM sig s JOIN bsig b
         |    ON s.mh${2 * b} = b.mh${2 * b} AND s.mh${2 * b + 1} = b.mh${2 * b + 1}"""
        .stripMargin
    }.mkString("\n  UNION\n  ")
    val agree = (0 until 8)
      .map(k => s"CAST(s.mh$k = b.mh$k AS INT)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id,
       |    string_split_regex(trim(lower(text)), '\\s+') AS ws
       |  FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2))
       |    AS i) g
       |  WHERE len(ws) >= 3),
       |sig AS (SELECT doc_id, ${sigAggs("d")} FROM sh GROUP BY doc_id),
       |bq AS (SELECT md5(array_to_string(ws[4:15], ' ')) AS bid,
       |    string_split_regex(trim(lower(array_to_string(ws[4:15], ' '))),
       |      '\\s+') AS ws
       |  FROM tok WHERE doc_id % 37 = 0),
       |bsh AS (SELECT DISTINCT bid,
       |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |  FROM bq, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2))
       |    AS i) g
       |  WHERE len(ws) >= 3),
       |bsig AS (SELECT bid, ${sigAggs("b")} FROM bsh GROUP BY bid),
       |cand AS (
       |  $bandJoin),
       |est AS (SELECT c.doc_id, ($agree) * 125 AS e
       |  FROM cand c JOIN sig s ON s.doc_id = c.doc_id
       |  JOIN bsig b ON b.bid = c.bid),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_candidates,
       |    CAST(max(e) AS BIGINT) AS max_est_milli
       |  FROM est GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_bench_candidates, 0) AS n_bench_candidates,
       |  COALESCE(a.max_est_milli, 0) AS max_est_milli,
       |  COALESCE(a.max_est_milli, 0) >= 250 AS is_fuzzy_contaminated
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private def spanCorruptOracle: String =
    s"""WITH tok AS (SELECT doc_id,
       |    string_split_regex(trim(lower(text)), '\\s+') AS ws
       |  FROM documents),
       |w AS (SELECT doc_id, ws, CAST(len(ws) // 20 AS INT) AS nw FROM tok),
       |wins AS (SELECT doc_id, ws, nw,
       |    unnest(generate_series(0, nw - 1)) AS wi
       |  FROM w WHERE nw > 0),
       |pieces AS (SELECT doc_id, wi,
       |    array_to_string(
       |      ws[20*wi+1 : 20*wi+o] ||
       |      ['<extra_id_' || CAST(wi AS VARCHAR) || '>'] ||
       |      ws[20*wi+o+4 : 20*wi+20], ' ') AS piece_in,
       |    array_to_string(
       |      ['<extra_id_' || CAST(wi AS VARCHAR) || '>'] ||
       |      ws[20*wi+o+1 : 20*wi+o+3], ' ') AS piece_tg
       |  FROM (SELECT doc_id, ws, wi,
       |      CAST(('0x' || substr(md5('t5:' || CAST(doc_id AS VARCHAR)
       |        || ':' || CAST(wi AS VARCHAR)), 1, 15))::BIGINT % 18 AS INT)
       |        AS o
       |    FROM wins)),
       |agg AS (SELECT doc_id,
       |    string_agg(piece_in, ' ' ORDER BY wi) AS body_in,
       |    string_agg(piece_tg, ' ' ORDER BY wi) AS body_tg
       |  FROM pieces GROUP BY doc_id),
       |fin AS (SELECT t.doc_id, t.nw, len(t.ws) AS n,
       |    CASE WHEN t.nw = 0 THEN array_to_string(t.ws, ' ')
       |      WHEN t.nw * 20 < len(t.ws) THEN a.body_in || ' ' ||
       |        array_to_string(t.ws[t.nw*20+1 : len(t.ws)], ' ')
       |      ELSE a.body_in END AS instr,
       |    CASE WHEN t.nw = 0 THEN '<extra_id_0>'
       |      ELSE a.body_tg || ' <extra_id_' || CAST(t.nw AS VARCHAR) || '>'
       |      END AS tgstr
       |  FROM w t LEFT JOIN agg a USING (doc_id))
       |SELECT doc_id, CAST(nw AS BIGINT) AS n_spans,
       |  CAST(n - 2 * nw AS BIGINT) AS n_inputs,
       |  CAST(4 * nw + 1 AS BIGINT) AS n_targets,
       |  md5(instr) AS inputs_md5, md5(tgstr) AS targets_md5
       |FROM fin ORDER BY doc_id""".stripMargin

  private def datasheetOracle: String = {
    val n = DecontamN
    val piiSum = Seq(
      PiiOps.sql.shapeCount("t", PiiOps.sql.Email, duck = true),
      PiiOps.sql.shapeCount("t", PiiOps.sql.Phone, duck = true),
      PiiOps.sql.shapeCount("t", PiiOps.sql.Ssn, duck = true),
      PiiOps.sql.ipv4ValidCount("t", duck = true),
      PiiOps.sql.cardLuhnCount("t", duck = true),
      PiiOps.sql.ibanValidCount("t", duck = true)).mkString(" + ")
    s"""WITH px AS (SELECT doc_id, source, n_chars, text,
       |    ${fixtureSql(duck = true)} AS t FROM documents),
       |pii AS (SELECT doc_id, ($piiSum) AS pii_total FROM px),
       |tok AS (SELECT doc_id,
       |    regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS l
       |  FROM documents),
       |btok AS (SELECT regexp_extract_all(lower(
       |    array_to_string(l[4:15], ' ')), '[a-z0-9]+', 0) AS l
       |  FROM tok WHERE doc_id % 37 = 0),
       |cg AS (SELECT DISTINCT doc_id,
       |    md5(array_to_string(l[i:i+${n - 1}], ' ')) AS h
       |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l) - ${n - 1}))
       |    AS i) g WHERE len(l) >= $n),
       |bg AS (SELECT DISTINCT md5(array_to_string(l[i:i+${n - 1}], ' ')) AS h
       |  FROM btok, LATERAL (SELECT unnest(generate_series(1, len(l) - ${n - 1}))
       |    AS i) g WHERE len(l) >= $n),
       |hits AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (h)),
       |dup AS (SELECT md5(text) AS k FROM documents
       |  GROUP BY 1 HAVING count(*) > 1)
       |SELECT d.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(string_split_regex(trim(lower(d.text)), '\\s+')))
       |    AS BIGINT) AS n_tokens,
       |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(CASE WHEN p.pii_total > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pii_docs,
       |  CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_contaminated,
       |  CAST(sum(CASE WHEN u.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exact_dup
       |FROM documents d
       |JOIN pii p USING (doc_id)
       |LEFT JOIN hits h USING (doc_id)
       |LEFT JOIN dup u ON u.k = md5(d.text)
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** Parameterized span-corruption replay chain ending in CTE
    * `${p}fin(doc_id, nw, n, instr, tgstr)` over docs where the
    * denoiser draw (CTE `dns(doc_id, ws, d)`) equals `dsel`.
    */
  private def spanChainSql(p: String, spanLen: Int, window: Int,
                           salt: String, dsel: Int): String = {
    val legal = window - spanLen + 1
    s"""${p}wins AS (SELECT doc_id, ws, CAST(len(ws) // $window AS INT) AS nw,
       |    unnest(generate_series(0, CAST(len(ws) // $window AS INT) - 1))
       |      AS wi
       |  FROM dns WHERE d = $dsel AND len(ws) >= $window),
       |${p}pieces AS (SELECT doc_id, wi,
       |    array_to_string(
       |      ws[$window*wi+1 : $window*wi+o] ||
       |      ['<extra_id_' || CAST(wi AS VARCHAR) || '>'] ||
       |      ws[$window*wi+o+${spanLen + 1} : $window*wi+$window], ' ')
       |      AS piece_in,
       |    array_to_string(
       |      ['<extra_id_' || CAST(wi AS VARCHAR) || '>'] ||
       |      ws[$window*wi+o+1 : $window*wi+o+$spanLen], ' ') AS piece_tg
       |  FROM (SELECT doc_id, ws, wi,
       |      CAST(('0x' || substr(md5('$salt' ||
       |        CAST(doc_id AS VARCHAR) || ':' ||
       |        CAST(wi AS VARCHAR)), 1, 15))::BIGINT % $legal
       |        AS INT) AS o
       |    FROM ${p}wins)),
       |${p}agg AS (SELECT doc_id,
       |    string_agg(piece_in, ' ' ORDER BY wi) AS body_in,
       |    string_agg(piece_tg, ' ' ORDER BY wi) AS body_tg
       |  FROM ${p}pieces GROUP BY doc_id),
       |${p}fin AS (SELECT t.doc_id,
       |    CAST(len(t.ws) // $window AS INT) AS nw, len(t.ws) AS n,
       |    CASE WHEN len(t.ws) < $window THEN array_to_string(t.ws, ' ')
       |      WHEN (len(t.ws) // $window) * $window < len(t.ws)
       |        THEN a.body_in || ' ' || array_to_string(
       |          t.ws[(len(t.ws) // $window) * $window + 1 : len(t.ws)], ' ')
       |      ELSE a.body_in END AS instr,
       |    CASE WHEN len(t.ws) < $window THEN '<extra_id_0>'
       |      ELSE a.body_tg || ' <extra_id_' ||
       |        CAST(len(t.ws) // $window AS VARCHAR) || '>' END AS tgstr
       |  FROM dns t LEFT JOIN ${p}agg a USING (doc_id)
       |  WHERE t.d = $dsel)""".stripMargin
  }

  private def ul2Oracle: String =
    s"""WITH tok AS (SELECT doc_id,
       |    string_split_regex(trim(lower(text)), '\\s+') AS ws
       |  FROM documents),
       |dns AS (SELECT doc_id, ws,
       |    ('0x' || substr(md5('ul2:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |      ::BIGINT % 3 AS d
       |  FROM tok),
       |${spanChainSql("r_", 3, 20, "ul2:r:", 0)},
       |${spanChainSql("x_", 8, 16, "ul2:x:", 1)},
       |s_fin AS (SELECT doc_id, len(ws) AS n,
       |    CASE WHEN len(ws) >= 2 THEN CAST(
       |      ('0x' || substr(md5('ul2:s:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |        ::BIGINT % (len(ws) - 1) + 1 AS INT)
       |      ELSE len(ws) END AS p, ws
       |  FROM dns WHERE d = 2),
       |s_str AS (SELECT doc_id, n, p,
       |    array_to_string(ws[1:p], ' ') || ' <extra_id_0>' AS instr,
       |    CASE WHEN p < n THEN '<extra_id_0> ' ||
       |        array_to_string(ws[p+1:n], ' ') || ' <extra_id_1>'
       |      ELSE '<extra_id_0> <extra_id_1>' END AS tgstr
       |  FROM s_fin)
       |SELECT doc_id, 'R' AS denoiser, CAST(nw AS BIGINT) AS n_spans,
       |  CAST(n - 2 * nw AS BIGINT) AS n_inputs,
       |  CAST(4 * nw + 1 AS BIGINT) AS n_targets,
       |  md5(instr) AS inputs_md5, md5(tgstr) AS targets_md5
       |FROM r_fin
       |UNION ALL
       |SELECT doc_id, 'X', CAST(nw AS BIGINT),
       |  CAST(n - 7 * nw AS BIGINT), CAST(9 * nw + 1 AS BIGINT),
       |  md5(instr), md5(tgstr)
       |FROM x_fin
       |UNION ALL
       |SELECT doc_id, 'S', 1, CAST(p + 1 AS BIGINT),
       |  CAST(n - p + 2 AS BIGINT), md5(instr), md5(tgstr)
       |FROM s_str
       |ORDER BY doc_id""".stripMargin

  override val oracle: Map[String, String] = Map(
    "corpus_datasheet" -> datasheetOracle,
    "text_ul2_mixture" -> ul2Oracle,
    "text_pii_detect" -> detectOracle,
    "text_pii_redact" -> redactOracle,
    "text_decontaminate" -> decontamOracle,
    "text_decontaminate_fuzzy" -> fuzzyOracle,
    "text_span_corrupt" -> spanCorruptOracle
  )
}

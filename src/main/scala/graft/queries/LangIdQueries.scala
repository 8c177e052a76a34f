package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.LangIdOps

/** Trained multiclass language ID over a committed multilingual fixture
  * corpus — the first gate of a real curation funnel (CCNet §3.1 runs
  * fastText LID before anything else), here as the engine's integer-state
  * one-vs-rest classifier over hashed char trigrams so the DuckDB oracle
  * replays EVERY training round and the final argmax classification.
  *
  * The synthetic `documents` table's text is language-uncorrelated (the
  * `lang` column is a label, the words are the same English-ish pool), so
  * a REAL train/evaluate demonstration needs real language text. Round 10
  * widened the corpus from 4 Western-European languages / 25 held-out
  * sentences to TWELVE languages across four scripts — Latin (en, de, fr,
  * es, it, pt, nl, sv), Cyrillic (ru), Arabic (ar), and CJK (zh, ja) —
  * with 72 sentences per language (864 total), split 75% train / 25%
  * held-out by `doc_id % 4` (216 held-out — enough to distinguish 90%
  * from 70% accuracy, which 25 sentences could not). Sentences are
  * composed deterministically from hand-written per-language phrase pools
  * (subject/verb/object/adverbial, pool sizes 8/9/11/13 — coprime strides
  * make all 72 compositions distinct); the composition is not always
  * perfectly idiomatic, but the orthography, function words, and script
  * statistics — exactly what char-trigram LID keys on — are real.
  * LangIdSpec gates ≥ 90% held-out accuracy and per-language wins over
  * the marker-word baseline (which cannot emit most of these languages).
  */
object LangIdQueries extends QueryPack {

  /** Training rounds; oracle CTEs are generated for the same count. */
  val LangIdRounds = 12

  val NumBuckets = 512

  /** Class names sorted — index = class id on both engines. */
  val LangClasses: Seq[String] =
    Seq("ar", "de", "en", "es", "fr", "it", "ja", "nl", "pt", "ru", "sv", "zh")

  /** Per-language phrase pools: subjects(8), verbs(9), objects(11),
    * adverbials(13), with the word separator and phrase order of the
    * language (SOV-ish tail placement for ja/zh).
    */
  private case class Pools(sep: String, order: String, s: Seq[String],
      v: Seq[String], o: Seq[String], t: Seq[String])

  private val pools: Map[String, Pools] = Map(
    "en" -> Pools(" ", "svot",
      Seq("the old man", "my sister", "the young teacher", "our neighbour",
        "the little girl", "a tired worker", "the tall stranger",
        "her best friend"),
      Seq("watches", "bought", "will bring", "quietly reads", "found",
        "carries", "forgot", "is holding", "sells"),
      Seq("the fresh bread", "a small book", "the wooden chair",
        "a cup of tea", "the green garden", "an open window",
        "the heavy box", "a warm coat", "the silver key", "a long letter",
        "the quiet street"),
      Seq("near the river", "before the storm", "every single morning",
        "after the long meeting", "in the old town", "under the bright moon",
        "during the cold winter", "behind the white house",
        "at the busy market", "without any doubt", "beside the deep lake",
        "on a rainy evening", "close to the harbour")),
    "de" -> Pools(" ", "svot",
      Seq("der alte mann", "meine schwester", "die junge lehrerin",
        "unser nachbar", "das kleine mädchen", "ein müder arbeiter",
        "der große fremde", "ihre beste freundin"),
      Seq("beobachtet", "kaufte", "wird bringen", "liest leise", "fand",
        "trägt", "vergaß", "hält gerade", "verkauft"),
      Seq("das frische brot", "ein kleines buch", "den hölzernen stuhl",
        "eine tasse tee", "den grünen garten", "ein offenes fenster",
        "die schwere kiste", "einen warmen mantel", "den silbernen schlüssel",
        "einen langen brief", "die stille straße"),
      Seq("am fluss", "vor dem sturm", "jeden einzelnen morgen",
        "nach der langen sitzung", "in der alten stadt",
        "unter dem hellen mond", "im kalten winter",
        "hinter dem weißen haus", "auf dem belebten markt",
        "ohne jeden zweifel", "neben dem tiefen see",
        "an einem regnerischen abend", "nahe dem hafen")),
    "fr" -> Pools(" ", "svot",
      Seq("le vieil homme", "ma sœur", "la jeune institutrice",
        "notre voisin", "la petite fille", "un ouvrier fatigué",
        "le grand étranger", "sa meilleure amie"),
      Seq("regarde", "a acheté", "apportera", "lit doucement", "a trouvé",
        "porte", "a oublié", "tient", "vend"),
      Seq("le pain frais", "un petit livre", "la chaise en bois",
        "une tasse de thé", "le jardin vert", "une fenêtre ouverte",
        "la boîte lourde", "un manteau chaud", "la clé argentée",
        "une longue lettre", "la rue tranquille"),
      Seq("près de la rivière", "avant l'orage", "chaque matin",
        "après la longue réunion", "dans la vieille ville",
        "sous la lune claire", "pendant l'hiver froid",
        "derrière la maison blanche", "au marché animé", "sans aucun doute",
        "au bord du lac profond", "par un soir pluvieux", "à côté du port")),
    "es" -> Pools(" ", "svot",
      Seq("el viejo señor", "mi hermana", "la joven maestra",
        "nuestro vecino", "la niña pequeña", "un obrero cansado",
        "el extraño alto", "su mejor amiga"),
      Seq("observa", "compró", "traerá", "lee despacio", "encontró",
        "lleva", "olvidó", "sostiene", "vende"),
      Seq("el pan fresco", "un libro pequeño", "la silla de madera",
        "una taza de té", "el jardín verde", "una ventana abierta",
        "la caja pesada", "un abrigo caliente", "la llave plateada",
        "una carta larga", "la calle tranquila"),
      Seq("cerca del río", "antes de la tormenta", "cada mañana",
        "después de la larga reunión", "en el pueblo viejo",
        "bajo la luna clara", "durante el invierno frío",
        "detrás de la casa blanca", "en el mercado animado",
        "sin ninguna duda", "junto al lago profundo",
        "en una tarde lluviosa", "al lado del puerto")),
    "it" -> Pools(" ", "svot",
      Seq("il vecchio signore", "mia sorella", "la giovane maestra",
        "il nostro vicino", "la bambina piccola", "un operaio stanco",
        "lo straniero alto", "la sua migliore amica"),
      Seq("osserva", "ha comprato", "porterà", "legge piano", "ha trovato",
        "porta", "ha dimenticato", "tiene", "vende"),
      Seq("il pane fresco", "un piccolo libro", "la sedia di legno",
        "una tazza di tè", "il giardino verde", "una finestra aperta",
        "la scatola pesante", "un cappotto caldo", "la chiave argentata",
        "una lunga lettera", "la strada tranquilla"),
      Seq("vicino al fiume", "prima del temporale", "ogni mattina",
        "dopo la lunga riunione", "nella vecchia città",
        "sotto la luna chiara", "durante il freddo inverno",
        "dietro la casa bianca", "al mercato affollato",
        "senza alcun dubbio", "in riva al lago profondo",
        "in una sera piovosa", "accanto al porto")),
    "pt" -> Pools(" ", "svot",
      Seq("o velho senhor", "a minha irmã", "a jovem professora",
        "o nosso vizinho", "a menina pequena", "um operário cansado",
        "o estranho alto", "a sua melhor amiga"),
      Seq("observa", "comprou", "vai trazer", "lê devagar", "encontrou",
        "carrega", "esqueceu", "segura", "vende"),
      Seq("o pão fresco", "um livro pequeno", "a cadeira de madeira",
        "uma chávena de chá", "o jardim verde", "uma janela aberta",
        "a caixa pesada", "um casaco quente", "a chave prateada",
        "uma carta longa", "a rua tranquila"),
      Seq("perto do rio", "antes da tempestade", "todas as manhãs",
        "depois da longa reunião", "na cidade velha", "sob a lua clara",
        "durante o inverno frio", "atrás da casa branca",
        "no mercado movimentado", "sem qualquer dúvida",
        "à beira do lago fundo", "numa tarde chuvosa", "ao lado do porto")),
    "nl" -> Pools(" ", "svot",
      Seq("de oude man", "mijn zus", "de jonge lerares", "onze buurman",
        "het kleine meisje", "een vermoeide arbeider",
        "de lange vreemdeling", "haar beste vriendin"),
      Seq("bekijkt", "kocht", "zal brengen", "leest rustig", "vond",
        "draagt", "vergat", "houdt vast", "verkoopt"),
      Seq("het verse brood", "een klein boek", "de houten stoel",
        "een kopje thee", "de groene tuin", "een open raam",
        "de zware doos", "een warme jas", "de zilveren sleutel",
        "een lange brief", "de stille straat"),
      Seq("bij de rivier", "voor de storm", "elke ochtend",
        "na de lange vergadering", "in de oude stad",
        "onder de heldere maan", "tijdens de koude winter",
        "achter het witte huis", "op de drukke markt",
        "zonder enige twijfel", "naast het diepe meer",
        "op een regenachtige avond", "dicht bij de haven")),
    "sv" -> Pools(" ", "svot",
      Seq("den gamle mannen", "min syster", "den unga läraren",
        "vår granne", "den lilla flickan", "en trött arbetare",
        "den långe främlingen", "hennes bästa vän"),
      Seq("betraktar", "köpte", "ska hämta", "läser tyst", "hittade",
        "bär", "glömde", "håller", "säljer"),
      Seq("det färska brödet", "en liten bok", "trästolen", "en kopp te",
        "den gröna trädgården", "ett öppet fönster", "den tunga lådan",
        "en varm rock", "den silverfärgade nyckeln", "ett långt brev",
        "den tysta gatan"),
      Seq("vid floden", "före stormen", "varje morgon",
        "efter det långa mötet", "i den gamla staden",
        "under den klara månen", "under den kalla vintern",
        "bakom det vita huset", "på den livliga marknaden",
        "utan minsta tvivel", "bredvid den djupa sjön", "en regnig kväll",
        "nära hamnen")),
    "ru" -> Pools(" ", "svot",
      Seq("старый человек", "моя сестра", "молодая учительница",
        "наш сосед", "маленькая девочка", "усталый рабочий",
        "высокий незнакомец", "её лучшая подруга"),
      Seq("наблюдает", "купила", "принесёт", "тихо читает", "нашла",
        "несёт", "забыла", "держит", "продаёт"),
      Seq("свежий хлеб", "маленькую книгу", "деревянный стул",
        "чашку чая", "зелёный сад", "открытое окно", "тяжёлую коробку",
        "тёплое пальто", "серебряный ключ", "длинное письмо",
        "тихую улицу"),
      Seq("у реки", "перед грозой", "каждое утро",
        "после долгого собрания", "в старом городе", "под ясной луной",
        "холодной зимой", "за белым домом", "на шумном рынке",
        "без всякого сомнения", "возле глубокого озера",
        "дождливым вечером", "рядом с гаванью")),
    "ar" -> Pools(" ", "svot",
      Seq("الرجل العجوز", "أختي الصغيرة", "المعلمة الشابة", "جارنا الطيب",
        "الفتاة الصغيرة", "عامل متعب", "الغريب الطويل", "صديقتها المقربة"),
      Seq("يراقب", "اشترت", "سوف يجلب", "يقرأ بهدوء", "وجدت", "يحمل",
        "نسيت", "يمسك", "يبيع"),
      Seq("الخبز الطازج", "كتابا صغيرا", "الكرسي الخشبي", "كوبا من الشاي",
        "الحديقة الخضراء", "نافذة مفتوحة", "الصندوق الثقيل", "معطفا دافئا",
        "المفتاح الفضي", "رسالة طويلة", "الشارع الهادئ"),
      Seq("قرب النهر", "قبل العاصفة", "كل صباح", "بعد الاجتماع الطويل",
        "في المدينة القديمة", "تحت القمر الساطع", "خلال الشتاء البارد",
        "خلف البيت الأبيض", "في السوق المزدحم", "من دون أي شك",
        "بجانب البحيرة العميقة", "في مساء ممطر", "قرب الميناء")),
    "zh" -> Pools("", "stvo",
      Seq("那位老人", "我的姐姐", "年轻的老师", "我们的邻居", "小女孩",
        "疲惫的工人", "高个子的陌生人", "她最好的朋友"),
      Seq("观察着", "买了", "会带来", "安静地读着", "找到了", "拿着",
        "忘记了", "握着", "出售"),
      Seq("新鲜的面包", "一本小书", "木头椅子", "一杯热茶", "绿色的花园",
        "打开的窗户", "沉重的箱子", "温暖的外套", "银色的钥匙", "一封长信",
        "安静的街道"),
      Seq("在河边", "在暴风雨之前", "每天早晨", "在漫长的会议之后",
        "在古老的城里", "在明亮的月光下", "在寒冷的冬天", "在白色房子后面",
        "在热闹的市场上", "毫无疑问", "在深深的湖边", "在下雨的傍晚",
        "在港口附近")),
    "ja" -> Pools("", "stov",
      Seq("その老人は", "私の姉は", "若い先生は", "隣の人は",
        "小さな女の子は", "疲れた労働者は", "背の高い見知らぬ人は",
        "彼女の親友は"),
      Seq("見ている", "買った", "持ってくる", "静かに読んでいる",
        "見つけた", "運んでいる", "忘れた", "持っている", "売っている"),
      Seq("新しいパンを", "小さな本を", "木の椅子を", "お茶を一杯",
        "緑の庭を", "開いた窓を", "重い箱を", "暖かいコートを",
        "銀色の鍵を", "長い手紙を", "静かな通りを"),
      Seq("川のそばで", "嵐の前に", "毎朝", "長い会議の後で", "古い町で",
        "明るい月の下で", "寒い冬の間", "白い家の後ろで",
        "にぎやかな市場で", "間違いなく", "深い湖のほとりで", "雨の夜に",
        "港の近くで")))

  /** Sentences per language; held-out = doc_id % 4 == 0 (18/language). */
  val SentencesPerLang = 72

  /** (doc_id, lang, text): ids langIdx·72 + i, composed with coprime
    * strides so all 72 per-language sentences are distinct.
    */
  val fixture: Seq[(Long, String, String)] =
    LangClasses.zipWithIndex.flatMap { case (lang, li) =>
      val p = pools(lang)
      (0 until SentencesPerLang).map { i =>
        val parts = {
          val s = p.s(i % 8)
          val v = p.v((i * 4 + 1) % 9)
          val o = p.o((i * 6 + 2) % 11)
          val t = p.t((i * 10 + 3) % 13)
          p.order match {
            case "stvo" => Seq(s, t, v, o) // zh: preposed adverbial, SVO
            case "stov" => Seq(s, t, o, v) // ja: SOV
            case _ => Seq(s, v, o, t)
          }
        }
        ((li * SentencesPerLang + i).toLong, lang, parts.mkString(p.sep))
      }
    }

  /** The fixture docs as a DataFrame. */
  def fixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    fixture.toDF("doc_id", "lang", "text")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Train on doc_id % 4 != 0, classify the held-out quarter. Output:
    // true lang, predicted lang, winning integer score. Every round of
    // the OVR training and the final argmax replay in the oracle.
    "text_langid_trained" -> ((s, dir) => {
      import s.implicits._
      val docs = fixtureDf(s)
      val classDf = LangClasses.zipWithIndex
        .map { case (l, i) => (i, l) }.toDF("pred_c", "pred_lang")
      val train = docs.filter(col("doc_id") % 4 =!= 0)
      // feat feeds the freq aggregate and the cached doc layout — one
      // char-ngram hash pass instead of two
      val feat = graft.ops.DedupOps.materialize(
        LangIdOps.charNgramFeatures(train, "doc_id", "text", NumBuckets),
        "langid-feat")
      val labels = train
        .join(classDf.withColumnRenamed("pred_lang", "lang"), Seq("lang"))
        .select(col("doc_id"), col("pred_c").as("y"))
      val w = LangIdOps.trainOvr(feat, labels, "doc_id",
        numClasses = LangClasses.length, numBuckets = NumBuckets,
        rounds = LangIdRounds, lr = 1.0)
      val ho = docs.filter(col("doc_id") % 4 === 0)
      val hfeat = LangIdOps.charNgramFeatures(ho, "doc_id", "text", NumBuckets)
      LangIdOps.classifyOvr(hfeat, "doc_id", w, NumBuckets, LangClasses.length)
        .join(broadcast(classDf), Seq("pred_c"))
        .join(ho.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("pred_lang"), col("score_int"))
        .orderBy(col("doc_id"))
    }))

  private def sqlEscape(s: String): String = s.replace("'", "''")

  /** The fixture corpus as a SQL VALUES list. */
  private val fixtureValuesSql: String = fixture
    .map { case (id, lang, text) => s"($id, '$lang', '${sqlEscape(text)}')" }
    .mkString(",\n    ")

  private val classesValuesSql: String = LangClasses.zipWithIndex
    .map { case (l, i) => s"($i, '$l')" }.mkString(", ")

  /** Generated replay of every OVR round: hashed char-trigram features,
    * per-(doc, class) integer score → sigmoid → quantized error →
    * per-(bucket, class) gradient → floor-div momentum →
    * frequency-normalized update — then the held-out argmax. Round 1
    * inlines err = (0.5 − y)·10⁶ (w₀ = 0 ⇒ every score is exactly 0).
    */
  private val langIdTrainSql: String = {
    val base =
      s"""WITH docs AS MATERIALIZED (SELECT * FROM (VALUES
         |    $fixtureValuesSql) t(doc_id, lang, text)),
         |classes AS MATERIALIZED (
         |  SELECT * FROM (VALUES $classesValuesSql) t(c, cl)),
         |train AS MATERIALIZED (SELECT doc_id, lang, lower(text) AS t
         |  FROM docs WHERE doc_id % 4 <> 0),
         |grams AS MATERIALIZED (
         |  SELECT doc_id, '3:' || substr(t, i, 3) AS k
         |  FROM train, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
         |  WHERE len(t) >= 3
         |  UNION ALL
         |  SELECT doc_id, '0:bias' AS k FROM train),
         |feat AS MATERIALIZED (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('lid:' || k), 1, 15))::BIGINT % $NumBuckets AS b,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM grams GROUP BY 1, 2),
         |lab AS MATERIALIZED (SELECT tr.doc_id, c.c,
         |    CASE WHEN tr.lang = c.cl THEN 1 ELSE 0 END AS y
         |  FROM train tr CROSS JOIN classes c),
         |spine AS MATERIALIZED (SELECT b, c
         |  FROM (SELECT unnest(generate_series(0, ${NumBuckets - 1})) AS b) bs
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${LangClasses.length - 1})) AS c) cs),
         |freqs AS MATERIALIZED (SELECT s.b,
         |    CAST(greatest(coalesce(f.cnt, 0), 1) AS BIGINT) AS fq
         |  FROM (SELECT DISTINCT b FROM spine) s LEFT JOIN
         |    (SELECT b, sum(x) AS cnt FROM feat GROUP BY b) f USING (b)),
         |e1 AS MATERIALIZED (SELECT doc_id, c,
         |    CAST(floor((0.5 - y)*1e6 + 0.5) AS BIGINT) AS err FROM lab),
         |g1 AS MATERIALIZED (SELECT f.b, e.c, sum(f.x * e.err) AS gr
         |  FROM feat f JOIN e1 e USING (doc_id) GROUP BY 1, 2),
         |v1 AS MATERIALIZED (SELECT s.b, s.c,
         |    CAST(coalesce(g.gr, 0) AS BIGINT) AS v
         |  FROM spine s LEFT JOIN g1 g USING (b, c)),
         |w1 AS MATERIALIZED (SELECT v1.b, v1.c,
         |    0 - CAST(floor(CAST(v1.v AS DOUBLE) / fq + 0.5) AS BIGINT) AS w
         |  FROM v1 JOIN freqs USING (b))""".stripMargin
    val rounds = (2 to LangIdRounds).map { k =>
      val p = k - 1
      s"""s$k AS MATERIALIZED (SELECT f.doc_id, w$p.c, sum(w$p.w * f.x) AS s
         |  FROM feat f JOIN w$p USING (b) GROUP BY 1, 2),
         |e$k AS MATERIALIZED (SELECT l.doc_id, l.c,
         |    CAST(floor((1.0/(1.0 + exp(-(CAST(coalesce(s.s, 0) AS DOUBLE)/1e6)))
         |      - CAST(y AS DOUBLE))*1e6 + 0.5) AS BIGINT) AS err
         |  FROM lab l LEFT JOIN s$k s USING (doc_id, c)),
         |g$k AS MATERIALIZED (SELECT f.b, e.c, sum(f.x * e.err) AS gr
         |  FROM feat f JOIN e$k e USING (doc_id) GROUP BY 1, 2),
         |v$k AS MATERIALIZED (SELECT v$p.b, v$p.c,
         |    CAST(CAST(floor(v$p.v * 9 / 10.0) AS BIGINT)
         |      + coalesce(g.gr, 0) AS BIGINT) AS v
         |  FROM v$p LEFT JOIN g$k g USING (b, c)),
         |w$k AS MATERIALIZED (SELECT w$p.b, w$p.c,
         |    w$p.w - CAST(floor(CAST(v$k.v AS DOUBLE) / fq + 0.5) AS BIGINT) AS w
         |  FROM w$p JOIN v$k USING (b, c) JOIN freqs USING (b))""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  override val oracle: Map[String, String] = Map(
    "text_langid_trained" ->
      s"""$langIdTrainSql,
         |ho AS MATERIALIZED (SELECT doc_id, lang, lower(text) AS t
         |  FROM docs WHERE doc_id % 4 = 0),
         |hgrams AS MATERIALIZED (
         |  SELECT doc_id, '3:' || substr(t, i, 3) AS k
         |  FROM ho, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
         |  WHERE len(t) >= 3
         |  UNION ALL
         |  SELECT doc_id, '0:bias' AS k FROM ho),
         |hfeat AS MATERIALIZED (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('lid:' || k), 1, 15))::BIGINT % $NumBuckets AS b,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM hgrams GROUP BY 1, 2),
         |scores AS MATERIALIZED (SELECT f.doc_id, w.c,
         |    CAST(sum(w.w * f.x) AS BIGINT) AS score
         |  FROM hfeat f JOIN w$LangIdRounds w USING (b) GROUP BY 1, 2),
         |best AS (SELECT doc_id, c, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, c ASC) AS rn FROM scores)
         |SELECT CAST(h.doc_id AS BIGINT) AS doc_id, h.lang,
         |  cl.cl AS pred_lang, b.score AS score_int
         |FROM ho h JOIN best b ON b.doc_id = h.doc_id AND b.rn = 1
         |JOIN classes cl ON cl.c = b.c
         |ORDER BY doc_id""".stripMargin)
}

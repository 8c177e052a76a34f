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
  * a REAL train/evaluate demonstration needs real language text: 100
  * hand-written fixture sentences, 25 per language (en/de/fr/es), split
  * 75 train / 25 held-out by `doc_id % 4`. LangIdSpec asserts the trained
  * model beats the marker-word argmax baseline on the held-out split.
  */
object LangIdQueries extends QueryPack {

  /** Training rounds; oracle CTEs are generated for the same count. */
  val LangIdRounds = 12

  val NumBuckets = 256

  /** Class names sorted — index = class id on both engines. */
  val LangClasses: Seq[String] = Seq("de", "en", "es", "fr")

  /** (doc_id, lang, text): ids 0-24 en, 25-49 de, 50-74 fr, 75-99 es;
    * held-out = doc_id % 4 == 0 (6-7 docs per language).
    */
  val fixture: Seq[(Long, String, String)] = {
    val en = Seq(
      "the old man walked slowly along the river bank and watched the boats",
      "she bought fresh bread from the market before the rain started",
      "we have been waiting for the train since early this morning",
      "the children played in the garden until the sun went down",
      "he could not remember where he had left his keys yesterday",
      "a warm wind blew across the fields during the long afternoon",
      "they decided to build a small house near the edge of the forest",
      "my sister reads a new book almost every single week",
      "the teacher asked the students to finish their work quietly",
      "dark clouds gathered over the mountains before the storm arrived",
      "i would like a cup of tea with a little milk please",
      "the dog barked at the stranger who stood by the gate",
      "many people believe that music makes the world a better place",
      "the library closes early on friday evenings in the winter",
      "his grandfather told wonderful stories about the old days",
      "fresh snow covered the roofs of the quiet little town",
      "she opened the window to let the cool evening air inside",
      "the farmers harvested the wheat before the first frost came",
      "a narrow path led through the woods to the hidden lake",
      "the committee will discuss the new plans next tuesday",
      "he fixed the broken chair with a hammer and some nails",
      "the young artist painted the bridge at sunrise every day",
      "we watched the ships sail slowly out of the harbour",
      "her voice sounded tired after the long meeting yesterday",
      "the bakery on the corner sells the best cakes in town")
    val de = Seq(
      "der alte mann ging langsam am fluss entlang und sah den booten zu",
      "sie kaufte frisches brot auf dem markt bevor der regen begann",
      "wir warten seit dem frühen morgen auf den zug nach berlin",
      "die kinder spielten im garten bis die sonne unterging",
      "er konnte sich nicht erinnern wo er seine schlüssel gelassen hatte",
      "ein warmer wind wehte über die felder am langen nachmittag",
      "sie beschlossen ein kleines haus am rand des waldes zu bauen",
      "meine schwester liest fast jede woche ein neues buch",
      "der lehrer bat die schüler ihre arbeit leise zu beenden",
      "dunkle wolken sammelten sich über den bergen vor dem sturm",
      "ich möchte bitte eine tasse tee mit etwas milch",
      "der hund bellte den fremden an der am tor stand",
      "viele menschen glauben dass musik die welt besser macht",
      "die bibliothek schließt freitags im winter schon früh",
      "sein großvater erzählte wunderbare geschichten von früher",
      "frischer schnee bedeckte die dächer der kleinen stadt",
      "sie öffnete das fenster um die kühle abendluft hereinzulassen",
      "die bauern ernteten den weizen vor dem ersten frost",
      "ein schmaler pfad führte durch den wald zum versteckten see",
      "der ausschuss wird die neuen pläne am dienstag besprechen",
      "er reparierte den kaputten stuhl mit hammer und nägeln",
      "die junge künstlerin malte die brücke jeden morgen bei sonnenaufgang",
      "wir sahen den schiffen zu wie sie langsam den hafen verließen",
      "ihre stimme klang müde nach der langen sitzung gestern",
      "die bäckerei an der ecke verkauft die besten kuchen der stadt")
    val fr = Seq(
      "le vieil homme marchait lentement le long de la rivière",
      "elle a acheté du pain frais au marché avant la pluie",
      "nous attendons le train depuis tôt ce matin",
      "les enfants jouaient dans le jardin jusqu'au coucher du soleil",
      "il ne se souvenait plus où il avait laissé ses clés",
      "un vent chaud soufflait sur les champs pendant l'après-midi",
      "ils ont décidé de construire une petite maison près de la forêt",
      "ma sœur lit un nouveau livre presque chaque semaine",
      "le professeur a demandé aux élèves de finir leur travail",
      "des nuages sombres se rassemblaient sur les montagnes avant l'orage",
      "je voudrais une tasse de thé avec un peu de lait",
      "le chien aboyait contre l'étranger qui se tenait près du portail",
      "beaucoup de gens croient que la musique rend le monde meilleur",
      "la bibliothèque ferme tôt le vendredi soir en hiver",
      "son grand-père racontait de merveilleuses histoires du passé",
      "la neige fraîche couvrait les toits de la petite ville",
      "elle a ouvert la fenêtre pour laisser entrer l'air du soir",
      "les fermiers ont récolté le blé avant les premières gelées",
      "un sentier étroit menait à travers les bois jusqu'au lac",
      "le comité discutera des nouveaux plans mardi prochain",
      "il a réparé la chaise cassée avec un marteau et des clous",
      "la jeune artiste peignait le pont chaque matin au lever du soleil",
      "nous avons regardé les bateaux quitter lentement le port",
      "sa voix semblait fatiguée après la longue réunion d'hier",
      "la boulangerie du coin vend les meilleurs gâteaux de la ville")
    val es = Seq(
      "el viejo caminaba despacio por la orilla del río mirando los barcos",
      "ella compró pan fresco en el mercado antes de la lluvia",
      "esperamos el tren desde muy temprano esta mañana",
      "los niños jugaban en el jardín hasta la puesta del sol",
      "no podía recordar dónde había dejado sus llaves ayer",
      "un viento cálido soplaba sobre los campos durante la tarde",
      "decidieron construir una casa pequeña cerca del bosque",
      "mi hermana lee un libro nuevo casi cada semana",
      "el maestro pidió a los alumnos que terminaran su trabajo",
      "nubes oscuras se juntaban sobre las montañas antes de la tormenta",
      "quisiera una taza de té con un poco de leche por favor",
      "el perro ladraba al extraño que estaba junto a la puerta",
      "mucha gente cree que la música hace el mundo mejor",
      "la biblioteca cierra temprano los viernes en invierno",
      "su abuelo contaba historias maravillosas de otros tiempos",
      "la nieve fresca cubría los tejados del pueblo tranquilo",
      "ella abrió la ventana para dejar entrar el aire de la noche",
      "los campesinos cosecharon el trigo antes de la primera helada",
      "un sendero estrecho llevaba por el bosque hasta el lago",
      "el comité discutirá los nuevos planes el martes próximo",
      "arregló la silla rota con un martillo y algunos clavos",
      "la joven artista pintaba el puente cada mañana al amanecer",
      "vimos los barcos salir lentamente del puerto",
      "su voz sonaba cansada después de la larga reunión de ayer",
      "la panadería de la esquina vende los mejores pasteles del pueblo")
    (en.zipWithIndex.map { case (t, i) => (i.toLong, "en", t) } ++
      de.zipWithIndex.map { case (t, i) => (25L + i, "de", t) } ++
      fr.zipWithIndex.map { case (t, i) => (50L + i, "fr", t) } ++
      es.zipWithIndex.map { case (t, i) => (75L + i, "es", t) })
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
      val feat = LangIdOps.charNgramFeatures(train, "doc_id", "text", NumBuckets)
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

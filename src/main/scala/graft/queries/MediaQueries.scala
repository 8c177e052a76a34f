package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Media-codec statistics family (round 14): color statistics from
  * JPEG chroma DC, MP3 sample decode, trained image-text gating.
  * Fixture posture: committed containers from independent encoders
  * (tools/gen_*_fixtures.py), oracles replaying the construction
  * arithmetic — never the bytes.
  */
object MediaQueries extends QueryPack {

  /** tools/gen_jpeg_fixtures.py `colorstats420`: 32×32 4:2:0,
    * block-constant Y/Cb/Cr mosaics on q₀=8 tables — every DC
    * quantizes losslessly, so jpeg_color_stats is an exact closed
    * form of the block formulas.
    */
  private val colorstats420Hex =
    "FFD8FFDB004300080C0C0E0E0E1010101012121212121414141414141616161616161618181818181818181A1A1A1A1A1A1A" +
      "1C1C1C1C1C1C1E1E1E1E1E20202020222222242426FFDB004301080C0C0E0E0E101010101212121212141414141414161616" +
      "1616161618181818181818181A1A1A1A1A1A1A1C1C1C1C1C1C1E1E1E1E1E20202020222222242426FFC00011080020002003" +
      "012200021101031101FFC40014100100000000000000000000000000000000FFC40014110100000000000000000000000000" +
      "000000FFC40017000000040000000000000000000000000002050607FFC40016010003000000000000000000000000000005" +
      "0607FFDA000C03010002110311003F0069C7A10F4BE9D823D087A72568871E843D1421823D087A72569FFFD9"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JPEG CHROMA → COLOR STATS (functions.JpegColorStats): the chroma
    // Huffman walk the luma decoder already runs lifts to dequantized
    // DC block means — per-image integer mean color + colorfulness,
    // the solid-color/grayscale-thumbnail gate. Three fixtures: the
    // color DC mosaic (exact closed forms), the blocks420 mosaic whose
    // chroma is constant (neutral Cb, Cr=90), and a pure grayscale
    // file (neutral chroma, colorfulness 0, n_blocks_c 0). The oracle
    // replays every mean from the generator's block formulas over
    // generate_series — no literal result dumps.
    "mm_image_jpeg_color" -> ((s, dir) => {
      graft.functions.JpegColorStats.register(s)
      import s.implicits._
      Seq(("colorstats420", colorstats420Hex),
          ("blocks420", ExtraQueries.jpegBlocks420Hex),
          ("gray_blocks", ExtraQueries.jpegGrayBlocksHex))
        .toDF("img", "hex")
        .selectExpr("img", "jpeg_color_stats(unhex(hex)) AS st")
        .select(col("img"),
          col("st.width").cast("long").as("width"),
          col("st.height").cast("long").as("height"),
          col("st.y_mean_milli").as("y_mean_milli"),
          col("st.cb_mean_milli").as("cb_mean_milli"),
          col("st.cr_mean_milli").as("cr_mean_milli"),
          col("st.colorfulness_milli").as("colorfulness_milli"),
          col("st.n_blocks_y").as("n_blocks_y"),
          col("st.n_blocks_c").as("n_blocks_c"))
        .orderBy(col("img"))
    }))

  override def oracle: Map[String, String] = Map(

    // block mosaics replayed arithmetically: mean-of-blocks in milli
    // units with truncating division, colorfulness = mean |chroma−128|
    "mm_image_jpeg_color" ->
      """WITH g4 AS (SELECT a.bx, b.by
        |    FROM (SELECT unnest(generate_series(0, 3)) AS bx) a,
        |         (SELECT unnest(generate_series(0, 3)) AS by) b),
        |g3 AS (SELECT a.bx, b.by
        |    FROM (SELECT unnest(generate_series(0, 3)) AS bx) a,
        |         (SELECT unnest(generate_series(0, 2)) AS by) b),
        |g2 AS (SELECT a.bx, b.by
        |    FROM (SELECT unnest(generate_series(0, 1)) AS bx) a,
        |         (SELECT unnest(generate_series(0, 1)) AS by) b),
        |cs AS (SELECT
        |    (SELECT sum((29*bx + 31*by + 40) % 256 * 1000) // 16 FROM g4) AS ym,
        |    (SELECT sum((50*bx + 70*by + 96) % 256 * 1000) // 4 FROM g2) AS cbm,
        |    (SELECT sum((90*bx + 30*by + 60) % 256 * 1000) // 4 FROM g2) AS crm,
        |    (SELECT (sum(abs((50*bx + 70*by + 96) % 256 - 128) * 1000) +
        |             sum(abs((90*bx + 30*by + 60) % 256 - 128) * 1000)) // 8
        |       FROM g2) AS cf),
        |b420 AS (SELECT
        |    (SELECT sum((29*bx + 43*by + 50) % 256 * 1000) // 16 FROM g4) AS ym),
        |gb AS (SELECT
        |    (SELECT sum((37*bx + 59*by + 23) % 256 * 1000) // 12 FROM g3) AS ym)
        |SELECT 'blocks420' AS img, CAST(32 AS BIGINT) AS width,
        |  CAST(32 AS BIGINT) AS height,
        |  CAST(ym AS BIGINT) AS y_mean_milli,
        |  CAST(128000 AS BIGINT) AS cb_mean_milli,
        |  CAST(90000 AS BIGINT) AS cr_mean_milli,
        |  CAST(38000 * 4 // 8 AS BIGINT) AS colorfulness_milli,
        |  CAST(16 AS BIGINT) AS n_blocks_y, CAST(8 AS BIGINT) AS n_blocks_c
        |FROM b420
        |UNION ALL
        |SELECT 'colorstats420', 32, 32, CAST(ym AS BIGINT),
        |  CAST(cbm AS BIGINT), CAST(crm AS BIGINT), CAST(cf AS BIGINT),
        |  16, 8
        |FROM cs
        |UNION ALL
        |SELECT 'gray_blocks', 32, 24, CAST(ym AS BIGINT),
        |  128000, 128000, 0, 12, 0
        |FROM gb
        |ORDER BY img""".stripMargin)
}

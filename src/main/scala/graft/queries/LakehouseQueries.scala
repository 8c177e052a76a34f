package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.SnapshotOps

/** Lakehouse table-layout family: versioned manifests, time-travel
  * reads — the storage seam between curation runs and reproducible
  * training sets.
  */
object LakehouseQueries extends QueryPack {

  /** Deterministic per-source-fingerprint table dir (the
    * src_csv_roundtrip caching idiom): rebuilt only when the input
    * parquet changes, so repeated Verify/Bench runs reuse the layout.
    */
  private def snapshotTable(s: SparkSession, dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val srcFiles: Seq[java.io.File] =
      if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName)
      else Seq(src)
    val fpInput = srcFiles.map(f =>
      s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_))
      .mkString
    val path = s"/tmp/graft_snaptbl_$fp"
    val done = new java.io.File(path, "_LAYOUT_DONE")
    if (!done.exists()) {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      // v1 units: the %3∈{0,1} corpus in four id-bucket units
      (0 to 3).foreach { b =>
        docs.filter(col("doc_id") % 3 =!= 2 && col("doc_id") % 4 === b)
          .write.mode("overwrite").parquet(s"$path/data/b$b")
      }
      // the append unit (late-arriving re-crawl)
      docs.filter(col("doc_id") % 3 === 2)
        .write.mode("overwrite").parquet(s"$path/data/b4")
      SnapshotOps.commitManifest(path, 1,
        Seq("data/b0", "data/b1", "data/b2", "data/b3"))
      // v2 = v1 + append(b4) − remove(b1): additions and a retirement
      // in one commit
      SnapshotOps.commitManifest(path, 2,
        Seq("data/b0", "data/b2", "data/b3", "data/b4"))
      done.createNewFile()
    }
    path
  }

  /** Delta-log table fixture (same fingerprint-cached idiom as
    * [[snapshotTable]]): four id-bucket units, three commits with an
    * add+remove in the middle one, and a checkpoint AT v1 so v2 reads
    * checkpoint+tail while v0 must ignore the later checkpoint.
    */
  private def deltaTable(s: SparkSession, dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val srcFiles: Seq[java.io.File] =
      if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName)
      else Seq(src)
    val fpInput = srcFiles.map(f =>
      s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_))
      .mkString
    val path = s"/tmp/graft_deltatbl_$fp"
    val done = new java.io.File(path, "_LAYOUT_DONE")
    if (!done.exists()) {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      (0 to 3).foreach { b =>
        docs.filter(col("doc_id") % 4 === b)
          .write.mode("overwrite").parquet(s"$path/data/b$b")
      }
      SnapshotOps.deltaCommit(path, 0, Seq("data/b0", "data/b1"))
      SnapshotOps.deltaCommit(path, 1, adds = Seq("data/b2"),
        removes = Seq("data/b1"))
      SnapshotOps.deltaCheckpoint(s, path, 1)
      SnapshotOps.deltaCommit(path, 2, Seq("data/b3"))
      done.createNewFile()
    }
    path
  }

  /** TFRecord shard fixtures (tools/gen_tfrecord_fixtures.py —
    * from-polynomial CRC32C, independent of the decoder's JDK
    * implementation) plus a deliberately torn copy. */
  private val tfrecordFixtures = Seq(
    ("three_examples",
      "2800000000000000FF70164A70726574656E642073657269616C697A65642074662E4578616D706C65206E756D626572" +
      "206F6E654FD640A90004000000000000683E399103FB43CA34A35F55B9F9533268E5C6E9BB3B4758E53EFB529D9B8BB3" +
      "CDE60D969F876998390F348B7F75BC86ECB16D39E5DAEDBA01353209CF02E0FDBB0659F5E34313E13FFBA4CA631EDD9C" +
      "B2D63BEBE41745F1BD0BDCE8B5FFA39B1E5049996FD1C6DFB167F550CA120914B1E5B10C740E5AE5E8A1A88D4637DD6B" +
      "E3D5A163DF286630FAD8242627E3B85DA2B9A4271CFD0B7E0AF1960CA7A0FF4CBF95E0ED024ABC30909DB998D372AC34" +
      "B3E2AAD6A739CD48AB950CA1419B46D92226F3569F7E7CE0819E1C1E724798A4B28814D424A9F49122D06AE0648FA3AF" +
      "A2E16B99AA0ACB477E9D6BD6C96C448AB7D9608E5DC1760EE01A206965FF1E2BE6833357066B404E6F07CD6B1EC43194" +
      "55F33232DCF52FF8412443133323BBAA1760C231C00D6E2576394A8F17E3C0C14546C44361B8A8ADD668A1A57F02DF50" +
      "CB05D490CD88E62584461CE7136AD3659486DFA7E5F35BD6322A57FE4E0D374170639BFB4653BB2B6348887D08DEF9A8" +
      "4E0D4E3A11FD78033807E7CF203419663B7879E826038A82432131B1E2020C86AEC8D4DF411429CDE8FBC9C584826DB2" +
      "997A2E0B8700FE3BC6C9EDAC5FB05A53C99D9F0FFC595A77ABEB863D3D3511D9117C95285EBFD5148F15194B6B2E48B9" +
      "BA5840EEF345FA1221AE4777D956BB9BBF9AD264B87C62D75000719AFE10783B53101DD780A4C6196D97EE41D1D5627F" +
      "35A10B167873963A517562BA7A876F3646116A719E0D8596057AAA2F261E2116EF389C17949586438597E25A8641B860" +
      "D148983D6BDED5C2FB3B0B467B359CBD3D8ACC97D1C86926118AC1A569BD89CAF32751A925B26D25CAD29733B64EE7DB" +
      "B26D0367009A26A65DBF82B2EF2BEA640E14E7A2A059E236A7D7E3F41CE5E6A50F0C7BD1BD7E52F89DB5AC77BDBB59F9" +
      "1C4A4DA14C54EB804C882012ED5A395EB1117CE3A981B725E24EA4393380EFB15A4A8940ADCD28404357384D7F069B17" +
      "7E4E09462B875DE5A48BFE7EC8C2031872C0AB4959106785B5ED60CADFD7CAF153E31C8BA7020807D0E1527DE6DA5395" +
      "2EED4247758267D4B7B72BCDEE68EBDEEEE956FC402B425057F8950D488CA6749D8E5198B11E1D4818EE20E1F99972E2" +
      "5F9E38EE16BAE0D737FAE81AD9DBF162C849C2FEC96B7C31AA20D38FDCAC80D4F109D493FD2403EE0B5CF2960A6AFE6F" +
      "DA905DAE7BF5B8381339748A9AD6CF9E99250549C04BA17C1724B4E4B94D9091CE123DE40B480BFE190AE7657E6214FF" +
      "E48C236DD9C189E5D7B2DCD1856608A09D9DC4F13D65F73D6E575BC1B543E4CD649A37AAB37AE763060C9BFFB04088DE" +
      "EC8B10CFD0C2146AFF5B59FE6E2D1AB49920B2CA630749EE34A6FBDA7D649BF333A7F22F7EBC49D7BED25F6F7434BA76" +
      "6281A10BE8502697CAA9B30407315A6D739C600B79939C50F185F3054CDD5AB1EB6761EB1AC77B3A0000000000000000" +
      "29039807D8EA82A2"),
    ("many_small",
      "0D000000000000003C37B8347265632030207061796C6F6164B66D4C3B0D000000000000003C37B83472656320312070" +
      "61796C6F61647B55DBD60D000000000000003C37B8347265632032207061796C6F6164D5448DCE0D000000000000003C" +
      "37B8347265632033207061796C6F6164589C1E230D000000000000003C37B8347265632034207061796C6F6164192A31" +
      "BF0D000000000000003C37B8347265632035207061796C6F616414C2C2520D000000000000003C37B834726563203620" +
      "7061796C6F61643ACFF04A0D000000000000003C37B8347265632037207061796C6F6164F7F67EA70D00000000000000" +
      "3C37B8347265632038207061796C6F616411DD69200D000000000000003C37B8347265632039207061796C6F61641C05" +
      "FA730E00000000000000C5E5693F726563203130207061796C6F61648B39C6620E00000000000000C5E5693F72656320" +
      "3131207061796C6F6164A691550F0E00000000000000C5E5693F726563203132207061796C6F6164688003170E000000" +
      "00000000C5E5693F726563203133207061796C6F6164C568947A0E00000000000000C5E5693F72656320313420706179" +
      "6C6F616404DEA7E60E00000000000000C5E5693F726563203135207061796C6F61642906388B0E00000000000000C5E5" +
      "693F726563203136207061796C6F6164E7126A930E00000000000000C5E5693F726563203137207061796C6F61644AAB" +
      "F9FE0E00000000000000C5E5693F726563203138207061796C6F61642C29EFC70E00000000000000C5E5693F72656320" +
      "3139207061796C6F616401C1802C0E00000000000000C5E5693F726563203230207061796C6F616476E902D70E000000" +
      "00000000C5E5693F726563203231207061796C6F6164BB01713B0E00000000000000C5E5693F72656320323220706179" +
      "6C6F616495103F230E00000000000000C5E5693F726563203233207061796C6F616498B8B0CE0E00000000000000C5E5" +
      "693F726563203234207061796C6F6164D92D9B520E00000000000000C5E5693F726563203235207061796C6F61645496" +
      "0CBF0E00000000000000C5E5693F726563203236207061796C6F6164FA825EA70E00000000000000C5E5693F72656320" +
      "3237207061796C6F6164375BCD4A0E00000000000000C5E5693F726563203238207061796C6F61645179D3730E000000" +
      "00000000C5E5693F726563203239207061796C6F6164DC5044200E00000000000000C5E5693F72656320333020706179" +
      "6C6F61640A53B7650E00000000000000C5E5693F726563203331207061796C6F6164276B28120E00000000000000C5E5" +
      "693F726563203332207061796C6F6164E99D7A1A0E00000000000000C5E5693F726563203333207061796C6F61644446" +
      "E97D0E00000000000000C5E5693F726563203334207061796C6F616485C0D6E90E00000000000000C5E5693F72656320" +
      "3335207061796C6F6164A828458E0E00000000000000C5E5693F726563203336207061796C6F616466F912960E000000" +
      "00000000C5E5693F726563203337207061796C6F6164CBD184010E00000000000000C5E5693F72656320333820706179" +
      "6C6F6164AD039EC80E00000000000000C5E5693F726563203339207061796C6F616480DB0D2D0E00000000000000C5E5" +
      "693F726563203430207061796C6F61649D89897E0E00000000000000C5E5693F726563203431207061796C6F61649061" +
      "1A130E00000000000000C5E5693F726563203432207061796C6F6164BE30480B0E00000000000000C5E5693F72656320" +
      "3433207061796C6F61647398D7660E00000000000000C5E5693F726563203434207061796C6F6164320EE4FA0E000000" +
      "00000000C5E5693F726563203435207061796C6F6164FFB573970E00000000000000C5E5693F72656320343620706179" +
      "6C6F616451E3258F0E00000000000000C5E5693F726563203437207061796C6F6164DCFAB5E20E00000000000000C5E5" +
      "693F726563203438207061796C6F6164FAD8ACDB0E00000000000000C5E5693F726563203439207061796C6F616437F1" +
      "3A38"),
    ("torn",
      "2800000000000000FF70164A70726574656E642072657269616C697A65642074662E4578616D706C65206E756D626572" +
      "206F6E654FD640A90004000000000000683E399103FB43CA34A35F55B9F9533268E5C6E9BB3B4758E53EFB529D9B8BB3" +
      "CDE60D969F876998390F348B7F75BC86ECB16D39E5DAEDBA01353209CF02E0FDBB0659F5E34313E13FFBA4CA631EDD9C" +
      "B2D63BEBE41745F1BD0BDCE8B5FFA39B1E5049996FD1C6DFB167F550CA120914B1E5B10C740E5AE5E8A1A88D4637DD6B" +
      "E3D5A163DF286630FAD8242627E3B85DA2B9A4271CFD0B7E0AF1960CA7A0FF4CBF95E0ED024ABC30909DB998D372AC34" +
      "B3E2AAD6A739CD48AB950CA1419B46D92226F3569F7E7CE0819E1C1E724798A4B28814D424A9F49122D06AE0648FA3AF" +
      "A2E16B99AA0ACB477E9D6BD6C96C448AB7D9608E5DC1760EE01A206965FF1E2BE6833357066B404E6F07CD6B1EC43194" +
      "55F33232DCF52FF8412443133323BBAA1760C231C00D6E2576394A8F17E3C0C14546C44361B8A8ADD668A1A57F02DF50" +
      "CB05D490CD88E62584461CE7136AD3659486DFA7E5F35BD6322A57FE4E0D374170639BFB4653BB2B6348887D08DEF9A8" +
      "4E0D4E3A11FD78033807E7CF203419663B7879E826038A82432131B1E2020C86AEC8D4DF411429CDE8FBC9C584826DB2" +
      "997A2E0B8700FE3BC6C9EDAC5FB05A53C99D9F0FFC595A77ABEB863D3D3511D9117C95285EBFD5148F15194B6B2E48B9" +
      "BA5840EEF345FA1221AE4777D956BB9BBF9AD264B87C62D75000719AFE10783B53101DD780A4C6196D97EE41D1D5627F" +
      "35A10B167873963A517562BA7A876F3646116A719E0D8596057AAA2F261E2116EF389C17949586438597E25A8641B860" +
      "D148983D6BDED5C2FB3B0B467B359CBD3D8ACC97D1C86926118AC1A569BD89CAF32751A925B26D25CAD29733B64EE7DB" +
      "B26D0367009A26A65DBF82B2EF2BEA640E14E7A2A059E236A7D7E3F41CE5E6A50F0C7BD1BD7E52F89DB5AC77BDBB59F9" +
      "1C4A4DA14C54EB804C882012ED5A395EB1117CE3A981B725E24EA4393380EFB15A4A8940ADCD28404357384D7F069B17" +
      "7E4E09462B875DE5A48BFE7EC8C2031872C0AB4959106785B5ED60CADFD7CAF153E31C8BA7020807D0E1527DE6DA5395" +
      "2EED4247758267D4B7B72BCDEE68EBDEEEE956FC402B425057F8950D488CA6749D8E5198B11E1D4818EE20E1F99972E2" +
      "5F9E38EE16BAE0D737FAE81AD9DBF162C849C2FEC96B7C31AA20D38FDCAC80D4F109D493FD2403EE0B5CF2960A6AFE6F" +
      "DA905DAE7BF5B8381339748A9AD6CF9E99250549C04BA17C1724B4E4B94D9091CE123DE40B480BFE190AE7657E6214FF" +
      "E48C236DD9C189E5D7B2DCD1856608A09D9DC4F13D65F73D6E575BC1B543E4CD649A37AAB37AE763060C9BFFB04088DE" +
      "EC8B10CFD0C2146AFF5B59FE6E2D1AB49920B2CA630749EE34A6FBDA7D649BF333A7F22F7EBC49D7BED25F6F7434BA76" +
      "6281A10BE8502697CAA9B30407315A6D739C600B79939C50F185F3054CDD5AB1EB6761EB1AC77B3A0000000000000000" +
      "29039807D8EA82A2"),
  )

  /** tf.Example wire-format fixtures (tools/gen_tfexample_fixtures.py
    * — an independent from-scratch protobuf writer, no library) with
    * pinned per-feature rows: packed + unpacked numeric lists, unknown
    * fields that must SKIP, empty messages, and two refusal shapes
    * (torn length, contradicting wire type). */
  private val tfexampleFixtures = Seq(
    ("basic",
      "0A560A1D0A06746F6B656E7312131A110A0F0301040105F7FFFFFFFFFFFFFFFF010A190A0573636F72651210120E0A0C" +
      "0000003F0000A0BF0000C8420A1A0A057469746C6512110A0F0A0B68656C6C6F20776F726C640A00"),
    ("unpacked",
      "0A240A140A03696473120D1A0B08070800088080808080200A0C0A0177120712050D00003040"),
    ("unknown_fields",
      "0A1D0A0A0A017812051A030A012A48E7074101020304050607083DAABBCCDD1005"),
    ("empty",
      "0A00"),
    ("empty_lists",
      "0A1D0A0E0A086E6F6E655F696E7412021A000A0B0A076E6F5F6B696E641200"),
    ("torn",
      "0A560A1D0A06746F6B656E7312131A110A0F0301040105F7FFFFFFFFFFFFFFFF010A190A0573636F72651210120E0A0C" +
      "0000003F0000A0BF0000C8420A1A0A057469746C6512110A0F0A0B68656C6C6F20776F72"),
    ("badwire",
      "0A100A0E0A0362616412071A050D01020304"))

  private val tfexamplePinnedSql = Seq(
    "('basic', 'tokens', 'int64', 6, '3,1,4,1,5,-9', '', ''),",
    "('basic', 'score', 'float', 3, '', '0.5,-1.25,100.0', ''),",
    "('basic', 'title', 'bytes', 2, '', '', " +
      "'5eb63bbbe01eeed093cb22bb8f5acdc3,d41d8cd98f00b204e9800998ecf8427e'),",
    "('unpacked', 'ids', 'int64', 3, '7,0,1099511627776', '', ''),",
    "('unpacked', 'w', 'float', 1, '', '2.75', ''),",
    "('unknown_fields', 'x', 'int64', 1, '42', '', ''),",
    "('empty', '(empty)', '(empty)', 0, '', '', ''),",
    "('empty_lists', 'none_int', 'int64', 0, '', '', ''),",
    "('empty_lists', 'no_kind', 'none', 0, '', '', ''),",
    "('torn', '(refused)', '(refused)', -1, '', '', ''),",
    "('badwire', '(refused)', '(refused)', -1, '', '', '')"
  ).mkString(" ").stripSuffix(",")

  private val tfrecordPinnedSql = Seq(
    "('three_examples', 0, 40, 'b167dceda13cf6f0eaad025fa8c4940b'),",
    "('three_examples', 1, 1024, 'fe83edd3da6f1fd17f555318e60c67b0'),",
    "('three_examples', 2, 0, 'd41d8cd98f00b204e9800998ecf8427e'),",
    "('many_small', 0, 13, '4a2ced83dcae97077f39226426a249e3'),",
    "('many_small', 1, 13, '0cfceafebfb1f2e299baf8b64984ffe4'),",
    "('many_small', 2, 13, '3deb92975e01789e70ae5e5eb315a3e5'),",
    "('many_small', 3, 13, '4b6ecb92e8ff5e95a506682869077572'),",
    "('many_small', 4, 13, 'd5a045c2cd2e73af03b31985323f543b'),",
    "('many_small', 5, 13, '47fbd9bcf1f6ce67ee8afab8c566d096'),",
    "('many_small', 6, 13, '6ca486fba2264788e99efba83e5124f5'),",
    "('many_small', 7, 13, '214b7630616dbbdc57ad72c339793c72'),",
    "('many_small', 8, 13, '70f98a607e45614080e57361c905a401'),",
    "('many_small', 9, 13, '3dc29b3bcf8c470595c15169f80894cc'),",
    "('many_small', 10, 14, '7d2b930489989c09cdeea32592520cbe'),",
    "('many_small', 11, 14, '3387837326b5c9c36cda11bcce9e834a'),",
    "('many_small', 12, 14, '2fe4e9f2c1a068f6fc293e9b36ff13f3'),",
    "('many_small', 13, 14, 'cece877d4c550f7f7687a809c2bb5793'),",
    "('many_small', 14, 14, 'e556cb67fb97622aa519d3bee4c8400f'),",
    "('many_small', 15, 14, '8ac3c6037e4f8460dbfff67118c321c2'),",
    "('many_small', 16, 14, '0ddfab821b4a42804a0f7027aef40460'),",
    "('many_small', 17, 14, '94a8f6ebbed618683154a9982ea491fd'),",
    "('many_small', 18, 14, '959294557ce120b06e47275b7e1c8452'),",
    "('many_small', 19, 14, 'c3156a281033866cabe0eb8a99640295'),",
    "('many_small', 20, 14, '16e9cb39692a86ced98309e102177688'),",
    "('many_small', 21, 14, 'b4164f65746e4d3a2dfa02990f1f6602'),",
    "('many_small', 22, 14, 'b48a1ff92a4f04364ee82e516cb4a32d'),",
    "('many_small', 23, 14, '60c07ce8372e9d4a7f6a06e79550347e'),",
    "('many_small', 24, 14, 'bfc9138f413d489bd45d13779b77bb3c'),",
    "('many_small', 25, 14, 'ea8d9375b4d4bed6b793454465216938'),",
    "('many_small', 26, 14, 'b554cbec574834f6c5effdfe1c40a143'),",
    "('many_small', 27, 14, 'e13a44ab8160a7729b97b398895dcb94'),",
    "('many_small', 28, 14, '0ff445000b95939727d552f0d9c53d7b'),",
    "('many_small', 29, 14, 'aceeac8515f9276f9e136702186495b0'),",
    "('many_small', 30, 14, '0abdf1039a7e38bf1452a3a1696f4a83'),",
    "('many_small', 31, 14, 'cd4d2c186805ac18e1ddc56400899805'),",
    "('many_small', 32, 14, '7fc364dba39081166c3dd3117c0ce2db'),",
    "('many_small', 33, 14, 'e87e4557f876344a2baa39269e28bd36'),",
    "('many_small', 34, 14, 'b22b1def32d266325c5297a68feb2893'),",
    "('many_small', 35, 14, 'd78a05e3bfc99a4af24d01cf0ff809ad'),",
    "('many_small', 36, 14, 'c9759c9606d713da3cbb37288b39122d'),",
    "('many_small', 37, 14, 'c0f030b3b925947d60d0aa9e748fdc07'),",
    "('many_small', 38, 14, 'a09b63a473ac449387536b5a315f600e'),",
    "('many_small', 39, 14, '5fe0a72d68d7120889203fb0d6b9472e'),",
    "('many_small', 40, 14, '37a8e1862d08ca4a5c4eb3d460ee6379'),",
    "('many_small', 41, 14, 'e03f246966d73313062880f253b1de91'),",
    "('many_small', 42, 14, '60cabeb29749bd656b4df7254409aaa9'),",
    "('many_small', 43, 14, '3069edefe4dbd7549d3c23396028fe83'),",
    "('many_small', 44, 14, '8857fae34173789540d35ee1f17370ac'),",
    "('many_small', 45, 14, '78398ea3afb48901b79e741bde653836'),",
    "('many_small', 46, 14, '35b291295d67f628922ac7c4c6582508'),",
    "('many_small', 47, 14, 'd3f06568f5024d2826ee9e878c158593'),",
    "('many_small', 48, 14, 'a929f469b2cfcc33c9ca6ac1c908c88c'),",
    "('many_small', 49, 14, 'f42cef4837b55599b8900d1c3641a51b'),",
    "('torn', -1, -1, '(refused)')").mkString(" ")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TIME-TRAVEL READ (SnapshotOps.readVersion): table@1 and table@2
    // resolved from immutable version manifests — never a directory
    // listing, so the b4 append and the b1 retirement are invisible to
    // v1 and both visible to v2, and re-reading v1 AFTER v2 committed
    // returns the identical corpus (the reproducible-training-set
    // contract). Emits per-version membership aggregates the oracle
    // replays from the bucket rules; SnapshotOpsSpec machine-asserts
    // the scan's file list is exactly the manifest's units.
    // DELTA-PROTOCOL COMMIT LOG read (SnapshotOps.deltaFiles): the
    // public _delta_log JSON action fold — v0 {b0,b1}; v1 adds b2 and
    // retires b1; a checkpoint collapses [0,1]; v2 appends b3 on top
    // of the checkpoint. Reading v0 must IGNORE the later checkpoint
    // (time travel behind it), v1 resolves from the checkpoint alone,
    // v2 from checkpoint + JSON tail. The oracle replays the
    // id-bucket membership each version implies.
    "src_delta_log_read" -> ((s, dir) => {
      val path = deltaTable(s, dir)
      def agg(v: Int): DataFrame =
        SnapshotOps.readDeltaVersion(s, path, v)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("sum_ids"),
            sum(col("n_chars")).as("sum_chars"))
          .select(lit(v.toLong).as("version"), col("n_docs"),
            col("sum_ids"), col("sum_chars"))
      agg(0).unionAll(agg(1)).unionAll(agg(2)).orderBy(col("version"))
    }),

    "src_snapshot_read" -> ((s, dir) => {
      val path = snapshotTable(s, dir)
      def agg(v: Int): DataFrame =
        SnapshotOps.readVersion(s, path, v)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("sum_ids"),
            sum(col("n_chars")).as("sum_chars"))
          .select(lit(v.toLong).as("version"), col("n_docs"),
            col("sum_ids"), col("sum_chars"))
      agg(1).unionAll(agg(2)).orderBy(col("version"))
    }),

    // TFRecord SHARD INVENTORY — the TensorFlow training-shard
    // framing walked scan-side (u64 length + masked-CRC32C pairs, the
    // JDK CRC32C vs the generator's from-polynomial table): per-record
    // (idx, size, md5) rows, and a torn shard quarantining WHOLE as a
    // single refused row, never a silent prefix.
    // tf.EXAMPLE FEATURE PARSE — the proto payload inside TFRecord
    // frames, decoded from the published wire format (varint walk, no
    // protobuf library): per-feature (name, kind, values) rows across
    // packed + unpacked numeric encodings, unknown-field skips, empty
    // messages; torn or wire-contradicting records refuse WHOLE as a
    // single '(refused)' row. Fixtures and pins from the independent
    // from-scratch writer in tools/gen_tfexample_fixtures.py.
    "src_tfexample_parse" -> ((s, dir) => {
      import s.implicits._
      graft.functions.TfExample.register(s)
      tfexampleFixtures.toDF("src", "hex")
        .select(col("src"),
          expr("tf_example_features(unhex(hex))").as("fs"))
        .select(col("src"), col("fs").isNull.as("__refused"),
          explode_outer(col("fs")).as("f"))
        .select(col("src"),
          when(col("__refused"), lit("(refused)"))
            .otherwise(coalesce(col("f.name"), lit("(empty)"))).as("name"),
          when(col("__refused"), lit("(refused)"))
            .otherwise(coalesce(col("f.kind"), lit("(empty)"))).as("kind"),
          when(col("__refused"), lit(-1L)).otherwise(coalesce(
            greatest(size(col("f.int64_values")),
              size(col("f.float_values")), size(col("f.bytes_md5")))
              .cast("long"), lit(0L))).as("n_values"),
          concat_ws(",", expr(
            "transform(f.int64_values, v -> cast(v AS string))"))
            .as("int64_csv"),
          concat_ws(",", expr(
            "transform(f.float_values, v -> cast(v AS string))"))
            .as("float_csv"),
          concat_ws(",", col("f.bytes_md5")).as("bytes_md5_csv"))
        .orderBy(col("src"), col("name"))
    }),

    "src_tfrecord_audit" -> ((s, dir) => {
      import s.implicits._
      graft.functions.TfRecord.register(s)
      tfrecordFixtures.toDF("src", "hex")
        .select(col("src"), explode_outer(
          expr("tfrecord_entries(unhex(hex))")).as("e"))
        .select(col("src"),
          coalesce(col("e.idx"), lit(-1)).cast("long").as("idx"),
          coalesce(col("e.n_bytes"), lit(-1L)).as("n_bytes"),
          coalesce(col("e.payload_md5"), lit("(refused)")).as("payload_md5"))
        .orderBy(col("src"), col("idx"))
    }),

    // SCD TYPE-2 HISTORY (SnapshotOps.scd2History): the
    // history-preserving fold of a CDC changelog — every state an id
    // ever had, with its validity interval. Fixture: updates at seq 1
    // (ids %4=1), deletes at seq 1 (%4=2), two-step updates (%4=3),
    // and delete-after-update (%8=5), so intervals open, close, chain,
    // and terminate. One keyed window — no global sort; the oracle
    // replays the same lead() fold.
    "src_scd2_history" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      val base = d.select(col("doc_id"), md5(col("text")).as("fp"),
        col("lang"))
      def lg(cond: org.apache.spark.sql.Column, seq: Long, op: String,
             salt: String): DataFrame =
        d.where(cond).select(col("doc_id"), lit(seq).as("seq"),
          lit(op).as("op"),
          md5(concat(col("text"), lit(salt))).as("fp"), col("lang"))
      val log = lg(col("doc_id") % 4 === 1, 1L, "upsert", ":v1")
        .unionByName(lg(col("doc_id") % 4 === 2, 1L, "delete", ""))
        .unionByName(lg(col("doc_id") % 4 === 3, 1L, "upsert", ":v1"))
        .unionByName(lg(col("doc_id") % 4 === 3, 2L, "upsert", ":v2"))
        .unionByName(lg(col("doc_id") % 8 === 5, 2L, "delete", ""))
      SnapshotOps.scd2History(base, log, "doc_id", "seq", "op")
        .orderBy(col("doc_id"), col("valid_from"))
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


    // Small-file COMPACTION PLAN (the lakehouse OPTIMIZE bin-packer):
    // per TABLE PARTITION (compaction never merges across partitions),
    // the streaming first-fit fold — files in arrival order, bin =
    // floor(cumulative-bytes-before / target) — assigns every file to
    // a target-sized output without driver state. The window runs over
    // FILE METADATA (one row per file), partitioned by the table
    // partition key, so the plan distributes like any keyed window and
    // never sees data bytes. Derived inventory: partition = lang,
    // size = n_chars, arrival = doc_id.
    "src_compaction_plan" -> ((s, dir) => {
      val target = 4096L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars").as("bytes"))
        .withColumn("__cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("bin", expr(s"__cum div ${target}L"))
        .drop("__cum")
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
          min(col("doc_id")).as("first_file"),
          max(col("doc_id")).as("last_file"))
        .orderBy(col("lang"), col("bin"))
    }),


    // CSV dialect sniffing (ops.CsvSniff — the csv.Sniffer/read_csv
    // inference): per doc a 4-line CSV built with a doc_id-chosen
    // delimiter (comma/semicolon/tab/pipe), every 11th doc raw prose
    // that must sniff to NULL, not a guess. Oracle states the dialect
    // as the construction closed form.
    "src_csv_sniff" -> ((s, dir) => {
      val did = col("doc_id") % 4
      val d = when(did === 0, ",").when(did === 1, ";")
        .when(did === 2, "\t").otherwise("|")
      val ws = split(trim(col("text")), "\\s+")
      def f(k: Int) = coalesce(try_element_at(ws, lit(k)), lit("x"))
      val rows = (0 until 4).map(j =>
        concat(f(3 * j + 1), d, f(3 * j + 2), d, f(3 * j + 3)))
      val file = when(col("doc_id") % 11 === 0, col("text"))
        .otherwise(array_join(array(rows: _*), "\n"))
      // materialize the constructed file BEHIND a projection boundary:
      // the sniffer references its input ~16 times (4 candidates ×
      // counts/head/forall) and codegen re-evaluates the whole
      // construction tree per reference otherwise (measured 75 s → sub-
      // second at sf0.1)
      Tables.documents(s, dir)
        .select(col("doc_id"), file.as("file"))
        .localCheckpoint(true)
        .withColumn("sn", graft.ops.CsvSniff.sniff(col("file")))
        .select(col("doc_id"), col("sn.delimiter").as("delimiter"),
          col("sn.n_fields").as("n_fields"))
        .orderBy(col("doc_id"))
    }),


    // BINARY-column parquet sink + scan round trip — the multimodal
    // lakehouse posture: media blobs (here the deterministic docx of
    // each document, real non-UTF-8 deflate bytes inside) written as a
    // parquet BINARY column next to typed metadata and re-read with
    // bit-exact fingerprints. Certified like the ORC/CSV trips: the
    // re-read blob must hash identically to the oracle's closed-form
    // expectation — the oracle fingerprints the TEXT the blob round-
    // trips back to (docx_text ∘ scan == clean), never parquet bytes.
    "src_binary_roundtrip" -> ((s, dir) => {
      graft.functions.ZipDocx.register(s)
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_bin_$fp"
      if (!new java.io.File(new java.io.File(path), "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            call_function("docx_doc",
              regexp_replace(col("text"), "[^ -~]", " ").cast("binary"))
              .as("blob"))
          .write.mode("overwrite").parquet(path)
      }
      s.read.parquet(path)
        .select(col("doc_id"), col("lang"),
          md5(call_function("docx_text", col("blob")).cast("binary"))
            .as("text_md5"))
        .orderBy(col("doc_id"))
    }),


    // ORC sink + scan round trip (source-format breadth next to
    // parquet/CSV): the documents table written as zlib ORC and read
    // back must reproduce every row bit-exactly — certified by emitting
    // per-row md5 fingerprints FROM THE ORC SCAN while the oracle
    // computes the same fingerprints from the parquet source. Same
    // fingerprint-keyed, _SUCCESS-gated cache discipline as
    // src_partition_prune (the r6/r9 stale-cache lessons).
    "src_orc_roundtrip" -> ((s, dir) => {
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_orc_$fp"
      val f = new java.io.File(path)
      if (!new java.io.File(f, "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .write.mode("overwrite").option("compression", "zlib").orc(path)
      }
      s.read.orc(path)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),


    // AVRO round trip (functions.AvroOcf — a from-spec Object
    // Container File reader/writer pair, since no spark-avro module
    // ships here; the independent Java avro library cross-validates
    // both directions in AvroOcfSpec): every doc becomes an OCF —
    // even docs carry TWO records (multi-record block), every third
    // doc deflate-compressed — then the records are read back by the
    // engine's own parser. The oracle replays the record construction
    // closed-form, never touching container bytes, so varint framing,
    // codec handling, schema validation, and sync checking all sit
    // under the hash.
    "src_avro_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType), StructField("text", StringType)))
      graft.functions.AvroOcf.register(s, docSchema)
      val rec1 = struct(col("doc_id"), col("lang"), col("n_chars"),
        col("text"))
      val rec2 = struct((col("doc_id") + 1000000L).as("doc_id"),
        upper(col("lang")).as("lang"), (col("n_chars") * 2).as("n_chars"),
        concat(lit("copy:"), col("text")).as("text"))
      val arr = when(col("doc_id") % 2 === 0, array(rec1, rec2))
        .otherwise(array(rec1))
      val codec = when(col("doc_id") % 3 === 0, lit("deflate"))
        .otherwise(lit("null"))
      Tables.documents(s, dir)
        .withColumn("__blob", call_function("avro_file", arr, codec))
        .select(col("doc_id").as("src_doc"),
          posexplode(call_function("avro_rows", col("__blob")))
            .as(Seq("rec_idx", "r")))
        .select(col("src_doc"), col("rec_idx").cast("long").as("rec_idx"),
          col("r.doc_id").as("rec_id"), col("r.lang").as("lang"),
          col("r.n_chars").as("n_chars"),
          md5(col("r.text").cast("binary")).as("text_md5"))
        .orderBy(col("src_doc"), col("rec_idx"))
    }),


    // CSV sink + scan round trip: the hard part of CSV is QUOTING —
    // embedded newlines, quotes, and delimiters must survive
    // write+read (multiLine scan, doubled-quote escaping). Certified
    // the same way as ORC: per-row fingerprints from the CSV scan vs
    // the oracle's fingerprints from the parquet source. FAILFAST mode:
    // a malformed row aborts rather than silently dropping.
    "src_csv_roundtrip" -> ((s, dir) => {
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_csv_$fp"
      if (!new java.io.File(new java.io.File(path), "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
          .write.mode("overwrite")
          .option("header", "true").option("quoteAll", "true")
          .option("escape", "\"")
          .csv(path)
      }
      s.read
        .schema("doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING")
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"").option("mode", "FAILFAST")
        .csv(path)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),


    // JSON-lines round trip (the interchange format most crawl/corpus
    // tooling actually speaks): unicode escapes, embedded quotes and
    // newlines ride JSON string escaping; FAILFAST scan with an explicit
    // schema. Same fingerprint certification.
    "src_jsonl_roundtrip" -> ((s, dir) => {
      val src = new java.io.File(dir, "documents.parquet")
      val srcFiles: Seq[java.io.File] =
        if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
      val fpInput = srcFiles.map(f =>
        s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(fpInput.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val path = s"/tmp/graft_docs_jsonl_$fp"
      if (!new java.io.File(new java.io.File(path), "_SUCCESS").exists()) {
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
          .write.mode("overwrite").json(path)
      }
      s.read
        .schema("doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING")
        .option("mode", "FAILFAST")
        .json(path)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }))

  override def oracle: Map[String, String] = Map(

    // v1 = %3∈{0,1}; v2 drops the %4=1 bucket of v1 and gains the
    // %3=2 append — membership replayed straight from the rules
    // per-version id-bucket membership: v0 = %4 in (0,1),
    // v1 = %4 in (0,2) after the remove, v2 = %4 in (0,2,3)
    "src_delta_log_read" ->
      """SELECT CAST(0 AS BIGINT) AS version,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 4 IN (0, 1)
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 4 IN (0, 2)
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 4 IN (0, 2, 3)
        |ORDER BY version""".stripMargin,

    "src_snapshot_read" ->
      """SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 <> 2
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents
        |WHERE (doc_id % 3 <> 2 AND doc_id % 4 <> 1) OR doc_id % 3 = 2
        |ORDER BY version""".stripMargin,

    "src_tfexample_parse" ->
      s"""SELECT src, name, kind, CAST(n_values AS BIGINT) AS n_values,
         |  int64_csv, float_csv, bytes_md5_csv
         |FROM (VALUES $tfexamplePinnedSql)
         |  t(src, name, kind, n_values, int64_csv, float_csv, bytes_md5_csv)
         |ORDER BY src, name""".stripMargin,

    "src_tfrecord_audit" ->
      s"""SELECT src, CAST(idx AS BIGINT) AS idx,
         |  CAST(n_bytes AS BIGINT) AS n_bytes, payload_md5
         |FROM (VALUES $tfrecordPinnedSql) t(src, idx, n_bytes, payload_md5)
         |ORDER BY src, idx""".stripMargin,

    // the same union-of-events + keyed lead() fold, replayed in SQL
    "src_scd2_history" ->
      """WITH ev AS (
        |  SELECT doc_id, 0 AS seq, 'upsert' AS op, md5(text) AS fp, lang
        |    FROM documents
        |  UNION ALL SELECT doc_id, 1, 'upsert', md5(text || ':v1'), lang
        |    FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL SELECT doc_id, 1, 'delete', md5(text), lang
        |    FROM documents WHERE doc_id % 4 = 2
        |  UNION ALL SELECT doc_id, 1, 'upsert', md5(text || ':v1'), lang
        |    FROM documents WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 2, 'upsert', md5(text || ':v2'), lang
        |    FROM documents WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 2, 'delete', md5(text), lang
        |    FROM documents WHERE doc_id % 8 = 5),
        |h AS (SELECT doc_id, fp, lang, seq, op,
        |    lead(seq) OVER (PARTITION BY doc_id ORDER BY seq, op)
        |      AS valid_to
        |  FROM ev)
        |SELECT doc_id, fp, lang, CAST(seq AS BIGINT) AS valid_from,
        |  CAST(valid_to AS BIGINT) AS valid_to,
        |  valid_to IS NULL AS is_current
        |FROM h WHERE op = 'upsert'
        |ORDER BY doc_id, valid_from""".stripMargin,


    // the partitioned layout must not change a row: plain filtered agg
    "src_partition_prune" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY lang ORDER BY lang""".stripMargin,


    // dialect as the construction closed form; prose docs must be NULL
    "src_csv_sniff" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN NULL
        |       WHEN doc_id % 4 = 0 THEN ','
        |       WHEN doc_id % 4 = 1 THEN ';'
        |       WHEN doc_id % 4 = 2 THEN chr(9)
        |       ELSE '|' END AS delimiter,
        |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL ELSE 3 END AS BIGINT)
        |    AS n_fields
        |FROM documents ORDER BY doc_id""".stripMargin,


    // replay of the per-partition streaming first-fit fold
    "src_compaction_plan" ->
      """WITH f AS (SELECT lang, doc_id, n_chars AS bytes,
        |    coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM documents)
        |SELECT lang, CAST(cum // 4096 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |  min(doc_id) AS first_file, max(doc_id) AS last_file
        |FROM f GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,


    // the oracle fingerprints the clean text the stored blob must
    // round-trip back to — it never touches parquet or zip bytes
    "src_binary_roundtrip" ->
      """SELECT doc_id, lang,
        |  md5(regexp_replace(text, '[^ -~]', ' ', 'g')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,


    // the same rows fingerprinted straight from the parquet source: the
    // ORC write+read must not change a byte
    "src_orc_roundtrip" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // record construction replayed closed-form; the container bytes
    // (varints, codecs, sync markers) live entirely under the hash
    "src_avro_roundtrip" ->
      """WITH av1 AS (SELECT doc_id AS src_doc, CAST(0 AS BIGINT) AS rec_idx,
        |    doc_id AS rec_id, lang, n_chars, md5(text) AS text_md5
        |  FROM documents),
        |av2 AS (SELECT doc_id AS src_doc, CAST(1 AS BIGINT) AS rec_idx,
        |    doc_id + 1000000 AS rec_id, upper(lang) AS lang,
        |    n_chars * 2 AS n_chars, md5('copy:' || text) AS text_md5
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT src_doc, rec_idx, rec_id, lang, CAST(n_chars AS BIGINT)
        |    AS n_chars, text_md5
        |FROM (SELECT * FROM av1 UNION ALL SELECT * FROM av2)
        |ORDER BY src_doc, rec_idx""".stripMargin,

    "src_csv_roundtrip" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "src_jsonl_roundtrip" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin)
}

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

  // committed zstd fixture frames from the independent CLI compressor
  // (tools/gen_zstd_fixtures.py -> src/test/resources/zstd_fixtures),
  // hex-embedded so oracle and engine see identical blobs; payloads are
  // deterministic constructions whose (len, md5) the generator pinned
  private val zstdFx_small_l1 =
    "28B52FFD64400AB5060062C91E1C608775D807D03FB0D1DA8686340E5C00F0CF711CB7845E14740A1401113ED7D85269" +
      "F18AF0B9C6964A8A5584CF35B6544A9C227CAEB1A55ADAA3E59BCE043AD38F7D852C337844A7215F2440E0769DB497B9" +
      "FC12ACFC5D14A770C3319DC36F2B0683BC7637B59FBE8F12063DC222EFA479C1CCCCEFA376535B102A20D01B6D3DC5D0" +
      "1394192A023D4399A062E8151417140365868AA0672813A8187A82324385A0B8A018283354043D439940C5D01394192A" +
      "04C505C54099A122E819CA042A869E1494D9245149A403F54DB8411D2ACD21CF563FF9B7"
  private val zstdFx_small_l19 =
    "28B52FFD64400ADD0500E2081D1960AF0E9FECF2237FA48FF4440041B228B7DCAE9053D010C40142A55346F81C6C50A8" +
      "74CA089F7BED09954E19E173AE39A1D229237C8DE0A391B76317EB5257F8D7C29271CCB105F2C10141EE6B9D862CF4AC" +
      "60E4197A28E6CD61A9E8B99F424A7EBBEA7C2C2B9C5F38792FD387F63E6E4FB7892CA831B49B67D9E506C033DB114004" +
      "0E61860009FFFF8CC00FB5C41256AC4B2AB2C24A2B19D27A58698B251652156C61B215C02679592203A86F7034866E44" +
      "2A6169B568563FF9B7"
  private val zstdFx_medium_l19_chk =
    "28B52FFD6420FCDD2A005A5AD40A1A505539070F253D94F45012283B33AA496869936C3174678A981ADF008C009D0071" +
      "1CC7711CC7711CC7711CC7711C43420A9AAE633534239C98E72A564223420959AEB4220D850CCE6B58054D0823E2B86E" +
      "35CDC2E3F8E36A45238CFBAE5634C2E8BD5AD108C3B66B59154D092BEABA5AD10883A6AB158D30E6B98A95D088504296" +
      "2BAD48432183F31A564113C28838AE5B4DB310C1010906101C7840F080C1020D0F15106490F0104183840A051E383C60" +
      "40E0C083800010C00282080C1E2098C060C2830505120E3C5898000143830707061860A0F0600101040215123C444090" +
      "018185070E1D083C78D82021C1038205171E04FC80C04004041722201810DDAEE959E63CD78A4618F75DAD4818BD572B" +
      "1A61D876B5A211465D572B1A61D074B5A211CAB22CCBB22CCBB22CCBB2C8B22CCBB22CCBB22CCBB22CCBB22CCBB22CCB" +
      "B25C2B1A61DC77B5A21146EFD58A46C8C939E79C73CEAF5634C2A0E96A4523E49C73CE39E79C73CE39E79C73CE39E79C" +
      "7372CE39E79C73CE39AF158D308EE3388EE3388EE3388EE3380E5FAD688441D3D58A4658D7755DD7755DD7755DD7755D" +
      "D7755DD7755DD7755D575DD7755DD7755DD775AD688471DFD58A4618BD572B1A61D876B5A211465D572B12064D572B1A" +
      "61CC73523129211911A1842CC7D258240E8564705E342C2A2826241811C7DDED9A9E65D2F43C45238CFBAE5634C2E8BD" +
      "5AD108C3B6AB158D30EABA5AD10883A6AB158D70AE5634C290E56A45230CCEAB158D0423E2B803BD9746D87BEFBDF7DE" +
      "7BBF5AD1087BEFBDF7DE7BBFAE5634C2A0E96A4523ECEDBDF7DE7BEFBDF7DE7BEFBDF7DE7BEFBDF7DE7BEFBDF7DE7BAF" +
      "158D30EEBB5AD1987DAF5634C2B0EDAA6555453525C58ABAAE5634C2A0E96A4523B46DDBB66DDBB66DDBB66DDB46189C" +
      "572B1A61441C77B76B7A9669DBB5A211C67D572B1A61F45EAD6884755D755DD7755D578399A862D0F5A44EADE9D26FA4" +
      "CD12801050108C204008FEFF1102FEB7865BD14A430050430975A8B186AB62238D68852128ACB1861A4AA81BD5981156" +
      "58D988128CD40823AC4353914558628D259650E33AD658A31A4AA8430D6BA8A1C43AD658C32A43155698D2C81A6DC94A" +
      "7BA0348D95D10A235A696509755C638D35D4C19456B4D290351A614A239887E51A6BA8A10875A8B1862AA24A4BAE8315" +
      "5636C2C412D4B8C61A0B82E0AAA84A2BAC6C44898C68841156D482918D68852168D660861A6B5CE2D7D0084B58C18A12" +
      "8C688511CC82530D25D4A18C35D450621D6BACF1124B2871895596B0C41A95586295A10A5B98D2C81AAD64A529ADA805" +
      "238D6885254B34849146DAA2C68D3007DE31B111251AC294565A59C72AD4A8861A4AA8438D35A8A1C475ACB1C612AB50" +
      "E2126BAC0B94752C28AAB0C28835B6C288565A59224332D28856946884296D69658D5B6985950D5182118D30C23A94BA" +
      "898D34A2154696D810461A698B1A1BC914469658428D6BAC6341B056C5AAB4C2948D28C1884690AE5A16B18A565AC14A" +
      "5B96C008238C686515596108238DA882918C34A43DC8D6B10C359458C71A6BB0620D65A8710D3594B08E35D658620925" +
      "5C1497C208230D59A3254C69841125B08429AC6C00A75594A1861AABC01A35C21256B0A204235A6104B3E0A851097528" +
      "630D359458C71A6B5CE2124A5CA289252CB14625965832D4C216A63402D51ACB50438975AC718D552CA1C425D6586209" +
      "6A5C631DCB006584D560821A8C60A2194DACA31D6D34918D35D868044634B14413DB6805136A6CA3095630760C0F6884" +
      "298D30A2048CB0C2CA8D28C1889630C28A2A9868831137B1042B0C61A425AA60849186B445894D6CA30926D4D8862698" +
      "6045259A60823D9850A38D46B4D16E13AD5E27870F40FD9037689FB49B03D322C0C1B4A30556BDFC94"
  private val zstdFx_medium_l3_nochk =
    "28B52FFD6020FC4D2100A6FF831B405392030F253D94F4884A5E0AAB824196362525E16A241D8FBB17A8006000600092" +
      "244992244992244992244992A44799BB9C1E028F4799BB9C8A407994B9CB6904E651E62EA70BFC51E62E270BF851E62E" +
      "A70AF451E62E270AF051E62EA709EC51E62E2709E851E62E9720481C240848F2C0B0A08154241912488486448501C2F1" +
      "C05080800C0820C02289607848261826100B050904C4620202A301713860C0A0402C1288828A042422492E22928CC402" +
      "E1E82878403624129064E102191040928388E42222210824499224499224499224499224499224499224499224499224" +
      "499224499224499224B96DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66D92" +
      "2449922449922449922449922449922449922449922429FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFDFB66DDBB66DDBB6" +
      "6DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDBB6DBB66DDBB66DDBB66DDBB66DDBB66DDBB66D" +
      "DBB66DDBB66DDBB66DDBB66DDBB66DDBB66DDB96244932A594524A29A594524A29A594524A29A594524A29A594524A29" +
      "A594524A29A594524A29A594524A29A594524A29A594524A29A594524A29A594524A29A5943233333333333333333333" +
      "333333333333333333333333333333333333333333333333333333333333333333333333333333F3FFFFFFFFFFFFFFFF" +
      "FFFFFFFFFFFFFFFFFFFFFF0F8387A822D0B3C77EAC01D26FA4CD124010501018410041F0FF8F20E00F3731316262D2C4" +
      "C4C4C4A41526262626264D4C4C8C34B16262626262D2C4888915132B262626264C9A98583131B16262C5C4C4A4894913" +
      "1313564C4C4C4C4C9A3431626262C5C4C4C4C4A42526262626564C4C4C9858696262626262C58A89894993262626264C" +
      "AC98989834316962C4C4C4C48A89891513234D4C4C4C4CAC9858616262D2C4C4C4C4C41693262626264D4C4C98985869" +
      "62626262D288898989892D262626464C9A98989858B162C2C4C4C4A4898989492B564C4C4C4C4C9A9830696262C5C4C4" +
      "C4C44813132B2626564C4C8C989834B162626262858989898949932626564CAC98989898986CC2C4C4C4C48A89898911" +
      "2B4D4C4C4C4CAC981831B162D2C4C4C4C4841513139326264D4CAC9898583131696262A2898989898915132B464C4C9A" +
      "9898989858B1C4C4C4C4A489898909132B4D4C4C4C4C9A5831313169C5C4C4C48449131313132B564C8C989898343131" +
      "B162628A89898989491313934C4CAC9898989898B462D2C4C4C48A898909139326564C4C4CAC183131313169C5C4C4C4" +
      "881513131313934D4C989898583131313169A5898989898915131326751B613069626248C20A26464C6C15576162C2C4" +
      "AAD00AA69898D896B0C2C4C4C456E12A9A9830B12AB4C28A8915DB1256583131B1555C85091326568556D8626232B189" +
      "96BC4B0E7980FA61AA0D5ADEC18DA905601C02"
  private val zstdFx_large_l19_chk =
    "28B52FFDA4409D04007C2C004A59300B1870D97450FA43E90FA58F77FF3F2BA59429A52402F8F4EEE1DA0099009B008B" +
      "2DB6D8628B2DB6D8628B2DB6D8628B2DB6D8622BBF2F5EE411DF2E3D2F5CD491DE2DBB2E5AC411DE2C392E58B491DD2B" +
      "B72D563472978B45ACA846EAAEB25651452377390A2A1AB9CB4D4CD1C85D4E428A46EE728F178DDCE51C2E1AB9CB355A" +
      "34729763B068E42EB758D1C85D223820C10082030F081E3058A0E1A102820C121E22689050A1C00387070C081C781030" +
      "00012C2088C0E00182090C263C585020E1C08385091030347870608001060A0F161040205021C143040419105878E0D0" +
      "81C083870D12123C205870E141403C20301001C18508080604BC598E0E166D64F7CACDB1A21889BBB48B6AA4EE2A578D" +
      "2AA291BBA30615CDC8DC536E1A532423724B396948D1477EBFDC1B2FF2886F9773C3451DE95DB6D1465BB31C1B2CDAC8" +
      "EE955B6345311277D916D548DD55AE185544237453396250D18CCC5D92418EC82DE58421451FF9FD7267BCC823BE5DCE" +
      "0C1775A477CB95D1228EF06639325834B27B25634531127749C6165B6CB1C5165B2C2221451FF9FD72977891477CBB9C" +
      "255CD491DE2D578916718437CB5182451BD95D8A14C548DCA548518DD45DE5EA514534423795A30715CDC8DC536E1E53" +
      "242372977FFCF1C77FEE8F1779C4B7CBF9E1A28EF46EB93E5AC411DE2CC7078B36B27BE5F658518CC45DFE61877D57B9" +
      "7254118DD04DE5C841453332F7941BC714C988DC524E1C52F491DF2F77C78B3CE2BBB44D1DE9DD7275B4882301141414" +
      "E42A57514534423795A3A0A219997BCA4D4C918CC82DE524A4E823BF5FEEF1228FC5B75DD33305D148EF966BB48823BC" +
      "598EC1A28DEC5EB9C58A6224EE2829A8A846EAAE72155544342474329526A86846E69E7213532423724B390929FAC8EF" +
      "977BBCC823BE5DCEE1A28EF46EB9468B3832538E132CDAC8EE95DBC48A6224EE72A6A846EAAE72255145344237952309" +
      "2A9A91B94B911011915BCA05839AA84230D6D7AA351DB25F4A9B0112801050108C204008FEFFFD03B1842245895628C1" +
      "46736883154BB0C14636B4E40A6C30810D439480156C64D11635B471192AA10C3ED6C01B9045261A528D2636A109562A" +
      "C10E3632A3912BB0C10476180E90AE845660820DAC50821AD6588F33D643946842136CB4E412ADC0041BAC50821D5A60" +
      "062BD468A2099A60A522D860231B8DBC021BCC05A36602534922139AC044AB9246169968645390D04C608716D8C04EA4" +
      "C8441BDA6158D29845261A690A664C304C914436D8881499688776189634B2C8441B18115464810D2658102464811D4C" +
      "B02048648119ACB00A8292096C68C10AF6407A19801D6D68811D49238B4CB48311416216D8608205894416D8C80A5370" +
      "31811D6DB0AD9040A4C8441BDAB058D2984526DA60449090053632C1822091053630C18244220B6CB0C2285830818DD2" +
      "804DB0102932B18DDA302C6964918936304490C8021B4CB02048C8043698604190C8021BB0C2146CAC2CD0D0021BD889" +
      "1459D186360C4B1AB3C88436181124B2C046569802D7C00436B4C0067622C54C34D2142CBC5944820D5964A2A1483113" +
      "6D68836149238B4C688311414416D860820581441698C10A531061021BC61193C842A4C8C436B46158D29845261AD114" +
      "340A13D8A10536B0132932D18676189634669189469A821913102334910D36224526B6A11D86258D2C32D10C46041559" +
      "608309160411596007132C0812AD68231B916A259144169B68A429E864021B6DB0918D3634111B4C60A30D36B2D10C5A" +
      "6083096CB4C1866C68438B121BE180654891096DD0468B80041B596C62DB01892CB0C104B6918A4C6802132C0212ACB0" +
      "C28A26C52930A1093664630DACB0D24A2B94C88811ADB0650D4698C284299660A595565A52092B1A6984116B60851123" +
      "DAB24623AC6C85912BB0C20A234CA9042B4CB0526C132D454A0E1F80FA21EFA07D2C6E0E4C8B0007938F16A40800C611" +
      "1C0AC0E51A24D2D884554F09230024000F00346106C889390345200C0012043893220923404AC8D9A26102399E455184" +
      "0920171701610EC88B3BB3220B63405AD85915559802B2A2CEA888C210901474168A42981B229C4D05FFFFFFFFFFFF31" +
      "C618638CD1AEE802FFFFFFFFFFFFFFFFFF80E6AC20F003E1EFDF0162C58A152B56ACD862C58A152B56ACD862C58A152B" +
      "56AC98C58A152B56AC58B1C58A152B56AC58B1C58A152B56AC58318B152B56AC58B1628B152B56AC58B1628B152BE696" +
      "A18C8AA08AAAA816550A2A36B1455BA8C01E5A64C3946B68910D6DB4858A6C68910D53AE438B6C9806E78CA004366891" +
      "0D53AEA1457668D1162AB2A14536AC720D2DB2A1455BA8C80E2D64C33438286F8102EC0300750E3180E7540100282626" +
      "262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626" +
      "262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626" +
      "262626262626262626262626262626262616CC0700E51C3181CE58010012F85F41E0FFFD076262626262626262626262" +
      "6262626262626262626262626262626262626262C2C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4" +
      "C4C4C4C4A489898989898989898989898989898989898989898989898989898989898989491313131313131313131313" +
      "131313131313131313131313131313131313131393262626262626262626262626262626262626262626262626262626" +
      "26262626264D4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C9A98989898989898989898" +
      "98989898989898989898989898989898989898989834313131313131D90414070096D10F06F03982C808020E000C0009" +
      "006DDBB66DDBB66DDBB66DDBB66D0BFFFFFFFFB66DDBB66DDBB60DFFFFFFFFFFFFFFFFFF0000000000000000000000C0" +
      "FFFF0F80E3A820F203E00F12F8FFFF4F10E01F26468C983061D2C48A15134C9834B162C58409932656583161C2A48915" +
      "2B264C986862A51513264C9A58B1628209932656AC983061D2C40A2B264C9834B162C58409134DAC5831C98449132B56" +
      "4C3061D2C48A1513264C9A5861C5840993868465BC88CA781195F14A54C68BA88C1751195F4465BC88CA78212AE34554" +
      "C68BA88C1751192FA2325E88CA78C5100A5040E40300450E3280E4540100282626262626262626262626262626262626" +
      "262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626" +
      "262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626" +
      "26016C0700751C3281C75401002862626262626262626262626262626262626262626262626262626262626262626262" +
      "626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262" +
      "626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262" +
      "626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262" +
      "626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262" +
      "6212DC0300350E3280E35401002826262626262626262626262626262626262626262626262626262626262626262626" +
      "262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626" +
      "2626262626262626262626262626262626262626262626262626262626262616F40400428E0804E00F1119FFFFFFFFFF" +
      "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF01000000001080E454010028262626262626262626262626262626262626" +
      "262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626" +
      "262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626262626" +
      "01B40700851C3381C858010012F8FFFF4F10E01F12131313131313131313131313131313131313131313131313131313" +
      "1313131326262626262626262626262626262626262626262626262626262626262626264D4C4C4C4C4C4C4C4C4C4C4C" +
      "4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C9A989898989898989898989898989898989898989898989898989898" +
      "989898983431313131313131313131313131313131313131313131313131313131313131696262626262626262626262" +
      "6262626262626262626262626262626262626262D2C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4" +
      "C4C4C4C4A4898989C923C40700F6140E05E00F2069020B000B000B005555555555555555555515000000000000005555" +
      "5515000000000000000000001000000000000000000000088118A821D00FE11F12F83F41E0FFE71F6262C5A489119326" +
      "464C9818316162C48489111326468C303162C2C488091323264C2C316162C48489111326468C303162C2C48809132326" +
      "4C8C98303162C2C48809132346583162C2C488091323264C8C98303162C2C488091323469818316162C4848911132646" +
      "AC303162C2C488091323469818316162C416C13A5845AB6815ADA255B48A56D12A5A456BD12A5A45AB6815ADA2B56815" +
      "ADA255B48A56D12A5A45AB6815ADA255B47A800C0465060086D10B04E00FC912090009000900000000000000000040FF" +
      "FFFFFFFFFFFF0F40FFFFFFFFFFFFFFFF7FFFFFFFFFFFFFFFFF7F811858010012F8FFFF57F00F30313131313131313131" +
      "313131313131313131313131313131313131313131316262626262626262626262626262626262626262626262626262" +
      "626262626262C5C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C4C48A898989898989898989" +
      "898989898989898989898989898989898989898989891513131313131313131313137B058226443E"
  private val zstdFx_tiny_l19 =
    "28B52FFD249025030082061517806D0E001009FA44D2A1A80D135A1B9A0302246CA8EA1E4070B6EBCC6F99407E7FD60A" +
      "ED332CB554CCC40004F09AED2E9D21B2CCD0318EE265A5D3189E51EFB0FE51FF1C5A9A5473B4879F441382BFF4515F04" +
      "0400EA8170433BCC4D3818002436288A86"
  private val zstdFx_empty_l3 =
    "28B52FFD240001000099E9D851"

  private[queries] val zstdFixtures = Seq(
    ("small_l1", zstdFx_small_l1),
    ("small_l19", zstdFx_small_l19),
    ("medium_l19_chk", zstdFx_medium_l19_chk),
    ("medium_l3_nochk", zstdFx_medium_l3_nochk),
    ("large_l19_chk", zstdFx_large_l19_chk),
    ("tiny_l19", zstdFx_tiny_l19),
    ("empty_l3", zstdFx_empty_l3))

  // (name, raw_len, raw_md5) pinned by the generator at fixture time
  private val zstdPinnedSql = Seq(
    ("small_l1", 2880, "a2a926ccba7a15544d104fe9a8095728"),
    ("small_l19", 2880, "a2a926ccba7a15544d104fe9a8095728"),
    ("medium_l19_chk", 64800, "d4ac743c514662a174cf4b0a0032fe24"),
    ("medium_l3_nochk", 64800, "d4ac743c514662a174cf4b0a0032fe24"),
    ("large_l19_chk", 302400, "78c21e19375b50accedd032a9c262931"),
    ("tiny_l19", 144, "b77d49b1549cab63a577239903119c6f"),
    ("empty_l3", 0, "d41d8cd98f00b204e9800998ecf8427e"))
    .map { case (n, l, m) => s"('$n', $l, '$m')" }.mkString(", ")

  // committed classic-PDF fixtures from the independent python
  // generator (tools/gen_pdf_fixtures.py -> src/test/resources/
  // pdf_fixtures), hex-embedded; expected extractions pinned below
  private val pdfFx_raw =
    "255044462D312E340A312030206F626A203C3C202F54797065202F436174616C6F67202F506167657320322030205220" +
      "3E3E20656E646F626A0A322030206F626A203C3C202F54797065202F5061676573202F4B696473205B33203020525D20" +
      "2F436F756E742031203E3E20656E646F626A0A332030206F626A203C3C202F54797065202F50616765202F506172656E" +
      "74203220302052202F4D65646961426F78205B30203020363132203739325D202F436F6E74656E747320342030205220" +
      "3E3E20656E646F626A0A342030206F626A203C3C202F4C656E677468203830203E3E2073747265616D0A4254202F4631" +
      "20313220546620373220373230205464202848656C6C6F205C28636C61737369635C2920504446205C3130315C313032" +
      "2920546A2028636F6E74696E756564206C696E652920272045540A656E6473747265616D20656E646F626A0A78726566" +
      "0A3020350A303030303030303030302036353533352066200A30303030303030303039203030303030206E200A303030" +
      "30303030303538203030303030206E200A30303030303030313135203030303030206E200A3030303030303032303220" +
      "3030303030206E200A747261696C6572203C3C202F53697A652035202F526F6F74203120302052203E3E0A7374617274" +
      "787265660A3333320A2525454F460A"
  private val pdfFx_flate =
    "255044462D312E340A312030206F626A203C3C202F54797065202F436174616C6F67202F506167657320322030205220" +
      "3E3E20656E646F626A0A322030206F626A203C3C202F54797065202F5061676573202F4B696473205B33203020525D20" +
      "2F436F756E742031203E3E20656E646F626A0A332030206F626A203C3C202F54797065202F50616765202F506172656E" +
      "74203220302052202F4D65646961426F78205B30203020363132203739325D202F436F6E74656E747320342030205220" +
      "3E3E20656E646F626A0A342030206F626A203C3C202F4C656E677468203931202F46696C746572202F466C6174654465" +
      "636F6465203E3E2073747265616D0A78DA730A51D0773354303450084953303550303700B25214A235B2538BF2525314" +
      "3415740D8D0C14344A522B4A34158C8D1534148A4AF334631542BC1442B4146C4C2CCC4CCD2D8C0CCC8DCD2CCD4CEC14" +
      "42B2145C430071CA14880A656E6473747265616D20656E646F626A0A787265660A3020350A3030303030303030303020" +
      "36353533352066200A30303030303030303039203030303030206E200A30303030303030303538203030303030206E20" +
      "0A30303030303030313135203030303030206E200A30303030303030323032203030303030206E200A747261696C6572" +
      "203C3C202F53697A652035202F526F6F74203120302052203E3E0A7374617274787265660A3336340A2525454F460A"
  private val pdfFx_pages =
    "255044462D312E340A312030206F626A203C3C202F54797065202F436174616C6F67202F506167657320322030205220" +
      "3E3E20656E646F626A0A322030206F626A203C3C202F54797065202F5061676573202F4B696473205B33203020522036" +
      "203020525D202F436F756E742033203E3E20656E646F626A0A332030206F626A203C3C202F54797065202F5061676573" +
      "202F506172656E74203220302052202F4B696473205B34203020522035203020525D202F436F756E742032203E3E2065" +
      "6E646F626A0A342030206F626A203C3C202F54797065202F50616765202F506172656E74203320302052202F436F6E74" +
      "656E7473203720302052203E3E20656E646F626A0A352030206F626A203C3C202F54797065202F50616765202F506172" +
      "656E74203320302052202F436F6E74656E7473203820302052203E3E20656E646F626A0A362030206F626A203C3C202F" +
      "54797065202F50616765202F506172656E74203220302052202F436F6E74656E7473203920302052203E3E20656E646F" +
      "626A0A372030206F626A203C3C202F4C656E677468203139203E3E2073747265616D0A4254202870616765206F6E6529" +
      "20546A2045540A656E6473747265616D20656E646F626A0A382030206F626A203C3C202F4C656E677468203139203E3E" +
      "2073747265616D0A42542028706167652074776F2920546A2045540A656E6473747265616D20656E646F626A0A392030" +
      "206F626A203C3C202F4C656E677468203231203E3E2073747265616D0A42542028706167652074687265652920546A20" +
      "45540A656E6473747265616D20656E646F626A0A787265660A302031300A303030303030303030302036353533352066" +
      "200A30303030303030303039203030303030206E200A30303030303030303538203030303030206E200A303030303030" +
      "30313231203030303030206E200A30303030303030313938203030303030206E200A3030303030303032363120303030" +
      "3030206E200A30303030303030333234203030303030206E200A30303030303030333837203030303030206E200A3030" +
      "3030303030343536203030303030206E200A30303030303030353235203030303030206E200A747261696C6572203C3C" +
      "202F53697A65203130202F526F6F74203120302052203E3E0A7374617274787265660A3539360A2525454F460A"
  private val pdfFx_update =
    "255044462D312E340A312030206F626A203C3C202F54797065202F436174616C6F67202F506167657320322030205220" +
      "3E3E20656E646F626A0A322030206F626A203C3C202F54797065202F5061676573202F4B696473205B33203020525D20" +
      "2F436F756E742031203E3E20656E646F626A0A332030206F626A203C3C202F54797065202F50616765202F506172656E" +
      "74203220302052202F4D65646961426F78205B30203020363132203739325D202F436F6E74656E747320342030205220" +
      "3E3E20656E646F626A0A342030206F626A203C3C202F4C656E677468203238203E3E2073747265616D0A425420286F6C" +
      "64207265766973696F6E20746578742920546A2045540A656E6473747265616D20656E646F626A0A787265660A302035" +
      "0A303030303030303030302036353533352066200A30303030303030303039203030303030206E200A30303030303030" +
      "303538203030303030206E200A30303030303030313135203030303030206E200A303030303030303230322030303030" +
      "30206E200A747261696C6572203C3C202F53697A652035202F526F6F74203120302052203E3E0A737461727478726566" +
      "0A3238300A2525454F460A342030206F626A203C3C202F4C656E677468203332203E3E2073747265616D0A4254202875" +
      "706461746564207265766973696F6E20746578742920546A2045540A656E6473747265616D20656E646F626A0A787265" +
      "660A3420310A30303030303030343433203030303030206E200A747261696C6572203C3C202F53697A652035202F526F" +
      "6F74203120302052202F5072657620323830203E3E0A7374617274787265660A3532350A2525454F460A"

  private[queries] val pdfFixtures = Seq(
    ("raw", pdfFx_raw), ("flate", pdfFx_flate),
    ("pages", pdfFx_pages), ("update", pdfFx_update))

  // expected extraction per fixture under the documented operator
  // semantics, as stated by the generator
  private val pdfPinned = Seq(
    ("raw", "Hello (classic) PDF AB\ncontinued line"),
    ("flate", "kerned text run\nHex sid"),
    ("pages", "page one\npage two\npage three"),
    ("update", "updated revision text"))

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
    // per synthetic segment — gzip'd WARC, VALID zstd-framed WARC (which
    // since round 10 DECODES and contributes records), a truncated zstd
    // frame (magic + junk — must refuse, never emit garbage), unknown
    // bytes, by doc_id%4. The oracle replays codec/verdict/count from
    // the construction rule: both real codecs count 1 record, the
    // malformed zstd and the unknown bytes quarantine.
    "web_segment_audit" -> ((s, dir) => {
      WebOps.registerAll(s)
      val docs = Tables.documents(s, dir)
      val rec = WebOps.buildRecord(col("doc_id"),
        WebOps.syntheticUrl(col("doc_id"), col("source")), col("text"))
      val blob = when(col("doc_id") % 4 === 0,
          call_function("gzip_member", rec.cast("binary")))
        .when(col("doc_id") % 4 === 1,
          call_function("zstd_frame", rec.cast("binary")))
        .when(col("doc_id") % 4 === 2,
          concat(unhex(lit("28B52FFD")), col("text").cast("binary")))
        .otherwise(concat(unhex(lit("00")), col("text").cast("binary")))
      WebOps.segmentAudit(docs.withColumn("blob", blob),
          col("doc_id"), col("blob"))
        .orderBy(col("segment_id"))
    }),

    // The zstd first mile, composed end to end: the SAME html-wrapped
    // bodies as web_crawl_e2e but record-at-time zstd frames instead of
    // gzip members — decompress_any routes by magic into the from-spec
    // RFC 8878 decoder, then WARC → HTTP → html_to_text as before. The
    // oracle is identical to web_crawl_e2e's: the container swap must
    // not change one byte of extracted text.
    "web_crawl_e2e_zstd" -> ((s, dir) => {
      WebOps.registerAll(s)
      val recs = Tables.documents(s, dir)
        .select(col("doc_id"),
          WebOps.buildRecord(col("doc_id"), docUrl, htmlOf(col("text"))).as("rec"))
      val files = WebOps.buildCrawlFiles(recs, col("doc_id"), col("rec"),
        perFile = 5, codec = "zstd")
      WebOps.extractPages(files, col("blob"))
        .select(
          regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), col("text").as("page_text"))
        .orderBy(col("doc_id"))
    }),

    // Real-compressor zstd certification: committed fixtures from the
    // INDEPENDENT system zstd CLI (tools/gen_zstd_fixtures.py — levels
    // 1/3/19, with and without XXH64 checksums, single- and multi-block
    // > 128 KB frames, i.e. FSE-coded sequences, Huffman literals with
    // FSE-compressed weights, Treeless/Repeat cross-block modes), each
    // decoded scan-side; the oracle pins the generator's recorded
    // (raw_len, raw_md5) — the decoder must reproduce the CLI's input
    // bit-exactly or the hash breaks.
    "web_zstd_decode" -> ((s, dir) => {
      import s.implicits._
      WebOps.registerAll(s)
      zstdFixtures.toDF("name", "blob_hex")
        .select(col("name"),
          call_function("zunstd_all", unhex(col("blob_hex"))).as("raw"))
        .select(col("name"),
          octet_length(col("raw")).cast("long").as("raw_len"),
          md5(col("raw")).as("raw_md5"))
        .orderBy(col("name"))
    }),


    // PDF text extraction - the second-biggest corpus document format
    // after HTML, now on the read surface: (a) committed fixtures from
    // the INDEPENDENT python generator (raw + Flate streams, TJ kerning
    // arrays, hex strings, escapes, nested page trees, incremental
    // /Prev updates) extracted scan-side against pinned text; (b) every
    // table document round-tripped through the deterministic engine
    // writer (pdf_text(pdf_doc(ascii_clean)) == ascii_clean - literal-
    // string escaping, Flate, and the xref walk certified corpus-wide).
    // The oracle replays pinned strings and the ascii-clean arithmetic.
    "web_pdf_extract" -> ((s, dir) => {
      import s.implicits._
      graft.functions.PdfText.register(s)
      val fx = pdfFixtures.toDF("name", "blob_hex")
        .select(concat(lit("fx:"), col("name")).as("src"),
          call_function("pdf_text", unhex(col("blob_hex"))).as("text_out"))
        .select(col("src"),
          length(col("text_out")).cast("long").as("n_chars"),
          md5(col("text_out").cast("binary")).as("text_md5"),
          col("text_out").isNotNull.as("ok"))
      val docs = Tables.documents(s, dir)
        .withColumn("__clean", regexp_replace(col("text"), "[^ -~]", " "))
        .select(concat(lit("doc:"), col("doc_id").cast("string")).as("src"),
          length(col("__clean")).cast("long").as("n_chars"),
          md5(col("__clean").cast("binary")).as("text_md5"),
          (call_function("pdf_text",
            call_function("pdf_doc", col("__clean").cast("binary")))
            === col("__clean")).as("ok"))
      fx.unionByName(docs).orderBy(col("src"))
    }),

    // Declared-lang × detected-lang AUDIT (a standard corpus QA signal):
    // per registered domain, how often the page's DECLARED language (the
    // html lang attribute, via html_meta) disagrees with the DETECTED
    // language (the marker-word heuristic over the extracted page text).
    // Composes html_meta + html_to_text + the LID heuristic + eTLD+1
    // grouping in one statement; the oracle replays declared (= the
    // construction's lang column) and detected (= the marker arithmetic
    // over the original text — extraction adds no marker tokens) from
    // the row arithmetic alone.
    "web_lang_audit" -> ((s, dir) => {
      WebOps.registerAll(s)
      val docs = Tables.documents(s, dir)
      val html = concat(
        lit("<html lang=\""), col("lang"),
        lit("\"><head><title>t</title></head><body><p>"), col("text"),
        lit("</p></body></html>"))
      val base = docs.select(col("doc_id"),
        UrlOps.registeredDomain(UrlOps.hostOf(docUrl)).as("domain"),
        call_function("html_meta", html).getField("lang").as("declared"),
        call_function("html_to_text", html).as("__txt"))
      val en = TextOps.tokenHits(col("__txt"), Seq("the", "a", "of", "and"))
      val es = TextOps.tokenHits(col("__txt"), Seq("el", "la", "de", "y"))
      val zh = TextOps.tokenHits(col("__txt"), Seq("de", "shi", "le", "zai"))
      base
        .withColumn("detected",
          when(en >= es && en >= zh, "en").when(es >= zh, "es").otherwise("zh"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("declared") =!= col("detected")).cast("long")).as("n_disagree"))
        .withColumn("disagree_milli", expr("(n_disagree * 1000) div n_docs"))
        .orderBy(col("domain"))
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
    // are functions of doc_id % 4; both REAL codecs (gzip'd and valid
    // zstd-framed WARC) contribute a record, the truncated zstd frame
    // and the unknown bytes quarantine
    "web_segment_audit" ->
      """SELECT doc_id AS segment_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'gzip' WHEN 3 THEN 'unknown'
        |    ELSE 'zstd' END AS codec,
        |  (doc_id % 4 IN (2, 3)) AS quarantined,
        |  CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_records
        |FROM documents ORDER BY segment_id""".stripMargin,

    // the container swap must not change a byte: identical replay to
    // web_crawl_e2e
    "web_crawl_e2e_zstd" ->
      s"""SELECT doc_id,
         |  $urlSql AS target_uri,
         |  concat(regexp_replace(trim(text), '\\s+', ' ', 'g'),
         |         ' & ABC <tag> café') AS page_text
         |FROM documents ORDER BY doc_id""".stripMargin,

    // pinned generator strings for the fixtures; ascii-clean closed
    // forms for the table docs (the engine's round trip must hold)
    "web_pdf_extract" -> {
      val fxSql = pdfPinned.map { case (n, t) =>
        val esc = t.replace("'", "''").replace("\n", "' || chr(10) || '")
        s"('fx:$n', '$esc')"
      }.mkString(", ")
      s"""WITH fx AS (SELECT * FROM (VALUES $fxSql) t(src, txt)),
         |d AS (SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS src,
         |    regexp_replace(text, '[^ -~]', ' ', 'g') AS txt
         |  FROM documents)
         |SELECT src, CAST(length(txt) AS BIGINT) AS n_chars,
         |  md5(txt) AS text_md5, TRUE AS ok
         |FROM (SELECT * FROM fx UNION ALL SELECT * FROM d)
         |ORDER BY src""".stripMargin
    },

    // declared = the construction's lang; detected = the marker argmax
    // over the original text (extraction adds no marker tokens)
    "web_lang_audit" ->
      s"""WITH d AS (SELECT doc_id,
         |    CASE doc_id % 4
         |      WHEN 0 THEN source || '.co.uk'
         |      WHEN 1 THEN 'example.com'
         |      WHEN 2 THEN 'example.org'
         |      ELSE source || '.com.au' END AS domain,
         |    lang AS declared,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      x -> x IN ('the','a','of','and'))) AS en_hits,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      x -> x IN ('el','la','de','y'))) AS es_hits,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      x -> x IN ('de','shi','le','zai'))) AS zh_hits
         |  FROM documents),
         |v AS (SELECT domain, declared,
         |    CASE WHEN en_hits >= es_hits AND en_hits >= zh_hits THEN 'en'
         |         WHEN es_hits >= zh_hits THEN 'es'
         |         ELSE 'zh' END AS detected
         |  FROM d)
         |SELECT domain, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN declared <> detected THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_disagree,
         |  CAST(sum(CASE WHEN declared <> detected THEN 1 ELSE 0 END) * 1000
         |    // count(*) AS BIGINT) AS disagree_milli
         |FROM v GROUP BY domain ORDER BY domain""".stripMargin,

    // the generator-pinned (len, md5) of each CLI-compressed fixture:
    // the from-spec decoder must reproduce the CLI's input bit-exactly
    "web_zstd_decode" ->
      s"""SELECT name, CAST(raw_len AS BIGINT) AS raw_len, raw_md5
         |FROM (VALUES $zstdPinnedSql) t(name, raw_len, raw_md5)
         |ORDER BY name""".stripMargin,

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

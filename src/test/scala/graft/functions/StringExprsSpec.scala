package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[DamerauLevenshtein]] — the UNRESTRICTED (Lowrance–Wagner)
  * variant, the one DuckDB's `damerau_levenshtein` implements. The
  * discriminating cases against the restricted OSA recurrence are pinned
  * explicitly because the two are routinely confused (OSA forbids further
  * edits inside a transposed pair; full DL allows them).
  */
class StringExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known distances, incl. the OSA-vs-full-DL discriminators") {
    // values verified against DuckDB damerau_levenshtein this round
    assert(dl("CA", "ABC") === 2)       // OSA would say 3 — the classic pin
    assert(dl("ab", "ba") === 1)
    assert(dl("abc", "acb") === 1)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("", "") === 0)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("abcdef", "abcfed") === 2)
    assert(dl("a cat", "an act") === 2)
    assert(dl("xabx", "xbax") === 1)
    assert(dl("ba", "abab") === 2)
    assert(dl("same", "same") === 0)
  }

  test("metric axioms and levenshtein dominance on random strings") {
    val rnd = new scala.util.Random(7)
    def randStr(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val lev = new org.apache.commons.text.similarity.LevenshteinDistance()
    for (_ <- 1 to 500) {
      val (a, b) = (randStr(), randStr())
      val d = dl(a, b)
      assert(d === dl(b, a), s"symmetry failed on ($a, $b)")
      assert(d >= math.abs(a.length - b.length), s"length bound on ($a, $b)")
      assert(d <= lev.apply(a, b), s"DL must never exceed levenshtein ($a, $b)")
      if (a == b) assert(d === 0)
      else assert(d >= 1)
    }
  }

  test("transpositions of adjacent chars always cost exactly 1") {
    val base = "abcdefgh"
    for (i <- 0 until base.length - 1) {
      val chars = base.toCharArray
      val t = chars(i); chars(i) = chars(i + 1); chars(i + 1) = t
      assert(dl(base, new String(chars)) === 1)
    }
  }

  test("supplementary-plane code points count as one edit unit") {
    // U+1F600 is two UTF-16 chars; distance must treat it as one symbol
    assert(dl("a😀b", "ab") === 1)
    assert(dl("a😀b", "a😀b") === 0)
    assert(dl("😀x", "x😀") === 1)
  }

  test("2000-pair DuckDB golden file agrees exactly (oracle-twin pin)") {
    // src/test/resources/damerau_duckdb_golden.tsv: random pairs over
    // 'abcde ' with DuckDB damerau_levenshtein's answers (seed 123,
    // generated this round) — the cross-engine contract the qj_damerau_typo
    // oracle depends on.
    val in = getClass.getResourceAsStream("/damerau_duckdb_golden.tsv")
    assert(in != null, "golden fixture missing")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size === 2000)
    lines.foreach { line =>
      val p = line.split("\t", -1)
      assert(dl(p(0), p(1)) === p(2).toInt, s"('${p(0)}', '${p(1)}')")
    }
  }

  test("CdcBoundaries == composed filter(sequence, md5-window) form on ASCII") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def randStr(): String =
      (0 until rnd.nextInt(80)).map(_ => (' ' + rnd.nextInt(95)).toChar).mkString
    val df = ((1 to 300).map(_ => randStr()) :+ "" :+ "short").toDF("t")
    val got = df.select(col("t"),
      GraftFunctions.graft_cdc_boundaries(col("t"), 8, 4).as("fast"),
      expr("""CASE WHEN length(t) >= 8 THEN
          filter(sequence(8, length(t)),
            i -> substring(md5(substring(t, i - 7, 8)), 1, 2) < '04')
        ELSE CAST(array() AS array<int>) END""").as("slow")).collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"'${r.getString(0)}'")
    }
  }

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaroWinkler: classics, empty rule, and boost threshold") {
    // values verified against DuckDB jaro_winkler_similarity this round
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("duane", "dwayne") === 0.8400000000000001)
    assert(jw("abc", "abc") === 1.0)
    // DuckDB pins empty -> 0.0 even for BOTH empty (some references say 1)
    assert(jw("", "") === 0.0 && jw("a", "") === 0.0 && jw("", "a") === 0.0)
    assert(jw("abc", "xyz") === 0.0)
    // prefix boost applies only above jaro 0.7: DIXON/DICKSONX matches
    // m=4 (D,I,O,N) with 0 transpositions -> jaro 0.7667, then the
    // 2-char common prefix boosts it; disjoint strings never are
    val jaroDixon = (4.0 / 5 + 4.0 / 8 + 4.0 / 4) / 3.0
    assert(jw("DIXON", "DICKSONX") === jaroDixon + 2 * 0.1 * (1.0 - jaroDixon))
  }

  test("jaroWinkler: 2000-pair DuckDB golden file agrees BIT-exactly") {
    // src/test/resources/jaro_winkler_duckdb_golden.tsv: random pairs over
    // 'abcde ' with DuckDB jaro_winkler_similarity's doubles in hex float
    // form (seed 123, generated this round) — the bit-exact cross-engine
    // contract the qj_jaro_winkler oracle's raw-double hash depends on.
    val in = getClass.getResourceAsStream("/jaro_winkler_duckdb_golden.tsv")
    assert(in != null, "golden fixture missing")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size === 2000)
    lines.foreach { line =>
      val p = line.split("\t", -1)
      val want = java.lang.Double.parseDouble(p(2))
      assert(jw(p(0), p(1)) === want, s"('${p(0)}', '${p(1)}')")
    }
  }

  test("jaroWinkler column API: codegen path agrees; nulls propagate") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def randStr(): String =
      (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val rows = (1 to 300).map(_ => (randStr(), randStr()))
    val got = rows.toDF("a", "b").select(col("a"), col("b"),
      GraftFunctions.graft_jaro_winkler(col("a"), col("b")).as("s")).collect()
    got.foreach { r =>
      assert(r.getDouble(2) === jw(r.getString(0), r.getString(1)))
    }
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.graft_jaro_winkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("column API: codegen and interpreted paths agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def randStr(): String =
      (0 until (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val rows = (1 to 300).map(_ => (randStr(), randStr()))
    val df = rows.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
      GraftFunctions.graft_damerau(col("a"), col("b")).as("d")).collect()
    got.foreach { r =>
      assert(r.getInt(2) === dl(r.getString(0), r.getString(1)))
    }
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.graft_damerau(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("charGramClipped: multiset clipping, code points, short-string zero") {
    import spark.implicits._
    def cg(a: String, b: String, n: Int): Int =
      Seq((a, b)).toDF("a", "b")
        .select(GraftFunctions.graft_chargram_clipped(col("a"), col("b"), n))
        .collect().head.getInt(0)
    // "abab" vs "ab": unigrams min(2,1)+min(2,1)=2; bigrams "ab" min(2,1)=1
    assert(cg("abab", "ab", 1) === 2)
    assert(cg("abab", "ab", 2) === 1)
    assert(cg("abab", "ab", 3) === 0)   // ref shorter than n -> 0
    assert(cg("", "ab", 1) === 0)
    assert(cg("abc", "abc", 3) === 1)
    // clipping is min per gram, both directions agree
    assert(cg("aaa", "aa", 1) === 2)
    assert(cg("aa", "aaa", 1) === 2)
    // code points: astral chars count as ONE window unit
    val s = new String(Character.toChars(0x1F600)) // emoji, 2 UTF-16 units
    assert(cg(s + "x", s + "x", 2) === 1)
    assert(cg(s + "x", "yx", 2) === 0)
    // agrees with the composed explode form on random strings
    val rnd = new scala.util.Random(13)
    def rs(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (1 to 200).foreach { _ =>
      val (x, y, n) = (rs(), rs(), 1 + rnd.nextInt(3))
      def grams(v: String) = v.sliding(n).filter(_.length == n).toSeq
      val want = grams(x).groupBy(identity).map { case (g, o) =>
        math.min(o.size, grams(y).count(_ == g)) }.sum
      assert(cg(x, y, n) === want, s"'$x' '$y' n=$n")
    }
  }

  test("tokenLevenshtein: token-unit edits, not characters") {
    import spark.implicits._
    def tl(a: Seq[String], b: Seq[String]): Int =
      Seq((a, b)).toDF("a", "b")
        .select(GraftFunctions.graft_token_levenshtein(col("a"), col("b")))
        .collect().head.getInt(0)
    assert(tl(Seq("the", "cat", "sat"), Seq("the", "cat", "sat")) === 0)
    assert(tl(Seq("the", "cat", "sat"), Seq("the", "dog", "sat")) === 1)
    // a substitution between very different-length tokens is STILL 1
    assert(tl(Seq("a"), Seq("antidisestablishmentarianism")) === 1)
    assert(tl(Seq.empty[String], Seq("x", "y")) === 2)
    assert(tl(Seq("x", "y"), Seq.empty[String]) === 2)
    assert(tl(Seq("a", "b", "c"), Seq("b", "c", "d")) === 2) // del a, ins d
    // transposition costs 2 (plain Levenshtein, no Damerau swap)
    assert(tl(Seq("a", "b"), Seq("b", "a")) === 2)
    // equals char-level levenshtein under a 1-char-per-token encoding
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val x = (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar)
      val y = (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar)
      val viaChars = Seq((x.mkString, y.mkString)).toDF("a", "b")
        .select(levenshtein(col("a"), col("b"))).collect().head.getInt(0)
      assert(tl(x.map(c => s"tok_$c"), y.map(c => s"tok_$c")) === viaChars)
    }
    // nulls inside the arrays: two nulls are the SAME token
    val withNulls = Seq((Seq[String](null, "a"), Seq[String](null, "a")))
      .toDF("a", "b")
      .select(GraftFunctions.graft_token_levenshtein(col("a"), col("b")))
      .collect().head.getInt(0)
    assert(withNulls === 0)
    // null ARRAY propagates null
    val n2 = Seq((Option(Seq("x")), Option.empty[Seq[String]])).toDF("a", "b")
      .select(GraftFunctions.graft_token_levenshtein(col("a"), col("b")))
      .collect()
    assert(n2.head.isNullAt(0))
  }

  test("tokenLcs: longest common subsequence over tokens; LCS + indel identity") {
    import spark.implicits._
    def lc(a: Seq[String], b: Seq[String]): Int =
      Seq((a, b)).toDF("a", "b")
        .select(GraftFunctions.graft_token_lcs(col("a"), col("b")))
        .collect().head.getInt(0)
    assert(lc(Seq("a", "b", "c", "d", "e"), Seq("a", "c", "e", "x")) === 3)
    assert(lc(Seq("the", "cat", "sat"), Seq("the", "cat", "sat")) === 3)
    assert(lc(Seq("a", "b"), Seq("b", "a")) === 1)    // order matters
    assert(lc(Seq.empty[String], Seq("x")) === 0)
    assert(lc(Seq("x"), Seq.empty[String]) === 0)
    assert(lc(Seq("x", "y", "z"), Seq("p", "q")) === 0)
    // repeated tokens: LCS of "a a b a" / "a b a a" is "a b a" or "a a a" = 3
    assert(lc(Seq("a", "a", "b", "a"), Seq("a", "b", "a", "a")) === 3)
    // randomized identity vs an insert/delete-only reference:
    // 2*LCS(a,b) = |a| + |b| - d_indel(a,b)
    def indel(a: Seq[String], b: Seq[String]): Int = {
      val (n, m) = (a.length, b.length)
      var prev = Array.tabulate(m + 1)(identity)
      for (i <- 1 to n) {
        val cur = new Array[Int](m + 1); cur(0) = i
        for (j <- 1 to m)
          cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1)
            else math.min(prev(j), cur(j - 1)) + 1
        prev = cur
      }
      prev(m)
    }
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val x = (0 until rnd.nextInt(10)).map(_ => s"t${rnd.nextInt(4)}")
      val y = (0 until rnd.nextInt(10)).map(_ => s"t${rnd.nextInt(4)}")
      assert(2 * lc(x, y) === x.length + y.length - indel(x, y),
        s"$x vs $y")
    }
  }
}

package graft.operators

import graft.SparkSpec

/** [[Bpe.trainMerges]]: greedy merge order, frequency weighting across
  * duplicate words, tie-breaking, early exhaustion, delimiter hygiene.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns merges most-frequent-first, weighting by word frequency") {
    // vocab: ab x2, abc x1, abd x1 → (a,b) count 4 wins round 1;
    // round 2 ties (ab,c)=(ab,d)=1 → lexicographic "ab c" first;
    // round 4 has no pairs left → stops early at 3 merges
    val docs = Seq("ab ab abc", "abd").toDF("text")
    val got = Bpe.trainMerges(docs, "text", rounds = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 4L), (2, "ab", "c", 1L), (3, "ab", "d", 1L)))
  }

  test("merged symbols pair in later rounds (the re-pair step)") {
    // "aaaa" x3: the census counts OVERLAPPING pairs (zip semantics —
    // 3 per word, ×3 = 9), but the merge applies non-overlapping
    // left-to-right → [aa, aa] per word; round 2 pairs the new symbol:
    // (aa, aa) once per word = 3
    val docs = Seq("aaaa aaaa aaaa").toDF("text")
    val got = Bpe.trainMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("encodeTokenCount replays merges greedily in training order") {
    import org.apache.spark.sql.functions.col
    // merges (a,b) then (ab,c): "abc"→[abc]=1, "abd"→[ab,d]=2,
    // "cab"→[c,ab]=2 (no (ab,c) match — c precedes), "xyz"→3 untouched
    val merges = Seq(("a", "b"), ("ab", "c"))
    val got = Seq("abc", "abd", "cab", "xyz").toDF("w")
      .select(col("w"), Bpe.encodeTokenCount(col("w"), merges).as("n"))
      .as[(String, Int)].collect().toMap
    assert(got == Map("abc" -> 1, "abd" -> 2, "cab" -> 2, "xyz" -> 3))
  }

  test("words containing the delimiter are dropped, not corrupted") {
    val docs = Seq("ab ab a|b").toDF("text")
    val got = Bpe.trainMerges(docs, "text", rounds = 1, delim = "|")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 2L))) // a|b excluded from the census
  }

  test("a multi-character delimiter rejects loudly (trim strips a char SET)") {
    // round-12 review: two-arg trim() strips any of the delim's
    // CHARACTERS from word edges — delim "ab" would eat "bob"'s b's
    val docs = Seq("bob bobbed").toDF("text")
    val e = intercept[IllegalArgumentException](
      Bpe.trainMerges(docs, "text", rounds = 1, delim = "ab").collect())
    assert(e.getMessage.contains("single character"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Bpe.encodeTokenCount(org.apache.spark.sql.functions.lit("x"), Nil, "ab"))
    assert(e2.getMessage.contains("single character"), e2.getMessage)
  }

  test("encodeTokenCount survives a 10k-entry merge list (round-11 depth fix)") {
    import org.apache.spark.sql.functions.col
    // the folded replace-Column form nested one node per merge and
    // overflowed the analyzer stack at production merge counts; the
    // ChainReplace kernel must stay depth-1 and still apply the list
    val merges = Seq(("a", "b"), ("ab", "c")) ++
      (0 until 10000).map(i => (s"x${i % 100}", s"y${i % 97}"))
    val got = Seq("abcabc", "zzzz").toDF("w")
      .select(Bpe.encodeTokenCount(col("w"), merges).as("n"))
      .as[Int].collect().toSeq
    // "abcabc": a+b -> ab, ab+c -> abc => 2 tokens; "zzzz" untouched => 4
    assert(got == Seq(2, 4), got.toString)
  }

  test("encodeTokenCount equals a list-based BPE fold over random words and merge lists") {
    // property differential (round 10): the Column encode side is a
    // chain of delimiter-framed string `replace`s — equivalence with the
    // textbook symbol-list fold (greedy one-pass left-to-right per
    // merge, in training order) is the claim q78's single-corpus oracle
    // cannot pin across the input space.
    def refCount(word: String, merges: Seq[(String, String)]): Int = {
      var syms = word.map(_.toString).toList
      for ((l, r) <- merges) {
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toList
      }
      syms.length
    }
    for (seed <- 0 until 15) {
      val rnd = new scala.util.Random(seed * 48271L)
      val alphabet = "abc"
      // merge lists that can chain (merged symbols feeding later merges),
      // including degenerate repeats like (a, a)
      val symbols = Seq("a", "b", "c", "ab", "bc", "ca", "aa", "abc")
      val merges = (0 until 1 + rnd.nextInt(6)).map { _ =>
        (symbols(rnd.nextInt(symbols.length)), symbols(rnd.nextInt(symbols.length)))
      }
      val words = (0 until 40).map { _ =>
        (1 to 1 + rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(3))).mkString
      }.distinct
      val df = words.toDF("w")
        .select($"w", Bpe.encodeTokenCount($"w", merges).as("n"))
      val got = df.as[(String, Int)].collect().toMap
      words.foreach { w =>
        assert(got(w) == refCount(w, merges),
          s"seed $seed word $w merges $merges: ${got(w)} != ${refCount(w, merges)}")
      }
    }
  }
}

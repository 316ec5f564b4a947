package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.Row

/** Unit coverage for Fuzzy.levenshteinPairs with KNOWN pairs — the
  * fixture-level differential check can pass with zero rows on both sides,
  * so correctness of the blocking + distance filter is pinned here. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(vocab: Seq[String], maxDist: Int): Set[(String, String, Int)] =
    Fuzzy.levenshteinPairs(vocab.toDF("tok"), "tok", maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("levenshteinPairs finds substitution, insertion, and same-length pairs at d=1") {
    // cat~cot (subst, d=1), cat~cart (insert, |len diff|=1, d=1),
    // cot~cart is d=2 -> excluded; dog is isolated.
    val got = pairs(Seq("cat", "cot", "cart", "dog"), maxDist = 1)
    assert(got === Set(("cat", "cot", 1), ("cart", "cat", 1)))
  }

  test("levenshteinPairs at d=2 includes the distance-2 pair exactly once") {
    val got = pairs(Seq("cat", "cot", "cart"), maxDist = 2)
    assert(got === Set(("cat", "cot", 1), ("cart", "cat", 1), ("cart", "cot", 2)))
  }

  test("levenshteinPairs crosses a length gap equal to maxDist") {
    // ab~abcd has |len diff| = 2 = d: the length-bucket replication must
    // reach it (a one-sided window would miss it).
    val got = pairs(Seq("ab", "abcd"), maxDist = 2)
    assert(got === Set(("ab", "abcd", 2)))
  }

  test("levenshteinPairs dedups input values and ignores NULLs") {
    val df = Seq(Some("cat"), Some("cat"), Some("cot"), None).toDF("tok")
    val got = Fuzzy.levenshteinPairs(df, "tok", maxDist = 1)
      .collect().map { case Row(a: String, b: String, d: Int) => (a, b, d) }.toSet
    assert(got === Set(("cat", "cot", 1)))
  }

  test("levenshteinPairs is empty when nothing is within distance") {
    assert(pairs(Seq("alpha", "zebra9", "qqqqqqqq"), maxDist = 1) === Set.empty)
  }

  test("levenshteinPairs matches all-pairs brute force on a random vocabulary (d=0,1,2)") {
    // 3-letter alphabet, lengths 1-8: dense with near pairs, and lengths
    // below maxDist+1 exercise the empty-segment (short string) path.
    val rnd = new scala.util.Random(42)
    val vocab = Seq.fill(150)(
      Seq.fill(1 + rnd.nextInt(8))("abc"(rnd.nextInt(3))).mkString).distinct
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    for (d <- 0 to 2) {
      val expected = (for {
        a <- vocab; b <- vocab if a < b
        dist = lev(a, b) if dist <= d
      } yield (a, b, dist)).toSet
      assert(pairs(vocab, d) === expected, s"mismatch at maxDist=$d")
    }
  }
}

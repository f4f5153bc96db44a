package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], maxDist: Int, keyLen: Int) = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def pad(s: String) = (s + "#" * keyLen).take(keyLen)
    (for {
      (ia, ka) <- rows; (ib, kb) <- rows
      if ia < ib
      d = lev(pad(ka), pad(kb)) if d <= maxDist
    } yield (ia, ib, d)).toSet
  }

  private def run(rows: Seq[(Long, String)], maxDist: Int,
                  keyLen: Int = 24) =
    FuzzyJoin.selfJoin(rows.toDF("id", "key"), "id", "key", maxDist,
        keyLen = keyLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("prefix-filtered join equals brute force, typos and pads included") {
    val rows = Seq(
      (1L, "the quick brown fox jump"),
      (2L, "the quick brewn fox jump"), // 1 substitution
      (3L, "the quick brown fax jmup"), // 3 edits from 1
      (4L, "a completely different k"),
      (5L, "the quick brown fox"), // shorter -> pads to dist 0 vs itself
      (6L, "the quick brown fox"), // exact dup of 5
      (7L, "zz"), (8L, "zz")) // tiny keys, heavy padding
    for (d <- 1 to 2)
      assert(run(rows, d) === brute(rows, d, 24), s"maxDist $d")
    // larger grams (the high-uniformity-key setting) stay lossless too
    val q5 = FuzzyJoin.selfJoin(rows.toDF("id", "key"), "id", "key",
        maxDist = 2, q = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(q5 === brute(rows, 2, 24))
  }

  test("hot shared grams do not defeat the rare-prefix pruning") {
    // 200 keys all sharing the stopword-ish head "the "; only two pairs
    // are truly close. The prefix filter must key on the rare tails.
    val rows = (0L until 200L).map { i =>
      (i, f"the common head ${i}%06d")
    } ++ Seq((900L, "the common head 000042x"), (901L, "the common head 000099"))
    val got = run(rows.toSeq, 2)
    assert(got === brute(rows.toSeq, 2, 24))
    // candidate economics: the join keyed on rarest grams, so true-pair
    // verifies dominate — sanity-check at least the planted pairs hit
    assert(got.contains((42L, 900L, got.collectFirst {
      case (42L, 900L, d) => d }.get)))
    assert(got.exists { case (a, b, _) => a == 99L && b == 901L })
  }

  test("two-table join: dirty keys match the canonical dictionary exactly") {
    val dict = Seq((1L, "the quick brown fox jump"),
      (2L, "a completely different k"), (3L, "third canonical entry ok"))
    val dirty = Seq((10L, "the quick brewn fox junp"), // 2 subs from 1
      (11L, "a completely different x"), // 1 sub from 2
      (12L, "no match at all here zzz"),
      (13L, "third canonical entry ok")) // exact
    def pad(s: String) = (s + "#" * 24).take(24)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (il, kl) <- dirty; (ir, kr) <- dict
      d = lev(pad(kl), pad(kr)) if d <= 2
    } yield (il, ir, d)).toSet
    val got = FuzzyJoin.join(dirty.toDF("id", "key"), "id", "key",
        dict.toDF("id", "key"), "id", "key", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    assert(got.exists(_._1 == 10L) && got.exists(_._1 == 13L))
    assert(!got.exists(_._1 == 12L))
  }

  test("t <= 0 (filter would admit all pairs) is rejected loudly") {
    val rows = Seq((1L, "abc"), (2L, "abd"))
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(rows.toDF("id", "key"), "id", "key",
        maxDist = 4, q = 3, keyLen = 8)
    }
    assert(e.getMessage.contains("count bound"))
  }

  test("property: lossless vs brute force on random tiny-alphabet keys") {
    // adversarial regime for the prefix filter: alphabet {a,b,c} makes
    // every gram hot and duplicate grams common (the occ-tagging path),
    // uneven lengths exercise the padding law. 20 seeded rounds.
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 20) {
      val n = 10 + rnd.nextInt(30)
      val rows = (0 until n).map { i =>
        val len = 1 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString)
      }
      val d = rnd.nextInt(3)
      val got = FuzzyJoin.selfJoin(rows.toDF("id", "key"), "id", "key",
          maxDist = d, q = 2, keyLen = 12)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === brute(rows, d, 12), s"round $round (n=$n, d=$d)")
    }
  }

  test("partitioning-invariant") {
    val rows = (0L until 100L).map(i => (i, s"key number ${i % 37} tail"))
    def go(parts: Int) =
      FuzzyJoin.selfJoin(rows.toDF("id", "key").repartition(parts),
          "id", "key", 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(go(1) === go(16))
  }
}

package graft.ops

import graft.SparkSpec

/** Deletion-neighborhood fuzzy join: pins the blocking COMPLETE and the
  * verification SOUND by comparing against a driver-side brute-force
  * all-pairs Levenshtein over adversarial random universes (tiny
  * alphabet → dense near-neighborhoods, repeated chars, empty-adjacent
  * lengths — the shapes where an off-by-one in variant generation
  * would hide). */
class FuzzySpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteforce(names: Seq[String]): Set[(String, String)] = {
    val distinct = names.distinct
    (for {
      a <- distinct; b <- distinct
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
  }

  test("editPairs == all-pairs levenshtein<=1 on random tiny-alphabet universes") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val universe = Seq.fill(120)(
        (0 until rng.nextInt(7)).map(_ => ('a' + rng.nextInt(3)).toChar)
          .mkString).filter(_.nonEmpty).distinct
      val df = universe.toDF("name")
      val got = Fuzzy.editPairs(df).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val want = bruteforce(universe)
      assert(got === want, s"round $round: universe $universe")
    }
  }

  test("all reported pairs carry lev == 1 (a<b excludes lev 0)") {
    import spark.implicits._
    val df = Seq("ring", "rings", "rang", "ring", "bolt").toDF("name").distinct()
    val rows = Fuzzy.editPairs(df).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) == 1))
  }

  test("gate query finds the fixture's near-identical part names") {
    val rows = Fuzzy.qFuzzyMatch(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty, "fuzzy gate would be vacuous")
    // ordered output, pair ordering canonical
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    val sorted = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(sorted == sorted.sorted)
  }
}

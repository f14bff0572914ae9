package graft

/** Regression tests for the shared-materialization machinery and Bench's
  * JSON record hygiene. */
class TablesSpec extends SparkSpec {

  test("materializeShared rebuilds when its backing dir was externally removed") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val first = Tables.materializeShared(df, "tablesspec", "recovery-test")
    assert(first.count() === 2)
    // find and delete the backing dir (the long-session /tmp-cleaner
    // scenario the recovery exists for)
    val loc = first.inputFiles.head.stripPrefix("file:")
    val dir = new java.io.File(loc).getParentFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
    assert(!dir.exists())
    // reuse must detect the loss and rebuild, not serve the dead path
    val again = Tables.materializeShared(df, "tablesspec", "recovery-test")
    assert(again.count() === 2)
    // and while the dir is alive, the cache really does reuse it
    val third = Tables.materializeShared(
      Seq((9L, "z")).toDF("id", "v"), "tablesspec", "recovery-test")
    assert(third.count() === 2) // caller-promised same content: reused
  }

  test("materializeSharedBy never touches the builder on reuse") {
    import spark.implicits._
    // the CC labelings are built through this path BECAUSE their
    // construction executes Spark jobs: a reuse that re-evaluates the
    // builder would re-run the whole iterative loop just to discard it
    var builds = 0
    def build() = { builds += 1; Seq((1L, 2L)).toDF("a", "b") }
    val first = Tables.materializeSharedBy(spark, "tablesspec", "lazy-test")(build())
    assert(first.count() === 1 && builds === 1)
    val again = Tables.materializeSharedBy(spark, "tablesspec", "lazy-test")(build())
    assert(again.count() === 1)
    assert(builds === 1, "reuse evaluated the by-name builder")
  }

  test("bench summary line fits a 2000-char tail buffer and parses") {
    import spark.implicits._
    // realistic worst case: 3 passes, budget stop, long sf path — the
    // driver keeps only the LAST 2000 stdout chars, so this line (printed
    // last) must fit whole no matter what the full per-query record does
    val line = Bench.summaryJson(
      total = 64.123456789, nQueries = 117, minTotal = 60.3456,
      failedN = 2, skippedN = 14, multiSampledN = 103, passes = 3,
      passesCompleted = 2,
      passTotals = Seq(103.636363, 60.818181, 58.444444),
      passPartial = Seq(false, false, true), budgetSec = 300.0,
      elapsedSec = 287.654, prewarmSec = 9.8765, prewarmOk = true,
      barrierSec = 3.21, inflation = 2.34, lanesN = 57, streamPar = true,
      canaryFactor = 0.523456, ioCanaryFactor = 0.512345,
      sf = "/root/testdata/sf0.1")
    assert(!line.contains("\n") && !line.contains("\r"))
    assert(line.length < 1500, s"summary line too long: ${line.length}")
    val row = spark.read.json(Seq(line).toDS).collect().head
    val schema = spark.read.json(Seq(line).toDS).schema
    def d(f: String) = row.getDouble(schema.fieldIndex(f))
    assert(math.abs(d("value") - 64.123) < 1e-9)
    assert(math.abs(d("min_total") - 60.346) < 1e-9)
    assert(row.getLong(schema.fieldIndex("n_queries")) === 117L)
    assert(row.getLong(schema.fieldIndex("skipped_n")) === 14L)
    assert(row.getLong(schema.fieldIndex("multi_sampled_n")) === 103L)
    assert(row.getString(schema.fieldIndex("sf")) === "/root/testdata/sf0.1")
  }

  test("bench summary line stays under the tail buffer at ANY registry size") {
    // VERDICT r20 item 2: the contract must hold as the registry grows,
    // not just at today's size. The summary line carries NO per-query
    // map, so its only growth vectors are digit counts and pass_totals
    // length — pin the pathological worst case (100k queries, 9 passes,
    // six-figure totals, long sf path) under the driver's 2000-char
    // stdout tail
    val line = Bench.summaryJson(
      total = 999999.999999, nQueries = 100000, minTotal = 999999.999999,
      failedN = 100000, skippedN = 100000, multiSampledN = 100000,
      passes = 9, passesCompleted = 9,
      passTotals = Seq.fill(9)(999999.999999),
      passPartial = Seq.fill(9)(true), budgetSec = 99999.0,
      elapsedSec = 99999.99, prewarmSec = 9999.99, prewarmOk = false,
      barrierSec = 9999.99, inflation = 999.99, lanesN = 100000,
      streamPar = true, canaryFactor = 999.999999,
      ioCanaryFactor = 999.999999,
      sf = "/root/testdata/sf100.0/some/unusually/long/fixture/path")
    assert(!line.contains("\n") && !line.contains("\r"))
    assert(line.length < 2000, s"summary line too long: ${line.length}")
  }

  test("bench JSON escaping survives multi-line exception messages") {
    import spark.implicits._
    val nasty = "line1\nline2\t\"quoted\\path\"\rend"
    val escaped = Bench.jsonStr(nasty)
    // must be one physical line (the bench record is line-oriented)...
    assert(!escaped.contains("\n") && !escaped.contains("\r"))
    // ...and valid JSON: round-trip through a real parser recovers the
    // original message byte-for-byte
    val parsed = spark.read.json(Seq(s"""{"m":$escaped}""").toDS)
      .collect().head.getString(0)
    assert(parsed === nasty)
  }
}

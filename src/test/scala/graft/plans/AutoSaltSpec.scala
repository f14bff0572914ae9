package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AutoSalt optimizer rule: plan rewritten under the conf (and ONLY
  * under the conf), result-identical to the plain aggregation, and
  * conservative — distinct aggregates, global aggregates, and
  * unsupported functions are left untouched. */
class AutoSaltSpec extends SparkSpec {

  private val key = "spark.graft.autosalt.enabled"

  private def withRule[A](body: => A): A = {
    AutoSalt.ensureRegistered(spark)
    spark.conf.set(key, "true")
    try body finally spark.conf.unset(key)
  }

  private def toks = graft.Tables(spark, sf("sf0.001"), "documents")
    .select(col("doc_id"), explode(
      graft.ops.TextOps.tokens(col("text"))).as("token"))

  test("eligible aggregate is rewritten and result-identical") {
    val agg = toks.groupBy("token")
      .agg(count(lit(1)).as("n"), sum(graft.Tables.dec(col("doc_id")))
        .as("s"), min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val plain = agg.orderBy("token").collect().toSeq
    val (salted, plan) = withRule {
      (agg.orderBy("token").collect().toSeq,
        agg.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("pmod(hash("), "plan not salted:\n" + plan)
    assert(plan.contains("__p_0"), "no partial stage:\n" + plan)
    assert(salted === plain, "rewrite changed results")
    // schema unchanged (decimal sum cast back to the original type)
    assert(withRule(agg.schema) === agg.schema)
  }

  test("fixpoint-stable: exactly one salt stage appears") {
    val plan = withRule {
      toks.groupBy("token").agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.toString
    }
    assert(plan.split(java.util.regex.Pattern.quote("pmod(hash("),
      -1).length - 1 == 1, // exactly one salt stage
      "salt stage duplicated:\n" + plan)
  }

  test("conservative: distinct, global, and non-integral avg untouched") {
    withRule {
      val distinctPlan = toks.groupBy("token")
        .agg(countDistinct(col("doc_id")).as("u"))
        .queryExecution.optimizedPlan.toString
      assert(!distinctPlan.contains("__p_0"))
      val globalPlan = toks.agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.toString
      assert(!globalPlan.contains("__p_0"))
      // double avg re-associates; decimal avg rides the engine's
      // precision-promotion chain — both stay untouched
      val dAvgPlan = toks.groupBy("token")
        .agg(avg(col("doc_id").cast("double")).as("a"))
        .queryExecution.optimizedPlan.toString
      assert(!dAvgPlan.contains("__p_0"))
      val decAvgPlan = toks.groupBy("token")
        .agg(avg(graft.Tables.dec(col("doc_id"))).as("a"))
        .queryExecution.optimizedPlan.toString
      assert(!decAvgPlan.contains("__p_0"))
    }
  }

  test("integral avg is rewritten: exact Sum+Count partials, result-identical, null-safe") {
    // avg over long, avg over int, and an avg whose input is ALWAYS null
    // (every group hits the stage-2 zero-count guard — ANSI mode throws
    // on x/0 where the plain Average returns null)
    val agg = toks.groupBy("token")
      .agg(avg(col("doc_id")).as("a"),
        avg(length(col("token"))).as("al"),
        avg(when(col("doc_id") < 0, col("doc_id"))).as("an"),
        count(lit(1)).as("n"))
    val plain = agg.orderBy("token").collect().toSeq
    val (salted, plan) = withRule {
      (agg.orderBy("token").collect().toSeq,
        agg.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("pmod(hash("), "plan not salted:\n" + plan)
    assert(plan.contains("__p_0_0") && plan.contains("__p_0_1"),
      "avg not decomposed into two partials:\n" + plan)
    assert(salted === plain, "avg rewrite changed results")
    assert(plain.forall(_.isNullAt(3)), "avg(all-null) must be null")
    assert(withRule(agg.schema) === agg.schema)
  }

  test("integral avg: salted plan never overflows where the plain plan succeeds") {
    // a group whose input sums past Long.MaxValue: the plain Average
    // (internal double running sum) returns a finite value, so the
    // salted plan must too — a long Sum partial threw
    // ARITHMETIC_OVERFLOW here under ANSI mode (ADVICE r14); the
    // DECIMAL(38,0) partial widens past any reachable sum
    val big = spark.range(0, 2).select(
      lit("k").as("k"), lit(Long.MaxValue).as("v"))
    val agg = big.groupBy("k").agg(avg(col("v")).as("a"))
    val plain = agg.collect().toSeq
    val salted = withRule(agg.collect().toSeq)
    assert(salted === plain,
      "salted avg diverged (or threw) on a Long-overflowing group")
  }

  test("conservative: float/double sums untouched (FP re-association)") {
    withRule {
      // the extra merge stage would re-associate FP addition — the rule
      // must leave double/float Sum to the plain single-stage plan
      val dPlan = toks.groupBy("token")
        .agg(sum(col("doc_id").cast("double")).as("s"))
        .queryExecution.optimizedPlan.toString
      assert(!dPlan.contains("__p_0"), "double sum was salted:\n" + dPlan)
      val fPlan = toks.groupBy("token")
        .agg(sum(col("doc_id").cast("float")).as("s"))
        .queryExecution.optimizedPlan.toString
      assert(!fPlan.contains("__p_0"), "float sum was salted:\n" + fPlan)
      // ...while a LONG sum in the same shape still is
      val lPlan = toks.groupBy("token")
        .agg(sum(col("doc_id")).as("s"))
        .queryExecution.optimizedPlan.toString
      assert(lPlan.contains("__p_0"), "long sum not salted:\n" + lPlan)
    }
  }

  test("stage-2 shape is structurally re-salt-proof (tag-independent)") {
    // a hand-built frame shaped exactly like the rewrite's merge stage —
    // grouped aggregate whose every aggregate input is a __p_* attribute
    // — must fail eligibility even with no TreeNodeTag present (a later
    // rule that rebuilds the node without copying tags must not re-salt)
    withRule {
      val partials = toks.groupBy("token")
        .agg(count(lit(1)).as("__p_0"), sum(col("doc_id")).as("__p_1"))
      val merge = partials.groupBy("token")
        .agg(sum(col("__p_0")).as("n"), sum(col("__p_1")).as("s"))
      val plan = merge.queryExecution.optimizedPlan.toString
      // the inner aggregate is alias-guarded (its outputs are __p_*) and
      // the outer is structurally guarded — neither may gain a salt stage
      assert(!plan.contains("pmod(hash("),
        "merge-shaped aggregate re-salted:\n" + plan)
    }
  }

  test("rule is inert without the conf") {
    AutoSalt.ensureRegistered(spark)
    val plan = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("__p_0"))
  }
}

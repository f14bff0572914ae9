package graft.ops

import graft.SparkSpec

/** Typed-cogroup semantics the fixture cannot exercise (it has full
  * referential integrity in both directions): keys missing on either
  * side must still surface, with the documented defaults. Plus the
  * cents-fold rounding pin. */
class TypedSpec extends SparkSpec {

  test("cogroup emits both missing-side shapes and exact cents") {
    import spark.implicits._
    val custs = Seq(
      Typed.CustRow(1L, "BUILDING"), // customer with no orders
      Typed.CustRow(2L, "MACHINERY")).toDS()
    val orders = Seq(
      Typed.OrderRow(2L, 10.005), // half-up -> 10.01 -> 1001 cents
      Typed.OrderRow(2L, 0.004), //            0.00 ->    0 cents
      Typed.OrderRow(3L, 99.99) // orphan order, no customer row
    ).toDS()
    val got = Typed.cogroupSpend(custs, orders).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "BUILDING", 0L, 0L),
      (2L, "MACHINERY", 2L, 1001L),
      (3L, "?", 1L, 9999L)))
  }
}

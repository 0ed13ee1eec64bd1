package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantics the sf0.01 oracle gate cannot prove for the round's
  * subquery-decorrelation family: TIE keeping (the testdata yields a
  * single o20 winner and no o18 per-part price tie, so those branches
  * never execute there) and the exclusion/threshold boundaries.
  */
class RelationalSubquerySpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private val nation = Seq((0, "N0", 0), (1, "N1", 1))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private val region = Seq((0, "ASIA"), (1, "EUROPE"))
    .toDF("r_regionkey", "r_name")
  // s1, s2 in-region (ASIA); s9 out-of-region
  private val supplier = Seq(
    (1L, "s1", 0, 10.0), (2L, "s2", 0, 20.0), (9L, "s9", 1, 99.0))
    .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  private def li(rows: (Long, Long, Double, java.sql.Timestamp)*) =
    rows.toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_shipdate")
  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("o18 keeps BOTH suppliers on a per-part min-price tie, and out-of-region prices never set the min") {
    val part = Seq((100L, "pa", "SMALL"), (200L, "pb", "SMALL"))
      .toDF("p_partkey", "p_name", "p_type")
    val lineitem = li(
      (100L, 1L, 5.0, ts("1996-01-01")),   // part 100: s1 at 5.0
      (100L, 2L, 5.0, ts("1996-02-01")),   // part 100: s2 ties at 5.0
      (100L, 2L, 7.0, ts("1996-03-01")),   // higher price, same pair — min wins
      (200L, 2L, 9.0, ts("1996-01-05")),   // part 200: s2 alone in-region
      (200L, 9L, 1.0, ts("1996-01-06")))   // out-of-region s9 is cheaper but EXCLUDED
    val out = Relational.minCostSuppliers(part, supplier, nation, region, lineitem)
      .select("p_partkey", "s_name", "min_price")
      .as[(Long, String, Double)].collect().toSet
    out shouldBe Set((100L, "s1", 5.0), (100L, "s2", 5.0), (200L, "s2", 9.0))
  }

  test("o20 keeps every supplier tied at the maximum, on the exact decimal sum") {
    val lineitem = Seq(
      (1L, 10.0, 0.0, ts("1996-01-10")),
      (1L, 10.0, 0.0, ts("1996-02-10")),
      (2L, 20.0, 0.0, ts("1996-03-01")),  // s2 ties s1 at 20 via one line
      (9L, 30.0, 0.0, ts("1995-06-01")))  // outside the window — not a winner
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val out = Relational.topRevenueSupplier(supplier, lineitem)
      .select("s_name", "total_rev").as[(String, Double)].collect().toSet
    out shouldBe Set(("s1", 20.0), ("s2", 20.0))
  }

  test("o21 exclusion boundary: exactly maxReturns R-lines stays counted, one more is excluded") {
    val part = Seq((100L, "Brand#1", "SMALL", 5))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    def rLines(supp: Long, n: Int) =
      (1 to n).map(_ => (100L, supp, "R"))
    val lineitem = (rLines(1L, 2) ++ rLines(2L, 3) :+ ((100L, 3L, "N")))
      .toDF("l_partkey", "l_suppkey", "l_returnflag")
    // maxReturns=2: s1 (exactly 2 R) stays, s2 (3 R) excluded, s3 stays
    val out = Relational.supplierDiversity(part, lineitem, maxReturns = 2L)
      .select("supplier_cnt").as[Long].collect()
    out shouldBe Array(2L)
  }

  test("o22 HAVING boundary: the pair total must strictly exceed minQty, summed across lines") {
    val part = Seq((100L, "small ring"), (200L, "big bolt"))
      .toDF("p_partkey", "p_name")
    val lineitem = Seq(
      (100L, 1L, 3.0, ts("1997-05-01")),  // s1 on a 'small' part: 3+3=6 > 5
      (100L, 1L, 3.0, ts("1997-06-01")),
      (100L, 2L, 5.0, ts("1997-07-01")),  // s2: exactly 5 — NOT > 5
      (200L, 9L, 50.0, ts("1997-08-01"))) // s9: plenty, but not a 'small' part
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val out = Relational.volumeSuppliers(part, supplier, nation, lineitem,
        namePrefix = "small", minQty = 5.0)
      .select("s_name").as[String].collect()
    out shouldBe Array("s1")
  }

  test("o19 gate is strict and exact: a part at exactly 1.5x the average does not qualify") {
    // parts {1, 3}: total 4, n=2 → the gate v·2n > 3·total puts part b
    // exactly AT the boundary (3·4 = 12 on both sides) — strict-greater
    // must exclude it, and the decimal compare makes the tie exact
    val lineitem = Seq(
      (1L, 1.0, 0.0), (2L, 3.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    Relational.partValueConcentration(lineitem).count() shouldBe 0L
    // nudge b above the exact 1.5x point and it qualifies
    val li2 = Seq((1L, 1.0, 0.0), (2L, 3.01, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Relational.partValueConcentration(li2)
      .as[(Long, Double)].collect()
    out shouldBe Array((2L, 3.01))
  }
}

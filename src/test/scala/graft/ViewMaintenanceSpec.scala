package graft

import graft.operators.ViewMaintenance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Incremental join-view maintenance specs: the affected-slice fold must
  * land exactly on a fresh join under every change class — insert,
  * delete, update, a JOIN-KEY MOVE on the A side, a fanned-out B-side
  * update, and the changed-A × changed-B overlap (which must not emit
  * twice). The s15 entry additionally value-gates the fold on the sf
  * tables against DuckDB's fresh join.
  */
class ViewMaintenanceSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private def a(rows: (Long, Long, Double)*): DataFrame =
    rows.toDF("aid", "akey", "payload")
  private def b(rows: (Long, String)*): DataFrame =
    rows.toDF("bkey", "tag")

  private def fresh(aDf: DataFrame, bDf: DataFrame): Set[(Long, Long, Double, Long, String)] =
    aDf.join(bDf, $"akey" === $"bkey")
      .as[(Long, Long, Double, Long, String)].collect().toSet

  private def maintained(v0: DataFrame, aDf: DataFrame, bDf: DataFrame,
                         dA: Seq[Long], dB: Seq[Long]): Set[(Long, Long, Double, Long, String)] =
    ViewMaintenance.maintainJoinView(v0, aDf, bDf, "aid", "akey", "bkey", dA, dB)
      .as[(Long, Long, Double, Long, String)].collect().toSet

  test("insert, delete, update and a join-key MOVE all land on the fresh join") {
    val a0 = a((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 20L, 3.0), (4L, 30L, 4.0))
    val b0 = b((10L, "x"), (20L, "y"), (30L, "z"))
    val v0 = a0.join(b0, $"akey" === $"bkey")
    // delete 4; insert 5→20; update 2's payload; MOVE 3 from key 20 to 10
    val a1 = a((1L, 10L, 1.0), (2L, 10L, 2.5), (3L, 10L, 3.0), (5L, 20L, 5.0))
    maintained(v0, a1, b0, dA = Seq(2L, 3L, 4L, 5L), dB = Nil) shouldBe fresh(a1, b0)
  }

  test("a B-side change fans out to every joined A row; overlap pairs emit once") {
    val a0 = a((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 20L, 3.0))
    val b0 = b((10L, "x"), (20L, "y"))
    val v0 = a0.join(b0, $"akey" === $"bkey")
    // b key 10 retagged (fans to rows 1 AND 2); row 1 ALSO changed — the
    // changed×changed pair (1,10) is covered by addA alone, exactly once
    val a1 = a((1L, 10L, 1.5), (2L, 10L, 2.0), (3L, 20L, 3.0))
    val b1 = b((10L, "x2"), (20L, "y"))
    val out = ViewMaintenance.maintainJoinView(v0, a1, b1,
      "aid", "akey", "bkey", Seq(1L), Seq(10L))
    out.count() shouldBe 3 // no duplicate from the overlap
    out.as[(Long, Long, Double, Long, String)].collect().toSet shouldBe fresh(a1, b1)
  }

  test("empty change window is the identity; deleting a whole B key drops its slice") {
    val a0 = a((1L, 10L, 1.0), (2L, 20L, 2.0))
    val b0 = b((10L, "x"), (20L, "y"))
    val v0 = a0.join(b0, $"akey" === $"bkey")
    maintained(v0, a0, b0, Nil, Nil) shouldBe fresh(a0, b0)
    val b1 = b((10L, "x"))
    maintained(v0, a0, b1, Nil, Seq(20L)) shouldBe fresh(a0, b1)
  }
}

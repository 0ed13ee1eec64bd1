package graft

import graft.operators.ViewMaintenance
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property coverage for the join-view fold: over seeded RANDOM change
  * windows — every mix of inserts, deletes, payload updates, join-key
  * moves, B-side inserts/deletes/updates, dangling keys, and fan-out —
  * the maintained view must equal a fresh join of the mutated tables.
  * The fixed-script spec and the s15/s16 oracles pin named cases; this
  * pins the whole change-algebra space a scripted case may miss.
  */
class ViewMaintenancePropertySpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private def aDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("aid", "akey", "pay")
  private def bDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("bkey", "tag")

  test("property: random change windows land on the fresh join (both sides mutating)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // A: 40 rows over 8 join keys (some keys dangle — B holds only 6)
      val a0 = (0L until 40L).map(i => (i, rnd.nextInt(8).toLong, rnd.nextInt(100).toLong))
      val b0 = (0L until 6L).map(k => (k, s"t$k"))
      // mutate A: ~25% of ids — delete / payload update / key MOVE / insert
      val dAdel = a0.filter(_ => rnd.nextInt(4) == 0).map(_._1)
      val dAupd = a0.filterNot(r => dAdel.contains(r._1)).filter(_ => rnd.nextInt(4) == 0).map(_._1)
      val inserts = (100L until 100L + rnd.nextInt(4)).map(i =>
        (i, rnd.nextInt(8).toLong, 999L))
      val a1 = a0.filterNot(r => dAdel.contains(r._1)).map { r =>
        if (dAupd.contains(r._1)) (r._1, rnd.nextInt(8).toLong, r._3 + 1000L) else r
      } ++ inserts
      val changedA = (dAdel ++ dAupd ++ inserts.map(_._1)).distinct
      // mutate B: ~ a third of keys — delete / retag / insert a new key
      val dBdel = b0.filter(_ => rnd.nextInt(3) == 0).map(_._1)
      val dBupd = b0.filterNot(r => dBdel.contains(r._1)).filter(_ => rnd.nextInt(3) == 0).map(_._1)
      val bIns = if (rnd.nextBoolean()) Seq((6L, "t6new")) else Nil
      val b1 = b0.filterNot(r => dBdel.contains(r._1)).map { r =>
        if (dBupd.contains(r._1)) (r._1, r._2 + "x") else r
      } ++ bIns
      val changedB = (dBdel ++ dBupd ++ bIns.map(_._1)).distinct
      val view0 = aDf(a0).join(bDf(b0), $"akey" === $"bkey")
      val got = ViewMaintenance.maintainJoinView(view0, aDf(a1), bDf(b1),
          "aid", "akey", "bkey", changedA, changedB)
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sorted
      val want = aDf(a1).join(bDf(b1), $"akey" === $"bkey")
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sorted
      withClue(s"seed $seed: ") { got shouldBe want }
      // and no row is ever duplicated by the overlap terms
      got.size shouldBe got.distinct.size
    }
  }
}

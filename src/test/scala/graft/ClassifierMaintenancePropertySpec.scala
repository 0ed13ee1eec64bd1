package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property coverage for the classifier-count fold: over seeded RANDOM
  * change windows — every mix of document inserts, deletes, and text
  * updates (remove old + add new), including windows that empty a token
  * out of the vocabulary or flip a document's quality label — the
  * maintained (token, pc, nc) table must equal a from-scratch recount of
  * the effective corpus, and the weights derived from it must equal the
  * retrain bit-for-bit. The fixed-script spec and the t22 oracle pin
  * named cases; this pins the change-algebra space.
  */
class ClassifierMaintenancePropertySpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  // a small word pool spanning both label classes: stopword-heavy texts
  // score ≥ 0.5 (positive), rare-token texts under it (negative)
  private val stopPool = Vector("the", "a", "is", "of", "and", "to", "in",
    "it", "with", "for", "on", "at", "by")
  private val rarePool = Vector("zq", "xv", "wk", "jm", "pn", "bt", "cr",
    "dl", "fh", "gs", "mv", "kt")

  private def text(rnd: scala.util.Random): String = {
    val pool = if (rnd.nextBoolean()) stopPool else rarePool
    Seq.fill(8 + rnd.nextInt(6))(pool(rnd.nextInt(pool.size))).mkString(" ")
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("property: random change windows land on the from-scratch recount (labels, vocabulary included)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val base = (0L until 20L).map(i => (i, text(rnd)))
      // ~25% deletes, ~25% text updates (may flip the label class or
      // retire a token), a few inserts
      val dels = base.filter(_ => rnd.nextInt(4) == 0)
      val upds = base.filterNot(r => dels.exists(_._1 == r._1))
        .filter(_ => rnd.nextInt(4) == 0)
      val updsNew = upds.map { case (id, _) => (id, text(rnd)) }
      val ins = (100L until 100L + rnd.nextInt(4)).map(i => (i, text(rnd)))
      val added = docsDf(updsNew ++ ins)
      val removed = docsDf(dels ++ upds)
      val effective = base.filterNot(r =>
        dels.exists(_._1 == r._1) || upds.exists(_._1 == r._1)) ++
        updsNew ++ ins
      val maintained = TextAnalysis.maintainClassifierCounts(
        TextAnalysis.classifierCounts(docsDf(base)), added, removed)
      val scratch = TextAnalysis.classifierCounts(docsDf(effective))
      withClue(s"seed $seed counts: ") {
        maintained.as[(String, Long, Long)].collect().toSet shouldBe
          scratch.as[(String, Long, Long)].collect().toSet
      }
      withClue(s"seed $seed weights: ") {
        TextAnalysis.classifierWeights(maintained).collect().toSeq shouldBe
          TextAnalysis.classifierWeights(scratch).collect().toSeq
      }
    }
  }

  test("property: maintenance composes — two sequential windows equal one recount") {
    val rnd = new scala.util.Random(42)
    val base = (0L until 15L).map(i => (i, text(rnd)))
    val add1 = (100L until 103L).map(i => (i, text(rnd)))
    val rem1 = base.take(3)
    val c1 = TextAnalysis.maintainClassifierCounts(
      TextAnalysis.classifierCounts(docsDf(base)), docsDf(add1), docsDf(rem1))
    val add2 = (200L until 202L).map(i => (i, text(rnd)))
    val rem2 = add1.take(1) // remove a doc the FIRST window added
    val c2 = TextAnalysis.maintainClassifierCounts(c1, docsDf(add2), docsDf(rem2))
    val effective = base.drop(3) ++ add1.drop(1) ++ add2
    c2.as[(String, Long, Long)].collect().toSet shouldBe
      TextAnalysis.classifierCounts(docsDf(effective))
        .as[(String, Long, Long)].collect().toSet
  }
}

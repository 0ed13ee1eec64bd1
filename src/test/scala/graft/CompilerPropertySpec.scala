package graft

import graft.compile.QueryCompiler
import graft.model._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ScalaCheck properties over the query compiler — the invariants SURVEY.md
  * §5 plans: whitelist rejection, -1 elision, mode×filter segregation, and
  * pagination defaults, across generated inputs rather than fixed tables.
  */
class CompilerPropertySpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val admin = AclContext(Nil, isAdmin = true)
  /** Attribute fields that segregate to the POST filter in default mode —
    * i.e. everything except creationTime (always a query filter) and the
    * ACL pair orgUUID/isPublic (routed to the OR-group).
    */
  private val legalField = Gen.oneOf(MetadataSchema.filterWhitelist.toSeq
    .filterNot(Set("creationTime", "orgUUID", "isPublic")))
  private val ident = Gen.identifier.suchThat(_.nonEmpty)

  test("property: any non-whitelisted filter field is rejected with InvalidQuery") {
    check(Prop.forAllNoShrink(ident) { f =>
      (!MetadataSchema.filterWhitelist.contains(f)) ==> {
        val q = CatalogQuery(filters = Seq(f -> Seq("x")))
        Prop.throws(classOf[InvalidQueryException])(QueryCompiler.compile(q, admin))
      }
    })
  }

  test("property: creationTime arity != 2 is rejected; -1 elides the matching bound") {
    check(Prop.forAllNoShrink(Gen.chooseNum(0, 5)) { n =>
      (n != 2) ==> {
        val q = CatalogQuery(filters = Seq("creationTime" -> Seq.fill(n)("2015-01-01 00:00:00": Any)))
        Prop.throws(classOf[InvalidQueryException])(QueryCompiler.compile(q, admin))
      }
    })
    // [-1, -1] elides both bounds: predicate accepts every row
    val cq = QueryCompiler.compile(
      CatalogQuery(filters = Seq("creationTime" -> Seq("-1", "-1"))), admin)
    val rows = spark.createDataset(Fixtures.corpus).toDF()
    rows.where(cq.queryFilter).count() shouldBe rows.count()
  }

  test("property: segregation — non-ACL attribute filters never restrict the facet base in default mode") {
    val fieldAndValue: Gen[(String, Any)] = legalField.flatMap {
      case f @ ("recordCount" | "size") => Gen.chooseNum(0L, 99999L).map(f -> (_: Any))
      case f => ident.map(f -> (_: Any))
    }
    check(Prop.forAllNoShrink(fieldAndValue) { case (f, v) =>
      val q = CatalogQuery(filters = Seq(f -> Seq(v)))
      val cq = QueryCompiler.compile(q, admin)
      val rows = spark.createDataset(Fixtures.corpus).toDF()
      // unscoped admin + default mode: queryFilter must not restrict anything
      rows.where(cq.queryFilter).count() == rows.count()
    })
  }

  test("property: onlyPrivate mode puts orgUUID+isPublic into the query filter (facets restricted)") {
    check(Prop.forAllNoShrink(Gen.oneOf("org0", "org1", "org2", "zzz")) { org =>
      val acl = AclContext(Seq(org), isAdmin = false, DataSetFiltering.OnlyPrivate)
      val cq = QueryCompiler.compile(CatalogQuery(), acl)
      val rows = spark.createDataset(Fixtures.corpus).toDF()
      val got = rows.where(cq.queryFilter).collect()
      got.forall(r => !r.getAs[Boolean]("isPublic") && r.getAs[String]("orgUUID") == org)
    })
  }

  test("property: pagination defaults and pass-through") {
    check(Prop.forAllNoShrink(Gen.option(Gen.chooseNum(0, 1000)), Gen.option(Gen.chooseNum(0, 1000))) {
      (from, size) =>
        val cq = QueryCompiler.compile(CatalogQuery(from = from, size = size), admin)
        cq.from == from.getOrElse(0) && cq.size == size.getOrElse(10)
    })
  }

  test("property: non-object DSL input is always InvalidQuery, never a crash or a silent match-all") {
    check(Prop.forAllNoShrink(ident) { s =>
      Prop.throws(classOf[InvalidQueryException])(QueryCompiler.parse(s))
    })
  }
}

package graft

import graft.model.AclContext
import graft.serve.Auth
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Auth-context resolution parity, table-driven off the reference's suite
  * (reference: tests/test_auth.py:86-134 and the parse fixtures :142-160).
  */
class AuthSpec extends AnyFunSuite with Matchers {

  private val user = Auth.TokenPayload("u1", Set("cloud_controller.read"))
  private val admin = Auth.TokenPayload("a1", Set("cloud_controller.read", "console.admin"))

  // (user_orgs, method, orgsParam, bodyOrgUUID, isAdmin) → expected scope —
  // the reference's proper-access table (tests/test_auth.py:86-93)
  private val accessGranted = Seq(
    (Seq.empty[String], "GET", None, None, false) -> Seq.empty[String],
    (Seq("org1", "org2"), "GET", None, None, false) -> Seq("org1", "org2"),
    (Seq("org1", "org2"), "GET", Some("org1"), None, false) -> Seq("org1"),
    (Seq("org1", "org2"), "GET", Some("org1,oRG2"), None, false) -> Seq("org1", "org2"),
    (Seq("org1"), "PUT", None, Some("org1"), false) -> Seq("org1"),
    (Seq("org1", "org2"), "POST", None, Some("org2"), false) -> Seq("org2"),
    (Seq.empty[String], "GET", Some("org1,org2"), None, true) -> Seq("org1", "org2"),
    (Seq.empty[String], "PUT", None, Some("org1"), true) -> Seq("org1")
  )

  test("user scope resolution grants exactly the reference's table") {
    for (((userOrgs, method, orgsParam, body, isAdmin), expected) <- accessGranted) {
      val requested = Auth.requestedOrgs(method, orgsParam, body)
      Auth.resolveScope(requested, userOrgs, isAdmin) shouldBe expected
    }
  }

  // (user_orgs, method, orgsParam, bodyOrgUUID) — the not-enough-access
  // table (tests/test_auth.py:115-118); every row must 403
  private val accessDenied = Seq(
    (Seq.empty[String], "GET", Some("org1"), None),
    (Seq("org1", "org2"), "GET", Some("org1,org3"), None),
    (Seq("org1"), "PUT", None, Some("org2")),
    (Seq.empty[String], "POST", None, Some("org1"))
  )

  test("requesting orgs outside the user's membership is forbidden (403)") {
    for ((userOrgs, method, orgsParam, body) <- accessDenied) {
      val requested = Auth.requestedOrgs(method, orgsParam, body)
      an[Auth.ForbiddenException] should be thrownBy
        Auth.resolveScope(requested, userOrgs, isAdmin = false)
    }
  }

  test("requested-org parsing mirrors the reference's fixtures") {
    // GET ?orgs= (tests/test_auth.py:142-147)
    Auth.requestedOrgs("GET", Some("abra,kadabra")) shouldBe Seq("abra", "kadabra")
    Auth.requestedOrgs("GET", Some("abra")) shouldBe Seq("abra")
    Auth.requestedOrgs("GET", None) shouldBe Seq.empty
    // PUT/POST body orgUUID (tests/test_auth.py:152-160); an unreadable or
    // non-object body degrades to an empty request, never an error
    for (m <- Seq("PUT", "POST")) {
      Auth.requestedOrgs(m, None, Some("bla")) shouldBe Seq("bla")
      Auth.requestedOrgs(m, None, Some("bla,qwe")) shouldBe Seq("bla", "qwe")
      Auth.requestedOrgs(m, None, Some("")) shouldBe Seq.empty
      Auth.requestedOrgs(m, None, None) shouldBe Seq.empty
    }
    // other verbs never carry an org request (auth.py:167-168)
    Auth.requestedOrgs("DELETE", Some("org1"), Some("org2")) shouldBe Seq.empty
  }

  test("admin = console.admin scope claim") {
    Auth.isAdmin(admin) shouldBe true
    Auth.isAdmin(user) shouldBe false
  }

  test("bearer extraction: missing or malformed header is unauthorized (401)") {
    Auth.tokenFromHeader(Some("bearer tok123")) shouldBe "tok123"
    an[Auth.UnauthorizedException] should be thrownBy Auth.tokenFromHeader(None)
    an[Auth.UnauthorizedException] should be thrownBy Auth.tokenFromHeader(Some("tok-without-scheme"))
  }

  test("end-to-end authenticate: verified token -> admin flag + resolved scope") {
    val verifier = new Auth.TokenVerifier {
      def verify(token: String): Auth.TokenPayload = token match {
        case "good-user" => user
        case "good-admin" => admin
        case _ => throw new Auth.UnauthorizedException(s"bad token: $token")
      }
    }
    val memberships = Map("u1" -> Seq("org1", "org2"), "a1" -> Seq.empty[String])
    def orgsOf(p: Auth.TokenPayload): Seq[String] = memberships(p.userId)

    Auth.authenticate(Some("bearer good-user"), verifier,
      Auth.requestedOrgs("GET", Some("org1")), orgsOf) shouldBe
      AclContext(Seq("org1"), isAdmin = false)
    // no request → the user's full membership
    Auth.authenticate(Some("bearer good-user"), verifier, Seq.empty, orgsOf) shouldBe
      AclContext(Seq("org1", "org2"), isAdmin = false)
    // the admin gets what they ask for without a membership check
    Auth.authenticate(Some("bearer good-admin"), verifier,
      Auth.requestedOrgs("GET", Some("orgx")), orgsOf) shouldBe
      AclContext(Seq("orgx"), isAdmin = true)
    // 401 for a failing verification, 403 for an out-of-membership request
    an[Auth.UnauthorizedException] should be thrownBy
      Auth.authenticate(Some("bearer forged"), verifier, Seq.empty, orgsOf)
    an[Auth.ForbiddenException] should be thrownBy
      Auth.authenticate(Some("bearer good-user"), verifier, Seq("org3"), orgsOf)
  }
}

package graft.serve

import graft.model.{AclContext, DataSetFiltering}

/** Auth-context resolution — the pure half of the reference's security layer
  * (reference: data_catalog/auth.py), producing the [[AclContext]] the
  * engine consumes. Everything here is transport-free: token extraction
  * takes the header VALUE, org parsing takes the already-read request
  * parts, and signature verification sits behind [[TokenVerifier]] (the
  * reference delegates to a JWT library keyed by UAA's public key,
  * auth.py:87-90 — a crypto dependency, not resolution logic).
  *
  * Error taxonomy matches the reference's HTTP mapping (auth.py:56-71):
  *  - [[UnauthorizedException]] (401): token missing, malformed, or failing
  *    verification.
  *  - [[ForbiddenException]] (403): the user requested orgs outside their
  *    own membership.
  */
object Auth {

  /** 401 — token missing/invalid/expired (reference: auth.py:59-62). */
  final class UnauthorizedException(msg: String) extends RuntimeException(msg)

  /** 403 — org guid missing/invalid/not accessible (auth.py:68-71). */
  final class ForbiddenException(msg: String) extends RuntimeException(msg)

  /** Verified JWT claims — the two the resolution rules read
    * (reference: auth.py:94-96 reads `scope`; user identity rides along).
    */
  final case class TokenPayload(userId: String, scope: Set[String])

  /** Signature-verification seam. Implementations throw
    * [[UnauthorizedException]] for bad tokens (the reference's
    * jwt.InvalidTokenError → 401, auth.py:56-62).
    */
  trait TokenVerifier { def verify(token: String): TokenPayload }

  /** Admin = the `console.admin` scope claim (reference: auth.py:94-96). */
  def isAdmin(payload: TokenPayload): Boolean = payload.scope.contains("console.admin")

  /** Bearer-token extraction from the Authorization header value: absent
    * header or a value without a second whitespace-separated part → 401
    * (reference: auth.py:78-85; the reference indexes `split()[1]` blindly —
    * here a one-part value maps to the same 401 instead of a 500).
    */
  def tokenFromHeader(authHeader: Option[String]): String =
    authHeader.map(_.split("\\s+").toSeq).filter(_.sizeIs >= 2) match {
      case Some(parts) => parts(1)
      case None => throw new UnauthorizedException("Authorization header not found.")
    }

  /** The orgs the request ASKS for (reference: auth.py:149-168):
    * GET reads the `orgs` query parameter (comma-split, lowercased,
    * trimmed); PUT/POST read the body's `orgUUID` (comma-split, lowercased —
    * the reference does not trim here, mirrored faithfully); any other
    * method, an absent value, or an unreadable body resolves to no request.
    */
  def requestedOrgs(method: String, orgsParam: Option[String] = None,
                    bodyOrgUuid: Option[String] = None): Seq[String] =
    method.toUpperCase match {
      case "GET" =>
        orgsParam.filter(_.nonEmpty).fold(Seq.empty[String])(
          _.split(",", -1).toSeq.map(_.toLowerCase.trim))
      case "PUT" | "POST" =>
        bodyOrgUuid.filter(_.nonEmpty).fold(Seq.empty[String])(
          _.split(",", -1).toSeq.map(_.toLowerCase))
      case _ => Seq.empty
    }

  /** The org scope a request executes under (reference: auth.py:133-147):
    * an admin gets exactly what they asked for (empty = unrestricted — the
    * admin AclContext ignores the org clause anyway); a user asking for
    * specific orgs must ask for a SUBSET of their memberships (else 403);
    * a user asking for nothing gets all their memberships.
    */
  def resolveScope(requested: Seq[String], userOrgs: Seq[String],
                   isAdmin: Boolean): Seq[String] =
    if (isAdmin) requested
    else if (requested.nonEmpty) {
      if (requested.toSet.subsetOf(userOrgs.toSet)) requested
      else throw new ForbiddenException(
        s"User is not authorized to access at least some of these organizations: " +
          requested.mkString(","))
    } else userOrgs

  /** End-to-end resolution: header → verified token → admin flag → org
    * scope → [[AclContext]] (the reference's authenticate(), auth.py:42-71,
    * which parks is_admin and org_uuid_list on the request context for the
    * search model to consume, search.py:105). `userOrgsOf` stands in for
    * the membership lookup the reference makes over HTTP (auth.py:170-179).
    */
  def authenticate(authHeader: Option[String], verifier: TokenVerifier,
                   requested: Seq[String], userOrgsOf: TokenPayload => Seq[String],
                   filtering: DataSetFiltering = DataSetFiltering.Both): AclContext = {
    val payload = verifier.verify(tokenFromHeader(authHeader))
    val admin = isAdmin(payload)
    AclContext(resolveScope(requested, userOrgsOf(payload), admin), admin, filtering)
  }
}

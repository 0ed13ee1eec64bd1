package graft.serve

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Bootstrap configuration parsed from the platform's environment-variable
  * conventions (reference: configuration.py:40-185 — Cloud-Foundry-style
  * `VCAP_SERVICES` JSON plus `VCAP_APP_PORT`/`LOG_LEVEL` scalars), closing
  * the last service-plumbing gap: a deployment can wire
  * [[HttpCatalog]]/[[CatalogService]]/the cascade clients from the same
  * environment the reference reads, while tests and embedded users keep
  * constructor injection.
  *
  * Semantics mirrored 1:1 (table-driven off tests/test_configuration.py):
  *   - missing `VCAP_SERVICES` → [[AppConfig.MissingConfigException]]
  *     (the reference's NoConfigEnvError, configuration.py:67-70)
  *   - missing `sso.tokenKey` → the same error (no default possible,
  *     configuration.py:133-138)
  *   - every other value falls back to the reference's local-dev default
  *   - `downloader` is looked up first as a TOP-LEVEL service, then among
  *     `user-provided` entries (the reference's two configuration styles,
  *     configuration.py:140-152)
  *
  * The reference's index bootstrapping payload (mapping/settings) has no
  * equivalent here — the engine owns storage — so `backend` carries the
  * search-backend address fields only for wiring parity.
  */
final case class AppConfig(
    appBasePath: String,
    appPort: Int,
    logLevel: String,
    backendHostname: String,
    backendPort: Int,
    uaaTokenUri: String,
    downloaderUrlPattern: String,
    datasetPublisherUrl: String,
    userManagementUri: String,
    natsUrl: String,
    natsSubject: String)

object AppConfig {

  final class MissingConfigException(msg: String) extends RuntimeException(msg)

  private val mapper = new ObjectMapper()

  /** Parse from an environment map (pass `sys.env` in production). */
  def fromEnv(env: Map[String, String]): AppConfig = {
    val raw = env.getOrElse("VCAP_SERVICES", throw new MissingConfigException(
      "VCAP_SERVICES environment variable needs to be set to run the catalog."))
    val services = mapper.readTree(raw)

    def userProvided(name: String): Option[JsonNode] =
      Option(services.get("user-provided")).toSeq
        .flatMap(_.elements.asScala)
        .find(n => Option(n.get("name")).exists(_.asText == name))

    def credentials(svc: Option[JsonNode]): Option[JsonNode] =
      svc.flatMap(n => Option(n.get("credentials")))

    def credString(svc: Option[JsonNode], field: String): Option[String] =
      credentials(svc).flatMap(c => Option(c.get(field))).map(_.asText)

    val sso = credString(userProvided("sso"), "tokenKey").getOrElse(
      throw new MissingConfigException("No SSO/tokenKey parameter in VCAP_SERVICES."))

    // elasticsearch13[0].credentials.{hostname, ports."9200/tcp"} — defaults
    // to the local-dev address (configuration.py:101-106)
    val es = Option(services.get("elasticsearch13")).flatMap(a => a.elements.asScala.nextOption())
    val backendHost = credString(es, "hostname").getOrElse("localhost")
    val backendPort = credentials(es)
      .flatMap(c => Option(c.get("ports"))).flatMap(p => Option(p.get("9200/tcp")))
      .map(_.asText.toInt).getOrElse(9200)

    // downloader: top-level service first, then user-provided (two styles)
    val downloaderSvc = Option(services.get("downloader"))
      .flatMap(a => a.elements.asScala.nextOption())
      .orElse(userProvided("downloader"))
    val downloader = credString(downloaderSvc, "url")
      .getOrElse("http://localhost:8090") + "/rest/filestore/{}/"

    val publisher = credString(userProvided("datacatalogexport"), "host")
      .getOrElse("http://localhost:8091") + "/rest/tables"
    val userMgmt = credString(userProvided("user-management"), "host")
      .getOrElse("http://localhost:9998") + "/rest/orgs/permissions"

    val natsSvc = userProvided("nats-provider")
    // both fields or neither: a partial NATS binding falls back whole, like
    // the reference's single try/except (configuration.py:179-186)
    val nats = (credString(natsSvc, "url"), credString(natsSvc, "data-catalog-subject")) match {
      case (Some(u), Some(s)) => (u, s)
      case _ => ("nats://localhost:4222", "platform.data-catalog")
    }

    AppConfig(
      appBasePath = "/rest/datasets",
      appPort = env.get("VCAP_APP_PORT").map(_.toInt).getOrElse(5000),
      logLevel = env.getOrElse("LOG_LEVEL", "DEBUG"),
      backendHostname = backendHost,
      backendPort = backendPort,
      uaaTokenUri = sso,
      downloaderUrlPattern = downloader,
      datasetPublisherUrl = publisher,
      userManagementUri = userMgmt,
      natsUrl = nats._1,
      natsSubject = nats._2)
  }
}

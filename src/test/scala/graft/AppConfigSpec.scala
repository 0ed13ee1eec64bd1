package graft

import graft.serve.AppConfig
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bootstrap-config semantics, table-driven off the reference's
  * tests/test_configuration.py + tests/conftest.py fake environment.
  */
class AppConfigSpec extends AnyFunSuite with Matchers {

  // the reference conftest's cloud environment (tests/conftest.py:56-136)
  private val cloudServices =
    """{
      | "downloader": [
      |   {"credentials": {"url": "http://downloader-broker.apps.example.com"},
      |    "label": "downloader", "name": "downloader", "plan": "shared", "tags": []}
      | ],
      | "elasticsearch13": [
      |   {"credentials": {"hostname": "10.10.2.7",
      |                    "ports": {"9200/tcp": "49237", "9300/tcp": "49238"}},
      |    "label": "elasticsearch13", "name": "data-catalog-mock-index", "tags": []}
      | ],
      | "user-provided": [
      |   {"credentials": {"host": "http://hive.apps.example.com"},
      |    "label": "user-provided", "name": "datacatalogexport", "tags": []},
      |   {"credentials": {"tokenKey": "http://uaa.run.example.com/token_key"},
      |    "label": "user-provided", "name": "sso", "tags": []},
      |   {"credentials": {"url": "http://downloader-broker.apps.example.com"},
      |    "label": "user-provided", "name": "downloader", "tags": []},
      |   {"credentials": {"host": "http://user-management.apps.example.com"},
      |    "label": "user-provided", "name": "user-management", "tags": []}
      | ]
      |}""".stripMargin

  test("no VCAP_SERVICES raises the missing-config error (test_configuration.py:26-28)") {
    intercept[AppConfig.MissingConfigException] { AppConfig.fromEnv(Map.empty) }
  }

  test("minimal local config fills reference defaults (test_configuration.py:30-56)") {
    val minimal =
      """{"user-provided": [
        |  {"credentials": {"tokenKey": "http://uaa.example.com/token_key"},
        |   "tags": [], "name": "sso", "label": "user-provided"}
        |]}""".stripMargin
    val c = AppConfig.fromEnv(Map("VCAP_SERVICES" -> minimal))
    c.appPort shouldBe 5000
    c.logLevel shouldBe "DEBUG"
    c.backendHostname shouldBe "localhost"
    c.backendPort shouldBe 9200
    c.uaaTokenUri shouldBe "http://uaa.example.com/token_key"
    c.downloaderUrlPattern shouldBe "http://localhost:8090/rest/filestore/{}/"
    c.datasetPublisherUrl shouldBe "http://localhost:8091/rest/tables"
    c.userManagementUri shouldBe "http://localhost:9998/rest/orgs/permissions"
    c.natsUrl shouldBe "nats://localhost:4222"
    c.natsSubject shouldBe "platform.data-catalog"
    c.appBasePath shouldBe "/rest/datasets"
  }

  test("cloud env parses every service binding (test_configuration.py:58-76)") {
    val c = AppConfig.fromEnv(Map(
      "VCAP_SERVICES" -> cloudServices,
      "VCAP_APP_PORT" -> "5555",
      "LOG_LEVEL" -> "INFO"))
    c.appPort shouldBe 5555
    c.logLevel shouldBe "INFO"
    c.backendHostname shouldBe "10.10.2.7"
    c.backendPort shouldBe 49237
    c.uaaTokenUri shouldBe "http://uaa.run.example.com/token_key"
    c.datasetPublisherUrl shouldBe "http://hive.apps.example.com/rest/tables"
    c.userManagementUri shouldBe "http://user-management.apps.example.com/rest/orgs/permissions"
    c.downloaderUrlPattern shouldBe
      "http://downloader-broker.apps.example.com/rest/filestore/{}/"
  }

  test("downloader falls back to the user-provided entry when the top-level service is absent (test_configuration.py:79-91)") {
    val withoutTopLevel = cloudServices.replaceFirst(
      """(?s)"downloader": \[.*?\],\s*"elasticsearch13"""", "\"elasticsearch13\"")
    withoutTopLevel should not include "\"downloader\": [" // the top-level block is gone
    val c = AppConfig.fromEnv(Map("VCAP_SERVICES" -> withoutTopLevel))
    c.downloaderUrlPattern shouldBe
      "http://downloader-broker.apps.example.com/rest/filestore/{}/"
  }

  test("missing sso tokenKey raises (configuration.py:133-138)") {
    intercept[AppConfig.MissingConfigException] {
      AppConfig.fromEnv(Map("VCAP_SERVICES" -> """{"user-provided": []}"""))
    }
  }
}

package graft.serve

import graft.model.MetadataEntry

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Real HTTP implementation of the cascading-delete seam — the reference's
  * DataSetRemover clients (reference: data_catalog/dataset_delete.py:65-103):
  *
  *  - Downloader: `DELETE downloaderUrlPattern.format(databaseId)` where
  *    databaseId is the second-to-last path segment of targetUri
  *    (dataset_delete.py:99-103), Authorization header, no body.
  *  - Dataset Publisher: `DELETE publisherUrl` with the entry as a JSON
  *    body (dataset_delete.py:69-71); the public-Hive-view drop adds
  *    `?scope=public` and only fires for public entries
  *    (dataset_delete.py:50-63).
  *
  * A 200 reports success, anything else failure; failures are reported as
  * booleans and never rolled back (dataset_delete.py:84-93). Deviation
  * noted: a connection error also reports `false` here (the reference lets
  * it propagate to a 503) — the catalog's own delete has already committed
  * at this point, so a dead downstream should degrade the response, not
  * fail the route.
  *
  * `downloaderUrlPattern` uses `{}` as the database-id placeholder, like
  * the reference's `str.format` pattern config.
  */
final class HttpCascadeDeleter(downloaderUrlPattern: String,
                               publisherUrl: String,
                               token: () => String,
                               timeout: java.time.Duration = java.time.Duration.ofSeconds(10))
    extends CascadeDeleter {

  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  def cascade(entry: MetadataEntry): (Boolean, Boolean) =
    (deleteFromDownloader(entry.targetUri), deleteFromPublisher(entry, scopePublic = false))

  def dropPublicView(entry: MetadataEntry): Boolean =
    entry.isPublic && deleteFromPublisher(entry, scopePublic = true)

  /** reference: dataset_delete.py:99-103 — `targetUri.split('/')[-2]`. */
  private[serve] def databaseId(targetUri: String): String =
    targetUri.split("/").dropRight(1).lastOption.getOrElse("")

  private def deleteFromDownloader(targetUri: String): Boolean =
    delete(downloaderUrlPattern.replace("{}", databaseId(targetUri)), body = None)

  private def deleteFromPublisher(entry: MetadataEntry, scopePublic: Boolean): Boolean = {
    val url = if (scopePublic) s"$publisherUrl?scope=public" else publisherUrl
    delete(url, Some(EntryJsonCodec.mapper.writeValueAsString(EntryJsonCodec.entryJson(entry))))
  }

  private def delete(url: String, body: Option[String]): Boolean =
    try {
      val b = HttpRequest.newBuilder(URI.create(url))
        .header("Authorization", token())
        .timeout(timeout)
      body.foreach(_ => b.header("Content-Type", "application/json"))
      val req = b.method("DELETE",
        body.fold(HttpRequest.BodyPublishers.noBody())(HttpRequest.BodyPublishers.ofString(_)))
        .build()
      client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode() == 200
    } catch { case _: java.io.IOException | _: InterruptedException => false }
}

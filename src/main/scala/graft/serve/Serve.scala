package graft.serve

import graft.compile.QueryCompiler
import graft.exec.SearchExecutor
import graft.model.{AclContext, MetadataEntry, SearchResult}
import graft.store.MetadataStore
import org.apache.spark.sql.SparkSession

/** The thin serving shell around the Spark core — the reference's service
  * layer re-expressed as seams (SURVEY.md §2.7): every mutation notifies, and
  * deletes cascade to two external services. The engine stays pure; HTTP/
  * NATS/real cascade targets plug in behind these traits.
  */

/** Mutation notification seam (reference: data_catalog/notifier.py:45-63
  * publishes {OrgGuid, Message, Timestamp} on subject platform.data-catalog
  * after every PUT/POST/DELETE, call sites metadata_entry.py:156-271).
  */
trait Notifier {
  def notify(orgUUID: String, message: String): Unit
}

object NoopNotifier extends Notifier {
  def notify(orgUUID: String, message: String): Unit = ()
}

/** Records notifications in order — the test double, mirroring the
  * reference's mocked-NATS tests (reference: tests/test_notifier.py:32-52).
  */
final class RecordingNotifier extends Notifier {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def notify(orgUUID: String, message: String): Unit = synchronized { buf += orgUUID -> message; () }
  def events: Seq[(String, String)] = synchronized(buf.toSeq)
}

/** Cascading-delete seam (reference: data_catalog/dataset_delete.py:31-103 —
  * HTTP DELETE to the Downloader with the database id parsed from targetUri
  * (`targetUri.split('/')[-2]`, :99-103) and to the Dataset Publisher with the
  * entry body (:69-71); failures are reported as booleans, never rolled back
  * (:84-93)).
  */
trait CascadeDeleter {
  /** Returns (deletedFromDownloader, deletedFromPublisher). */
  def cascade(entry: MetadataEntry): (Boolean, Boolean)
}

object NoopCascadeDeleter extends CascadeDeleter {
  def cascade(entry: MetadataEntry): (Boolean, Boolean) = (true, true)
}

final class RecordingCascadeDeleter extends CascadeDeleter {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[MetadataEntry]
  def cascade(entry: MetadataEntry): (Boolean, Boolean) = synchronized { buf += entry; (true, true) }
  def entries: Seq[MetadataEntry] = synchronized(buf.toSeq)

  /** The database id the reference's Downloader cascade extracts:
    * second-to-last path segment of targetUri
    * (reference: dataset_delete.py:99-103).
    */
  def databaseIds: Seq[String] =
    entries.map(_.targetUri.split("/").dropRight(1).lastOption.getOrElse(""))
}

/** Result of a delete, mirroring the reference's response body
  * (reference: dataset_delete.py:45-48, tests/test_dataset_delete.py:50-73).
  */
final case class DeleteResult(found: Boolean, deletedFromDownloader: Boolean,
                              deletedFromPublisher: Boolean)

/** The facade over search/get/put/post/delete/count — the reference's six
  * routes (reference: data_catalog/app.py:141-145) minus HTTP/auth transport:
  * the AclContext arrives pre-resolved exactly as the reference's search model
  * receives (query, orgs, filtering, isAdmin) (reference: search.py:105).
  */
final class CatalogService(spark: SparkSession, store: MetadataStore,
                           notifier: Notifier = NoopNotifier,
                           cascade: CascadeDeleter = NoopCascadeDeleter,
                           compactThreshold: Int = 64) {

  /** Every mutation route ends here: fold the delta log once it exceeds the
    * threshold, so a long-serving store's read fan-in stays bounded without
    * external maintenance scheduling.
    */
  private def afterMutation(): Unit = { store.maybeCompact(compactThreshold); () }

  /** GET /rest/datasets?query=… */
  def search(rawDsl: String, acl: AclContext): SearchResult =
    SearchExecutor.search(spark, store.current, rawDsl, acl)

  /** GET /rest/datasets/{id} — None = 404. */
  def get(id: String): Option[MetadataEntry] = store.get(id)

  /** PUT /rest/datasets/{id} — returns true when created (the reference's
    * 201 vs 200); notifies on success (reference: metadata_entry.py:177).
    */
  def put(entry: MetadataEntry): Boolean = {
    val created = store.upsert(entry)
    notifier.notify(entry.orgUUID, s"Dataset ${entry.id} ${if (created) "created" else "updated"}")
    afterMutation()
    created
  }

  /** POST /rest/datasets/{id} — partial update; notifies on success
    * (reference: metadata_entry.py:262-271).
    */
  def post(id: String, fields: Map[String, Any]): Boolean = {
    val updated = store.partialUpdate(id, fields)
    if (updated) {
      notifier.notify(store.get(id).map(_.orgUUID).getOrElse(""), s"Dataset $id updated")
      afterMutation()
    }
    updated
  }

  /** DELETE /rest/datasets/{id} — tombstone + cascade + notify
    * (reference: metadata_entry.py:191-214, dataset_delete.py:31-48).
    */
  def delete(id: String): DeleteResult =
    store.get(id) match {
      case None => DeleteResult(found = false, deletedFromDownloader = false,
        deletedFromPublisher = false)
      case Some(entry) =>
        store.delete(id)
        val (dl, pub) = cascade.cascade(entry)
        notifier.notify(entry.orgUUID, s"Dataset $id deleted")
        afterMutation()
        DeleteResult(found = true, dl, pub)
    }

  /** GET /rest/datasets/count (reference: dataset_count.py:39-48). */
  def count(acl: AclContext): Long =
    SearchExecutor.count(spark, store.current, acl)
}

package graft.serve

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model.MetadataEntry

/** Entry ⇄ JSON wire shape shared by the HTTP transport and the cascade
  * client (the reference ships the ES `_source` dict in both places;
  * here the shape is the entry's own fields, timestamps ISO-local).
  */
private[serve] object EntryJsonCodec {

  val mapper = new ObjectMapper()

  private val TsFmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME

  def entryJson(e: MetadataEntry): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", e.id)
    n.put("category", e.category)
    if (e.creationTime != null)
      n.put("creationTime", e.creationTime.toLocalDateTime.format(TsFmt))
    n.put("dataSample", e.dataSample)
    n.put("format", e.format)
    n.put("isPublic", e.isPublic)
    n.put("orgUUID", e.orgUUID)
    n.put("recordCount", e.recordCount)
    n.put("size", e.size)
    n.put("sourceUri", e.sourceUri)
    n.put("targetUri", e.targetUri)
    n.put("title", e.title)
    e.storeType.foreach(n.put("storeType", _))
    n
  }

  /** The ES `_source` shape: the indexed document body alone — the entry's
    * fields WITHOUT the id, which in the reference lives outside the source
    * as the ES `_id` (metadata_entry.py:169-176 indexes the body under the
    * path id; the Cerberus schema has no id field).
    */
  def sourceJson(e: MetadataEntry): ObjectNode = {
    val n = entryJson(e)
    n.remove("id")
    n
  }
}

package graft.serve

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Real NATS implementation of the [[Notifier]] seam — a publish-only client
  * speaking the NATS text protocol over a raw socket (INFO banner →
  * `CONNECT` → `PUB <subject> <len>`), no client library needed.
  *
  * Wire behavior mirrors the reference's CFNotifier
  * (reference: data_catalog/notifier.py:45-63): connect per notification
  * (`notify` calls `connect()` every time, :50), publish the JSON message
  * `{"OrgGuid": …, "Message": …, "Timestamp": epoch-ms}` (:56-63) on the
  * configured subject, and let connection failures propagate (the reference
  * does not catch them either). Deviation noted: the reference connects
  * with `verbose=True` (per-command +OK acks); this client sends
  * `verbose:false` — the published message is byte-identical and
  * fire-and-forget publishing has no use for the acks.
  */
final class NatsNotifier(host: String, port: Int,
                         subject: String = "platform.data-catalog",
                         protected val clock: () => Long = () => System.currentTimeMillis(),
                         timeoutMs: Int = 5000) extends Notifier {

  protected def publish(n: Notification): Unit = {
    val socket = new Socket()
    try {
      socket.connect(new InetSocketAddress(host, port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      val in = new BufferedReader(new InputStreamReader(socket.getInputStream, UTF_8))
      val out = socket.getOutputStream
      val banner = in.readLine()
      if (banner == null || !banner.startsWith("INFO"))
        throw new java.io.IOException(s"not a NATS server (banner: $banner)")
      out.write(
        "CONNECT {\"verbose\":false,\"pedantic\":false,\"name\":\"graft-catalog\"}\r\n"
          .getBytes(UTF_8))
      val payload = messageJson(n).getBytes(UTF_8)
      out.write(s"PUB $subject ${payload.length}\r\n".getBytes(UTF_8))
      out.write(payload)
      out.write("\r\n".getBytes(UTF_8))
      out.flush()
    } finally socket.close()
  }

  /** The reference's wire message shape, field order included
    * (notifier.py:56-63).
    */
  private def messageJson(n: Notification): String = {
    val node = EntryJsonCodec.mapper.createObjectNode()
    node.put("OrgGuid", n.orgGuid)
    node.put("Message", n.message)
    node.put("Timestamp", n.timestamp)
    EntryJsonCodec.mapper.writeValueAsString(node)
  }
}

package graft

import graft.serve.NatsNotifier
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

/** The publish-only NATS client against a stub server speaking the minimal
  * NATS text protocol — wire parity with the reference's CFNotifier
  * (reference: notifier.py:45-63, tests/test_notifier.py:32-52).
  */
class NatsNotifierSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  final case class Published(connectLine: String, pubLine: String, payload: String)

  private val published = new LinkedBlockingQueue[Published]()
  private var server: ServerSocket = _
  private var accepter: Thread = _

  override def beforeAll(): Unit = {
    server = new ServerSocket(0, 8, java.net.InetAddress.getLoopbackAddress)
    accepter = new Thread(() => {
      try while (!server.isClosed) {
        val s = server.accept()
        try {
          s.getOutputStream.write("INFO {\"server_id\":\"stub\"}\r\n".getBytes(UTF_8))
          s.getOutputStream.flush()
          val in = new BufferedReader(new InputStreamReader(s.getInputStream, UTF_8))
          val connect = in.readLine()
          val pub = in.readLine() // PUB <subject> <len>
          val len = pub.split(" ").last.toInt
          val buf = new Array[Char](len)
          var read = 0
          while (read < len) read += in.read(buf, read, len - read)
          published.put(Published(connect, pub, new String(buf)))
        } finally s.close()
      } catch { case _: java.net.SocketException => () /* closed */ }
    })
    accepter.setDaemon(true)
    accepter.start()
  }

  override def afterAll(): Unit = server.close()

  test("publishes the reference wire message on the subject, one connection per notify") {
    val notifier = new NatsNotifier("127.0.0.1", server.getLocalPort,
      clock = () => 1234567890123L)
    notifier.notify("org-42", "Dataset ds1 added")
    val p = published.poll(10, TimeUnit.SECONDS)
    p should not be null
    p.connectLine should startWith("CONNECT {")
    p.pubLine shouldBe s"PUB platform.data-catalog ${p.payload.getBytes(UTF_8).length}"
    val n = com.fasterxml.jackson.databind.json.JsonMapper.builder().build().readTree(p.payload)
    n.get("OrgGuid").asText shouldBe "org-42"
    n.get("Message").asText shouldBe "Dataset ds1 added"
    n.get("Timestamp").asLong shouldBe 1234567890123L
    // a second notify opens a fresh connection (reference connects per call)
    notifier.notify("org-43", "Dataset ds2 deleted")
    val p2 = published.poll(10, TimeUnit.SECONDS)
    p2 should not be null
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(p2.payload).get("OrgGuid").asText shouldBe "org-43"
  }

  test("a non-NATS endpoint fails loudly instead of publishing into the void") {
    val bad = new ServerSocket(0, 8, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = bad.accept()
      s.getOutputStream.write("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8))
      s.close()
    })
    t.setDaemon(true); t.start()
    val notifier = new NatsNotifier("127.0.0.1", bad.getLocalPort, timeoutMs = 2000)
    an[java.io.IOException] should be thrownBy notifier.notify("o", "m")
    bad.close()
  }
}

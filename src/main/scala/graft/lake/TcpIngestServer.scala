package graft.lake

import java.net.{ServerSocket, Socket, SocketException}

import graft.model.TableName

/** Raw-TCP Arrow IPC ingest — the reference's embedded-binary transport
  * (reference: src/main.rs:60-83): an accept loop spawns one handler thread
  * per connection; each connection carries one Arrow IPC stream which is
  * decoded and upserted into the target table on the configured keys
  * (the reference hard-codes `[store_key, sku_key]`; here they're
  * constructor parameters). The dataset monitor serializes concurrent
  * connections' merges, so multi-producer ingest is safe.
  *
  * Ephemeral `port = 0` binds a free port (see [[boundPort]]) — used by the
  * spec; a deployment passes a fixed port.
  */
final class TcpIngestServer(
    server: LakeServer,
    table: TableName,
    keys: Seq[String],
    port: Int = 0) extends AutoCloseable {

  private val socket = new ServerSocket(port)
  @volatile private var running = true

  /** The actual listening port (differs from `port` when 0). */
  def boundPort: Int = socket.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val conn = socket.accept()
        val t = new Thread(() => handle(conn), s"graft-tcp-${conn.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => () // socket closed -> loop exits via `running`
      }
    }
  }, "graft-tcp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(conn: Socket): Unit = {
    try {
      // One IPC stream per connection, terminated by the producer closing
      // its end (reference producer.py writes the stream then closes).
      val bytes = conn.getInputStream.readAllBytes()
      if (bytes.nonEmpty) server.upsertTableIpc(table, keys, Iterator(bytes))
    } finally conn.close()
  }

  override def close(): Unit = {
    running = false
    socket.close()
  }
}

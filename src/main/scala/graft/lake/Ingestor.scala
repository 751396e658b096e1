package graft.lake

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** Micro-batching ingest buffer: accumulate incoming chunks and flush them
  * into the target dataset once the buffered row count crosses a threshold
  * (reference `consume_sources`, src/server.rs:48-88; threshold constant
  * 10M rows at src/server.rs:55).
  *
  * Two deliberate fixes over the reference:
  *  - the final flush applies the SAME operation as the stream (the
  *    reference's upsert stream final-flushes with insert —
  *    src/server.rs:81-87, a bug we do not replicate);
  *  - flush row counts come with the chunk (the caller usually knows them
  *    from the wire format) or are computed once per chunk.
  *
  * Thread-safe: chunks may be offered from multiple ingest threads.
  */
final class Ingestor(
    target: LakeDataset,
    upsertKeys: Option[Seq[String]],
    flushThresholdRows: Long = Ingestor.DefaultFlushRows,
    onFlush: () => Unit = () => ()) {

  private val buffer = ArrayBuffer[DataFrame]()
  private var bufferedRows = 0L
  private val lock = new Object

  /** Offer one chunk; `rows` may be provided if known (else counted once). */
  def offer(chunk: DataFrame, rows: Long = -1L): Unit = {
    val n = if (rows >= 0) rows else chunk.count()
    val toFlush = lock.synchronized {
      buffer += chunk
      bufferedRows += n
      if (bufferedRows >= flushThresholdRows) drain() else None
    }
    toFlush.foreach(apply)
  }

  /** Flush any remainder (reference flushes on stream end, src/server.rs:78-88). */
  def flush(): Unit = {
    val toFlush = lock.synchronized(drain())
    toFlush.foreach(apply)
  }

  private def drain(): Option[DataFrame] = {
    if (buffer.isEmpty) None
    else {
      val concat = buffer.reduce(_ unionByName (_, allowMissingColumns = true))
      buffer.clear()
      bufferedRows = 0L
      Some(concat)
    }
  }

  private def apply(batch: DataFrame): Unit = {
    upsertKeys match {
      case Some(keys) => target.upsert(batch, keys)
      case None => target.insert(batch)
    }
    onFlush()
  }
}

object Ingestor {
  /** Reference flush threshold (src/server.rs:55). */
  val DefaultFlushRows: Long = 10_000_000L
}

package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean
import java.{util => ju}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 streaming source for a dump1090 SBS-1 broadcast —
  * `spark.readStream.format("sbs1").option("host", …).option("port", …)`.
  *
  * Why a custom source (SURVEY.md §7.3, the one deferred item): Spark's
  * built-in `socket` source FAILS THE QUERY when the peer disconnects,
  * pushing the reference's reconnect policy (dump1090-postgres.py:181-198,
  * :220-237 — N dial attempts × fixed delay, budget reset on success)
  * out to a driver-side supervisor ([[graft.streaming.Ingest.runSupervised]]).
  * This source embeds that policy: a reader thread re-dials across
  * disconnects and the query keeps running — micro-batches just come up
  * empty while the dial loop backs off. When the dial budget is
  * exhausted the source FAILS the query (rethrown from the next
  * `latestOffset`/`planInputPartitions`), mirroring the reference's
  * `sys.exit` at that point — never a silently dead feed.
  *
  * Shape mirrors Spark's own TextSocketMicroBatchStream: the driver-side
  * thread accumulates newline-delimited records (torn records across
  * recv buffers are impossible by construction — BufferedReader yields
  * whole lines, fixing reference quirk §2.9.2); offsets are cumulative
  * line counts; `commit` trims everything at or below the committed
  * offset. Like the built-in socket source this buffers on the driver
  * and is NOT fault-tolerant across query restarts (a TCP broadcast is
  * not replayable — the reference has the identical limitation): use
  * [[graft.streaming.Ingest.backfill]] over archived logs when replay
  * matters, or front the feed with a durable log. Fine for a live
  * ADS-B feed at O(100) msg/s (README.md:48-49).
  */
class Sbs1SourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sbs1"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Sbs1Source.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: ju.Map[String, String]): Table =
    new Sbs1Table(new CaseInsensitiveStringMap(properties))
}

object Sbs1Source {
  /** Raw line, exactly like the built-in socket source: parse with
    * [[Sbs1.parse]] downstream (keeps the source composable and the
    * parse projection inside codegen).
    */
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class Sbs1Table(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String =
    s"sbs1://${options.get("host")}:${options.get("port")}"

  override def schema(): StructType = Sbs1Source.Schema

  override def capabilities(): ju.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Sbs1Source.Schema
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new Sbs1MicroBatchStream(
            options.get("host"),
            options.getInt("port", 30003),
            options.getInt("connectAttemptLimit", 10),
            options.getLong("connectAttemptDelayMs", 5000L))
      }
    }
}

/** Cumulative-line-count offset. */
case class Sbs1Offset(count: Long) extends Offset {
  override def json(): String = count.toString
}

class Sbs1MicroBatchStream(host: String, port: Int, attemptLimit: Int,
                           attemptDelayMs: Long) extends MicroBatchStream {

  private val stopped = new AtomicBoolean(false)
  // lines received but not yet committed; `base` = offset of buffer(0)
  private val buffer = ArrayBuffer.empty[String]
  private var base = 0L
  @volatile private var socket: Socket = _
  // set exactly once, when the dial budget is exhausted: the reference
  // sys.exit()s here (dump1090-postgres.py:193-195); a streaming query
  // must instead FAIL so the driver-side restart/exit policy can engage
  // — a silently dead feed producing empty micro-batches forever is the
  // worst outcome
  @volatile private var terminalFailure: Throwable = _

  private val reader = new Thread(s"sbs1-reader-$host:$port") {
    override def run(): Unit = {
      var attempts = 0
      var lastError: Throwable = null
      while (!stopped.get() && attempts < attemptLimit) {
        try {
          val s = new Socket(host, port)
          socket = s
          attempts = 0 // successful dial resets the budget (py:196-198)
          val in = new BufferedReader(new InputStreamReader(
            s.getInputStream, StandardCharsets.UTF_8))
          var line = in.readLine()
          while (line != null && !stopped.get()) {
            Sbs1MicroBatchStream.this.synchronized { buffer += line }
            line = in.readLine()
          }
          s.close() // EOF: peer closed; fall through to re-dial (py:220-237)
        } catch {
          case e: java.io.IOException => lastError = e // dial/read error
        }
        if (!stopped.get()) {
          attempts += 1
          Thread.sleep(attemptDelayMs)
        }
      }
      if (!stopped.get()) {
        terminalFailure = new java.io.IOException(
          s"sbs1 $host:$port unreachable: dial budget exhausted " +
            s"($attemptLimit attempts x ${attemptDelayMs}ms)", lastError)
      }
    }
  }
  reader.setDaemon(true)
  reader.start()

  /** Rethrow the reader thread's terminal failure on the query thread —
    * called from every driver-side planning entry point so budget
    * exhaustion fails the query instead of starving it silently.
    */
  private def checkFailure(): Unit = {
    val t = terminalFailure
    if (t != null) throw t
  }

  override def initialOffset(): Offset = Sbs1Offset(0L)

  override def latestOffset(): Offset = synchronized {
    checkFailure()
    Sbs1Offset(base + buffer.length)
  }

  override def deserializeOffset(json: String): Offset =
    Sbs1Offset(json.toLong)

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    checkFailure()
    val (s, e) = (start.asInstanceOf[Sbs1Offset].count,
      end.asInstanceOf[Sbs1Offset].count)
    val lines = synchronized {
      buffer.slice((s - base).toInt, (e - base).toInt).toArray
    }
    if (lines.isEmpty) Array.empty
    else Array(Sbs1InputPartition(lines))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    Sbs1ReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[Sbs1Offset].count
    val drop = (e - base).toInt
    if (drop > 0) {
      buffer.dropInPlace(drop)
      base = e
    }
  }

  override def stop(): Unit = {
    stopped.set(true)
    val s = socket
    if (s != null) s.close()
  }
}

case class Sbs1InputPartition(lines: Array[String]) extends InputPartition

object Sbs1ReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val lines = p.asInstanceOf[Sbs1InputPartition].lines
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(lines(i))))
      override def close(): Unit = ()
    }
}

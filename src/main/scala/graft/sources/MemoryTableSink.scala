package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector — the engine's template for wrapping
  * an external sink, demonstrating the exactly-once commit protocol
  * that makes distributed writes safe:
  *
  *   - each task gets its own `DataWriter`, buffers its partition, and
  *     surrenders it only inside `commit()` as a `WriterCommitMessage`;
  *   - nothing is visible until the DRIVER's `BatchWrite.commit`
  *     assembles all task messages atomically — a failed/speculated
  *     task's `abort()` discards its buffer, so retries can't
  *     double-write;
  *   - `SupportsTruncate` maps SaveMode.Overwrite onto the same path.
  *
  * The store is an in-JVM map (this is a single-JVM harness); a real
  * sink would write files/segments in the task and pass HANDLES in the
  * commit message — the protocol shape is identical, which is the
  * point of the template. Read-back is served through the same DSv2
  * read path so round-trips are testable end-to-end.
  */
class MemoryTableSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val name = options.get("name")
    MemoryTableStore.schemas.getOrElse(name, new StructType())
  }
  // writes to a not-yet-existing table carry the DataFrame's schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new MemTable(properties.get("name"), schema)
}

/** Driver-JVM table store: committed rows + schema per table name. */
object MemoryTableStore {
  val tables: TrieMap[String, Array[InternalRow]] = TrieMap.empty
  val schemas: TrieMap[String, StructType] = TrieMap.empty
  def clear(name: String): Unit = { tables.remove(name); schemas.remove(name) }
}

private[sources] class MemTable(name: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"mem($name)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MemScan(name, MemoryTableStore.schemas.getOrElse(name, schema0))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(name, info.schema(), truncate = false)
}

private[sources] class MemWriteBuilder(name: String, schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = new MemWriteBuilder(name, schema, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(name, schema, truncate)
  }
}

private[sources] case class MemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

private[sources] class MemBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory

  // the ONLY place data becomes visible — atomic over all task messages
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val incoming = messages.flatMap { case MemCommit(rows) => rows }
    MemoryTableStore.schemas.put(name, schema)
    if (truncate) MemoryTableStore.tables.put(name, incoming)
    else MemoryTableStore.tables.updateWith(name) {
      case Some(prev) => Some(prev ++ incoming)
      case None       => Some(incoming)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
      override def abort(): Unit = buf.clear() // retried task leaves no trace
      override def close(): Unit = ()
    }
}

private[sources] class MemScan(name: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // single-JVM store: serve the committed snapshot in chunks so the
    // read side still exercises multi-partition scan mechanics
    val rows = MemoryTableStore.tables.getOrElse(name, Array.empty)
    val chunks = rows.grouped(math.max(1, rows.length / 4 + 1)).toArray
    if (chunks.isEmpty) Array(MemChunk(Array.empty))
    else chunks.map(c => MemChunk(c): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[MemChunk].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
    }
}

private[sources] case class MemChunk(rows: Array[InternalRow]) extends InputPartition

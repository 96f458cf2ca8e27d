package graft.stubcat

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TEST-ONLY in-memory `TableCatalog` with row-level-operation support
  * — the "stub catalog" that lets [[graft.ops.SqlMergeSink]]'s
  * `MERGE INTO` execute END TO END in the zero-egress sandbox, where
  * the real transactional formats (delta-spark, iceberg-runtime) are
  * unfetchable. Everything here is the public DataSource V2 connector
  * surface and nothing else: Spark parses the sink's statement,
  * analyzes it against this catalog's `SupportsRowLevelOperations`
  * table, plans the group-based `ReplaceData` rewrite, and executes it
  * through this connector's scan + write — so the whole engine-side
  * MERGE path is exercised for real; only the storage is a fake.
  *
  * Group semantics: the table is ONE group (a single scan partition,
  * surfaced as the constant `_group` metadata column), so a row-level
  * operation's replacement write swaps the entire row set. The
  * operation DECLARES `_group` via `requiredMetadataAttributes` — that
  * is the group-based contract, and it is also what routes the write
  * through Spark's projecting task (`DataAndMetadataWritingSparkTask`),
  * which strips the internal `__row_operation` column before rows
  * reach the connector's `DataWriter` (Delta and Iceberg declare file/
  * partition metadata the same way).
  *
  * Rows live in a JVM-global registry keyed by catalog.table — valid
  * only in local mode (executors share the JVM), which is exactly the
  * test harness. Never ship this: real deployments put Delta/Iceberg
  * on the classpath and point [[graft.ops.SqlMergeSink]] at a real
  * catalog. */
class StubRowLevelCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (catalogName +: (ident.namespace() :+ ident.name())).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    StubTables.idents.asScala.collect {
      case (k, id) if k.startsWith(s"$catalogName.") &&
        id.namespace().sameElements(namespace) => id
    }.toArray

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    if (!StubTables.exists(k)) throw new NoSuchTableException(ident)
    new StubTable(k)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException("stub catalog: no partitioning")
    val k = key(ident)
    if (StubTables.exists(k)) throw new TableAlreadyExistsException(ident)
    StubTables.create(k, ident, schema)
    new StubTable(k)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("stub catalog: ALTER not supported")

  override def dropTable(ident: Identifier): Boolean =
    StubTables.drop(key(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("stub catalog: RENAME not supported")
}

/** JVM-global table registry (single-JVM local mode only): reader
  * factories carry just the string key, never the row buffers. */
object StubTables {
  /** The single-group metadata column every stub table exposes. */
  val GroupCol = "_group"

  val idents = new java.util.concurrent.ConcurrentHashMap[String, Identifier]()
  private val schemas = new java.util.concurrent.ConcurrentHashMap[String, StructType]()
  private val rows = new java.util.concurrent.ConcurrentHashMap[String, Vector[InternalRow]]()

  def exists(k: String): Boolean = schemas.containsKey(k)
  def create(k: String, id: Identifier, s: StructType): Unit = {
    idents.put(k, id); schemas.put(k, s); rows.put(k, Vector.empty)
  }
  def drop(k: String): Boolean = {
    idents.remove(k); rows.remove(k); schemas.remove(k) != null
  }
  def schema(k: String): StructType = schemas.get(k)
  def get(k: String): Vector[InternalRow] = rows.get(k)
  def append(k: String, r: Seq[InternalRow]): Unit =
    rows.compute(k, (_, old) => (if (old == null) Vector.empty else old) ++ r)
  def replace(k: String, r: Seq[InternalRow]): Unit = rows.put(k, r.toVector)
}

private class StubTable(k: String) extends Table
    with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def name(): String = k
  override def schema(): StructType = StubTables.schema(k)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = StubTables.GroupCol
      override def dataType(): DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String = "replacement-group id (always 0: one group)"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StubScanBuilder(k)

  /** Plain writes APPEND (the CTAS path `writeTo(t).create()` takes);
    * truncate() flips to replace-all (INSERT OVERWRITE). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new StubWriteBuilder(k, replaceAll = false)

  /** The row-level seam: Spark's group-based rewrite reads the affected
    * groups through `newScanBuilder` and writes their full replacement
    * through `newWriteBuilder` — with the whole table as one group,
    * that write replaces the row set. Declaring the `_group` metadata
    * attribute is what makes the rewrite group-aware (and routes the
    * write through the projecting task that strips Spark's internal
    * `__row_operation` column). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new StubScanBuilder(k)
      override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
        new StubWriteBuilder(k, replaceAll = true)
      override def requiredMetadataAttributes(): Array[NamedReference] =
        Array(Expressions.column(StubTables.GroupCol))
    }
}

/** Column pruning is REQUIRED here, not an optimization: requested
  * metadata columns arrive through `pruneColumns` appended to the data
  * columns, so the scan must re-derive its output schema. */
private class StubScanBuilder(k: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = StubTables.schema(k)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new StubScan(k, required)
}

private class StubScan(k: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(new StubInputPartition(k, required))
  override def createReaderFactory(): PartitionReaderFactory =
    new StubReaderFactory
}

private class StubInputPartition(val k: String, val required: StructType)
  extends InputPartition

private class StubReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[StubInputPartition]
      private val table = StubTables.schema(part.k)
      // required-field -> stored-table ordinal; -1 = the _group
      // metadata column (constant 0: the whole table is one group)
      private val srcOrds = part.required.fields.map { f =>
        if (f.name == StubTables.GroupCol) -1 else table.fieldIndex(f.name)
      }
      private val types = part.required.fields.map(_.dataType)
      private val it = StubTables.get(part.k).iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val stored = it.next()
        val out = new Array[Any](srcOrds.length)
        var i = 0
        while (i < srcOrds.length) {
          out(i) = if (srcOrds(i) < 0) 0
                   else stored.get(srcOrds(i), table.fields(srcOrds(i)).dataType)
          i += 1
        }
        cur = new GenericInternalRow(out)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

private case class StubCommitMessage(rows: Array[InternalRow])
  extends WriterCommitMessage

private class StubWriteBuilder(k: String, replaceAll: Boolean)
    extends WriteBuilder with SupportsTruncate with Write with BatchWrite {
  private var replace = replaceAll
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StubWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.toSeq.flatMap(_.asInstanceOf[StubCommitMessage].rows)
    if (replace) StubTables.replace(k, all) else StubTables.append(k, all)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class StubWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit = buf += record.copy()
      // carried-over rows of a group replacement arrive with their
      // metadata projection alongside; the group id itself is not
      // stored, so only the data row is kept
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)
      override def commit(): WriterCommitMessage = StubCommitMessage(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 connector for the reference's on-disk format: `"{k} {v}"`
 * lines (the text the engine's sink E8 writes — `worker.rs:180-183` — and
 * its shuffle read E4 parses back). Read as
 * `spark.read.format("graft.sources.KvTextSource").load(dir)` →
 * a `(key string, value string)` table.
 *
 * Faithful semantics, deliberately including the reference's quirk
 * (SURVEY.md §1.1): a line is `split_whitespace`'d and only the FIRST TWO
 * tokens survive (`worker.rs:156-162`) — a value containing spaces is
 * truncated to its first token, and blank lines are dropped (the tests'
 * `grep .` normalization, `test-mr.sh:51`).
 *
 * Partitioning mirrors the reference's granularity: one input partition
 * per file, exactly as the coordinator builds one map task per file
 * (`coordinator.rs:55-64`). Files are read directly from the filesystem —
 * the same shared-FS assumption the reference's data plane makes
 * (SURVEY.md §3.2). At scale, many files → many partitions; a single
 * giant file is the anti-pattern here just as it is in the reference.
 */
class KvTextSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvTextSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new KvTextTable(properties.get("path"))
}

object KvTextSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))
  /** Format shorthand for `spark.read.format(...)`. */
  val Format: String = classOf[KvTextSource].getName
}

class KvTextTable(path: String) extends Table with SupportsRead {
  require(path != null, "the graft kv source needs a path: .load(dir)")
  override def name(): String = s"graftkv:$path"
  override def schema(): StructType = KvTextSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new KvTextScan(path) }
}

class KvTextScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = KvTextSource.Schema
  override def toBatch: Batch = this

  /** One partition per data file — the reference's task granularity. */
  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory) {
        val listed = f.listFiles()
        if (listed == null)
          throw new java.io.IOException(s"cannot list kv source directory: $path")
        listed.filter(x => x.isFile && !x.getName.startsWith("_")
                           && !x.getName.startsWith(".")).map(_.getPath)
      } else if (f.isFile) Array(path)
      else throw new java.io.FileNotFoundException(s"kv source path not found: $path")
    files.sorted.map(KvFilePartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory
}

case class KvFilePartition(file: String) extends InputPartition

class KvReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvFileReader(partition.asInstanceOf[KvFilePartition].file)
}

/** Line reader with the reference's parse: whitespace-split, first two
  * tokens, blank lines dropped. */
class KvFileReader(file: String) extends PartitionReader[InternalRow] {
  private val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
  private val it = lines.iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val toks = it.next().split("\\s+").filter(_.nonEmpty)
      if (toks.nonEmpty)
        current = InternalRow(
          UTF8String.fromString(toks(0)),
          UTF8String.fromString(if (toks.length > 1) toks(1) else ""))
    }
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

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
 * File access goes through the Hadoop `FileSystem` API, so the source
 * reads any scheme the cluster's Hadoop conf resolves (`file:`, `hdfs:`,
 * object stores), not just the driver's local disk — the scale-correct
 * replacement for the reference's shared-local-FS assumption
 * (SURVEY.md §3.2).
 *
 * Partitioning default mirrors the reference's granularity: one input
 * partition per file, exactly as the coordinator builds one map task per
 * file (`coordinator.rs:55-64`) — which makes a single giant file a
 * one-task bottleneck there. This source fixes that with
 * `.option("split_bytes", n)`: files larger than n split into
 * line-aligned byte ranges using the classic TextInputFormat protocol
 * (every split except the first discards its first — possibly partial —
 * line; every split reads one line past its end), so a 1 TB file becomes
 * thousands of parallel partitions with no record lost or duplicated.
 */
class KvTextSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvTextSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new KvTextTable(properties.get("path"),
                    Option(properties.get(KvTextSource.SplitBytesOption)))
}

object KvTextSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))
  /** Format shorthand for `spark.read.format(...)`. */
  val Format: String = classOf[KvTextSource].getName
  /** Max partition size in bytes; unset = one partition per whole file. */
  val SplitBytesOption: String = "split_bytes"
}

class KvTextTable(path: String, splitBytes: Option[String])
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "the graft kv source needs a path: .load(dir)/.save(dir)")
  override def name(): String = s"graftkv:$path"
  override def schema(): StructType = KvTextSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new KvTextScan(path, splitBytes.map(_.toLong).getOrElse(Long.MaxValue))
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvTextBatchWrite(path,
          new SerializableConfiguration(
            SparkSession.active.sessionState.newHadoopConf()))
      }
    }
}

/**
 * The reference's E8 commit protocol, implemented rather than delegated:
 * each task writes its partition's `"{k} {v}"` lines to an
 * ATTEMPT-UNIQUE temp file (≙ the uuid-suffixed intermediate names,
 * `worker.rs:121-123`), flushes/fsyncs, and only the driver-side
 * `commit` renames the winners to their final `part-<j>` names
 * (≙ temp + fsync + atomic `rename` to `out/mr-out-<j>`,
 * `worker.rs:185-189`). A failed/speculative attempt's file is never
 * renamed and is deleted by `abort` — exactly-once visible output with
 * at-least-once task execution, the same argument the reference makes.
 */
class KvTextBatchWrite(path: String, conf: SerializableConfiguration)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val out = new Path(path)
    val fs = out.getFileSystem(conf.value)
    messages.foreach { case KvCommit(temp, partition) =>
      val dst = new Path(out, f"part-$partition%05d")
      if (fs.exists(dst)) fs.delete(dst, false) // idempotent re-commit
      if (!fs.rename(new Path(temp), dst))
        throw new java.io.IOException(s"commit rename failed: $temp -> $dst")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.filter(_ != null).foreach { case KvCommit(temp, _) =>
      fs.delete(new Path(temp), false)
    }
  }
}

case class KvCommit(tempFile: String, partition: Int) extends WriterCommitMessage

class KvWriterFactory(path: String, conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvFileWriter(path, partitionId, taskId, conf)
}

/** Task-side writer: attempt-unique temp file, `"{k} {v}"` lines. */
class KvFileWriter(path: String, partitionId: Int, taskId: Long,
                   conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val temp =
    new Path(path, f".part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.tmp")
  private val fs = temp.getFileSystem(conf.value)
  private val out = fs.create(temp, true)

  override def write(row: InternalRow): Unit = {
    out.write(row.getUTF8String(0).toString.getBytes("UTF-8"))
    out.write(' ')
    out.write(row.getUTF8String(1).toString.getBytes("UTF-8"))
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    out.hsync() // the reference fsyncs before reporting (worker.rs:138,187)
    out.close()
    KvCommit(temp.toString, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(temp, false)
  }

  override def close(): Unit = ()
}

class KvTextScan(path: String, splitBytes: Long) extends Scan with Batch {
  require(splitBytes > 0, s"split_bytes must be positive: $splitBytes")
  override def readSchema(): StructType = KvTextSource.Schema
  override def toBatch: Batch = this

  /** One partition per data file (the reference's task granularity), or
    * per ≤split_bytes line-aligned range of each file when splitting is
    * on. Listing and length metadata come from the Hadoop FileSystem of
    * the path's scheme. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p))
      throw new java.io.FileNotFoundException(s"kv source path not found: $path")
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_")
                                     && !s.getPath.getName.startsWith("."))
      else Array(fs.getFileStatus(p))
    files.sortBy(_.getPath.toString).flatMap { s =>
      val len = s.getLen
      if (len <= splitBytes || splitBytes == Long.MaxValue)
        Seq(KvFilePartition(s.getPath.toString, 0L, len))
      else
        (0L until len by splitBytes).map { start =>
          KvFilePartition(s.getPath.toString, start, math.min(splitBytes, len - start))
        }
    }.map(x => x: InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf()))
}

case class KvFilePartition(file: String, start: Long, length: Long)
  extends InputPartition

class KvReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvFilePartition]
    new KvFileReader(p.file, p.start, p.length, conf)
  }
}

/** Range reader with the reference's parse: whitespace-split, first two
  * tokens, blank lines dropped (their bytes still advance the range
  * position). Split protocol = Hadoop `LineRecordReader`'s: a non-first
  * split discards everything up to its first newline (that record belongs
  * to the previous split), and a record is read iff it STARTS at
  * position ≤ end — so the record straddling the boundary is read exactly
  * once, by the split it starts in. */
class KvFileReader(file: String, start: Long, length: Long,
                   conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val in = path.getFileSystem(conf.value).open(path)
  private val end = start + length
  private var pos = start
  private val reader = {
    if (start != 0) in.seek(start)
    new LineReader(in)
  }
  if (start != 0) pos += reader.readLine(new Text()) // discard partial first line
  private val line = new Text()
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      if (pos > end) return false
      val n = reader.readLine(line)
      if (n == 0) return false // EOF
      pos += n
      val toks = line.toString.split("\\s+").filter(_.nonEmpty)
      if (toks.nonEmpty)
        current = InternalRow(
          UTF8String.fromString(toks(0)),
          UTF8String.fromString(if (toks.length > 1) toks(1) else ""))
    }
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

package graft.sinks.v2

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE showcase: GLOBALLY-FRAMED text output as a
  * distributed batch sink — `open` + rows joined by `sep` + `close`,
  * and EMPTY output for zero rows.
  *
  * Spark's built-in file sinks cannot express this family: the framing
  * is GLOBAL state (one opener, a separator between every adjacent pair
  * of rows ACROSS partitions, one closer, and the empty→empty law needs
  * the global row count), which is why these formats previously existed
  * only on the single-`io.Writer` driver path. The DSv2 commit protocol
  * is exactly the right hook:
  *
  *   - each task writes its rows INTERNALLY sep-joined to
  *     `b-<pid>-rows` (lazily — a task with no rows writes nothing) and
  *     reports `(pid, rowCount)` in its commit message;
  *   - the driver-side `BatchWrite.commit` sees every count and lays the
  *     global framing down as tiny files whose NAMES interleave
  *     lexicographically with the data files: `a-open`,
  *     `b-<pid>-sep` (after each non-empty part except the last),
  *     `z-close` — plus `_SUCCESS`. Zero total rows → only `_SUCCESS`.
  *
  * Options (all optional) default to the reference's JSON-ARRAY format
  * (`json/json.go:83-156`): `open` = `"[\n"`, `sep` = `",\n"`,
  * `close` = `"\n]\n"`. The reference XML layout (`xml.go:67-130`) is
  * the same shape — see `XmlSink.writeDirFramed`.
  *
  * The directory's NON-HIDDEN files concatenated in NAME order are
  * byte-identical to the corresponding driver path (`JsonSink.
  * writeString` / `XmlSink.writeString`), asserted in DsvWriteSpec
  * (`.`/`_`-prefixed entries are Hadoop metadata — the standard
  * hidden-file convention every Hadoop consumer applies). Input
  * contract: ONE string column of pre-rendered rows — compose with
  * `JsonSink.objects` / `XmlSink.rows`, which own rendering/escaping;
  * this sink owns framing and the commit protocol. Hadoop `FileSystem`
  * IO throughout, so the same code runs against HDFS/S3A on a cluster.
  * Write-only (`inferSchema` throws; `supportsExternalMetadata` feeds
  * the input schema in), `append` and `overwrite` (TRUNCATE) modes.
  */
class FramedTextSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-framed"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-framed is write-only; it has no schema to infer")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    require(schema.fields.length == 1 && schema.fields(0).dataType == StringType,
      s"graft-framed expects exactly one string column of pre-rendered " +
        s"rows (use JsonSink.objects / XmlSink.rows); got ${schema.simpleString}")
    val frame = Frame(
      Option(properties.get("open")).getOrElse("[\n"),
      Option(properties.get("sep")).getOrElse(",\n"),
      Option(properties.get("close")).getOrElse("\n]\n"))
    new FramedTable(properties.get("path"), schema, frame)
  }
}

private case class Frame(open: String, sep: String, close: String)

private class FramedTable(path: String, writeSchema: StructType, frame: Frame)
    extends Table with SupportsWrite {
  require(path != null, "graft-framed requires a path (…write.save(path))")
  override def name(): String = s"graft-framed:$path"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FramedWriteBuilder(path, frame, truncate = false)
}

private class FramedWriteBuilder(path: String, frame: Frame, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new FramedWriteBuilder(path, frame, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new FramedBatchWrite(path, frame, truncate)
  }
}

private case class PartCommit(pid: Int, rows: Long) extends WriterCommitMessage

private class FramedBatchWrite(dir: String, frame: Frame, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task runs: clear prior contents on
    // overwrite; always ensure the directory exists
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (truncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    new FramedWriterFactory(dir, frame.sep)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    def put(name: String, content: String): Unit = {
      val out = fs.create(new Path(p, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    val nonEmpty = messages.collect { case PartCommit(pid, n) if n > 0 => pid }.sorted
    if (nonEmpty.nonEmpty) {
      put("a-open", frame.open)
      nonEmpty.dropRight(1).foreach(pid => put(f"b-$pid%05d-sep", frame.sep))
      put("z-close", frame.close)
    }
    put("_SUCCESS", "")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    messages.collect { case PartCommit(pid, n) if n > 0 =>
      fs.delete(new Path(p, f"b-$pid%05d-rows"), false)
    }
  }
}

private class FramedWriterFactory(dir: String, sep: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FramedWriter(dir, sep, partitionId)
}

/** Per-task writer: `b-<pid>-rows`, rows sep-joined, opened lazily so
  * an empty partition leaves no file (the framing never has to account
  * for it). Deterministic name + overwrite(true) makes a task retry
  * idempotent. */
private class FramedWriter(dir: String, sep: String, pid: Int)
    extends DataWriter[InternalRow] {
  private var out: org.apache.hadoop.fs.FSDataOutputStream = _
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    if (out == null) {
      val p = new Path(dir)
      out = p.getFileSystem(new Configuration())
        .create(new Path(p, f"b-$pid%05d-rows"), true)
    } else out.write(sep.getBytes("UTF-8"))
    out.write(record.getUTF8String(0).getBytes)
    rows += 1
  }

  override def commit(): WriterCommitMessage = { close(); PartCommit(pid, rows) }
  override def abort(): Unit = close()
  override def close(): Unit = if (out != null) { out.close(); out = null }
}

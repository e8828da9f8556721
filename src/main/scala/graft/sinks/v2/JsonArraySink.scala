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

/** DataSource V2 WRITE showcase: the reference's JSON **array** format
  * (`json/json.go:83-156` — `[\n obj,\n obj \n]\n`, and EMPTY output for
  * zero rows) as a distributed batch sink.
  *
  * Spark's built-in file sinks cannot express this format: the array
  * framing is GLOBAL state (one `[`, a comma between every adjacent pair
  * of rows across all partitions, one `]`, and the empty→empty law needs
  * the global row count), which is why the array path previously existed
  * only on the single-`io.Writer` driver path. The DSv2 commit protocol
  * is exactly the right hook:
  *
  *   - each task writes its rows INTERNALLY comma-joined to
  *     `b-<pid>-rows` (lazily — a task with no rows writes nothing) and
  *     reports `(pid, rowCount)` in its commit message;
  *   - the driver-side `BatchWrite.commit` sees every count and lays the
  *     global framing down as tiny files whose NAMES interleave
  *     lexicographically with the data files: `a-open` (`[\n`),
  *     `b-<pid>-sep` (`,\n` after each non-empty part except the last),
  *     `z-close` (`\n]\n`) — plus `_SUCCESS`. Zero total rows → only
  *     `_SUCCESS`, matching the reference's empty→empty law.
  *
  * The directory's NON-HIDDEN files concatenated in NAME order are
  * byte-identical to the driver path's `JsonSink.writeString` (asserted
  * in DsvWriteSpec; `.`/`_`-prefixed entries are Hadoop metadata — the
  * standard hidden-file convention every Hadoop consumer applies). Input contract: ONE string column of pre-rendered JSON
  * objects — compose with `JsonSink.objects(df, opts)`, which owns
  * rendering/escaping; this sink owns framing and the commit protocol.
  * Hadoop `FileSystem` IO throughout, so the same code runs against
  * HDFS/S3A on a cluster. Write-only (`inferSchema` throws;
  * `supportsExternalMetadata` feeds the input schema in), `append` and
  * `overwrite` (TRUNCATE) modes.
  */
class JsonArraySink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-json-array"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-json-array is write-only; it has no schema to infer")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    require(schema.fields.length == 1 && schema.fields(0).dataType == StringType,
      s"graft-json-array expects exactly one string column of pre-rendered " +
        s"JSON objects (use JsonSink.objects); got ${schema.simpleString}")
    new JsonArrayTable(properties.get("path"), schema)
  }
}

private class JsonArrayTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  require(path != null, "graft-json-array requires a path (…write.save(path))")
  override def name(): String = s"graft-json-array:$path"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonArrayWriteBuilder(path, truncate = false)
}

private class JsonArrayWriteBuilder(path: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = new JsonArrayWriteBuilder(path, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new JsonArrayBatchWrite(path, truncate)
  }
}

private case class PartCommit(pid: Int, rows: Long) extends WriterCommitMessage

private class JsonArrayBatchWrite(dir: String, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task runs: clear prior contents on
    // overwrite; always ensure the directory exists
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (truncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    new JsonArrayWriterFactory(dir)
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
      put("a-open", "[\n")
      nonEmpty.dropRight(1).foreach(pid => put(f"b-$pid%05d-sep", ",\n"))
      put("z-close", "\n]\n")
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

private class JsonArrayWriterFactory(dir: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonArrayWriter(dir, partitionId)
}

/** Per-task writer: `b-<pid>-rows`, rows comma-joined, opened lazily so
  * an empty partition leaves no file (the framing never has to account
  * for it). Deterministic name + overwrite(true) makes a task retry
  * idempotent. */
private class JsonArrayWriter(dir: String, pid: Int) extends DataWriter[InternalRow] {
  private var out: org.apache.hadoop.fs.FSDataOutputStream = _
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    if (out == null) {
      val p = new Path(dir)
      out = p.getFileSystem(new Configuration())
        .create(new Path(p, f"b-$pid%05d-rows"), true)
    } else out.write(",\n".getBytes("UTF-8"))
    out.write(record.getUTF8String(0).getBytes)
    rows += 1
  }

  override def commit(): WriterCommitMessage = { close(); PartCommit(pid, rows) }
  override def abort(): Unit = close()
  override def close(): Unit = if (out != null) { out.close(); out = null }
}

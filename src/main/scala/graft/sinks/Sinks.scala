package graft.sinks

import java.io.{BufferedWriter, FileWriter}

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Render

/** Sequential row hook, Go-shaped (`csv.go:67-71` etc.): receives the
  * 1-based rowID (counting KEPT rows) and the rendered row; returns the
  * (possibly rewritten) row and whether to keep it. Inherently sequential
  * (rowID depends on prior decisions), so it runs only on the
  * driver-stream path — for distributed writes use the Column-based
  * filter/project split in [[graft.ops.Pipeline]] instead. */
object SinkTypes {
  type PreProcessor = (Int, IndexedSeq[String]) => (IndexedSeq[String], Boolean)
  type Mappers = Seq[(DataType, Column => Column)]
  /** Context-aware mappers: additionally receive the plan-time
    * `Metadata` slice (column name + source driver) — see
    * [[graft.functions.Render.MapperContext]]. */
  type CtxMappers = Seq[(DataType, (Render.MapperContext, Column) => Column)]
}
import SinkTypes._

private[sinks] object SinkIO {
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  /** Rendered rows as string arrays; `null` entries are NULL cells. */
  def renderedRows(df: DataFrame, mappers: Mappers,
                   ctxMappers: CtxMappers = Nil): Dataset[Array[String]] = {
    val rendered = Render.renderAll(df, mappers, ctxMappers)
    val n = rendered.schema.length
    val sp = rendered.sparkSession
    import sp.implicits._
    rendered.map { row =>
      Array.tabulate(n)(i => if (row.isNullAt(i)) null else row.getString(i))
    }
  }

  /** Stream an iterator of chunks to a single local file — the
    * `exporter.WriteFile` coordinator (`exporter.go:36-48`): one writer,
    * constant memory. */
  def writeFile(path: String, chunks: Iterator[String]): Unit = {
    val w = new BufferedWriter(new FileWriter(path), 1 << 16)
    try chunks.foreach(w.write) finally w.close()
  }
}

// ---------------------------------------------------------------------------
// CSV (`/root/reference/codec/csv/csv.go`)
// ---------------------------------------------------------------------------

/** Option surface of the reference CSV codec (`csv.go:37-121`). */
final case class CsvOptions(
    delimiter: Char = ',',
    useCRLF: Boolean = false,
    writeHeader: Boolean = true,
    writeHeaderWhenNoData: Boolean = true,
    customHeader: Option[Seq[String]] = None,
    nullValue: String = "",
    limit: Int = -1,
    preProcessor: Option[PreProcessor] = None,
    mappers: Mappers = Nil,
    ctxMappers: CtxMappers = Nil) {
  def eol: String = if (useCRLF) "\r\n" else "\n"
}

object CsvSink {

  /** Header row (custom header validated for arity exactly like
    * `csv.go:134-139`). */
  def header(df: DataFrame, opts: CsvOptions): Seq[String] = {
    val names = df.schema.fieldNames.toSeq
    opts.customHeader match {
      case Some(h) =>
        if (h.length != names.length)
          throw new IllegalArgumentException("invalid header length")
        h
      case None => names
    }
  }

  /** Distributed CSV records (no header, no EOL) — rendering is a
    * codegen'd projection; line assembly is one narrow map, the same
    * shape as Spark's own CSV `FileFormatWriter`. */
  def lines(df: DataFrame, opts: CsvOptions): Dataset[String] = {
    require(opts.preProcessor.isEmpty,
      "sequential preProcessor requires the driver-stream path (writeString/writeFile); " +
      "use ops.Pipeline filter/project for distributed writes")
    import SinkIO.stringEnc
    val limited = if (opts.limit >= 0) df.limit(opts.limit) else df
    val (d, crlf, nv) = (opts.delimiter, opts.useCRLF, opts.nullValue)
    SinkIO.renderedRows(limited, opts.mappers, opts.ctxMappers).map { cells =>
      Format.csvLine(cells.toIndexedSeq.map(c => if (c == null) nv else c), d, crlf)
    }
  }

  /** Exact reference byte output (header/limit/preprocessor semantics from
    * `csv.go:124-190`), streamed through the driver. */
  def contentIterator(df: DataFrame, opts: CsvOptions): Iterator[String] = {
    val hdr = header(df, opts)
    val eagerHeader = opts.writeHeader && opts.writeHeaderWhenNoData && hdr.nonEmpty
    val head =
      if (eagerHeader) Iterator.single(Format.csvLine(hdr.toIndexedSeq, opts.delimiter, opts.useCRLF) + opts.eol)
      else Iterator.empty
    if (opts.limit == 0) return head

    val source =
      if (opts.preProcessor.isEmpty && opts.limit > 0)
        SinkIO.renderedRows(df.limit(opts.limit), opts.mappers, opts.ctxMappers).toLocalIterator()
      else SinkIO.renderedRows(df, opts.mappers, opts.ctxMappers).toLocalIterator()

    var rowID = 1
    var done = false
    val body = new Iterator[String] {
      private var pending: Option[String] = None
      private def advance(): Unit = {
        while (pending.isEmpty && !done && source.hasNext) {
          val raw = source.next().toIndexedSeq.map(c => if (c == null) opts.nullValue else c)
          val (row, keep) = opts.preProcessor match {
            case Some(f) => f(rowID, raw)
            case None    => (raw, true)
          }
          if (keep) {
            pending = Some(Format.csvLine(row, opts.delimiter, opts.useCRLF) + opts.eol)
            if (opts.limit >= 0 && rowID >= opts.limit) done = true
            rowID += 1
          }
        }
      }
      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): String = { advance(); val s = pending.get; pending = None; s }
    }

    // lazy header (`csv.go:175-179`): written before the first KEPT row only
    val lazyHeaderNeeded = opts.writeHeader && !opts.writeHeaderWhenNoData && hdr.nonEmpty
    if (lazyHeaderNeeded) {
      val buffered = body.buffered
      val lazyHead =
        if (buffered.hasNext)
          Iterator.single(Format.csvLine(hdr.toIndexedSeq, opts.delimiter, opts.useCRLF) + opts.eol)
        else Iterator.empty
      head ++ lazyHead ++ buffered
    } else head ++ body
  }

  def writeString(df: DataFrame, opts: CsvOptions = CsvOptions()): String =
    contentIterator(df, opts).mkString

  def writeFile(df: DataFrame, path: String, opts: CsvOptions = CsvOptions()): Unit =
    SinkIO.writeFile(path, contentIterator(df, opts))

  /** Distributed directory write via Spark's native CSV writer — the
    * scale path (header per part-file, quote-doubling like Go). */
  def writeDir(df: DataFrame, path: String, opts: CsvOptions = CsvOptions()): Unit = {
    require(opts.preProcessor.isEmpty, "use ops.Pipeline for distributed writes")
    val limited = if (opts.limit >= 0) df.limit(opts.limit) else df
    val renamed = opts.customHeader match {
      case Some(h) =>
        if (h.length != df.schema.length)
          throw new IllegalArgumentException("invalid header length")
        limited.toDF(h: _*)
      case None => limited
    }
    Render.renderAll(renamed, opts.mappers, opts.ctxMappers).write
      .option("header", opts.writeHeader.toString)
      .option("sep", opts.delimiter.toString)
      .option("lineSep", opts.eol)
      .option("nullValue", opts.nullValue)
      .option("emptyValue", "")
      .option("quote", "\"").option("escape", "\"")
      .mode("overwrite").csv(path)
  }
}

// ---------------------------------------------------------------------------
// JSON (`/root/reference/codec/json/json.go`)
// ---------------------------------------------------------------------------

/** Option surface of the reference JSON codec (`json.go:28-80`).
  * `preProcessor` is the map-based hook (`json.go:44-48`): it receives
  * the 1-based rowID (counting kept rows) and the row as a
  * name→native-value map, and runs on the driver-stream path.
  * `escapeHtml` matches the reference's std-compatible encoder, which
  * escapes `<>&` inside JSON strings. */
final case class JsonOptions(
    newlineDelimited: Boolean = false,
    limit: Int = -1,
    mappers: Mappers = Nil,
    ctxMappers: CtxMappers = Nil,
    escapeHtml: Boolean = true,
    preProcessor: Option[(Int, Map[String, Any]) => (Map[String, Any], Boolean)] = None)

object JsonSink {

  /** One JSON object per row. Keys are sorted alphabetically — the
    * reference marshals a `map[string]any` with a std-lib-compatible
    * encoder, which sorts keys (`json.go:108-130`). Values are native
    * JSON (NULL → `null`); timestamps render as Go `time.Time` marshals
    * (RFC3339Nano); binary → base64, like Go `[]byte`. */
  def objects(df: DataFrame, opts: JsonOptions = JsonOptions()): Dataset[String] = {
    require(opts.preProcessor.isEmpty,
      "the map-based preProcessor runs on the driver-stream path (writeString/writeFile)")
    import SinkIO.stringEnc
    val limited = if (opts.limit >= 0) df.limit(opts.limit) else df
    val fields = limited.schema.fields.sortBy(_.name)
    val cols = fields.map { f =>
      val base = col(f.name)
      val mapped = opts.ctxMappers.collectFirst {
        case (dt, fn) if dt == f.dataType =>
          fn(Render.MapperContext(f.name, graft.sources.SourceMeta.driverOf(f)), base)
      }.orElse(opts.mappers.collectFirst {
        case (dt, fn) if dt == f.dataType => fn(base)
      }).getOrElse {
        f.dataType match {
          case TimestampType | TimestampNTZType => Render.rfc3339NanoRaw(base)
          case _ => base
        }
      }
      mapped.as(f.name)
    }
    val j = to_json(struct(cols.toIndexedSeq: _*), Map("ignoreNullFields" -> "false"))
    // `<>&` never appear structurally in JSON, so a global replace only
    // touches string contents — matching the reference encoder exactly
    val escaped =
      if (opts.escapeHtml)
        regexp_replace(regexp_replace(regexp_replace(j,
          "&", "\\\\u0026"), "<", "\\\\u003c"), ">", "\\\\u003e")
      else j
    limited.select(escaped.as("j")).as[String]
  }

  /** Driver-path objects with the map hook: native-value maps, sorted
    * keys, kept-row rowIDs, std-compatible serialization (GoJson). */
  private def hookedObjects(df: DataFrame, opts: JsonOptions): Iterator[String] = {
    val hook = opts.preProcessor.get
    // custom mappers apply BEFORE the hook, like `json.go:111-128`
    val mapped = df.select(df.schema.fields.map { f =>
      opts.ctxMappers.collectFirst { case (dt, fn) if dt == f.dataType =>
          fn(Render.MapperContext(f.name, graft.sources.SourceMeta.driverOf(f)), col(f.name)) }
        .orElse(opts.mappers.collectFirst {
          case (dt, fn) if dt == f.dataType => fn(col(f.name)) })
        .getOrElse(col(f.name)).as(f.name)
    }.toIndexedSeq: _*)
    val schema = mapped.schema
    val rows = scala.jdk.CollectionConverters
      .IteratorHasAsScala(mapped.toLocalIterator()).asScala
    var rowID = 1
    var emitted = 0
    val out = rows.flatMap { row =>
      if (opts.limit >= 0 && emitted >= opts.limit) None
      else {
        val m: Map[String, Any] = schema.fields.zipWithIndex.map { case (f, i) =>
          f.name -> (if (row.isNullAt(i)) null else row.get(i))
        }.toMap
        val (rewritten, keep) = hook(rowID, m)
        if (keep) {
          rowID += 1; emitted += 1
          Some(Format.GoJson.writeRow(rewritten))
        } else None
      }
    }
    out
  }

  /** Array-mode / NDJSON framing (`json.go:94-98,135-147`): array mode
    * opens `[` lazily with the first row, so zero rows → EMPTY output,
    * not `[]`. */
  def contentIterator(df: DataFrame, opts: JsonOptions = JsonOptions()): Iterator[String] = {
    if (opts.limit == 0) return Iterator.empty
    val rows =
      if (opts.preProcessor.isDefined) hookedObjects(df, opts)
      else scala.jdk.CollectionConverters
        .IteratorHasAsScala(objects(df, opts).toLocalIterator()).asScala
    if (opts.newlineDelimited) rows.map(_ + "\n")
    else {
      var first = true
      val body = rows.map { r =>
        val s = if (first) "[\n" + r else ",\n" + r
        first = false
        s
      }
      val close = new Iterator[String] {
        private var emitted = false
        def hasNext: Boolean = !emitted && !first
        def next(): String = { emitted = true; "\n]\n" }
      }
      body ++ close
    }
  }

  def writeString(df: DataFrame, opts: JsonOptions = JsonOptions()): String =
    contentIterator(df, opts).mkString

  def writeFile(df: DataFrame, path: String, opts: JsonOptions = JsonOptions()): Unit =
    SinkIO.writeFile(path, contentIterator(df, opts))

  /** Distributed NDJSON directory write — the scale path. */
  def writeDir(df: DataFrame, path: String, opts: JsonOptions = JsonOptions()): Unit = {
    val limited = if (opts.limit >= 0) df.limit(opts.limit) else df
    objects(limited, opts.copy(limit = -1)).write.mode("overwrite").text(path)
  }
}

// ---------------------------------------------------------------------------
// XML (`/root/reference/codec/xml/xml.go`)
// ---------------------------------------------------------------------------

/** Option surface of the reference XML codec (`xml.go:17-65`). */
final case class XmlOptions(
    limit: Int = -1,
    preProcessor: Option[PreProcessor] = None,
    mappers: Mappers = Nil,
    ctxMappers: CtxMappers = Nil)

object XmlSink {

  /** Distributed `<row>` fragments: NULL elements omitted, values
    * escaped, element names raw (`xml.go:111-122`). */
  def rows(df: DataFrame, opts: XmlOptions = XmlOptions()): Dataset[String] = {
    require(opts.preProcessor.isEmpty, "use ops.Pipeline for distributed writes")
    import SinkIO.stringEnc
    val limited = if (opts.limit >= 0) df.limit(opts.limit) else df
    val names = limited.schema.fieldNames.toIndexedSeq
    SinkIO.renderedRows(limited, opts.mappers, opts.ctxMappers)
      .map(cells => Format.xmlRow(names, cells.toIndexedSeq))
  }

  /** Exact reference output (`xml.go:67-130`): declaration + `<data>`
    * written lazily with the first kept row; zero kept rows → EMPTY
    * output; limit counts kept rows; limit=0 short-circuits. */
  def contentIterator(df: DataFrame, opts: XmlOptions = XmlOptions()): Iterator[String] = {
    if (opts.limit == 0) return Iterator.empty
    val names = df.schema.fieldNames.toIndexedSeq
    val source =
      if (opts.preProcessor.isEmpty && opts.limit > 0)
        SinkIO.renderedRows(df.limit(opts.limit), opts.mappers, opts.ctxMappers).toLocalIterator()
      else SinkIO.renderedRows(df, opts.mappers, opts.ctxMappers).toLocalIterator()

    var rowID = 0
    var done = false
    var any = false
    val body = new Iterator[String] {
      private var pending: Option[String] = None
      private def advance(): Unit = {
        while (pending.isEmpty && !done && source.hasNext) {
          val cells = source.next().toIndexedSeq
          val strs = cells.map(c => if (c == null) "" else c)
          val (row, keep) = opts.preProcessor match {
            case Some(f) => f(rowID + 1, strs)
            case None    => (strs, true)
          }
          if (keep) {
            // NULL-omission follows the ORIGINAL null mask even if the
            // preprocessor rewrote the cell (`xml.go:94-96,113-115`)
            val masked = row.zipWithIndex.map { case (s, i) =>
              if (cells(i) == null) null else s
            }
            val opener = if (!any) Format.xmlDeclaration + "\n<data>\n" else ""
            any = true
            pending = Some(opener + Format.xmlRow(names, masked) + "\n")
            rowID += 1
            if (opts.limit >= 0 && rowID >= opts.limit) done = true
          }
        }
      }
      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): String = { advance(); val s = pending.get; pending = None; s }
    }
    val close = new Iterator[String] {
      private var emitted = false
      def hasNext: Boolean = !emitted && any && !body.hasNext
      def next(): String = { emitted = true; "</data>\n" }
    }
    body ++ close
  }

  def writeString(df: DataFrame, opts: XmlOptions = XmlOptions()): String =
    contentIterator(df, opts).mkString

  def writeFile(df: DataFrame, path: String, opts: XmlOptions = XmlOptions()): Unit =
    SinkIO.writeFile(path, contentIterator(df, opts))

  /** Distributed write WITH the reference's global framing (declaration
    * + `<data>` root + empty→empty law), via the DSv2
    * [[graft.sinks.v2.FramedTextSink]] commit protocol — the directory's
    * non-hidden files concatenated in name order are byte-identical to
    * [[writeString]] when the input's partition order is its global
    * order (see DsvWriteSpec). Use this instead of `rows().write.text`
    * when the consumer expects a well-formed XML document. */
  def writeDirFramed(df: DataFrame, path: String, opts: XmlOptions = XmlOptions()): Unit =
    rows(df, opts).write.format("graft-framed")
      .option("open", Format.xmlDeclaration + "\n<data>\n")
      .option("sep", "\n")
      .option("close", "\n</data>\n")
      .mode("overwrite").save(path)
}

// ---------------------------------------------------------------------------
// HTML (`/root/reference/codec/html/html.go`)
// ---------------------------------------------------------------------------

/** Option surface of the reference HTML codec (`html.go:30-95`). */
final case class HtmlOptions(
    writeHeader: Boolean = true,
    writeHeaderWhenNoData: Boolean = true,
    nullValue: String = Format.htmlNullValue,
    limit: Int = -1,
    preProcessor: Option[PreProcessor] = None,
    mappers: Mappers = Nil,
    ctxMappers: CtxMappers = Nil)

object HtmlSink {

  /** `<thead>` block with per-column name + lowercased type
    * (`html.go:102-110`). The reference shows the SOURCE database's type
    * name (`DatabaseTypeName`, `html.go:107`); when the frame came
    * through `Slice.fromSql` that name rides in the field metadata and is
    * preferred — the Spark SQL type name is the native-frame fallback. */
  def headerBlock(df: DataFrame): String = {
    val ths = df.schema.fields.map { f =>
      val typeName = graft.sources.SourceMeta.databaseTypeNameOf(f)
        .getOrElse(f.dataType.sql).toLowerCase
      Format.htmlTh(f.name, typeName)
    }.mkString
    Format.htmlPrefix + Format.htmlTheadOpen + ths + "</thead>"
  }

  /** Distributed `<tr>` fragments (NULL → nullValue markup, raw cells). */
  def rows(df: DataFrame, opts: HtmlOptions = HtmlOptions()): Dataset[String] = {
    require(opts.preProcessor.isEmpty, "use ops.Pipeline for distributed writes")
    import SinkIO.stringEnc
    val limited = if (opts.limit >= 0) df.limit(opts.limit) else df
    val nv = opts.nullValue
    SinkIO.renderedRows(limited, opts.mappers, opts.ctxMappers)
      .map(cells => Format.htmlRow(cells.toIndexedSeq.map(c => if (c == null) nv else c)))
  }

  /** Exact reference output (`html.go:96-171`): eager/lazy header,
    * `<tbody>` with the first kept row, closers depending on what was
    * written. */
  def contentIterator(df: DataFrame, opts: HtmlOptions = HtmlOptions()): Iterator[String] = {
    val hasCols = df.schema.nonEmpty
    val eagerHeader = opts.writeHeader && opts.writeHeaderWhenNoData && hasCols
    val head = if (eagerHeader) Iterator.single(headerBlock(df)) else Iterator.empty

    if (opts.limit == 0)
      return head ++ (if (eagerHeader) Iterator.single("</table></body></html>") else Iterator.empty)

    val source =
      if (opts.preProcessor.isEmpty && opts.limit > 0)
        SinkIO.renderedRows(df.limit(opts.limit), opts.mappers, opts.ctxMappers).toLocalIterator()
      else SinkIO.renderedRows(df, opts.mappers, opts.ctxMappers).toLocalIterator()

    var rowID = 1
    var done = false
    var any = false
    val body = new Iterator[String] {
      private var pending: Option[String] = None
      private def advance(): Unit = {
        while (pending.isEmpty && !done && source.hasNext) {
          val raw = source.next().toIndexedSeq.map(c => if (c == null) opts.nullValue else c)
          val (row, keep) = opts.preProcessor match {
            case Some(f) => f(rowID, raw)
            case None    => (raw, true)
          }
          if (keep) {
            val lazyHeader =
              if (opts.writeHeader && rowID == 1 && !opts.writeHeaderWhenNoData && hasCols)
                headerBlock(df)
              else ""
            val tbodyOpen = if (!any) "<tbody>" else ""
            any = true
            pending = Some(lazyHeader + tbodyOpen + Format.htmlRow(row))
            if (opts.limit >= 0 && rowID >= opts.limit) done = true
            rowID += 1
          }
        }
      }
      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): String = { advance(); val s = pending.get; pending = None; s }
    }
    val close = new Iterator[String] {
      private var emitted = false
      def hasNext: Boolean = !emitted && !body.hasNext
      def next(): String = {
        emitted = true
        if (any) "</tbody></table></body></html>"
        else if (eagerHeader) "</table></body></html>"
        else ""
      }
    }
    head ++ body ++ close
  }

  def writeString(df: DataFrame, opts: HtmlOptions = HtmlOptions()): String =
    contentIterator(df, opts).mkString

  def writeFile(df: DataFrame, path: String, opts: HtmlOptions = HtmlOptions()): Unit =
    SinkIO.writeFile(path, contentIterator(df, opts))

  /** Distributed write WITH the reference's whole-document framing
    * (document+CSS+`<thead>` opener, `<tbody>` wrap, closers), via the
    * DSv2 [[graft.sinks.v2.FramedTextSink]] — the HTML twin of
    * `XmlSink.writeDirFramed`, closing the last driver-only sink path.
    * Framing law mirrors [[contentIterator]]: rows exist → header (when
    * `writeHeader`) + `<tbody>` + raw `<tr>` fragments + closers; zero
    * rows → header+closers when the header is eager, EMPTY otherwise
    * (the `empty` option — HTML is the one codec whose empty output is
    * not empty). Directory files concatenated in name order are
    * byte-identical to [[writeString]] when partition order is global
    * order (DsvWriteSpec). */
  def writeDirFramed(df: DataFrame, path: String, opts: HtmlOptions = HtmlOptions()): Unit = {
    val hasCols = df.schema.nonEmpty
    val header = if (opts.writeHeader && hasCols) headerBlock(df) else ""
    val eagerHeader = opts.writeHeader && opts.writeHeaderWhenNoData && hasCols
    rows(df, opts).write.format("graft-framed")
      .option("open", header + "<tbody>")
      .option("sep", "")
      .option("close", "</tbody></table></body></html>")
      .option("empty",
        if (eagerHeader) header + "</table></body></html>" else "")
      .mode("overwrite").save(path)
  }
}

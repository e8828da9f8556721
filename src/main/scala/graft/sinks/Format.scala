package graft.sinks

/** Pure row→string formatting, shared by the distributed path
  * (`Dataset.map` over rendered rows) and the driver-stream path (exact
  * sequential semantics for rowID-dependent hooks). Mirrors the byte-level
  * behavior of the reference codecs; each function cites its source.
  */
object Format {

  /** Go `unicode.IsSpace` — the Unicode White_Space property. Differs from
    * BOTH Java predicates: `Character.isWhitespace` misses U+0085/U+00A0/
    * U+2007/U+202F but adds the 1C-1F separators (not spaces in Go);
    * `isSpaceChar` misses the ASCII controls. */
  def goIsSpace(cp: Int): Boolean = cp match {
    case 0x09 | 0x0A | 0x0B | 0x0C | 0x0D | 0x20 | 0x85 | 0xA0 => true
    case 0x1680 => true
    case c if c >= 0x2000 && c <= 0x200A => true
    case 0x2028 | 0x2029 | 0x202F | 0x205F | 0x3000 => true
    case _ => false
  }

  /** Go `encoding/csv` quoting decision (writer.go `fieldNeedsQuotes`):
    * empty fields are never quoted; `\.` always is (postgres dump quirk);
    * fields containing the delimiter, a quote, CR or LF are quoted; so are
    * fields whose first rune is a space (Go `unicode.IsSpace`, which
    * includes NEL and NBSP). */
  def csvNeedsQuotes(field: String, delimiter: Char): Boolean = {
    if (field.isEmpty) false
    else if (field == "\\.") true
    else if (field.indexOf(delimiter) >= 0) true
    else if (field.exists(c => c == '"' || c == '\r' || c == '\n')) true
    else goIsSpace(field.codePointAt(0))
  }

  /** Encode one CSV field: double inner quotes; in CRLF mode, newlines
    * inside quoted fields become CRLF and bare CRs are dropped (Go
    * csv.Writer's quoted-field loop). */
  def csvField(field: String, delimiter: Char, useCRLF: Boolean): String = {
    if (!csvNeedsQuotes(field, delimiter)) field
    else {
      val doubled = field.replace("\"", "\"\"")
      val body =
        if (useCRLF) doubled.replace("\r", "").replace("\n", "\r\n")
        else doubled
      "\"" + body + "\""
    }
  }

  /** One CSV record, no line terminator. `null` cells must already be
    * replaced by the configured nullValue (`csv.go:195-198`). */
  def csvLine(fields: IndexedSeq[String], delimiter: Char, useCRLF: Boolean): String =
    fields.map(csvField(_, delimiter, useCRLF)).mkString(delimiter.toString)

  /** Go `xml.EscapeText` on a valid-UTF-8 string: the five XML specials
    * plus tab/LF/CR as character references (`xml.go:118`). */
  def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("&#34;")
        case '\'' => sb.append("&#39;")
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '\t' => sb.append("&#x9;")
        case '\n' => sb.append("&#xA;")
        case '\r' => sb.append("&#xD;")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** One `<row>` element: NULL cells omitted entirely, values escaped,
    * element names taken raw from column names (`xml.go:111-122`). `null`
    * entries in `cells` mark NULL. */
  def xmlRow(names: IndexedSeq[String], cells: IndexedSeq[String]): String = {
    val sb = new java.lang.StringBuilder("<row>")
    var i = 0
    while (i < names.length) {
      if (cells(i) != null) {
        sb.append('<').append(names(i)).append('>')
        sb.append(xmlEscape(cells(i)))
        sb.append("</").append(names(i)).append('>')
      }
      i += 1
    }
    sb.append("</row>").toString
  }

  val xmlDeclaration = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"

  /** One `<tr>`: cells are written RAW (the reference does not HTML-escape
    * cell contents, `html.go:155-162`); NULL cells must already carry the
    * configured nullValue markup. */
  def htmlRow(cells: IndexedSeq[String]): String =
    cells.mkString("<tr><td>", "</td><td>", "</td></tr>")

  /** The reference's document prefix: CSS collapsed to single spaces via
    * `strings.Join(strings.Fields(...), " ")` (`html.go:194-227`). */
  val htmlPrefix: String =
    """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Go Export</title><style>
      |body, html { margin: 0; padding: 0; }
      |* { margin: 0; padding: 0; }
      |th { border:1px solid #dedede; padding: 15px; border-top: 0px solid red; border-left: 0px solid red; }
      |td { border: 1px solid #dedede; border-top: 0px solid red; border-left: 0px solid red; padding: 10px 10px 10px 10px; max-width:700px; overflow-x: auto; white-space: nowrap; scrollbar-width: none; -ms-overflow-style: none; }
      |.td::-webkit-scrollbar { display: none; }
      |p.typ { margin-top: 5px; color: #333; }
      |</style> </head><body><table style="width:100%;border-spacing:0px;">""".stripMargin
      .split("\\s+").mkString(" ")

  val htmlTheadOpen =
    """<thead style="position:sticky;top:0;z-index:99;background:#f9f9f9;">"""

  def htmlTh(name: String, typeName: String): String =
    s"<th><p>$name</p><p class=typ>$typeName</p></th>"

  /** Default NULL markup (`html.go:36`). */
  val htmlNullValue = """<span style="color:#aaaaaa;">[NULL]</span>"""

  /** Go-std-compatible JSON value writer for the driver-path JSON hook
    * (`json.go:108-130` marshals `map[string]any` with a std-compatible
    * encoder: SORTED keys, HTML escaping of `<>&`, RFC3339Nano times,
    * base64 `[]byte`). Number formatting matches the distributed
    * `to_json` path (JVM `toString`) so both paths emit identical bytes
    * for the same rows. */
  object GoJson {
    /** One row (the hook's `Map[String, Any]`): sorted keys like the
      * reference's map[string]any marshal; DIRECT values are top-level
      * columns, where the distributed path re-formats timestamps to
      * RFC3339Nano — everything deeper is `write` (nested) territory. */
    def writeRow(m: scala.collection.Map[String, Any]): String =
      m.toSeq.sortBy(_._1)
        .map { case (k, x) => quote(k) + ":" + writeTop(x) }
        .mkString("{", ",", "}")

    /** A top-level column value: timestamps render RFC3339Nano (matching
      * `JsonSink.objects`' rfc3339NanoRaw reformatting of top-level
      * TimestampType columns); all other values share nested semantics. */
    def writeTop(v: Any): String = v match {
      case t: java.sql.Timestamp => quote(rfc3339Nano(t))
      case i: java.time.Instant => quote(rfc3339NanoInstant(i))
      // TimestampNTZ surfaces as LocalDateTime; the distributed path
      // (`rfc3339NanoRaw`) formats NTZ like a UTC instant (probe-pinned:
      // "…T10:00:00Z", fraction trimmed) under the UTC session zone the
      // graft sessions run with
      case ldt: java.time.LocalDateTime =>
        quote(rfc3339NanoInstant(ldt.toInstant(java.time.ZoneOffset.UTC)))
      case other => write(other)
    }

    /** A NESTED value (inside a struct, array, or map). Timestamps at
      * any nesting depth use `to_json`'s DEFAULT rendering (millis,
      * always 3 digits, Z) — the distributed path can only re-format
      * top-level timestamp COLUMNS, so byte parity below the top level
      * means matching what `to_json` does there, not RFC3339Nano. */
    def write(v: Any): String = v match {
      case null => "null"
      case s: String => quote(s)
      case b: Boolean => b.toString
      case b: Byte => b.toString
      case s: Short => s.toString
      case i: Int => i.toString
      case l: Long => l.toString
      case f: Float => f.toString
      case d: Double => d.toString
      case d: java.math.BigDecimal => d.toPlainString
      case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
      case b: Array[Byte] => quote(java.util.Base64.getEncoder.encodeToString(b))
      case t: java.sql.Timestamp => quote(sparkJsonTs(t.toInstant))
      case i: java.time.Instant => quote(sparkJsonTs(i))
      // nested TimestampNTZ: `to_json` default = millis, NO zone suffix
      // (probe-pinned: "2024-03-01T10:00:00.000")
      case ldt: java.time.LocalDateTime => quote(sparkJsonTsNtz(ldt))
      // dates marshal as the same "yyyy-MM-dd" string `to_json` emits
      case d: java.sql.Date => quote(d.toString)
      case d: java.time.LocalDate => quote(d.toString)
      // nested structs keep SCHEMA order (matching `to_json`)
      case r: org.apache.spark.sql.Row =>
        val sch = r.schema
        require(sch != null, "nested Row without schema on the JSON driver path")
        sch.fields.zipWithIndex
          .map { case (f, i) =>
            quote(f.name) + ":" + write(if (r.isNullAt(i)) null else r.get(i))
          }
          .mkString("{", ",", "}")
      case m: scala.collection.Map[_, _] =>
        m.toSeq.map { case (k, x) => (k.toString, x) }.sortBy(_._1)
          .map { case (k, x) => quote(k) + ":" + write(x) }
          .mkString("{", ",", "}")
      case s: Iterable[_] => s.map(write).mkString("[", ",", "]")
      case other => throw new IllegalArgumentException(
        s"unsupported JSON value: ${other.getClass.getName}")
    }

    def rfc3339Nano(ts: java.sql.Timestamp): String = rfc3339NanoInstant(ts.toInstant)

    private val secondsFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)

    /** Spark `to_json`'s default timestamp rendering: exactly 3 fraction
      * digits (micros truncated to millis) and `Z` at UTC — what nested
      * timestamps get on the distributed path. */
    def sparkJsonTs(instant: java.time.Instant): String =
      f"${secondsFmt.format(instant)}.${instant.getNano / 1000000}%03dZ"

    /** `to_json`'s default TimestampNTZ rendering: exactly 3 fraction
      * digits and no zone suffix (a naive wall-clock value). */
    def sparkJsonTsNtz(ldt: java.time.LocalDateTime): String =
      f"${ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))}.${ldt.getNano / 1000000}%03d"

    def rfc3339NanoInstant(instant: java.time.Instant): String = {
      val base = secondsFmt.format(instant)
      val nanos = instant.getNano
      if (nanos == 0) base + "Z"
      else base + "." + f"$nanos%09d".reverse.dropWhile(_ == '0').reverse + "Z"
    }

    /** std-JSON string escaping incl. the HTML set (`<>&` → \u00XX). */
    def quote(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length + 2)
      sb.append('"')
      s.foreach {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '<'  => sb.append("\\u003c")
        case '>'  => sb.append("\\u003e")
        case '&'  => sb.append("\\u0026")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }
  }
}

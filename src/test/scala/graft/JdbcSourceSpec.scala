package graft

import java.sql.DriverManager

import graft.sinks.{JsonOptions, JsonSink}
import graft.sources.Slice

/** FromSQL parity (`scanner/sql.go:20-22`) against a real database: the
  * reference's EP2 (SQL database → JSON, `README.md:62-110`) end to end
  * over embedded Derby through the JDBC reader — the query text executes
  * in the database, exactly like the reference wrapping an
  * already-executed `*sql.Rows`. */
class JdbcSourceSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("EP2: database query -> JDBC scan -> JSON export") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (id INT, username VARCHAR(32), score DOUBLE)")
      st.execute("INSERT INTO users VALUES (1, 'alice', 9.5), (2, 'admin', 0.0), (3, 'bob', 7.25)")
    } finally conn.close()

    val df = Slice.fromSql(spark, url,
      "SELECT id, username, score FROM users WHERE username <> 'admin'",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))
    assert(df.schema.fieldNames.toSeq.map(_.toLowerCase) == Seq("id", "username", "score"))

    val out = JsonSink.writeString(df.orderBy(df("id")),
      JsonOptions(newlineDelimited = true))
    assert(out ==
      "{\"ID\":1,\"SCORE\":9.5,\"USERNAME\":\"alice\"}\n" +
      "{\"ID\":3,\"SCORE\":7.25,\"USERNAME\":\"bob\"}\n", out)
  }

  test("JDBC source carries DatabaseTypeName into the HTML typed header") {
    val conn = DriverManager.getConnection(url + ";create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE typed_t (id INT, label VARCHAR(16), ratio DOUBLE)")
      st.execute("INSERT INTO typed_t VALUES (1, 'one', 0.5)")
    } finally conn.close()

    val df = Slice.fromSql(spark, url, "SELECT id, label, ratio FROM typed_t",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

    // source type names + driver tag ride on the schema metadata
    import graft.sources.SourceMeta
    assert(df.schema.fields.map(SourceMeta.databaseTypeNameOf(_).get).toSeq ==
      Seq("INTEGER", "VARCHAR", "DOUBLE"))
    assert(df.schema.fields.forall(SourceMeta.driverOf(_) == "derby"))

    // the HTML header shows the SOURCE's lowercased type name
    // (html.go:107 DatabaseTypeName), not Spark's: "integer", not "int"
    val head = graft.sinks.HtmlSink.headerBlock(df)
    assert(head.contains("<p class=typ>integer</p>"), head)
    assert(head.contains("<p class=typ>varchar</p>"), head)
    assert(head.contains("<p class=typ>double</p>"), head)
  }
}

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
}

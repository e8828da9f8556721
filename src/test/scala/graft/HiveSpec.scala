package graft

import graft.sources.Slice

/** Hive scan parity (`/root/reference/scanner/hive.go:25-80`): the
  * reference pulls rows over a HiveServer2 Thrift cursor; the Spark-native
  * equivalent is the metastore-backed Hive catalog — a session built with
  * `enableHiveSupport()` queries the same tables in-engine. This spec
  * round-trips a managed table through the embedded-Derby metastore
  * (`derby.system.home` pinned in build.sbt) and reads it back through
  * `Slice.fromHive`. */
class HiveSpec extends SparkTestBase {

  test("saveAsTable -> fromHive round-trip over the Hive metastore") {
    // the test JVM runs the real HiveExternalCatalog, not the in-memory one
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_hive_t")
    Seq((1, "alpha"), (2, "beta"), (3, "gamma")).toDF("id", "name")
      .write.mode("overwrite").saveAsTable("graft_hive_t")

    val back = Slice.fromHive(spark, "SELECT id, name FROM graft_hive_t ORDER BY id")
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "alpha"), (2, "beta"), (3, "gamma")))

    // a real metastore object, not a temp view
    assert(spark.catalog.tableExists("graft_hive_t"))
    assert(!spark.catalog.getTable("graft_hive_t").isTemporary)
    spark.sql("DROP TABLE graft_hive_t")
  }

  test("fromHive sees metastore DDL (CREATE TABLE ... INSERT)") {
    spark.sql("DROP TABLE IF EXISTS graft_hive_ddl")
    spark.sql("CREATE TABLE graft_hive_ddl (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft_hive_ddl VALUES (10, 'x'), (20, 'y')")
    val got = Slice.fromHive(spark,
      "SELECT k, v FROM graft_hive_ddl ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((10, "x"), (20, "y")))
    spark.sql("DROP TABLE graft_hive_ddl")
  }
}

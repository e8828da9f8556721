package graft.sources

import org.apache.spark.sql.types.StructField

/** StructField.metadata keys carrying source-level context the reference
  * threads through its `Metadata{RowID, Driver, Column}` struct
  * (`/root/reference/scanner/scanner.go:27-31`). Row-invariant context
  * (driver name, source column type name) travels on the schema; RowID is
  * sequential and exists only on the driver-stream sink path (SURVEY §1).
  */
object SourceMeta {
  /** The source database's own type name for a column, as reported by
    * JDBC `ResultSetMetaData.getColumnTypeName` — the analog of Go
    * `sql.ColumnType.DatabaseTypeName` (`scanner/sql.go`). */
  val DatabaseTypeNameKey = "graft.databaseTypeName"

  /** The scanner driver tag ("derby", "mysql", …), parsed from the JDBC
    * URL subprotocol; "spark" for native frames. */
  val DriverKey = "graft.driver"

  def driverOf(f: StructField): String =
    if (f.metadata.contains(DriverKey)) f.metadata.getString(DriverKey) else "spark"

  def databaseTypeNameOf(f: StructField): Option[String] =
    if (f.metadata.contains(DatabaseTypeNameKey))
      Some(f.metadata.getString(DatabaseTypeNameKey))
    else None
}

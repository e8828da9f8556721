package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 showcase: a deterministic synthetic-document generator
  * (`spark.read.format("graft-docs")`), the source a 100 TB test harness
  * needs — data is produced IN the executors, partitioned by row range,
  * with no input bytes to move.
  *
  *   - options: `rows` (default 1000), `partitions` (default 8),
  *     `seed` (default 42)
  *   - full DSv2 read path: TableProvider → Table → ScanBuilder (with
  *     `SupportsPushDownRequiredColumns` column pruning — generating only
  *     what the query projects — and `SupportsPushDownFilters` doc_id
  *     range pushdown: predicates on the consecutive id range narrow
  *     [lo, hi) exactly, so pruned ids are never generated) → Batch →
  *     InputPartition → PartitionReader
  *   - reproducible: cell values derive from splitmix64(seed, doc_id),
  *     independent of partitioning
  *
  * This is the (c)-level extension path for sources, complementing the
  * slice/JDBC/Hive parity wrappers in [[graft.sources.Slice]].
  */
class DocGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("keyed", false)) DocGen.keyedSchema else DocGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new DocGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("seed", "42").toLong,
      properties.getOrDefault("keyed", "false").toBoolean)
}

object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  /** keyed mode adds the partition key as a real column. */
  val keyedSchema: StructType = schema.add(StructField("shard", IntegerType, nullable = false))

  private val langs = Array("en", "de", "fr", "es", "zh")
  private val vocab = Array("data", "table", "query", "row", "scan", "join",
    "merge", "stream", "batch", "window", "filter", "sort", "hash", "value",
    "part", "key", "agg", "spark", "fast", "slow")

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def lang(seed: Long, id: Long): String =
    langs(math.floorMod(splitmix64(seed ^ id), langs.length).toInt)

  def nTokens(seed: Long, id: Long): Int =
    20 + math.floorMod(splitmix64(seed ^ ~id), 80).toInt

  def text(seed: Long, id: Long): String = {
    val n = nTokens(seed, id)
    val sb = new java.lang.StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(math.floorMod(splitmix64(seed ^ (id * 131 + i)), vocab.length).toInt))
      i += 1
    }
    sb.toString
  }
}

class DocGenTable(rows: Long, partitions: Int, seed: Long,
                  keyed: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft-docs($rows)"
  override def schema(): StructType =
    if (keyed) DocGen.keyedSchema else DocGen.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, partitions, seed, keyed)
}

class DocGenScanBuilder(rows: Long, partitions: Int, seed: Long,
                        keyed: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType =
    if (keyed) DocGen.keyedSchema else DocGen.schema
  // doc_id is the consecutive range [0, rows): range predicates on it
  // are handled EXACTLY by narrowing [lo, hi) — generation never even
  // runs for pruned ids, the DSv2 analogue of partition pruning. A
  // filter accepted here needs no post-scan re-evaluation.
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty

  // Integral types only: a fractional literal would truncate via
  // longValue() and, because accepted filters are reported as fully
  // handled, ship wrong rows with no post-scan recheck. (Catalyst
  // currently casts the column for such comparisons, blocking the
  // translation — but correctness must not rest on that.)
  private def bound(v: Any): Option[Long] = v match {
    case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
              _: java.lang.Long) => Some(n.asInstanceOf[Number].longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("doc_id", v) => bound(v).isDefined
      case GreaterThan("doc_id", v) => bound(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => bound(v).isDefined
      case LessThan("doc_id", v) => bound(v).isDefined
      case LessThanOrEqual("doc_id", v) => bound(v).isDefined
      case _ => false
    }
    ok.foreach {
      case EqualTo(_, v) =>
        lo = math.max(lo, bound(v).get); hi = math.min(hi, bound(v).get + 1)
      case GreaterThan(_, v) => lo = math.max(lo, bound(v).get + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, bound(v).get)
      case LessThan(_, v) => hi = math.min(hi, bound(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, bound(v).get + 1)
      case _ => ()
    }
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keyed mode keeps `shard` in the output even if the projection
    // drops it: the reported KeyGroupedPartitioning keys must resolve
    // against the scan's output attributes
    required =
      if (keyed && !requiredSchema.fieldNames.contains("shard"))
        requiredSchema.add(DocGen.keyedSchema("shard"))
      else requiredSchema

  // COUNT(*) / MIN(doc_id) / MAX(doc_id) are pure functions of the
  // (filter-narrowed) id range [lo, hi) — answered from arithmetic,
  // generating NOTHING. Aggregate pushdown runs after filter pushdown,
  // so `WHERE doc_id >= x` composes. COMPLETE pushdown: the scan emits
  // the single final row and Spark only projects over it.
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, AggregateFunc, CountStar, Max, Min}

  private var aggValues: Option[Seq[Option[Long]]] = None
  private var aggSchema: StructType = _

  private def isDocIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }

  private def isDocId(f: AggregateFunc): Boolean = f match {
    case m: Min => isDocIdRef(m.column)
    case m: Max => isDocIdRef(m.column)
    case _ => false
  }

  private def translatable(agg: Aggregation): Boolean =
    !keyed && agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case f => isDocId(f)
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean = translatable(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!translatable(agg)) return false
    val span = math.max(0L, hi - lo)
    aggValues = Some(agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(span)
      case _: Min => if (span > 0) Some(lo) else None
      case _ => if (span > 0) Some(hi - 1) else None // Max, by translatable()
    })
    aggSchema = StructType(agg.aggregateExpressions.indices.map { i =>
      StructField(s"agg_$i", LongType, nullable = true)
    })
    true
  }

  override def build(): Scan = aggValues match {
    case Some(vals) => new DocGenAggScan(vals, aggSchema)
    case None if keyed =>
      new DocGenKeyedScan(lo, math.max(lo, hi), partitions, seed, required)
    case None => new DocGenScan(lo, math.max(lo, hi), partitions, seed, required)
  }
}

/** Single-row scan carrying a completely-pushed aggregate result. */
class DocGenAggScan(values: Seq[Option[Long]], schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    DocGenAggReaderFactory(values)
}

// a case class so the factory serializes without capturing the Scan
case class DocGenAggReaderFactory(values: Seq[Option[Long]])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow =
        InternalRow.fromSeq(values.map(_.map(Long.box).orNull))
      override def close(): Unit = ()
    }
}

case class DocGenPartition(start: Long, end: Long) extends InputPartition

/** One partition per shard (ids ≡ shard mod nShards within [lo, hi)),
  * carrying its key for storage-partitioned planning. */
case class DocGenShardPartition(shard: Int, nShards: Int, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(shard)
}

/** KEY-GROUPED scan (`keyed=true`): data is generated already clustered
  * by `shard = doc_id % partitions`, one InputPartition per shard, each
  * reporting its key (`HasPartitionKey`), and the scan declares
  * `KeyGroupedPartitioning(identity(shard))`. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, Catalyst treats the
  * scan as ALREADY hash-clustered: a groupBy(shard) aggregates with NO
  * exchange, and two keyed scans join storage-partitioned — the DSv2
  * mechanism behind Iceberg/Delta bucket joins, and the 100 TB answer
  * to "don't shuffle what the storage already clustered". */
class DocGenKeyedScan(start: Long, end: Long, partitions: Int, seed: Long,
                      required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  import org.apache.spark.sql.connector.expressions.Expressions
  import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("shard")), partitions)
  override def planInputPartitions(): Array[InputPartition] =
    (0 until partitions)
      .map(p => DocGenShardPartition(p, partitions, start, end): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenShardReaderFactory(seed, required)
}

class DocGenShardReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocGenShardPartition]
    new PartitionReader[InternalRow] {
      private val step = part.nShards.toLong
      // first id >= lo with id % nShards == shard
      private val first =
        part.lo + math.floorMod(part.shard - part.lo, step)
      private var id = first - step
      private val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "doc_id"   => (i: Long) => i
          case "lang"     => (i: Long) => UTF8String.fromString(DocGen.lang(seed, i))
          case "text"     => (i: Long) => UTF8String.fromString(DocGen.text(seed, i))
          case "n_tokens" => (i: Long) => DocGen.nTokens(seed, i)
          case "shard"    => (_: Long) => part.shard
          case other      => throw new IllegalArgumentException(other)
        }
      }
      override def next(): Boolean = { id += step; id < part.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.toIndexedSeq.map(_(id)))
      override def close(): Unit = ()
    }
  }
}

class DocGenScan(start: Long, end: Long, partitions: Int, seed: Long,
                 required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val span = end - start
    if (span <= 0) return Array.empty
    val step = math.max(1L, (span + partitions - 1) / partitions)
    (start until end by step)
      .map(s => DocGenPartition(s, math.min(end, s + step)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(seed, required)
}

class DocGenReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocGenPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      // generate ONLY the projected columns (pruning reaches the reader)
      private val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "doc_id"   => (i: Long) => i
          case "lang"     => (i: Long) => UTF8String.fromString(DocGen.lang(seed, i))
          case "text"     => (i: Long) => UTF8String.fromString(DocGen.text(seed, i))
          case "n_tokens" => (i: Long) => DocGen.nTokens(seed, i)
          case other      => throw new IllegalArgumentException(other)
        }
      }
      override def next(): Boolean = { id += 1; id < part.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.toIndexedSeq.map(_(id)))
      override def close(): Unit = ()
    }
  }
}

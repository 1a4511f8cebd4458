package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => rstreaming}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Layout

/** Tail-the-snapshot-table as a stream, `format("graft-snapshot")` —
  * the DSv2 MicroBatchStream over [[graft.ops.Layout]]'s
  * manifest-committed table: offsets ARE snapshot ids, and each
  * micro-batch's input partitions are exactly the data files introduced
  * between two ids (the [[Layout.readSnapshotChanges]] planning rule:
  * exact for appends, full image for rewrites). This closes the
  * lakehouse produce/consume loop the way GraftTopic closes the keyed
  * topic's — the reference's whole topology is tail-a-changing-table
  * into a streaming job (StreamingJob.java:44-62, CDC table → stream);
  * here the table is the engine's own snapshot format, so a batch
  * writer ([[Layout.appendSnapshot]]) and a streaming consumer
  * compose without a broker. Delta calls this `startingVersion`
  * streaming; Iceberg, incremental scan.
  *
  * Scale shape: offset probes and batch planning are driver-side
  * manifest metadata (|files|-bounded text, never a data scan); row
  * reading fans out ONE partition PER DATA FILE, so a 1000-file append
  * consumes on 1000 cores. Options:
  *  - `path` (required): the snapshot table root;
  *  - `startingSnapshot` (default 0): first batch covers
  *    `(startingSnapshot, head]` — 0 replays all history;
  *  - `maxSnapshotsPerTrigger` (default 1): admission control — at
  *    most this many snapshot transitions per micro-batch, so commit
  *    boundaries stay visible to the consumer (and a restart resumes
  *    at the checkpointed id, never re-reading a consumed commit).
  *
  * Batch reads (`spark.read.format("graft-snapshot")`) serve the
  * current head (or `asOfSnapshot`) through the same per-file readers.
  * The reader decodes parquet via the parquet-hadoop Group API against
  * the MANIFEST-recorded schema — atomic types only (the table's own
  * writer records what it wrote, so a mismatch is a corrupt table, not
  * a cast decision).
  */
class GraftSnapshotProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshot requires a table root: .load(<path>)")
    p
  }

  // Writes carry their own schema (the query's), so the provider must
  // accept external metadata — otherwise the FIRST write to an empty
  // table would fail trying to infer a schema no commit has recorded.
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = Layout.snapshotSchema(SparkSession.active, path(options))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-snapshot: no committed snapshot at ${path(options)} to " +
          "infer a schema from (commit first, or pass .schema(...))"))
    // change-feed reads carry the typed-op column on every row
    if (options.getBoolean("readChangeFeed", false))
      base.add(StructField("_op", StringType, nullable = false))
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSnapshotTable(properties.get("path"), schema,
      partCols = GraftSnapshotTable.identityCols(partitioning))
}

/** `asOf` (-1 = head) pins every scan of this Table instance to one
  * snapshot id — the catalog's `VERSION AS OF` handle; a per-scan
  * `asOfSnapshot` option still overrides. `partCols`: Hive-style
  * identity partition columns (from `partitionBy` / `PARTITIONED BY`)
  * — the directory layout writes follow and reads prune on. */
class GraftSnapshotTable(val path: String, tableSchema: StructType,
    val asOf: Int = -1, val partCols: Seq[String] = Nil)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty,
    "graft-snapshot requires a table root: .load(<path>)")
  SnapshotFileReaderFactory.validate(tableSchema)
  partCols.foreach(c => require(tableSchema.fieldNames.contains(c),
    s"graft-snapshot: partition column '$c' is not a table column"))

  override def partitioning(): Array[Transform] =
    partCols.map(org.apache.spark.sql.connector.expressions
      .Expressions.identity).toArray

  override def name(): String = s"graft-snapshot:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SnapshotWriteBuilder(path, info, partCols)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSnapshotScanBuilder(path, tableSchema, options, asOf)
}

object GraftSnapshotTable {
  /** The identity-transform columns of a declared partitioning; any
    * non-identity transform (bucket, days, ...) is rejected loudly —
    * the manifest records plain Hive-style value directories only. */
  private[sources] def identityCols(
      partitioning: Array[Transform]): Seq[String] =
    partitioning.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        t.references.head.fieldNames.head
      case other => throw new IllegalArgumentException(
        s"graft-snapshot: unsupported partition transform $other — " +
          "only identity (plain column) partitioning is supported")
    }
}

/** Scan planning with the two pushdowns a metadata-committed table can
  * serve from the DRIVER:
  *  - `SupportsPushDownFilters`: range/equality predicates on the
  *    manifest's recorded stats column ([[Layout.snapshotStatsCol]])
  *    narrow the BATCH file list to overlapping [min, max] entries —
  *    file skipping planned from |files|-bounded manifest text, zero
  *    footer opens. Every filter stays RESIDUAL (skipping is
  *    file-granular, i.e. inexact), so Spark re-applies it row-level
  *    and correctness never depends on the index.
  *  - `SupportsPushDownRequiredColumns`: the pruned schema reaches the
  *    per-file reader, which projects the parquet read to the required
  *    columns (I/O ∝ columns read — the wide-table win).
  * The streaming scan applies column pruning only: its batches are
  * commit diffs, and admission control — not predicates — governs what
  * a trigger reads. */
final class GraftSnapshotScanBuilder(path: String,
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    tableAsOf: Int = -1)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources

  // The scan is PINNED to one snapshot id at builder construction:
  // pushdown decisions (which column the ranges index, the aggregate
  // values) and execution-time file planning must all read the SAME
  // immutable manifest — resolving the head again at planInputPartitions
  // could see a concurrent commit whose ranges index a different
  // column, silently mis-skipping files. Pinning also makes a batch
  // read snapshot-consistent end to end. Precedence: per-scan option,
  // then the Table's VERSION AS OF pin, then the current head.
  private val asOf: Int =
    Option(options.get("asOfSnapshot")).map(_.toInt)
      .orElse(Option(tableAsOf).filter(_ >= 0))
      .getOrElse(Layout.headId(SparkSession.active, path))
  private var required: StructType = tableSchema
  private var accepted: Array[sources.Filter] = Array.empty
  // (position in the manifest's statscols list, query interval) per
  // pushed bound — file skipping is per-column positional, typed
  // (integral exact / string code-point order / decimal unscaled,
  // Layout.ColRange)
  private var bounds: Seq[(Int, Layout.ColRange)] = Nil
  // (position, wantNull) per pushed IS [NOT] NULL — served by the
  // per-file null counts (round 14)
  private var nullBounds: Seq[(Int, Boolean)] = Nil

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    // temporal literals in their INDEX domain (epoch days / micros —
    // the parquet physical renderings the manifest ranges store)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case t: java.sql.Timestamp =>
      Some(Math.addExact(Math.multiplyExact(t.getTime, 1000L),
        (t.getNanos % 1000000L) / 1000L))
    case t: java.time.Instant =>
      Some(Math.addExact(
        Math.multiplyExact(t.getEpochSecond, 1000000L),
        t.getNano / 1000L))
    case _ => None
  }

  /** A DECIMAL literal as an UNSCALED long at the column's declared
    * scale, rounded CONSERVATIVELY for the bound's direction (a
    * literal with more fractional digits than the column can only
    * WIDEN the interval, never narrow it); None = not a decimal
    * column / doesn't fit — no pushdown. */
  private def asUnscaled(c: String, v: Any,
      mode: java.math.RoundingMode): Option[Long] = {
    val scale = tableSchema.fields.find(_.name == c)
      .map(_.dataType).collect {
        case d: DecimalType => d.scale }.getOrElse(return None)
    val bd = v match {
      case b: java.math.BigDecimal => b
      case b: scala.math.BigDecimal => b.underlying()
      case b: org.apache.spark.sql.types.Decimal => b.toJavaBigDecimal
      case _ => return None
    }
    try Some(bd.setScale(scale, mode).unscaledValue().longValueExact())
    catch { case _: ArithmeticException => None }
  }
  private def decLo(c: String, v: Any, strict: Boolean): Option[Long] =
    if (strict)
      asUnscaled(c, v, java.math.RoundingMode.FLOOR).map(_ + 1L)
    else asUnscaled(c, v, java.math.RoundingMode.CEILING)
  private def decHi(c: String, v: Any, strict: Boolean): Option[Long] =
    if (strict)
      asUnscaled(c, v, java.math.RoundingMode.CEILING).map(_ - 1L)
    else asUnscaled(c, v, java.math.RoundingMode.FLOOR)
  private def decScaleOf(c: String): Int =
    tableSchema.fields.find(_.name == c).map(_.dataType).collect {
      case d: DecimalType => d.scale }.getOrElse(0)
  private def asStr(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case u: org.apache.spark.unsafe.types.UTF8String =>
      Some(u.toString)
    case _ => None
  }
  private def boundOf(c: String, f: sources.Filter)
      : Option[Layout.ColRange] = f match {
    case sources.EqualTo(a, v) if a == c =>
      asLong(v).map(x => Layout.LongRange(x, x): Layout.ColRange)
        .orElse(asStr(v).map(s =>
          Layout.StrRange(s, Some(s)): Layout.ColRange))
        .orElse(for {
          lo <- asUnscaled(c, v, java.math.RoundingMode.FLOOR)
          hi <- asUnscaled(c, v, java.math.RoundingMode.CEILING)
        } yield Layout.DecRange(lo, hi, decScaleOf(c)): Layout.ColRange)
    case sources.GreaterThan(a, v) if a == c =>
      // strict integral bound tightened exactly (the extreme literal —
      // an always-false predicate — becomes an overlaps-nothing
      // range); strict STRING bounds are relaxed to inclusive
      // (file-granular skipping is inexact anyway, the residual
      // row-level filter stays strict)
      asLong(v).map(x =>
        (if (x == Long.MaxValue) Layout.LongRange(Long.MaxValue, Long.MinValue)
         else Layout.LongRange(x + 1, Long.MaxValue)): Layout.ColRange)
        .orElse(asStr(v).map(s =>
          Layout.StrRange(s, None): Layout.ColRange))
        .orElse(decLo(c, v, strict = true).map(x =>
          Layout.DecRange(x, Long.MaxValue, decScaleOf(c))
            : Layout.ColRange))
    case sources.GreaterThanOrEqual(a, v) if a == c =>
      asLong(v).map(x =>
        Layout.LongRange(x, Long.MaxValue): Layout.ColRange)
        .orElse(asStr(v).map(s =>
          Layout.StrRange(s, None): Layout.ColRange))
        .orElse(decLo(c, v, strict = false).map(x =>
          Layout.DecRange(x, Long.MaxValue, decScaleOf(c))
            : Layout.ColRange))
    case sources.LessThan(a, v) if a == c =>
      asLong(v).map(x =>
        (if (x == Long.MinValue) Layout.LongRange(Long.MaxValue, Long.MinValue)
         else Layout.LongRange(Long.MinValue, x - 1)): Layout.ColRange)
        .orElse(asStr(v).map(s =>
          Layout.StrRange("", Some(s)): Layout.ColRange))
        .orElse(decHi(c, v, strict = true).map(x =>
          Layout.DecRange(Long.MinValue, x, decScaleOf(c))
            : Layout.ColRange))
    case sources.LessThanOrEqual(a, v) if a == c =>
      asLong(v).map(x =>
        Layout.LongRange(Long.MinValue, x): Layout.ColRange)
        .orElse(asStr(v).map(s =>
          Layout.StrRange("", Some(s)): Layout.ColRange))
        .orElse(decHi(c, v, strict = false).map(x =>
          Layout.DecRange(Long.MinValue, x, decScaleOf(c))
            : Layout.ColRange))
    case _ => None
  }

  // partition-directory pruning: col -> allowed (URL-encoded) values,
  // from equality/IN predicates on the table's recorded partcols
  private var partEq: Seq[(String, Set[String])] = Nil

  override def pushFilters(filters: Array[sources.Filter])
      : Array[sources.Filter] = {
    val statsCols =
      Layout.snapshotStatsCols(SparkSession.active, path, asOf)
    val parsed = statsCols.zipWithIndex.flatMap { case (c, i) =>
      filters.toSeq.flatMap(f =>
        boundOf(c, f).map(q => (f, (i, q))))
    }
    // IS [NOT] NULL on an indexed column: served by the per-file
    // null counts (files without a recorded count are always read)
    val nullParsed = statsCols.zipWithIndex.flatMap { case (c, i) =>
      filters.toSeq.collect {
        case f @ sources.IsNull(a) if a == c => (f, (i, true))
        case f @ sources.IsNotNull(a) if a == c => (f, (i, false))
      }
    }
    nullBounds = nullParsed.map(_._2)
    val partCols =
      Layout.snapshotPartCols(SparkSession.active, path, asOf)
    def enc(v: Any) =
      java.net.URLEncoder.encode(String.valueOf(v), "UTF-8")
    val pf = filters.toSeq.flatMap {
      case f @ sources.EqualTo(c, v) if partCols.contains(c) =>
        Some((f, (c, Set(enc(v)))))
      case f @ sources.In(c, vs) if partCols.contains(c) =>
        Some((f, (c, vs.map(enc).toSet)))
      case _ => None
    }
    partEq = pf.map(_._2)
    accepted = (parsed.map(_._1) ++ nullParsed.map(_._1) ++
      pf.map(_._1)).distinct.toArray
    bounds = parsed.map(_._2)
    filters // ALL residual: file-granular skipping is inexact
  }
  override def pushedFilters(): Array[sources.Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ----- Aggregate pushdown: METADATA queries answered by the manifest.
  // count(*) is the manifest's recorded total row count; min/max of the
  // stats column are the extremes of the per-file [min, max] index —
  // both driver-side text reads, ZERO data files touched. At 100 TB
  // this turns `SELECT count(*)` from a full scan into an O(manifest)
  // lookup (Iceberg's metadata-table trick, served from our own
  // format). Pushed only when EXACT: no grouping, no pushed file-skip
  // bounds (Spark itself refuses aggregate pushdown while residual
  // filters remain, and all our filters are residual — the two rules
  // compose so a filtered count never takes this path), min/max only
  // when EVERY file carries a range for the recorded column and the
  // table is non-empty (empty → SQL NULL, which the manifest cannot
  // distinguish from refused — so refuse).
  private var aggResult: Option[(StructType, Seq[Any])] = None

  private def planAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    // a change-feed scan reads a COMMIT WINDOW, not the head image —
    // the manifest's totals answer the wrong question there
    if (agg.groupByExpressions.nonEmpty || bounds.nonEmpty ||
      nullBounds.nonEmpty ||
      options.getBoolean("readChangeFeed", false)) return None
    val spark = SparkSession.active
    val info = Layout.snapshotInfo(spark, path, asOf)
      .getOrElse(return None) // one manifest read answers everything
    // deletion sidecars (keyed or positional): count(*) stays exact
    // (the manifest's total is LOGICAL — commits subtract masked
    // rows), but per-file ranges and null counts describe PHYSICAL
    // rows a mask may have removed, so min/max/count(col) cannot be
    // answered from the index while sidecars exist
    if ((info.dv.nonEmpty || info.dvp.nonEmpty) &&
      agg.aggregateExpressions.exists {
      case _: org.apache.spark.sql.connector.expressions.aggregate
        .CountStar => false
      case _ => true
    }) return None
    val rows = info.rows
    lazy val perFile = info.statLines.map(l => Layout.statsOfFull(l)._2)
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case n: NamedReference if n.fieldNames.length == 1 =>
        Some(n.fieldNames.head)
      case _ => None
    }
    def extreme(e: org.apache.spark.sql.connector.expressions.Expression,
        pick: Seq[(Long, Long)] => Long)
        : Option[(String, DataType, Any)] =
      for {
        c <- colOf(e)
        i <- Some(info.statsCols.indexOf(c)) if i >= 0 && rows > 0
        // complete INTEGRAL-domain ranges at THIS column's position:
        // every file carries an exact range (Long, or DecRange at the
        // column's own scale), else the manifest can't answer exactly
        // (string bounds are TRUNCATED — never an exact extreme — and
        // a missing range means an unindexed or all-null file)
        dt = tableSchema(c).dataType
        ranges <- Some(perFile.map(_.lift(i).flatMap(_.range).collect {
          case Layout.LongRange(lo, hi) => (lo, hi)
          case Layout.DecRange(lo, hi, s)
              if dt.isInstanceOf[DecimalType] &&
                dt.asInstanceOf[DecimalType].scale == s => (lo, hi)
        })) if ranges.nonEmpty && ranges.forall(_.isDefined)
        // answer only for types whose index domain maps back exactly —
        // a FLOAT/DOUBLE statscol would surface a truncated extreme
        out <- dt match {
          case LongType | IntegerType | DateType | TimestampType |
            TimestampNTZType => Some(dt)
          case d: DecimalType if d.precision <= 18 => Some(d)
          case _ => None
        }
      } yield {
        val v = pick(ranges.map(_.get))
        out match {
          case IntegerType | DateType => (c, out, v.toInt)
          case d: DecimalType => (c, out,
            org.apache.spark.sql.types.Decimal
              .createUnsafe(v, d.precision, d.scale))
          case _ => (c, out, v) // LongType / TIMESTAMP micros
        }
      }
    // count(col) = rows − Σ per-file null counts: exact when EVERY
    // file records a count for the column (round-14 manifests; any
    // pre-null-count line refuses the shortcut)
    def countCol(
        e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[(String, DataType, Any)] =
      for {
        c <- colOf(e)
        i <- Some(info.statsCols.indexOf(c)) if i >= 0
        nulls <- Some(perFile.map(_.lift(i).flatMap(_.nulls)))
          if nulls.forall(_.isDefined)
      } yield (s"count($c)", LongType, rows - nulls.flatten.sum)
    val planned = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(("count(*)", LongType: DataType, rows))
      case m: Min => extreme(m.column, _.map(_._1).min)
        .map { case (c, dt, v) => (s"min($c)", dt, v) }
      case m: Max => extreme(m.column, _.map(_._2).max)
        .map { case (c, dt, v) => (s"max($c)", dt, v) }
      case cnt: Count if !cnt.isDistinct => countCol(cnt.column)
      case _ => None
    }
    if (planned.exists(_.isEmpty)) None
    else Some((
      StructType(planned.flatten.map { case (n, dt, _) =>
        StructField(n, dt, nullable = false)
      }),
      planned.flatten.map(_._3)))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = planAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    planAgg(agg) match {
      case some @ Some(_) => aggResult = some; true
      case None => false
    }

  override def build(): Scan = aggResult match {
    case Some((schema, values)) => new ManifestAggScan(schema, values)
    case None => fileScan()
  }

  private def changeFeed: Boolean =
    options.getBoolean("readChangeFeed", false)

  private def fileScan(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def description(): String =
      s"graft-snapshot:$path bounds=${bounds.mkString(",")} " +
        s"columns=${required.fieldNames.mkString(",")}" +
        (if (changeFeed) " changeFeed" else "")
    override def toBatch: Batch = if (changeFeed) new Batch {
      // BATCH change-feed window: typed changes of every commit in
      // (startingSnapshot, endingSnapshot|asOf] — the batch twin of
      // the streaming readChangeFeed mode, same per-commit planning
      // (recorded change files for merge/restore, synthesized
      // added/removed for unrecorded commits). Stats/partition pruning
      // does not apply: the window is selected by SNAPSHOT ids, not
      // predicates (which stay residual row-level as always).
      override def planInputPartitions(): Array[InputPartition] = {
        val spark = SparkSession.active
        val from =
          Option(options.get("startingSnapshot")).map(_.toInt)
            .getOrElse(0)
        val to =
          Option(options.get("endingSnapshot")).map(_.toInt)
            .getOrElse(asOf)
        require(to <= asOf,
          s"graft-snapshot: endingSnapshot $to is beyond the pinned " +
            s"snapshot $asOf")
        val physOf = Layout.snapshotInfo(spark, path, asOf)
          .map(_.colMap).getOrElse(Map.empty)
        Layout.changeFeedPlan(spark, path, from, to)
          .map { case (f, op) =>
            // recorded change files (op None) carry their own written
            // names; synthesized data-file reads use the mapping
            SnapshotFilePartition(f, op.orNull,
              physOf = if (op.isEmpty) Map.empty else physOf)
              : InputPartition
          }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new SnapshotFileReaderFactory(required,
          SnapshotHadoopConf.broadcast())
    } else new Batch {
      override def planInputPartitions(): Array[InputPartition] = {
        val spark = SparkSession.active
        // a file with no `col=value` segment for a filtered column is
        // kept (an unpartitioned writer's file — conservative)
        def partKeep(rel: String): Boolean = {
          lazy val segs = rel.split('/').dropRight(1).flatMap { s =>
            val i = s.indexOf('=')
            if (i > 0) Some(s.take(i) -> s.drop(i + 1)) else None
          }.toMap
          partEq.forall { case (c, allowed) =>
            segs.get(c).forall(allowed.contains) }
        }
        val dvByRel = Layout.snapshotDvPaths(spark, path, asOf)
        val dvpByRel = Layout.snapshotDvpPaths(spark, path, asOf)
        val physOf = Layout.snapshotInfo(spark, path, asOf)
          .map(_.colMap).getOrElse(Map.empty)
        Layout.snapshotFileStats(spark, path, asOf)
          .filter { case (_, rel, stats) =>
            partKeep(rel) &&
            bounds.forall { case (i, q) =>
              stats.lift(i).flatMap(_.range).forall(r =>
                Layout.ColRange.overlaps(r, q))
              // no recorded range for this column = always read
            } &&
            nullBounds.forall { case (i, wantNull) =>
              val s = stats.lift(i)
              if (wantNull)
                // IS NULL: skip files PROVEN null-free
                !s.exists(_.nulls.contains(0L))
              else
                // IS NOT NULL: skip files PROVEN all-null (range
                // None + nulls > 0, the statLine writer invariant)
                !s.exists(st => st.range.isEmpty &&
                  st.nulls.exists(_ > 0L))
            }
          }
          .map(e => SnapshotFilePartition(e._1,
            dvFiles = dvByRel.getOrElse(e._2, Nil), physOf = physOf,
            dvpFiles = dvpByRel.getOrElse(e._2, Nil))
            : InputPartition).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new SnapshotFileReaderFactory(required,
          SnapshotHadoopConf.broadcast())
    }
    override def toMicroBatchStream(
        checkpointLocation: String): rstreaming.MicroBatchStream =
      new SnapshotMicroBatchStream(path, required,
        Option(options.get("startingSnapshot")).map(_.toInt).getOrElse(0),
        math.max(1, Option(options.get("maxSnapshotsPerTrigger"))
          .map(_.toInt).getOrElse(1)),
        options.getBoolean("readChangeFeed", false))
  }
}

/** The one-row scan serving a completely-pushed aggregate from
  * manifest metadata — its single partition carries the already-
  * computed values (Longs/Ints), so the "query" ships no work at all. */
final class ManifestAggScan(aggSchema: StructType, values: Seq[Any])
    extends MetaRowsScan(aggSchema, Seq(values),
      s"graft-snapshot manifest-aggregate " +
        aggSchema.fieldNames.mkString(","))

/** Driver-computed rows served as a scan — the metadata-table shape
  * (history/files) and the pushed-aggregate's one-row case: all
  * values are precomputed InternalRow-ready atoms (Long/Int/
  * UTF8String/null), the single partition just replays them. */
sealed class MetaRowsScan(rowSchema: StructType,
    rows: Seq[Seq[Any]], desc: String) extends Scan {
  override def readSchema(): StructType = rowSchema
  override def description(): String = desc
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(MetaRowsPartition(rows))
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(
            p: InputPartition): PartitionReader[InternalRow] =
          new PartitionReader[InternalRow] {
            private val it =
              p.asInstanceOf[MetaRowsPartition].rows.iterator
            private var cur: InternalRow = _
            override def next(): Boolean =
              if (!it.hasNext) false
              else { cur = new GenericInternalRow(it.next().toArray)
                true }
            override def get(): InternalRow = cur
            override def close(): Unit = ()
          }
      }
  }
}

final case class MetaRowsPartition(rows: Seq[Seq[Any]])
    extends InputPartition

/** The stream offset IS the snapshot id — the manifest sequence is the
  * log, so offset arithmetic and time travel share one number line. */
final case class SnapshotOffset(id: Int) extends rstreaming.Offset {
  override def json(): String = id.toString
}

final class SnapshotMicroBatchStream(path: String, schema: StructType,
    startingSnapshot: Int, maxPerTrigger: Int,
    changeFeed: Boolean = false)
    extends rstreaming.MicroBatchStream
    with rstreaming.SupportsAdmissionControl {

  private def spark = SparkSession.active

  override def initialOffset(): rstreaming.Offset =
    SnapshotOffset(startingSnapshot)

  // Admission control caps each micro-batch at `maxPerTrigger` snapshot
  // TRANSITIONS, so one trigger never flattens several commits into an
  // indistinguishable blob (and processAllAvailable() still drains to
  // the head, one commit-window at a time).
  override def getDefaultReadLimit: rstreaming.ReadLimit =
    rstreaming.ReadLimit.allAvailable()
  override def latestOffset(start: rstreaming.Offset,
      limit: rstreaming.ReadLimit): rstreaming.Offset = {
    val s = start.asInstanceOf[SnapshotOffset].id
    SnapshotOffset(math.min(Layout.headId(spark, path),
      s.toLong + maxPerTrigger).toInt)
  }
  override def reportLatestOffset(): rstreaming.Offset =
    SnapshotOffset(Layout.headId(spark, path))
  override def latestOffset(): rstreaming.Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: rstreaming.Offset,
      end: rstreaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].id
    val e = end.asInstanceOf[SnapshotOffset].id
    if (e <= s) Array.empty
    else {
      // MID-STREAM schema evolution (round 14): a stream's output
      // schema is fixed at start, so a RENAME/DROP of a column it
      // emits cannot be surfaced in-flight — resolving the old
      // logical name against files storing physical names would
      // silently null-fill from here on. Fail LOUDLY with a restart
      // instruction instead. Checked against the HEAD schema, not
      // the window's end snapshot: replaying history legitimately
      // crosses snapshots that PREDATE later-added columns (those
      // null-fill — the append-evolution contract) and snapshots
      // that predate a rename (the head's column mapping resolves
      // current names to their stable physical names for files of
      // every vintage). ADD COLUMN stays transparent: the stream
      // simply doesn't emit the new column until restarted.
      val headInfo = Layout.snapshotInfo(spark, path)
      val logicalNow = headInfo.flatMap(_.schema)
        .map(_.fieldNames.toSet).getOrElse(Set.empty[String])
      val missing = schema.fieldNames
        .filterNot(n => n == "_op" || n == "_file")
        .filterNot(logicalNow.contains)
      if (missing.nonEmpty) throw new IllegalStateException(
        s"graft-snapshot stream at $path: column(s) " +
          s"${missing.mkString(", ")} no longer exist in the " +
          "table's logical schema — renamed or dropped mid-stream. " +
          "Restart the query to resume from its checkpoint under " +
          "the new schema; emitted batches up to this point used " +
          "the old names.")
      val physOf = headInfo.map(_.colMap).getOrElse(Map.empty)
      if (changeFeed)
        // per-commit plan: recorded change files (own _op column) for
        // merge/restore commits, new data files with synthesized
        // op='added' for appends
        Layout.changeFeedPlan(spark, path, s, e).map { case (f, op) =>
          SnapshotFilePartition(f, op.orNull,
            physOf = if (op.isEmpty) Map.empty else physOf)
            : InputPartition
        }.toArray
      else {
        // the END snapshot's deletion sidecars apply to the streamed
        // files (matching the batch twin readSnapshotChanges): a fresh
        // file that gained a delete sidecar inside the same window
        // must not stream rows the equivalent batch read masks
        val dvByRel = Layout.snapshotDvPaths(spark, path, e)
        val dvpByRel = Layout.snapshotDvpPaths(spark, path, e)
        Layout.changedFilePaths(spark, path, s, e)
          .map { case (abs, rel) =>
            SnapshotFilePartition(abs,
              dvFiles = dvByRel.getOrElse(rel, Nil),
              physOf = physOf,
              dvpFiles = dvpByRel.getOrElse(rel, Nil)): InputPartition
          }.toArray
      }
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotFileReaderFactory(schema, SnapshotHadoopConf.broadcast())
  override def deserializeOffset(json: String): rstreaming.Offset =
    SnapshotOffset(json.toInt)
  override def commit(end: rstreaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One data (or recorded-change) file to read. `op` (change-feed
  * batches only): the constant `_op` to synthesize for every row —
  * null when the file carries its own `_op` column or the scan is a
  * plain table read. `dvFiles`: ABSOLUTE paths of the file's deletion
  * sidecars (merge-on-read) — the reader drops rows whose key appears
  * in any of them. */
final case class SnapshotFilePartition(file: String, op: String = null,
    dvFiles: Seq[String] = Nil,
    physOf: Map[String, String] = Map.empty,
    dvpFiles: Seq[String] = Nil)
    extends InputPartition

object SnapshotFileReaderFactory {
  /** Is `dt` a column type the snapshot reader/writer pair carries?
    * Atomic types only; DECIMAL up to precision 18 (the INT64
    * unscaled rendering — also what the data-skipping index stores,
    * Layout.DecRange); DATE as INT32 epoch days; TIMESTAMP (both
    * LTZ and NTZ) as INT64 TIMESTAMP_MICROS. */
  private[sources] def supports(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType |
      BooleanType | StringType | DateType | TimestampType |
      TimestampNTZType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }
  def validate(schema: StructType): Unit = schema.fields.foreach { f =>
    require(supports(f.dataType),
      s"graft-snapshot: unsupported column type ${f.dataType.sql} for " +
        s"'${f.name}' (supported: BIGINT, INT, DOUBLE, FLOAT, " +
        "BOOLEAN, STRING, DATE, TIMESTAMP, TIMESTAMP_NTZ, " +
        "DECIMAL(<=18, s))")
  }
}

/** One reader per committed data file (executor-side): parquet-hadoop's
  * Group API decoded straight into InternalRow against the (possibly
  * column-pruned) schema. The read is PROJECTED to the required columns
  * by intersecting the file's own parquet schema with the wanted names
  * (one footer open — also how files predating an evolved column stay
  * readable: the projection simply omits what the file lacks and the
  * decode null-fills it). A zero-column read (count(*) pushdown shape)
  * projects to the file's narrowest-to-hand first column and emits
  * empty rows, so row counts survive full pruning. Field positions are
  * resolved once from the first record's (projected) schema, then
  * reused for every row. */
final class SnapshotFileReaderFactory(schema: StructType,
    hadoopConf: org.apache.spark.broadcast
      .Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {

  /** Load the union of the sidecars' masked keys (single column;
    * integrals boxed as Long, strings as String) — bounded by the
    * masked-row count, loaded once per reader task. Returns the key
    * column's NAME (recorded as the sidecar's field name) + the set. */
  private def loadDvKeys(paths: Seq[String],
      conf: org.apache.hadoop.conf.Configuration)
      : (String, java.util.HashSet[Any]) = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val set = new java.util.HashSet[Any]()
    var keyName: String = null
    paths.foreach { p =>
      val r = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(p))
        .withConf(conf).build()
      try {
        var g = r.read()
        while (g != null) {
          if (keyName == null) keyName = g.getType.getFieldName(0)
          if (g.getFieldRepetitionCount(0) > 0) {
            g.getType.getType(0).asPrimitiveType()
              .getPrimitiveTypeName match {
              case INT64 => set.add(g.getLong(0, 0))
              case INT32 => set.add(g.getInteger(0, 0).toLong)
              case _ => set.add(new String(
                g.getBinary(0, 0).getBytes, "UTF-8"))
            }
          }
          g = r.read()
        }
      } finally r.close()
    }
    (keyName, set)
  }

  /** Load THIS file's masked physical row ordinals from positional
    * sidecars — rows are (`__gf_fb` basename, `__gf_pos` ordinal)
    * pairs, filtered to the partition's own file. Bounded by the
    * masked-row count, loaded once per reader task. */
  private def loadDvPositions(paths: Seq[String], fileBase: String,
      conf: org.apache.hadoop.conf.Configuration)
      : java.util.HashSet[Long] = {
    val set = new java.util.HashSet[Long]()
    paths.foreach { p =>
      val r = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(p))
        .withConf(conf).build()
      try {
        var g = r.read()
        while (g != null) {
          val fbIdx = g.getType.getFieldIndex("__gf_fb")
          val posIdx = g.getType.getFieldIndex("__gf_pos")
          if (g.getFieldRepetitionCount(fbIdx) > 0 &&
              g.getFieldRepetitionCount(posIdx) > 0 &&
              new String(g.getBinary(fbIdx, 0).getBytes,
                "UTF-8") == fileBase)
            set.add(g.getLong(posIdx, 0))
          g = r.read()
        }
      } finally r.close()
    }
    set
  }

  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[SnapshotFilePartition].file
    val opConst = p.asInstanceOf[SnapshotFilePartition].op
    val dvPaths = p.asInstanceOf[SnapshotFilePartition].dvFiles
    val dvpPaths = p.asInstanceOf[SnapshotFilePartition].dvpFiles
    // column mapping: files store PHYSICAL names; `schema` speaks the
    // current LOGICAL names — all file-side lookups go through physOf
    val physOf = p.asInstanceOf[SnapshotFilePartition].physOf
    def phys(c: String): String = physOf.getOrElse(c, c)
    // per-reader COPY: PARQUET_READ_SCHEMA is set below, and the
    // broadcast value is shared by every task on the executor
    val conf =
      new org.apache.hadoop.conf.Configuration(hadoopConf.value.value)
    val (dvKeyName, dvKeys) =
      if (dvPaths.isEmpty) (null: String, null: java.util.HashSet[Any])
      else loadDvKeys(dvPaths, conf)
    val dvPositions =
      if (dvpPaths.isEmpty) null
      else loadDvPositions(dvpPaths,
        file.substring(file.lastIndexOf('/') + 1), conf)
    val hPath = new org.apache.hadoop.fs.Path(file)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(hPath, conf))
    val fileSchema =
      try footer.getFileMetaData.getSchema finally footer.close()
    // `_file` is the synthesized group-identity METADATA column (the
    // row-level-operation protocol keys on it) — never read from
    // parquet, filled with this partition's absolute path. The mask
    // key column (already physical — sidecars store physical names)
    // is FORCED into the projection (column pruning may have dropped
    // it) so sidecar filtering can evaluate.
    val wanted = (schema.fieldNames.toSet - "_file").map(phys) ++
      Option(dvKeyName).toSet
    val kept = fileSchema.getFields.asScala.filter(f => wanted(f.getName))
    val projected = new org.apache.parquet.schema.MessageType(
      fileSchema.getName,
      (if (kept.nonEmpty) kept
       else fileSchema.getFields.asScala.take(1)).asJava)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport
      .PARQUET_READ_SCHEMA, projected.toString)
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        hPath)
      .withConf(conf).build()
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      private var idx: Array[Int] = _
      private var dvIdx = -2 // -2 = unresolved, -1 = file lacks the key

      /** Is this row masked by a deletion sidecar? */
      private def masked(g: org.apache.parquet.example.data.Group)
          : Boolean = {
        if (dvKeys == null) return false
        if (dvIdx == -2)
          dvIdx = if (g.getType.containsField(dvKeyName))
            g.getType.getFieldIndex(dvKeyName) else -1
        if (dvIdx < 0 || g.getFieldRepetitionCount(dvIdx) == 0)
          return false // a null/absent key is never masked
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        val v: Any = g.getType.getType(dvIdx).asPrimitiveType()
          .getPrimitiveTypeName match {
          case INT64 => g.getLong(dvIdx, 0)
          case INT32 => g.getInteger(dvIdx, 0).toLong
          case _ => new String(g.getBinary(dvIdx, 0).getBytes, "UTF-8")
        }
        dvKeys.contains(v)
      }

      private var prim:
        Array[org.apache.parquet.schema.PrimitiveType] = _
      // PHYSICAL row ordinal of the record about to be read — counts
      // every record (including keyed-mask drops), matching the
      // `_metadata.row_index` domain the positional sidecars store
      private var ordinal = -1L
      private def posMasked: Boolean =
        dvPositions != null && dvPositions.contains(ordinal)
      override def next(): Boolean = {
        var g = reader.read()
        ordinal += 1
        while (g != null && (posMasked || masked(g))) {
          g = reader.read(); ordinal += 1
        }
        if (g == null) false
        else {
          if (idx == null) {
            // -1 = the file PREDATES this column (append-time schema
            // evolution): null-fill, matching Layout.readSnapshot's
            // recorded-union-schema read; -2 = the `_file` metadata
            // column, synthesized from the partition's path; -3 = a
            // change-feed `_op` the file doesn't carry, synthesized
            // from the partition's constant (an append batch).
            // Lookups use the PHYSICAL name (column mapping).
            idx = schema.fields.map(f =>
              if (f.name == "_file") -2
              else if (f.name == "_op" && opConst != null &&
                  !g.getType.containsField(phys(f.name))) -3
              else if (g.getType.containsField(phys(f.name)))
                g.getType.getFieldIndex(phys(f.name))
              else -1)
            // the file's own primitive TYPE per field — TYPE WIDENING
            // (int32 file read as BIGINT, float as DOUBLE) upcasts at
            // decode, so ALTER COLUMN TYPE is metadata-only; the
            // logical annotation disambiguates timestamp units and
            // decimal physicals
            prim = idx.map(i =>
              if (i < 0) null
              else g.getType.getType(i).asPrimitiveType())
          }
          val vals = new Array[Any](schema.length)
          var i = 0
          while (i < schema.length) {
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
            import org.apache.parquet.schema.LogicalTypeAnnotation
            def tn = prim(i).getPrimitiveTypeName
            vals(i) =
              if (idx(i) == -2) UTF8String.fromString(file)
              else if (idx(i) == -3) UTF8String.fromString(opConst)
              else if (idx(i) < 0 ||
                  g.getFieldRepetitionCount(idx(i)) == 0)
                null
              else schema.fields(i).dataType match {
                case LongType if tn == INT32 =>
                  g.getInteger(idx(i), 0).toLong
                case LongType => g.getLong(idx(i), 0)
                case IntegerType => g.getInteger(idx(i), 0)
                case DoubleType if tn == FLOAT =>
                  g.getFloat(idx(i), 0).toDouble
                case DoubleType => g.getDouble(idx(i), 0)
                case FloatType => g.getFloat(idx(i), 0)
                case BooleanType => g.getBoolean(idx(i), 0)
                case StringType =>
                  UTF8String.fromBytes(g.getBinary(idx(i), 0).getBytes)
                case DateType => g.getInteger(idx(i), 0) // epoch days
                case TimestampType | TimestampNTZType =>
                  // INT64 in the annotation's unit, normalized to the
                  // MICROS InternalRow domain; legacy INT96 has no
                  // stats and no sane decode path — refuse by name
                  require(tn == INT64,
                    s"graft-snapshot: '${schema.fields(i).name}' is " +
                      s"a legacy $tn timestamp in $file — rewrite " +
                      "with spark.sql.parquet.outputTimestampType=" +
                      "TIMESTAMP_MICROS")
                  val unit = prim(i).getLogicalTypeAnnotation match {
                    case t: LogicalTypeAnnotation
                        .TimestampLogicalTypeAnnotation => t.getUnit
                    case _ => LogicalTypeAnnotation.TimeUnit.MICROS
                  }
                  val v = g.getLong(idx(i), 0)
                  unit match {
                    case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                      Math.multiplyExact(v, 1000L)
                    case LogicalTypeAnnotation.TimeUnit.NANOS =>
                      Math.floorDiv(v, 1000L)
                    case _ => v
                  }
                case d: DecimalType => tn match {
                  case INT32 => org.apache.spark.sql.types.Decimal
                    .createUnsafe(g.getInteger(idx(i), 0).toLong,
                      d.precision, d.scale)
                  case INT64 => org.apache.spark.sql.types.Decimal
                    .createUnsafe(g.getLong(idx(i), 0),
                      d.precision, d.scale)
                  case _ => // FLBA/BINARY: big-endian two's complement
                    val bi = new java.math.BigInteger(
                      g.getBinary(idx(i), 0).getBytes)
                    org.apache.spark.sql.types.Decimal(
                      new java.math.BigDecimal(bi, d.scale),
                      d.precision, d.scale)
                }
                case other => throw new IllegalStateException(
                  s"unreachable: $other passed validate()")
              }
            i += 1
          }
          cur = new GenericInternalRow(vals)
          true
        }
      }
      override def get(): InternalRow = cur
      override def close(): Unit = reader.close()
    }
  }
}

// ----- Write path: the DSv2 snapshot SINK --------------------------------
//
// `df.write.format("graft-snapshot")` (append, or overwrite via
// TRUNCATE) and `writeStream.format("graft-snapshot")` commit through
// the SAME optimistic manifest protocol as Layout's API
// ([[graft.ops.Layout.commitStagedLines]]): executors stage immutable
// parquet files DIRECTLY under data/ (unreferenced until a manifest
// wins — the crash contract: a dead task leaves an orphan for vacuum,
// never a torn table), each task's commit message carries its manifest
// file line (name, row count, optional min/max of `statsCol` — so the
// data-skipping index is populated from values the writer already saw,
// zero extra footer reads), and the DRIVER commit assembles one
// manifest per job/epoch. Streaming commits tag the manifest with
// (queryId, epochId), making epoch replay after a restart IDEMPOTENT —
// the same ledger rule as the K1 topic sink, expressed as manifest
// metadata. Options: `statsCol` records the per-file range index;
// `tag` (batch) makes a batch write idempotent under the caller's key.
final class SnapshotWriteBuilder(path: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
    declaredPartCols: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var replaceAll = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    replaceAll = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new SnapshotWrite(path, info.schema(), info.queryId(),
      info.options(), replaceAll, declaredPartCols)
}

final class SnapshotWrite(path: String, writeSchema: StructType,
    queryId: String, options: CaseInsensitiveStringMap,
    truncate: Boolean, declaredPartCols: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write
      .RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.write._

  SnapshotFileReaderFactory.validate(writeSchema)

  // Hive-style partition layout: declared (partitionBy / catalog
  // PARTITIONED BY) wins; otherwise the table's recorded layout is
  // sticky so plain appends keep following it. Partition values
  // become path segments, so floats (lossy text) are rejected.
  private val partCols: Seq[String] =
    if (declaredPartCols.nonEmpty) declaredPartCols
    else Layout.snapshotPartCols(SparkSession.active, path)
  partCols.foreach { c =>
    require(writeSchema.fieldNames.contains(c),
      s"graft-snapshot write: partition column '$c' is not a " +
        "written column")
    writeSchema(c).dataType match {
      // DATE partitions (round 14): values render as ISO strings
      // ('d=2020-01-01/') — the standard daily layout; floats stay
      // rejected (lossy text)
      case LongType | IntegerType | StringType | BooleanType |
        DateType => ()
      case dt => throw new IllegalArgumentException(
        s"graft-snapshot write: partition column '$c' has " +
          s"non-partitionable type ${dt.sql}")
    }
  }

  private val statsCol = Option(options.get("statsCol"))
  private def statsColList: Seq[String] =
    statsCol.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  // The table requests its own write GEOMETRY (round 13 — no more
  // /*+ REPARTITION */ hints in SQL INSERTs):
  //  - partitioned: cluster by the partition values so each value
  //    lands in ONE task → one file per (task, value);
  //  - stats-indexed (unpartitioned): a GLOBAL ORDER on the indexed
  //    columns → Spark range-partitions + sorts, so files carry
  //    DISJOINT [min, max] ranges and the data-skipping index prunes
  //    pure-SQL inserts exactly like the Layout API's range writes.
  // Not strictly required: AQE may coalesce the shuffle, so a small
  // INSERT lands as one file instead of |shuffle.partitions| shards.
  // Within-task ordering covers both (partition value, then stats).
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution = {
    import org.apache.spark.sql.connector.distributions.Distributions
    if (partCols.nonEmpty)
      Distributions.clustered(partCols.map(c =>
        org.apache.spark.sql.connector.expressions.Expressions
          .column(c): org.apache.spark.sql.connector.expressions
          .Expression).toArray)
    else if (statsColList.nonEmpty)
      Distributions.ordered(sortOrders(statsColList))
    else Distributions.unspecified()
  }
  override def distributionStrictlyRequired(): Boolean = false
  private def sortOrders(cols: Seq[String])
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    cols.map { c =>
      org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions
          .column(c),
        org.apache.spark.sql.connector.expressions.SortDirection
          .ASCENDING)
        : org.apache.spark.sql.connector.expressions.SortOrder
    }.toArray
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    sortOrders((partCols ++ statsColList).distinct)
  // statsCol accepts a comma list ("c1,c2"): each indexed column must
  // be a written integral, temporal, decimal or string column
  // (strings record truncated code-point-ordered bounds; temporals
  // ride the integral lane as epoch days/micros; decimals as scaled
  // unscaled longs — Layout.ColRange)
  statsCol.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    .foreach { c =>
      require(writeSchema.fieldNames.contains(c),
        s"graft-snapshot write: statsCol '$c' is not a written column")
      val ok = writeSchema(c).dataType match {
        case LongType | IntegerType | StringType | DateType |
          TimestampType | TimestampNTZType => true
        case d: DecimalType => d.precision <= 18
        case _ => false
      }
      require(ok,
        s"graft-snapshot write: statsCol '$c' must be integral, " +
          s"date/timestamp, decimal(<=18) or string, is " +
          s"${writeSchema(c).dataType.sql}")
    }
  private val batchTag = Option(options.get("tag"))
  // column mapping: new files write the PHYSICAL names the table's
  // manifest records (stable across renames)
  private val tablePhys: Map[String, String] =
    Layout.snapshotInfo(SparkSession.active, path)
      .map(_.colMap).getOrElse(Map.empty)

  // Executors stage into a write-private `.stage-<tok>/` dir, NEVER
  // into data/: files appear under data/ only inside the driver commit
  // (rename per file, a metadata op), and the publish step — renames
  // plus manifest claim — runs under the table's commit lock, which a
  // same-JVM vacuum also takes, so maintenance beside a streaming sink
  // can never interleave between an epoch's renames and its manifest.
  // Cross-process, vacuum's modification-time grace period narrows
  // (not closes) that window — the Delta retention trade-off. A crash
  // leaves a hidden stage dir beside the table (same as Layout's own
  // staging); vacuum sweeps `.stage-*` dirs past the grace age.
  private def fsOf() = {
    val root = new org.apache.hadoop.fs.Path(path)
    (root.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf()), root)
  }

  private def prepareStageDir(tok: String): String = {
    val (fs, root) = fsOf()
    val stage = new org.apache.hadoop.fs.Path(root, s".stage-$tok")
    fs.mkdirs(stage)
    fs.makeQualified(stage).toString
  }

  private def deleteStaged(tok: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val (fs, root) = fsOf()
    val stage = new org.apache.hadoop.fs.Path(root, s".stage-$tok")
    messages.collect { case m: SnapshotFileCommit => m }
      .flatMap(_.lines).map(_.split('|').head)
      .foreach(n => fs.delete(
        new org.apache.hadoop.fs.Path(stage, n), false))
  }

  private def commitLines(tok: String,
      messages: Array[WriterCommitMessage], tag: String): Unit = {
    val (fs, root) = fsOf()
    val stage = new org.apache.hadoop.fs.Path(root, s".stage-$tok")
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    fs.mkdirs(dataDir)
    val msgs = messages.collect { case m: SnapshotFileCommit => m }
    // publish: move each task's staged file under data/ (names carry
    // the write token + epoch + partition — unique; partitioned
    // writes carry their `col=value/` subpath, created on demand),
    // THEN commit the manifest; a crash between the two leaves
    // orphans, never a torn table (the snapshotWrite contract). The
    // whole step holds the table's commit lock so a same-JVM vacuum
    // can't sweep the just-renamed, not-yet-referenced files.
    Layout.withTableLock(SparkSession.active, path) {
      msgs.flatMap(_.lines).map(_.split('|').head).foreach { n =>
        val dest = new org.apache.hadoop.fs.Path(dataDir, n)
        fs.mkdirs(dest.getParent)
        // a failed publish rename must abort BEFORE the manifest
        // claim — committing would reference a file that never arrived
        Layout.renameOrAbort(fs,
          new org.apache.hadoop.fs.Path(stage, n), dest)
      }
      Layout.commitStagedLines(SparkSession.active, path,
        msgs.flatMap(_.lines).sorted.toSeq, msgs.map(_.rows).sum,
        writeSchema, tag, carryPrevious = !truncate,
        statsCol.orNull, expectedBase = -1, tok = tok,
        partCols = partCols)
    }
    ()
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val tok = java.util.UUID.randomUUID().toString.take(8)
    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DataWriterFactory = {
      // registered for the write's whole flight so a same-JVM vacuum
      // (even graceMs = 0) never sweeps its staged/just-renamed files
      Layout.registerTok(tok)
      SnapshotWriterFactory(prepareStageDir(tok), writeSchema,
        statsCol, partCols, tok, SnapshotHadoopConf.broadcast(),
        tablePhys)
    }
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      try {
        commitLines(tok, messages, batchTag.orNull)
        val (fs, root) = fsOf()
        fs.delete(new org.apache.hadoop.fs.Path(root, s".stage-$tok"),
          true)
      } finally Layout.releaseTok(tok)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      try {
        val (fs, root) = fsOf()
        fs.delete(new org.apache.hadoop.fs.Path(root, s".stage-$tok"),
          true)
      } finally Layout.releaseTok(tok)
  }

  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      private val tok = java.util.UUID.randomUUID().toString.take(8)
      override def createStreamingWriterFactory(
          info: PhysicalWriteInfo): org.apache.spark.sql.connector
          .write.streaming.StreamingDataWriterFactory = {
        // held for the query's lifetime (epochs share the stage dir)
        // and RELEASED when the query terminates (a query-scoped
        // StreamingQueryListener) — without the release a stopped
        // query's token would pin its replayed-epoch stage orphans
        // against vacuum for the JVM's lifetime
        StreamingTokRegistry.register(queryId, tok)
        SnapshotWriterFactory(prepareStageDir(tok), writeSchema,
          statsCol, partCols, tok, SnapshotHadoopConf.broadcast(),
          tablePhys)
      }
      // epoch replay after a restart re-stages files but the tagged
      // manifest short-circuits: exactly one commit per (query, epoch),
      // replayed stages become vacuum-able orphans. The stage dir is
      // shared across a query's sequential epochs (file names carry
      // the epoch id), so per-epoch abort deletes only its own files.
      override def commit(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit =
        commitLines(tok, messages, s"sink-$queryId-e$epochId")
      override def abort(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit =
        deleteStaged(tok, messages)
    }
}

/** Write tokens held by LIVE streaming queries, released on query
  * termination: a token spares the query's stage dir and just-staged
  * files from vacuum ([[graft.ops.Layout.registerTok]]); the streaming
  * sink has no per-query close hook, so a session-wide
  * [[org.apache.spark.sql.streaming.StreamingQueryListener]] (added
  * once per session, on the first streaming write) releases every
  * token registered under the terminated query's id — after which the
  * query's replayed-epoch stage orphans become vacuum-able, honoring
  * the maintenance-loop contract. Keyed by the
  * [[org.apache.spark.sql.connector.write.LogicalWriteInfo]] queryId;
  * the listener clears both the event's id and runId forms so either
  * identity convention releases.
  *
  * The listener attaches to the shared SPARKCONTEXT bus (termination
  * events are `SparkListenerEvent`s posted there), NOT to a
  * session-level `streams.addListener`: the write is planned on the
  * stream-execution thread whose active session is the runner's
  * CLONE, and a clone's StreamingQueryListenerBus filters out events
  * of queries it didn't start — a session-level listener registered
  * from here would never fire. */
private[sources] object StreamingTokRegistry {
  private val toks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Set[String]]()
  private val listening = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.SparkContext, java.lang.Boolean]())

  def register(queryId: String, tok: String): Unit = {
    Layout.registerTok(tok)
    toks.computeIfAbsent(queryId,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
      .add(tok)
    val sc = SparkSession.active.sparkContext
    if (listening.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onOtherEvent(
            event: org.apache.spark.scheduler.SparkListenerEvent)
            : Unit = event match {
          case e: org.apache.spark.sql.streaming
              .StreamingQueryListener.QueryTerminatedEvent =>
            Seq(e.id.toString, e.runId.toString).foreach { k =>
              Option(toks.remove(k))
                .foreach(_.forEach(t => Layout.releaseTok(t)))
            }
          case _ => ()
        }
      })
  }

  /** Is any token still held under this query id? (test seam) */
  private[graft] def live(queryId: String): Boolean =
    toks.containsKey(queryId)
}

/** Hadoop configuration shipped executor-side — a bare
  * `new Configuration()` on an executor would drop every spark.hadoop.*
  * setting (credentials, endpoints, defaultFS) and only work on a
  * local filesystem. Serialized via Hadoop's own Writable form and
  * BROADCAST once per scan/write (Spark's SerializableConfiguration
  * idiom): the resolved configuration is hundreds of entries, and
  * embedding a copy in every task's serialized factory is measurable
  * per-task overhead on wide scans — a broadcast ships it to each
  * executor once. */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object SnapshotHadoopConf {
  /** One broadcast of the session's resolved Hadoop conf — create per
    * scan/write on the DRIVER, hand the handle to factories. */
  def broadcast(): org.apache.spark.broadcast
      .Broadcast[SerializableHadoopConf] = {
    val spark = SparkSession.active
    spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
  }
}

final case class SnapshotFileCommit(lines: Seq[String], rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final case class SnapshotWriterFactory(stageDir: String,
    schema: StructType, statsCol: Option[String],
    partCols: Seq[String], tok: String,
    hadoopConf: org.apache.spark.broadcast
      .Broadcast[SerializableHadoopConf],
    physOf: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.write.DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SnapshotDataWriter(stageDir, schema, statsCol, partCols,
      s"$tok-p$partitionId-t$taskId", hadoopConf, physOf)
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SnapshotDataWriter(stageDir, schema, statsCol, partCols,
      s"$tok-e$epochId-p$partitionId-t$taskId", hadoopConf, physOf)
}

object SnapshotParquet {
  /** The parquet MessageType for a (validated, atomic-typed) write
    * schema — all fields optional, strings UTF8-annotated, mirroring
    * what the Group-API reader decodes. `physOf` renames fields to
    * their PHYSICAL column names (column mapping): writes are
    * index-based, so only the declared names change. */
  def messageType(schema: StructType,
      physOf: Map[String, String] = Map.empty)
      : org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val nm = physOf.getOrElse(f.name, f.name)
      f.dataType match {
        case LongType => b.addField(Types.optional(INT64).named(nm))
        case IntegerType =>
          b.addField(Types.optional(INT32).named(nm))
        case DoubleType =>
          b.addField(Types.optional(DOUBLE).named(nm))
        case FloatType => b.addField(Types.optional(FLOAT).named(nm))
        case BooleanType =>
          b.addField(Types.optional(BOOLEAN).named(nm))
        case StringType => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(nm))
        case DateType => b.addField(Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType()).named(nm))
        case TimestampType => b.addField(Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(nm))
        case TimestampNTZType => b.addField(Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(nm))
        case d: DecimalType => // validate() caps precision at 18
          b.addField(Types.optional(INT64)
            .as(LogicalTypeAnnotation.decimalType(d.scale,
              d.precision)).named(nm))
        case other => throw new IllegalStateException(
          s"unreachable: $other passed validate()")
      }
    }
    b.named("graft_snapshot")
  }
}

/** One parquet file per non-empty task (executor-side), written with
  * the Group API straight from InternalRow. The writer is LAZY — an
  * empty partition stages nothing and commits an empty message — and
  * tracks the min/max of `statsCol` over the rows it writes, so the
  * manifest's data-skipping index costs nothing beyond values already
  * in hand. A null in `statsCol` drops the file's range (rangeless =
  * always read — skipping must never change answers). */
final class SnapshotDataWriter(stageDir: String, schema: StructType,
    statsCol: Option[String], partCols: Seq[String], suffix: String,
    hadoopConf: org.apache.spark.broadcast
      .Broadcast[SerializableHadoopConf],
    physOf: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val conf =
    new org.apache.hadoop.conf.Configuration(hadoopConf.value.value)
  private val msgType = SnapshotParquet.messageType(schema, physOf)
  private val groups =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)
  // per indexed column (statsCol is a comma list), in order
  private val statsIdx = statsCol.toSeq.flatMap(_.split(','))
    .map(_.trim).filter(_.nonEmpty).map(schema.fieldIndex).toArray
  private val partIdx = partCols.map(schema.fieldIndex).toArray

  /** One open parquet file (plus its running stats) — a task writes
    * one per partition-value directory it encounters; an
    * unpartitioned write has exactly one with an empty dir. The
    * writer opens lazily, so an empty task stages nothing. */
  private final class FileState(val relName: String) {
    val hPath = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(stageDir), relName)
    val writer: org.apache.parquet.hadoop.ParquetWriter[
      org.apache.parquet.example.data.Group] =
      org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
          .fromPath(hPath, conf))
        .withType(msgType).withConf(conf).build()
    var rows = 0L
    val lo = Array.fill(statsIdx.length)(Long.MaxValue)
    val hi = Array.fill(statsIdx.length)(Long.MinValue)
    // string columns: min/max tracked as UTF8String (byte comparison
    // = the code-point order the stored bounds use); values are
    // CLONED on update because Spark reuses row buffers
    val sLo = new Array[UTF8String](statsIdx.length)
    val sHi = new Array[UTF8String](statsIdx.length)
    val nullCnt = Array.fill(statsIdx.length)(0L)
    // one field pair (+ null count) per indexed column, positions
    // aligned with the statscols order: the range covers NON-NULL
    // values (integrals/temporals/decimal-unscaled in the Long lane,
    // strings truncated); a column whose every value was null renders
    // as an empty pair + the count — the all-null proof the reader
    // invariant relies on (Layout.statLine)
    def line: String =
      if (statsIdx.isEmpty || rows == 0) relName
      else graft.ops.Layout.statLineFull(relName,
        statsIdx.indices.map { k =>
          val range: Option[graft.ops.Layout.ColRange] =
            if (sLo(k) != null)
              Some(graft.ops.Layout.ColRange.ofStrings(
                sLo(k).toString, sHi(k).toString))
            else if (lo(k) <= hi(k))
              Some(schema.fields(statsIdx(k)).dataType match {
                case d: DecimalType =>
                  graft.ops.Layout.DecRange(lo(k), hi(k), d.scale)
                case _ => graft.ops.Layout.LongRange(lo(k), hi(k))
              })
            else None
          graft.ops.Layout.ColStat(range, Some(nullCnt(k)))
        })
  }
  private val states =
    scala.collection.mutable.LinkedHashMap[String, FileState]()
  private var fileSeq = 0

  /** Hive-style `col=value/` subpath for this row (empty when the
    * table is unpartitioned); values are URL-encoded so any string
    * is path-safe, nulls get a reserved marker. */
  private def dirOf(row: InternalRow): String =
    partIdx.zip(partCols).map { case (i, c) =>
      val v =
        if (row.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__"
        else schema.fields(i).dataType match {
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case BooleanType => row.getBoolean(i).toString
          case DateType => // ISO 'yyyy-MM-dd' — matches the string
            // form of date literals in partition-equality pruning
            java.time.LocalDate.ofEpochDay(row.getInt(i)).toString
          case _ => row.getUTF8String(i).toString
        }
      c + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("/")

  override def write(row: InternalRow): Unit = {
    val dir = dirOf(row)
    val st = states.getOrElseUpdate(dir, {
      val nm = s"c$suffix-f$fileSeq.parquet"
      fileSeq += 1
      new FileState(if (dir.isEmpty) nm else s"$dir/$nm")
    })
    val g = groups.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType => g.add(i, row.getLong(i))
        case IntegerType => g.add(i, row.getInt(i))
        case DoubleType => g.add(i, row.getDouble(i))
        case FloatType => g.add(i, row.getFloat(i))
        case BooleanType => g.add(i, row.getBoolean(i))
        case StringType => g.add(i, row.getUTF8String(i).toString)
        case DateType => g.add(i, row.getInt(i)) // epoch days
        case TimestampType | TimestampNTZType =>
          g.add(i, row.getLong(i)) // epoch micros
        case d: DecimalType => // INT64 unscaled (precision <= 18)
          g.add(i,
            row.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case other => throw new IllegalStateException(
          s"unreachable: $other passed validate()")
      }
      i += 1
    }
    st.writer.write(g)
    st.rows += 1
    var k = 0
    while (k < statsIdx.length) {
      val si = statsIdx(k)
      if (row.isNullAt(si)) st.nullCnt(k) += 1L
      else schema.fields(si).dataType match {
        case StringType =>
          val u = row.getUTF8String(si)
          if (st.sLo(k) == null || u.compareTo(st.sLo(k)) < 0)
            st.sLo(k) = u.clone()
          if (st.sHi(k) == null || u.compareTo(st.sHi(k)) > 0)
            st.sHi(k) = u.clone()
        case dt =>
          // the Long index lane: plain integrals, DATE days,
          // TIMESTAMP micros, DECIMAL unscaled
          val v = dt match {
            case LongType | TimestampType | TimestampNTZType =>
              row.getLong(si)
            case d: DecimalType =>
              row.getDecimal(si, d.precision, d.scale).toUnscaledLong
            case _ => row.getInt(si).toLong // INT, DATE
          }
          if (v < st.lo(k)) st.lo(k) = v
          if (v > st.hi(k)) st.hi(k) = v
      }
      k += 1
    }
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    states.values.foreach(_.writer.close())
    SnapshotFileCommit(
      states.values.filter(_.rows > 0).map(_.line).toSeq,
      states.values.map(_.rows).sum)
  }

  override def abort(): Unit = states.values.foreach { st =>
    st.writer.close()
    st.hPath.getFileSystem(conf).delete(st.hPath, false)
  }

  override def close(): Unit = ()
}

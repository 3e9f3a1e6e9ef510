package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** S18 as a first-class DataSource V2 table: the reference generates
  * synthetic interactions with a driver-side Python loop
  * (`scripts/add_synthetic_data.py:29-150`); at 100 TB the generator
  * itself is a distributed job, so this connector exposes it as a real
  * pushdown-capable scan —
  *
  *   spark.read.format("graft-synthetic")
  *     .option("rows", n).option("partitions", p).load()
  *
  * with schema (user_id, item_id, n_click, n_view, truth, event_ts)
  * mirroring [[Synthetic.interactions]]' engagement-tier semantics.
  *
  * Two genuine scan-level optimizations, spec'd in SyntheticV2Spec:
  *
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the reader
  *    materializes only requested fields — a `select(user_id)` never
  *    computes the tier draws. The pruned schema is visible as the
  *    BatchScan's ReadSchema, exactly like a parquet scan.
  *  - PARTITION PRUNING via filter pushdown
  *    ([[SupportsPushDownFilters]]): `user_id` is MONOTONE in the row
  *    index (`user_id = idx / rowsPerUser`), so conjunctive
  *    `=`/`<`/`<=`/`>`/`>=` predicates on it translate to a row-index
  *    interval; `planInputPartitions` intersects that interval with the
  *    contiguous per-partition index ranges and drops empty ones — a
  *    selective point lookup touches ONE partition of however many the
  *    table declares. Pushed predicates are still re-evaluated by Spark
  *    (pushFilters keeps them as post-scan filters), so pruning is a
  *    pure optimization and can never change results.
  *  - LIMIT pushdown ([[SupportsPushDownLimit]]): an unordered LIMIT n
  *    truncates the index space — generation work for the tail never
  *    happens (Spark keeps its own GlobalLimit, so semantics hold).
  *  - PLANNER STATISTICS ([[SupportsReportStatistics]]): post-pruning
  *    row count + bytes reach the optimizer, so a generator-backed
  *    dimension under the broadcast threshold actually broadcasts
  *    (without this, DSv2 relations default to
  *    spark.sql.defaultSizeInBytes and never would).
  *
  * Rows are deterministic in (seed, idx) via a SplitMix64 stream —
  * independent of partition count, so `partitions` is a pure layout
  * knob (the partition-layout-invariance contract every fixture
  * generator here obeys). At cluster scale each partition is one task
  * generating rows straight into the downstream pipeline — no staging
  * write, no driver bottleneck, no shuffle.
  */
class SyntheticV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synthetic"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticV2.SynTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticV2 {
  /** Last batch-partition count planned by any SynScan in this JVM —
    * spec observability for runtime filtering (driver-side only). */
  private[graft] val lastPlannedPartitions =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  val schema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("item_id", LongType, nullable = false),
    StructField("n_click", LongType, nullable = false),
    StructField("n_view", LongType, nullable = false),
    StructField("truth", IntegerType, nullable = false),
    StructField("event_ts", LongType, nullable = false)))

  /** SplitMix64 (Steele et al. 2014) — the stream cell for row idx /
    * draw j. Pure function of (seed, idx, j): layout-independent.
    */
  private[graft] def mix(seed: Long, idx: Long, j: Long): Long = {
    var z = seed + (idx * 8 + j) * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1) from the top 53 bits. */
  private[graft] def unit(seed: Long, idx: Long, j: Long): Double =
    (mix(seed, idx, j) >>> 11).toDouble / (1L << 53).toDouble

  /** The full row formula for spec expectations —
    * [[Synthetic.interactions]]' semantics keyed by row index: the
    * tier draw drives both the counters and the pass label.
    */
  private[graft] def row(seed: Long, idx: Long, rowsPerUser: Long,
      nItems: Long): Seq[Any] =
    (0 to 5).map(f => field(f, seed, idx, rowsPerUser, nItems))

  /** The provenance metadata column every real table format exposes
    * (file sources ship `_metadata.row_index`; Iceberg `_pos`): the
    * deterministic generator row index. Hidden from `SELECT *` —
    * resolvable only by name — per the [[SupportsMetadataColumns]]
    * contract, and since every data column is a pure function of
    * (seed, _gen_index), selecting it makes any row REPRODUCIBLE
    * independently of layout: the lineage hook a 100 TB pipeline
    * needs to re-derive or audit a single record.
    */
  private[graft] val genIndexCol = "_gen_index"

  private final class SynTable(options: CaseInsensitiveStringMap)
      extends Table with SupportsRead with SupportsMetadataColumns {
    private val rows = options.getLong("rows", 1000L)
    private val partitions = options.getInt("partitions", 8)
    private val rowsPerUser = options.getLong("rowsPerUser", 100L)
    private val nItems = options.getLong("items", 1000L)
    private val seed = options.getLong("seed", 42L)

    override def name(): String = s"graft_synthetic($rows)"
    override def schema(): StructType = SyntheticV2.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)

    override def metadataColumns(): Array[MetadataColumn] = Array(
      new MetadataColumn {
        override def name(): String = genIndexCol
        override def dataType(): DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "deterministic generator row index (provenance: every data " +
            "column is a pure function of (seed, _gen_index))"
      })

    override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
      new SynScanBuilder(rows, partitions, rowsPerUser, nItems, seed)
  }

  private final class SynScanBuilder(rows: Long, partitions: Int,
      rowsPerUser: Long, nItems: Long, seed: Long)
      extends ScanBuilder
      with SupportsPushDownFilters with SupportsPushDownRequiredColumns
      with SupportsPushDownLimit {

    private var required: StructType = SyntheticV2.schema
    private var pushed: Array[Filter] = Array.empty
    private var limit: Long = Long.MaxValue
    // inclusive user_id bounds accumulated from conjunctive predicates
    private var userLo: Long = Long.MinValue
    private var userHi: Long = Long.MaxValue

    /** LIMIT pushdown: an unordered LIMIT n may return ANY n rows, so
      * truncating the deterministic index space to its first n rows is
      * a valid (and maximally cheap) implementation — generation work
      * for the dropped tail never happens. Spark only offers the limit
      * when nothing between scan and limit re-orders or filters beyond
      * what it re-checks itself, and it keeps its own GlobalLimit
      * (isPartiallyPushed default), so semantics cannot change.
      */
    override def pushLimit(n: Int): Boolean = {
      limit = math.min(limit, n.toLong)
      true
    }

    /** Accept a predicate iff it tightens the user_id interval. */
    private def absorb(f: Filter): Boolean = f match {
      case EqualTo("user_id", v: Long) =>
        userLo = math.max(userLo, v); userHi = math.min(userHi, v); true
      case GreaterThan("user_id", v: Long) =>
        userLo = math.max(userLo, v + 1); true
      case GreaterThanOrEqual("user_id", v: Long) =>
        userLo = math.max(userLo, v); true
      case LessThan("user_id", v: Long) =>
        userHi = math.min(userHi, v - 1); true
      case LessThanOrEqual("user_id", v: Long) =>
        userHi = math.min(userHi, v); true
      case And(l, r) =>
        // both sides must absorb or neither (no partial credit — a
        // half-absorbed And would under-report what pruning used)
        val snapshot = (userLo, userHi)
        if (absorb(l) && absorb(r)) true
        else { userLo = snapshot._1; userHi = snapshot._2; false }
      case _ => false
    }

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      pushed = filters.filter(absorb)
      // every filter stays post-scan: pruning is an optimization, the
      // engine re-checks semantics — results can never change
      filters
    }
    override def pushedFilters(): Array[Filter] = pushed

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def build(): Scan =
      new SynScan(math.min(rows, limit), partitions, rowsPerUser, nItems,
        seed, required, userLo, userHi)
  }

  private final case class SynInputPartition(start: Long, end: Long)
      extends InputPartition

  /** Streaming offset = "rows emitted so far" (a bounded, replayable
    * cursor over the deterministic row index).
    */
  private final case class SynOffset(n: Long)
      extends org.apache.spark.sql.connector.read.streaming.Offset {
    override def json(): String = n.toString
  }

  private final class SynScan(rows: Long, partitions: Int, rowsPerUser: Long,
      nItems: Long, seed: Long, required: StructType,
      private var userLo: Long, private var userHi: Long)
      extends Scan with Batch
      with SupportsReportStatistics with SupportsRuntimeV2Filtering {

    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-synthetic rows=$rows userBounds=[$userLo, $userHi]"

    /** RUNTIME filtering ([[SupportsRuntimeV2Filtering]]) — the DSv2
      * analog of dynamic partition pruning: when this table is the
      * fact side of an equi-join on user_id and the dim side carries a
      * selective predicate, Spark plants a runtime IN filter from the
      * materialized dim keys and calls [[filter]] before re-planning
      * partitions. The IN set tightens the user interval to its HULL
      * [min, max] (pruning to the hull is lossless — the engine still
      * applies the join itself), so a 3-key probe against a
      * 1000-user generator touches only the partitions those users
      * live in. At 100 TB this is the difference between scanning the
      * fact table and scanning the joined slice of it.
      */
    override def filterAttributes(): Array[NamedReference] =
      Array(Expressions.column("user_id"))

    override def filter(predicates: Array[Predicate]): Unit =
      predicates.foreach { p =>
        if (p.name() == "IN") {
          val ch = p.children()
          val onUser = ch.headOption.exists {
            case nr: NamedReference =>
              nr.fieldNames().sameElements(Array("user_id"))
            case _ => false
          }
          if (onUser) {
            val vals = ch.drop(1).collect {
              case l: Literal[_] => l.value()
            }.collect { case x: java.lang.Long => x.longValue() }
            // only act when EVERY member parsed — a partially-decoded
            // IN list could otherwise over-prune
            if (vals.nonEmpty && vals.length == ch.length - 1) {
              userLo = math.max(userLo, vals.min)
              userHi = math.min(userHi, vals.max)
            }
          }
        }
      }

    /** Planner-visible statistics ([[SupportsReportStatistics]]): row
      * count AFTER pushed pruning (the limit cap and the user_id index
      * interval both shrink it) and a bytes estimate from the pruned
      * column widths — what AQE and the broadcast-threshold rule need
      * from any real 100 TB table provider. Without this a DSv2
      * relation defaults to spark.sql.defaultSizeInBytes (huge), so a
      * generator-backed dimension would never broadcast.
      */
    override def estimateStatistics(): Statistics = new Statistics {
      private val nRows = {
        val (lo, hi) = idxWindow
        math.max(0L, hi - lo)
      }
      // LongType/IntegerType fixed widths + per-row object overhead
      private val rowBytes = math.max(8, required.fields.map(_.dataType
        .defaultSize).sum) + 8
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(nRows * rowBytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(nRows)
    }

    /** MICRO-BATCH read path: the same deterministic index space
      * consumed incrementally — `latestOffset` admits at most
      * `rowsPerBatch` rows past the high-water mark (the admission
      * control round 7 documented but did not enforce: it returned
      * `rows` outright, so the whole table arrived in one batch), and
      * each batch is the index range (highWater, highWater +
      * rowsPerBatch], so replaying a batch from its offsets reproduces
      * its rows EXACTLY (the connector's rows are pure functions of
      * (seed, idx)): the source-side half of exactly-once. The
      * high-water mark advances when a batch is PLANNED (not on call —
      * repeated latestOffset probes between batches must be
      * idempotent; and not on commit alone — the engine probes for new
      * data before committing the previous batch, which would
      * deadlock admission) and absorbs any offset restored through
      * `deserializeOffset`, so a checkpoint restart resumes past the
      * recovered offset instead of stalling behind it. Bounded:
      * admission stops at `rows`, so a
      * query over this source drains and finishes — the S18 generator
      * as a replayable stream instead of a driver loop.
      * SyntheticV2Spec asserts the table arrives across >1 batch.
      */
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
        import org.apache.spark.sql.connector.read.streaming.Offset
        private val rowsPerBatch = math.max(1L, rows / math.max(1, partitions))
        // max offset observed: committed batches, checkpoint restores
        private var highWater = 0L
        override def initialOffset(): Offset = SynOffset(0L)
        override def latestOffset(): Offset =
          SynOffset(math.min(rows, highWater + rowsPerBatch))
        override def deserializeOffset(json: String): Offset = {
          val n = json.toLong
          highWater = math.max(highWater, n)
          SynOffset(n)
        }
        override def commit(end: Offset): Unit =
          highWater = math.max(highWater,
            end.asInstanceOf[SynOffset].n)
        override def stop(): Unit = ()
        override def planInputPartitions(start: Offset,
            end: Offset): Array[InputPartition] = {
          val s0 = start.asInstanceOf[SynOffset].n
          val e0 = end.asInstanceOf[SynOffset].n
          highWater = math.max(highWater, e0)
          // split the batch range into `partitions` contiguous slices
          val span = e0 - s0
          val per = math.max(1L, (span + partitions - 1) / partitions)
          (0 until partitions).iterator
            .map(p => SynInputPartition(s0 + p * per,
              math.min(s0 + (p + 1) * per, e0)))
            .filter(ip => ip.start < ip.end)
            .toArray[InputPartition]
        }
        override def createReaderFactory(): PartitionReaderFactory =
          SynScan.this.createReaderFactory()
      }

    /** The row-index interval the pushed user_id bounds select —
      * user_id = idx / rowsPerUser ⇒ [userLo·rpu, (userHi+1)·rpu),
      * clamped with care around Long extremes. Shared by partition
      * planning and the statistics report.
      */
    private def idxWindow: (Long, Long) = {
      val idxLo =
        if (userLo <= 0L) 0L
        else if (userLo > rows / rowsPerUser) rows
        else userLo * rowsPerUser
      val idxHi =
        if (userHi == Long.MaxValue || userHi >= rows / rowsPerUser) rows
        else if (userHi < 0L) 0L
        else math.min(rows, (userHi + 1) * rowsPerUser)
      (idxLo, idxHi)
    }

    override def planInputPartitions(): Array[InputPartition] = {
      val (idxLo, idxHi) = idxWindow
      val per = math.max(1L, (rows + partitions - 1) / partitions)
      val planned = (0 until partitions).iterator
        .map { p =>
          val s = math.max(p * per, idxLo)
          val e = math.min(math.min((p + 1) * per, rows), idxHi)
          SynInputPartition(s, e)
        }
        .filter(ip => ip.start < ip.end)
        .toArray[InputPartition]
      // observability for SyntheticV2Spec: runtime filtering re-plans
      // partitions AFTER filter(), so the last recorded count is the
      // post-runtime-prune one
      lastPlannedPartitions.set(planned.length)
      planned
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new SynReaderFactory(rowsPerUser, nItems, seed,
        // the metadata column resolves to the sentinel field 6: the
        // reader emits the raw row index itself
        required.fieldNames.map {
          case SyntheticV2.`genIndexCol` => 6
          case n => SyntheticV2.schema.fieldIndex(n)
        })
  }

  /** One field of row idx — pruned columns are never computed (the
    * draws for a dropped counter simply don't happen; the stream is
    * indexed by (idx, draw), so skipping draws can't shift neighbors).
    */
  private def field(f: Int, seed: Long, idx: Long, rowsPerUser: Long,
      nItems: Long): Any = f match {
    case 0 => idx / rowsPerUser // user_id — MONOTONE in idx
    case 1 => java.lang.Long.remainderUnsigned(mix(seed, idx, 1), nItems)
    case 2 => (unit(seed, idx, 0) * 20 + unit(seed, idx, 2) * 5).toLong
    case 3 => (unit(seed, idx, 0) * 40 + unit(seed, idx, 3) * 10).toLong
    case 4 => if (unit(seed, idx, 4) < unit(seed, idx, 0) * 0.8) 0 else 1
    case 5 => 1700000000L + idx % 86400L
    case 6 => idx // _gen_index metadata column: provenance, no draw
  }

  private final class SynReaderFactory(rowsPerUser: Long, nItems: Long,
      seed: Long, fieldIdx: Array[Int]) extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val sp = p.asInstanceOf[SynInputPartition]
      new PartitionReader[InternalRow] {
        private var idx = sp.start - 1
        override def next(): Boolean = { idx += 1; idx < sp.end }
        override def get(): InternalRow =
          InternalRow.fromSeq(fieldIdx.toSeq.map(f =>
            field(f, seed, idx, rowsPerUser, nItems)))
        override def close(): Unit = ()
      }
    }
  }
}

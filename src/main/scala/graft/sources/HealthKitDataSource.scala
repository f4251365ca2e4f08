package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 front door for HealthKit export archives:
  * `spark.read.format("healthkit").load(pathOrDir)` — the Spark-native
  * packaging of [[HealthKitXml.parseArchive]] (which remains the shared
  * parser; semantics ≙ jshrake/healthkit-to-sqlite `core.rs:43-76`).
  *
  * Scale posture, vs the `mapPartitions`-over-paths ingest it fronts:
  *
  *   - **One input partition per archive member.** The planner sees the
  *     file inventory (a directory expands to its `*.zip` members), so
  *     scheduling, retries, and speculative execution work at the archive
  *     grain — a 100 TB corpus of exports is exactly a long list of these
  *     partitions, and a corrupt archive retries alone instead of
  *     restarting a shared task.
  *   - **Column pruning reaches the PARSER.** Projecting `jsonCols` away
  *     (most Record-only pipelines do) makes the reader run the pruned
  *     parse: workout JSON is never rendered and GPX route files are never
  *     opened — I/O the row-based ingest always pays.
  *   - **Leniency is a scan metric.** `option("lenient", true)` skips
  *     corrupt archives and reports the count as the `badArchives` custom
  *     metric on the scan node (visible in the Spark UI / SQL metrics),
  *     instead of a side accumulator a user has to know about.
  *
  * Schema (fixed, so `inferSchema` never triggers a job):
  * `kind string, tableName string, attrs map<string,string>,
  * jsonCols map<string,string>, ordinal long` — [[HealthKitXml.HkElement]]
  * verbatim; `HealthKitXml.inferSchemas`/`table` consume it unchanged.
  * Ordinals keep the `(archiveIdx << 40) | elementIdx` document-order
  * contract: archiveIdx is the partition's position in the SORTED member
  * list, stable across runs and plans.
  */
class HealthKitDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "healthkit"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HealthKitTable.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HealthKitTable(new CaseInsensitiveStringMap(properties))
}

object HealthKitTable {
  val Schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("tableName", StringType, nullable = false),
    StructField("attrs", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("jsonCols", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("ordinal", LongType, nullable = false)))

  /** Expand the load path(s) to the sorted archive member list: a
    * directory contributes its `*.zip` files, a file contributes itself,
    * and a path carrying a URI scheme (or glob characters) resolves
    * through `org.apache.hadoop.fs.FileSystem.globStatus` — the cluster
    * listing path; scheme-less paths keep the local `java.io.File` fast
    * path. Sorted so partition → archiveIdx → ordinal is run-stable.
    */
  def expandPaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw: Seq[String] = {
      val multi = Option(options.get("paths")).toSeq.flatMap { js =>
        // the "paths" option is a JSON string array (DataFrameReader
        // .load(paths*)) — parse it as JSON (Jackson ships with Spark), not
        // by splitting on commas: a path containing a comma, quote, or
        // escape must survive intact. A value that is not a JSON array is
        // treated as one literal path.
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
          if (node.isArray)
            (0 until node.size()).map(node.get(_).asText()).filter(_.nonEmpty)
          else Seq(js).filter(_.nonEmpty)
        } catch { case _: Exception => Seq(js).filter(_.nonEmpty) }
      }
      multi ++ Option(options.get("path")).toSeq
    }
    raw.flatMap { p =>
      val hasScheme = new org.apache.hadoop.fs.Path(p).toUri.getScheme != null
      val hasGlob   = p.exists("*?[{".contains(_))
      // the pre-DSv2 local resolution: directory → its *.zip members,
      // file → itself (a missing file fails loudly at open)
      def localExpand: Seq[String] = {
        val f = new java.io.File(p)
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten
            .filter(x => x.isFile && x.getName.endsWith(".zip"))
            .map(_.getPath)
        else Seq(p)
      }
      if (hasScheme || hasGlob) {
        // Hadoop resolution: glob (a literal path globs to itself), then
        // expand directories to their *.zip members. A SCHEME-LESS glob
        // resolves against the LOCAL filesystem explicitly — the literal
        // branch below uses java.io.File, and with a non-local
        // fs.defaultFS the same relative path must not resolve against
        // two different filesystems depending on whether it contains a
        // glob metacharacter
        val path = new org.apache.hadoop.fs.Path(p)
        val fs =
          if (hasScheme) path.getFileSystem(HealthKitXml.hadoopConf())
          else org.apache.hadoop.fs.FileSystem.getLocal(HealthKitXml.hadoopConf())
        val matched = Option(fs.globStatus(path)).toSeq.flatten
        if (matched.nonEmpty)
          matched.flatMap { st =>
            if (st.isDirectory)
              fs.listStatus(st.getPath).toSeq
                .filter(s => s.isFile && s.getPath.getName.endsWith(".zip"))
                .map(_.getPath.toString)
            else Seq(st.getPath.toString)
          }
        // nothing matched. A scheme-LESS path that merely LOOKS like a
        // glob may be a literal local file named e.g. export[1].zip —
        // if that literal exists, take the literal fast path rather than
        // silently planning zero partitions for it; otherwise the glob
        // semantics stand (legitimately empty).
        else if (!hasScheme && new java.io.File(p).exists()) localExpand
        // a scheme'd LITERAL path must stay in the list so the open
        // fails LOUDLY downstream — zero silent partitions for a typo'd
        // archive path is data loss; a scheme'd GLOB that matches
        // nothing is legitimately empty (file-source semantics)
        else if (!hasGlob) Seq(p)
        else Seq.empty
      } else localExpand
      // duplicates are deliberate re-reads (file-source semantics); sorted
      // so partition -> archiveIdx -> ordinal is run-stable
    }.sorted
  }
}

class HealthKitTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String =
    s"healthkit(${HealthKitTable.expandPaths(options).mkString(",")})"
  override def schema(): StructType = HealthKitTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the session-merged properties; load-time options
    // arrive here — merge with load-time winning
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new HealthKitScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

class HealthKitScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}

  private var required: StructType  = HealthKitTable.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** `kind`/`tableName` equality and IN filters evaluate INSIDE the
    * reader, before row conversion — `HealthKitXml.table`'s per-table
    * extraction filters on `tableName`, so every extraction skips the
    * other element kinds at the source (a Record-only pipeline never
    * materializes Workout rows at all). Both columns are non-null, so
    * IsNotNull is absorbed for free. Everything else stays Spark-side.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def handled(f: Filter): Boolean = f match {
      case EqualTo("kind" | "tableName", _: String) => true
      case In("kind" | "tableName", vs)             => vs.forall(_.isInstanceOf[String])
      case IsNotNull("kind" | "tableName")          => true
      case _                                        => false
    }
    pushed = filters.filter(handled)
    filters.filterNot(handled)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new HealthKitScan(
      HealthKitTable.expandPaths(options),
      required,
      options.getBoolean("lenient", false),
      pushed)
}

/** Sum-over-tasks count of archives the lenient reader skipped. */
class BadArchivesMetric extends CustomSumMetric {
  override def name(): String        = "badArchives"
  override def description(): String = "corrupt export archives skipped (lenient mode)"
}

case class BadArchivesTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "badArchives"
}

class HealthKitScan(
    paths: Seq[String],
    required: StructType,
    lenient: Boolean,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch           = this
  override def description(): String =
    s"healthkit[${paths.size} archives, cols=${required.fieldNames.mkString(",")}, " +
      s"lenient=$lenient, PushedFilters: [${filters.mkString(", ")}]]"
  override def supportedCustomMetrics(): Array[CustomMetric] = Array(new BadArchivesMetric)

  override def planInputPartitions(): Array[InputPartition] =
    paths.zipWithIndex.map { case (p, i) =>
      HealthKitInputPartition(p, i.toLong): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // serialize the pushed filters as (column, allowed-values) pairs —
    // plain case classes, cheap to ship per task. The DRIVER session's
    // Hadoop conf is captured here (planning time) and ships with the
    // factory so executor-side scheme'd opens see the session's fs.*
    // settings (spark.hadoop.* overrides included).
    val preds: Seq[(String, Set[String])] = filters.toSeq.collect {
      case org.apache.spark.sql.sources.EqualTo(c, v: String) => c -> Set(v)
      case org.apache.spark.sql.sources.In(c, vs)             => c -> vs.map(_.asInstanceOf[String]).toSet
    }
    HealthKitReaderFactory(
      required.fieldNames.toSeq, lenient, preds,
      new org.apache.spark.util.SerializableConfiguration(HealthKitXml.hadoopConf()))
  }
}

case class HealthKitInputPartition(path: String, archiveIdx: Long) extends InputPartition

case class HealthKitReaderFactory(
    fieldNames: Seq[String],
    lenient: Boolean,
    preds: Seq[(String, Set[String])] = Nil,
    conf: HealthKitXml.ShippedConf =
      new org.apache.spark.util.SerializableConfiguration(HealthKitXml.hadoopConf()))
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HealthKitInputPartition]
    new HealthKitPartitionReader(p.path, p.archiveIdx, fieldNames, lenient, preds, conf)
  }
}

class HealthKitPartitionReader(
    path: String,
    archiveIdx: Long,
    fieldNames: Seq[String],
    lenient: Boolean,
    preds: Seq[(String, Set[String])] = Nil,
    conf: HealthKitXml.ShippedConf =
      new org.apache.spark.util.SerializableConfiguration(HealthKitXml.hadoopConf()))
  extends PartitionReader[InternalRow] {

  private var badCount = 0L
  private val wantJson = fieldNames.contains("jsonCols")
  private def keep(e: HealthKitXml.HkElement): Boolean = preds.forall {
    case ("kind", vs)      => vs.contains(e.kind)
    case ("tableName", vs) => vs.contains(e.tableName)
    case _                 => true
  }
  // ordinals index the FULL element stream (assigned before the filter),
  // so a filtered scan sees the same ordinals an unfiltered scan would.
  // The archive/StAX closer is kept so close() can dispose the handles of
  // an early-terminated scan (LIMIT, task kill) immediately.
  private val (iter, closer): (Iterator[(HealthKitXml.HkElement, Int)], () => Unit) = {
    val (base, c) =
      if (lenient) HealthKitXml.lenientIterator(path, () => badCount += 1, wantJson, conf.value)
      else HealthKitXml.parseArchiveWithCloser(path, wantJson, conf.value)
    (base.zipWithIndex.filter { case (e, _) => keep(e) }, c)
  }
  private var current: InternalRow = _

  private def mapData(m: Map[String, String]) =
    ArrayBasedMapData(
      m,
      (k: Any) => UTF8String.fromString(k.asInstanceOf[String]),
      (v: Any) => UTF8String.fromString(v.asInstanceOf[String]))

  override def next(): Boolean =
    if (!iter.hasNext) false
    else {
      val (e, i) = iter.next()
      val values = fieldNames.map {
        case "kind"      => UTF8String.fromString(e.kind)
        case "tableName" => UTF8String.fromString(e.tableName)
        case "attrs"     => mapData(e.attrs)
        case "jsonCols"  => mapData(e.jsonCols)
        case "ordinal"   => (archiveIdx << 40) | i.toLong
        case other       => throw new IllegalArgumentException(s"unknown column $other")
      }
      current = new GenericInternalRow(values.toArray[Any])
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit      = closer() // idempotent; task-end listener is the backstop
  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(BadArchivesTaskMetric(badCount))
}

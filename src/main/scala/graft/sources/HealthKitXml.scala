package graft.sources

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.InferType

/** Spark-native HealthKit `export.zip` reader.
  *
  * Semantics follow the reference (jshrake/healthkit-to-sqlite
  * `src/core.rs`): `Record` elements fan out to one table per `type`
  * attribute (`core.rs:311-337`), `Workout` elements land in a `Workout`
  * table with `metadata_<key>` columns plus `workoutEvents` /
  * `workoutStatistics` JSON columns and a GPX-derived GeoJSON `geometry`
  * column (`core.rs:517-653`), `ActivitySummary` elements land in an
  * `ActivitySummary` table (`core.rs:358-365`). Attribute strings are typed
  * INTEGER/REAL/DATE/TEXT by value shape (`core.rs:171-204`).
  *
  * Architecture is NOT the reference's two-pass single-threaded design:
  * parsing is a streaming StAX pull-parse per archive inside
  * `mapPartitions` over a Dataset of file paths — one task per export
  * archive, memory-bounded, no driver round-trips. A 100 TB corpus is many
  * archives, so parallelism scales with file count; schema inference is a
  * distributed aggregation over (table, column, observed-type) triples
  * (tiny cardinality) rather than the reference's in-memory first-pass map.
  */
object HealthKitXml {

  /** One parsed top-level HealthKit element.
    *
    * @param kind      Record | Workout | ActivitySummary
    * @param tableName target table (Record's `type` attr, else the kind)
    * @param attrs     XML attributes + `metadata_<key>` entries
    * @param jsonCols  pre-rendered JSON column values (workoutEvents,
    *                  workoutStatistics, geometry)
    * @param ordinal   document order — (archive index << 40) | element
    *                  index — so order-sensitive modes (first-seen-wins type
    *                  inference) stay deterministic under any partitioning;
    *                  0 until assigned by [[elements]]
    */
  case class HkElement(
      kind: String,
      tableName: String,
      attrs: Map[String, String],
      jsonCols: Map[String, String],
      ordinal: Long = 0L
  )

  val WorkoutTable         = "Workout"
  val ActivitySummaryTable = "ActivitySummary"

  // ------------------------------------------------------------ archive I/O

  /** Hadoop configuration for path resolution/opens: the active session's
    * (carries `fs.*`/credential settings) when one exists on this JVM —
    * always true on the driver and in local mode — else a fresh default
    * (an executor-side open of a plain `file:` path needs nothing more;
    * a cluster deployment ships the session conf via the usual
    * spark.hadoop.* mechanism, which `new Configuration(true)` loads).
    */
  private[sources] def hadoopConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** The DSv2 scan captures the DRIVER session's conf at planning time
    * and ships it inside the reader factory (Spark's own @DeveloperApi
    * `org.apache.spark.util.SerializableConfiguration`), so EXECUTOR-side
    * archive opens see the session's `fs.*`/credential settings
    * (`spark.hadoop.*` overrides included) instead of reconstructing a
    * default Configuration that never saw them. Local mode can't tell
    * the difference; a 1000-executor cluster reading `s3a://` can.
    */
  type ShippedConf = org.apache.spark.util.SerializableConfiguration

  /** Archive access with two implementations: the LOCAL fast path wraps
    * [[java.util.zip.ZipFile]] (random access via the central directory —
    * the GPX second handle is a free `getEntry`); any path carrying a URI
    * scheme (`file://`, `hdfs://`, `s3a://`, …) routes through
    * `org.apache.hadoop.fs.FileSystem.open` + a streaming
    * [[java.util.zip.ZipInputStream]] scan per member read (zip central
    * directories aren't random-access over a remote stream without range
    * reads; a member open is one forward scan, and the GPX second handle
    * simply re-opens the stream — mirroring the reference's dual zip
    * readers, core.rs:48-51).
    */
  private[sources] sealed trait ArchiveHandle {
    /** Open `member` as a fresh stream (caller closes), None if absent. */
    def open(member: String): Option[java.io.InputStream]

    /** Release the handle itself (member streams close independently). */
    def close(): Unit
  }

  private[sources] final class LocalZipHandle(path: String) extends ArchiveHandle {
    private val zip = new java.util.zip.ZipFile(path)
    override def open(member: String): Option[java.io.InputStream] =
      Option(zip.getEntry(member)).map(zip.getInputStream)
    override def close(): Unit = zip.close()
  }

  private[sources] final class HadoopZipHandle(
      path: String,
      conf: org.apache.hadoop.conf.Configuration) extends ArchiveHandle {
    private val hPath = new org.apache.hadoop.fs.Path(path)
    private val fs    = hPath.getFileSystem(conf)
    override def open(member: String): Option[java.io.InputStream] = {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.BufferedInputStream(fs.open(hPath)))
      try {
        var e = zin.getNextEntry
        while (e != null && e.getName != member) e = zin.getNextEntry
        if (e == null) { zin.close(); None } else Some(zin)
      } catch { case t: Throwable => zin.close(); throw t }
    }
    override def close(): Unit = ()
  }

  /** Scheme-less paths take the ZipFile fast path; everything else goes
    * through the Hadoop filesystem (incl. explicit `file://` — that is
    * the spec's end-to-end cluster-path rehearsal). `conf` is the
    * task-shipped session configuration on the DSv2 path and the active
    * session's on driver-side calls.
    */
  private[sources] def openArchive(
      path: String,
      conf: org.apache.hadoop.conf.Configuration): ArchiveHandle =
    if (new org.apache.hadoop.fs.Path(path).toUri.getScheme == null)
      new LocalZipHandle(path)
    else new HadoopZipHandle(path, conf)

  // ---------------------------------------------------------------- parsing

  /** Parse one or more export.zip archives into a Dataset of elements —
    * since round 12 a thin front on the `healthkit` DataSourceV2 format
    * ([[HealthKitDataSource]]): the scan plans ONE INPUT PARTITION per
    * archive member (zip + StAX is an inherently serial stream per
    * archive, like the reference's single pass), prunes the parse when
    * `jsonCols` is projected away, and surfaces lenient skips as the
    * scan's `badArchives` metric. The output is round-robin repartitioned
    * to the session's default parallelism, so every DOWNSTREAM stage
    * (schema inference, per-type pivots, sinks) fans out across the
    * cluster even when there is only one archive. Order-sensitive
    * consumers are unaffected: each element carries its document
    * [[HkElement.ordinal]], assigned inside the scan, and first-seen-wins
    * inference reduces over it (`min_by`), deterministic under any
    * partitioning. Paths resolve through `org.apache.hadoop.fs.FileSystem`
    * whenever they carry a scheme (`file://`, `hdfs://`, `s3a://`, …) —
    * listing via `globStatus`, opens via `FileSystem.open` + a streaming
    * `ZipInputStream` ([[ArchiveHandle]]) — with scheme-less local paths
    * keeping the `java.util.zip.ZipFile` fast path.
    *
    * `lenient = true` is the large-fleet posture: a corrupt archive is
    * logged, counted, and skipped instead of failing the whole job — at
    * 100 TB some archive in the corpus WILL be broken. Task retries/
    * speculation can re-run a reader, so treat the metric as a diagnostic
    * floor, not an exact tally.
    */
  def elements(
      spark: SparkSession,
      zipPaths: Seq[String],
      lenient: Boolean = false
  ): Dataset[HkElement] = {
    import spark.implicits._
    if (zipPaths.isEmpty) return spark.emptyDataset[HkElement]
    spark.read
      .format("healthkit")
      .option("lenient", lenient.toString)
      .load(zipPaths: _*)
      .as[HkElement]
      // intra-archive parallelism for everything AFTER the parse: without
      // this, one archive = one partition = serial schema inference and
      // table writes no matter how big the cluster
      .repartition(math.max(spark.sparkContext.defaultParallelism, zipPaths.size))
  }

  /** Lenient wrapper: failures at open OR mid-iteration truncate the
    * archive's element stream (counted via `onBad` — the DSv2 reader
    * reports the count as its `badArchives` custom task metric) instead
    * of failing the task.
    */
  private[sources] def lenientIterator(
      path: String,
      onBad: () => Unit,
      wantJson: Boolean,
      conf: org.apache.hadoop.conf.Configuration
  ): (Iterator[HkElement], () => Unit) = {
    def skip(e: Exception): Unit = {
      System.err.println(s"[graft] skipping unreadable archive $path: ${e.getMessage}")
      onBad()
    }
    val (underlying, closer) =
      try parseArchiveWithCloser(path, wantJson, conf)
      catch { case e: Exception => skip(e); return (Iterator.empty, () => ()) }
    val it = new Iterator[HkElement] {
      private var pending: HkElement = null
      private var broken             = false
      override def hasNext: Boolean =
        pending != null || (!broken && {
          try {
            if (underlying.hasNext) { pending = underlying.next(); true }
            else false
          } catch { case e: Exception => skip(e); broken = true; false }
        })
      override def next(): HkElement = {
        if (!hasNext) throw new NoSuchElementException
        val e = pending; pending = null; e
      }
    }
    (it, closer)
  }

  /** Streaming-parse a single archive as a LAZY iterator — elements are
    * pulled from the StAX reader on demand, so task memory stays bounded
    * even for multi-GB exports. GPX route files are read from a second
    * handle on the same archive, mirroring the reference's dual zip
    * readers (`core.rs:48-51`). Resources close at EOF or on error.
    */
  def parseArchive(zipPath: String): Iterator[HkElement] = parseArchive(zipPath, wantJson = true)

  /** `wantJson = false` is the column-pruned parse the DSv2 scan uses when
    * the `jsonCols` column is projected away: workout event/statistics
    * JSON is not rendered and — the real saving — GPX route files are
    * never opened or parsed (a second decompression stream per workout
    * otherwise).
    */
  def parseArchive(zipPath: String, wantJson: Boolean): Iterator[HkElement] =
    parseArchiveWithCloser(zipPath, wantJson, hadoopConf())._1

  /** [[parseArchive]] plus an idempotent closer: the DSv2 partition reader
    * disposes the archive/StAX handles in its own `close()` — an
    * early-terminated scan (LIMIT, task kill, downstream failure) frees
    * resources immediately instead of waiting for GC or the task-end
    * listener (which stays registered as the backstop).
    */
  def parseArchiveWithCloser(
      zipPath: String,
      wantJson: Boolean,
      conf: org.apache.hadoop.conf.Configuration): (Iterator[HkElement], () => Unit) = {
    val archive = openArchive(zipPath, conf)
    val in = archive.open("apple_health_export/export.xml").getOrElse {
      archive.close()
      throw new IllegalArgumentException(s"no apple_health_export/export.xml in $zipPath")
    }
    val reader = xmlReader(in)
    import javax.xml.stream.XMLStreamConstants._

    var closed = false
    def closeResources(): Unit =
      if (!closed) {
        closed = true
        try reader.close()
        finally {
          try in.close()
          finally archive.close()
        }
      }
    // a downstream limit()/take() may stop pulling before EOF — close with
    // the task rather than leaking the handle until GC
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeResources()))

    val it = new Iterator[HkElement] {
      private var pending: HkElement = null

      private def close(): Unit = closeResources()

      private def advance(): Unit = {
        if (pending != null || closed) return
        try {
          while (pending == null && reader.hasNext) {
            reader.next() match {
              case START_ELEMENT =>
                reader.getLocalName match {
                  case "Record"  => pending = parseRecord(reader)
                  case "Workout" => pending = parseWorkout(reader, archive, wantJson)
                  case "ActivitySummary" =>
                    pending =
                      HkElement("ActivitySummary", ActivitySummaryTable, attrsOf(reader), Map.empty)
                  case _ => () // HealthData, ExportDate, Me, Correlation children, …
                }
              case _ => ()
            }
          }
          if (pending == null) close()
        } catch {
          case e: Exception => close(); throw e
        }
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): HkElement = {
        advance()
        if (pending == null) throw new NoSuchElementException
        val e = pending; pending = null; e
      }
    }
    (it, () => closeResources())
  }

  /** JDK StAX reader with DTD processing off: Apple's export DTD is
    * malformed (Woodstox — the classpath default via the hadoop-shaded
    * service file — rejects it), and the JDK parser with SUPPORT_DTD=false
    * skips the internal subset entirely. External entities disabled.
    */
  private def xmlReader(in: java.io.InputStream): javax.xml.stream.XMLStreamReader = {
    val factory = javax.xml.stream.XMLInputFactory.newDefaultFactory()
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    factory.createXMLStreamReader(in)
  }

  private def attrsOf(r: javax.xml.stream.XMLStreamReader): Map[String, String] =
    (0 until r.getAttributeCount).map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap

  /** Record element: own attributes + metadata_<key> columns (core.rs:655-685). */
  private def parseRecord(r: javax.xml.stream.XMLStreamReader): HkElement = {
    val attrs = mutable.LinkedHashMap.empty[String, String]
    attrs ++= attrsOf(r)
    val table = attrs.getOrElse("type", sys.error("Record element without type attribute"))
    import javax.xml.stream.XMLStreamConstants._
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          depth += 1
          if (r.getLocalName == "MetadataEntry") {
            val m = attrsOf(r)
            for (k <- m.get("key"); v <- m.get("value")) attrs(s"metadata_$k") = v
          }
        case END_ELEMENT => depth -= 1
        case _           => ()
      }
    }
    HkElement("Record", table, attrs.toMap, Map.empty)
  }

  /** Workout element: attributes, metadata, WorkoutEvent JSON array,
    * WorkoutStatistics JSON object keyed by type, WorkoutRoute → GeoJSON
    * LineString (core.rs:517-653).
    */
  private def parseWorkout(
      r: javax.xml.stream.XMLStreamReader,
      zip: ArchiveHandle,
      wantJson: Boolean = true
  ): HkElement = {
    val attrs  = mutable.LinkedHashMap.empty[String, String]
    attrs ++= attrsOf(r)
    val events = mutable.ArrayBuffer.empty[String]
    val stats  = mutable.LinkedHashMap.empty[String, String]
    var geometry = "{}"
    import javax.xml.stream.XMLStreamConstants._
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          depth += 1
          r.getLocalName match {
            case "MetadataEntry" =>
              val m = attrsOf(r)
              for (k <- m.get("key"); v <- m.get("value")) attrs(s"metadata_$k") = v
            case "WorkoutEvent" =>
              events += jsonObject(attrsOf(r))
            case "WorkoutStatistics" =>
              val m = attrsOf(r)
              m.get("type").foreach(t => stats(t) = jsonObject(m))
            case "FileReference" =>
              if (wantJson) attrsOf(r).get("path").foreach { p =>
                geometry = gpxToGeoJson(zip, s"apple_health_export$p")
              }
            case _ => () // WorkoutRoute wrapper, HeartRate lists, …
          }
        case END_ELEMENT => depth -= 1
        case _           => ()
      }
    }
    val stateJson =
      if (!wantJson) Map.empty[String, String]
      else Map(
        "workoutEvents"     -> events.mkString("[", ",", "]"),
        "workoutStatistics" -> stats.toSeq.sortBy(_._1).map { case (k, v) => s"${jsonString(k)}:$v" }.mkString("{", ",", "}"),
        "geometry"          -> geometry
      )
    HkElement("Workout", WorkoutTable, attrs.toMap, stateJson)
  }

  /** GPX track points → GeoJSON LineString, [lon, lat] pairs (core.rs:588-628).
    * Coordinates go through f32 like the reference (f32 parse → f64 print).
    * The member stream is the archive's SECOND handle (free `getEntry` on
    * the local fast path; a re-opened `ZipInputStream` scan on Hadoop
    * paths) and closes with this call.
    */
  private[sources] def gpxToGeoJson(zip: ArchiveHandle, entryName: String): String = {
    val in = zip.open(entryName).getOrElse(return "{}")
    try {
      val r      = xmlReader(in)
      val coords = mutable.ArrayBuffer.empty[String]
      import javax.xml.stream.XMLStreamConstants._
      while (r.hasNext) {
        r.next() match {
          case START_ELEMENT if r.getLocalName == "trkpt" =>
            val m = attrsOf(r)
            for (lon <- m.get("lon"); lat <- m.get("lat"))
              coords += s"[${jsonF32(lon)},${jsonF32(lat)}]"
          case _ => ()
        }
      }
      r.close()
      s"""{"coordinates":${coords.mkString("[", ",", "]")},"type":"LineString"}"""
    } finally in.close()
  }

  // Minimal JSON rendering (no deps): numbers follow the reference's
  // f32-parse-else-string rule (core.rs:487-491); f32 → f64 → shortest
  // string matches serde_json's output for the same value. A regex gate
  // restricts "numeric" to Rust-float syntax: Java's Float.parseFloat also
  // accepts "1f"/"0x1p3"/"NaN"/"Infinity", which must stay strings (bare
  // NaN would even be invalid JSON).
  private val FloatRe =
    "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  private def isJsonNumber(s: String): Boolean =
    s.matches(FloatRe) && s.toFloatOption.exists(f => !f.isNaN && !f.isInfinite)

  private def jsonF32(s: String): String = plainDecimal(s.toFloat.toDouble)

  /** Java's Double.toString switches to 1.23E7-style notation outside
    * [1e-3, 1e7); serde_json prints plain decimal there — convert so JSON
    * output stays comparable with the reference's.
    */
  private def plainDecimal(d: Double): String = {
    val s = d.toString
    if (!s.contains('E')) s
    else {
      val plain = new java.math.BigDecimal(s).toPlainString
      if (plain.contains('.')) plain else plain + ".0"
    }
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  private def jsonValue(s: String): String =
    if (isJsonNumber(s)) jsonF32(s) else jsonString(s)

  private def jsonObject(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${jsonString(k)}:${jsonValue(v)}" }.mkString("{", ",", "}")

  // ------------------------------------------------------- schema inference

  /** Distributed schema inference: (table, column, type) triples aggregated
    * with the widening lattice ([[InferType.widen]]). The result is tiny
    * (hundreds of columns) regardless of corpus size. Columns are
    * alphabetical — the same order the reference's BTreeMap produces.
    *
    * `firstSeen = true` is the migration-compat mode: a column is typed by
    * its FIRST value in document order — exactly the reference's rule
    * (core.rs:219-230, `if !columns.contains_key { insert }`) — via
    * `min_by(type, ordinal)`, still one distributed aggregate. The default
    * stays the order-free widening lattice, which is better behaved when a
    * column's first value is unrepresentative (e.g. "100" then "12.5").
    */
  def inferSchemas(
      elems: Dataset[HkElement],
      firstSeen: Boolean = false
  ): Map[String, ListMap[String, String]] = {
    import elems.sparkSession.implicits._
    val triples = elems
      .flatMap { e =>
        e.attrs.map { case (c, v) => (e.tableName, c, InferType.inferTypeStr(v), e.ordinal) } ++
          e.jsonCols.keys.map(c => (e.tableName, c, "JSON", e.ordinal))
      }
      .toDF("tbl", "col", "ty", "ord")
      .groupBy("tbl", "col")
      .agg(
        if (firstSeen) min_by($"ty", $"ord").as("tys")
        else collect_set($"ty").as("tys")
      )
      .collect()
    triples
      .groupBy(_.getString(0))
      .map { case (tbl, rows) =>
        val cols = rows
          .map { r =>
            val ty =
              if (firstSeen) r.getString(2)
              else r.getSeq[String](2).reduce(InferType.widen)
            r.getString(1) -> ty
          }
          .sortBy(_._1)
        tbl -> ListMap(cols.toIndexedSeq: _*)
      }
  }

  // ------------------------------------------------------- table extraction

  /** Typed DataFrame for one inferred table: a map-side filter + projection
    * (no shuffle) casting each attribute per its inferred type.
    * INTEGER→int, REAL→double, DATE→timestamp, TEXT/JSON→string.
    */
  def table(
      elems: Dataset[HkElement],
      name: String,
      schema: ListMap[String, String]
  ): DataFrame = {
    val filtered = elems.filter(col("tableName") === name)
    val cols = schema.map { case (c, ty) =>
      val raw =
        if (ty == "JSON") element_at(col("jsonCols"), c)
        else element_at(col("attrs"), c)
      // try_cast, not cast: under first-seen typing a column typed INTEGER
      // by its first value can later hold "12.5" — NULL it (Spark columns
      // are statically typed) rather than fail the job under ANSI mode.
      // Widening mode never produces such conflicts, so this is cast-equal.
      val typed = ty match {
        case "INTEGER" => raw.try_cast("int")
        case "REAL"    => raw.try_cast("double")
        case "DATE" =>
          // Column API, not interpolated SQL — column names (metadata keys)
          // may contain quotes/spaces
          coalesce(
            try_to_timestamp(raw, lit("yyyy-MM-dd HH:mm:ss xx")),
            try_to_timestamp(raw, lit("yyyy-MM-dd"))
          )
        case _ => raw
      }
      typed.as(c)
    }.toSeq
    filtered.select(cols: _*)
  }

  /** Parse archives and materialize every inferred table, keyed by name —
    * the reference's whole output surface as DataFrames.
    *
    * `persist = true` caches the parsed elements so schema inference + N
    * table extractions parse each archive once; callers that finish with
    * the tables in one pass (or parse many corpora in one session) can
    * pass `false` to avoid pinning storage memory for the session, at the
    * cost of re-parsing per downstream action.
    */
  def tables(
      spark: SparkSession,
      zipPaths: Seq[String],
      persist: Boolean = true,
      lenient: Boolean = false,
      firstSeenTypes: Boolean = false
  ): Map[String, DataFrame] = {
    val raw     = elements(spark, zipPaths, lenient)
    val elems   = if (persist) raw.cache() else raw
    val schemas = inferSchemas(elems, firstSeen = firstSeenTypes)
    schemas.map { case (name, schema) => name -> table(elems, name, schema) }
  }
}

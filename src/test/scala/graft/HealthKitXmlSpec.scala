package graft

import org.apache.spark.sql.functions._

import graft.sinks.Sinks
import graft.sources.HealthKitXml

/** §2.A: HealthKit ETL against the reference's own example export.zip
  * (fixture copied from the reference repo's /example, MIT/Apache-2.0).
  * Expected values derived from the XML content: 1 Record
  * (HKQuantityTypeIdentifierWalkingSpeed), 1 Workout (4 WorkoutEvents,
  * 3 WorkoutStatistics, 644-point route), 10 ActivitySummary rows.
  */
class HealthKitXmlSpec extends SparkSpec {

  private lazy val zipPath =
    getClass.getResource("/export.zip").getPath
  private lazy val tables = HealthKitXml.tables(spark, Seq(zipPath))

  test("A1/A3: Record elements fan out to per-type tables") {
    assert(tables.keySet.contains("HKQuantityTypeIdentifierWalkingSpeed"))
    val rec = tables("HKQuantityTypeIdentifierWalkingSpeed")
    assert(rec.count() == 1)
    val row = rec.collect().head
    assert(row.getAs[Double]("value") == 2.95276)
    assert(row.getAs[String]("unit") == "mi/hr")
  }

  test("A2: schema inference types columns like the reference") {
    val schemas = HealthKitXml.inferSchemas(
      HealthKitXml.elements(spark, Seq(zipPath))
    )
    val rec = schemas("HKQuantityTypeIdentifierWalkingSpeed")
    assert(rec("value") == "REAL")
    assert(rec("unit") == "TEXT")
    assert(rec("startDate") == "DATE")
    val w = schemas(HealthKitXml.WorkoutTable)
    assert(w("duration") == "REAL")
    assert(w("workoutEvents") == "JSON")
    assert(w("workoutStatistics") == "JSON")
    assert(w("geometry") == "JSON")
    // columns come out alphabetical, matching the reference's BTreeMap order
    assert(rec.keys.toSeq == rec.keys.toSeq.sorted)
  }

  test("A4: Workout table with metadata_* columns and JSON columns") {
    val w = tables(HealthKitXml.WorkoutTable)
    assert(w.count() == 1)
    val row = w.collect().head
    assert(math.abs(row.getAs[Double]("duration") - 34.18067507346471) < 1e-9)
    assert(row.getAs[String]("metadata_Test Entry") == "FooBar")
    val events = row.getAs[String]("workoutEvents")
    assert(events.startsWith("[") && events.contains("HKWorkoutEventTypeSegment"))
    // 4 WorkoutEvent elements in the fixture
    assert(spark.sql(s"SELECT size(from_json('${events.replace("'", "''")}', 'array<map<string,string>>'))")
      .collect().head.getInt(0) == 4)
    val stats = row.getAs[String]("workoutStatistics")
    assert(stats.contains("\"HKQuantityTypeIdentifierActiveEnergyBurned\""))
    assert(stats.contains("\"sum\""))
  }

  test("A5: GPX route becomes a GeoJSON LineString with all 644 trkpts") {
    val row = tables(HealthKitXml.WorkoutTable).collect().head
    val geo = row.getAs[String]("geometry")
    assert(geo.contains("\"type\":\"LineString\""))
    val nCoords = spark
      .sql(
        s"""SELECT size(from_json('${geo.replace("'", "''")}',
           |'struct<coordinates:array<array<double>>,type:string>').coordinates)""".stripMargin)
      .collect().head.getInt(0)
    assert(nCoords == 644)
    // first point is [lon, lat] per GeoJSON; values go through f32 like the
    // reference (core.rs:613 lon.parse::<f32>()), printed as shortest f64
    val lon = "-118.232524".toFloat.toDouble
    val lat = "34.045088".toFloat.toDouble
    assert(geo.contains(s"[$lon,$lat]"))
  }

  test("A6: ActivitySummary table") {
    val a = tables(HealthKitXml.ActivitySummaryTable)
    assert(a.count() == 10)
    assert(a.schema("activeEnergyBurned").dataType.typeName == "double")
    val total = a.agg(sum(col("activeEnergyBurned"))).collect().head.getDouble(0)
    assert(total > 0)
  }

  test("A8: DATE columns parse HealthKit offset dates to UTC timestamps") {
    val rec = tables("HKQuantityTypeIdentifierWalkingSpeed")
    val start = rec.select(date_format(col("startDate"), "yyyy-MM-dd HH:mm:ss").as("s"))
      .collect().head.getAs[String]("s")
    // 2022-12-15 17:48:29 -0800 → 2022-12-16 01:48:29 UTC
    assert(start == "2022-12-16 01:48:29")
  }

  test("A7: JDBC sink round-trips through embedded Derby") {
    val url = "jdbc:derby:memory:graftTest;create=true"
    val a   = tables(HealthKitXml.ActivitySummaryTable)
    Sinks.writeJdbc(a, url, "ActivitySummary")
    val back = spark.read.jdbc(url, "\"ActivitySummary\"", new java.util.Properties())
    assert(back.count() == 10)
    assert(back.columns.sorted.sameElements(a.columns.sorted))
  }

  test("A7: HOSTILE metadata identifiers (quotes/backticks/spaces) land in Derby intact") {
    // the reference sanitizes identifiers (core.rs:81-83); the Spark side
    // must survive a metadata KEY that becomes a column name containing a
    // double quote, a backtick, and spaces — through A4 parse → typed
    // table → A7 JDBC write → read-back, value intact
    val hostileKey = """we"ird `key name"""
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<HealthData locale="en_US">
         | <ExportDate value="2024-01-01 10:00:00 -0800"/>
         | <Workout workoutActivityType="HKWorkoutActivityTypeWalking" duration="10.5" durationUnit="min" sourceName="t" startDate="2024-01-01 09:00:00 -0800" endDate="2024-01-01 09:10:30 -0800" creationDate="2024-01-01 09:11:00 -0800">
         |   <MetadataEntry key="we&quot;ird `key name" value="FooBar"/>
         | </Workout>
         |</HealthData>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("hk_hostile")
    val zp  = dir.resolve("export.zip")
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zp))
    zos.putNextEntry(new java.util.zip.ZipEntry("apple_health_export/export.xml"))
    zos.write(xml.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val t = HealthKitXml.tables(spark, Seq(zp.toString))
    val w = t(HealthKitXml.WorkoutTable)
    val colName = s"metadata_$hostileKey"
    val quotedCol = "`" + colName.replace("`", "``") + "`"
    assert(w.columns.contains(colName), s"columns: ${w.columns.mkString("|")}")
    assert(w.select(col(quotedCol)).collect().head.getString(0) == "FooBar")
    val url = "jdbc:derby:memory:hkHostileTest;create=true"
    Sinks.writeJdbc(w, url, "Workout")
    val back = spark.read.jdbc(url, "\"Workout\"", new java.util.Properties())
    assert(back.columns.contains(colName),
      s"hostile column must survive the JDBC round-trip: ${back.columns.mkString("|")}")
    assert(back.select(col(quotedCol)).collect().head.getString(0) == "FooBar")
  }

  test("A7: parquet sink writes partitioned output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val a   = tables(HealthKitXml.ActivitySummaryTable)
    Sinks.writeParquet(a, s"$dir/as")
    assert(spark.read.parquet(s"$dir/as").count() == 10)
  }

  test("A7: JSONL shard sink is content-stable and round-trips") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val dir  = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    Sinks.writeJsonlShards(docs, s"$dir/docs", keyCol = "doc_id", shards = 4)
    val back = spark.read.json(s"$dir/docs")
    assert(back.count() == docs.count())
    // shard dirs exist and every row's shard equals pmod(xxhash64(doc_id), 4)
    val wrong = back
      .filter(col("shard") =!= pmod(xxhash64(col("doc_id")), lit(4)))
      .count()
    assert(wrong == 0)
  }

  test("A1: multiple archives parse in parallel (scale path is per-file)") {
    val elems = HealthKitXml.elements(spark, Seq(zipPath, zipPath, zipPath))
    // 3 archives × (1 Record + 1 Workout + 10 ActivitySummary) elements
    assert(elems.count() == 36)
    val t = HealthKitXml.tables(spark, Seq(zipPath, zipPath, zipPath))
    assert(t(HealthKitXml.ActivitySummaryTable).count() == 30)
  }

  test("A1: a SINGLE archive fans out to many partitions after the parse") {
    // the parse itself is one task (zip+StAX is a serial stream, like the
    // reference), but everything downstream must parallelize: the element
    // Dataset is repartitioned to the session default parallelism
    val elems = HealthKitXml.elements(spark, Seq(zipPath))
    assert(elems.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(elems.rdd.getNumPartitions > 1,
      "downstream stages would run serially on a single-archive export")
    assert(elems.count() == 12)
    // order-sensitive inference survives the shuffle: ordinals pick the
    // SAME first-seen types under the multi-partition layout
    val fs = HealthKitXml.inferSchemas(elems, firstSeen = true)
    assert(fs.nonEmpty)
  }

  test("reference README query: workout duration by activity type") {
    // select sum(duration)/60 from workout where workoutActivityType in (...)
    val w = tables(HealthKitXml.WorkoutTable)
    val hrs = w
      .filter(col("workoutActivityType").isin(
        "HKWorkoutActivityTypeWalking", "HKWorkoutActivityTypeRunning", "HKWorkoutActivityTypeHiking"))
      .agg((sum(col("duration")) / 60.0).as("total_duration"))
      .collect().head.getDouble(0)
    assert(math.abs(hrs - 34.18067507346471 / 60.0) < 1e-9)
  }

  test("reference README query: json_extract on workoutStatistics") {
    val w = tables(HealthKitXml.WorkoutTable)
    val miles = w
      .select(get_json_object(col("workoutStatistics"),
        "$.HKQuantityTypeIdentifierDistanceWalkingRunning.sum").cast("double").as("mi"))
      .agg(sum(col("mi"))).collect().head.getDouble(0)
    assert(miles > 0)
  }

  test("A1: lenient mode skips corrupt archives instead of failing the job") {
    val dir = java.nio.file.Files.createTempDirectory("hk_bad")
    val bad = dir.resolve("broken.zip")
    java.nio.file.Files.write(bad, "this is not a zip".getBytes)
    // strict mode: corrupt archive fails the job
    intercept[org.apache.spark.SparkException] {
      HealthKitXml.elements(spark, Seq(bad.toString)).count()
    }
    // lenient mode: good archive's data survives, bad one is skipped
    val elems = HealthKitXml.elements(spark, Seq(zipPath, bad.toString), lenient = true)
    assert(elems.count() == 12) // 1 Record + 1 Workout + 10 ActivitySummary
  }

  test("A2/A3: synthetic export — conflicting value types widen, types fan out") {
    // the reference example has one Record type; synthesize an export with
    // two types and an INTEGER-vs-REAL conflict inside one column
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<HealthData locale="en_US">
        | <ExportDate value="2024-01-01 10:00:00 -0800"/>
        | <Record type="HKQuantityTypeIdentifierStepCount" value="100" unit="count" startDate="2024-01-01 09:00:00 -0800" endDate="2024-01-01 09:10:00 -0800" sourceName="t"/>
        | <Record type="HKQuantityTypeIdentifierStepCount" value="12.5" unit="count" startDate="2024-01-01 09:20:00 -0800" endDate="2024-01-01 09:30:00 -0800" sourceName="t"/>
        | <Record type="HKCategoryTypeIdentifierSleepAnalysis" value="InBed" startDate="2024-01-01 01:00:00 -0800" endDate="2024-01-01 07:00:00 -0800" sourceName="t">
        |   <MetadataEntry key="quality" value="3"/>
        | </Record>
        |</HealthData>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("hk_synth")
    val zp  = dir.resolve("export.zip")
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zp))
    zos.putNextEntry(new java.util.zip.ZipEntry("apple_health_export/export.xml"))
    zos.write(xml.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    val elems   = HealthKitXml.elements(spark, Seq(zp.toString))
    val schemas = HealthKitXml.inferSchemas(elems)
    val steps = schemas("HKQuantityTypeIdentifierStepCount")
    assert(steps("value") == "REAL")            // INTEGER ⊔ REAL = REAL
    val sleep = schemas("HKCategoryTypeIdentifierSleepAnalysis")
    assert(sleep("value") == "TEXT")
    assert(sleep("metadata_quality") == "INTEGER")

    val tabs = HealthKitXml.tables(spark, Seq(zp.toString))
    val stepVals = tabs("HKQuantityTypeIdentifierStepCount")
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    assert(stepVals.sameElements(Array(12.5, 100.0)))
    assert(tabs("HKCategoryTypeIdentifierSleepAnalysis").count() == 1)

    // first-seen-wins compat mode (reference core.rs:219-230): the column is
    // typed by its first value in document order — "100" → INTEGER — and the
    // later non-conforming "12.5" becomes NULL in the statically-typed column
    val fsSchemas = HealthKitXml.inferSchemas(elems, firstSeen = true)
    assert(fsSchemas("HKQuantityTypeIdentifierStepCount")("value") == "INTEGER")
    assert(fsSchemas("HKCategoryTypeIdentifierSleepAnalysis")("value") == "TEXT")
    val fsTabs = HealthKitXml.tables(spark, Seq(zp.toString), firstSeenTypes = true)
    val fsVals = fsTabs("HKQuantityTypeIdentifierStepCount")
      .select(col("value")).collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(fsVals.toSet == Set(Some(100), None))
  }

  test("CLI parity: HkToJdbc writes every inferred table end-to-end") {
    val url = "jdbc:derby:memory:hkToJdbcTest;create=true"
    val written = graft.tools.HkToJdbc.run(spark, zipPath, url, lenient = true)
    val byName = written.toMap
    // the fixture's whole output surface: 1 Record type + Workout + summary
    assert(byName("HKQuantityTypeIdentifierWalkingSpeed") == 1L)
    assert(byName(HealthKitXml.WorkoutTable) == 1L)
    assert(byName(HealthKitXml.ActivitySummaryTable) == 10L)
    // every table is actually queryable in the target DB with all columns
    written.foreach { case (name, n) =>
      val back = spark.read.jdbc(url, "\"" + name + "\"", new java.util.Properties())
      assert(back.count() == n, s"$name JDBC roundtrip")
    }
  }

  test("CLI parity: --drop/--yes confirm flow drops and reloads to identical row counts") {
    import graft.tools.HkToJdbc
    val url = "jdbc:derby:memory:hkDropTest;create=true"
    assert(!HkToJdbc.databaseExists(url), "fresh in-memory db must read as absent")
    assert(HkToJdbc.preflight(url, drop = false, yes = false, quiet = true),
      "absent database must load without any flag")
    val first = HkToJdbc.run(spark, zipPath, url, lenient = true, quiet = true)
    assert(HkToJdbc.databaseExists(url))

    // exists + no --drop → refuse (reference main.rs:55-61 exits cleanly)
    assert(!HkToJdbc.preflight(url, drop = false, yes = false, quiet = true))
    // exists + --drop but the prompt is declined → refuse (default(false))
    assert(!HkToJdbc.preflight(url, drop = true, yes = false, quiet = true, confirm = _ => false))
    assert(HkToJdbc.databaseExists(url), "declined prompt must not drop")
    // exists + --drop --yes → drop (no prompt), then a clean reload
    assert(HkToJdbc.preflight(url, drop = true, yes = true, quiet = true))
    assert(!HkToJdbc.databaseExists(url), "--drop --yes must leave an empty database")
    val second = HkToJdbc.run(spark, zipPath, url, lenient = true, quiet = true)
    assert(second == first, "reload after --drop must reproduce identical row counts")
  }

  test("CLI parity: --first-seen maps to the A10 compat typing mode end-to-end") {
    // same mixed-type fixture as the A2/A3 spec: value column sees "100"
    // then "12.5" — lattice mode widens to REAL, first-seen pins INTEGER
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<HealthData locale="en_US">
        | <ExportDate value="2024-01-01 10:00:00 -0800"/>
        | <Record type="HKQuantityTypeIdentifierStepCount" value="100" unit="count" startDate="2024-01-01 09:00:00 -0800" endDate="2024-01-01 09:10:00 -0800" sourceName="t"/>
        | <Record type="HKQuantityTypeIdentifierStepCount" value="12.5" unit="count" startDate="2024-01-01 09:20:00 -0800" endDate="2024-01-01 09:30:00 -0800" sourceName="t"/>
        |</HealthData>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("hk_fs_cli")
    val zp  = dir.resolve("export.zip")
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zp))
    zos.putNextEntry(new java.util.zip.ZipEntry("apple_health_export/export.xml"))
    zos.write(xml.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    val url = "jdbc:derby:memory:hkFirstSeenTest;create=true"
    graft.tools.HkToJdbc.run(spark, zp.toString, url, firstSeen = true)
    val back = spark.read
      .jdbc(url, "\"HKQuantityTypeIdentifierStepCount\"", new java.util.Properties())
    // Derby reports the first-seen INTEGER column type; the non-conforming
    // later value lands as NULL — the reference's migration behavior
    assert(back.schema("value").dataType == org.apache.spark.sql.types.IntegerType)
    val vals = back.select(col("value")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSet
    assert(vals == Set(Some(100), None))
  }

  test("reference README queries run VERBATIM via spark.sql") {
    graft.GraftExtensions.register(spark)
    tables(HealthKitXml.WorkoutTable).createOrReplaceTempView("workout")
    // README query 1, verbatim (README.md "Total walking, running, and
    // hiking workout duration"), date range widened to the fixture's year
    val dur = spark.sql(
      """select
        |  sum(duration) / 60 as total_duration
        |from
        |  workout
        |where
        |  (
        |    creationDate between '2020-01-01' and '2020-12-31'
        |  )
        |  and (
        |    workoutActivityType = 'HKWorkoutActivityTypeWalking' or
        |    workoutActivityType = 'HKWorkoutActivityTypeRunning' or
        |    workoutActivityType = 'HKWorkoutActivityTypeHiking'
        |  )""".stripMargin).collect().head.getDouble(0)
    assert(math.abs(dur - 34.18067507346471 / 60.0) < 1e-9)
    // README query 2, verbatim (json_extract + double-quoted path)
    val miles = spark.sql(
      """select
        |  sum(
        |    json_extract(
        |      workoutStatistics,
        |      "$.HKQuantityTypeIdentifierDistanceWalkingRunning.sum"
        |    )
        |  ) as total_distance_miles
        |from
        |  workout""".stripMargin).collect().head.getDouble(0)
    assert(miles > 0)
  }

  test("A1-DSv2: spark.read.format(\"healthkit\") matches the parser element-for-element") {
    import spark.implicits._
    val viaFormat = spark.read.format("healthkit").load(zipPath)
      .as[HealthKitXml.HkElement].collect().sortBy(_.ordinal)
    val direct = HealthKitXml.parseArchive(zipPath).toArray.zipWithIndex
      .map { case (e, i) => e.copy(ordinal = i.toLong) }
    assert(viaFormat.length == direct.length && viaFormat.length == 12)
    viaFormat.zip(direct).foreach { case (a, b) => assert(a == b, s"mismatch at ${a.ordinal}") }
    // the A-surface front door: elements() itself rides the format
    val plan = HealthKitXml.elements(spark, Seq(zipPath)).queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan healthkit"), s"elements() must plan a healthkit BatchScan:\n$plan")
  }

  test("A1-DSv2: column pruning reaches the scan (jsonCols projected away)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val pruned = spark.read.format("healthkit").load(zipPath).select("tableName", "ordinal")
    val scans = pruned.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.size == 1, "expected exactly one healthkit BatchScan")
    val readCols = scans.head.scan.readSchema().fieldNames.toSet
    assert(readCols == Set("tableName", "ordinal"),
      s"scan must read only the projected columns, got $readCols")
    assert(pruned.count() == 12)
    // full-width scan for contrast: all five columns read
    val full = spark.read.format("healthkit").load(zipPath)
    val fullScan = full.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    assert(fullScan.scan.readSchema().fieldNames.toSet ==
      Set("kind", "tableName", "attrs", "jsonCols", "ordinal"))
  }

  test("A1-DSv2: tableName/kind filters push into the scan; rows filter at the source") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("healthkit").load(zipPath)
      .filter(col("tableName") === HealthKitXml.ActivitySummaryTable)
    val scan = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head
    assert(scan.scan.description().contains("EqualTo(tableName,ActivitySummary)"),
      s"filter must reach the scan: ${scan.scan.description()}")
    assert(df.count() == 10)
    // scan emits ONLY the matching rows (the filter ran in the reader,
    // not in a post-scan Filter node)
    val scanRows = scan.execute().count()
    assert(scanRows == 10, s"reader must emit 10 rows, emitted $scanRows")
    // ordinals still index the FULL stream: the fixture's 10 summaries
    // lead the document (ordinals 0..9), Record/Workout follow — and a
    // Record-filtered scan must see ordinal 10, not 0
    val ords = df.select("ordinal").collect().map(_.getLong(0)).sorted
    assert(ords.toSeq == (0L to 9L).toSeq, s"got ${ords.mkString(",")}")
    val recOrd = spark.read.format("healthkit").load(zipPath)
      .filter(col("kind") === "Record")
      .select("ordinal").collect().map(_.getLong(0))
    assert(recOrd.sameElements(Array(10L)),
      s"filtered scan must keep full-stream ordinals, got ${recOrd.mkString(",")}")
  }

  test("A1-DSv2: one input partition per archive member; directory expands to zip members") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = java.nio.file.Files.createTempDirectory("hk_multi")
    val p1  = dir.resolve("a.zip"); val p2 = dir.resolve("b.zip")
    java.nio.file.Files.copy(java.nio.file.Paths.get(zipPath), p1)
    java.nio.file.Files.copy(java.nio.file.Paths.get(zipPath), p2)
    val df = spark.read.format("healthkit").load(dir.toString)
    val scan = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head
    assert(scan.inputRDD.getNumPartitions == 2, "one partition per archive member")
    assert(df.count() == 24)
    // ordinals tile per archive: (archiveIdx << 40) | elementIdx
    val ords = df.select("ordinal").as[Long](spark.implicits.newLongEncoder).collect().sorted
    assert(ords.count(_ < (1L << 40)) == 12 && ords.count(_ >= (1L << 40)) == 12)
  }

  test("A1-DSv2: lenient option skips corrupt archives and exposes the badArchives metric") {
    val dir = java.nio.file.Files.createTempDirectory("hk_bad2")
    val bad = dir.resolve("broken.zip")
    java.nio.file.Files.write(bad, "this is not a zip".getBytes)
    java.nio.file.Files.copy(java.nio.file.Paths.get(zipPath), dir.resolve("good.zip"))
    // strict: fails
    intercept[org.apache.spark.SparkException] {
      spark.read.format("healthkit").load(dir.toString).count()
    }
    // lenient: good archive survives; the scan advertises the metric
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("healthkit").option("lenient", "true").load(dir.toString)
    assert(df.count() == 12)
    val scan = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head
    assert(scan.scan.supportedCustomMetrics().map(_.name()).contains("badArchives"))
    assert(scan.metrics.contains("badArchives"), "metric must surface on the scan node")
  }

  test("A12: file://-scheme Hadoop path is byte-identical to the local fast path (both doors)") {
    // the cluster-path rehearsal: an explicit scheme routes listing through
    // FileSystem.globStatus and opens through FileSystem.open+ZipInputStream
    val local = HealthKitXml.elements(spark, Seq(zipPath)).collect().sortBy(_.ordinal).toSeq
    val had = HealthKitXml.elements(spark, Seq(s"file://$zipPath"))
      .collect().sortBy(_.ordinal).toSeq
    assert(local == had, "Hadoop-routed parse must be element-for-element identical")
    assert(local.nonEmpty && local.exists(_.jsonCols.get("geometry").exists(_.length > 2)),
      "the GPX second handle must be exercised (non-empty geometry)")
    // DSv2 front door on the scheme'd path
    val df = spark.read.format("healthkit").load(s"file://$zipPath")
    assert(df.count() == local.size.toLong)
  }

  test("A12: glob patterns list through the Hadoop filesystem") {
    val dir = java.nio.file.Files.createTempDirectory("hk_glob")
    java.nio.file.Files.copy(java.nio.file.Paths.get(zipPath), dir.resolve("a.zip"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(zipPath), dir.resolve("b.zip"))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "not an archive".getBytes)
    val df = spark.read.format("healthkit").load(s"$dir/*.zip")
    assert(df.count() == 24, "glob must match exactly the two archives")
    val df2 = spark.read.format("healthkit").load(s"file://$dir")
    assert(df2.count() == 24, "scheme'd directory listing must keep the *.zip filter")
  }

  test("A12: the DSv2 paths option survives a comma in a path (real JSON parse)") {
    val dir = java.nio.file.Files.createTempDirectory("hk, comma")
    val p   = dir.resolve("a.zip")
    java.nio.file.Files.copy(java.nio.file.Paths.get(zipPath), p)
    // two-path load → DataFrameReader encodes the "paths" option as a JSON
    // string array; the comma inside the first path must survive
    val df = spark.read.format("healthkit").load(p.toString, zipPath)
    assert(df.count() == 24, "comma-bearing path mangled by the paths-option parse")
    // unit-level: expandPaths on a crafted option map
    val m = new java.util.HashMap[String, String]()
    m.put("paths", s"""["${p.toString}"]""")
    val got = graft.sources.HealthKitTable.expandPaths(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(m))
    assert(got == Seq(p.toString), s"got $got")
  }

  test("A12: the session Hadoop conf ships with the reader factory (executor-side opens)") {
    // spark.hadoop.* overrides must reach executor-side archive opens: the
    // factory captures the driver session's conf and it must SURVIVE task
    // serialization (Configuration itself is not java-serializable)
    val conf = spark.sessionState.newHadoopConf()
    conf.set("graft.test.marker", "r13")
    val factory = graft.sources.HealthKitReaderFactory(
      graft.sources.HealthKitTable.Schema.fieldNames.toSeq, lenient = false,
      conf = new org.apache.spark.util.SerializableConfiguration(conf))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(factory); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.sources.HealthKitReaderFactory]
    assert(back.conf.value.get("graft.test.marker") == "r13",
      "session conf lost across task serialization")
    // the deserialized factory still drives a scheme'd parse end-to-end
    val reader = back.createReader(
      graft.sources.HealthKitInputPartition(s"file://$zipPath", 0L))
    assert(reader.next(), "post-round-trip reader must parse the archive")
    reader.close()
  }

  test("A12: a missing scheme'd literal path fails LOUDLY, never zero silent partitions") {
    intercept[org.apache.spark.SparkException] {
      spark.read.format("healthkit").load("file:///nonexistent/graft_r13_missing.zip").count()
    }
    // an empty GLOB is legitimately empty (file-source semantics)
    val dir = java.nio.file.Files.createTempDirectory("hk_emptyglob")
    assert(spark.read.format("healthkit").load(s"$dir/*.zip").count() == 0)
  }

  test("A12: a literal local file whose NAME contains glob metacharacters still opens") {
    // export[1].zip looks like a character-class glob; globStatus matches
    // nothing, and the resolver must fall back to the existing literal
    // file instead of silently planning zero partitions
    val dir = java.nio.file.Files.createTempDirectory("hk_globname")
    val p   = dir.resolve("export[1].zip")
    java.nio.file.Files.copy(java.nio.file.Paths.get(zipPath), p)
    assert(spark.read.format("healthkit").load(p.toString).count() == 12)
  }

  test("A12: partition reader close() disposes the archive handles (idempotent, early)") {
    val reader = graft.sources
      .HealthKitReaderFactory(graft.sources.HealthKitTable.Schema.fieldNames.toSeq, lenient = false)
      .createReader(graft.sources.HealthKitInputPartition(zipPath, 0L))
    assert(reader.next(), "fixture has elements")
    reader.close() // early termination: handles released here, not at GC
    reader.close() // idempotent
    // the LIMIT path end-to-end (early-terminated scan through the format)
    assert(spark.read.format("healthkit").load(zipPath).limit(1).collect().length == 1)
  }
}

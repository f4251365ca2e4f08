package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 is the coverage checklist the build is graded against — this
  * pins it to the code so the two cannot drift (the round-5 defect:
  * operators landed without §2 rows, and spec/registry counts were
  * asserted only in prose).
  */
class SurveyRegistrySpec extends AnyFunSuite {

  private lazy val section2: String = {
    val md = Files.readString(Paths.get("SURVEY.md"))
    md.substring(md.indexOf("\n## §2"), md.indexOf("\n## §3"))
  }

  private lazy val rows: Seq[String] =
    section2.linesIterator.filter(_.matches("\\| [A-E]\\d+b? \\|.*")).toSeq

  private lazy val surveyQueryKeys: Set[String] =
    rows.flatMap(r => "q\\d+_\\w+".r.findAllIn(r.split("\\|")(2))).toSet

  test("every registered query has a SURVEY §2 row, and every §2 query key is registered") {
    val registered = SparkEntry.queries.keySet
    val missingRow = registered -- surveyQueryKeys
    assert(missingRow.isEmpty,
      s"registered queries without a SURVEY §2 row: ${missingRow.toSeq.sorted}")
    val ghost = surveyQueryKeys -- registered
    assert(ghost.isEmpty,
      s"SURVEY §2 operator cells name unregistered query keys: ${ghost.toSeq.sorted}")
  }

  test("every registered query carries an oracle (the driver's correctness gate)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: ${noOracle.toSeq.sorted}")
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: ${dangling.toSeq.sorted}")
  }

  test("SURVEY §2's component inventory matches the registry (update the pin WITH the row)") {
    // The pinned count of oracle-backed queries + the spec-only components (HealthKit ETL
    // A-surface, B17/B19/B20, multimodal D-surface minus the oracled q31,
    // streaming E-surface incl. E45). A new component must land with its §2 row —
    // this pin fails when either side moves alone.
    assert(SparkEntry.queries.size == 254,
      s"registry moved to ${SparkEntry.queries.size} queries — update SURVEY §2 and this pin")
    assert(rows.size == 346,
      s"SURVEY §2 has ${rows.size} component rows — keep rows and registry moving together")
    val ids = rows.map(_.split("\\|")(1).trim)
    assert(ids.distinct.size == ids.size,
      s"duplicate §2 row ids: ${ids.diff(ids.distinct).distinct}")
  }

  test("self-gate artifact covers the full registry and is PASS (no stale or partial gate)") {
    // CORRECTNESS_SELF.json is the round's hard correctness signal when the
    // driver's artifact pipeline drops its copy (rounds 7 and 8) — a stale
    // or partial self-gate would silently vouch for queries it never ran.
    // Same staleness discipline as the PLANS.md pin: adding a query without
    // re-running the gate fails the suite.
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = m.readTree(Files.readAllBytes(Paths.get("CORRECTNESS_SELF.json")))
    assert(j.get("result").asText() == "PASS",
      s"self-gate result is ${j.get("result")} — rerun tools/oracle_check.py with ORACLE_CHECK_JSON")
    assert(j.get("failed").asInt() == 0, s"self-gate records failures: ${j.get("failed")}")
    val covered = j.get("queries").fieldNames()
    val names = scala.collection.mutable.Set[String]()
    while (covered.hasNext) names += covered.next()
    val missing = SparkEntry.queries.keySet -- names
    assert(missing.isEmpty,
      s"self-gate is stale — regenerate CORRECTNESS_SELF.json; uncovered: ${missing.toSeq.sorted}")
    assert(j.get("total").asInt() == SparkEntry.queries.size,
      s"self-gate total ${j.get("total")} != registry ${SparkEntry.queries.size}")
    // Source pin: the registry-size check catches ADDED queries, not edits
    // to existing operators — a gate run before an operator edit would
    // keep vouching PASS for behavior it never ran. oracle_check.py stamps
    // the gate with a hash of the oracle-result surface; recompute it over
    // the current tree and they must agree (the PLANS.md regeneration
    // discipline applied to correctness).
    val rec = Option(j.get("src_sha")).map(_.asText()).getOrElse("<absent>")
    assert(rec == srcSha,
      s"self-gate src_sha $rec != current tree $srcSha — operator sources " +
        "changed since the gate ran; rerun graft.Verify + tools/oracle_check.py")
  }

  /** Hash of the oracle-result surface — the shared [[graft.core.SrcSha]]
    * kernel (mirrored bit-for-bit by oracle_check.py's src_sha(); Verify
    * stamps the same value into the dump at dump time).
    */
  private lazy val srcSha: String = graft.core.SrcSha.compute()

  test("oracle_check.py's src_sha mirror agrees with graft.core.SrcSha (no silent drift)") {
    // The stamp/check contract only works if the Scala and Python hashes
    // are bit-identical over the same file set — drift was previously
    // comment-enforced only, and a divergence would surface as a permanent,
    // confusing stamp≠tree refusal instead of this direct message.
    val pb = new ProcessBuilder("python3", "tools/oracle_check.py", "--src-sha-only")
      .redirectErrorStream(true)
    val p =
      try pb.start()
      catch { case _: java.io.IOException => cancel("python3 not on PATH") }
    assume(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS), "python probe timed out")
    val out = new String(p.getInputStream.readAllBytes()).trim
    if (p.exitValue() != 0 && out.contains("No module named"))
      cancel(s"oracle_check.py deps unavailable: $out")
    assert(p.exitValue() == 0, s"--src-sha-only failed: $out")
    assert(out.linesIterator.toSeq.last == srcSha,
      s"oracle_check.py src_sha ${out.linesIterator.toSeq.last} != SrcSha.compute() $srcSha " +
        "— the two mirrors drifted; fix whichever side changed")
  }

  test("sf1 scaling lane covers the full registry with no gate violations (no stale lane)") {
    // BENCH_SF1_FULL.json is the 100 TB design evidence — round 8 shipped
    // it covering 210 of 211 (q211 landed after the lane ran) precisely
    // because nothing pinned it. This does.
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = m.readTree(Files.readAllBytes(Paths.get("BENCH_SF1_FULL.json")))
    assert(j.get("gate_violations").size() == 0,
      s"sf1 scaling gate violations: ${j.get("gate_violations")}")
    val it = j.get("queries").fieldNames()
    val names = scala.collection.mutable.Set[String]()
    while (it.hasNext) names += it.next()
    val missing = SparkEntry.queries.keySet -- names
    assert(missing.isEmpty,
      s"sf1 lane is stale — rerun graft.tools.BenchSf1; uncovered: ${missing.toSeq.sorted}")
    // r14: the recall gate must be PRESENT and green — cost gates alone
    // green-lit the r13 recall collapse. An artifact without the recall
    // fields is a stale lane, not a pass (the failure-marker rule).
    assert(j.has("recall_violations"),
      "sf1 lane predates the recall gate — rerun graft.tools.BenchSf1")
    assert(j.get("recall_violations").size() == 0,
      s"sf1 recall violations: ${j.get("recall_violations")}")
    val rec = j.get("recall_at_045")
    assert(rec != null && !rec.get("sf1").isNull,
      "sf1 recall@0.45 unmeasured — the gate the r13 round was missing")
    assert(rec.get("sf1").asDouble() >= graft.operators.VectorOps.NearDupRecallFloor,
      s"sf1 recall@0.45 ${rec.get("sf1")} under the floor")
    // r14: the text families' cap-loss gate (q183's measured drop share)
    assert(j.has("drop_share_violations"),
      "sf1 lane predates the drop-share gate — rerun graft.tools.BenchSf1")
    assert(j.get("drop_share_violations").size() == 0,
      s"text cap-loss violations: ${j.get("drop_share_violations")}")
  }
}

package graft

import graft.functions.DuckHash
import graft.operators.{TextOps, TrainingOps, VectorOps}

/** Structural guards for the DuckDB xxhash64-emulation SQL emitter — the
  * machinery behind the exact oracles of q25/q26/q29/q40/q42/q44/q45.
  * Value-level validation is the driver's DuckDB gate (and
  * tools/oracle_check.py); these pin the two invariants that made the
  * emitter correct AND tractable, so a refactor can't silently drop them:
  *
  *  1. every chain level is MATERIALIZED (DuckDB inlines lateral aliases
  *     and single-use CTEs, re-evaluating chained hash expressions
  *     exponentially — q25's oracle went 202 s → 12 s on this alone);
  *  2. no list_reduce uses a STRUCT accumulator (DuckDB 1.0 leaks fold
  *     state across rows in vectorized batches for struct accumulators).
  */
class DuckHashSpec extends SparkSpec {

  private val oracles = Map(
    "q25" -> TextOps.minhashLshSql,
    "q26" -> TextOps.simhashSql,
    "q29" -> VectorOps.annLshSql,
    "q40" -> TrainingOps.splitHashSql,
    "q42" -> TrainingOps.kmvDistinctSql,
    "q44" -> TrainingOps.countMinTopTermsSql,
    "q45" -> TrainingOps.stratifiedSampleSql
  )

  test("every hash-chain CTE is MATERIALIZED") {
    oracles.foreach { case (name, sql) =>
      val defs  = "AS (?:MATERIALIZED )?\\(".r.findAllIn(sql).size
      val mats  = "AS MATERIALIZED \\(".r.findAllIn(sql).size
      assert(defs == mats, s"$name: $defs CTEs but only $mats materialized")
    }
  }

  test("no list_reduce uses a struct accumulator") {
    oracles.foreach { case (name, sql) =>
      // struct accumulators look like list_prepend({'field': ...
      assert(!sql.contains("list_prepend({"), s"$name folds over a struct accumulator")
    }
  }

  test("mod-2^64 arithmetic and signed mapping appear where expected") {
    oracles.values.foreach { sql =>
      assert(sql.contains(DuckHash.Mod))
    }
    // signed view used wherever Spark longs are compared/min'd
    assert(TextOps.minhashLshSql.contains("9223372036854775808"))
  }

  test("the q25 oracle keeps its structural stages") {
    val sql = TextOps.minhashLshSql
    // distinct-shingle hashing, 32-permutation explode, 4 band-fold rounds,
    // bucket-size cap — the scale/sanity skeleton of the exact oracle
    assert(sql.contains("SELECT DISTINCT s FROM"))
    assert(sql.contains("range(0, 32)"))
    (0 until 4).foreach(r => assert(sql.contains(s"q25f${r}in"), s"missing band fold round $r"))
    assert(sql.contains("BETWEEN 2 AND 1000"))
  }
}

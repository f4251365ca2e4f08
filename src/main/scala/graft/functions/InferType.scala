package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HealthKit value-string type inference, Spark-first.
  *
  * The reference derives a SQL type for every attribute string
  * (reference `src/core.rs:171-204`): i32 → INTEGER, f32 → REAL,
  * `yyyy-MM-dd[ HH:mm:ss ±hhmm]` → DATE, else TEXT — checked in that order.
  *
  * Re-expressed as a pure `Column` expression (a `CASE WHEN rlike` chain) so
  * it stays inside whole-stage codegen and runs distributed — no UDF, no
  * driver round-trip. The i32 check is approximated with a 1–9 digit bound
  * (all i32-range values the reference accepts except 10-digit edge cases,
  * which widen harmlessly to REAL).
  */
object InferType {
  // \A/\z anchors, not ^/$: Java's find-semantics `rlike` lets $ match
  // before a trailing newline, which would disagree with both
  // String.matches (full match) and DuckDB's regexp_matches on "42\n".
  val IntRe  = "\\A[+-]?[0-9]{1,9}\\z"
  val RealRe = "\\A[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?\\z"
  val DateRe = "\\A[0-9]{4}-[0-9]{2}-[0-9]{2}\\z"
  val OffsetDateRe =
    "\\A[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2} [+-][0-9]{4}\\z"

  /** SQL type name for a value string, matching the reference's precedence. */
  def inferType(c: Column): Column =
    when(c.rlike(IntRe), "INTEGER")
      .when(c.rlike(RealRe), "REAL")
      .when(c.rlike(DateRe) || c.rlike(OffsetDateRe), "DATE")
      .otherwise("TEXT")

  /** Raw Catalyst tree form of [[inferType]], for SQL function registration
    * (the Column form wraps lazy column nodes that don't resolve through the
    * function registry).
    */
  def inferTypeExpr(
      child: org.apache.spark.sql.catalyst.expressions.Expression
  ): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Literal, Or, RLike}
    def rl(re: String) = RLike(child, Literal(re))
    CaseWhen(
      Seq(
        rl(IntRe)  -> Literal("INTEGER"),
        rl(RealRe) -> Literal("REAL"),
        Or(rl(DateRe), rl(OffsetDateRe)) -> Literal("DATE")
      ),
      Some(Literal("TEXT"))
    )
  }

  /** The same decision procedure for plain strings (schema-inference path). */
  def inferTypeStr(v: String): String =
    if (v.matches(IntRe)) "INTEGER"
    else if (v.matches(RealRe)) "REAL"
    else if (v.matches(DateRe) || v.matches(OffsetDateRe)) "DATE"
    else "TEXT"

  /** Widening lattice used by distributed schema inference: unlike the
    * reference's first-seen-wins (document order, `core.rs:219`), a
    * distributed inference must be order-free, so conflicting observations
    * widen: INTEGER ⊔ REAL = REAL, anything ⊔ TEXT = TEXT, DATE vs numeric =
    * TEXT. Deterministic under any partitioning.
    */
  def widen(a: String, b: String): String =
    if (a == b) a
    else
      (a, b) match {
        case ("INTEGER", "REAL") | ("REAL", "INTEGER") => "REAL"
        case _                                         => "TEXT"
      }

  /** The DuckDB-side CASE expression equivalent to [[inferType]], for oracle
    * SQL construction — built from the SAME regex constants so the two
    * engines can't drift. RE2 and Java regex agree on these patterns
    * (incl. \A/\z anchors).
    */
  def duckdbCase(col: String): String =
    s"""CASE
       | WHEN regexp_matches($col, '$IntRe') THEN 'INTEGER'
       | WHEN regexp_matches($col, '$RealRe') THEN 'REAL'
       | WHEN regexp_matches($col, '$DateRe')
       |   OR regexp_matches($col, '$OffsetDateRe') THEN 'DATE'
       | ELSE 'TEXT' END""".stripMargin.replace("\n", " ")
}

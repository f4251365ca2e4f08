package graft.core

import java.nio.file.{Files, Path, Paths}

/** Hash of the oracle-result surface — every source file whose edit can
  * change a registered query's answer. [[graft.Verify]] stamps it into the
  * dump at DUMP time (so the gate vouches for the code that actually ran,
  * not whatever tree exists when the checker fires), `tools/oracle_check.py`
  * re-derives it and refuses to publish on mismatch, and
  * SurveyRegistrySpec asserts the published gate matches the current tree.
  * Mirrored bit-for-bit by oracle_check.py's `src_sha()`: same file set,
  * same sorted relpath + NUL + bytes framing, first 16 hex chars. Python's
  * glob never matches leading-dot names, so hidden files and files under
  * hidden directories are excluded here too.
  */
object SrcSha {

  private val Roots = Seq(
    "src/main/scala/graft/operators",
    "src/main/scala/graft/queries",
    "src/main/scala/graft/functions",
    "src/main/scala/graft/plans",
    "src/main/scala/graft/core",
    "src/main/scala/org")

  private val Fixed = Seq(
    "src/main/scala/graft/SparkEntry.scala",
    "src/main/scala/graft/GraftExtensions.scala")

  private def hidden(p: Path): Boolean = {
    var i = 0
    while (i < p.getNameCount) {
      if (p.getName(i).toString.startsWith(".")) return true
      i += 1
    }
    false
  }

  /** Sorted repo-relative paths of every file in the oracle-result
    * surface — the exact set [[compute]] hashes. Exposed so
    * [[graft.Verify]] can compare source mtimes against compiled
    * bytecode and refuse a dump whose classes predate an edit.
    */
  def surfaceFiles(repoRoot: String = "."): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(repoRoot)
    val globbed = Roots.flatMap { r =>
      val dir = root.resolve(r)
      if (!Files.isDirectory(dir)) Nil
      else {
        val s = Files.walk(dir)
        try s.iterator().asScala
          .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".scala")
            && !hidden(root.relativize(f)))
          .map(f => root.relativize(f).toString.replace('\\', '/'))
          .toList
        finally s.close()
      }
    }
    (Fixed.filter(f => Files.isRegularFile(root.resolve(f))) ++ globbed).sorted
  }

  def compute(repoRoot: String = "."): String = {
    val root = Paths.get(repoRoot)
    val files = surfaceFiles(repoRoot)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    files.foreach { p =>
      md.update(p.getBytes("UTF-8"))
      md.update(0.toByte)
      md.update(Files.readAllBytes(root.resolve(p)))
    }
    md.digest().map(b => f"$b%02x").mkString.take(16)
  }
}

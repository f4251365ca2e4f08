package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump one oracle SQL (or with no args, list the keys) so a
  * single query's DuckDB emulation can be pre-flighted without re-running
  * the whole Verify suite. Usage: runMain graft.tools.OracleDump <name> <out>
  */
object OracleDump {
  def main(args: Array[String]): Unit = args match {
    case Array(name, out) =>
      Files.write(Paths.get(out), graft.SparkEntry.oracleSql(name).getBytes("UTF-8"))
      println(s"[oracle-dump] wrote $name to $out")
    case _ =>
      graft.SparkEntry.oracleSql.keys.toSeq.sorted.foreach(println)
  }
}

package graft.tools

import java.nio.file.{Files, Paths}
import graft.{SparkEntry, SparkSpec}

/** Dump selected registered queries (+ their oracle SQL) in the Verify
  * layout so `scripts/oracle_check.py` gates JUST those — the fast
  * inner loop while building one operator, instead of a full Verify.
  *
  * Usage: `Test/runMain graft.tools.OneQuery <outDir> <query...> [-- <sfDir>]`
  * then `python3 scripts/oracle_check.py <outDir> <sfDir>`.
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val (head, rest) = args.span(_ != "--")
    val outDir = head.head
    val names = head.tail
    val dir = rest.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSpec.session
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      SparkEntry.queries(n)(s, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[onequery] wrote $outDir/$n")
    }
    def q(str: String): String = "\"" + str.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}

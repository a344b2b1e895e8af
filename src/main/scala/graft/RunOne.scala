package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: dump ONE SparkEntry query (plus its oracle SQL) the way
  * [[Verify]] does for all of them — for iterating on a single operator
  * without paying the full 90-query verify pass.
  *
  * Usage: runMain graft.RunOne <name> <sfDir> <outDir>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_one.sql"), sql)
      // Rebuild outDir/oracle_sql.json (selfcheck.py's input) covering
      // every query already dumped into outDir, so incremental RunOne
      // dumps are directly checkable with
      //   python3 scripts/selfcheck.py <sfDir> <outDir>
      // No JSON parsing needed: the dump dirs ARE the key set.
      def esc(s2: String): String = "\"" + s2.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val dumped = Option(new java.io.File(outDir).listFiles()).toSeq.flatten
        .filter(_.isDirectory).map(_.getName)
        .filter(SparkEntry.oracleSql.contains).sorted
      val body = dumped
        .map(k => s"${esc(k)}: ${esc(SparkEntry.oracleSql(k))}")
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), body)
    }
    spark.stop()
  }
}

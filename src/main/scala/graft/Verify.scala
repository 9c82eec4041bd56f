package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Dev knobs (the driver never sets them): SPARK_GRAFT_MASTER runs
    // the gate under an alternative master — local-cluster[2,8,8192]
    // gives SEPARATE executor JVMs, surfacing closure-serialization,
    // @transient re-init and broadcast-lifecycle bugs that local[n]
    // structurally hides; SPARK_GRAFT_JARS ships the packaged graft
    // jar to those executors (sbt package first).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev aid: SPARK_GRAFT_ONLY=q1,q2 restricts the dump to a subset
    // (same contract as Bench). The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // A FULL dump starts from an EMPTY output dir: a reused dir can
    // carry result directories for queries since renamed or removed,
    // which the driver's directory enumeration (and tools/check.py)
    // counts as extra rows-only entries — stale state masquerading as
    // inventory (seen with a renamed query's day-old output). Subset
    // runs (the SPARK_GRAFT_ONLY fast loop) overwrite surgically and
    // must NOT wipe the sibling results they iterate beside.
    val outRoot = new java.io.File(outDir)
    if (only.isEmpty && outRoot.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(outRoot)
    }
    outRoot.mkdirs()
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    // A thrown query used to leave no output directory, and directory
    // enumeration (driver + tools/check.py) reads absence as "not there"
    // rather than FAIL — so regressions were silent (round-6 postmortem).
    // Record every failure in _errors.json and exit nonzero at the end.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Dev aid: SPARK_GRAFT_TRACE=1 marks each query on stderr so a
    // mid-run WARN (cache double-entry, skew, partition collapse) is
    // attributable to the query that logged it. Driver never sets it.
    val trace = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
    selected.foreach { case (name, fn) =>
      if (trace) System.err.println(s"[verify] running $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg.take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
      sys.exit(1)
    }
  }
}

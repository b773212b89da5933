package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM smoke for the conf-only extensions path: a fresh JVM whose
  * ONLY graft hookup is `spark.sql.extensions` (exactly what
  * `spark-submit --conf spark.sql.extensions=...` does) must get the whole
  * `graft_*` + `vec_dot` surface. Spawned by [[SqlFunctionsSpec]] —
  * `spark.sql.extensions` is a static conf, so it can only take effect on
  * a freshly-created SparkContext, never on the suite JVM's shared one.
  */
object ExtensionsConfSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-conf-smoke")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(spark.sql("SELECT graft_url_host('http://h7.test/a/b.html')")
      .head().getString(0) == "h7.test", "graft_url_host")
    require(spark.sql("SELECT graft_inner_text('<p>hi <b>there</b></p>')")
      .head().getString(0) == "hi there", "graft_inner_text")
    require(spark.sql("SELECT graft_robots_allowed('User-agent: *\\nDisallow: /p/', '*', '/q/a')")
      .head().getBoolean(0), "graft_robots_allowed")
    val df = spark.range(1).selectExpr(
      "vec_dot(array(cast(id AS double), 2.0D), array(3.0D, 4.0D)) AS d")
    require(df.head().getDouble(0) == 8.0, "vec_dot value")
    val plan = df.queryExecution.executedPlan.toString
    require(plan.toLowerCase.contains("vecdot") && !plan.contains("UDF"),
      s"vec_dot must plan as the native expression:\n$plan")
    println("EXTENSIONS_CONF_SMOKE_OK")
    spark.stop()
  }
}

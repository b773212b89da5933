package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway A/B probe (guide §1): LinkGraph.pagerank's loop shapes over
  * a FIXED, pre-materialized edge table — isolates the rank loop from the
  * hub crawl so a regression can be attributed to the loop change alone.
  * Shape A = r5 (two joins/iter, uncoalesced dims); B = current.
  */
object RankAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val B = org.apache.spark.sql.GraftSqlBridge

    // materialize the edge list once, outside both timed shapes
    graft.corpus.Fixtures.corpus(spark, sfDir)
    val edgesSrc = graft.SparkEntry.queries("link_graph")(spark, sfDir)
      .select("src_host", "dst_host", "n_links")
    val edges = B.lazyCache(edgesSrc)
    println(s"RANKAB edges=${edges.count()}")

    def shapeA(edges: DataFrame, iters: Int): DataFrame = {
      val e = B.lazyCache(edges)
      val hosts = B.lazyCache(
        e.select(col("src_host").as("host"))
          .union(e.select(col("dst_host").as("host"))).distinct())
      val h = hosts.count()
      def bcast(df: DataFrame): DataFrame = broadcast(df)
      val ew = B.lazyCache(e
        .join(bcast(e.groupBy("src_host").agg(sum("n_links").as("ow"))), "src_host")
        .select(col("src_host"), col("dst_host"), col("n_links"), col("ow")))
      val base = (15L * (1000000000000L / h)) / 100L
      var rank = hosts.select(col("host"), lit(1000000000000L / h).as("rank"))
      for (_ <- 1 to iters) {
        val contrib = ew.join(bcast(rank), ew("src_host") === rank("host"))
          .select(col("dst_host"),
            expr("(n_links * ((85 * rank) div ow)) div 100").as("c"))
          .groupBy("dst_host").agg(sum("c").as("inmass"))
        rank = hosts.join(bcast(contrib), hosts("host") === contrib("dst_host"), "left")
          .select(hosts("host"), (lit(base) + coalesce(col("inmass"), lit(0L))).as("rank"))
      }
      rank.orderBy("host")
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"RANKAB $name ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    // C = coalesced tiny dims (driver-known counts) + A's two-join loop
    def shapeC(edges: DataFrame, iters: Int): DataFrame = {
      val e = B.lazyCache(edges)
      val hosts0 = B.lazyCache(
        e.select(col("src_host").as("host"))
          .union(e.select(col("dst_host").as("host"))).distinct())
      val h = hosts0.count()
      val nE = e.count()
      def capFor(rows: Long): Int = math.max(1, math.min(32, (rows + 49999) / 50000)).toInt
      val hosts = B.lazyCache(hosts0, capFor(h))
      def bcast(df: DataFrame): DataFrame = broadcast(df)
      val eS = B.lazyCache(e, capFor(nE))
      val ew = B.lazyCache(eS
        .join(bcast(eS.groupBy("src_host").agg(sum("n_links").as("ow"))), "src_host")
        .select(col("src_host"), col("dst_host"), col("n_links"), col("ow")), capFor(nE))
      val base = (15L * (1000000000000L / h)) / 100L
      var rank = hosts.select(col("host"), lit(1000000000000L / h).as("rank"))
      for (_ <- 1 to iters) {
        val contrib = ew.join(bcast(rank), ew("src_host") === rank("host"))
          .select(col("dst_host"),
            expr("(n_links * ((85 * rank) div ow)) div 100").as("c"))
          .groupBy("dst_host").agg(sum("c").as("inmass"))
        rank = hosts.join(bcast(contrib), hosts("host") === contrib("dst_host"), "left")
          .select(hosts("host"), (lit(base) + coalesce(col("inmass"), lit(0L))).as("rank"))
      }
      rank.orderBy("host")
    }
    (1 to 4).foreach { r =>
      time(s"A(old)    rep$r")(shapeA(edges, 5).count())
      time(s"B(new)    rep$r")(graft.pipeline.LinkGraph.pagerank(edges, 5).count())
      time(s"C(hybrid) rep$r")(shapeC(edges, 5).count())
    }
    spark.stop()
  }
}

package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.urls.Urls

/** Output sinks mirroring the reference's side-channel outputs. */
object Sinks {

  /** S9 DownloadFile (`/root/reference/svcimpl.go:36-151`): the reference
    * navigates and waits for a CDP download to land on local disk, then
    * hands the file path to a callback. Spark-native: write each url's
    * payload bytes as one file named by the url hash, via foreachPartition
    * (executor-local IO, no driver funnel). Returns the output dir.
    */
  def downloadFiles(pages: DataFrame, outDir: String): String = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    pages.select(col("url"), col("html")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val url = r.getString(0)
          val bytes = r.get(1) match {
            case b: Array[Byte] => b
            case s: String      => s.getBytes("UTF-8")
            case _              => Array.empty[Byte]
          }
          val name = java.lang.Long.toHexString(Urls.urlHash(Urls.canonicalize(url)))
          val ext = url.split('.').lastOption.filter(_.length <= 5).getOrElse("bin")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.$ext"), bytes)
        }
    }
    outDir
  }

  /** S8 debug sink (`svcimpl.go:505-529` writes screenshot_%d.png +
    * index_%d.html per page when Debug): lineage-grade equivalent — raw
    * html + extraction outputs per page to a parquet debug path,
    * partitioned by crawl round (page_no).
    */
  def debugDump(crawled: DataFrame, corpus: DataFrame, outDir: String): String = {
    crawled
      .join(corpus.select(col("url"), col("html")), Seq("url"), "left")
      .select(col("seed_id"), col("page_no"), col("url"), col("html"),
        col("pos"), col("item"), col("next_page_url"), col("error"))
      .write.mode(SaveMode.Overwrite).partitionBy("page_no").parquet(outDir)
    outDir
  }
}

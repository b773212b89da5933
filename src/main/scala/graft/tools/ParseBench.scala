package graft.tools

/** Single-threaded parse+extract microbench over the real fixture pages
  * (guide §1: isolate per-task work before optimizing it). No Spark — JVM
  * only — so allocation/time attribution is clean. Reports wall time and
  * allocated bytes (TLAB-accurate via ThreadMXBean) per phase.
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val docs = (0L until 1000L).map { d =>
      graft.corpus.Fixtures.Doc(d, ("the quick brown fox jumps over the lazy dog " * 12).trim, "en")
    }
    val pages = docs.flatMap(d => graft.corpus.Fixtures.pagesForDoc(d))
      .filter(p => p.url.contains("/list/") || p.url.contains("/cmt/") || p.url.contains("/more/"))
      .map(p => (p.url, new String(p.html, java.nio.charset.StandardCharsets.UTF_8)))
    println(s"PARSEBENCH pages=${pages.size}")

    val tb = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    def allocated(): Long = tb.getThreadAllocatedBytes(tid)

    val job = graft.CrawlQueries.listJob
    val xjob = graft.CrawlQueries.cmtJob
    for (r <- 1 to reps) {
      var t0 = System.nanoTime(); var a0 = allocated()
      var n = 0
      pages.foreach { case (_, html) => val d = graft.extract.Extractor.parseDocument(html); n += d.children.length }
      println(f"PARSEBENCH rep$r parse-only   ${(System.nanoTime - t0) / 1e6}%8.1f ms  ${(allocated() - a0) / 1048576.0}%8.1f MB alloc")

      t0 = System.nanoTime(); a0 = allocated()
      pages.foreach { case (url, html) =>
        val d = graft.extract.Extractor.parseDocument(html)
        if (url.contains("/cmt/"))
          graft.extract.Extractor.extractPage(d, xjob, 1, url, graft.extract.JsProperty)
        else
          graft.extract.Extractor.extractPage(d, job, 1, url, graft.extract.JsProperty)
      }
      println(f"PARSEBENCH rep$r parse+extract ${(System.nanoTime - t0) / 1e6}%8.1f ms  ${(allocated() - a0) / 1048576.0}%8.1f MB alloc")

      for (fam <- Seq("/list/", "/cmt/", "/more/")) {
        val fp = pages.filter(_._1.contains(fam))
        t0 = System.nanoTime(); a0 = allocated()
        fp.foreach { case (url, html) =>
          val d = graft.extract.Extractor.parseDocument(html)
          val j = if (fam == "/cmt/") xjob else job
          graft.extract.Extractor.extractPage(d, j, 1, url, graft.extract.JsProperty)
        }
        println(f"PARSEBENCH rep$r   $fam%-7s n=${fp.size}%5d ${(System.nanoTime - t0) / 1e6}%8.1f ms  ${(allocated() - a0) / 1048576.0}%8.1f MB alloc")
      }
    }
  }
}

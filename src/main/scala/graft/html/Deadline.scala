package graft.html

/** Cooperative per-page extraction time budget (SURVEY.md L12; the
  * reference bounds every step with a chromedp context timeout,
  * `svcimpl.go:321-327`). Pure-JVM selector engines can't be cancelled
  * externally, so the budget is enforced cooperatively: the crawl
  * expression arms a thread-local deadline around one page's
  * parse+extract, and the DOM traversal iterator (the hot loop every CSS/
  * XPath walk funnels through) polls it every [[Stride]] visits — a
  * pathological page (adversarial nesting, selector blowup) aborts with
  * [[Deadline.Exceeded]], which the expression's recover() turns into an
  * `error = "timeout..."` row without failing the stage.
  */
object Deadline {

  final class Exceeded extends RuntimeException("timeout: extraction budget exceeded")

  private val Stride = 1024

  private val deadlineMs = new ThreadLocal[Long] { override def initialValue(): Long = 0L }
  private val counter = new ThreadLocal[Int] { override def initialValue(): Int = 0 }

  def arm(budgetMs: Long): Unit =
    if (budgetMs > 0) deadlineMs.set(System.currentTimeMillis() + budgetMs)

  def disarm(): Unit = deadlineMs.set(0L)

  /** One poll point; costs two ThreadLocal reads, reads the clock once per
    * [[Stride]] calls.
    */
  def check(): Unit = {
    val d = deadlineMs.get
    if (d != 0L) {
      val c = counter.get
      if (c <= 0) {
        counter.set(Stride)
        if (System.currentTimeMillis() > d) throw new Exceeded
      } else counter.set(c - 1)
    }
  }
}

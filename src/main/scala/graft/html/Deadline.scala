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

  // fast-path gate: number of threads currently armed, anywhere in the JVM.
  // When 0 (budgets unused — the common case), check() is ONE volatile read,
  // so the poll point costs nothing measurable in the parse/extract loops.
  @volatile private var armedThreads = 0

  private val deadlineMs = new ThreadLocal[Long] { override def initialValue(): Long = 0L }
  private val counter = new ThreadLocal[Int] { override def initialValue(): Int = 0 }

  def arm(budgetMs: Long): Unit =
    if (budgetMs > 0) {
      deadlineMs.set(System.currentTimeMillis() + budgetMs)
      synchronized { armedThreads += 1 }
    }

  def disarm(): Unit =
    if (deadlineMs.get != 0L) {
      deadlineMs.set(0L)
      synchronized { armedThreads -= 1 }
    }

  /** One poll point; a single volatile read when no thread is armed, two
    * ThreadLocal reads when some thread is, the clock once per [[Stride]]
    * calls on the armed thread itself.
    */
  def check(): Unit = {
    if (armedThreads != 0) {
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
}

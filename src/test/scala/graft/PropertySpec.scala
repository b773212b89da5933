package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.html._
import graft.css.Css
import graft.xpath.XPathAttr
import graft.urls.Urls
import graft.extract._

/** Property-based tests (SURVEY.md §5 "our strategy"): selector-tree
  * algebra laws, cursor monotonicity, canonicalization idempotence,
  * parser robustness on arbitrary input.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic property driver: n samples from the generator with
    * fixed seeds (scalatestplus bridge is not in the offline cache).
    */
  def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  def forAll[A, B](genA: Gen[A], genB: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 60).foreach { i =>
      for {
        a <- genA.apply(Gen.Parameters.default, Seed(42L + i))
        b <- genB.apply(Gen.Parameters.default, Seed(1042L + i))
      } f(a, b)
    }

  val word: Gen[String] = Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty)
  val words: Gen[List[String]] = Gen.listOfN(6, word)

  test("parser never throws on arbitrary byte soup") {
    forAll(Gen.asciiPrintableStr) { s =>
      val root = HtmlParser.parse(s)
      assert(root.tag == "html")
    }
  }

  test("parse → serialize → parse is a fixpoint (canonical form)") {
    forAll(words) { ws =>
      val html = s"<div id='a'><p>${ws.mkString(" ")}</p><span class='x'>${ws.headOption.getOrElse("")}</span></div>"
      val t1 = HtmlParser.parse(html)
      val s1 = Serializer.outerHtml(t1)
      val t2 = HtmlParser.parse(s1)
      val s2 = Serializer.outerHtml(t2)
      assert(s1 == s2)
    }
  }

  test("zero-drop law: empty leaf values never appear in extraction output") {
    forAll(words) { ws =>
      val items = ws.map(w => s"<li><b>$w</b><i></i></li>").mkString
      val doc = Extractor.parseDocument(s"<ul>$items</ul>")
      val sel = Selector(scope = "ul > li",
        attrs = Some(Map("b" -> Selector(css = "b"), "i" -> Selector(css = "i"))))
      val out = Extractor.populate(null, sel, doc, "http://x/", JsProperty)
      out.foreach {
        case XRec(f) =>
          assert(!f.contains("i"), "empty <i> must be zero-dropped")
          assert(f.get("b").forall { case XStr(s) => s.nonEmpty; case _ => true })
        case _ => fail("expected records")
      }
      assert(out.size == ws.count(_.nonEmpty))
    }
  }

  test("concat-all law: leaf over n matches == concatenation of per-match innerText") {
    forAll(words) { ws =>
      val html = s"<div id='c'>${ws.map(w => s"<p>$w</p>").mkString}</div>"
      val doc = Extractor.parseDocument(html)
      val ctx = Css.selectFirst(doc, "#c").get
      val sel = Selector(css = "p") // attr empty, css set → concat-all (P3)
      val leaf = Extractor.populate(ctx, sel.copy(scope = ""), doc, "", JsProperty)
      // scope empty + father → leaf on the node itself
      val expected = ws.map(w => Text.innerText(HtmlParser.parse(s"<p>$w</p>").descendants.find(_.tag == "p").get)).mkString
      val got = Css.selectAll(ctx, "p").map(Text.innerText).mkString
      assert(got == expected)
      val _ = leaf
    }
  }

  test("cursor rewrite monotonicity: nth-child(n+k) selects exactly the suffix") {
    forAll(Gen.chooseNum(1, 20), Gen.chooseNum(0, 20)) { (n, cursor) =>
      val items = (1 to n).map(i => s"<li>item$i</li>").mkString
      val doc = Extractor.parseDocument(s"<ul id='l'>$items</ul>")
      val all = Css.selectAll(doc, "#l > li")
      val suffix = Css.selectAll(doc, s"#l > li:nth-child(n+${cursor + 1})")
      assert(suffix.map(Text.innerText) == all.drop(cursor).map(Text.innerText))
    }
  }

  test("xpath cursor scope: position() filter equals drop(cursor)") {
    forAll(Gen.chooseNum(1, 15), Gen.chooseNum(0, 15)) { (n, cursor) =>
      val items = (1 to n).map(i => s"<li>i$i</li>").mkString
      val doc = Extractor.parseDocument(s"<ul>$items</ul>")
      val rewritten = XPathAttr.cursorScopeByPosition("//ul/li", cursor + 1)
      val got = graft.xpath.XPath.find(doc, rewritten).collect { case e: HElem => Text.rawText(e) }
      val all = graft.xpath.XPath.find(doc, "//ul/li").collect { case e: HElem => Text.rawText(e) }
      assert(got == all.drop(cursor))
    }
  }

  test("url canonicalization is idempotent") {
    val urlGen = for {
      host <- Gen.oneOf("A.Example.COM", "h7.test", "x.y.z")
      port <- Gen.oneOf("", ":80", ":8080")
      path <- Gen.oneOf("", "/", "/a/b", "/a/../c", "/a/./b")
      q <- Gen.oneOf("", "?k=v")
      frag <- Gen.oneOf("", "#top")
    } yield s"http://$host$port$path$q$frag"
    forAll(urlGen) { u =>
      val c1 = Urls.canonicalize(u)
      assert(Urls.canonicalize(c1) == c1)
      assert(!c1.contains("#"))
      assert(!c1.contains("/../") && !c1.contains("/./"))
    }
  }

  test("politeness gap bounds: scheduled gaps within [delayMin, delayMax]") {
    // deterministic jitter: gap = delayMin + urlHash % span — by
    // construction within bounds; verify through the public column
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import s.implicits._
    val rows = (1 to 50).map(i => (s"http://h0.test/p$i", "h0.test", Urls.urlHash(s"http://h0.test/p$i")))
    val df = rows.toDF("url", "host", "url_hash")
    val out = graft.engine.Politeness.schedule(df,
      graft.engine.Politeness.Config(delayMinMs = 100, delayMaxMs = 300))
      .orderBy("fetch_seq").select("scheduled_ms").collect().map(_.getLong(0))
    val gaps = out.sliding(2).collect { case Array(a, b) => b - a }.toSeq
    assert(gaps.forall(g => g >= 100 && g <= 300), s"gaps out of bounds: $gaps")
  }
}

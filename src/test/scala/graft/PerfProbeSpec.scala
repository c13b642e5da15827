package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.gen.FixtureGen

class PerfProbeSpec extends AnyFunSuite {
  ignore("perf probe: single-thread extraction microbench (opt-in diagnostic — flip to test() to run)") {
    val rows = (0L until 2000L).map(i => FixtureGen.fixture(i, 8).row).toVector
    val html = rows.filter(r => r.html.nonEmpty && !PdfParser.isPdf(r.html))
    val pdf = rows.filter(r => PdfParser.isPdf(r.html))
    def time(rs: Vector[PageRow], passes: Int = 5): Double = {
      var best = Double.MaxValue
      for (_ <- 0 until passes) {
        val t0 = System.nanoTime()
        var i = 0; var acc = 0L
        while (i < rs.length) { acc += Extractor.extract(rs(i)).text.length; i += 1 }
        val us = (System.nanoTime() - t0) / 1000.0 / rs.length
        if (us < best) best = us
        if (acc == -1) println("")
      }
      best
    }
    // tokenizer-only lower bound (null sink)
    def timeTok(rs: Vector[PageRow]): Double = {
      val sink = new HtmlTokenizer.Sink {
        override def startTag(n: String, sc: Boolean): Unit = ()
        override def endTag(n: String): Unit = ()
        override def textChunk(s: String, a: Int, b: Int): Unit = ()
        override def textStr(s: String): Unit = ()
      }
      var best = Double.MaxValue
      for (_ <- 0 until 5) {
        val t0 = System.nanoTime()
        var i = 0
        while (i < rs.length) { HtmlTokenizer.tokenize(rs(i).html, sink); i += 1 }
        val us = (System.nanoTime() - t0) / 1000.0 / rs.length
        if (us < best) best = us
      }
      best
    }
    val h = time(html); val p = time(pdf); val tk = timeTok(html)
    println(f"PERF html ${h}%.1f us/doc (tokenize-only ${tk}%.1f) pdf ${p}%.1f us/doc")
  }

  ignore("perf probe: wordBoxes attribution (opt-in diagnostic — VERDICT r4 #4)") {
    // x_word_boxes went 0.22 s (r3, inline-generated pages) → 0.64 s (r4,
    // parquet fixture) at sf0.1 (5000 docs): this probe separates the
    // scalar wordBoxes parse cost from fixture generation/IO, per boost.
    for (boost <- Seq(1, 8)) {
      val rows = (0L until 2000L).map(i => FixtureGen.fixture(i, boost).row).toVector
      def time(passes: Int = 5): Double = {
        var best = Double.MaxValue
        for (_ <- 0 until passes) {
          val t0 = System.nanoTime()
          var i = 0; var acc = 0L
          while (i < rows.length) { acc += Extractor.wordBoxes(rows(i)).length; i += 1 }
          val us = (System.nanoTime() - t0) / 1000.0 / rows.length
          if (us < best) best = us
          if (acc == -1) println("")
        }
        best
      }
      val nBoxes = rows.map(r => Extractor.wordBoxes(r).length.toLong).sum
      println(f"PERF-WORDBOXES boost=$boost ${time()}%.1f us/doc ($nBoxes boxes / ${rows.length} docs)")
    }
  }

  ignore("perf probe: per-family attribution incl. image-decode cost (opt-in diagnostic)") {
    // Attributes the r3 x_extract_text growth (VERDICT r3 item 5): the r3
    // fixtures added image XObjects + spacing ops to the PDFs; this probe
    // separates generation cost, parse cost and payload-decode cost per
    // family, at both the x_* corpus shape (boost=1) and the bench
    // corpus shape (boost=8).
    for (boost <- Seq(1, 8)) {
      val tg0 = System.nanoTime()
      val rows = (0L until 2000L).map(i => FixtureGen.fixture(i, boost).row).toVector
      val genUs = (System.nanoTime() - tg0) / 1000.0 / rows.length
      val html = rows.filter(r => r.html.nonEmpty && !PdfParser.isPdf(r.html))
      val pdfAll = rows.filter(r => PdfParser.isPdf(r.html))
      val (pdfImg, pdfTxt) = pdfAll.partition(r =>
        Extractor.extract(r, decodeImages = false).images.nonEmpty)
      def time(rs: Vector[PageRow], decode: Boolean, passes: Int = 5): Double = {
        var best = Double.MaxValue
        for (_ <- 0 until passes) {
          val t0 = System.nanoTime()
          var i = 0; var acc = 0L
          while (i < rs.length) {
            acc += Extractor.extract(rs(i), decodeImages = decode).text.length; i += 1
          }
          val us = (System.nanoTime() - t0) / 1000.0 / math.max(rs.length, 1)
          if (us < best) best = us
          if (acc == -1) println("")
        }
        best
      }
      println(f"PERF-FAMILY boost=$boost gen ${genUs}%.1f us/doc (cold) | " +
        f"html ${time(html, decode = false)}%.1f us/doc | " +
        f"pdf-text-only ${time(pdfTxt, decode = false)}%.1f | " +
        f"pdf-with-images decode=off ${time(pdfImg, decode = false)}%.1f " +
        f"decode=on ${time(pdfImg, decode = true)}%.1f us/doc " +
        f"(nhtml=${html.length} npdfTxt=${pdfTxt.length} npdfImg=${pdfImg.length})")
    }
  }
}

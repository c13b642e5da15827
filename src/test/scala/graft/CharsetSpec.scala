package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.{Charset, StandardCharsets}
import graft.core.{HtmlExtractor, HtmlTokenizer}

/** Charset sniffing paths: BOMs, meta charset, Latin-1/cp1252 fallbacks —
  * the Common-Crawl encoding mess (UTF-8 default per the majority). */
class CharsetSpec extends AnyFunSuite {

  private def textOf(bytes: Array[Byte]): Vector[String] =
    HtmlExtractor.extract(bytes).blocks.map(_.text)

  test("utf-16le and utf-16be with BOM decode") {
    val html = "<html><body><p>Héllo wörld</p></body></html>"
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ html.getBytes(StandardCharsets.UTF_16LE)
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ html.getBytes(StandardCharsets.UTF_16BE)
    assert(textOf(le) == Vector("Héllo wörld"))
    assert(textOf(be) == Vector("Héllo wörld"))
  }

  test("meta charset=iso-8859-1 decodes high bytes") {
    val html = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>café ü</p></body></html>"
    val bytes = html.getBytes(StandardCharsets.ISO_8859_1)
    assert(textOf(bytes) == Vector("café ü"))
  }

  test("meta charset=windows-1252 decodes smart quotes") {
    val html = "<html><head><meta charset='windows-1252'></head><body><p>“quoted”</p></body></html>"
    val bytes = html.getBytes(Charset.forName("windows-1252"))
    assert(textOf(bytes) == Vector("“quoted”"))
  }

  test("no declaration defaults to utf-8") {
    val html = "<body><p>日本 data</p></body>"
    assert(textOf(html.getBytes(StandardCharsets.UTF_8)) == Vector("日本 data"))
  }

  test("sniff is bounded: charset= beyond 2048 bytes is ignored") {
    val pad = "<!-- " + ("x" * 2100) + " -->"
    val html = pad + "<html><head><meta charset=\"iso-8859-1\"></head><body><p>ok</p></body></html>"
    val (cs, off) = HtmlTokenizer.sniffCharset(html.getBytes(StandardCharsets.ISO_8859_1))
    assert(cs == StandardCharsets.UTF_8 && off == 0)
  }
}

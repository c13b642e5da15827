package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** sitemap.xml source — the crawl-frontier feed next to robots.txt
  * (sitemaps.org protocol 0.9): `<urlset>` documents list page URLs
  * (`<url><loc>…</loc><lastmod>…</lastmod></url>`), `<sitemapindex>`
  * documents list child sitemaps (`<sitemap><loc>…</loc></sitemap>`).
  * URLs are entity-escaped per the spec — `<loc>` text decodes through
  * the shared XML entity decoder (CDATA inlines, comments strip).
  *
  * Scanner discipline = [[XbrlInstance]]/[[Xlsx]]: one hand-rolled pass
  * over the raw text (only container tags and two leaf texts matter),
  * namespace prefixes dropped to local names, unknown elements skipped,
  * hostile input yields fewer entries and never throws. Distributed
  * form is a narrow flatMap per sitemap body — zero shuffle. */
object Sitemap {

  /** One frontier entry: kind = "url" (urlset) | "sitemap" (index);
    * lastmod is "" when absent. */
  final case class Entry(kind: String, loc: String, lastmod: String)

  def parseEntries(xml: String): Vector[Entry] = {
    val out = Vector.newBuilder[Entry]
    val n = xml.length
    var container: String = null
    var loc = ""
    var lastmod = ""
    var i = 0
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (xml.startsWith("<!--", lt)) {
        val e = xml.indexOf("-->", lt + 4)
        i = if (e < 0) n else e + 3
      } else if (xml.startsWith("<![CDATA[", lt)) {
        val e = xml.indexOf("]]>", lt + 9)
        i = if (e < 0) n else e + 3
      } else if (lt + 1 < n && (xml.charAt(lt + 1) == '?' || xml.charAt(lt + 1) == '!')) {
        val e = xml.indexOf('>', lt + 1)
        i = if (e < 0) n else e + 1
      } else if (lt + 1 < n && xml.charAt(lt + 1) == '/') { // closing tag
        val e = xml.indexOf('>', lt + 1)
        val name = local(xml.substring(lt + 2, if (e < 0) n else e).trim)
        if (name == container) {
          if (loc.nonEmpty) out += Entry(container, loc, lastmod)
          container = null; loc = ""; lastmod = ""
        }
        i = if (e < 0) n else e + 1
      } else { // start tag
        val gt = XbrlInstance.tagEnd(xml, lt + 1)
        if (gt < 0) { i = n }
        else {
          val selfClosing = xml.charAt(gt - 1) == '/'
          var te = lt + 1
          while (te < gt && !Character.isWhitespace(xml.charAt(te)) &&
            xml.charAt(te) != '/') te += 1
          val name = local(xml.substring(lt + 1, te))
          name match {
            case "url" | "sitemap" if !selfClosing =>
              container = name; loc = ""; lastmod = ""
            case "loc" if container != null && !selfClosing =>
              loc = XbrlInstance.immediateText(xml, gt + 1).trim
            case "lastmod" if container != null && !selfClosing =>
              lastmod = XbrlInstance.immediateText(xml, gt + 1).trim
            case _ => ()
          }
          i = gt + 1
        }
      }
    }
    out.result()
  }

  private def local(tag: String): String = {
    val t = tag.substring(tag.indexOf(':') + 1)
    t.toLowerCase(java.util.Locale.ROOT) // locale-proof (Turkish dotless i)
  }

  /** Distributed form: per-body frontier entries, keyed by the caller's
    * id column — (idCol, kind, loc, lastmod). Null bodies yield none. */
  def sitemapEntries(sitemaps: DataFrame, idCol: String = "sid",
      bodyCol: String = "body"): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(col(idCol).cast("string"), col(bodyCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (id, body) =>
        if (id == null || body == null) Iterator.empty
        else {
          val entries =
            try parseEntries(body)
            catch { case _: Exception => Vector.empty }
          entries.iterator.map(e => (id, e.kind, e.loc, e.lastmod))
        }
      }.toDF(idCol, "kind", "loc", "lastmod")
  }
}

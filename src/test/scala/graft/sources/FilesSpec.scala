package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

/** Filename-period parser + date-range filter contract
  * (reference: scraping/scraper.py:128-211). */
class FilesSpec extends AnyFunSuite {

  test("parseFileDate: daily / monthly / yearly / garbage") {
    assert(Files.parseFileDate("20150218.export.CSV.zip") ==
      Some((LocalDate.of(2015, 2, 18), LocalDate.of(2015, 2, 18))))
    assert(Files.parseFileDate("201502.zip") ==
      Some((LocalDate.of(2015, 2, 1), LocalDate.of(2015, 2, 28))))
    assert(Files.parseFileDate("201602.zip") ==
      Some((LocalDate.of(2016, 2, 1), LocalDate.of(2016, 2, 29)))) // leap
    assert(Files.parseFileDate("1979.zip") ==
      Some((LocalDate.of(1979, 1, 1), LocalDate.of(1979, 12, 31))))
    assert(Files.parseFileDate("20151301.export.CSV.zip").isEmpty) // month 13
    assert(Files.parseFileDate("201513.zip").isEmpty)
    assert(Files.parseFileDate("readme.txt").isEmpty)
    assert(Files.parseFileDate("2015.tar.zip").isEmpty)
  }

  test("scanGdeltLinks: filters archive names, resolves relative, downgrades https") {
    val html =
      """<html><body>
        |<a href="20130401.export.CSV.zip">daily relative</a>
        |<a href="https://data.gdeltproject.org/events/201302.zip">monthly https</a>
        |<A HREF='http://data.gdeltproject.org/events/1983.zip'>yearly quoted</A>
        |<a href=2004.zip>yearly unquoted</a>
        |<a href="index.html">not a dataset</a>
        |<a href="README.TXT">nor this</a>
        |<a href="20130401.export.csv.zip">case-sensitive daily suffix (ref contract)</a>
        |<a name="anchor-without-href">skip</a>
        |</body></html>""".stripMargin
    val urls = Files.scanGdeltLinks(html, "http://data.gdeltproject.org/events/")
    assert(urls == Seq(
      "http://data.gdeltproject.org/events/20130401.export.CSV.zip",
      "http://data.gdeltproject.org/events/201302.zip",
      "http://data.gdeltproject.org/events/1983.zip",
      "http://data.gdeltproject.org/events/2004.zip"))
  }

  test("detectFileType") {
    assert(Files.detectFileType("20150218.export.CSV.zip") == "daily")
    assert(Files.detectFileType("201502.zip") == "monthly")
    assert(Files.detectFileType("1979.zip") == "yearly")
    assert(Files.detectFileType("x.zip") == "unknown")
  }

  test("filterUrlsByDate: overlap semantics, open bounds, unparseable drop") {
    val urls = Seq(
      "http://x/20150218.export.CSV.zip", // 2015-02-18
      "http://x/201501.zip",              // Jan 2015
      "http://x/2014.zip",                // year 2014
      "http://x/notadate.zip")
    val d = (s: String) => LocalDate.parse(s)
    // both bounds None: unchanged (even unparseable kept)
    assert(Files.filterUrlsByDate(urls, None, None) == urls)
    // window covering only Feb 2015
    assert(Files.filterUrlsByDate(urls, Some(d("2015-02-01")), Some(d("2015-02-28")))
      == Seq("http://x/20150218.export.CSV.zip"))
    // overlap at the boundary day: Jan 2015 file overlaps [2015-01-31, ...]
    assert(Files.filterUrlsByDate(urls, Some(d("2015-01-31")), None)
      == Seq("http://x/20150218.export.CSV.zip", "http://x/201501.zip"))
    // open start: everything up to end of 2014
    assert(Files.filterUrlsByDate(urls, None, Some(d("2014-12-31")))
      == Seq("http://x/2014.zip"))
  }
}

package graft.sources

import java.time.LocalDate
import scala.util.Try

/** Pure file/URL helpers for the ingest surface (SURVEY.md §2.1 S2–S3,
  * §2.8 F2–F4; reference: scraping/scraper.py:128-211,
  * conversion/converter.py:43-45,98-105). Driver-side utilities — no Spark
  * types — kept out of the data plane and unit-tested directly.
  */
object Files {

  /** GDELT archive file-naming conventions. */
  private val DailyName = """^(\d{8})\.export\.CSV\.zip$""".r
  private val MonthlyName = """^(\d{6})\.zip$""".r
  private val YearlyName = """^(\d{4})\.zip$""".r

  /** File-type detection by name (converter.py:98-105). */
  def detectFileType(zipName: String): String = zipName match {
    case DailyName(_)   => "daily"
    case MonthlyName(_) => "monthly"
    case YearlyName(_)  => "yearly"
    case _              => "unknown"
  }

  /** (period_start, period_end) covered by a GDELT archive filename:
    * daily = one day, monthly = calendar month, yearly = calendar year;
    * None when unparseable or an invalid calendar date
    * (scraper.py:128-168). */
  def parseFileDate(filename: String): Option[(LocalDate, LocalDate)] =
    if (filename.endsWith(".export.CSV.zip")) {
      val raw = filename.take(8)
      if (raw.length == 8 && raw.forall(_.isDigit))
        Try {
          val d = LocalDate.of(raw.take(4).toInt, raw.slice(4, 6).toInt, raw.slice(6, 8).toInt)
          (d, d)
        }.toOption
      else None
    } else if (filename.length == 10 && filename.endsWith(".zip") &&
               filename.take(6).forall(_.isDigit)) {
      Try {
        val start = LocalDate.of(filename.take(4).toInt, filename.slice(4, 6).toInt, 1)
        (start, start.withDayOfMonth(start.lengthOfMonth))
      }.toOption
    } else if (filename.length == 8 && filename.endsWith(".zip") &&
               filename.take(4).forall(_.isDigit)) {
      Try {
        val y = filename.take(4).toInt
        (LocalDate.of(y, 1, 1), LocalDate.of(y, 12, 31))
      }.toOption
    } else None

  /** GDELT dataset links from a static HTML listing (SURVEY.md §2.1 S1;
    * reference: scraping/scraper.py:78-122 minus the Selenium driver — the
    * events listing is a static page, the browser there is incidental).
    * Every `<a href>` is extracted, relative refs resolve against
    * `baseUrl` (mirroring Selenium's absolute `get_attribute("href")`),
    * names are filtered by the reference's three archive shapes
    * (scraper.py:110-115: daily = `*.export.CSV.zip`; monthly = 6 leading
    * digits and length 10; yearly = 4 leading digits and length 8 — pure
    * length checks, faithfully mirrored), and https downgrades to http
    * exactly once per URL (scraper.py:116). */
  def scanGdeltLinks(html: String, baseUrl: String): Seq[String] = {
    val hrefRe = """(?is)<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>"']+))""".r
    val base = java.net.URI.create(baseUrl)
    hrefRe.findAllMatchIn(html).flatMap { m =>
      val raw = Option(m.group(2)).orElse(Option(m.group(3)))
        .orElse(Option(m.group(4))).getOrElse("")
      Try(base.resolve(raw).toString).toOption
    }.filter { url =>
      val name = url.split('/').last
      val daily = name.endsWith(".export.CSV.zip")
      val monthly = name.length == 10 && name.take(6).forall(_.isDigit)
      val yearly = name.length == 8 && name.take(4).forall(_.isDigit)
      daily || monthly || yearly
    }.map { u =>
      if (u.startsWith("https://")) "http://" + u.stripPrefix("https://") else u
    }.toSeq
  }

  /** Interval-overlap test with open bounds (scraper.py:197-203). */
  def overlaps(fileStart: LocalDate, fileEnd: LocalDate,
               start: Option[LocalDate], end: Option[LocalDate]): Boolean =
    !start.exists(s => fileEnd.isBefore(s)) && !end.exists(e => fileStart.isAfter(e))

  /** Keep URLs whose file period overlaps [start, end]; unparseable names
    * are dropped; both bounds None returns the list unchanged
    * (scraper.py:171-211). */
  def filterUrlsByDate(urls: Seq[String], start: Option[LocalDate],
                       end: Option[LocalDate]): Seq[String] =
    if (start.isEmpty && end.isEmpty) urls
    else urls.filter { url =>
      val name = url.split('/').last
      parseFileDate(name).exists { case (fs, fe) => overlaps(fs, fe, start, end) }
    }
}

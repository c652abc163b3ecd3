package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL scalar ops, re-expressing the reference's CascalogFunctions:
  *  - NormalizeURL (batch: BatchWorkflow.java:183-210; streaming:
  *    TridentSpeedLayer.java:37-51): rewrite to protocol://host/path,
  *    dropping port, query string and fragment. The batch version passes
  *    malformed URLs through unchanged; the streaming version drops them.
  *  - ExtractDomain (BatchWorkflow.java:495-505, TridentSpeedLayer.java:107-117):
  *    URL -> authority (host[:port]); malformed dropped (null here).
  *
  * Implemented as small Scala UDFs over java.net.URL for exact parity with
  * the reference's java.net.URL-based parsing (ports, userinfo, IPv6 hosts
  * — `parse_url` differs on edge cases). These run in whole-stage codegen
  * as non-codegen leaf expressions; acceptable since they're O(row) string
  * ops off the shuffle path.
  */
object UrlFunctions {

  // new URL(String) for exact parity with the reference's parsing
  // (BatchWorkflow.java:199-206) — java.net.URI rejects inputs URL
  // accepts (unescaped chars, some authority forms). Not deprecated on
  // the Java 17 toolchain.
  private def parse(url: String): java.net.URL =
    try new java.net.URL(url)
    catch { case _: Exception => null }

  /** protocol://host/path, or the input unchanged when malformed (batch
    * semantics of NormalizeURL). Host case is preserved, as the reference
    * preserves it.
    */
  val normalizeUrlUdf = udf { (url: String) =>
    if (url == null) null
    else {
      val u = parse(url)
      if (u == null) url
      else s"${u.getProtocol}://${u.getHost}${u.getPath}"
    }
  }

  /** protocol://host/path, or null when malformed (streaming semantics —
    * malformed records are dropped by a downstream filter).
    */
  val normalizeUrlStrictUdf = udf { (url: String) =>
    if (url == null) null
    else {
      val u = parse(url)
      if (u == null) null
      else s"${u.getProtocol}://${u.getHost}${u.getPath}"
    }
  }

  /** Authority (host[:port]) or null when malformed. */
  val extractDomainUdf = udf { (url: String) =>
    if (url == null) null
    else {
      val u = parse(url)
      if (u == null) null else u.getAuthority
    }
  }

  def normalizeUrl(url: Column): Column = normalizeUrlUdf(url)
  def normalizeUrlStrict(url: Column): Column = normalizeUrlStrictUdf(url)
  def extractDomain(url: Column): Column = extractDomainUdf(url)
}

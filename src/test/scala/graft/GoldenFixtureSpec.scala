package graft

import graft.functions.TimeFunctions._
import graft.functions.UrlFunctions._
import graft.operators.{GraphOps, Sessionize}
import org.apache.spark.sql.functions._

/** Golden tests on the reference's own 10-fact mini-fixture
  * (FIXTURES.md §2; reference BatchWorkflow.initTestData,
  * src/java/manning/batchlayer/BatchWorkflow.java:77-102).
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  // (user, url, tsSecs) pageviews — fixture rows 1-6, 9-10.
  private def pageviews = Seq(
    (1L, "http://foo.com/post1", 60L),
    (3L, "http://foo.com/post1", 62L),
    (1L, "http://foo.com/post1", 4000L),
    (1L, "http://foo.com/post2", 4000L),
    (1L, "http://foo.com/post2", 10000L),
    (5L, "http://foo.com/post3", 10600L),
    (2L, "http://foo.com/post1", 60L),
    (2L, "http://foo.com/post3", 62L)
  ).toDF("user", "url", "ts_secs")

  // Equiv edges 1≡3, 3≡5 — fixture rows 7-8.
  private def equivs = Seq((1L, 3L), (3L, 5L)).toDF("src", "dst")

  test("connected components: {1,3,5} collapses to canonical 1, singleton 2 untouched") {
    val labels = GraphOps.connectedComponents(equivs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("union-typed CC: mixed cookie/user chain collapses to the cookie (tag order)") {
    import graft.model.PersonId
    // user7 ≡ ckA, user9 ≡ ckA, user9 ≡ user11: one component whose smallest
    // member under the union order (cookie tag 1 < user tag 2,
    // PersonID.java:322-326) is the cookie. ckB ≡ user20 is separate.
    val pairs = Seq(
      (PersonId.ofUser(7L), PersonId.ofCookie("ckA")),
      (PersonId.ofUser(9L), PersonId.ofCookie("ckA")),
      (PersonId.ofUser(9L), PersonId.ofUser(11L)),
      (PersonId.ofCookie("ckB"), PersonId.ofUser(20L)))
    val edges = pairs.toDF("id1", "id2")
      .select(GraphOps.personKey(col("id1")).as("src"),
        GraphOps.personKey(col("id2")).as("dst"))
    val labels = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    def user(u: Long) = f"2:$u%019d"
    assert(labels(user(7)) == "1:ckA")
    assert(labels(user(9)) == "1:ckA")
    assert(labels(user(11)) == "1:ckA")
    assert(labels("1:ckA") == "1:ckA")
    assert(labels(user(20)) == "1:ckB")
  }

  test("personKey preserves PersonId.sortKey total order") {
    import graft.model.PersonId
    val ids = Seq(PersonId.ofCookie("zz"), PersonId.ofCookie("aa"),
      PersonId.ofUser(5L), PersonId.ofUser(123456789L), PersonId.ofUser(0L))
    val byKey = ids.map(Tuple1(_)).toDF("id")
      .select(GraphOps.personKey(col("id")).as("k"))
      .orderBy("k").as[String].collect().toSeq
    val expected = ids.sortBy(_.sortKey).map {
      id => id.cookie.map("1:" + _).getOrElse(f"2:${id.userId.get}%019d")
    }
    assert(byKey == expected)
  }

  test("hour buckets: fixture timestamps land in buckets 0,1,2") {
    val got = pageviews.select(col("ts_secs"), hourBucket(col("ts_secs")).as("hb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(60L -> 0L, 62L -> 0L, 4000L -> 1L, 10000L -> 2L, 10600L -> 2L))
  }

  test("granularities: hour buckets 0-2 all roll to day/week/month 0") {
    val rows = pageviews
      .select(granularities(hourBucket(col("ts_secs"))).as("gb"))
      .select($"gb.g", $"gb.bucket").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("h", 0L), ("h", 1L), ("h", 2L), ("d", 0L), ("w", 0L), ("m", 0L)))
  }

  test("uniques after id normalization: post1={1,2}, post2={1}, post3={1,2}") {
    val labels = GraphOps.connectedComponents(equivs)
    val normalized = pageviews
      .join(labels.withColumnRenamed("node", "user"), Seq("user"), "left_outer")
      .select(coalesce(col("label"), col("user")).as("person"), col("url"))
    val uniques = normalized.groupBy("url").agg(countDistinct($"person").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uniques == Map(
      "http://foo.com/post1" -> 2L,
      "http://foo.com/post2" -> 1L,
      "http://foo.com/post3" -> 2L))
  }

  test("sessionize (intended 15-min-gap semantics): user1 3 visits, user2 1 visit, 0 bounces") {
    val labels = GraphOps.connectedComponents(equivs)
    val normalized = pageviews
      .join(labels.withColumnRenamed("node", "user"), Seq("user"), "left_outer")
      .select(coalesce(col("label"), col("user")).as("user_id"),
        extractDomain(col("url")).as("domain"), col("ts_secs"),
        monotonically_increasing_id().as("event_id"))
    val visits = Sessionize.sessions(
      normalized, Seq("domain", "user_id"), col("ts_secs"), col("event_id"))
    // user 1 (absorbing 3 and 5): {60,62} {4000,4000} {10000,10600} = 3 visits
    assert(visits.where($"user_id" === 1).count() == 3)
    // user 2: {60,62} = 1 visit
    assert(visits.where($"user_id" === 2).count() == 1)
    // no single-pageview visits in the fixture
    assert(visits.where($"n_pageviews" === 1).count() == 0)
  }

  test("NormalizeURL: strips port/query/fragment, keeps path; malformed passes through") {
    val got = Seq(
      "https://Foo.com:8080/a/b?q=1#frag",
      "http://foo.com/post1",
      "not a url at all"
    ).toDF("url").select(normalizeUrl($"url")).as[String].collect()
    // host case preserved — exact java.net.URL parity with the reference
    assert(got(0) == "https://Foo.com/a/b")
    assert(got(1) == "http://foo.com/post1")
    assert(got(2) == "not a url at all") // batch semantics: pass through
  }

  test("NormalizeURL strict (streaming): malformed dropped to null") {
    val got = Seq("::nope::", "http://ok.com/x")
      .toDF("url").select(normalizeUrlStrict($"url")).as[String].collect()
    assert(got.toSet == Set(null, "http://ok.com/x"))
  }

  test("ExtractDomain: authority keeps port, malformed null") {
    val got = Seq("https://foo.com:8080/a", "http://foo.com/b", "::nope::")
      .toDF("url").select(extractDomain($"url")).as[String].collect()
    assert(got.toSet == Set("foo.com:8080", "foo.com", null))
  }
}

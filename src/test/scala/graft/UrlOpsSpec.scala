package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("each canonicalization step, alone and stacked") {
    assert(canon(
      "HTTP://Example.COM/path",          // case on scheme+host only
      "http://ex.com:80/path",            // default port
      "http://ex.com:8080/path",          // NON-default port survives
      "http://ex.com/path/",              // trailing slash
      "http://ex.com/",                   // root slash survives
      "http://ex.com/path#frag",          // fragment
      "http://ex.com/path?utm_source=a",  // lone utm
      "http://ex.com/path?utm_source=a&b=1", // leading utm
      "http://ex.com/path?b=1&utm_source=a", // trailing utm
      "http://ex.com/path?b=1&utm_a=x&utm_b=y", // repeated utm
      "http://ex.com/Path/Sub?Q=V",       // path/query case KEPT
      "HTTP://Ex.COM:80/p/?utm_medium=z#s" // everything at once
    ) == Seq(
      "http://example.com/path",
      "http://ex.com/path",
      "http://ex.com:8080/path",
      "http://ex.com/path",
      "http://ex.com/",
      "http://ex.com/path",
      "http://ex.com/path",
      "http://ex.com/path?b=1",
      "http://ex.com/path?b=1",
      "http://ex.com/path?b=1",
      "http://ex.com/Path/Sub?Q=V",
      "http://ex.com/p"))
  }

  test("canonicalization is idempotent") {
    val once = canon(
      "HTTP://Ex.COM:80/p/x/?utm_source=a&k=1#f",
      "http://a.com/b?utm_x=1&utm_y=2",
      "https://A.B.C:80/")
    val twice = {
      import spark.implicits._
      once.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).collect()
        .map(_.getString(0)).toSeq
    }
    assert(once == twice)
  }

  test("urlDedup collapses variants and keeps the smallest id") {
    import spark.implicits._
    val df = Seq(
      (1L, "http://a.com/x"),
      (2L, "HTTP://A.COM:80/x/"),
      (3L, "http://a.com/x?utm_source=s"),
      (4L, "http://a.com/y"),
      (5L, "http://a.com/x")).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(df, "url", "doc_id")
      .orderBy("canonical_url").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("http://a.com/x", 4L, 3L, 1L), ("http://a.com/y", 1L, 1L, 4L)))
  }

  test("the canonicalizer stays native (no UDF in the plan)") {
    import spark.implicits._
    val plan = Seq("http://x.com/a").toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u"))).queryExecution
      .executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"canonicalizer must be native expressions:\n$plan")
  }
}

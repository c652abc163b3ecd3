package graft

import org.scalatest.funsuite.AnyFunSuite

/** The content-keyed serving-index cache's concurrency contract: the
  * map memoizes FUTURES so insertion is O(1) under the bin lock and the
  * minutes-long Spark build runs outside it — a nested serve (a build
  * that composes another cached index) must neither deadlock nor hit
  * computeIfAbsent's IllegalStateException, concurrent callers on one
  * key share a single build, and a failed build caches nothing.
  * No SparkSession needed: the cache is Spark-agnostic by design.
  */
class IndexCacheSpec extends AnyFunSuite {

  private def key(tag: String) = s"icache_spec_${tag}_${System.nanoTime()}"

  test("nested serve of a different key inside a running build completes (no map-lock held across the build)") {
    // under the old build-inside-computeIfAbsent shape this is exactly
    // the recursive-update case the CHM contract forbids
    val outer = key("outer")
    val inner = key("inner")
    var innerDir: String = null
    val outerDir = IndexCache.serve(outer, "icache_spec") { _ =>
      innerDir = IndexCache.serve(inner, "icache_spec")(_ => ())
    }
    assert(innerDir != null && outerDir != null && innerDir != outerDir)
    // both memoized: a second serve returns the same dir, builds nothing
    assert(IndexCache.serve(outer, "icache_spec")(_ => fail("rebuilt")) == outerDir)
    assert(IndexCache.serve(inner, "icache_spec")(_ => fail("rebuilt")) == innerDir)
  }

  test("concurrent callers on one key share ONE build and all observe its dir") {
    val k = key("conc")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => results.add(IndexCache.serve(k, "icache_spec") { _ =>
        builds.incrementAndGet()
        entered.countDown()
        // hold the build long enough that every loser is blocked on the
        // future, not served from a completed cache
        assert(release.await(30, java.util.concurrent.TimeUnit.SECONDS))
      }))
    }
    threads.foreach(_.start())
    assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS))
    release.countDown()
    threads.foreach(_.join(30000))
    assert(builds.get() == 1, s"one builder per key, got ${builds.get()}")
    assert(results.size == 4 && results.toArray.distinct.length == 1,
      "every caller serves the single build's dir")
  }

  test("a FAILED build caches nothing: awaiters see the builder's exception, the next caller retries fresh") {
    val k = key("fail")
    val boom = new RuntimeException("build died")
    val thrown = intercept[RuntimeException](
      IndexCache.serve(k, "icache_spec")(_ => throw boom))
    assert(thrown eq boom, "the builder's own exception surfaces, not a wrapper")
    // retry succeeds into a fresh dir — the failed future was removed
    var built = false
    val d = IndexCache.serve(k, "icache_spec")(_ => built = true)
    assert(built && d.nonEmpty, "the key must be retryable after a failed build")
  }

  test("a concurrent awaiter of a failing build gets the failure, then retries successfully") {
    val k = key("failconc")
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var awaiterError: Throwable = null
    val builder = new Thread(() => {
      intercept[RuntimeException](IndexCache.serve(k, "icache_spec") { _ =>
        entered.countDown()
        assert(release.await(30, java.util.concurrent.TimeUnit.SECONDS))
        throw new RuntimeException("build died")
      })
      ()
    })
    builder.start()
    assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS))
    val awaiter = new Thread(() => {
      try IndexCache.serve(k, "icache_spec")(_ => ())
      catch { case t: Throwable => awaiterError = t }
    })
    awaiter.start()
    Thread.sleep(100) // let the awaiter block on the in-flight future
    release.countDown()
    builder.join(30000); awaiter.join(30000)
    // the awaiter either observed the failure or (if it raced the
    // removal) ran its own successful build — both are correct; what is
    // FORBIDDEN is hanging or serving a dir from the failed build
    if (awaiterError != null)
      assert(awaiterError.getMessage == "build died",
        s"unexpected awaiter error: $awaiterError")
    // and the key is serviceable afterwards either way
    assert(IndexCache.serve(k, "icache_spec")(_ => ()).nonEmpty)
  }
}

package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** In-JVM semantics of the fixture build lock (the cross-process
  * FileLock layer is exercised by the concurrent-Verify chaos runs:
  * two overlapped `graft.Verify` JVMs on one warehouse reproduce the
  * round-9/10 driver-board mview reds without the lock and come back
  * green with it). */
class FixtureLockSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nested builder calls re-enter the same key without deadlock") {
    spark.sparkContext // force session so FixtureLock sees a warehouse
    val out = FixtureLock.build("/re/entrant") {
      FixtureLock.build("/re/entrant") { 41 } + 1
    }
    assert(out == 42)
  }

  test("two threads serialize on one key; the section never interleaves") {
    spark.sparkContext
    val pool = Executors.newFixedThreadPool(2)
    val started = new CountDownLatch(2)
    // atomic read-modify-write: a broken lock must not be able to
    // slip past a racy detector
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val fs = (1 to 2).map { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          started.countDown(); started.await()
          FixtureLock.build("/contended/key") {
            val n = inside.incrementAndGet()
            maxInside.accumulateAndGet(n, math.max)
            Thread.sleep(50)
            inside.decrementAndGet()
          }
        }
      })
    }
    fs.foreach(_.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(maxInside.get == 1,
      s"critical section interleaved: ${maxInside.get}")
  }

  test("the _locks directory never surfaces as a catalog namespace") {
    FixtureLock.build("/ns/visibility") { () } // materializes _locks
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    assert(new java.io.File(wh, "_locks").isDirectory,
      "lock dir should exist inside the warehouse")
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0))
    assert(!ns.contains("_locks"),
      s"internal lock dir leaked into SHOW NAMESPACES: ${ns.mkString(",")}")
  }

  test("distinct keys do not block each other") {
    spark.sparkContext
    val pool = Executors.newFixedThreadPool(2)
    val bothIn = new CountDownLatch(2)
    val release = new CountDownLatch(1)
    val fs = Seq("/key/a", "/key/b").map { k =>
      pool.submit(new Runnable {
        override def run(): Unit = FixtureLock.build(k) {
          bothIn.countDown()
          release.await(10, TimeUnit.SECONDS)
        }
      })
    }
    // both sections entered concurrently — would time out if keyed
    // sections serialized globally
    assert(bothIn.await(10, TimeUnit.SECONDS),
      "independent keys blocked each other")
    release.countDown()
    fs.foreach(_.get(10, TimeUnit.SECONDS))
    pool.shutdown()
  }
}

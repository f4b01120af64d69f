package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives the Java API demo (see JavaApiDemo.java) — catalog DDL,
  * insert, and a pruned query from Java code. */
class JavaApiSpec extends AnyFunSuite {
  test("Java callers use the catalog and DataFrame API directly") {
    assert(JavaApiDemo.roundTrip(TestSpark.spark) == 2L)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Par

class ParSpec extends AnyFunSuite {

  test("regionActive is visible from both threads of a pair and clears after") {
    assert(!Par.regionActive)
    val (a, b) = Par.pair(Par.regionActive, Par.regionActive)
    assert(a && b)
    assert(!Par.regionActive)
  }

  test("regionActive clears even when a thunk fails") {
    intercept[IllegalStateException] {
      Par.pair(throw new IllegalStateException("boom"), ())
    }
    assert(!Par.regionActive)
  }

  test("pair waits for both and rethrows the first failure") {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[IllegalStateException] {
      Par.pair(
        throw new IllegalStateException("first"),
        { Thread.sleep(50); done.set(true) })
    }
    assert(done.get, "pair must wait for the surviving thunk")
  }
}

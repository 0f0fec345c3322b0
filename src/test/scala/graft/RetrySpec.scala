package graft

import graft.sources.Retry
import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures, with exponential sleeps") {
    var calls = 0
    var sleeps = Vector.empty[Long]
    val out = Retry.withBackoff(5, baseDelayMs = 10,
      sleep = d => sleeps :+= d) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(sleeps == Vector(10L, 20L))
  }

  test("rethrows the last failure once attempts are exhausted") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(3, baseDelayMs = 1, sleep = _ => ()) {
        calls += 1
        throw new RuntimeException(s"fail $calls")
      }
    }
    assert(calls == 3 && e.getMessage == "fail 3")
  }

  test("does not retry programming errors") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.withBackoff(5, sleep = _ => ()) {
        calls += 1
        throw new IllegalArgumentException("bug")
      }
    }
    assert(calls == 1)
  }

  test("caps the backoff delay") {
    var sleeps = Vector.empty[Long]
    intercept[RuntimeException] {
      Retry.withBackoff(8, baseDelayMs = 100, maxDelayMs = 300,
        sleep = d => sleeps :+= d) {
        throw new RuntimeException("always")
      }
    }
    assert(sleeps.max == 300L && sleeps.length == 7)
  }

  test("backoff delay never goes negative at high attempt counts " +
    "(shift clamp, no Long overflow)") {
    var sleeps = Vector.empty[Long]
    intercept[RuntimeException] {
      Retry.withBackoff(70, baseDelayMs = 100, maxDelayMs = 30000,
        sleep = d => sleeps :+= d) {
        throw new RuntimeException("always")
      }
    }
    assert(sleeps.length == 69)
    assert(sleeps.forall(d => d >= 0 && d <= 30000),
      s"negative or uncapped delay in $sleeps")
    assert(sleeps.max == 30000L)
  }
}

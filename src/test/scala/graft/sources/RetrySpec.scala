package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("retries with exponential backoff, succeeds within the budget") {
    var calls = 0
    val sleeps = scala.collection.mutable.Buffer[Long]()
    val out = Retry.withRetries(attempts = 5, initialBackoffMs = 100,
      sleep = sleeps.append(_)) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok")
    assert(calls == 3)
    assert(sleeps.toList == List(100L, 200L))
  }

  test("exhausted attempts rethrow the last error") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries(attempts = 3, sleep = _ => ()) {
        calls += 1
        throw new RuntimeException(s"fail $calls")
      }
    }
    assert(calls == 3)
    assert(e.getMessage == "fail 3")
  }

  test("first-try success never sleeps") {
    var slept = false
    assert(Retry.withRetries(sleep = _ => slept = true)(42) == 42)
    assert(!slept)
  }
}

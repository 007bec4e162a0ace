package graft.pipeline

import org.scalatest.funspec.AnyFunSpec

/** maxTimeout retry budget (reference KinesisS3Emitter.scala:116-148:
  * fixed-backoff retry, hard give-up after maxTimeout of continuous
  * failure).
  */
class RetrySpec extends AnyFunSpec {

  describe("Emitter.retryForAtMost") {
    it("returns the first success without sleeping") {
      var calls = 0
      val r = Emitter.retryForAtMost(1000, 1) { calls += 1; 42 }
      assert(r == 42 && calls == 1)
    }

    it("retries through transient failures") {
      var calls = 0
      val r = Emitter.retryForAtMost(5000, 1) {
        calls += 1
        if (calls < 3) sys.error("transient")
        "ok"
      }
      assert(r == "ok" && calls == 3)
    }

    it("gives up after the budget with the cause attached") {
      var calls = 0
      val e = intercept[RuntimeException] {
        Emitter.retryForAtMost(50, 5) { calls += 1; sys.error("persistent") }
      }
      assert(e.getMessage.contains("giving up"))
      assert(e.getCause.getMessage == "persistent")
      assert(calls >= 2) // at least one retry happened within the budget
    }
  }
}

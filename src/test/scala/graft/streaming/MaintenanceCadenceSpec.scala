package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class MaintenanceCadenceSpec extends AnyFunSuite {

  test("due() fires on every Nth call, starting at the Nth") {
    val c = new MaintenanceCadence(3)
    assert((1 to 9).map(_ => c.due()) ===
      Seq(false, false, true, false, false, true, false, false, true))
  }

  test("cadence 1 restores per-call probing (what the bound specs use)") {
    val c = new MaintenanceCadence(1)
    assert((1 to 4).forall(_ => c.due()))
  }

  test("a non-positive cadence is rejected loudly") {
    intercept[IllegalArgumentException](new MaintenanceCadence(0))
    intercept[IllegalArgumentException](new MaintenanceCadence(-3))
  }
}

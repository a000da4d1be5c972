package graft.core

import org.scalatest.funsuite.AnyFunSuite

class EnvKnobsSpec extends AnyFunSuite {

  test("unset → default; defaults pass through unclamped") {
    assert(EnvKnobs.boundedLong("GRAFT_NO_SUCH_KNOB", 42L, 100L) == 42L)
    assert(EnvKnobs.boundedInt("GRAFT_NO_SUCH_KNOB", 7, 100) == 7)
  }

  test("malformed input falls back to default, never throws") {
    // the defect class: a bare toInt at val init surfaced as
    // ExceptionInInitializerError at first touch of DriverGraph/Dedup
    assert(EnvKnobs.parse(Some("not-a-number"), 5L, 10L) == 5L)
    assert(EnvKnobs.parse(Some(""), 5L, 10L) == 5L)
    assert(EnvKnobs.parse(Some("9999999999999999999999"), 5L, 10L) == 5L)
  }

  test("valid input clamps to [0, max]; 0 = kernels-off passes through") {
    assert(EnvKnobs.parse(Some("0"), 5L, 10L) == 0L)
    assert(EnvKnobs.parse(Some("-3"), 5L, 10L) == 0L)
    assert(EnvKnobs.parse(Some("7"), 5L, 10L) == 7L)
    assert(EnvKnobs.parse(Some(" 7 "), 5L, 10L) == 7L)
    assert(EnvKnobs.parse(Some("999"), 5L, 10L) == 10L)
  }

  test("raising above the default (≤ max) is honored, not clamped") {
    // the r13 regression class: max == default silently ignored a
    // deliberate cap raise for a bigger driver
    assert(EnvKnobs.parse(Some("20"), 5L, 100L) == 20L)
  }

  test("malformed and clamped values emit a stderr warning naming the knob") {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true))
    try {
      EnvKnobs.parse(Some("1e0"), 5L, 10L, "GRAFT_TEST_KNOB")
      EnvKnobs.parse(Some("999"), 5L, 10L, "GRAFT_TEST_KNOB")
      EnvKnobs.parse(Some("7"), 5L, 10L, "GRAFT_TEST_KNOB") // clean: no warn
    } finally System.setErr(old)
    val out = buf.toString
    assert(out.contains("GRAFT_TEST_KNOB='1e0' is not a number"))
    assert(out.contains("GRAFT_TEST_KNOB=999 clamped to 10"))
    assert(out.linesIterator.count(_.contains("WARN")) == 2)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EntitySink

/** Unit coverage for the Python-fidelity JSON rendering that the golden
  * byte-compare in GoldenReplaySpec exercises end-to-end: the float repr
  * boundaries and ensure_ascii escaping have edges the 199-file corpus
  * doesn't reach. */
class EntitySinkSpec extends AnyFunSuite {

  test("pyFloatRepr: positional up to 1e16, like CPython") {
    assert(EntitySink.pyFloatRepr(0.0) == "0.0")
    assert(EntitySink.pyFloatRepr(-0.0) == "-0.0") // repr(-0.0) keeps the sign
    assert(EntitySink.pyFloatRepr(496.85) == "496.85")
    assert(EntitySink.pyFloatRepr(283637000000.0) == "283637000000.0")
    assert(EntitySink.pyFloatRepr(26299723153.140026) == "26299723153.140026")
    assert(EntitySink.pyFloatRepr(1259653212.8806643) == "1259653212.8806643")
    assert(EntitySink.pyFloatRepr(-204158531254.5534) == "-204158531254.5534")
    assert(EntitySink.pyFloatRepr(0.7) == "0.7")
  }

  test("pyFloatRepr: Python-style scientific outside [1e-4, 1e16)") {
    assert(EntitySink.pyFloatRepr(1.6e17) == "1.6e+17")
    assert(EntitySink.pyFloatRepr(1e16) == "1e+16")
    assert(EntitySink.pyFloatRepr(1e-5) == "1e-05")
    assert(EntitySink.pyFloatRepr(0.0005) == "0.0005")
    intercept[IllegalArgumentException](EntitySink.pyFloatRepr(Double.NaN))
    intercept[IllegalArgumentException](
      EntitySink.pyFloatRepr(Double.PositiveInfinity))
  }

  test("jsonEscape: ensure_ascii semantics") {
    assert(EntitySink.jsonEscape("""a"b\c""") == """a\"b\\c""")
    assert(EntitySink.jsonEscape("tab\there") == """tab\there""")
    assert(EntitySink.jsonEscape("nl\n") == """nl\n""")
    assert(EntitySink.jsonEscape("\u0001") == "\\u0001")
    // non-ASCII -> \uxxxx lowercase hex, like json.dump's default
    assert(EntitySink.jsonEscape("Société") == "Soci\\u00e9t\\u00e9")
    assert(EntitySink.jsonEscape("plain ascii.") == "plain ascii.")
    // DEL (0x7f) IS escaped — CPython's encode_basestring_ascii escapes
    // everything outside printable ASCII 0x20..0x7e (verified: Python
    // 3.11 json.dumps("\x7f") == '"\\u007f"')
    assert(EntitySink.jsonEscape("a\u007fb") == "a\\u007fb")
    assert(EntitySink.jsonEscape("\u0080") == "\\u0080")
  }
}

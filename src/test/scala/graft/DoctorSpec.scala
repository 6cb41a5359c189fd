package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doctor readiness-report parity: availability gating, per-backend
  * connection checks, sorted-JSON shape (doctor.py:54-114).
  */
class DoctorSpec extends AnyFunSuite {

  test("unsupported and unconfigured backends are unavailable") {
    val bad = Doctor.report(Map("DATABASE_TYPE" -> "oracle9i"))
    assert(bad("available") == false && bad("configured") == false)
    assert(bad("reason") == "unsupported vector backend")
    val empty = Doctor.report(Map("DATABASE_TYPE" -> "  "))
    assert(empty("available") == false)
    assert(empty("reason") == "vector backend is not configured")
  }

  test("default backend needs only a warehouse; incomplete config degrades") {
    val ok = Doctor.report(Map("GRAFT_WAREHOUSE" -> "/tmp/wh"))
    assert(ok("backend") == "epistemic_graph")
    assert(ok("available") == true && ok("configured") == true)
    val no = Doctor.report(Map.empty)
    assert(no("available") == false)
    assert(no("reason") == "backend configuration incomplete")
  }

  test("qdrant requires endpoint + credential reference, like the reference") {
    val partial = Doctor.report(Map(
      "DATABASE_TYPE" -> "qdrant", "DB_HOST" -> "example.internal"))
    assert(partial("available") == false && partial("configured") == false)
    val full = Doctor.report(Map(
      "DATABASE_TYPE" -> "qdrant", "DB_HOST" -> "example.internal",
      "QDRANT_API_KEY_REF" -> "ref://k"))
    assert(full("available") == true)
    val conn = full("connection").asInstanceOf[Map[String, Any]]
    assert(conn("endpoint_configured") == true)
    assert(conn("credential_configured") == true)
  }

  test("postgres needs host+dbname+both credential refs") {
    val env = Map("DATABASE_TYPE" -> "postgres", "DB_HOST" -> "h",
      "DBNAME" -> "d", "DB_USERNAME_REF" -> "u")
    assert(Doctor.report(env)("available") == false)
    assert(Doctor.report(env + ("DB_PASSWORD_REF" -> "p"))("available") == true)
  }

  test("report serializes to sorted-key JSON with nested maps") {
    val r = Doctor.report(Map("DATABASE_TYPE" -> "mongodb",
      "MONGODB_URI_REF" -> "ref://uri"))
    val m = classOf[Doctor.type].getDeclaredMethods
      .find(_.getName == "toJson").get
    m.setAccessible(true)
    val json = m.invoke(Doctor, r).asInstanceOf[String]
    assert(json.startsWith("{\"advisory\":"))
    assert(json.contains("\"tls\":{\"custom_trust_configured\":false"))
  }
}

package graft

import graft.model.BackendPolicy

/** Backend readiness check — the engine analog of the reference's
  * `vector-mcp-doctor` console script (doctor.py:54-114): report the
  * configured backend's availability WITHOUT loading any backend SDK,
  * print one sorted-key JSON object, exit 0 when available else 2.
  *
  * Connection-level checks mirror the reference's locally-defined
  * env-presence logic per backend (endpoint / credential-reference
  * settings, doctor.py:59-105). The reference's TLS-profile resolution
  * lives in its external agent_utilities dependency (out of reproducible
  * scope, like PiiSanitizer — SURVEY §7.4); here a backend's TLS block
  * reports `profile_configured` from the `<SERVICE>_TLS_PROFILE` setting
  * and `verify_enabled` true unless `<SERVICE>_SSL_VERIFY=false`, the
  * observable subset derivable from the reference's surface.
  *
  * For the native `epistemic_graph` backend (this engine's Spark
  * warehouse), "configured" means a warehouse directory is set
  * (GRAFT_WAREHOUSE) — the only infrastructure the embedded engine needs.
  */
object Doctor {

  private def credential(env: Map[String, String], ref: String): Boolean =
    env.get(ref).exists(_.nonEmpty)

  private def tls(env: Map[String, String], service: String): Map[String, Any] = Map(
    "verify_enabled" -> !env.get(s"${service}_SSL_VERIFY").contains("false"),
    "profile_configured" -> env.get(s"${service}_TLS_PROFILE").exists(_.nonEmpty),
    "custom_trust_configured" -> env.get(s"${service}_CA_BUNDLE").exists(_.nonEmpty),
    "mutual_tls_configured" -> env.get(s"${service}_CLIENT_CERT").exists(_.nonEmpty))

  /** The doctor report as a sorted-key map; pure function of the
    * environment for testability.
    */
  def report(env: Map[String, String] = sys.env): Map[String, Any] = {
    val s = BackendPolicy.backendStatus(
      env.getOrElse("DATABASE_TYPE", BackendPolicy.DefaultBackend))
    val base = Map[String, Any](
      "backend" -> s.backend, "available" -> s.available,
      "reason" -> s.reason, "advisory" -> s.advisory.orNull)
    if (!s.available) base + ("configured" -> false)
    else s.backend match {
      case "qdrant" =>
        val endpoint = env.get("DB_HOST").exists(_.nonEmpty)
        val cred = credential(env, "QDRANT_API_KEY_REF")
        val configured = endpoint && cred
        base ++ Map(
          "configured" -> configured,
          "available" -> configured,
          "reason" -> (if (configured) "available" else "backend configuration incomplete"),
          "connection" -> Map(
            "endpoint_configured" -> endpoint,
            "credential_configured" -> cred,
            "private_host_allowlist_configured" ->
              env.get("QDRANT_HTTP_ALLOWED_PRIVATE_HOSTS").exists(_.nonEmpty),
            "tls" -> tls(env, "QDRANT")))
      case "mongodb" =>
        val uri = credential(env, "MONGODB_URI_REF")
        base ++ Map(
          "configured" -> uri,
          "available" -> uri,
          "reason" -> (if (uri) "available" else "backend configuration incomplete"),
          "connection" -> Map(
            "endpoint_configured" -> uri,
            "credentials_configured" -> uri,
            "tls" -> tls(env, "MONGODB")))
      case "postgres" =>
        val endpoint = env.get("DB_HOST").exists(_.nonEmpty) &&
          env.get("DBNAME").exists(_.nonEmpty)
        val cred = credential(env, "DB_USERNAME_REF") && credential(env, "DB_PASSWORD_REF")
        val configured = endpoint && cred
        base ++ Map(
          "configured" -> configured,
          "available" -> configured,
          "reason" -> (if (configured) "available" else "backend configuration incomplete"),
          "connection" -> Map(
            "endpoint_configured" -> endpoint,
            "credentials_configured" -> cred,
            "tls" -> tls(env, "POSTGRES")))
      case _ => // epistemic_graph: the embedded Spark warehouse
        val configured = env.get("GRAFT_WAREHOUSE").exists(_.nonEmpty)
        base ++ Map(
          "configured" -> configured,
          "available" -> configured,
          "reason" -> (if (configured) "available" else "backend configuration incomplete"))
    }
  }

  private def toJson(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s""""$k":${toJson(x)}""" }.mkString("{", ",", "}")
    case s: String =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case n => n.toString
  }

  def main(args: Array[String]): Unit = {
    val r = report()
    println(toJson(r))
    sys.exit(if (r("available") == true) 0 else 2)
  }
}

package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyPairGenerator, Signature}
import java.util.Base64

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** Auth flows against an in-process OAuth endpoint (mirrors the reference
  * integration suite's flow-per-test shape, `client.spec.js:46-333`, and
  * the negative status-code checks of `clientFailures.spec.js`).
  */
class AuthSpec extends AnyFunSuite {

  /** Tiny OAuth stand-in: validates the posted form per flow, issues a
    * token, serves userinfo for that token. Returns (server, baseUrl,
    * receivedForms).
    */
  private def startOAuthServer(
      validate: Map[String, String] => Option[String]) // None = ok, Some(err)
      : (HttpServer, String, java.util.List[Map[String, String]]) = {
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Map[String, String]]())
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/services/oauth2/token", { ex =>
      val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        .split("&").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, UTF_8)
        }.toMap
      received.add(form)
      validate(form) match {
        case Some(err) => respond(ex, 401, s"""{"error":"$err"}""")
        case None => respond(ex, 200,
          """{"access_token":"00D000000000001!AQEAQtok","instance_url":"https://inst.example"}""")
      }
    })
    server.createContext("/services/oauth2/userinfo", { ex =>
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      if (auth == "Bearer 00D000000000001!AQEAQtok")
        respond(ex, 200,
          """{"organization_id":"00D000000000001EAA","preferred_username":"it@example.com"}""")
      else respond(ex, 401, """{"error":"bad token"}""")
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}", received)
  }

  test("client-credentials flow: form grant, bearer userinfo, metadata assembled") {
    val (server, url, received) = startOAuthServer { form =>
      if (form.get("grant_type").contains("client_credentials") &&
        form.get("client_id").contains("cid") &&
        form.get("client_secret").contains("sec")) None
      else Some("invalid_client")
    }
    try {
      val md = Auth.authenticate(
        Auth.ClientCredentials(url, "cid", "sec"), Auth.defaultHttp)
      assert(md.accessToken == "00D000000000001!AQEAQtok")
      assert(md.instanceUrl == "https://inst.example")
      assert(md.organizationId.contains("00D000000000001EAA"))
      assert(md.username.contains("it@example.com"))
      assert(received.size() == 1)
    } finally server.stop(0)
  }

  test("username-password flow concatenates password + security token (auth.js:70)") {
    val (server, url, received) = startOAuthServer { form =>
      if (form.get("grant_type").contains("password") &&
        form.get("password").contains("hunter2TOKEN123")) None
      else Some("invalid_grant")
    }
    try {
      val md = Auth.authenticate(
        Auth.UsernamePassword(url, "cid", "sec", "it@example.com",
          "hunter2", "TOKEN123"), Auth.defaultHttp)
      assert(md.organizationId.contains("00D000000000001EAA"))
      assert(received.get(0)("username") == "it@example.com")
    } finally server.stop(0)
  }

  test("JWT bearer flow: server-verified RS256 signature, reference claims shape") {
    val kp = { val g = KeyPairGenerator.getInstance("RSA"); g.initialize(2048); g.generateKeyPair() }
    var loginUrl: String = null
    val (server, url, _) = startOAuthServer { form =>
      if (!form.get("grant_type").contains("urn:ietf:params:oauth:grant-type:jwt-bearer"))
        Some("wrong grant")
      else {
        val Array(h, c, s) = form("assertion").split("\\.")
        val verifier = Signature.getInstance("SHA256withRSA")
        verifier.initVerify(kp.getPublic)
        verifier.update(s"$h.$c".getBytes(UTF_8))
        val sigOk = verifier.verify(Base64.getUrlDecoder.decode(s))
        val claims = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new String(Base64.getUrlDecoder.decode(c), UTF_8))
        val header = new String(Base64.getUrlDecoder.decode(h), UTF_8)
        val ok = sigOk && header == """{"alg":"RS256"}""" &&
          claims.get("iss").asText() == "cid" &&
          claims.get("sub").asText() == "it@example.com" &&
          claims.get("aud").asText() == loginUrl &&
          claims.get("exp").asLong() == 1700000000L + 300
        if (ok) None else Some("invalid_assertion")
      }
    }
    loginUrl = url
    try {
      val md = Auth.authenticate(
        Auth.JwtBearer(url, "cid", "it@example.com", kp.getPrivate),
        Auth.defaultHttp, nowEpochSeconds = () => 1700000000L)
      assert(md.accessToken.nonEmpty && md.organizationId.nonEmpty)
    } finally server.stop(0)
  }

  test("JWT claims with quotes/backslashes serialize to valid JSON") {
    val kp = { val g = KeyPairGenerator.getInstance("RSA"); g.initialize(2048); g.generateKeyPair() }
    val (cid, user, aud) = ("ci\"d\\", "us\"er\\@x", "https://x/\"login\"\\path")
    val assertion = Auth.jwtAssertion(
      Auth.JwtBearer(aud, cid, user, kp.getPrivate),
      nowEpochSeconds = 1700000000L)
    val Array(_, c, _) = assertion.split("\\.")
    val claims = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Base64.getUrlDecoder.decode(c), UTF_8))
    assert(claims.get("iss").asText() == cid)
    assert(claims.get("sub").asText() == user)
    assert(claims.get("aud").asText() == aud)
  }

  test("non-200 token response fails loud with status + body (auth.js:128-134)") {
    val (server, url, _) = startOAuthServer(_ => Some("invalid_client"))
    try {
      val e = intercept[RuntimeException] {
        Auth.authenticate(Auth.ClientCredentials(url, "bad", "creds"),
          Auth.defaultHttp)
      }
      assert(e.getMessage.startsWith("Authentication error: HTTP 401"))
      assert(e.getMessage.contains("invalid_client"))
    } finally server.stop(0)
  }

  test("user-supplied mode: authenticate refuses; org ID parses from the token prefix") {
    intercept[IllegalStateException] {
      Auth.authenticate(Auth.UserSupplied("00D000000000001!AQEAQx", "https://i"),
        Auth.defaultHttp)
    }
    // 15- and 18-char org IDs pass; anything else fails loud
    assert(Auth.orgIdFromToken("00D4x0000011xyz!AQEAQ") == "00D4x0000011xyz")
    assert(Auth.orgIdFromToken("00D4x0000011xyzABC!AQEAQ") == "00D4x0000011xyzABC")
    intercept[IllegalArgumentException] { Auth.orgIdFromToken("short!AQEAQ") }

    val md = Auth.userSuppliedMetadata(
      Auth.UserSupplied("00D4x0000011xyz!AQEAQ", "https://inst.example"))
    assert(md.organizationId.contains("00D4x0000011xyz"))
    assert(md.username.isEmpty)
  }
}

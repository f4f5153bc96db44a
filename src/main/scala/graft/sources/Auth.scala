package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{PrivateKey, Signature}
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

/** Auth control plane for the event-stream endpoint — the four flows of
  * the reference client (`src/utils/auth.js:41-163`), behavior-matched:
  *
  *  - USER_SUPPLIED (`auth.js:44-47`): the caller already holds a token;
  *    `authenticate()` must throw, and the org ID is parsed from the
  *    token's `00D…!` prefix with 15/18-char validation
  *    (`configurationLoader.js:122-142`).
  *  - USERNAME_PASSWORD (`auth.js:64-78`): login with
  *    `password + userToken` concatenated (the security-token convention).
  *    The reference rides jsforce's SOAP login; this engine renders the
  *    same inputs/outputs over the OAuth password grant against the same
  *    token endpoint — a documented transport deviation, not a semantic
  *    one (same credentials in, same ConnectionMetadata out).
  *  - OAUTH_CLIENT_CREDENTIALS (`auth.js:84-92`): form-encoded
  *    `grant_type=client_credentials` POST to
  *    `{loginUrl}/services/oauth2/token`.
  *  - OAUTH_JWT_BEARER (`auth.js:98-115`): RS256 JWT with claims
  *    `{iss: clientId, sub: username, aud: loginUrl, exp: now+300}`,
  *    base64url without padding, posted as
  *    `grant_type=urn:ietf:params:oauth:grant-type:jwt-bearer&assertion=…`.
  *
  * All OAuth flows share the generic connect (`auth.js:121-163`): non-200
  * token responses throw `Authentication error: HTTP <status> - <body>`;
  * a follow-up GET to `/services/oauth2/userinfo` with the bearer token
  * resolves `organizationId`/`username`; non-200 there throws
  * `Failed to retrieve user info: HTTP <status> - <body>`.
  *
  * Pure control plane: no Spark types, no state — authenticate once at
  * boot (like the reference worker), hand the metadata to whatever
  * transport needs it. The HTTP exchange is injectable for tests
  * (specced against an in-process HTTP server, like the forward sink).
  */
object Auth {

  /** `ConnectionMetadata` (`auth.js:6-12`). */
  final case class ConnectionMetadata(accessToken: String, instanceUrl: String,
                                      organizationId: Option[String],
                                      username: Option[String])

  sealed trait Mode
  /** Caller-supplied token; `authenticate()` refuses (`auth.js:44-47`). */
  final case class UserSupplied(accessToken: String, instanceUrl: String,
                                organizationId: Option[String] = None) extends Mode
  final case class UsernamePassword(loginUrl: String, clientId: String,
                                    clientSecret: String, username: String,
                                    password: String, userToken: String) extends Mode
  final case class ClientCredentials(loginUrl: String, clientId: String,
                                     clientSecret: String) extends Mode
  /** `expSeconds` = JWT lifetime, 5 minutes like the reference
    * (`auth.js:104`). */
  final case class JwtBearer(loginUrl: String, clientId: String,
                             username: String, privateKey: PrivateKey,
                             expSeconds: Long = 300) extends Mode

  /** Minimal injectable HTTP exchange: (url, headers, formBody or None for
    * GET) → (status, body). Default rides `java.net.http` like the
    * forward sink's transport.
    */
  type HttpExec = (String, Map[String, String], Option[String]) => (Int, String)

  def defaultHttp: HttpExec = {
    lazy val client = HttpClient.newHttpClient()
    (url, headers, body) => {
      val b = HttpRequest.newBuilder(URI.create(url))
      headers.foreach { case (k, v) => b.header(k, v) }
      val req = body match {
        case Some(form) => b.POST(HttpRequest.BodyPublishers.ofString(form)).build()
        case None => b.GET().build()
      }
      val res = client.send(req, HttpResponse.BodyHandlers.ofString())
      (res.statusCode(), res.body())
    }
  }

  /** Org ID from a `00D…!`-prefixed access token with the reference's
    * 15/18-char validation (`configurationLoader.js:122-142`); fails loud
    * on malformed tokens like the loader does.
    */
  def orgIdFromToken(accessToken: String): String = {
    val id = accessToken.split('!').head
    require(id.length == 15 || id.length == 18,
      s"Invalid org ID format parsed from access token: $id")
    id
  }

  private val mapper = new ObjectMapper()

  private def urlEncode(s: String) =
    java.net.URLEncoder.encode(s, UTF_8)

  private def base64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  /** RS256 JWT assertion exactly as `auth.js:98-112` constructs it. The
    * claims are serialized by Jackson (insertion-ordered map), not string
    * interpolation, so a clientId/username/loginUrl containing `"` or `\`
    * yields valid JSON instead of a malformed assertion.
    */
  private[sources] def jwtAssertion(mode: JwtBearer, nowEpochSeconds: Long): String = {
    val header = base64url("""{"alg":"RS256"}""".getBytes(UTF_8))
    val claimsMap = new java.util.LinkedHashMap[String, Any]()
    claimsMap.put("iss", mode.clientId)
    claimsMap.put("sub", mode.username)
    claimsMap.put("aud", mode.loginUrl)
    claimsMap.put("exp", nowEpochSeconds + mode.expSeconds)
    val claimsJson = mapper.writeValueAsString(claimsMap)
    val claims = base64url(claimsJson.getBytes(UTF_8))
    val unsigned = s"$header.$claims"
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(mode.privateKey)
    sig.update(unsigned.getBytes(UTF_8))
    s"$unsigned.${base64url(sig.sign())}"
  }

  /** Authenticate per the mode; see class doc for the flow-by-flow
    * contract. USER_SUPPLIED throws — its metadata is already in hand
    * ([[userSuppliedMetadata]]).
    */
  def authenticate(mode: Mode, http: HttpExec = defaultHttp,
                   nowEpochSeconds: () => Long =
                     () => System.currentTimeMillis() / 1000): ConnectionMetadata =
    mode match {
      case _: UserSupplied =>
        throw new IllegalStateException(
          "Authenticate method should not be called in user-supplied mode.")
      case m: UsernamePassword =>
        oauthConnect(m.loginUrl, http,
          s"grant_type=password&client_id=${urlEncode(m.clientId)}" +
            s"&client_secret=${urlEncode(m.clientSecret)}" +
            s"&username=${urlEncode(m.username)}" +
            s"&password=${urlEncode(m.password + m.userToken)}")
      case m: ClientCredentials =>
        oauthConnect(m.loginUrl, http,
          s"grant_type=client_credentials&client_id=${urlEncode(m.clientId)}" +
            s"&client_secret=${urlEncode(m.clientSecret)}")
      case m: JwtBearer =>
        oauthConnect(m.loginUrl, http,
          "grant_type=urn:ietf:params:oauth:grant-type:jwt-bearer" +
            s"&assertion=${jwtAssertion(m, nowEpochSeconds())}")
    }

  /** Resolve metadata for the user-supplied mode: org ID comes from the
    * config or the token prefix (`configurationLoader.js:122-142`).
    */
  def userSuppliedMetadata(mode: UserSupplied): ConnectionMetadata =
    ConnectionMetadata(mode.accessToken, mode.instanceUrl,
      Some(mode.organizationId.getOrElse(orgIdFromToken(mode.accessToken))),
      username = None)

  /** Generic OAuth connect (`auth.js:121-163`): token POST then userinfo
    * GET, loud errors carrying status + body.
    */
  private def oauthConnect(loginUrl: String, http: HttpExec,
                           form: String): ConnectionMetadata = {
    val (status, body) = http(s"$loginUrl/services/oauth2/token",
      Map("Content-Type" -> "application/x-www-form-urlencoded"), Some(form))
    if (status != 200)
      throw new RuntimeException(s"Authentication error: HTTP $status - $body")
    val token = mapper.readTree(body)
    val accessToken = token.get("access_token").asText()
    val instanceUrl = token.get("instance_url").asText()

    val (uStatus, uBody) = http(s"$loginUrl/services/oauth2/userinfo",
      Map("authorization" -> s"Bearer $accessToken"), None)
    if (uStatus != 200)
      throw new RuntimeException(
        s"Failed to retrieve user info: HTTP $uStatus - $uBody")
    val info = mapper.readTree(uBody)
    ConnectionMetadata(accessToken, instanceUrl,
      Option(info.get("organization_id")).map(_.asText()),
      Option(info.get("preferred_username")).map(_.asText()))
  }
}

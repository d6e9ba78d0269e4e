package graft.sources

import java.net.URLEncoder
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

/** CF API authentication config, mirroring the reference's env surface
  * (`main_config.go:41-47`: CF_API_ADDRESS, CF_USERNAME, CF_PASSWORD,
  * CF_CLIENT_ID, CF_CLIENT_SECRET). Auth is active when either a client
  * or a user credential pair is present; otherwise requests go out bare
  * (local stub / test mode). */
final case class CfAuthConfig(
    apiAddress: String,
    clientId: String = "",
    clientSecret: String = "",
    username: String = "",
    password: String = "") {
  def enabled: Boolean = clientId.nonEmpty || username.nonEmpty
}

/** UAA OAuth token flow, the behavior go-cfclient performs for every
  * reference fetch (`main.go:45-48`; token-exchange mock shape at
  * `pkg/fetchers/cf_audit_event_fetcher_test.go:33-54`):
  *
  *  1. discover the UAA endpoint: `GET {api}/v2/info` → `token_endpoint`;
  *  2. `POST {uaa}/oauth/token` — password grant when a username is
  *     configured (Basic auth with the client pair, defaulting to the
  *     public `cf:` client like go-cfclient), client_credentials grant
  *     otherwise;
  *  3. cache the access token until `expires_in` (minus a 60 s skew);
  *     `invalidate()` forces a refresh (used by the 401-retry path);
  *  4. when the grant response carried a `refresh_token`, expiry renews via
  *     `grant_type=refresh_token` — the wire protocol go-cfclient's oauth2
  *     TokenSource uses (UAA policies often rate-limit password grants much
  *     harder than refreshes) — falling back to the full grant if the
  *     refresh is rejected (expired/rotated refresh token).
  *
  * Thread-safe: the collector loop and async producer share one instance.
  */
final class UaaAuthenticator(
    http: HttpTransport,
    cfg: CfAuthConfig,
    nowMillis: () => Long = () => System.currentTimeMillis()) {

  private val mapper = new ObjectMapper()
  @volatile private var cached: Option[(String, Long)] = None // (token, expiresAtMillis)
  @volatile private var tokenEndpoint: Option[String] = None
  @volatile private var refreshTok: Option[String] = None

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  private def discoverTokenEndpoint(): String = tokenEndpoint.getOrElse {
    val r = http.get(s"${cfg.apiAddress}/v2/info", Map("Accept" -> "application/json"))
    if (r.status != 200)
      throw new RuntimeException(s"token endpoint discovery failed with status code ${r.status}")
    val node = mapper.readTree(r.body).get("token_endpoint")
    if (node == null || node.isNull)
      throw new RuntimeException(s"/v2/info response carries no token_endpoint: ${r.body.take(200)}")
    val ep = node.asText()
    tokenEndpoint = Some(ep)
    ep
  }

  /** POST one token-grant body. `lenient` (the refresh-grant attempt)
    * reports failure as None so the caller can fall back; the primary
    * grant keeps throwing with the reference's error vocabulary. */
  private def postToken(body: String, lenient: Boolean): Option[(String, Long)] = {
    val (basicUser, basicPass) =
      if (cfg.username.nonEmpty && cfg.clientId.isEmpty) ("cf", "") // go-cfclient default client
      else (cfg.clientId, cfg.clientSecret)
    val basic = Base64.getEncoder.encodeToString(s"$basicUser:$basicPass".getBytes("UTF-8"))
    val r = http.post(s"${discoverTokenEndpoint()}/oauth/token", body, Map(
      "Authorization" -> s"Basic $basic",
      "Content-Type" -> "application/x-www-form-urlencoded",
      "Accept" -> "application/json"))
    if (r.status != 200) {
      if (lenient) None
      else throw new RuntimeException(s"token exchange failed with status code ${r.status}")
    } else {
      val root = mapper.readTree(r.body)
      val tokenNode = root.get("access_token")
      if (tokenNode == null || tokenNode.isNull) {
        if (lenient) None
        else throw new RuntimeException(s"token response carries no access_token: ${r.body.take(200)}")
      } else {
        Option(root.get("refresh_token")).filterNot(_.isNull)
          .foreach(n => refreshTok = Some(n.asText())) // UAA may rotate it
        // default generously when expires_in is absent: a tiny default minus
        // the 60 s skew would expire immediately and disable the cache,
        // silently doubling the UAA request rate (one exchange per page GET)
        val expiresIn = Option(root.get("expires_in")).map(_.asLong()).getOrElse(300L)
        Some((tokenNode.asText(), nowMillis() + (expiresIn - 60L).max(0L) * 1000L))
      }
    }
  }

  private def fetchToken(): (String, Long) = {
    val viaRefresh = refreshTok.flatMap { rt =>
      try postToken(s"grant_type=refresh_token&refresh_token=${enc(rt)}", lenient = true)
      catch { case _: Exception => None }
    }
    viaRefresh.getOrElse {
      refreshTok = None // a rejected refresh token is dead; re-grant fully
      val body =
        if (cfg.username.nonEmpty)
          s"grant_type=password&username=${enc(cfg.username)}&password=${enc(cfg.password)}"
        else "grant_type=client_credentials"
      postToken(body, lenient = false).get
    }
  }

  def bearerToken(): String = synchronized {
    cached match {
      case Some((t, exp)) if nowMillis() < exp => t
      case _ =>
        val fresh = fetchToken()
        cached = Some(fresh)
        fresh._1
    }
  }

  def invalidate(): Unit = synchronized { cached = None }
}

/** Transport decorator adding `Authorization: Bearer …` to every request
  * and retrying exactly once with a fresh token on 401 (expired/revoked
  * token), the refresh behavior go-cfclient's oauth2 client provides. A
  * 401 that survives the refresh surfaces to the fetcher as a normal
  * non-200 (terminal error page, fetcher.go:66-68). */
final class AuthenticatedTransport(inner: HttpTransport, auth: UaaAuthenticator)
    extends HttpTransport {

  private def withAuth(headers: Map[String, String]): Map[String, String] =
    headers + ("Authorization" -> s"Bearer ${auth.bearerToken()}")

  private def retry401(first: HttpReply)(again: => HttpReply): HttpReply =
    if (first.status != 401) first
    else { auth.invalidate(); again }

  def get(url: String, headers: Map[String, String]): HttpReply =
    retry401(inner.get(url, withAuth(headers)))(inner.get(url, withAuth(headers)))

  def post(url: String, body: String, headers: Map[String, String]): HttpReply =
    retry401(inner.post(url, body, withAuth(headers)))(inner.post(url, body, withAuth(headers)))
}

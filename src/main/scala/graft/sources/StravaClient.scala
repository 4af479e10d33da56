package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.CleanActivities

/** Driver-side REST/OAuth fetch layer — the live-HTTP leg of the
  * reference's SDK (strava_sdk.py:85-181), re-expressed as a thin
  * client over an INJECTABLE transport so every flow is testable
  * against a fake and the engine never hard-wires a network stack.
  *
  * Division of labor, unchanged from the rest of the repo: the CLIENT
  * fetches small driver-side payloads (token exchanges, activity
  * pages, stream dicts — kilobytes, the reference does exactly this in
  * a Cloud Function); the ENGINE processes them as DataFrames via
  * [[StravaJsonSource]]/[[graft.etl.CleanActivities]]. Fetching is
  * inherently a driver/service concern (per-user OAuth, rate limits);
  * anything heavier than a page of JSON should land in object storage
  * and enter through the parquet/DSv2 scans.
  *
  * Reference quirks preserved (cited per method): the `after=watermark`
  * incremental parameter, per-key stream fetch with null-padding to
  * `original_size`, the `time_key`/`original` bookkeeping channels,
  * and the endpoint-privacy latlng trim. One DELIBERATE deviation: the
  * reference's failed refresh returns empty-string tokens
  * (strava_sdk.py:44-50) that poison downstream calls silently; per
  * the repo-wide C4 convention (silent failures -> explicit) a failed
  * refresh here is `None`.
  */
object StravaClient {

  /** Transport seam: ONE function the whole client speaks through.
    * Production supplies [[JdkHttpTransport]]; tests supply a fake
    * returning canned bodies. */
  trait HttpTransport {
    def execute(method: String, url: String,
                params: Map[String, String],
                headers: Map[String, String]): HttpResponse
  }

  final case class HttpResponse(status: Int, body: String)

  /** OAuth token triple (strava_sdk.py:33-37). */
  final case class TokenSet(accessToken: String, refreshToken: String,
                            expiresAt: Long)

  /** JDK-built-in production transport (java.net.http — no added
    * dependency). Untested here by design: the build environment has
    * zero egress, and every flow is covered against the fake. */
  final class JdkHttpTransport(timeoutMs: Long = 30000) extends HttpTransport {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    def execute(method: String, url: String,
                params: Map[String, String],
                headers: Map[String, String]): HttpResponse = {
      val qs = params.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val full = if (qs.isEmpty) url
        else url + (if (url.contains("?")) "&" else "?") + qs
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(full))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
      headers.foreach { case (k, v) => b.header(k, v) }
      val req = (method match {
        case "POST" => b.POST(java.net.http.HttpRequest.BodyPublishers.noBody())
        case _ => b.GET()
      }).build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpResponse(resp.statusCode(), resp.body())
    }
  }
}

/** The client proper. `baseUrl`/`oauthUrl` default to the public API
  * endpoints (strava_sdk.py:16); tests point them anywhere. */
final class StravaClient(
    transport: StravaClient.HttpTransport,
    clientId: String,
    clientSecret: String,
    baseUrl: String = "https://www.strava.com/api/v3",
    oauthUrl: String = "https://www.strava.com/oauth") {

  import StravaClient._

  private def bearer(token: String) = Map("Authorization" -> s"Bearer $token")

  /** Tiny JSON field extractors — the client only ever reads scalar
    * fields and raw sub-documents out of small driver-side payloads,
    * so a full JSON library on the driver hot path buys nothing. */
  private def jsonStr(body: String, field: String): Option[String] =
    s""""$field"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r
      .findFirstMatchIn(body).map(_.group(1))
  private def jsonNum(body: String, field: String): Option[Long] =
    s""""$field"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)

  /** The browser hand-shake URL (set_up_auth, strava_sdk.py:21-28). */
  def authorizeUrl(redirectUri: String,
                   scope: String = "activity:read_all,profile:read_all,read_all"): String =
    s"$oauthUrl/authorize?client_id=$clientId&redirect_uri=$redirectUri" +
      s"&response_type=code&scope=$scope"

  private def tokenCall(params: Map[String, String]): Option[TokenSet] = {
    val r = transport.execute("POST", s"$oauthUrl/token",
      Map("client_id" -> clientId, "client_secret" -> clientSecret) ++ params,
      Map.empty)
    if (r.status / 100 != 2) None
    else for {
      at <- jsonStr(r.body, "access_token")
      rt <- jsonStr(r.body, "refresh_token")
      exp <- jsonNum(r.body, "expires_at")
    } yield TokenSet(at, rt, exp)
  }

  /** Authorization-code exchange (strava_sdk.py:30-38). */
  def tokensWithCode(code: String): Option[TokenSet] =
    tokenCall(Map("code" -> code, "grant_type" -> "authorization_code"))

  /** Refresh-token exchange (strava_sdk.py:40-52). The reference's
    * failure path silently yields ('', '', 0); here failure is None —
    * the C4 explicit-failure convention. */
  def tokensWithRefresh(refreshToken: String): Option[TokenSet] =
    tokenCall(Map("refresh_token" -> refreshToken,
      "grant_type" -> "refresh_token"))

  /** C3's decision applied to one token set: refresh when within
    * `marginSec` of expiry (firebase_functions.py:88-97 scans for
    * these), otherwise keep. None = the refresh itself failed. */
  def withFreshTokens(tokens: TokenSet, nowEpoch: Long,
                      marginSec: Long = 3600): Option[TokenSet] =
    if (tokens.expiresAt > nowEpoch + marginSec) Some(tokens)
    else tokensWithRefresh(tokens.refreshToken)

  /** GET /athlete -> athlete id (strava_sdk.py:54-68). */
  def athleteId(accessToken: String): Option[Long] = {
    val r = transport.execute("GET", s"$baseUrl/athlete", Map.empty,
      bearer(accessToken))
    if (r.status / 100 != 2) None else jsonNum(r.body, "id")
  }

  /** One page of the incremental activity scan: `after` is the S3
    * watermark pushed into the REQUEST (strava_sdk.py:100, the
    * source-side predicate pushdown the DSv2 scan mirrors). Returns
    * the raw JSON array body. */
  def activitiesPage(accessToken: String, after: Long, perPage: Int,
                     page: Int): Option[String] = {
    val r = transport.execute("GET", s"$baseUrl/athlete/activities",
      Map("after" -> after.toString, "per_page" -> perPage.toString,
        "page" -> page.toString),
      bearer(accessToken))
    if (r.status / 100 != 2) None else Some(r.body)
  }

  /** Split a JSON array body into top-level element documents (depth
    * tracking, string-aware) — each element is handed to the engine as
    * one raw document line, the same unit [[StravaJsonSource
    * .activities]] reads from disk. */
  private[sources] def splitJsonArray(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = -1
    var inStr = false
    var esc = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' =>
          if (depth == 1 && start < 0) start = i
          depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 1 && start >= 0) {
            out += body.substring(start, i + 1); start = -1
          }
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** Full incremental fetch: pages until a short page. The reference
    * stops at page 1 (strava_sdk.py:103 hard-codes page=1); real
    * backfills need the loop, so the client generalizes — with
    * `maxPages` as the runaway bound. */
  def activitiesAfter(accessToken: String, after: Long, perPage: Int = 30,
                      maxPages: Int = 100): Seq[String] = {
    var page = 1
    var done = false
    val docs = Seq.newBuilder[String]
    while (!done && page <= maxPages) {
      activitiesPage(accessToken, after, perPage, page) match {
        case None => done = true
        case Some(body) =>
          val items = splitJsonArray(body)
          docs ++= items
          done = items.size < perPage
          page += 1
      }
    }
    docs.result()
  }

  /** Stream channels the reference fetches per activity
    * (strava_sdk.py:135). */
  val streamKeys: Seq[String] = Seq("time", "latlng", "distance", "altitude",
    "velocity_smooth", "heartrate", "cadence", "watts", "temp", "moving",
    "grade_smooth")

  /** Per-key stream fetch assembled into ONE channel-dict document —
    * the unit [[StravaJsonSource.streams]]/`pivotStreams` consumes.
    * Faithful to strava_sdk.py:129-181: each key is its own request; a
    * response that lacks the key but reports `original_size` NULL-PADS
    * the channel to that length; `time_key` mirrors `time`;
    * `original` is an all-true flag channel; and the latlng ENDPOINTS
    * are nulled (the reference's home-privacy trim,
    * strava_sdk.py:176-178). Channel extraction keys on `"type":<key>`
    * within each per-key response element. */
  def activityStreamsDoc(accessToken: String, activityId: Long): Option[String] = {
    val channels = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var originalSize = -1L
    for (key <- streamKeys) {
      val r = transport.execute("GET",
        s"$baseUrl/activities/$activityId/streams",
        Map("keys" -> key), bearer(accessToken))
      if (r.status / 100 == 2) {
        val elems = splitJsonArray(r.body)
        if (originalSize < 0)
          elems.flatMap(e => jsonNum(e, "original_size")).headOption
            .foreach(originalSize = _)
        elems.find(e => jsonStr(e, "type").contains(key)) match {
          case Some(e) =>
            val data = """"data"\s*:\s*""".r.findFirstMatchIn(e).flatMap { m =>
              val rest = e.substring(m.end)
              splitJsonArrayBody(rest)
            }
            data.foreach(channels(key) = _)
          case None if originalSize >= 0 =>
            channels(key) = Seq.fill(originalSize.toInt)("null")
              .mkString("[", ",", "]")
          case None =>
        }
      }
    }
    if (channels.isEmpty) None
    else {
      channels.get("time").foreach(t => channels("time_key") = t)
      if (originalSize >= 0)
        channels("original") = Seq.fill(originalSize.toInt)("true")
          .mkString("[", ",", "]")
      channels.get("latlng").foreach { ll =>
        val pts = splitJsonArray(ll)
        if (pts.nonEmpty) {
          val trimmed = ("null" +: pts.slice(1, pts.size - 1)) :+ "null"
          channels("latlng") = trimmed.mkString("[", ",", "]")
        }
      }
      Some(channels.map { case (k, v) => s""""$k":$v""" }
        .mkString(s"""{"activity_id":$activityId,""", ",", "}"))
    }
  }

  /** The raw `[...]` array that starts `rest` (balanced-bracket scan,
    * string-aware) — used to lift a channel's `data` array verbatim. */
  private def splitJsonArrayBody(rest: String): Option[String] = {
    val start = rest.indexOf('[')
    if (start < 0) None
    else {
      var depth = 0
      var inStr = false
      var esc = false
      var i = start
      while (i < rest.length) {
        val c = rest.charAt(i)
        if (inStr) {
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '[' | '{' => depth += 1
          case ']' | '}' =>
            depth -= 1
            if (depth == 0) return Some(rest.substring(start, i + 1))
          case _ =>
        }
        i += 1
      }
      None
    }
  }

  /** S7 polyline lookup (strava_sdk.py:183-201): per-activity GET, the
    * map.polyline string. */
  def activityPolylines(accessToken: String, activityIds: Seq[Long]): Seq[(Long, String)] =
    activityIds.flatMap { id =>
      val r = transport.execute("GET", s"$baseUrl/activities/$id",
        Map.empty, bearer(accessToken))
      if (r.status / 100 != 2) None
      else {
        // polyline lives inside the "map" sub-document
        val mapDoc = """"map"\s*:\s*\{""".r.findFirstMatchIn(r.body)
          .flatMap(m => splitJsonObjectBody(r.body.substring(m.end - 1)))
        mapDoc.flatMap(d => jsonStr(d, "polyline")).map(id -> _)
      }
    }

  private def splitJsonObjectBody(rest: String): Option[String] =
    Try(splitJsonArrayBody(rest.replaceFirst("\\{", "[")))
      .toOption.flatten.map(s => "{" + s.drop(1).dropRight(1) + "}")

  // ---- engine bridges: fetched documents -> the same DataFrame entry
  // points the file-backed source uses (one code path either way) ----

  /** Fetched activity docs -> the S4 incremental frame
    * ([[CleanActivities.clean]] + watermark filter). */
  def activitiesFrame(spark: SparkSession, accessToken: String,
                      afterEpoch: Long, nowEpoch: Double): DataFrame = {
    import spark.implicits._
    val docs = activitiesAfter(accessToken, afterEpoch)
    CleanActivities.clean(docs.toDF("json"),
      nowEpoch).filter(org.apache.spark.sql.functions.col("epoch") > afterEpoch)
  }

  /** Fetched stream dicts -> the S6 long-form pivot
    * ([[StravaJsonSource.pivotStreams]] semantics, shared schema). */
  def streamsFrame(spark: SparkSession, accessToken: String,
                   activityIds: Seq[Long]): DataFrame = {
    import spark.implicits._
    val docs = activityIds.flatMap(activityStreamsDoc(accessToken, _))
    val schema = graft.etl.StravaSchemas.streamDictSchema
    StravaJsonSource.pivotStreams(
      spark.read.schema(schema).json(docs.toDS()))
  }
}

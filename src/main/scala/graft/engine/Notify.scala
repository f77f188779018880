package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Success check-in (A24): the reference ends every successful run with
  * `curl "$CHECK_IN_URL"` against a dead-man's-snitch monitor
  * (backup.sh:227,381; psql-backups.sh:138,228) — a plain GET whose
  * non-2xx/connect failure must fail the job (the monitor treats a
  * missed check-in as a dead pipeline, so a silently-swallowed failure
  * would defeat it).
  *
  * The transport is injectable so tests (and the zero-egress build
  * sandbox) never open sockets; `httpGet` is the production default.
  */
object Notify {
  final class CheckInFailedException(url: String, detail: String)
      extends RuntimeException(s"check-in to $url failed: $detail")

  /** Production transport: GET the URL, return the status code. */
  def httpGet(url: String): Int =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
      .send(
        HttpRequest.newBuilder(URI.create(url)).GET()
          .timeout(Duration.ofSeconds(30)).build(),
        HttpResponse.BodyHandlers.discarding())
      .statusCode()

  /** Fire the success check-in. Logs the reference's transition lines
    * ("Checkin to snitch... / ...Done"), throws CheckInFailedException
    * on a non-2xx response or transport error. */
  def checkIn(url: String, get: String => Int = httpGet): Unit = {
    Log.info("Checkin to snitch...")
    val status =
      try get(url)
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new CheckInFailedException(url, e.toString)
      }
    if (status < 200 || status > 299)
      throw new CheckInFailedException(url, s"HTTP $status")
    Log.info("...Done")
  }
}

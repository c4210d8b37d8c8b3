package graft.serving

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer, HttpsConfigurator, HttpsServer}
import javax.net.ssl.{KeyManagerFactory, SSLContext}

import graft.lake.LakeFs

/** REST file management over the lake (reference S15 — the WebHDFS
  * LISTSTATUS + FastAPI upload/delete endpoints of
  * `hive_hdfs_api.py:37-93`), rebuilt as a dependency-free JDK
  * `HttpServer` over [[LakeFs]], so the same three operations the
  * reference's API exposes work against any Hadoop `FileSystem` the
  * engine runs on (HDFS in production, local fs in tests):
  *
  *  - `GET    /files?path=<dir>`  → JSON array of file paths (LISTSTATUS)
  *  - `PUT    /files?path=<file>` → create/overwrite with the request body
  *  - `DELETE /files?path=<p>`    → recursive delete
  *
  * Every path is resolved UNDER the configured root and traversal
  * (`..`) is rejected — the service can only touch the lake it serves.
  * This is control-plane plumbing (landing-zone uploads, marker
  * cleanup), not a data path: bulk data enters through the engine's
  * sources, not HTTP.
  *
  * Transport: [[FileService.start]] is plain HTTP (tests, or behind a
  * TLS-terminating proxy); [[FileService.startTls]] serves HTTPS
  * directly from a PKCS12 keystore — the reference's deployment
  * posture (nginx + self-signed cert, `generate_cert.sh` /
  * `nginx.conf`) without the extra hop. Anyone exposing the
  * upload/delete endpoints beyond localhost should be on the TLS form.
  */
final class FileService private[serving] (server: HttpServer,
    val root: String, scheme: String) extends AutoCloseable {
  def port: Int = server.getAddress.getPort
  def baseUrl: String = s"$scheme://localhost:$port"
  override def close(): Unit = server.stop(0)
}

object FileService {

  def start(fs: LakeFs, root: String, port: Int = 0): FileService = {
    val server = HttpServer.create(new InetSocketAddress("localhost", port), 0)
    server.createContext("/files", (ex: HttpExchange) => handle(fs, root, ex))
    server.setExecutor(null) // control plane: the default synchronous executor
    server.start()
    new FileService(server, root, "http")
  }

  /** HTTPS form. Keystore location/password default to the
    * `GRAFT_TLS_KEYSTORE` / `GRAFT_TLS_KEYSTORE_PASSWORD` environment
    * (deployment wires a mounted secret; the spec generates a
    * throwaway self-signed keystore with `keytool`, the JDK twin of
    * the reference's `generate_cert.sh`).
    */
  def startTls(fs: LakeFs, root: String,
      keystorePath: String = sys.env.getOrElse("GRAFT_TLS_KEYSTORE", ""),
      keystorePassword: String =
        sys.env.getOrElse("GRAFT_TLS_KEYSTORE_PASSWORD", ""),
      port: Int = 0): FileService = {
    require(keystorePath.nonEmpty,
      "startTls needs a PKCS12 keystore (arg or GRAFT_TLS_KEYSTORE)")
    val server = HttpsServer.create(new InetSocketAddress("localhost", port), 0)
    server.setHttpsConfigurator(
      new HttpsConfigurator(sslContext(keystorePath, keystorePassword)))
    server.createContext("/files", (ex: HttpExchange) => handle(fs, root, ex))
    server.setExecutor(null)
    server.start()
    new FileService(server, root, "https")
  }

  /** Server SSL context from a PKCS12 keystore holding the key pair +
    * certificate.
    */
  def sslContext(keystorePath: String, password: String): SSLContext = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(keystorePath)
    try ks.load(in, password.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  private def handle(fs: LakeFs, root: String, ex: HttpExchange): Unit =
    try {
      resolve(root, ex) match {
        case None => respond(ex, 400, """{"error":"bad path"}""")
        case Some(path) => ex.getRequestMethod match {
          case "GET" =>
            val files = fs.lsRecursive(path)
            respond(ex, 200, files.map(jsonStr).mkString("[", ",", "]"))
          case "PUT" =>
            val body = ex.getRequestBody.readAllBytes()
            fs.writeString(path, new String(body, StandardCharsets.UTF_8))
            respond(ex, 201, s"""{"written":${jsonStr(path)}}""")
          case "DELETE" =>
            if (!fs.exists(path)) respond(ex, 404, """{"error":"not found"}""")
            else {
              fs.delete(path)
              respond(ex, 200, s"""{"deleted":${jsonStr(path)}}""")
            }
          case m => respond(ex, 405, s"""{"error":${jsonStr(s"method $m")}}""")
        }
      }
    } catch {
      case e: Exception => respond(ex, 500, s"""{"error":${jsonStr(e.toString)}}""")
    } finally ex.close()

  /** The `path` query param resolved under `root`; None on missing
    * param, absolute paths, or any `..` traversal.
    */
  private def resolve(root: String, ex: HttpExchange): Option[String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    // URLDecoder applies FORM-encoding rules ('+' → space), which would
    // make lake files with a literal '+' in the name unaddressable and
    // silently retarget PUT/DELETE. Query-string semantics keep '+'
    // literal: shield it as %2B so only %XX escapes decode.
    val rel = q.split("&").collectFirst {
      case kv if kv.startsWith("path=") =>
        java.net.URLDecoder.decode(
          kv.drop(5).replace("+", "%2B"), StandardCharsets.UTF_8)
    }
    rel.filter(r => r.nonEmpty && !r.startsWith("/") &&
        !r.split("/").contains(".."))
      .map(r => s"$root/$r")
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os: OutputStream = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

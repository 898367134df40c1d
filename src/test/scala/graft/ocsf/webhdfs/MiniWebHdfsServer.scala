package graft.ocsf.webhdfs

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** A minimal in-JVM WebHDFS (REST-over-HTTP) server for exercising
  * Hadoop's real `webhdfs://` connector end-to-end without network
  * egress — the HTTP-object-store counterpart of [[graft.ocsf.ftp.MiniFtpServer]].
  * The reference's production ingestion mode is a REST object store
  * (GCS, `scripts/helpers/gcs_utils.py:51-108`); `hadoop-aws`/`gcs`
  * jars are absent from the pinned offline build (see
  * `docs/ADR-002-cloud-connectors.md`), but `WebHdfsFileSystem` ships
  * inside `hadoop-client-runtime`, giving the same shape — a REST
  * protocol, redirect-based data transfer, JSON metadata — over a
  * stock Hadoop connector.
  *
  * Speaks exactly the protocol surface `WebHdfsFileSystem` uses:
  *  - `GETFILESTATUS` / `LISTSTATUS` → FileStatus JSON
  *  - `OPEN` → 307 redirect to the "datanode" (this same server,
  *    `data=true`), then bytes honoring `offset`/`length`
  *  - `CREATE` → the two-step redirected PUT (307, then 201)
  *  - `MKDIRS`, `RENAME` (absolute `destination`), `DELETE`
  * Unknown ops return a WebHDFS `RemoteException` so a client drift
  * fails loudly rather than hanging.
  *
  * The virtual namespace `/` maps onto `rootDir`; paths never escape
  * it (normalized and re-checked). Modification times are the real
  * file mtimes — the streaming source sorts on them.
  */
final class MiniWebHdfsServer(rootDir: Path) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 50)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "mini-webhdfs-worker"); t.setDaemon(true); t
  }))
  server.createContext("/webhdfs/v1", (ex: HttpExchange) => handle(ex))

  def port: Int = server.getAddress.getPort

  def start(): this.type = { server.start(); this }
  def stop(): Unit       = server.stop(0)

  /** Map a WebHDFS path to a real path under `rootDir`, refusing escapes. */
  private def resolve(virt: String): Path = {
    val real = rootDir.resolve(virt.stripPrefix("/")).normalize()
    require(real.startsWith(rootDir), s"path escapes root: $virt")
    real
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery)
      .map(_.split("&").toSeq)
      .getOrElse(Seq.empty)
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8"))
          case Array(k)    => Some(URLDecoder.decode(k, "UTF-8") -> "")
          case _           => None
        }
      }
      .toMap

  /** Files.list streams hold an open directory FD until closed. */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  private def statusJson(p: Path): String = {
    val isDir = Files.isDirectory(p)
    val mtime = Files.getLastModifiedTime(p).toMillis
    val len   = if (isDir) 0L else Files.size(p)
    val kids  = if (isDir) listDir(p).size.toLong else 0L
    s"""{"accessTime":$mtime,"blockSize":134217728,"childrenNum":$kids,"fileId":${p.hashCode.toLong & 0x7fffffffL},
       |"group":"supergroup","length":$len,"modificationTime":$mtime,"owner":"graft",
       |"pathSuffix":"${p.getFileName}","permission":"${if (isDir) "755" else "644"}",
       |"replication":${if (isDir) 0 else 1},"storagePolicy":0,"type":"${if (isDir) "DIRECTORY" else "FILE"}"}"""
      .stripMargin.replaceAll("\n", "")
  }

  /** Like [[statusJson]] but with an empty pathSuffix — the form the
    * namenode uses for GETFILESTATUS on the queried path itself. */
  private def selfStatusJson(p: Path): String = {
    val j = statusJson(p)
    j.replace(s""""pathSuffix":"${p.getFileName}"""", """"pathSuffix":""""")
  }

  private def send(ex: HttpExchange, code: Int, body: String, cType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", cType)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def sendError(ex: HttpExchange, code: Int, exception: String, javaClass: String, msg: String): Unit =
    send(
      ex, code,
      s"""{"RemoteException":{"exception":"$exception","javaClassName":"$javaClass","message":"${msg.replace("\"", "'")}"}}""",
    )

  private def notFound(ex: HttpExchange, virt: String): Unit =
    sendError(ex, 404, "FileNotFoundException", "java.io.FileNotFoundException", s"File does not exist: $virt")

  private def redirectSelf(ex: HttpExchange): Unit = {
    val uri = ex.getRequestURI
    val loc = s"http://127.0.0.1:$port${uri.getRawPath}?${uri.getRawQuery}&data=true"
    ex.getResponseHeaders.set("Location", loc)
    ex.sendResponseHeaders(307, -1)
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      val virt = ex.getRequestURI.getPath.stripPrefix("/webhdfs/v1") match {
        case "" => "/"
        case p  => p
      }
      val q      = query(ex)
      val op     = q.getOrElse("op", "").toUpperCase
      val isData = q.get("data").contains("true")
      val real   = resolve(virt)
      op match {
        case "GETFILESTATUS" =>
          if (!Files.exists(real)) notFound(ex, virt)
          else send(ex, 200, s"""{"FileStatus":${selfStatusJson(real)}}""")

        case "LISTSTATUS" =>
          if (!Files.exists(real)) notFound(ex, virt)
          else {
            // listing a FILE returns the file itself with an EMPTY
            // pathSuffix (the client appends the suffix to the queried
            // path — a non-empty one would yield /f.json/f.json)
            val body =
              if (Files.isDirectory(real))
                listDir(real).sortBy(_.getFileName.toString).map(statusJson)
              else Seq(selfStatusJson(real))
            send(ex, 200, body.mkString("""{"FileStatuses":{"FileStatus":[""", ",", "]}}"))
          }

        case "OPEN" =>
          if (!Files.exists(real) || Files.isDirectory(real)) notFound(ex, virt)
          else if (!isData) redirectSelf(ex)
          else {
            val all    = Files.readAllBytes(real)
            val offset = q.get("offset").map(_.toLong).getOrElse(0L).min(all.length.toLong).toInt
            val maxLen = q.get("length").filter(_.nonEmpty).map(_.toLong).getOrElse(Long.MaxValue)
            val len    = math.min(all.length - offset, maxLen).toInt
            ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
            ex.sendResponseHeaders(200, if (len == 0) -1 else len.toLong)
            if (len > 0) ex.getResponseBody.write(all, offset, len)
            ex.close()
          }

        case "CREATE" =>
          if (!isData) redirectSelf(ex)
          else {
            val overwrite = q.get("overwrite").contains("true")
            if (Files.exists(real) && !overwrite)
              sendError(ex, 403, "FileAlreadyExistsException",
                "org.apache.hadoop.fs.FileAlreadyExistsException", s"$virt already exists")
            else {
              Files.createDirectories(real.getParent)
              Files.write(real, ex.getRequestBody.readAllBytes())
              ex.getResponseHeaders.set("Location", s"webhdfs://127.0.0.1:$port$virt")
              ex.sendResponseHeaders(201, -1)
              ex.close()
            }
          }

        case "GETFILEBLOCKLOCATIONS" =>
          // split planning: one synthetic block spanning the whole file
          if (!Files.exists(real)) notFound(ex, virt)
          else {
            val len = if (Files.isDirectory(real)) 0L else Files.size(real)
            send(ex, 200,
              s"""{"BlockLocations":{"BlockLocation":[{"cachedHosts":[],"corrupt":false,
                 |"hosts":["127.0.0.1"],"length":$len,"names":["127.0.0.1:$port"],"offset":0,
                 |"storageTypes":["DISK"],"topologyPaths":["/default-rack/127.0.0.1:$port"]}]}}"""
                .stripMargin.replaceAll("\n", ""))
          }

        case "MKDIRS" =>
          Files.createDirectories(real)
          send(ex, 200, """{"boolean":true}""")

        case "RENAME" =>
          val dst = resolve(q.getOrElse("destination", ""))
          val ok  = Files.exists(real) && Files.isDirectory(dst.getParent) &&
            (!Files.exists(dst))
          if (ok) Files.move(real, dst, StandardCopyOption.ATOMIC_MOVE)
          send(ex, 200, s"""{"boolean":$ok}""")

        case "DELETE" =>
          val recursive = q.get("recursive").contains("true")
          val ok =
            if (!Files.exists(real)) false
            else if (Files.isDirectory(real) && recursive) {
              Files.walk(real).sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
              true
            } else if (Files.isDirectory(real) && listDir(real).nonEmpty) false
            else { Files.delete(real); true }
          send(ex, 200, s"""{"boolean":$ok}""")

        case other =>
          sendError(ex, 400, "UnsupportedOperationException",
            "java.lang.UnsupportedOperationException", s"op $other not implemented by MiniWebHdfsServer")
      }
    } catch {
      case e: Exception =>
        try sendError(ex, 500, e.getClass.getSimpleName, e.getClass.getName, Option(e.getMessage).getOrElse(""))
        catch { case _: Exception => () }
    }
}

package graft.ocsf.ftp

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** A minimal in-JVM FTP server (RFC 959 subset) for exercising Hadoop's
  * real `ftp://` connector end-to-end without network egress.
  *
  * Speaks exactly the protocol surface `FTPFileSystem` + commons-net
  * `FTPClient` use: USER/PASS login, SYST (UNIX listing dialect), TYPE/
  * MODE/STRU, PWD/CWD, passive-mode data connections (PASV), LIST with
  * `ls -l`-style lines the commons-net UNIX parser accepts, RETR/STOR
  * streams, DELE/MKD/RMD, and RNFR/RNTO renames. One thread per control
  * connection — the connector opens a fresh connection per filesystem
  * operation, often concurrently from Spark tasks.
  *
  * The virtual namespace `/` maps onto `rootDir`; paths never escape it
  * (normalized and re-checked). All file timestamps are reported as one
  * fixed instant — irrelevant to the pipeline semantics under test and
  * immune to locale/recency parsing differences.
  */
final class MiniFtpServer(rootDir: Path, user: String, password: String) {
  private val server =
    new ServerSocket(0, 50, InetAddress.getByName("127.0.0.1"))
  private val open = new java.util.concurrent.ConcurrentLinkedQueue[Socket]()
  @volatile private var running = true

  def port: Int = server.getLocalPort

  private val acceptor = new Thread(
    () =>
      while (running) {
        try {
          val s = server.accept()
          open.add(s)
          val t = new Thread(() => try handle(s) finally { open.remove(s); safeClose(s) })
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => () /* server closed */ }
      },
    "mini-ftp-acceptor",
  )
  acceptor.setDaemon(true)

  def start(): this.type = { acceptor.start(); this }

  def stop(): Unit = {
    running = false
    safeCloseServer(server)
    open.asScala.foreach(safeClose)
  }

  private def safeClose(s: Socket): Unit        = try s.close() catch { case _: Exception => () }
  private def safeCloseServer(s: ServerSocket): Unit =
    try s.close() catch { case _: Exception => () }

  /** Map an FTP-namespace path (absolute or cwd-relative) to a real
    * path under `rootDir`, refusing escapes. */
  private def resolve(cwd: String, arg: String): Path = {
    val virt  = if (arg.startsWith("/")) arg else s"${cwd.stripSuffix("/")}/$arg"
    val real  = rootDir.resolve(virt.stripPrefix("/")).normalize()
    require(real.startsWith(rootDir), s"path escapes root: $arg")
    real
  }

  private def virtAbs(cwd: String, arg: String): String =
    if (arg.startsWith("/")) Paths.get(arg).normalize().toString.replace('\\', '/')
    else Paths.get(s"${cwd.stripSuffix("/")}/$arg").normalize().toString.replace('\\', '/')

  /** One `ls -l` line per entry, in the dialect the commons-net
    * UnixFTPEntryParser accepts (fixed date => uniform mod times). */
  private def listLine(p: Path): String = {
    val name = p.getFileName.toString
    if (Files.isDirectory(p)) s"drwxr-xr-x 3 ftp ftp 4096 Jan 1 2024 $name"
    else s"-rw-r--r-- 1 ftp ftp ${Files.size(p)} Jan 1 2024 $name"
  }

  private def handle(sock: Socket): Unit = {
    val in  = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.ISO_8859_1))
    val out = new PrintWriter(new OutputStreamWriter(sock.getOutputStream, StandardCharsets.ISO_8859_1))
    def reply(line: String): Unit = { out.print(line + "\r\n"); out.flush() }

    var cwd                          = "/"
    var loggedIn                     = false
    var pasv: ServerSocket           = null
    var renameFrom: Option[Path]     = None

    def openData(): Option[Socket] =
      Option(pasv).flatMap { ss =>
        try { ss.setSoTimeout(10000); Some(ss.accept()) }
        catch { case _: Exception => None }
        finally { safeCloseServer(ss); pasv = null }
      }

    reply("220 MiniFtpServer ready")
    var done = false
    while (!done) {
      val line = try in.readLine() catch { case _: Exception => null }
      if (line == null) done = true
      else {
        val (cmd, arg) = line.split(" ", 2) match {
          case Array(c)    => (c.toUpperCase, "")
          case Array(c, a) => (c.toUpperCase, a)
        }
        try cmd match {
          case "USER" => reply(if (arg == user) "331 password required" else "331 who?")
          case "PASS" =>
            if (arg == password) { loggedIn = true; reply("230 logged in") }
            else reply("530 login incorrect")
          case _ if !loggedIn => reply("530 not logged in")
          case "SYST" => reply("215 UNIX Type: L8")
          case "TYPE" | "MODE" | "STRU" | "NOOP" => reply("200 ok")
          case "PWD" => reply(s"""257 "$cwd" is current directory""")
          case "CWD" =>
            val target = resolve(cwd, arg)
            if (Files.isDirectory(target)) { cwd = virtAbs(cwd, arg); reply("250 ok") }
            else reply("550 no such directory")
          case "CDUP" =>
            cwd = Option(Paths.get(cwd).getParent).map(_.toString.replace('\\', '/')).getOrElse("/")
            reply("250 ok")
          case "PASV" =>
            if (pasv != null) safeCloseServer(pasv)
            pasv = new ServerSocket(0, 1, InetAddress.getByName("127.0.0.1"))
            val p = pasv.getLocalPort
            reply(s"227 Entering Passive Mode (127,0,0,1,${p >> 8},${p & 0xff})")
          case "LIST" =>
            // commons-net may pass "-a <path>"; flags carry no meaning here
            val cleaned = arg.replaceAll("^-\\S+\\s*", "")
            val target  = if (cleaned.isEmpty) resolve(cwd, ".") else resolve(cwd, cleaned)
            if (!Files.exists(target)) { if (pasv != null) { safeCloseServer(pasv); pasv = null }; reply("550 not found") }
            else {
              reply("150 here comes the listing")
              openData() match {
                case Some(data) =>
                  val w = new PrintWriter(new OutputStreamWriter(data.getOutputStream, StandardCharsets.ISO_8859_1))
                  val entries =
                    if (Files.isDirectory(target)) Files.list(target).iterator().asScala.toSeq
                    else Seq(target)
                  entries.foreach(e => w.print(listLine(e) + "\r\n"))
                  w.flush(); safeClose(data)
                  reply("226 transfer complete")
                case None => reply("425 no data connection")
              }
            }
          case "RETR" =>
            val target = resolve(cwd, arg)
            if (!Files.isRegularFile(target)) reply("550 not found")
            else {
              reply("150 opening data connection")
              openData() match {
                case Some(data) =>
                  Files.copy(target, data.getOutputStream)
                  data.getOutputStream.flush(); safeClose(data)
                  reply("226 transfer complete")
                case None => reply("425 no data connection")
              }
            }
          case "STOR" =>
            val target = resolve(cwd, arg)
            if (!Files.isDirectory(target.getParent)) reply("553 parent missing")
            else {
              reply("150 opening data connection")
              openData() match {
                case Some(data) =>
                  Files.copy(data.getInputStream, target, StandardCopyOption.REPLACE_EXISTING)
                  safeClose(data)
                  reply("226 transfer complete")
                case None => reply("425 no data connection")
              }
            }
          case "DELE" =>
            val target = resolve(cwd, arg)
            if (Files.isRegularFile(target) && Files.deleteIfExists(target)) reply("250 deleted")
            else reply("550 not found")
          case "MKD" =>
            val target = resolve(cwd, arg)
            if (Files.exists(target)) reply("550 exists")
            else { Files.createDirectory(target); reply(s"""257 "${virtAbs(cwd, arg)}" created""") }
          case "RMD" =>
            val target = resolve(cwd, arg)
            if (Files.isDirectory(target) && Files.deleteIfExists(target)) reply("250 removed")
            else reply("550 not removed")
          case "RNFR" =>
            val target = resolve(cwd, arg)
            if (Files.exists(target)) { renameFrom = Some(target); reply("350 ready") }
            else reply("550 not found")
          case "RNTO" =>
            renameFrom match {
              case Some(from) =>
                val to = resolve(cwd, arg)
                renameFrom = None
                if (!Files.isDirectory(to.getParent)) reply("553 parent missing")
                else if (Files.exists(to)) reply("553 destination exists")
                else { Files.move(from, to); reply("250 renamed") }
              case None => reply("503 RNFR first")
            }
          case "QUIT" => reply("221 bye"); done = true
          case _      => reply(s"502 $cmd not implemented")
        } catch {
          case e: Exception => reply(s"451 error: ${e.getClass.getSimpleName}")
        }
      }
    }
    if (pasv != null) safeCloseServer(pasv)
    safeClose(sock)
  }
}

package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.server.PgEndpoint

/** The PostgreSQL wire-protocol door (reference port 9005), driven by
  * an INDEPENDENT minimal client written against the public v3
  * protocol docs — pins the raw frame layout (SSLRequest → 'N',
  * AuthenticationOk 'R'+0, RowDescription 'T', DataRow 'D' with -1
  * NULLs, CommandComplete 'C', ReadyForQuery 'Z'), so psql or a JDBC
  * driver would agree on every frame. */
class PgEndpointSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private var running: PgEndpoint.Running = _
  private var sock: Socket = _
  private var in: BufferedInputStream = _
  private var out: BufferedOutputStream = _

  override def beforeAll(): Unit = {
    Engine.registerAll(spark, sf)
    running = PgEndpoint.start(spark, 0)
    sock = new Socket("127.0.0.1", running.port)
    in = new BufferedInputStream(sock.getInputStream)
    out = new BufferedOutputStream(sock.getOutputStream)
  }
  override def afterAll(): Unit = {
    if (sock != null) sock.close()
    if (running != null) running.stop()
  }

  // ---- independent client helpers ----
  private def readN(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); var off = 0
    while (off < n) { val r = in.read(b, off, n - off); if (r < 0) throw new EOFException; off += r }
    b
  }
  private def i32(b: Array[Byte], off: Int = 0): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def readMsg(): (Char, Array[Byte]) = {
    val tag = in.read(); if (tag < 0) throw new EOFException
    val len = i32(readN(4))
    (tag.toChar, readN(len - 4))
  }
  private def sendStartup(): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    def cstr(s: String): Unit = { body.write(s.getBytes(UTF_8)); body.write(0) }
    body.write(Array[Byte](0, 3, 0, 0)) // protocol 3.0
    cstr("user"); cstr("default"); cstr("database"); cstr("default"); body.write(0)
    val b = body.toByteArray
    val len = b.length + 4
    out.write(Array[Byte](((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte))
    out.write(b); out.flush()
  }
  private def sendQuery(sql: String): Unit = {
    val b = sql.getBytes(UTF_8)
    out.write('Q')
    val len = b.length + 1 + 4
    out.write(Array[Byte](((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte))
    out.write(b); out.write(0); out.flush()
  }
  /** Drain one query's response: (column names, rows, CommandComplete tag). */
  private def readResult(): (Seq[String], Seq[Seq[Option[String]]], String) = {
    var names = Seq.empty[String]
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var complete = ""
    var done = false
    while (!done) readMsg() match {
      case ('T', b) =>
        val n = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
        var off = 2
        names = (1 to n).map { _ =>
          val end = b.indexOf(0.toByte, off)
          val s = new String(b, off, end - off, UTF_8)
          off = end + 1 + 18 // fixed per-field block after the name
          s
        }
      case ('D', b) =>
        val n = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
        var off = 2
        rows += (1 to n).map { _ =>
          val len = i32(b, off); off += 4
          if (len == -1) None
          else { val s = new String(b, off, len, UTF_8); off += len; Some(s) }
        }
      case ('C', b) => complete = new String(b, 0, b.length - 1, UTF_8)
      case ('E', b) => complete = "ERROR:" + new String(b, UTF_8)
      case ('Z', _) => done = true
      case _        => ()
    }
    (names, rows.result(), complete)
  }

  test("SSLRequest answered N; startup reaches AuthenticationOk and ReadyForQuery") {
    // SSLRequest: len 8, code 80877103
    out.write(Array[Byte](0, 0, 0, 8, 4, (0xd2 & 0xff).toByte, 0x16, 0x2f)); out.flush()
    assert(in.read() == 'N', "SSLRequest must be answered with plaintext 'N'")
    sendStartup()
    val (t1, b1) = readMsg()
    assert(t1 == 'R' && i32(b1) == 0, "expected AuthenticationOk (R + int32 0)")
    var ready = false
    while (!ready) readMsg() match {
      case ('Z', st) => assert(st(0) == 'I'); ready = true
      case ('S', _) | ('K', _) => ()
      case (other, _) => fail(s"unexpected startup message '$other'")
    }
  }

  test("simple query: RowDescription names, DataRow values, -1 NULLs, SELECT n tag") {
    sendQuery("SELECT 1 AS x, 'ab' AS s, CAST(NULL AS INT) AS z")
    val (names, rows, complete) = readResult()
    assert(names == Seq("x", "s", "z"))
    assert(rows == Seq(Seq(Some("1"), Some("ab"), None)))
    assert(complete == "SELECT 1")
  }

  test("CH dialect live over the wire; rows match the direct plan") {
    sendQuery("SELECT r_regionkey, r_name FROM region PREWHERE r_regionkey < 3 ORDER BY r_regionkey")
    val (_, rows, complete) = readResult()
    val direct = Engine.t(spark, sf, "region")
      .filter("r_regionkey < 3").orderBy("r_regionkey")
      .collect().map(r => Seq(Some(r.get(0).toString), Some(r.getString(1)))).toSeq
    assert(rows == direct && complete == "SELECT 3")
  }

  test("bad SQL answers ErrorResponse and the session SURVIVES for the next query") {
    sendQuery("SELEC nope")
    val (_, _, complete) = readResult()
    assert(complete.startsWith("ERROR:") && complete.contains("DB::Exception"))
    sendQuery("SELECT 42 AS v")
    val (_, rows, c2) = readResult()
    assert(rows == Seq(Seq(Some("42"))) && c2 == "SELECT 1")
  }
}

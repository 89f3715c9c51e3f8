package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.server.MySqlEndpoint

/** The MySQL wire-protocol door (reference port 9004), driven by an
  * INDEPENDENT minimal client written against the public protocol
  * docs — the packet parsing here shares no code with the server, and
  * the asserts pin the raw byte layout (HandshakeV10 header 0x0a, OK
  * 0x00, EOF 0xfe, ERR 0xff, lenenc framing), so a client like
  * `mysql` or a JDBC driver would agree on every frame. */
class MySqlEndpointSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private var running: MySqlEndpoint.Running = _
  private var sock: Socket = _
  private var in: BufferedInputStream = _
  private var out: BufferedOutputStream = _

  override def beforeAll(): Unit = {
    Engine.registerAll(spark, sf)
    running = MySqlEndpoint.start(spark, 0)
    sock = new Socket("127.0.0.1", running.port)
    in = new BufferedInputStream(sock.getInputStream)
    out = new BufferedOutputStream(sock.getOutputStream)
  }
  override def afterAll(): Unit = {
    if (sock != null) sock.close()
    if (running != null) running.stop()
  }

  // ---- independent client-side protocol helpers ----
  private def readFrame(): (Int, Array[Byte]) = {
    def b(): Int = { val v = in.read(); if (v < 0) throw new EOFException; v }
    val len = b() | (b() << 8) | (b() << 16)
    b() // sequence id
    val buf = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(buf, off, len - off); if (r < 0) throw new EOFException
      off += r
    }
    (len, buf)
  }
  /** Reassembles split packets per the protocol: a 0xffffff-byte frame
    * promises a continuation; the terminating frame is shorter. */
  private def readPacket(): Array[Byte] = {
    val (len0, buf0) = readFrame()
    if (len0 < 0xffffff) buf0
    else {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(buf0)
      var more = true
      while (more) { val (len, buf) = readFrame(); bos.write(buf); more = len == 0xffffff }
      bos.toByteArray
    }
  }
  private def writePacket(seq: Int, payload: Array[Byte]): Unit = {
    val n = payload.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff); out.write((n >> 16) & 0xff)
    out.write(seq & 0xff); out.write(payload); out.flush()
  }
  /** (value, bytesConsumed) of a length-encoded integer at `off`. */
  private def lenenc(p: Array[Byte], off: Int): (Long, Int) =
    (p(off) & 0xff) match {
      case 0xfc => (((p(off + 1) & 0xffL)) | ((p(off + 2) & 0xffL) << 8), 3)
      case 0xfd => ((p(off + 1) & 0xffL) | ((p(off + 2) & 0xffL) << 8) | ((p(off + 3) & 0xffL) << 16), 4)
      case 0xfe => ((0 until 8).map(i => (p(off + 1 + i) & 0xffL) << (8 * i)).sum, 9)
      case v    => (v.toLong, 1)
    }
  private def lenencStr(p: Array[Byte], off: Int): (String, Int) = {
    val (n, c) = lenenc(p, off)
    (new String(p, off + c, n.toInt, UTF_8), c + n.toInt)
  }
  /** Parse a text resultset already positioned after COM_QUERY: returns
    * (column names, rows as Option[String] cells). */
  private def readResultSet(): (Seq[String], Seq[Seq[Option[String]]]) = {
    val head = readPacket()
    assert((head(0) & 0xff) != 0xff, s"ERR: ${new String(head, UTF_8)}")
    val (nCols, _) = lenenc(head, 0)
    val names = (1 to nCols.toInt).map { _ =>
      val cd = readPacket()
      // catalog, schema, table, org_table precede the name
      var off = 0
      for (_ <- 0 until 4) off += lenencStr(cd, off)._2
      lenencStr(cd, off)._1
    }
    assert((readPacket()(0) & 0xff) == 0xfe) // EOF after column defs
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var done = false
    while (!done) {
      val p = readPacket()
      if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true // terminal EOF
      else {
        var off = 0
        rows += names.indices.map { _ =>
          if ((p(off) & 0xff) == 0xfb) { off += 1; None }
          else { val (s, c) = lenencStr(p, off); off += c; Some(s) }
        }
      }
    }
    (names, rows.result())
  }
  private def query(sql: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    writePacket(0, Array[Byte](0x03) ++ sql.getBytes(UTF_8))
    readResultSet()
  }

  test("HandshakeV10 greeting + auth-less login per the public byte layout") {
    val greet = readPacket()
    assert((greet(0) & 0xff) == 0x0a, "protocol version byte must be 10")
    val ver = new String(greet.drop(1).takeWhile(_ != 0), UTF_8)
    assert(ver.contains("graft"))
    assert(new String(greet, UTF_8).contains("mysql_native_password"))
    // HandshakeResponse41: caps, max packet, charset 33, 23 zeros,
    // user "default", empty auth (lenenc 0), plugin name
    val caps = 0x0200L | 0x8000L | 0x80000L // PROTOCOL_41|SECURE_CONN|PLUGIN_AUTH
    val resp = java.nio.ByteBuffer.allocate(128).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    resp.putInt(caps.toInt).putInt(1 << 24).put(33.toByte).put(new Array[Byte](23))
    resp.put("default".getBytes(UTF_8)).put(0.toByte)
    resp.put(0.toByte) // empty auth response
    resp.put("mysql_native_password".getBytes(UTF_8)).put(0.toByte)
    writePacket(1, java.util.Arrays.copyOf(resp.array(), resp.position()))
    val ok = readPacket()
    assert((ok(0) & 0xff) == 0x00, "login must answer an OK packet")
  }

  test("COM_PING answers OK") {
    writePacket(0, Array[Byte](0x0e))
    assert((readPacket()(0) & 0xff) == 0x00)
  }

  test("COM_QUERY text resultset: names, values, NULL marker 0xfb") {
    val (names, rows) = query("SELECT 1 AS x, 'ab' AS s, CAST(NULL AS INT) AS z")
    assert(names == Seq("x", "s", "z"))
    assert(rows == Seq(Seq(Some("1"), Some("ab"), None)))
  }

  test("COM_QUERY over a registered table matches the direct plan (CH dialect live)") {
    val (names, rows) = query(
      "SELECT r_regionkey, r_name FROM region PREWHERE r_regionkey < 3 ORDER BY r_regionkey")
    assert(names == Seq("r_regionkey", "r_name"))
    val direct = Engine.t(spark, sf, "region")
      .filter("r_regionkey < 3").orderBy("r_regionkey")
      .collect().map(r => Seq(Some(r.get(0).toString), Some(r.getString(1)))).toSeq
    assert(rows == direct)
  }

  test("bad SQL answers an ERR packet (0xff + code)") {
    writePacket(0, Array[Byte](0x03) ++ "SELEC nope".getBytes(UTF_8))
    val p = readPacket()
    assert((p(0) & 0xff) == 0xff)
    assert(new String(p, UTF_8).contains("DB::Exception"))
  }

  test("a row past the 16 MB frame limit SPLITS per the protocol instead of wrapping") {
    // 17,000,017-byte payload = two frames (0xffffff + remainder); a
    // truncated 3-byte length would desync the connection (ADVICE r18)
    val n = 17000000
    val (names, rows) = query(s"SELECT repeat('x', $n) AS big, 7 AS tail")
    assert(names == Seq("big", "tail"))
    assert(rows.length == 1)
    assert(rows.head.head.exists(s => s.length == n && s.forall(_ == 'x')))
    assert(rows.head(1) == Some("7"))
    // the connection survives: a follow-up query still works
    val (_, r2) = query("SELECT 42 AS ok")
    assert(r2 == Seq(Seq(Some("42"))))
  }

  test("timestamps and doubles render in CH text form over the wire") {
    val (_, rows) = query(
      "SELECT TIMESTAMP'2024-03-01 12:30:00' AS t, CAST(2.5 AS DOUBLE) AS d")
    assert(rows == Seq(Seq(Some("2024-03-01 12:30:00"), Some("2.5"))))
  }
}

package graft

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import graft.server.MySqlServer

/** Integration spec for the loopback MySQL text-protocol front-end: a raw
  * socket client (written here, independent of the server's own encoder)
  * performs the full protocol conversation — handshake v10, handshake
  * response 41, COM_QUERY result sets, ERR packets, COM_INIT_DB, COM_PING,
  * big-packet splitting, COM_QUIT — against the reference's observable
  * surface (gateway.go:55-66 accept, :183-195 greeting, conn.go:150-244
  * framing, packet_err.go:13-21 ERR). */
class MySqlServerSpec extends SparkSpec {

  private val backends = Map("prod" -> sf)
  private val databases = Map("small" -> sf)

  // ---- a tiny independent MySQL client ------------------------------------

  private final class Client(port: Int) {
    val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(120000)
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out = new BufferedOutputStream(sock.getOutputStream)

    private def readFully(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val k = in.read(b, off, n - off)
        if (k < 0) throw new EOFException
        off += k
      }
      b
    }

    /** Read one logical packet (reassembling 2²⁴−1 splits); returns the
      * LAST chunk's sequence id with the payload. */
    def readPacket(): (Int, Array[Byte]) = {
      val buf = new ByteArrayOutputStream()
      var seq = 0
      var more = true
      while (more) {
        val h = readFully(4)
        val len = (h(0) & 0xFF) | ((h(1) & 0xFF) << 8) | ((h(2) & 0xFF) << 16)
        seq = h(3) & 0xFF
        if (len > 0) buf.write(readFully(len), 0, len)
        more = len == 0xFFFFFF
      }
      (seq, buf.toByteArray)
    }

    def writePacket(seq: Int, payload: Array[Byte]): Unit = {
      val len = payload.length
      require(len < 0xFFFFFF, "test client sends small packets only")
      out.write(len & 0xFF); out.write((len >>> 8) & 0xFF)
      out.write((len >>> 16) & 0xFF); out.write(seq & 0xFF)
      out.write(payload)
      out.flush()
    }

    def eofReached(): Boolean = in.read() == -1

    def close(): Unit = sock.close()
  }

  /** Cursor over a payload for parsing server packets. */
  private final class Reader(p: Array[Byte]) {
    var i = 0
    def int1(): Int = { val v = p(i) & 0xFF; i += 1; v }
    def int2(): Int = int1() | (int1() << 8)
    def int3(): Int = int2() | (int1() << 16)
    def int4(): Long = int2().toLong | (int2().toLong << 16)
    def skip(n: Int): Unit = i += n
    def nulString(): String = {
      val s = i
      while (p(i) != 0) i += 1
      val r = new String(p, s, i - s, UTF_8); i += 1; r
    }
    def lenencInt(): Long = int1() match {
      case 0xFC => int2().toLong
      case 0xFD => int3().toLong
      case 0xFE => (0 until 8).map(k => int1().toLong << (8 * k)).sum
      case v => v.toLong
    }
    def lenencString(): String = {
      val n = lenencInt().toInt
      val r = new String(p, i, n, UTF_8); i += n; r
    }
    def remaining: Int = p.length - i
  }

  private def lenencStr(b: ByteArrayOutputStream, s: String): Unit = {
    val bytes = s.getBytes(UTF_8)
    require(bytes.length < 251)
    b.write(bytes.length); b.write(bytes, 0, bytes.length)
  }

  /** Build a HandshakeResponse41 (caps: 4.1 + secure + plugin-auth [+ db]). */
  private def handshakeResponse(user: String, db: Option[String]): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    var caps = 0x00000200 | 0x00008000 | 0x00080000 // 41 | secure | plugin auth
    if (db.isDefined) caps |= 0x00000008
    caps |= 0x00100000 // connect attrs
    def int4(v: Int): Unit =
      (0 until 4).foreach(k => b.write((v >>> (8 * k)) & 0xFF))
    int4(caps)
    int4(1 << 24) // max packet
    b.write(46) // utf8mb4_bin
    (1 to 23).foreach(_ => b.write(0))
    b.write(user.getBytes(UTF_8), 0, user.getBytes(UTF_8).length); b.write(0)
    b.write(0) // empty auth response (1-byte length form)
    db.foreach { d =>
      b.write(d.getBytes(UTF_8), 0, d.getBytes(UTF_8).length); b.write(0)
    }
    b.write("mysql_native_password".getBytes(UTF_8), 0, 21); b.write(0)
    // connect attrs: program_name → graft-spec
    val attrs = new ByteArrayOutputStream()
    lenencStr(attrs, "program_name"); lenencStr(attrs, "graft-spec")
    b.write(attrs.size()); b.write(attrs.toByteArray, 0, attrs.size())
    b.toByteArray
  }

  /** Connect + authenticate; asserts the greeting shape on the way. */
  private def login(port: Int, user: String = "prod.alice",
      db: Option[String] = None): Client = {
    val c = new Client(port)
    val (seq0, greeting) = c.readPacket()
    assert(seq0 == 0)
    val g = new Reader(greeting)
    assert(g.int1() == 10, "protocol version must be 10")
    assert(g.nulString() == Engine.version)
    g.int4() // thread id
    g.skip(8 + 1) // salt part 1 + filler
    val capsLow = g.int2()
    assert((capsLow & 0x0200) != 0, "must advertise CLIENT_PROTOCOL_41")
    g.int1() // charset
    g.int2() // status
    g.int2() // caps high
    val saltLen = g.int1()
    g.skip(10)
    g.skip(math.max(13, saltLen - 8)) // salt part 2
    c.writePacket(1, handshakeResponse(user, db))
    val (_, ok) = c.readPacket()
    assert((ok(0) & 0xFF) == 0x00, s"expected OK after auth, got 0x${(ok(0) & 0xFF).toHexString}")
    c
  }

  /** Issue COM_QUERY and parse the full EOF-delimited text result set. */
  private def query(c: Client, sql: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    val payload = Array[Byte](0x03) ++ sql.getBytes(UTF_8)
    c.writePacket(0, payload)
    val (_, first) = c.readPacket()
    (first(0) & 0xFF) match {
      case 0xFF =>
        val r = new Reader(first); r.int1()
        val code = r.int2()
        throw Engine.EngineError(code, "", new String(first, 9, first.length - 9, UTF_8))
      case 0x00 => (Nil, Nil) // OK: no result set
      case _ =>
        val ncols = new Reader(first).lenencInt().toInt
        val cols = (1 to ncols).map { _ =>
          val (_, cd) = c.readPacket()
          val r = new Reader(cd)
          r.lenencString() // "def"
          r.lenencString(); r.lenencString(); r.lenencString()
          r.lenencString() // name
        }
        val (_, eof1) = c.readPacket()
        assert((eof1(0) & 0xFF) == 0xFE && eof1.length < 9)
        val rows = Seq.newBuilder[Seq[Option[String]]]
        var done = false
        while (!done) {
          val (_, p) = c.readPacket()
          if ((p(0) & 0xFF) == 0xFE && p.length < 9) done = true
          else {
            val r = new Reader(p)
            rows += (1 to ncols).map { _ =>
              if ((p(r.i) & 0xFF) == 0xFB) { r.skip(1); None }
              else Some(r.lenencString())
            }
          }
        }
        (cols, rows.result())
    }
  }

  private def simpleCommand(c: Client, cmd: Byte, tail: String = ""): Array[Byte] = {
    c.writePacket(0, Array[Byte](cmd) ++ tail.getBytes(UTF_8))
    c.readPacket()._2
  }

  test("handshake + SELECT round-trip with correct column metadata over a raw socket") {
    val srv = MySqlServer.start(spark, backends, databases)
    try {
      val c = login(srv.port)
      // the mysql CLI's very first statement
      val (cols0, rows0) = query(c, "select @@version_comment limit 1")
      assert(rows0 == Seq(Seq(Some("graft Spark engine"))))
      val (cols, rows) = query(c,
        "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3 " +
          "ORDER BY n_nationkey")
      assert(cols == Seq("n_nationkey", "n_name"))
      assert(rows.length == 3)
      assert(rows.map(_.head) == Seq(Some("0"), Some("1"), Some("2")))
      assert(rows.forall(_(1).exists(_.nonEmpty)))
      // typed NULL → 0xFB marker, not the string "null"
      val (_, nullRows) = query(c, "SELECT CAST(NULL AS STRING) AS v")
      assert(nullRows == Seq(Seq(None)))
      c.writePacket(0, Array[Byte](0x01)) // COM_QUIT
      assert(c.eofReached(), "server must close the socket after COM_QUIT")
      c.close()
    } finally srv.close()
  }

  test("session state over the wire: SET NAMES → OK; SHOW VARIABLES reflects it") {
    val srv = MySqlServer.start(spark, backends, databases)
    try {
      val c = login(srv.port)
      val (cols, rows) = query(c, "SET NAMES utf8mb4 COLLATE utf8mb4_general_ci")
      assert(cols.isEmpty && rows.isEmpty, "SET must answer a bare OK packet")
      val (_, vars) = query(c, "SHOW VARIABLES LIKE 'collation_connection'")
      assert(vars == Seq(Seq(Some("collation_connection"),
        Some("utf8mb4_general_ci"))))
      c.close()
    } finally srv.close()
  }

  test("bad query answers the structured ERR packet (code 1105, SQLSTATE 08S01)") {
    val srv = MySqlServer.start(spark, backends, databases)
    try {
      val c = login(srv.port)
      c.writePacket(0, Array[Byte](0x03) ++
        "SELECT nope FROM not_a_table".getBytes(UTF_8))
      val (_, err) = c.readPacket()
      val r = new Reader(err)
      assert(r.int1() == 0xFF)
      assert(r.int2() == 1105)
      assert(r.int1() == '#')
      assert(new String(err, 4, 5, UTF_8) == "08S01")
      // the connection survives an ERR: next query still works
      val (_, rows) = query(c, "SELECT 1 AS one")
      assert(rows == Seq(Seq(Some("1"))))
      c.close()
    } finally srv.close()
  }

  test("COM_INIT_DB routes / rejects; COM_PING answers OK; unknown cluster is ERR") {
    val srv = MySqlServer.start(spark, backends, databases)
    try {
      val c = login(srv.port)
      assert((simpleCommand(c, 0x0E)(0) & 0xFF) == 0x00) // COM_PING → OK
      assert((simpleCommand(c, 0x02, "small")(0) & 0xFF) == 0x00) // USE small
      val bad = simpleCommand(c, 0x02, "nope")
      assert((bad(0) & 0xFF) == 0xFF, "unknown database must be ERR")
      c.close()
      // routing failure at the handshake: unknown cluster id → ERR, close
      val c2 = new Client(srv.port)
      c2.readPacket() // greeting
      c2.writePacket(1, handshakeResponse("nocluster.bob", None))
      val (_, err) = c2.readPacket()
      assert((err(0) & 0xFF) == 0xFF)
      c2.close()
      // ClientConnectWithDB: database bound straight from the handshake
      val c3 = login(srv.port, "prod.carol", db = Some("small"))
      val (_, rows) = query(c3, "SELECT count(*) AS n FROM region")
      assert(rows.head.head.exists(_.toLong > 0))
      c3.close()
    } finally srv.close()
  }

  test("oversize result splits at the 2^24-1 packet boundary and reassembles") {
    val srv = MySqlServer.start(spark, backends, databases)
    try {
      val c = login(srv.port)
      // one row whose single value is > 16 MiB: the row packet must arrive
      // as a MaxPayload chunk + continuation (the conn.go:199-244 rule)
      val n = 0xFFFFFF + 512
      val (_, rows) = query(c,
        s"SELECT length(repeat('a', $n)) AS len, repeat('a', $n) AS body")
      assert(rows.head.head.contains(n.toString))
      assert(rows.head(1).exists(_.length == n))
      c.close()
    } finally srv.close()
  }
}

package graft.sshd

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.math.BigInteger
import java.net.{ServerSocket, Socket}
import java.nio.file.{Files, Path, StandardOpenOption}
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, MessageDigest, SecureRandom, Signature}
import java.security.spec.X509EncodedKeySpec
import javax.crypto.{Cipher, KeyAgreement, Mac}
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Minimal in-process SSH2 + SFTP(v3) SERVER, pure JDK, test scope.
  *
  * Exists to exercise the REAL JSch client transport
  * ([[graft.sinks.Sftp.JschTransport]]) end to end — key exchange,
  * encryption, MAC, password and publickey auth, and the SFTP
  * subsystem — without a network or an installed sshd. One fixed,
  * modern algorithm suite is implemented (the first ones JSch 0.2.x
  * proposes, so negotiation always lands here):
  *
  *  - kex `curve25519-sha256` (RFC 8731) via JDK X25519
  *  - host key `ssh-ed25519` (RFC 8709) via JDK Ed25519
  *  - cipher `aes128-ctr` both directions (RFC 4344)
  *  - mac `hmac-sha2-256` (RFC 6668), compression `none`
  *
  * Auth: password (against `users`) and publickey (against
  * `authorizedKeys` wire blobs; ssh-ed25519 / rsa-sha2-256/512 /
  * ssh-rsa signatures verified). The SFTP subsystem serves a local
  * `rootDir` with the packets JSch's put/stat/mkdir/rm path uses:
  * INIT REALPATH OPEN WRITE READ CLOSE MKDIR STAT LSTAT FSTAT REMOVE
  * RENAME RMDIR OPENDIR READDIR.
  *
  * This is a test double of OpenSSH behavior for wire-compat purposes,
  * not a hardened server.
  */
class MiniSshServer(
    rootDir: Path,
    users: Map[String, String] = Map.empty,
    authorizedKeys: Seq[Array[Byte]] = Nil) extends AutoCloseable {

  private val hostKey: KeyPair = {
    val g = KeyPairGenerator.getInstance("Ed25519")
    g.generateKeyPair()
  }

  /** Wire-format host key blob: string "ssh-ed25519" + string raw32.
    * (Raw key = last 32 bytes of the X.509 SubjectPublicKeyInfo.)
    */
  val hostKeyBlob: Array[Byte] = {
    val raw = hostKey.getPublic.getEncoded.takeRight(32)
    val b = new SshOut
    b.string("ssh-ed25519"); b.bytes(raw)
    b.toArray
  }

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  val log = new java.util.concurrent.ConcurrentLinkedQueue[String]

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      val t = new Thread(() => handle(sock))
      t.setDaemon(true); t.start()
    } catch { case _: Exception => () }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = server.close()

  // ------------------------------------------------------------------
  // byte-level helpers
  private class SshOut {
    private val bos = new java.io.ByteArrayOutputStream
    def byte(b: Int): SshOut = { bos.write(b); this }
    def raw(a: Array[Byte]): SshOut = { bos.write(a); this }
    def bool(v: Boolean): SshOut = byte(if (v) 1 else 0)
    def uint32(v: Long): SshOut = {
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt); this
    }
    def uint64(v: Long): SshOut = { uint32(v >>> 32); uint32(v & 0xffffffffL) }
    def bytes(a: Array[Byte]): SshOut = { uint32(a.length); raw(a) }
    def string(s: String): SshOut = bytes(s.getBytes("UTF-8"))
    def mpint(v: BigInteger): SshOut = bytes(v.toByteArray match {
      case a if v.signum() == 0 => Array.empty[Byte]
      case a => a
    })
    def toArray: Array[Byte] = bos.toByteArray
  }

  private class SshIn(buf: Array[Byte]) {
    private var pos = 0
    def byte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def bool(): Boolean = byte() != 0
    def uint32(): Long = {
      val v = ((buf(pos) & 0xffL) << 24) | ((buf(pos + 1) & 0xffL) << 16) |
        ((buf(pos + 2) & 0xffL) << 8) | (buf(pos + 3) & 0xffL)
      pos += 4; v
    }
    def uint64(): Long = (uint32() << 32) | uint32()
    def bytes(): Array[Byte] = {
      val n = uint32().toInt
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    def string(): String = new String(bytes(), "UTF-8")
    def remaining(): Array[Byte] = java.util.Arrays.copyOfRange(buf, pos, buf.length)
  }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    md.digest()
  }

  // ------------------------------------------------------------------
  // per-connection transport state
  private class Conn(sock: Socket) {
    val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))
    val rnd = new SecureRandom()
    var seqIn = 0L
    var seqOut = 0L
    // null until NEWKEYS
    var decrypt: Cipher = null
    var encrypt: Cipher = null
    var macIn: Mac = null
    var macOut: Mac = null

    def readPacket(): Array[Byte] = {
      if (decrypt == null) {
        val len = in.readInt()
        require(len > 0 && len < 65536, s"bad packet length $len")
        val body = new Array[Byte](len)
        in.readFully(body)
        seqIn += 1
        val padLen = body(0) & 0xff
        java.util.Arrays.copyOfRange(body, 1, len - padLen)
      } else {
        val first = new Array[Byte](16)
        in.readFully(first)
        val p0 = decrypt.update(first)
        val len = ((p0(0) & 0xff) << 24) | ((p0(1) & 0xff) << 16) |
          ((p0(2) & 0xff) << 8) | (p0(3) & 0xff)
        require(len > 0 && len < 65536, s"bad packet length $len")
        val rest = new Array[Byte](len + 4 - 16)
        in.readFully(rest)
        val p1 = if (rest.nonEmpty) decrypt.update(rest) else Array.empty[Byte]
        val mac = new Array[Byte](32)
        in.readFully(mac)
        val plain = p0 ++ p1
        macIn.reset()
        macIn.update(Array(
          ((seqIn >> 24) & 0xff).toByte, ((seqIn >> 16) & 0xff).toByte,
          ((seqIn >> 8) & 0xff).toByte, (seqIn & 0xff).toByte))
        macIn.update(plain)
        val want = macIn.doFinal()
        require(java.util.Arrays.equals(want, mac), "MAC mismatch on inbound packet")
        seqIn += 1
        val padLen = plain(4) & 0xff
        java.util.Arrays.copyOfRange(plain, 5, plain.length - padLen)
      }
    }

    def writePacket(payload: Array[Byte]): Unit = {
      val block = if (encrypt == null) 8 else 16
      var padLen = block - ((payload.length + 5) % block)
      if (padLen < 4) padLen += block
      val pad = new Array[Byte](padLen)
      rnd.nextBytes(pad)
      val len = 1 + payload.length + padLen
      val full = new SshOut().uint32(len).byte(padLen).raw(payload).raw(pad).toArray
      if (encrypt == null) out.write(full)
      else {
        macOut.reset()
        macOut.update(Array(
          ((seqOut >> 24) & 0xff).toByte, ((seqOut >> 16) & 0xff).toByte,
          ((seqOut >> 8) & 0xff).toByte, (seqOut & 0xff).toByte))
        macOut.update(full)
        val mac = macOut.doFinal()
        out.write(encrypt.update(full))
        out.write(mac)
      }
      out.flush()
      seqOut += 1
    }
  }

  // ------------------------------------------------------------------
  private val ServerVersion = "SSH-2.0-graft_minisshd"

  private def handle(sock: Socket): Unit = {
    try {
      sock.setSoTimeout(30000)
      val conn = new Conn(sock)
      // version exchange (RFC 4253 §4.2)
      conn.out.write((ServerVersion + "\r\n").getBytes("UTF-8"))
      conn.out.flush()
      val clientVersion = {
        var line = readLine(conn.in)
        while (!line.startsWith("SSH-")) line = readLine(conn.in)
        line
      }
      // KEXINIT exchange — keep raw payloads for the exchange hash
      val serverKexPayload = {
        val cookie = new Array[Byte](16)
        conn.rnd.nextBytes(cookie)
        new SshOut().byte(20).raw(cookie)
          .string("curve25519-sha256")
          .string("ssh-ed25519")
          .string("aes128-ctr").string("aes128-ctr")
          .string("hmac-sha2-256").string("hmac-sha2-256")
          .string("none").string("none")
          .string("").string("")
          .bool(false).uint32(0).toArray
      }
      conn.writePacket(serverKexPayload)
      var clientKexPayload: Array[Byte] = null
      while (clientKexPayload == null) {
        val p = conn.readPacket()
        if ((p(0) & 0xff) == 20) clientKexPayload = p
      }
      // SSH_MSG_KEX_ECDH_INIT (30): client X25519 public key
      val qC = {
        var q: Array[Byte] = null
        while (q == null) {
          val p = conn.readPacket()
          if ((p(0) & 0xff) == 30) { val r = new SshIn(p); r.byte(); q = r.bytes() }
        }
        q
      }
      // server X25519 keypair + shared secret
      val xkg = KeyPairGenerator.getInstance("X25519")
      val xkp = xkg.generateKeyPair()
      val qS = xkp.getPublic.getEncoded.takeRight(32)
      val clientPub = KeyFactory.getInstance("X25519").generatePublic(
        new X509EncodedKeySpec(X25519SpkiPrefix ++ qC))
      val ka = KeyAgreement.getInstance("X25519")
      ka.init(xkp.getPrivate)
      ka.doPhase(clientPub, true)
      // RFC 8731 §3: the raw 32-byte output is interpreted as a
      // fixed-length BIG-endian unsigned integer for the mpint
      val k = new BigInteger(1, ka.generateSecret())
      val kMpint = new SshOut().mpint(k).toArray
      val h = sha256(
        new SshOut().string(clientVersion).toArray,
        new SshOut().string(ServerVersion).toArray,
        new SshOut().bytes(clientKexPayload).toArray,
        new SshOut().bytes(serverKexPayload).toArray,
        new SshOut().bytes(hostKeyBlob).toArray,
        new SshOut().bytes(qC).toArray,
        new SshOut().bytes(qS).toArray,
        kMpint)
      val sessionId = h
      val sig = {
        val s = Signature.getInstance("Ed25519")
        s.initSign(hostKey.getPrivate)
        s.update(h)
        val raw = s.sign()
        new SshOut().string("ssh-ed25519").bytes(raw).toArray
      }
      // SSH_MSG_KEX_ECDH_REPLY (31)
      conn.writePacket(new SshOut().byte(31)
        .bytes(hostKeyBlob).bytes(qS).bytes(sig).toArray)
      conn.writePacket(Array(21.toByte)) // NEWKEYS
      // await client NEWKEYS
      while ((conn.readPacket()(0) & 0xff) != 21) ()
      // key derivation (RFC 4253 §7.2); SHA-256, one round is enough
      // for 16/32-byte keys
      def kdf(x: Char, n: Int): Array[Byte] = {
        var key = sha256(kMpint, h, Array(x.toByte), sessionId)
        while (key.length < n) key = key ++ sha256(kMpint, h, key)
        key.take(n)
      }
      conn.decrypt = {
        val c = Cipher.getInstance("AES/CTR/NoPadding")
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(kdf('C', 16), "AES"),
          new IvParameterSpec(kdf('A', 16)))
        c
      }
      conn.encrypt = {
        val c = Cipher.getInstance("AES/CTR/NoPadding")
        c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(kdf('D', 16), "AES"),
          new IvParameterSpec(kdf('B', 16)))
        c
      }
      conn.macIn = { val m = Mac.getInstance("HmacSHA256")
        m.init(new SecretKeySpec(kdf('E', 32), "HmacSHA256")); m }
      conn.macOut = { val m = Mac.getInstance("HmacSHA256")
        m.init(new SecretKeySpec(kdf('F', 32), "HmacSHA256")); m }
      // service + auth + connection protocol
      mainLoop(conn, sessionId)
    } catch {
      case _: EOFException | _: IOException => ()
      case e: Exception => log.add(s"conn error: ${e.getMessage}")
    } finally sock.close()
  }

  private def readLine(in: DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    if (c < 0) throw new EOFException
    sb.toString
  }

  private val X25519SpkiPrefix =
    Array[Byte](0x30, 0x2a, 0x30, 0x05, 0x06, 0x03, 0x2b, 0x65, 0x6e, 0x03, 0x21, 0x00)
  private val Ed25519SpkiPrefix =
    Array[Byte](0x30, 0x2a, 0x30, 0x05, 0x06, 0x03, 0x2b, 0x65, 0x70, 0x03, 0x21, 0x00)

  // ------------------------------------------------------------------
  private def mainLoop(conn: Conn, sessionId: Array[Byte]): Unit = {
    var authed = false
    var clientChannel = -1L
    var sftp: SftpHandler = null
    var open = true
    while (open) {
      val p = conn.readPacket()
      val msg = p(0) & 0xff
      msg match {
        case 1 => open = false // DISCONNECT
        case 2 | 4 => () // IGNORE / DEBUG
        case 5 => // SERVICE_REQUEST
          val r = new SshIn(p); r.byte()
          conn.writePacket(new SshOut().byte(6).string(r.string()).toArray)
        case 80 => // GLOBAL_REQUEST
          val r = new SshIn(p); r.byte(); r.string()
          if (r.bool()) conn.writePacket(Array(82.toByte)) // REQUEST_FAILURE
        case 50 => // USERAUTH_REQUEST
          val r = new SshIn(p); r.byte()
          val user = r.string(); r.string() /* service */
          val method = r.string()
          method match {
            case "password" =>
              r.bool()
              val pass = r.string()
              if (users.get(user).contains(pass)) {
                authed = true
                conn.writePacket(Array(52.toByte)) // SUCCESS
              } else {
                log.add(s"password rejected for $user")
                conn.writePacket(new SshOut().byte(51)
                  .string("publickey,password").bool(false).toArray)
              }
            case "publickey" =>
              val hasSig = r.bool()
              val alg = r.string()
              val blob = r.bytes()
              val known = authorizedKeys.exists(java.util.Arrays.equals(_, blob))
              if (!hasSig) {
                if (known)
                  conn.writePacket(new SshOut().byte(60).string(alg).bytes(blob).toArray)
                else
                  conn.writePacket(new SshOut().byte(51)
                    .string("publickey,password").bool(false).toArray)
              } else {
                val sigBlob = r.bytes()
                val signed = new SshOut().bytes(sessionId).byte(50)
                  .string(user).string("ssh-connection").string("publickey")
                  .bool(true).string(alg).bytes(blob).toArray
                if (known && verifySig(alg, blob, sigBlob, signed)) {
                  authed = true
                  conn.writePacket(Array(52.toByte))
                } else {
                  log.add(s"publickey rejected for $user (alg=$alg known=$known)")
                  conn.writePacket(new SshOut().byte(51)
                    .string("publickey,password").bool(false).toArray)
                }
              }
            case _ => // "none" and anything else
              conn.writePacket(new SshOut().byte(51)
                .string("publickey,password").bool(false).toArray)
          }
        case 90 => // CHANNEL_OPEN
          val r = new SshIn(p); r.byte()
          val tpe = r.string()
          val sender = r.uint32(); r.uint32(); r.uint32()
          if (tpe == "session" && authed) {
            clientChannel = sender
            conn.writePacket(new SshOut().byte(91)
              .uint32(sender).uint32(0).uint32(0x40000000L).uint32(65536).toArray)
          } else {
            conn.writePacket(new SshOut().byte(92).uint32(sender)
              .uint32(if (authed) 3 else 1).string("rejected").string("").toArray)
          }
        case 98 => // CHANNEL_REQUEST
          val r = new SshIn(p); r.byte(); r.uint32()
          val req = r.string()
          val wantReply = r.bool()
          if (req == "subsystem" && r.string() == "sftp") {
            sftp = new SftpHandler(rootDir)
            if (wantReply)
              conn.writePacket(new SshOut().byte(99).uint32(clientChannel).toArray)
          } else if (wantReply)
            conn.writePacket(new SshOut().byte(100).uint32(clientChannel).toArray)
        case 94 => // CHANNEL_DATA → SFTP stream
          val r = new SshIn(p); r.byte(); r.uint32()
          val data = r.bytes()
          if (sftp != null) {
            sftp.feed(data).foreach { reply =>
              conn.writePacket(new SshOut().byte(94)
                .uint32(clientChannel).bytes(reply).toArray)
            }
            // hand the window back so big uploads never stall
            conn.writePacket(new SshOut().byte(93)
              .uint32(clientChannel).uint32(data.length.toLong).toArray)
          }
        case 96 => () // CHANNEL_EOF
        case 97 => // CHANNEL_CLOSE
          if (sftp != null) sftp.closeAll()
          conn.writePacket(new SshOut().byte(97).uint32(clientChannel).toArray)
          open = false
        case other =>
          // SSH_MSG_UNIMPLEMENTED for anything unexpected
          conn.writePacket(new SshOut().byte(3).uint32(conn.seqIn - 1).toArray)
      }
    }
  }

  private def verifySig(alg: String, blob: Array[Byte], sigBlob: Array[Byte],
      signed: Array[Byte]): Boolean = try {
    val sr = new SshIn(sigBlob)
    val sigAlg = sr.string()
    val sig = sr.bytes()
    val br = new SshIn(blob)
    val blobAlg = br.string()
    blobAlg match {
      case "ssh-ed25519" =>
        val raw = br.bytes()
        val pub = KeyFactory.getInstance("Ed25519").generatePublic(
          new X509EncodedKeySpec(Ed25519SpkiPrefix ++ raw))
        val v = Signature.getInstance("Ed25519")
        v.initVerify(pub); v.update(signed); v.verify(sig)
      case "ssh-rsa" =>
        val e = new BigInteger(1, br.bytes())
        val n = new BigInteger(1, br.bytes())
        val pub = KeyFactory.getInstance("RSA").generatePublic(
          new java.security.spec.RSAPublicKeySpec(n, e))
        val jalg = sigAlg match {
          case "rsa-sha2-512" => "SHA512withRSA"
          case "rsa-sha2-256" => "SHA256withRSA"
          case _ => "SHA1withRSA"
        }
        val v = Signature.getInstance(jalg)
        v.initVerify(pub); v.update(signed); v.verify(sig)
      case _ => false
    }
  } catch { case e: Exception => log.add(s"sig verify error: ${e.getMessage}"); false }

  // ------------------------------------------------------------------
  /** SFTP v3 packet handler over `rootDir`. Feed channel bytes in, get
    * complete reply packets (length-prefixed) out.
    */
  private class SftpHandler(root: Path) {
    private val pending = new java.io.ByteArrayOutputStream
    private val handles =
      new java.util.HashMap[String, java.nio.channels.FileChannel]
    private val dirHandles = new java.util.HashMap[String, java.util.Iterator[Path]]
    private var nextHandle = 0

    private def resolve(remote: String): Path = {
      val clean = remote.replace("\\", "/").stripPrefix("/")
      val p = root.resolve(clean).normalize()
      require(p.startsWith(root), s"path escape: $remote")
      p
    }

    def closeAll(): Unit = {
      handles.values.forEach(_.close()); handles.clear(); dirHandles.clear()
    }

    def feed(data: Array[Byte]): Seq[Array[Byte]] = {
      pending.write(data)
      val replies = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var buf = pending.toByteArray
      var consumed = 0
      while (buf.length - consumed >= 4) {
        val len = ((buf(consumed) & 0xff) << 24) | ((buf(consumed + 1) & 0xff) << 16) |
          ((buf(consumed + 2) & 0xff) << 8) | (buf(consumed + 3) & 0xff)
        if (buf.length - consumed - 4 < len) {
          // incomplete
          buf = buf.drop(consumed); consumed = 0
          pending.reset(); pending.write(buf)
          return replies.toSeq
        }
        val pkt = java.util.Arrays.copyOfRange(buf, consumed + 4, consumed + 4 + len)
        consumed += 4 + len
        replies ++= handlePacket(pkt)
      }
      pending.reset()
      pending.write(buf.drop(consumed))
      replies.toSeq
    }

    private def frame(payload: Array[Byte]): Array[Byte] =
      new SshOut().bytes(payload).toArray

    private def status(id: Long, code: Int, msg: String): Array[Byte] =
      frame(new SshOut().byte(101).uint32(id).uint32(code)
        .string(msg).string("en").toArray)

    private def attrsFor(p: Path): Array[Byte] = {
      val isDir = Files.isDirectory(p)
      val size = if (isDir) 0L else Files.size(p)
      val perms = if (isDir) 0x4000 | 0x1ff else 0x8000 | 0x1b6 // dir 0777 / file 0666
      new SshOut().uint32(0x1L | 0x4L) // SIZE | PERMISSIONS
        .uint64(size).uint32(perms.toLong).toArray
    }

    private def handlePacket(pkt: Array[Byte]): Seq[Array[Byte]] = {
      val r = new SshIn(pkt)
      val tpe = r.byte()
      tpe match {
        case 1 => // INIT → VERSION 3
          Seq(frame(new SshOut().byte(2).uint32(3).toArray))
        case 16 => // REALPATH → NAME
          val id = r.uint32()
          val path = r.string()
          val canon =
            if (path == "." || path.isEmpty) "/"
            else ("/" + path.stripPrefix("/")).replaceAll("/+", "/")
          Seq(frame(new SshOut().byte(104).uint32(id).uint32(1)
            .string(canon).string(canon).uint32(0).toArray))
        case 7 | 17 => // LSTAT | STAT → ATTRS or status
          val id = r.uint32()
          val p = resolve(r.string())
          if (Files.exists(p))
            Seq(frame(new SshOut().byte(105).uint32(id).raw(attrsFor(p)).toArray))
          else Seq(status(id, 2, "no such file"))
        case 8 => // FSTAT
          val id = r.uint32()
          val h = new String(r.bytes(), "UTF-8")
          Option(handles.get(h)) match {
            case Some(ch) => Seq(frame(new SshOut().byte(105).uint32(id)
              .uint32(0x1L).uint64(ch.size()).toArray))
            case None => Seq(status(id, 4, "bad handle"))
          }
        case 3 => // OPEN
          val id = r.uint32()
          val p = resolve(r.string())
          val pflags = r.uint32()
          try {
            val opts = scala.collection.mutable.Set[StandardOpenOption]()
            if ((pflags & 1) != 0) opts += StandardOpenOption.READ
            if ((pflags & 2) != 0) opts += StandardOpenOption.WRITE
            if ((pflags & 8) != 0) opts += StandardOpenOption.CREATE
            if ((pflags & 16) != 0) opts += StandardOpenOption.TRUNCATE_EXISTING
            if ((pflags & 32) != 0) opts += StandardOpenOption.CREATE_NEW
            val ch = java.nio.channels.FileChannel.open(p, opts.toSeq: _*)
            val h = s"h${nextHandle}"; nextHandle += 1
            handles.put(h, ch)
            Seq(frame(new SshOut().byte(102).uint32(id)
              .bytes(h.getBytes("UTF-8")).toArray))
          } catch {
            case _: java.nio.file.NoSuchFileException =>
              Seq(status(id, 2, "no such file"))
            case e: Exception => Seq(status(id, 4, s"open failed: ${e.getMessage}"))
          }
        case 6 => // WRITE
          val id = r.uint32()
          val h = new String(r.bytes(), "UTF-8")
          val off = r.uint64()
          val data = r.bytes()
          Option(handles.get(h)) match {
            case Some(ch) =>
              ch.write(java.nio.ByteBuffer.wrap(data), off)
              Seq(status(id, 0, "ok"))
            case None => Seq(status(id, 4, "bad handle"))
          }
        case 5 => // READ
          val id = r.uint32()
          val h = new String(r.bytes(), "UTF-8")
          val off = r.uint64()
          val len = r.uint32().toInt
          Option(handles.get(h)) match {
            case Some(ch) =>
              val bb = java.nio.ByteBuffer.allocate(len)
              val n = ch.read(bb, off)
              if (n <= 0) Seq(status(id, 1, "eof"))
              else Seq(frame(new SshOut().byte(103).uint32(id)
                .bytes(java.util.Arrays.copyOf(bb.array(), n)).toArray))
            case None => Seq(status(id, 4, "bad handle"))
          }
        case 4 => // CLOSE
          val id = r.uint32()
          val h = new String(r.bytes(), "UTF-8")
          Option(handles.remove(h)).foreach(_.close())
          dirHandles.remove(h)
          Seq(status(id, 0, "ok"))
        case 14 => // MKDIR
          val id = r.uint32()
          val p = resolve(r.string())
          if (Files.exists(p)) Seq(status(id, 4, "exists"))
          else { Files.createDirectories(p); Seq(status(id, 0, "ok")) }
        case 13 => // REMOVE
          val id = r.uint32()
          val p = resolve(r.string())
          if (Files.deleteIfExists(p)) Seq(status(id, 0, "ok"))
          else Seq(status(id, 2, "no such file"))
        case 15 => // RMDIR
          val id = r.uint32()
          val p = resolve(r.string())
          if (Files.isDirectory(p) && Files.deleteIfExists(p)) Seq(status(id, 0, "ok"))
          else Seq(status(id, 2, "no such dir"))
        case 18 => // RENAME
          val id = r.uint32()
          val from = resolve(r.string())
          val to = resolve(r.string())
          try { Files.move(from, to); Seq(status(id, 0, "ok")) }
          catch { case e: Exception => Seq(status(id, 4, e.getMessage)) }
        case 11 => // OPENDIR
          val id = r.uint32()
          val p = resolve(r.string())
          if (!Files.isDirectory(p)) Seq(status(id, 2, "no such dir"))
          else {
            val h = s"h${nextHandle}"; nextHandle += 1
            val it = Files.list(p).iterator()
            dirHandles.put(h, it)
            Seq(frame(new SshOut().byte(102).uint32(id)
              .bytes(h.getBytes("UTF-8")).toArray))
          }
        case 12 => // READDIR
          val id = r.uint32()
          val h = new String(r.bytes(), "UTF-8")
          Option(dirHandles.get(h)) match {
            case Some(it) if it.hasNext =>
              val entries = scala.collection.mutable.ArrayBuffer.empty[Path]
              while (it.hasNext && entries.size < 64) entries += it.next()
              val o = new SshOut().byte(104).uint32(id).uint32(entries.size.toLong)
              entries.foreach { e =>
                o.string(e.getFileName.toString)
                  .string(e.getFileName.toString)
                  .raw(attrsFor(e))
              }
              Seq(frame(o.toArray))
            case Some(_) => Seq(status(id, 1, "eof"))
            case None => Seq(status(id, 4, "bad handle"))
          }
        case other =>
          val id = r.uint32()
          Seq(status(id, 8, s"op $other unsupported")) // OP_UNSUPPORTED
      }
    }
  }
}

package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

/** Password-protected zip in the WinZip AES-2 (AE-2) format — the
  * format the reference produces via yeka/zip's `AES256Encryption`
  * (internal/ext/archive/file_archiver.go:195-205).
  *
  * Per entry (WinZip AES spec, implemented with JDK crypto only):
  *  - raw-deflate the data (the stored "actual method" is 8);
  *  - derive 32-byte AES key + 32-byte HMAC key + 2-byte password
  *    verifier with PBKDF2-HMAC-SHA1, 1000 iterations, 16-byte salt;
  *  - encrypt with AES-256 in CTR mode with a LITTLE-ENDIAN counter
  *    starting at 1 (WinZip's nonstandard CTR — hence manual ECB+XOR
  *    rather than JCE's big-endian "AES/CTR");
  *  - append the first 10 bytes of HMAC-SHA1 over the ciphertext;
  *  - zip entry: method 99, flag bit 0, CRC 0 (AE-2 omits the CRC),
  *    extra field 0x9901 {vendor AE, version 2, strength 3, method 8}.
  *
  * A matching reader is provided for verification (and decrypt-side
  * parity tests): it checks the password verifier and the HMAC before
  * inflating.
  */
object AesZip {

  private val SaltLen = 16 // AES-256 strength 3
  private val Iterations = 1000
  private val AuthLen = 10

  private def deriveKeys(password: String, salt: Array[Byte]): (Array[Byte], Array[Byte], Array[Byte]) = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, Iterations, (32 + 32 + 2) * 8)
    val skf = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA1")
    val km = skf.generateSecret(spec).getEncoded
    (km.slice(0, 32), km.slice(32, 64), km.slice(64, 66))
  }

  /** AES-CTR with little-endian counter starting at 1 (in place). */
  private def ctrCrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val cipher = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    val out = new Array[Byte](data.length)
    val counter = new Array[Byte](16)
    var block = 0L
    var i = 0
    while (i < data.length) {
      block += 1
      var b = block
      var j = 0
      while (j < 8) { counter(j) = (b & 0xff).toByte; b >>>= 8; j += 1 }
      val ks = cipher.doFinal(counter)
      val n = math.min(16, data.length - i)
      var k = 0
      while (k < n) { out(i + k) = (data(i + k) ^ ks(k)).toByte; k += 1 }
      i += n
    }
    out
  }

  private def hmacSha1(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA1"))
    mac.doFinal(data)
  }

  private def rawDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  private def rawInflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished())
      off += inf.inflate(out, off, expected - off)
    inf.end()
    out
  }

  private val AesExtra: Array[Byte] = {
    val b = ByteBuffer.allocate(11).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0x9901.toShort) // header id
    b.putShort(7) // data size
    b.putShort(2) // AE-2
    b.put('A'.toByte).put('E'.toByte)
    b.put(3.toByte) // strength: AES-256
    b.putShort(8) // actual method: deflate
    b.array()
  }

  /** Write entries into an AE-2 encrypted zip at `dest`. */
  def write(
      dest: String,
      entries: Seq[(String, Array[Byte])],
      password: String,
      random: java.security.SecureRandom = new java.security.SecureRandom): Unit = {
    require(password.nonEmpty, "password required for AES zip")
    val out = new java.io.ByteArrayOutputStream()
    val central = new java.io.ByteArrayOutputStream()
    var count = 0
    entries.foreach { case (name, data) =>
      val offset = out.size()
      val salt = new Array[Byte](SaltLen)
      random.nextBytes(salt)
      val (encKey, macKey, verifier) = deriveKeys(password, salt)
      val enc = ctrCrypt(encKey, rawDeflate(data))
      val auth = hmacSha1(macKey, enc).take(AuthLen)
      val payloadLen = SaltLen + 2 + enc.length + AuthLen
      val nameBytes = name.getBytes("UTF-8")
      // bit 0 = encrypted; bit 11 = UTF-8 name (EFS), set when needed
      val flags: Short =
        if (name.exists(_ > 127)) 0x0801.toShort else 0x0001.toShort

      def headerFields(b: ByteBuffer): Unit = {
        b.putShort(51) // version needed: 5.1
        b.putShort(flags)
        b.putShort(99) // method: AES
        b.putInt(0) // dos time+date
        b.putInt(0) // crc (AE-2: zero)
        b.putInt(payloadLen)
        b.putInt(data.length)
        b.putShort(nameBytes.length.toShort)
        b.putShort(AesExtra.length.toShort)
      }

      val lh = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
      lh.putInt(0x04034b50)
      headerFields(lh)
      out.write(lh.array()); out.write(nameBytes); out.write(AesExtra)
      out.write(salt); out.write(verifier); out.write(enc); out.write(auth)

      val ch = ByteBuffer.allocate(46).order(ByteOrder.LITTLE_ENDIAN)
      ch.putInt(0x02014b50)
      ch.putShort(51) // version made by
      headerFields(ch)
      ch.putShort(0) // comment len
      ch.putShort(0) // disk
      ch.putShort(0) // internal attrs
      ch.putInt(0) // external attrs
      ch.putInt(offset)
      central.write(ch.array()); central.write(nameBytes); central.write(AesExtra)
      count += 1
    }
    val cdOffset = out.size()
    out.write(central.toByteArray)
    val eocd = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    eocd.putInt(0x06054b50)
    eocd.putShort(0).putShort(0)
    eocd.putShort(count.toShort).putShort(count.toShort)
    eocd.putInt(central.size()).putInt(cdOffset)
    eocd.putShort(0)
    out.write(eocd.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(dest), out.toByteArray)
  }

  /** Decrypt every entry (verifier + HMAC checked). */
  def readAll(zip: Array[Byte], password: String): Map[String, Array[Byte]] = {
    val buf = ByteBuffer.wrap(zip).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
    while (buf.remaining() >= 4 && buf.getInt(buf.position()) == 0x04034b50) {
      buf.getInt // sig
      buf.getShort; buf.getShort // version, flags
      val method = buf.getShort
      buf.getInt; buf.getInt // time, crc
      val compLen = buf.getInt
      val uncompLen = buf.getInt
      val nameLen = buf.getShort & 0xffff
      val extraLen = buf.getShort & 0xffff
      val nameBytes = new Array[Byte](nameLen); buf.get(nameBytes)
      buf.position(buf.position() + extraLen)
      require(method == 99, s"not an AES entry: method $method")
      val salt = new Array[Byte](SaltLen); buf.get(salt)
      val verifier = new Array[Byte](2); buf.get(verifier)
      val enc = new Array[Byte](compLen - SaltLen - 2 - AuthLen); buf.get(enc)
      val auth = new Array[Byte](AuthLen); buf.get(auth)
      val (encKey, macKey, expectVerifier) = deriveKeys(password, salt)
      require(java.util.Arrays.equals(verifier, expectVerifier), "wrong password")
      require(java.util.Arrays.equals(auth, hmacSha1(macKey, enc).take(AuthLen)),
        "authentication failed (corrupt data)")
      out += new String(nameBytes, "UTF-8") -> rawInflate(ctrCrypt(encKey, enc), uncompLen)
    }
    out.toMap
  }
}

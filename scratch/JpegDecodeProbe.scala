package scratch

/** Round-20 micro-attribution for the MJPEG/image decode kernel
  * (r19 verdict item 4): where does a frame-hash actually spend its
  * time — (a) the per-call `ImageIO.read` plugin scan + stream setup,
  * (b) the JPEG entropy/IDCT decode itself, or (c) the per-pixel
  * `getRGB` ColorModel path the dHash cell pass drives 4k times per
  * 72x56 frame? And are the candidate fast paths BIT-EXACT —
  * (a') a reused per-thread JPEG ImageReader, (c') direct
  * DataBufferByte raster access?
  *
  * No Spark needed: the probe builds the same uniform-gray-block frame
  * the MJPEG fixture encodes (72x56, one 8x8 JPEG block per dHash
  * cell), encodes it once with the stock writer at quality 0.95, then
  * times N decodes/pixel-walks per variant and cross-checks every
  * pixel of the fast paths against the reference `getRGB` values.
  *
  * Run: sbt 'runMain scratch.JpegDecodeProbe'
  */
object JpegDecodeProbe {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = 72; val h = 56
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 7) {
      var cx = 0
      while (cx < 9) {
        val v = 40 * ((cx * 31 + cy * 17) % 5) + 20 * ((cx + cy) % 2) + 20
        val rgb = (v << 16) | (v << 8) | v
        var y = cy * 8
        while (y < cy * 8 + 8) {
          var x = cx * 8
          while (x < cx * 8 + 8) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try { writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    val jpeg = bos.toByteArray
    println(s"jpeg bytes: ${jpeg.length}")

    val n = args.headOption.map(_.toInt).getOrElse(20000)
    def time(label: String)(body: => Unit): Double = {
      var i = 0; while (i < math.min(2000, n)) { body; i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0; while (i < n) { body; i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"$label%-34s $us%10.2f us/op")
      us
    }

    // (a) stock ImageIO.read per frame
    var sink = 0L
    time("ImageIO.read") {
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      sink += im.getWidth
    }
    // (a') reused JPEG reader
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("jpeg").next()
    time("reused ImageReader") {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(jpeg))
      reader.setInput(iis)
      val im = reader.read(0)
      iis.close()
      sink += im.getWidth
    }
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    println(s"decoded type: ${decoded.getType} (3BYTE_BGR=" +
      s"${java.awt.image.BufferedImage.TYPE_3BYTE_BGR})")

    // (c) per-pixel getRGB full-frame walk
    time("getRGB walk (72x56)") {
      var s = 0L; var y = 0
      while (y < h) { var x = 0
        while (x < w) {
          val rgb = decoded.getRGB(x, y)
          s += ((rgb >> 16) & 0xFF) * 299L +
            ((rgb >> 8) & 0xFF) * 587L + (rgb & 0xFF) * 114L
          x += 1 }
        y += 1 }
      sink += s
    }
    // (c') direct raster access
    val raster = decoded.getRaster
    val sm = raster.getSampleModel
      .asInstanceOf[java.awt.image.ComponentSampleModel]
    val data = raster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    val scan = sm.getScanlineStride; val pix = sm.getPixelStride
    val offs = sm.getBandOffsets // for 3BYTE_BGR: (2,1,0) = R at +2
    println(s"scanlineStride=$scan pixelStride=$pix bandOffsets=${offs.toList}")
    time("raster walk (72x56)") {
      var s = 0L; var y = 0
      while (y < h) { var x = 0
        val row = y * scan
        while (x < w) {
          val i = row + x * pix
          s += (data(i + offs(0)) & 0xFF) * 299L +
            (data(i + offs(1)) & 0xFF) * 587L +
            (data(i + offs(2)) & 0xFF) * 114L
          x += 1 }
        y += 1 }
      sink += s
    }

    // Bit-exactness: every pixel, reused-reader image vs ImageIO.read
    // image vs raster access of each.
    val iis2 = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(jpeg))
    reader.setInput(iis2)
    val reDecoded = reader.read(0)
    iis2.close()
    var bad = 0
    var y = 0
    while (y < h) { var x = 0
      while (x < w) {
        val ref = decoded.getRGB(x, y)
        val i = y * scan + x * pix
        val fast = 0xFF000000 | ((data(i + offs(0)) & 0xFF) << 16) |
          ((data(i + offs(1)) & 0xFF) << 8) | (data(i + offs(2)) & 0xFF)
        if (ref != fast) bad += 1
        if (ref != reDecoded.getRGB(x, y)) bad += 1
        x += 1 }
      y += 1 }
    println(s"pixel mismatches (raster-vs-getRGB + reusedReader-vs-read): $bad")
    println(s"sink=$sink")
  }
}

/** Encode-side twin: attribute the MJPEG FIXTURE GENERATOR's cost —
  * per-frame writer construction vs a reused writer, and per-pixel
  * setRGB fill vs direct DataBufferInt fill — with byte/pixel equality
  * checks. Run: sbt 'runMain scratch.JpegEncodeProbe'
  */
object JpegEncodeProbe {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = 72; val h = 56
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    def time(label: String)(body: => Unit): Double = {
      var i = 0; while (i < math.min(500, n)) { body; i += 1 }
      val t0 = System.nanoTime()
      i = 0; while (i < n) { body; i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"$label%-34s $us%10.2f us/op")
      us
    }
    def fillSetRGB(img: java.awt.image.BufferedImage): Unit = {
      var cy = 0
      while (cy < 7) { var cx = 0
        while (cx < 9) {
          val v = 40 * ((cx * 31 + cy * 17) % 5) + 20 * ((cx + cy) % 2) + 20
          val rgb = (v << 16) | (v << 8) | v
          var y = cy * 8
          while (y < cy * 8 + 8) { var x = cx * 8
            while (x < cx * 8 + 8) { img.setRGB(x, y, rgb); x += 1 }
            y += 1 }
          cx += 1 }
        cy += 1 }
    }
    var sink = 0L
    time("new image + setRGB fill") {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      fillSetRGB(img); sink += img.getRGB(0, 0)
    }
    time("new image + raster int fill") {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var cy = 0
      while (cy < 7) { var cx = 0
        while (cx < 9) {
          val v = 40 * ((cx * 31 + cy * 17) % 5) + 20 * ((cx + cy) % 2) + 20
          val rgb = (v << 16) | (v << 8) | v
          var y = cy * 8
          while (y < cy * 8 + 8) { var x = cx * 8
            while (x < cx * 8 + 8) { data(y * w + x) = rgb; x += 1 }
            y += 1 }
          cx += 1 }
        cy += 1 }
      sink += img.getRGB(0, 0)
    }
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    fillSetRGB(img)
    def encodeFresh(): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try { writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { ios.close(); writer.dispose() }
      bos.toByteArray
    }
    val reusedWriter = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val reusedParam = reusedWriter.getDefaultWriteParam
    reusedParam.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    reusedParam.setCompressionQuality(0.95f)
    def encodeReused(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try { reusedWriter.setOutput(ios)
        reusedWriter.write(null, new javax.imageio.IIOImage(img, null, null),
          reusedParam)
      } finally { ios.close() }
      bos.toByteArray
    }
    time("encodeJpeg (fresh writer)") { sink += encodeFresh().length }
    time("encodeJpeg (reused writer)") { sink += encodeReused().length }
    val a = encodeFresh(); val b = encodeReused(); val c = encodeReused()
    println(s"byte-identical fresh-vs-reused: ${java.util.Arrays.equals(a, b)}" +
      s", reused-vs-reused: ${java.util.Arrays.equals(b, c)}")
    println(s"sink=$sink")
  }
}

/** PNG twin: ImageIO.write plugin-scan path vs a reused PNG writer,
  * with byte-identity checks, at the tiny sizes syntheticImageGroups
  * encodes (12-31 x 10-24). Run: sbt 'runMain scratch.PngEncodeProbe'
  */
object PngEncodeProbe {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val w = 20; val h = 16
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0
      while (x < w) { img.setRGB(x, y, (x * 7919 + y * 104729) & 0xFFFFFF)
        x += 1 }
      y += 1 }
    def time(label: String)(body: => Unit): Double = {
      var i = 0; while (i < math.min(1000, n)) { body; i += 1 }
      val t0 = System.nanoTime()
      i = 0; while (i < n) { body; i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"$label%-34s $us%10.2f us/op")
      us
    }
    var sink = 0L
    def writeStock(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("png").next()
    def writeReused(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try { writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), null)
      } finally { ios.close() }
      bos.toByteArray
    }
    time("ImageIO.write png")   { sink += writeStock().length }
    time("reused PNG writer")   { sink += writeReused().length }
    val a = writeStock(); val b = writeReused(); val c = writeReused()
    println(s"byte-identical stock-vs-reused: ${java.util.Arrays.equals(a, b)}" +
      s", reused-vs-reused: ${java.util.Arrays.equals(b, c)}")
    println(s"sink=$sink")
  }
}

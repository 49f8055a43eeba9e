"""JVM javax.imageio bridge (py4j) — the single home for the
BufferedImage round-trip boilerplate shared by the q192 foreign-stream
corpus and the cross-validation test suites (it existed in three
copies before; a fix like the write-return check or writer disposal
had to land in all of them).

Driver-side only: py4j can reach the JVM exclusively from the driver,
so anything built here ships to executors as plain bytes. Arrays enter
the JVM as ONE PNG payload (our encoder's exactness through ImageIO is
pinned by tests/test_imageio_crossval.py) — a per-pixel setRGB fill
costs one py4j round trip per pixel.
"""

from __future__ import annotations

import numpy as np


def jvm_read_image(jvm, blob: bytes):
    """bytes → BufferedImage | None (unreadable)."""
    return jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )


def jvm_image_from_array(jvm, arr: np.ndarray):
    """(h, w[, ch]) uint8/uint16 → BufferedImage carrying exactly
    ``arr``, shipped as one PNG payload."""
    from anime_data_pipeline_spark.operators.png_codec import encode_png

    img = jvm_read_image(jvm, encode_png(arr))
    if img is None:
        raise RuntimeError("JVM ImageIO could not read the bridge PNG")
    return img


def jvm_write_image(
    jvm,
    img,
    fmt: str,
    *,
    compression: str | None = None,
    progressive: bool = False,
) -> bytes:
    """BufferedImage → encoded bytes via the JVM's own ``fmt`` writer.
    Raises when no writer exists or produces nothing (a silent empty
    blob decodes to null rows far from the cause); disposes the writer
    and closes the stream — per-image writers otherwise accumulate
    MemoryCacheImageOutputStream caches on the driver JVM."""
    baos = jvm.java.io.ByteArrayOutputStream()
    if compression is None and not progressive:
        ok = jvm.javax.imageio.ImageIO.write(img, fmt, baos)
        if not ok:
            raise RuntimeError(f"JVM ImageIO has no writer for {fmt!r}")
    else:
        writers = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(fmt)
        if not writers.hasNext():
            raise RuntimeError(f"JVM ImageIO has no writer for {fmt!r}")
        writer = writers.next()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        try:
            writer.setOutput(ios)
            param = writer.getDefaultWriteParam()
            if compression is not None:
                param.setCompressionMode(2)  # MODE_EXPLICIT
                param.setCompressionType(compression)
            if progressive:
                param.setProgressiveMode(1)  # MODE_DEFAULT
                param.setCompressionMode(2)
                param.setCompressionQuality(0.9)
            writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
            ios.flush()
        finally:
            writer.dispose()
            ios.close()
    out = bytes(baos.toByteArray())
    if not out:
        raise RuntimeError(f"JVM ImageIO {fmt!r} writer produced no bytes")
    return out

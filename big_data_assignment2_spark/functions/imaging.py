"""Dependency-free BMP image codec for the multimodal operators.

The container ships no image libraries (PIL/opencv), but BMP (Windows
bitmap, the public BITMAPINFOHEADER layout) is simple enough to en/decode
with ``struct`` + numpy: 14-byte file header, 40-byte info header,
24-bit uncompressed pixels stored bottom-up in BGR order with each row
padded to a 4-byte boundary. That makes the decode step of the
multimodal pipeline REAL -- actual bytes parsed into actual pixels --
instead of the md5 stand-in earlier rounds used (the former guarded stub
at operators/multimodal.py, reference parity note: the reference repo has
no image path at all; this is pipeline-completeness beyond it).

Everything lives in nested functions returned by :func:`bmp_codec` so a
``mapInPandas`` closure that captures them is shipped BY VALUE by
cloudpickle -- executor Python workers never need this package on their
own ``sys.path`` (see tests/test_cli.py note and the verify-skill gotcha
on worker-shipped callables).
"""

from __future__ import annotations


def bmp_codec():
    """Return ``(encode_bmp, decode_bmp)``.

    - ``encode_bmp(arr)``: uint8 numpy array of shape (H, W, 3) in RGB
      row-major top-down order -> BMP file bytes (24-bit, bottom-up, BGR,
      4-byte row padding).
    - ``decode_bmp(data)``: BMP file bytes -> uint8 array (H, W, 3) RGB
      top-down. Validates magic, header size, bpp and compression, and
      raises ``ValueError`` on anything it does not support -- a corrupt
      or exotic payload must fail loudly, not decode to garbage.
    """
    import struct

    import numpy as np

    def encode_bmp(arr) -> bytes:
        arr = np.asarray(arr, dtype=np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3) RGB array, got {arr.shape}")
        h, w, _ = arr.shape
        row_bytes = w * 3
        pad = (-row_bytes) % 4
        img_size = (row_bytes + pad) * h
        # pixel rows: bottom-up, BGR, padded
        rows = []
        bgr = arr[:, :, ::-1]  # RGB -> BGR
        zeros = b"\x00" * pad
        for y in range(h - 1, -1, -1):
            rows.append(bgr[y].tobytes() + zeros)
        pixel_data = b"".join(rows)
        file_size = 14 + 40 + img_size
        file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
        info_header = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
        )
        return file_header + info_header + pixel_data

    def decode_bmp(data: bytes):
        data = bytes(data)
        if len(data) < 54 or data[:2] != b"BM":
            raise ValueError("not a BMP file")
        _, _, _, _, offset = struct.unpack("<2sIHHI", data[:14])
        (
            hdr_size,
            w,
            h,
            planes,
            bpp,
            compression,
            _img_size,
            _ppx,
            _ppy,
            _ncol,
            _nimp,
        ) = struct.unpack("<IiiHHIIiiII", data[14:54])
        if hdr_size < 40:
            raise ValueError(f"unsupported header size {hdr_size}")
        if bpp != 24 or compression != 0:
            raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
        if planes != 1 or w <= 0 or h == 0:
            raise ValueError("malformed BMP dimensions")
        bottom_up = h > 0
        h = abs(h)
        row_bytes = w * 3
        stride = row_bytes + ((-row_bytes) % 4)
        need = offset + stride * h
        if len(data) < need:
            raise ValueError(f"truncated BMP: {len(data)} < {need} bytes")
        raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
        rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB

    return encode_bmp, decode_bmp

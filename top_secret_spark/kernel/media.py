"""Image/video kernel: opaque-binary multimodal columns (pure numpy).

The engine treats images and video as opaque ``binary`` columns with
typed metadata (width/height/n_frames/fps/codec), mirroring how the
audio path treats clips (kernel/audio.py).  The synthetic ``raw_rgb8``
codec — packed uint8 RGB, row-major — is implemented for real, so the
whole Spark-side pipeline (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is exercised end-to-end with deterministic
bytes.  Real-world codecs (jpeg/png/h264/vp9) are STUBBED: the
image/audio/video decoding libraries are not installed in this
environment, so ``decode_image``/``decode_video`` raise
NotImplementedError with a clear message for those codec tags.  The
plumbing around the stub is the deliverable; swapping in a real decoder
is a one-function change.

No Spark imports here — unit-testable without a JVM.
"""

from __future__ import annotations

import numpy as np

RAW_IMAGE_CODEC = "raw_rgb8"
RAW_VIDEO_CODEC = "raw_rgb8_frames"
#: Real CONTAINER codec: uncompressed 24-bit BI_RGB Windows bitmap —
#: the format is fully public (14-byte BITMAPFILEHEADER + 40-byte
#: BITMAPINFOHEADER, BGR rows padded to 4 bytes, bottom-up unless
#: height is negative) and needs no external library, so unlike
#: jpeg/h264 it decodes for REAL here, vectorized.
BMP_IMAGE_CODEC = "bmp"
STUB_IMAGE_CODECS = ("jpeg", "png", "webp")
STUB_VIDEO_CODECS = ("h264", "vp9", "av1")


def _stub_error(codec: str) -> NotImplementedError:
    return NotImplementedError(
        f"codec {codec!r} requires an external decoder library that is not "
        "installed in this environment; only the deterministic "
        f"'{RAW_IMAGE_CODEC}'/'{RAW_VIDEO_CODEC}' codecs decode here. "
        "Plug a real decoder into kernel/media.py decode_image/decode_video."
    )


# --- images --------------------------------------------------------------------


def synth_image(seed: int, width: int, height: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image — pure function of the seed."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:height, 0:width]
    base = (x * 7 + y * 13 + int(rng.integers(0, 251))) % 256
    img = np.stack([base, (base * 3) % 256, (base * 5 + 17) % 256], axis=-1)
    noise = rng.integers(0, 32, size=img.shape)
    return ((img + noise) % 256).astype(np.uint8)


def encode_image(img: np.ndarray, codec: str = RAW_IMAGE_CODEC) -> bytes:
    if codec == RAW_IMAGE_CODEC:
        return np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    if codec == BMP_IMAGE_CODEC:
        return encode_bmp(img)
    raise _stub_error(codec)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB .bmp bytes (bottom-up rows,
    BGR byte order, rows padded to 4-byte multiples — the classic
    Windows bitmap layout)."""
    import struct

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # RGB → BGR, top-down → bottom-up, pad each row
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    off = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return file_header + dib + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB .bmp bytes → (h, w, 3) uint8 RGB, fully vectorized.

    Supports bottom-up (positive biHeight) and top-down (negative)
    rows; anything but 24 bpp / BI_RGB / 1 plane raises ValueError —
    a wrong container is a data error, not a decoder gap."""
    import struct

    if data is None:
        raise ValueError("NULL image payload: nothing to decode")
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    (
        dib_size, w, h_signed, planes, bpp, compression
    ) = struct.unpack_from("<IiiHHI", data, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB decodes"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h_signed}")
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} bytes < {need}")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def decode_image(data: bytes, codec: str, width: int, height: int) -> np.ndarray:
    """binary + metadata → (h, w, 3) uint8.  Stub for non-raw codecs."""
    if data is None:
        # precise loud failure (the operator contract) instead of the
        # incidental TypeError np.frombuffer raises on None
        raise ValueError("NULL image payload: nothing to decode")
    if codec == RAW_IMAGE_CODEC:
        arr = np.frombuffer(data, dtype=np.uint8)
        if arr.size != width * height * 3:
            raise ValueError(
                f"raw_rgb8 byte count {arr.size} != width*height*3 "
                f"({width}x{height})"
            )
        return arr.reshape(height, width, 3)
    if codec == BMP_IMAGE_CODEC:
        img = decode_bmp(data)
        if img.shape[:2] != (height, width):
            raise ValueError(
                f"BMP container says {img.shape[1]}x{img.shape[0]}, "
                f"metadata says {width}x{height} — the container is "
                "authoritative; fix the metadata row"
            )
        return img
    raise _stub_error(codec)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize, fully vectorized (no interpolation libs)."""
    h0, w0 = img.shape[:2]
    ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
    xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> dict:
    f = img.astype(np.float64)
    return {
        "width": int(img.shape[1]),
        "height": int(img.shape[0]),
        "mean_r": float(f[..., 0].mean()),
        "mean_g": float(f[..., 1].mean()),
        "mean_b": float(f[..., 2].mean()),
        "brightness": float(f.mean()),
        "contrast": float(f.std()),
    }


# --- video ---------------------------------------------------------------------


def synth_video(seed: int, width: int, height: int, n_frames: int) -> np.ndarray:
    """Deterministic (n, h, w, 3) uint8 frame stack."""
    frames = [
        # per-frame brightness drift makes frame order observable
        ((synth_image(seed, width, height).astype(np.int32) + 11 * i) % 256)
        for i in range(n_frames)
    ]
    return np.stack(frames).astype(np.uint8)


def encode_video(frames: np.ndarray, codec: str = RAW_VIDEO_CODEC) -> bytes:
    if codec == RAW_VIDEO_CODEC:
        return np.ascontiguousarray(frames, dtype=np.uint8).tobytes()
    raise _stub_error(codec)


def decode_video(
    data: bytes, codec: str, width: int, height: int, n_frames: int
) -> np.ndarray:
    if data is None:
        raise ValueError("NULL video payload: nothing to decode")
    if codec == RAW_VIDEO_CODEC:
        arr = np.frombuffer(data, dtype=np.uint8)
        if arr.size != n_frames * width * height * 3:
            raise ValueError("raw_rgb8_frames byte count does not match metadata")
        return arr.reshape(n_frames, height, width, 3)
    raise _stub_error(codec)


def sample_frames(frames: np.ndarray, every_k: int) -> np.ndarray:
    """Every k-th frame starting at 0 — ceil(n/k) frames out."""
    return frames[::every_k]


def batch_frame_stats(stack: np.ndarray) -> dict:
    """Per-row channel means / brightness / contrast for a stacked batch
    of same-shaped media: (n, h, w, 3) images or (n, f, h, w, 3) frame
    stacks → dict of length-n float64 arrays.  One vectorized reduction
    over the whole stack — for small images the per-row interpreter
    loop, not the decode, dominates; stacking removes it."""
    f = stack.astype(np.float64)
    spatial = tuple(range(1, f.ndim - 1))
    with_channel = tuple(range(1, f.ndim))
    return {
        "mean_r": f[..., 0].mean(axis=spatial),
        "mean_g": f[..., 1].mean(axis=spatial),
        "mean_b": f[..., 2].mean(axis=spatial),
        "brightness": f.mean(axis=with_channel),
        "contrast": f.std(axis=with_channel),
    }

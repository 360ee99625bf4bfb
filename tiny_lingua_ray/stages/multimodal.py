"""Multimodal columns: image/audio as opaque binary + typed metadata.

Design (per the engine's charter): media payloads ride through the
pipeline as ``binary`` columns with metadata columns; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages with small batch sizes (payloads are KB-MB scale).

Codec status: COMPRESSED image (JPEG/PNG via PIL) and audio (via
soundfile) decoders are NOT available in this container, BUT two real
uncompressed formats decode with zero external dependencies and are
first-class here: 24-bit BI_RGB **BMP** (pure-numpy header parse +
row-padding strip) and PCM **WAV** (stdlib ``wave``).  The stages
additionally accept the deterministic RAW container produced by
``sources.media`` (magic header + dtype+shape + raw bytes).  Everything
after decode — resize (block mean), dHash, channel stats, frame
sampling, RMS energy — is real vectorized numpy and is tested.  Feeding
a JPEG without PIL raises NotImplementedError (clearly marked), never
silent garbage.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

RAW_IMG_MAGIC = b"TLRIMG1\x00"
RAW_AUD_MAGIC = b"TLRAUD1\x00"

try:  # real decoders if ever available
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def encode_raw_image(arr: np.ndarray) -> bytes:
    """uint8 [H, W, 3] -> RAW container bytes."""
    h, w, c = arr.shape
    return RAW_IMG_MAGIC + struct.pack("<III", h, w, c) + arr.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 [H, W, 3] RGB -> real 24-bit BI_RGB BMP bytes (bottom-up
    rows, BGR order, 4-byte row padding) — a genuine interchange format
    written without any imaging library."""
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    # vectorized: one padded [h, stride] buffer, rows flipped bottom-up
    # and channels RGB->BGR by strided assignment (ADVICE r4: the
    # per-row append loop)
    stride = row + pad
    buf = np.zeros((h, stride), dtype=np.uint8)
    buf[:, :row] = arr[::-1, :, ::-1].reshape(h, row)
    body = buf.tobytes()
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    return (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
        + body
    )


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Real 24-bit uncompressed BMP -> uint8 [H, W, 3] RGB, pure numpy."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decodes here (got bpp={bpp}, "
            f"compression={comp}); JPEG/PNG need PIL (absent)"
        )
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    data = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)[:, :row].reshape(h, w, 3)
    if bottom_up:
        data = data[::-1]
    return data[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(payload: bytes) -> np.ndarray:
    if payload.startswith(RAW_IMG_MAGIC):
        h, w, c = struct.unpack("<III", payload[8:20])
        return np.frombuffer(payload[20:], dtype=np.uint8).reshape(h, w, c)
    if payload.startswith(b"BM"):
        return _decode_bmp(payload)
    if _HAS_PIL:
        import io

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    raise NotImplementedError(
        "compressed image codecs (PIL) unavailable in this environment; "
        "24-bit BMP and the RAW container "
        "(sources.media.encode_raw_image) are decodable"
    )


def encode_raw_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """float32 [N] -> RAW container bytes."""
    return (
        RAW_AUD_MAGIC
        + struct.pack("<II", sample_rate, len(samples))
        + samples.astype(np.float32).tobytes()
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float [-1, 1] samples -> real 16-bit PCM mono WAV bytes via the
    stdlib ``wave`` module."""
    import io
    import wave

    # 32768 scale, clipped at +32767: exact inverse of the decoder's
    # /32768 for any sample already on the int16 grid
    q = np.clip(
        np.round(samples.astype(np.float64) * 32768.0), -32768, 32767
    ).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(q.tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real PCM WAV (8/16/32-bit, any channel count; channels averaged
    to mono) -> (float32 samples in [-1, 1], rate) via stdlib wave."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x.astype(np.float32), rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    if payload.startswith(RAW_AUD_MAGIC):
        rate, n = struct.unpack("<II", payload[8:16])
        return np.frombuffer(payload[16:], dtype=np.float32)[:n], rate
    if payload.startswith(b"RIFF"):
        return _decode_wav(payload)
    raise NotImplementedError(
        "compressed audio codecs unavailable; PCM WAV and the RAW "
        "container are decodable"
    )


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area resize via block means (numpy only)."""
    h, w, c = img.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    ii = img.astype(np.float64)
    for y in range(out_h):
        rows = ii[ys[y] : max(ys[y + 1], ys[y] + 1)]
        for x in range(out_w):
            out[y, x] = rows[:, xs[x] : max(xs[x + 1], xs[x] + 1)].mean(
                axis=(0, 1)
            )
    return out


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash over an 8x9 grayscale downsample."""
    small = resize_block_mean(img, 8, 9).mean(axis=2)
    bits = small[:, 1:] > small[:, :-1]
    out = 0
    for i, b in enumerate(bits.ravel()):
        if b:
            out |= 1 << i
    return out


class ImageFeatures:
    """Actor-pool stage: decode -> resize -> features.

    Appends: img_width, img_height, mean_r/g/b, dhash (uint64).
    Use small ``batch_size`` (payloads are large) and
    ``batch_format="pyarrow"`` (binary columns don't round-trip pandas).
    """

    def __init__(self, payload_column: str = "payload", thumb: int = 32):
        self.payload_column = payload_column
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        R = len(payloads)
        w = np.zeros(R, np.int32)
        h = np.zeros(R, np.int32)
        means = np.zeros((R, 3))
        hashes = np.zeros(R, np.uint64)
        for i, p in enumerate(payloads):
            img = decode_image(p)
            h[i], w[i] = img.shape[0], img.shape[1]
            means[i] = img.reshape(-1, 3).mean(axis=0)
            hashes[i] = np.uint64(dhash64(img))
        return (
            batch.drop_columns([self.payload_column])
            .append_column("img_height", pa.array(h))
            .append_column("img_width", pa.array(w))
            .append_column("mean_r", pa.array(np.round(means[:, 0], 4)))
            .append_column("mean_g", pa.array(np.round(means[:, 1], 4)))
            .append_column("mean_b", pa.array(np.round(means[:, 2], 4)))
            .append_column("dhash", pa.array(hashes))
        )


def afp64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint: sign of energy DELTA across 65 equal
    segments (Shazam-lite / Haitsma–Kalker style sub-fingerprint) —
    bit-exact under power-of-two amplitude scaling (IEEE754-exact),
    NEAR-invariant to arbitrary scaling and small noise (float rounding
    can flip near-tied segment comparisons), so perceptual near-dups
    land at small Hamming distance rather than 0."""
    if len(samples) < 65:
        return 0
    segs = np.array_split(samples.astype(np.float64), 65)
    e = np.array([float((s * s).mean()) for s in segs])
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class AudioFeatures:
    """Actor-pool stage: decode -> frame-sample -> features.

    Appends: duration_sec, rms, n_frames (frame sampling at
    ``frame_sec``), afp (64-bit energy-delta fingerprint).
    """

    def __init__(self, payload_column: str = "payload", frame_sec: float = 0.5):
        self.payload_column = payload_column
        self.frame_sec = frame_sec

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        R = len(payloads)
        dur = np.zeros(R)
        rms = np.zeros(R)
        n_frames = np.zeros(R, np.int32)
        fps = np.zeros(R, np.uint64)
        for i, p in enumerate(payloads):
            samples, rate = decode_audio(p)
            dur[i] = len(samples) / rate if rate else 0.0
            rms[i] = float(np.sqrt((samples.astype(np.float64) ** 2).mean())) if len(samples) else 0.0
            frame = max(1, int(rate * self.frame_sec))
            n_frames[i] = (len(samples) + frame - 1) // frame
            fps[i] = np.uint64(afp64(samples))
        return (
            batch.drop_columns([self.payload_column])
            .append_column("duration_sec", pa.array(np.round(dur, 4)))
            .append_column("rms", pa.array(np.round(rms, 6)))
            .append_column("n_frames", pa.array(n_frames))
            .append_column("afp", pa.array(fps))
        )


RAW_VID_MAGIC = b"TLRVID1\x00"


def encode_raw_video(frames: np.ndarray, fps: int) -> bytes:
    """uint8 [N, H, W, 3] -> RAW container bytes."""
    n, h, w, c = frames.shape
    return (
        RAW_VID_MAGIC + struct.pack("<IIIII", n, h, w, c, fps) + frames.tobytes()
    )


def decode_video(payload: bytes) -> tuple[np.ndarray, int]:
    """-> (uint8 [N, H, W, 3] frames, fps).  Same codec policy as
    image/audio: only the deterministic RAW container decodes here; real
    containers (mp4/webm) need pyav/opencv, absent in this environment."""
    if payload.startswith(RAW_VID_MAGIC):
        n, h, w, c, fps = struct.unpack("<IIIII", payload[8:28])
        return (
            np.frombuffer(payload[28:], dtype=np.uint8).reshape(n, h, w, c),
            fps,
        )
    raise NotImplementedError(
        "real video codecs (pyav/opencv) unavailable in this environment; "
        "only the RAW container (encode_raw_video) is decodable"
    )


class VideoFeatures:
    """Actor-pool stage: decode -> frame-sample -> per-clip features.

    Appends: vid_frames (total), vid_sampled (every ``sample_every``-th
    frame), fps, mean_luma (over sampled frames, ITU-R 601), mid_dhash
    (dHash of the middle sampled frame).  Small ``batch_size`` — video
    payloads dominate block memory.
    """

    def __init__(self, payload_column: str = "payload", sample_every: int = 5):
        self.payload_column = payload_column
        self.sample_every = sample_every

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        R = len(payloads)
        n_total = np.zeros(R, np.int32)
        n_sampled = np.zeros(R, np.int32)
        fps_col = np.zeros(R, np.int32)
        luma = np.zeros(R)
        mid_hash = np.zeros(R, np.uint64)
        for i, p in enumerate(payloads):
            frames, fps = decode_video(p)
            sampled = frames[:: self.sample_every]
            n_total[i], n_sampled[i], fps_col[i] = (
                len(frames), len(sampled), fps,
            )
            f = sampled.astype(np.float64)
            luma[i] = (
                0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
            ).mean()
            mid_hash[i] = np.uint64(dhash64(sampled[len(sampled) // 2]))
        return (
            batch.drop_columns([self.payload_column])
            .append_column("vid_frames", pa.array(n_total))
            .append_column("vid_sampled", pa.array(n_sampled))
            .append_column("fps", pa.array(fps_col))
            .append_column("mean_luma", pa.array(np.round(luma, 4)))
            .append_column("mid_dhash", pa.array(mid_hash))
        )

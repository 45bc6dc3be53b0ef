"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (SURVEY.md LLM-pipeline family).

The decode kernel is REAL for the formats decodable with numpy + the
stdlib — uncompressed 24-bit BMP and binary PPM (P6) — covering parse,
pixel stats, feature extraction, and nearest-neighbor resize with no
image library. Compressed formats (JPEG/PNG) need a codec this
container doesn't ship: they fall back to a clearly-marked
deterministic stub (or raise under ``strict=True``), pluggable via
``set_real_decoder``.

Pattern for heavy binary payloads (SURVEY-level scale note):
  * small ``batch_size`` (payload × batch × concurrency must fit worker
    heap) — callers pass e.g. ``batch_size=32`` for images
  * ``batch_format="pyarrow"`` end-to-end (binary columns don't
    round-trip pandas object dtype cleanly)
  * decoder state loaded once per actor in ``__init__``
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = [
    "MEDIA_SCHEMA",
    "decode_bmp",
    "decode_ppm",
    "encode_bmp",
    "encode_ppm",
    "decode_any",
    "resize_nearest",
    "ImageDecoder",
    "ImageHasher",
    "dhash64",
    "image_dhash",
    "image_neardup_pairs",
    "make_fake_media_with_neardups",
    "ImageResizer",
    "FrameSampler",
    "decode_images",
    "resize_images",
    "make_fake_media",
    "set_real_decoder",
    "decode_wav",
    "encode_wav",
    "AudioFeatureExtractor",
    "decode_audio",
    "make_fake_audio",
    "decode_y4m",
    "encode_y4m",
    "VideoFeatureExtractor",
    "decode_video",
    "make_fake_video",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),            # JSON typed metadata
    ]
)


# ---------------------------------------------------------------------------
# real pixel codecs (numpy + struct only)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 RGB; None if not one."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    flipped = height > 0          # positive height ⇒ bottom-up rows
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=data_off).reshape(h, stride)
    bgr = rows[:, : width * 3].reshape(h, width, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flipped else rgb


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP bytes."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)   # bottom-up BGR
    pixel_bytes = rows.tobytes()
    data_off = 54
    file_size = data_off + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixel_bytes), 2835, 2835, 0, 0)
    return header + dib + pixel_bytes


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Binary PPM (P6, maxval ≤ 255) → (H, W, 3) uint8 RGB."""
    if not payload.startswith(b"P6"):
        return None
    # header tokens: P6 <w> <h> <maxval>, whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i:i + 1]
        if c == b"#":                                 # comment to EOL
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval > 255 or w <= 0 or h <= 0:
        return None
    i += 1                                            # single whitespace after maxval
    need = w * h * 3
    if len(payload) - i < need:
        return None
    return np.frombuffer(payload, dtype=np.uint8, count=need, offset=i).reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_any(payload: bytes) -> np.ndarray | None:
    """Dispatch on magic bytes (format guesser chain — first match wins)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    return None


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps — pure numpy."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def _features(rgb: np.ndarray) -> np.ndarray:
    """8-dim real feature vector: channel means, gray std, quadrant
    gray means — all in [0, 1]."""
    f = rgb.astype(np.float64)
    gray = f.mean(axis=2)
    h, w = gray.shape
    hh, hw = max(1, h // 2), max(1, w // 2)
    quads = [gray[:hh, :hw], gray[:hh, hw:], gray[hh:, :hw], gray[hh:, hw:]]
    feat = np.array(
        [f[:, :, 0].mean(), f[:, :, 1].mean(), f[:, :, 2].mean(), gray.std()]
        + [(q.mean() if q.size else 0.0) for q in quads]
    )
    return feat / 255.0


def _stub_decode(payload: bytes) -> dict:
    """Deterministic stand-in for codec formats (JPEG/PNG) this
    container cannot decode: stable pseudo-dimensions + hash features."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = (np.frombuffer(h[:32], dtype=np.uint8)[:8].astype(np.float64) / 255.0)
    return {"width": int(width), "height": int(height), "features": feat,
            "decoded": False}


# ---------------------------------------------------------------------------
# actor-pool stages
# ---------------------------------------------------------------------------

class ImageDecoder:
    """Actor-pool stage: media batch → (media_id, width, height,
    features, decoded). BMP/PPM decode for real; unknown magics use the
    pluggable decoder hook, then the stub (or raise when ``strict``).

    The hook contract: ``decoder(payload: bytes) -> dict`` with keys
    ``width``/``height``/``features``/``decoded`` (and OPTIONALLY
    ``rgb``: an (H, W, 3) uint8 array, which ``ImageHasher`` needs to
    fingerprint codec images). The instance captures the decoder at
    CONSTRUCTION — a bare class attribute set on the driver would
    never reach Ray actor processes, which re-import this module
    fresh; ``decode_images``/``image_dhash`` ship the currently
    registered hook through ``fn_constructor_kwargs``."""

    real_decoder = None  # set by set_real_decoder() (e.g. PIL/libvips)

    def __init__(self, strict: bool = False, decoder=None):
        self.strict = strict
        # explicit arg wins; else whatever is registered IN THIS
        # process (covers direct driver-side use)
        self.decoder = (decoder if decoder is not None
                        else ImageDecoder.real_decoder)

    def decode(self, payload: bytes) -> dict:
        rgb = decode_any(payload or b"")
        if rgb is not None:
            return {"width": rgb.shape[1], "height": rgb.shape[0],
                    "features": _features(rgb), "decoded": True}
        if self.decoder is not None:
            return self.decoder(payload or b"")
        if self.strict:
            raise NotImplementedError(
                "payload is not BMP/PPM and no codec decoder is installed; "
                "install one and call set_real_decoder()"
            )
        return _stub_decode(payload or b"")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        outs = [self.decode(p or b"") for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array([o["width"] for o in outs], type=pa.int32()),
                "height": pa.array([o["height"] for o in outs], type=pa.int32()),
                "features": pa.array(
                    [np.asarray(o["features"]).tolist() for o in outs],
                    type=pa.list_(pa.float64()),
                ),
                "decoded": pa.array(
                    [bool(o.get("decoded", False)) for o in outs], type=pa.bool_()
                ),
            }
        )


def set_real_decoder(fn) -> None:
    """Register a codec decoder (PIL/libvips wrapper). The registration
    is DRIVER-process state; the ``decode_images`` / ``image_dhash``
    wrappers capture it at call time and ship it to the actor pool via
    constructor kwargs — actors re-import this module and would never
    see a bare class attribute."""
    ImageDecoder.real_decoder = staticmethod(fn) if fn is not None else None


class ImageResizer:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode as
    PPM (the smallest real container). Undecodable payloads pass through
    untouched with ``resized=False``."""

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        out_p, out_ok = [], []
        for p in batch["payload"].to_pylist():
            rgb = decode_any(p or b"")
            if rgb is None:
                out_p.append(p or b"")
                out_ok.append(False)
            else:
                out_p.append(encode_ppm(resize_nearest(rgb, self.out_w, self.out_h)))
                out_ok.append(True)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(out_p, type=pa.binary()),
                "mime": pa.array(
                    ["image/x-portable-pixmap" if ok else "application/octet-stream"
                     for ok in out_ok],
                    type=pa.string(),
                ),
                "resized": pa.array(out_ok, type=pa.bool_()),
            }
        )


class FrameSampler:
    """Video analog: emit every Nth "frame" record per payload (1→N
    explode with bounded fan-out; the DocumentTree unpack pattern —
    SURVEY.md §2.2)."""

    def __init__(self, every: int = 10, max_frames: int = 8):
        if every < 1:
            # the sibling VideoFeatureExtractor validates stride >= 1 at
            # construction; a 0 here would ZeroDivisionError per batch
            raise ValueError("FrameSampler: every must be >= 1")
        self.every = every
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            n = min(self.max_frames, max(1, len(p or b"") // self.every))
            for f in range(n):
                ids.append(mid)
                frames.append(f)
                offs.append(f * self.every)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frames, type=pa.int32()),
                "byte_offset": pa.array(offs, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# real audio codec (RIFF/WAVE PCM — struct + numpy only, like the BMP path)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAVE PCM (8- or 16-bit) → ((n_samples, n_channels) int16,
    sample_rate); None if the payload is not one. Walks the chunk list
    (fmt may be followed by LIST/fact before data)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt_tag, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1:          # PCM only — compressed WAV → stub
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or not rate or not n_ch or bits not in (8, 16):
        return None
    if bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    else:                              # 8-bit WAV is unsigned, center it
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16)
                   - 128) * 256
    n = (len(samples) // n_ch) * n_ch
    return samples[:n].reshape(-1, n_ch), int(rate)


def encode_wav(arr: np.ndarray, rate: int) -> bytes:
    """(n_samples, n_channels) int16 → 16-bit PCM WAV bytes."""
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    byte_rate = rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, byte_rate, n_ch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _stub_audio(payload: bytes) -> dict:
    """Deterministic stand-in for compressed audio (MP3/OGG/FLAC) this
    container cannot decode: stable pseudo-duration + hash features."""
    h = hashlib.sha256(payload).digest()
    return {"sample_rate": 8000 + (h[0] % 8) * 4000,
            "n_channels": 1 + h[1] % 2,
            "n_samples": 1000 + struct.unpack_from("<H", h, 2)[0],
            "peak": int(struct.unpack_from("<H", h, 4)[0] // 2),
            "energy": int(struct.unpack_from("<I", h, 6)[0] % (1 << 28)),
            "decoded": False}


class AudioFeatureExtractor:
    """Actor-pool stage: media batch → (media_id, sample_rate,
    n_channels, n_samples, duration_ms, peak, energy, decoded). PCM WAV
    decodes for real; other containers stub (or raise when ``strict``).
    ``peak`` = max |sample|, ``energy`` = floor of the mean squared
    sample — both integer-exact, so goldens pin them with no float
    caveats."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def features(self, payload: bytes) -> dict:
        got = decode_wav(payload or b"")
        if got is not None:
            arr, rate = got
            x = arr.astype(np.int64)
            n = int(arr.shape[0])
            return {"sample_rate": rate, "n_channels": int(arr.shape[1]),
                    "n_samples": n,
                    "peak": int(np.abs(x).max()) if n else 0,
                    "energy": int((x * x).sum() // x.size) if n else 0,
                    "decoded": True}
        if self.strict:
            raise NotImplementedError(
                "payload is not PCM WAV and no audio codec is installed")
        return _stub_audio(payload or b"")

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [self.features(p or b"")
                for p in batch["payload"].to_pylist()]
        d = {"media_id": batch["media_id"].combine_chunks().cast(pa.int64())}
        for col, typ in [("sample_rate", pa.int32()),
                         ("n_channels", pa.int32()),
                         ("n_samples", pa.int64()),
                         ("peak", pa.int64()), ("energy", pa.int64()),
                         ("decoded", pa.bool_())]:
            d[col] = pa.array([o[col] for o in outs], type=typ)
        rates = np.array([o["sample_rate"] for o in outs], dtype=np.int64)
        ns = np.array([o["n_samples"] for o in outs], dtype=np.int64)
        d["duration_ms"] = pa.array(ns * 1000 // np.maximum(rates, 1),
                                    type=pa.int64())
        return pa.table(d)


def decode_audio(media: Dataset, concurrency=2, batch_size: int = 32) -> Dataset:
    return media.map_batches(
        AudioFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def make_fake_audio(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic audio table: REAL PCM WAV payloads (sine bursts,
    integer-sampled) with every 8th row a codec-format stand-in so the
    stub path stays exercised."""
    rng = np.random.default_rng(seed)
    payloads, mimes = [], []
    for i in range(n):
        if i % 8 == 7:
            payloads.append(rng.integers(0, 256, size=int(rng.integers(200, 3000)),
                                         dtype=np.uint8).tobytes())
            mimes.append("audio/mpeg")           # undecodable here → stub
        else:
            rate = int(rng.choice([8000, 16000, 44100]))
            n_ch = int(rng.integers(1, 3))
            n_samp = int(rng.integers(100, 2000))
            t = np.arange(n_samp, dtype=np.int64)[:, None]
            freq = rng.integers(100, 2000, size=(1, n_ch))
            amp = rng.integers(1000, 20000, size=(1, n_ch))
            # integer sawtooth — no libm, bit-stable across numpy builds
            phase = (t * freq) % rate
            wave = (phase * 2 * amp // rate - amp).astype(np.int16)
            payloads.append(encode_wav(wave, rate))
            mimes.append("audio/wav")
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["audio"] * n, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "meta": pa.array(["{}"] * n, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# real video codec (YUV4MPEG2 / .y4m — the uncompressed interchange format
# every video toolchain speaks; header + raw planar frames, so a full parser
# needs only struct-free byte walking + numpy, like the BMP/WAV paths)
# ---------------------------------------------------------------------------

def decode_y4m(payload: bytes) -> "tuple[np.ndarray, int, int] | None":
    """YUV4MPEG2 (C420 default or C444) → ((n_frames, h, w) uint8 LUMA
    planes, fps_num, fps_den); None if the payload is not Y4M. Chroma
    planes are parsed (to advance correctly) but not returned — every
    feature here is luma-based, and dropping chroma keeps the decode
    zero-copy per frame (numpy views into the payload buffer)."""
    if not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    num, den = 25, 1
    chroma = "420"
    try:
        for tok in payload[10:nl].split(b" "):
            if not tok:
                continue
            c, v = tok[:1], tok[1:]
            if c == b"W":
                w = int(v)
            elif c == b"H":
                h = int(v)
            elif c == b"F":
                num, den = (int(x) for x in v.split(b":"))
            elif c == b"C":
                chroma = v.decode("ascii", "replace")
    except ValueError:
        # garbled header token ('W1x', 'F25' without a colon): not
        # decodable → None, the strict=False stub path — a raised
        # ValueError would kill the whole decode_video map task
        # (decode_ppm wraps the same int() parsing this way)
        return None
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        return None  # malformed header (F0:1 would fabricate durations)
    if chroma.startswith("420"):
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("444"):
        fsize = 3 * w * h
    else:
        return None  # other samplings → stub path
    buf = np.frombuffer(payload, dtype=np.uint8)
    pos = nl + 1
    frames = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            return None  # truncated/garbled frame header
        start = fnl + 1
        if start + fsize > len(payload):
            return None  # truncated frame payload
        frames.append(buf[start:start + w * h].reshape(h, w))
        pos = start + fsize
    if not frames:
        return None
    return np.stack(frames), num, den


def encode_y4m(luma: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n_frames, h, w) uint8 luma → Y4M C420 bytes (chroma mid-gray)."""
    n, h, w = luma.shape
    chroma = np.full(((w // 2) * (h // 2),), 128, dtype=np.uint8).tobytes()
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420\n".encode()
    parts = [head]
    for f in range(n):
        parts.append(b"FRAME\n")
        parts.append(luma[f].astype(np.uint8).tobytes())
        parts.append(chroma)
        parts.append(chroma)
    return b"".join(parts)


def _stub_video(payload: bytes) -> dict:
    """Deterministic stand-in for compressed video (MP4/WebM) this
    container cannot decode: stable pseudo-dimensions + hash features."""
    h = hashlib.sha256(payload).digest()
    return {"width": 160 + (h[0] % 8) * 80, "height": 120 + (h[1] % 8) * 60,
            "n_frames": 10 + struct.unpack_from("<H", h, 2)[0] % 500,
            "fps_num": 25, "fps_den": 1,
            "n_sampled": 0,
            "mean_luma": int(h[4]), "peak_luma": int(max(h[4], h[5])),
            "decoded": False}


class VideoFeatureExtractor:
    """Actor-pool stage: media batch → (media_id, width, height,
    n_frames, duration_ms, n_sampled, mean_luma, peak_luma, decoded).
    Y4M decodes for real; compressed containers stub (or raise when
    ``strict``). Frame SAMPLING happens inside the decode (every
    ``stride``-th frame) — per-frame mean luma is an integer floor
    (sum // pixels), ``mean_luma`` the floor-mean over sampled frames
    and ``peak_luma`` their max, so goldens pin bit-exactly."""

    def __init__(self, stride: int = 5, strict: bool = False):
        if stride < 1:
            raise ValueError("VideoFeatureExtractor: stride must be >= 1")
        self.stride = stride
        self.strict = strict

    def features(self, payload: bytes) -> dict:
        got = decode_y4m(payload or b"")
        if got is not None:
            luma, num, den = got
            n, h, w = luma.shape
            sampled = luma[::self.stride]
            per = sampled.reshape(len(sampled), -1).astype(np.int64) \
                .sum(axis=1) // (h * w)
            return {"width": w, "height": h, "n_frames": n,
                    "fps_num": num, "fps_den": den,
                    "n_sampled": int(len(sampled)),
                    "mean_luma": int(per.sum() // len(per)),
                    "peak_luma": int(per.max()), "decoded": True}
        if self.strict:
            raise NotImplementedError(
                "payload is not YUV4MPEG2 and no video codec is installed")
        return _stub_video(payload or b"")

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [self.features(p or b"")
                for p in batch["payload"].to_pylist()]
        d = {"media_id": batch["media_id"].combine_chunks().cast(pa.int64())}
        for col, typ in [("width", pa.int32()), ("height", pa.int32()),
                         ("n_frames", pa.int64()),
                         ("fps_num", pa.int32()), ("fps_den", pa.int32()),
                         ("n_sampled", pa.int64()),
                         ("mean_luma", pa.int64()), ("peak_luma", pa.int64()),
                         ("decoded", pa.bool_())]:
            d[col] = pa.array([o[col] for o in outs], type=typ)
        nf = np.array([o["n_frames"] for o in outs], dtype=np.int64)
        num = np.array([o["fps_num"] for o in outs], dtype=np.int64)
        den = np.array([o["fps_den"] for o in outs], dtype=np.int64)
        d["duration_ms"] = pa.array(nf * 1000 * den // np.maximum(num, 1),
                                    type=pa.int64())
        return pa.table(d)


def decode_video(media: Dataset, stride: int = 5, concurrency=2,
                 batch_size: int = 16) -> Dataset:
    """Small batches: raw frames × batch_size × concurrency bounds each
    worker's heap — the same sizing rule as the image/audio pools."""
    return media.map_batches(
        VideoFeatureExtractor, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def make_fake_video(n: int = 48, seed: int = 17) -> pa.Table:
    """Deterministic video table: REAL Y4M payloads (integer gradient
    patterns — no libm, bit-stable) with every 8th row a codec-format
    stand-in so the stub path stays exercised."""
    rng = np.random.default_rng(seed)
    payloads, mimes = [], []
    for i in range(n):
        if i % 8 == 7:
            payloads.append(rng.integers(
                0, 256, size=int(rng.integers(500, 5000)),
                dtype=np.uint8).tobytes())
            mimes.append("video/mp4")            # undecodable here → stub
        else:
            w = int(rng.choice([8, 16, 24, 32]))
            h = int(rng.choice([8, 16, 24]))
            nf = int(rng.integers(2, 9))
            f = np.arange(nf, dtype=np.int64)[:, None, None]
            y = np.arange(h, dtype=np.int64)[None, :, None]
            x = np.arange(w, dtype=np.int64)[None, None, :]
            luma = ((x + 3 * y + 7 * f + 13 * i) % 256).astype(np.uint8)
            fps = (int(rng.choice([24, 25, 30])), 1)
            payloads.append(encode_y4m(luma, fps))
            mimes.append("video/x-yuv4mpeg")
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["video"] * n, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "meta": pa.array(["{}"] * n, type=pa.string()),
        }
    )


def decode_images(media: Dataset, concurrency: int = 2, batch_size: int = 32,
                  strict: bool = False) -> Dataset:
    """Small batches: payload bytes × batch_size × concurrency bounds the
    per-worker heap for large binaries. The registered codec decoder
    (``set_real_decoder``) ships to every actor via constructor
    kwargs."""
    return media.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"strict": strict,
                               "decoder": ImageDecoder.real_decoder},
        concurrency=concurrency,
    )


def dhash64(rgb: np.ndarray) -> int:
    """Difference hash (dHash) of an (H, W, 3) uint8 image as a 64-bit
    int — the classic perceptual fingerprint for image near-dup
    detection. Fully integer and deterministic: BT.601 integer luma
    ``(299·R + 587·G + 114·B) // 1000``, 8×9 AREA-MEAN downsample with
    contiguous integer band bounds (``(i·H)//8``) and floor-div means
    (robust to small pixel noise, unlike nearest sampling), then one
    horizontal-gradient sign bit per adjacent cell pair."""
    h, w, _ = rgb.shape
    px = rgb.astype(np.int64)
    luma = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    yb = (np.arange(9, dtype=np.int64) * h) // 8   # 8 row bands
    xb = (np.arange(10, dtype=np.int64) * w) // 9  # 9 col bands
    # integer area means via 2-D prefix sums
    ps = np.zeros((h + 1, w + 1), dtype=np.int64)
    ps[1:, 1:] = luma.cumsum(0).cumsum(1)
    ys, ye = yb[:-1], np.maximum(yb[1:], yb[:-1] + 1)  # ≥1 row/col per band
    xs, xe = xb[:-1], np.maximum(xb[1:], xb[:-1] + 1)
    ye, xe = np.minimum(ye, h), np.minimum(xe, w)
    sums = (ps[ye][:, xe] - ps[ye][:, xs] - ps[ys][:, xe] + ps[ys][:, xs])
    area = ((ye - ys)[:, None] * (xe - xs)[None, :])
    cells = sums // area                           # (8, 9) integer means
    bits = (cells[:, 1:] > cells[:, :-1]).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


class ImageHasher:
    """Actor-pool stage: media batch → (media_id, dhash) for every
    DECODABLE image (BMP/PPM, or the installed ``real_decoder``);
    undecodable payloads emit no row — a perceptual hash of random
    codec bytes would be noise, not a fingerprint."""

    def __init__(self, decoder=None):
        # same transport rule as ImageDecoder: the hook must arrive via
        # constructor kwargs to exist inside actor processes. The hook
        # must return an 'rgb' (H, W, 3) uint8 key for codec images to
        # be fingerprinted — a decoder without it means codec rows are
        # SKIPPED (documented; raw-pixel formats always hash).
        self.decoder = (decoder if decoder is not None
                        else ImageDecoder.real_decoder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            rgb = decode_any(p or b"")
            if rgb is None and self.decoder is not None:
                out = self.decoder(p or b"")
                rgb = out.get("rgb") if isinstance(out, dict) else None
            if rgb is None or rgb.shape[0] < 1 or rgb.shape[1] < 1:
                continue
            ids.append(mid)
            hashes.append(dhash64(rgb))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "dhash": pa.array(hashes, type=pa.uint64()),
        })


def image_dhash(media: Dataset, concurrency=2, batch_size: int = 32) -> Dataset:
    """(media_id, dhash) over a media table — small batches bound the
    per-worker heap like ``decode_images``."""
    return media.map_batches(
        ImageHasher, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"decoder": ImageDecoder.real_decoder},
        concurrency=concurrency,
    )


def image_neardup_pairs(
    media: Dataset, max_hamming: int = 3, concurrency=2,
    batch_size: int = 32,
) -> Dataset:
    """Image near-duplicate pairs: dHash fingerprints → the generic
    64-bit hamming pair finder (``functions.dedup.hamming64_pairs`` —
    the SAME 4×16-bit pigeonhole banding, fs-exchange buckets and exact
    verify the SimHash text path uses). Returns (a, b, hamming) with
    a < b. The multimodal member of the dedup family: exact byte dedup
    catches re-uploads, dHash catches re-encodes/crops-with-noise."""
    from guac_ray.functions.dedup import hamming64_pairs

    sigs = image_dhash(media, concurrency=concurrency,
                       batch_size=batch_size)
    return hamming64_pairs(sigs, id_col="media_id", hash_col="dhash",
                           max_hamming=max_hamming,
                           exchange_name="imgdhash_bands")


def make_fake_media_with_neardups(
    n: int = 64, dups: int = 6, seed: int = 7
) -> pa.Table:
    """``make_fake_media`` plus ``dups`` planted near-duplicates:
    structured gradient images (dHash-stable under noise) re-encoded
    with ±1 pixel jitter under fresh ids ≥ 10_000 — deterministic, so
    the pair list golden-pins like the text near-dup queries."""
    base = make_fake_media(n, seed=seed)
    rng = np.random.default_rng(seed + 1)
    payloads, ids = [], []
    levels = np.array([16, 128, 240], dtype=np.int64)
    for d in range(dups):
        # 8×9 block grid from 3 high-contrast levels with no equal
        # horizontal neighbors (adjacent-cell gaps ≥ 112, so the dHash
        # gradient bits cannot flip under ±1 jitter), upscaled by
        # integer factors so the hash's area-mean bands align with
        # blocks EXACTLY; grayscale (r=g=b) so integer luma == value
        grid = np.empty((8, 9), dtype=np.int64)
        grid[:, 0] = levels[rng.integers(0, 3, size=8)]
        for j in range(1, 9):
            for i in range(8):
                others = levels[levels != grid[i, j - 1]]
                grid[i, j] = others[rng.integers(0, 2)]
        arr = np.repeat(np.repeat(grid, 4, axis=0), 5, axis=1)  # 32×45
        img = np.stack([arr] * 3, axis=2).astype(np.uint8)
        ids.append(10_000 + 2 * d)
        payloads.append(encode_bmp(img))
        noise = rng.integers(-1, 2, size=img.shape)
        jit = np.clip(img.astype(np.int64) + noise, 0, 255).astype(np.uint8)
        ids.append(10_000 + 2 * d + 1)
        payloads.append(encode_bmp(jit))
    extra = pa.table({
        "media_id": pa.array(ids, type=pa.int64()),
        "kind": pa.array(["image"] * len(ids), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/bmp"] * len(ids), type=pa.string()),
        "meta": pa.array(["{}"] * len(ids), type=pa.string()),
    })
    return pa.concat_tables([base, extra])


def resize_images(media: Dataset, out_w: int = 64, out_h: int = 64,
                  concurrency: int = 2, batch_size: int = 32) -> Dataset:
    return media.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def make_fake_media(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic media table: REAL BMP images (decodable by the real
    kernel) with a few codec-format stand-ins mixed in (every 8th row) so
    the stub path stays exercised."""
    rng = np.random.default_rng(seed)
    payloads, mimes = [], []
    for i in range(n):
        if i % 8 == 7:
            payloads.append(rng.integers(0, 256, size=int(rng.integers(100, 4000)),
                                         dtype=np.uint8).tobytes())
            mimes.append("image/jpeg")           # undecodable here → stub path
        else:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(arr))
            mimes.append("image/bmp")
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["image"] * n, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "meta": pa.array(["{}"] * n, type=pa.string()),
        }
    )

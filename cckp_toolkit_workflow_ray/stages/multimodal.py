"""Multimodal (image/audio/video) column processing.

Large-scale training pipelines carry media as opaque ``binary`` columns
with typed metadata.  The engine treats them exactly like the ``html``
binary column: small batches (payloads are wide), actor-pool
``map_batches`` stages with the decoder built once per actor, Arrow
in/out.

Codec realness, honestly stated (r3):

* **REAL, no external libs**: PPM ``P6`` images (pure header+raw-RGB
  parse), uncompressed 24-bit ``BM`` BMP images (BITMAPINFOHEADER,
  bottom-up BGR rows with 4-byte padding), and PCM WAV audio via the
  stdlib ``wave`` module.  ``DecodeImage()`` / ``DecodeAudio()`` work
  out of the box on these formats; unknown or corrupt payloads yield
  ``decode_ok=False`` rows (never-abort), exactly like the html
  extraction check.
* **Stubbed**: compressed formats (JPEG/PNG/MP3/H.264) need codec
  libraries this container doesn't have; real deployments install
  PIL/ffmpeg once per actor in ``__init__`` (the A1/A2 install-once
  analog).  The fixture format ``b"IMG1" + width:u16 + height:u16 +
  channels:u8 + pixels`` (``fake=True``) keeps schema/actor/batch tests
  independent of any codec.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"IMG1"

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("payload", pa.binary()),
        ("format", pa.string()),
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("mean_intensity", pa.float64()),
        ("decode_ok", pa.bool_()),
    ]
)


def synthesize_image(image_id: int, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake image payload for fixtures."""
    n = width * height * channels
    pix = ((np.arange(n, dtype=np.uint64) * np.uint64(image_id * 2 + 1)) % 251).astype(np.uint8)
    return MAGIC + struct.pack("<HHB", width, height, channels) + pix.tobytes()


def _det_pixels(image_id: int, n: int) -> np.ndarray:
    return ((np.arange(n, dtype=np.uint64)
             * np.uint64(image_id * 2 + 1)) % 251).astype(np.uint8)


def synthesize_ppm(image_id: int, width: int, height: int) -> bytes:
    """A REAL binary PPM (P6) file with deterministic pixels."""
    header = f"P6\n# fixture {image_id}\n{width} {height}\n255\n".encode()
    return header + _det_pixels(image_id, width * height * 3).tobytes()


def synthesize_bmp(image_id: int, width: int, height: int) -> bytes:
    """A REAL uncompressed 24-bit bottom-up BMP with deterministic
    pixels (BITMAPINFOHEADER, rows padded to 4 bytes)."""
    rgb = _det_pixels(image_id, width * height * 3).reshape(height, width, 3)
    bgr = rgb[::-1, :, ::-1]                      # bottom-up rows, BGR
    pad = (-(width * 3)) % 4
    rows = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(height))
    pixel_off = 14 + 40
    size = pixel_off + len(rows)
    file_hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(rows), 2835, 2835, 0, 0)
    return file_hdr + dib + rows


def _decode_ppm(payload: bytes):
    """Pure-python P6 parse: ASCII header tokens (comments allowed),
    maxval ≤ 255, then raw RGB bytes."""
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        ch = payload[pos:pos + 1]
        if ch == b"#":
            while pos < n and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < n and not payload[pos:pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3:
        return None
    pos += 1                                      # single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        return None
    # a payload truncated right after the maxval token leaves pos past the
    # end; np.frombuffer would raise instead of returning a decode failure
    if pos > n:
        return None
    pix = np.frombuffer(payload, dtype=np.uint8, offset=pos)
    if pix.size != w * h * 3:
        return None
    return w, h, 3, pix


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): de-pad rows, flip the
    bottom-up order, BGR → RGB."""
    if len(payload) < 54:
        return None
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if pixel_off + stride * h > len(payload):
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, offset=pixel_off,
                        count=stride * h).reshape(h, stride)
    bgr = raw[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:                                 # bottom-up storage
        bgr = bgr[::-1]
    rgb = bgr[:, :, ::-1]
    return w, h, 3, np.ascontiguousarray(rgb).reshape(-1)


class DecodeImage:
    """Actor-pool stage: decode + feature-extract an image binary column.

    REAL decoders (no external libs): PPM ``P6`` and uncompressed 24-bit
    BMP.  ``fake=True`` additionally accepts the ``IMG1`` fixture format.
    Compressed formats need codec libraries — real deployments build
    PIL/torchvision/ffmpeg once in ``__init__`` (the A1/A2 install-once
    analog, /root/reference/modules/RunAlmanack.nf:51-52).  Use small
    ``batch_size`` (payloads are MBs) and ``concurrency=(min,max)``.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode(self, payload: bytes):
        if payload is None or len(payload) < 2:
            return None
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if self.fake and len(payload) >= 9 and payload[:4] == MAGIC:
            w, h, c = struct.unpack_from("<HHB", payload, 4)
            pix = np.frombuffer(payload, dtype=np.uint8, offset=9)
            if pix.size != w * h * c:
                return None
            return w, h, c, pix
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_numpy(zero_copy_only=False)
        rows = {k: [] for k in ("image_id", "width", "height", "channels",
                                "mean_intensity", "decode_ok")}
        for i, payload in zip(ids.tolist(), payloads):
            dec = self._decode(payload)
            rows["image_id"].append(i)
            if dec is None:
                rows["width"].append(0)
                rows["height"].append(0)
                rows["channels"].append(0)
                rows["mean_intensity"].append(0.0)
                rows["decode_ok"].append(False)
            else:
                w, h, c, pix = dec
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["mean_intensity"].append(float(pix.mean()))
                rows["decode_ok"].append(True)
        return pa.Table.from_arrays(
            [
                pa.array(rows["image_id"], type=pa.int64()),
                pa.array(rows["width"], type=pa.int32()),
                pa.array(rows["height"], type=pa.int32()),
                pa.array(rows["channels"], type=pa.int32()),
                pa.array(rows["mean_intensity"], type=pa.float64()),
                pa.array(rows["decode_ok"], type=pa.bool_()),
            ],
            schema=FEATURES_SCHEMA,
        )


class ResizeImage:
    """Actor-pool stage: nearest-neighbor resize of fake payloads —
    demonstrates binary-in/binary-out transform plumbing."""

    def __init__(self, target: tuple[int, int], fake: bool = False):
        self.target = target
        self.decoder = DecodeImage(fake=fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        out = []
        for payload in batch.column("payload").to_numpy(zero_copy_only=False):
            dec = self.decoder._decode(payload)
            if dec is None:
                out.append(None)
                continue
            w, h, c, pix = dec
            img = pix.reshape(h, w, c)
            yi = (np.arange(th) * h // th)
            xi = (np.arange(tw) * w // tw)
            resized = img[yi][:, xi]
            out.append(MAGIC + struct.pack("<HHB", tw, th, c) + resized.tobytes())
        return batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out, type=pa.binary()),
        )


def decode_features(ds, fake: bool = True, batch_size: int = 256, concurrency=(1, 4)):
    """images dataset -> features dataset via the DecodeImage actor pool."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_size=batch_size,          # payloads are wide: keep batches small
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# audio: REAL PCM WAV decode via the stdlib wave module
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("audio_id", pa.int64()),
        ("n_channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
        ("duration_ms", pa.int64()),
        ("rms_e3", pa.int64()),        # RMS of normalized samples × 1e3
        ("decode_ok", pa.bool_()),
    ]
)


def synthesize_wav(audio_id: int, n_samples: int, rate: int = 16000,
                   channels: int = 1) -> bytes:
    """A REAL PCM-16 WAV file with deterministic samples."""
    import io
    import wave

    t = np.arange(n_samples * channels, dtype=np.float64)
    freq = 110.0 * ((audio_id % 8) + 1)
    samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


class DecodeAudio:
    """Actor-pool stage: decode + feature-extract a PCM WAV binary
    column — a REAL decoder (stdlib ``wave``), no stub.  Compressed
    audio (MP3/OGG) needs codec libs; real deployments build them once
    per actor in ``__init__``.  Corrupt/unknown payloads yield
    ``decode_ok=False`` rows (never-abort)."""

    def _decode(self, payload: bytes):
        import io
        import wave

        if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
            return None
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                ch, width, rate, n = (w.getnchannels(), w.getsampwidth(),
                                      w.getframerate(), w.getnframes())
                frames = w.readframes(n)
        except Exception:
            return None                           # truncated/corrupt RIFF
        if width != 2 or ch <= 0 or rate <= 0:
            return None
        samples = np.frombuffer(frames, dtype="<i2")
        return ch, rate, n, samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_numpy(zero_copy_only=False)
        rows = {k: [] for k in ("audio_id", "n_channels", "sample_rate",
                                "n_samples", "duration_ms", "rms_e3",
                                "decode_ok")}
        for i, payload in zip(ids.tolist(), payloads):
            dec = self._decode(payload)
            rows["audio_id"].append(i)
            if dec is None:
                for k, v in (("n_channels", 0), ("sample_rate", 0),
                             ("n_samples", 0), ("duration_ms", 0),
                             ("rms_e3", 0), ("decode_ok", False)):
                    rows[k].append(v)
                continue
            ch, rate, n, samples = dec
            norm = samples.astype(np.float64) / 32768.0
            rms = float(np.sqrt(np.mean(norm * norm))) if samples.size else 0.0
            rows["n_channels"].append(ch)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(n)
            rows["duration_ms"].append(int(n * 1000 // rate))
            rows["rms_e3"].append(int(round(rms * 1000)))
            rows["decode_ok"].append(True)
        return pa.Table.from_arrays(
            [
                pa.array(rows["audio_id"], type=pa.int64()),
                pa.array(rows["n_channels"], type=pa.int32()),
                pa.array(rows["sample_rate"], type=pa.int32()),
                pa.array(rows["n_samples"], type=pa.int32()),
                pa.array(rows["duration_ms"], type=pa.int64()),
                pa.array(rows["rms_e3"], type=pa.int64()),
                pa.array(rows["decode_ok"], type=pa.bool_()),
            ],
            schema=AUDIO_FEATURES_SCHEMA,
        )


def decode_audio_features(ds, batch_size: int = 256, concurrency=(1, 4)):
    """audio dataset -> features dataset via the DecodeAudio actor pool."""
    return ds.map_batches(
        DecodeAudio, batch_size=batch_size, batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# video → sampled frames (row-expanding binary transform)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"VID1"

FRAMES_SCHEMA = pa.schema(
    [
        ("video_id", pa.int64()),
        ("frame_index", pa.int32()),
        ("payload", pa.binary()),      # an IMG1 image payload per frame
    ]
)


def synthesize_video(video_id: int, n_frames: int, width: int, height: int,
                     channels: int = 3) -> bytes:
    """Deterministic fake video payload: ``VID1 + n:u16 + w:u16 + h:u16 +
    c:u8 + n×(w*h*c) frame bytes``."""
    per = width * height * channels
    pix = ((np.arange(n_frames * per, dtype=np.uint64)
            * np.uint64(video_id * 2 + 1)) % 249).astype(np.uint8)
    return (VIDEO_MAGIC + struct.pack("<HHHB", n_frames, width, height, channels)
            + pix.tobytes())


class SampleFrames:
    """Actor-pool stage: decode a video binary column and emit every
    ``stride``-th frame as its own row (an IMG1 payload) — the
    row-EXPANDING media transform (video → frames) that feeds the image
    stages downstream.  Real deployments replace the parser with
    ffmpeg/pyav built once in ``__init__``; row expansion means output
    batches are bigger than input batches, so keep ``batch_size`` small.
    """

    def __init__(self, stride: int = 2, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "real video codecs are unavailable in this environment; "
                "construct with fake=True for the deterministic test parser"
            )
        self.stride = max(1, stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_vid, out_idx, out_pay = [], [], []
        ids = batch.column("video_id").to_numpy(zero_copy_only=False)
        for vid, payload in zip(
                ids, batch.column("payload").to_numpy(zero_copy_only=False)):
            if payload is None or len(payload) < 11 or payload[:4] != VIDEO_MAGIC:
                continue                       # never-abort: bad media skipped
            n, w, h, c = struct.unpack_from("<HHHB", payload, 4)
            per = w * h * c
            # per == 0 would make the size check vacuous and emit n/stride
            # degenerate zero-dimension rows from an 11-byte payload — a
            # row-amplification vector (review r2)
            if per == 0 or n == 0:
                continue
            frames = np.frombuffer(payload, dtype=np.uint8, offset=11)
            if frames.size != n * per:
                continue
            for i in range(0, n, self.stride):
                out_vid.append(int(vid))
                out_idx.append(i)
                out_pay.append(MAGIC + struct.pack("<HHB", w, h, c)
                               + frames[i * per:(i + 1) * per].tobytes())
        return pa.Table.from_arrays(
            [pa.array(out_vid, type=pa.int64()),
             pa.array(out_idx, type=pa.int32()),
             pa.array(out_pay, type=pa.binary())],
            schema=FRAMES_SCHEMA,
        )


def sample_frames(ds, stride: int = 2, fake: bool = True,
                  batch_size: int = 64, concurrency=(1, 4)):
    """videos dataset -> sampled-frames dataset via the SampleFrames pool."""
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"stride": stride, "fake": fake},
        batch_size=batch_size, batch_format="pyarrow", concurrency=concurrency,
    )

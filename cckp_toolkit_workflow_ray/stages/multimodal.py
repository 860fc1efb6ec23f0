"""Multimodal (image/audio/video) column processing — Ray plumbing real,
codecs stubbed.

Large-scale training pipelines carry media as opaque ``binary`` columns
with typed metadata.  The engine treats them exactly like the ``html``
binary column: small batches (payloads are wide), actor-pool
``map_batches`` stages with the decoder built once per actor, Arrow
in/out.  The image/audio libraries are not available in this container,
so the decode step is a clearly-marked stub: ``DecodeImage`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder parses a tiny header format so the schema,
batch sizing, actor signature, and output layout are real and tested.

Fake payload format (used by fixtures): ``b"IMG1" + width:u16 + height:u16
+ channels:u8 + pixel bytes`` — ``synthesize_image`` / fake-decode are
exact inverses, mirroring the html/text extraction invariant.
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


class DecodeImage:
    """Actor-pool stage: decode + feature-extract an image binary column.

    Real deployments replace ``_decode`` with PIL/torchvision/ffmpeg built
    once in ``__init__`` (the A1/A2 install-once analog,
    /root/reference/modules/RunAlmanack.nf:51-52).  Use small
    ``batch_size`` (payloads are MBs) and ``concurrency=(min,max)``.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "real image codecs are unavailable in this environment; "
                "construct with fake=True for the deterministic test decoder"
            )

    def _decode(self, payload: bytes):
        if payload is None or len(payload) < 9 or payload[:4] != MAGIC:
            return None
        w, h, c = struct.unpack_from("<HHB", payload, 4)
        pix = np.frombuffer(payload, dtype=np.uint8, offset=9)
        if pix.size != w * h * c:
            return None
        return w, h, c, pix

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

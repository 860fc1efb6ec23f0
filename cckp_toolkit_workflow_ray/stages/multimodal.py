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

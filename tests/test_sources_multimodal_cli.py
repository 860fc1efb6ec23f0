"""Tests for extra sources (CSV sample sheet, JSON), multimodal stubs,
and the CLI driven as a real subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from cckp_toolkit_workflow_ray.sources.readers import (
    SampleSheetError,
    dataset_from_sample_sheet,
    dataset_from_value,
    read_pages,
    read_sample_sheet,
)
from cckp_toolkit_workflow_ray.stages.multimodal import (
    DecodeImage,
    ResizeImage,
    decode_features,
    synthesize_image,
)


# ---------------------------------------------------------------- sources
def test_sample_sheet_semantics(tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text("url,notes\n https://a/x , hi\n\nhttps://b/y,\n  ,\n")
    assert read_sample_sheet(str(p)) == ["https://a/x", "https://b/y"]


def test_sample_sheet_missing_column_fails_fast(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("name,description\nfoo,bar\n")
    with pytest.raises(SampleSheetError, match="no 'url' column"):
        read_sample_sheet(str(p))
    p2 = tmp_path / "empty.csv"
    p2.write_text("")
    with pytest.raises(SampleSheetError, match="empty"):
        read_sample_sheet(str(p2))


def test_sample_sheet_and_value_datasets(ray_session, tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text("url\nhttps://a/x\nhttps://b/y\n")
    assert dataset_from_sample_sheet(str(p)).count() == 2
    assert dataset_from_value("https://c/z").take_all() == [{"url": "https://c/z"}]


def test_read_pages_pruned_and_filtered(ray_session, tiny_pages_dir):
    ds = read_pages(tiny_pages_dir, columns=["url", "lang"], langs=["en"])
    df = ds.to_pandas()
    assert set(df.columns) == {"url", "lang"}
    assert (df["lang"] == "en").all() and len(df) > 0


# ---------------------------------------------------------------- multimodal
def test_real_ppm_bmp_decode_roundtrip():
    """r3: PPM and BMP decode are REAL (pure parse) — a default
    DecodeImage() recovers the exact deterministic pixels from both
    formats, and corrupt/unknown payloads yield None (never-abort)."""
    from cckp_toolkit_workflow_ray.stages.multimodal import (
        _det_pixels, synthesize_bmp, synthesize_ppm)

    dec = DecodeImage()                     # no fake flag needed
    for synth in (synthesize_ppm, synthesize_bmp):
        w, h, c, pix = dec._decode(synth(7, 13, 5))
        assert (w, h, c) == (13, 5, 3)
        assert (pix == _det_pixels(7, 13 * 5 * 3)).all(), synth.__name__
    # width not divisible by 4 exercises BMP row padding
    w, h, c, pix = dec._decode(synthesize_bmp(3, 5, 4))
    assert (w, h, c) == (5, 4, 3)
    assert (pix == _det_pixels(3, 5 * 4 * 3)).all()
    assert dec._decode(b"P6\n13 5\n255\n\x00") is None      # truncated
    assert dec._decode(b"BMgarbage") is None
    assert dec._decode(b"\x89PNG\r\n") is None              # unsupported codec
    # IMG1 fixture format requires opting in
    from cckp_toolkit_workflow_ray.stages.multimodal import synthesize_image

    assert dec._decode(synthesize_image(1, 4, 4)) is None
    assert DecodeImage(fake=True)._decode(synthesize_image(1, 4, 4)) is not None


def test_real_wav_decode_features(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.multimodal import (
        DecodeAudio, decode_audio_features, synthesize_wav)

    rows = [{"audio_id": i, "payload": synthesize_wav(i, 1600 + 100 * i)}
            for i in range(6)]
    rows.append({"audio_id": 99, "payload": b"RIFFbroken"})
    rows.append({"audio_id": 100, "payload": None})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = decode_audio_features(ds, batch_size=3).to_pandas() \
        .sort_values("audio_id").reset_index(drop=True)
    ok = out[out["decode_ok"]]
    assert len(ok) == 6 and len(out) == 8
    assert (ok["sample_rate"] == 16000).all()
    assert (ok["n_samples"].to_numpy() == 1600 + 100 * np.arange(6)).all()
    assert (ok["duration_ms"].to_numpy() ==
            (1600 + 100 * np.arange(6)) * 1000 // 16000).all()
    # a full-scale sine has RMS ~ amplitude/sqrt(2): 12000/32768/1.414 ~ 0.26
    assert ok["rms_e3"].between(200, 300).all()
    bad = out[~out["decode_ok"]]
    assert set(bad["audio_id"]) == {99, 100}
    assert (bad[["n_channels", "n_samples", "rms_e3"]] == 0).all().all()


def test_fake_decode_roundtrip_and_actor_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rows = []
    for i in range(32):
        w, h = 8 + i % 5, 6 + i % 3
        rows.append({"image_id": i, "payload": synthesize_image(i, w, h), "format": "img1"})
    rows.append({"image_id": 99, "payload": b"garbage", "format": "img1"})
    ds = rd.from_items(rows)
    feats = decode_features(ds, fake=True, batch_size=8).to_pandas()
    assert len(feats) == 33
    ok = feats[feats.image_id < 99]
    assert ok.decode_ok.all()
    assert (ok.width == (8 + ok.image_id % 5)).all()
    bad = feats[feats.image_id == 99].iloc[0]
    assert not bad.decode_ok  # malformed payload -> flagged, never raises


def test_resize_image(ray_session):
    import pyarrow as pa

    t = pa.table({
        "image_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([synthesize_image(1, 16, 12)], type=pa.binary()),
        "format": pa.array(["img1"]),
    })
    out = ResizeImage((4, 4), fake=True)(t)
    dec = DecodeImage(fake=True)._decode(out.column("payload")[0].as_py())
    assert dec[0] == 4 and dec[1] == 4


# ---------------------------------------------------------------- CLI
CLI_ENV = {**os.environ, "PYTHONPATH": "/root/repo"}


def _cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "cckp_toolkit_workflow_ray.cli", "--num-cpus", "4", *args],
        capture_output=True, text=True, env=CLI_ENV, cwd="/root/repo", timeout=300,
    )


def test_cli_generate_validate_resume(tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    r = _cli("generate", "--n", "3000", "--out", pages)
    assert r.returncode == 0, r.stderr[-2000:]
    r = _cli("validate", "--input", pages, "--out", out)
    assert r.returncode == 1, r.stderr[-2000:]  # seeded violations -> FAIL exit
    rep = json.loads(r.stdout)
    assert rep["n_rows"] == 3000 and rep["n_violations"] > 0
    assert os.path.exists(os.path.join(out, "verdicts.parquet"))
    # resumable mode: second run skips all partitions
    out2 = str(tmp_path / "out2")
    r = _cli("validate", "--input", pages, "--out", out2, "--resume")
    assert r.returncode == 1, r.stderr[-2000:]
    r = _cli("validate", "--input", pages, "--out", out2, "--resume")
    assert r.returncode == 1, r.stderr[-2000:]
    rep2 = json.loads(r.stdout)
    assert rep2["skipped"] == rep2["total"] and rep2["computed"] == 0


def test_cli_profile_and_single_check(tmp_path):
    pages = str(tmp_path / "pages")
    r = _cli("generate", "--n", "2000", "--out", pages, "--no-violations")
    assert r.returncode == 0, r.stderr[-2000:]
    ref = str(tmp_path / "ref.json")
    r = _cli("profile", "--input", pages, "--out", ref)
    assert r.returncode == 0, r.stderr[-2000:]
    assert set(json.loads(r.stdout)["langs"]) == {"en", "de", "fr", "es", "zh"}
    r = _cli("check", "--name", "url_format", "--input", pages, "--out", str(tmp_path / "co"))
    assert r.returncode == 0, r.stderr[-2000:]  # clean corpus -> PASS exit 0


# ---------------------------------------------------------------- sinks
def test_publish_outputs_roundtrip(ray_session, tiny_pages_dir, tmp_path):
    from cckp_toolkit_workflow_ray.pipelines.sinks import publish_outputs
    from cckp_toolkit_workflow_ray.pipelines.validate import validate

    out = str(tmp_path / "run")
    validate(tiny_pages_dir, out_dir=out)
    target = str(tmp_path / "published")
    paths = publish_outputs(out, target)
    assert any(p.endswith("report.json") for p in paths)
    assert any("violations" in p for p in paths)
    import json

    a = json.load(open(os.path.join(out, "report.json")))
    b = json.load(open(os.path.join(target, "report.json")))
    assert a == b


# ---------------------------------------------------------------- schema gate
def test_wrong_types_fail_fast(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cckp_toolkit_workflow_ray.pipelines.validate import validate
    from cckp_toolkit_workflow_ray.schema import SchemaMismatchError

    bad = pa.table({
        "url": pa.array(["https://a/b"]),
        "warc_ts": pa.array(["2024-01-01"]),    # string, not timestamp
        "html": pa.array(["<html>"]),           # string, not binary
        "text": pa.array(["x"]),
        "lang": pa.array(["en"]),
    })
    p = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p)
    with pytest.raises(SchemaMismatchError, match="warc_ts"):
        validate(p, out_dir=str(tmp_path / "o"))


def test_write_partitioned_by_key(ray_session, tmp_path):
    import ray.data as rd

    from cckp_toolkit_workflow_ray.pipelines.sinks import write_partitioned_by_key
    from cckp_toolkit_workflow_ray.sources.pages import generate_pages_dataset

    out = str(tmp_path / "by_lang")
    write_partitioned_by_key(generate_pages_dataset(2000, violations=False), out)
    parts = sorted(os.listdir(out))
    assert any(p.startswith("lang=") for p in parts)
    en = rd.read_parquet(os.path.join(out, "lang=en")).count()
    assert 0 < en < 2000


def test_sample_frames_roundtrip(ray_session):
    """Video → frames expansion: sampled frames decode back to the exact
    pixel slices of the synthesized video; bad payloads are skipped."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.multimodal import (
        DecodeImage,
        SampleFrames,
        sample_frames,
        synthesize_video,
    )

    vids = pa.table({
        "video_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array(
            [synthesize_video(1, 10, 4, 3), synthesize_video(2, 5, 2, 2),
             b"JUNK"], type=pa.binary()),
    })
    out = sample_frames(rd.from_arrow(vids), stride=2, fake=True).to_pandas()
    # video 1: frames 0,2,4,6,8; video 2: frames 0,2,4; junk skipped
    assert sorted(out[out.video_id == 1]["frame_index"]) == [0, 2, 4, 6, 8]
    assert sorted(out[out.video_id == 2]["frame_index"]) == [0, 2, 4]
    assert 3 not in set(out["video_id"])
    # each emitted frame is a valid IMG1 payload with the right pixels
    dec = DecodeImage(fake=True)
    raw = synthesize_video(1, 10, 4, 3)
    import numpy as np
    frames = np.frombuffer(raw, dtype=np.uint8, offset=11)
    for _, r in out[out.video_id == 1].iterrows():
        w, h, c, pix = dec._decode(r["payload"])
        assert (w, h, c) == (4, 3, 3)
        i = r["frame_index"]
        assert bytes(pix) == bytes(frames[i * 36:(i + 1) * 36])


def test_sample_frames_requires_fake_flag(ray_session):
    from cckp_toolkit_workflow_ray.stages.multimodal import SampleFrames

    with pytest.raises(NotImplementedError):
        SampleFrames(fake=False)


def test_sample_frames_zero_dimension_payload_skipped(ray_session):
    """review r2: an 11-byte payload claiming 65535 frames of 0x0 pixels
    must be skipped, not amplified into 32k degenerate rows."""
    import struct

    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.multimodal import (
        VIDEO_MAGIC,
        sample_frames,
        synthesize_video,
    )

    evil = VIDEO_MAGIC + struct.pack("<HHHB", 65535, 0, 0, 0)
    vids = pa.table({
        "video_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([evil, synthesize_video(2, 4, 2, 2)],
                            type=pa.binary()),
    })
    out = sample_frames(rd.from_arrow(vids), stride=2, fake=True).to_pandas()
    assert set(out["video_id"]) == {2}
    assert len(out) == 2   # frames 0, 2 of video 2


def test_media_features_query_golden(ray_session):
    """End-to-end multimodal query over sf0.001: per-(kind, decode_ok)
    counts and exact pixel/sample sums are pinned — PPM and BMP decode
    with the REAL pure-python codecs, the PNG lane must fail cleanly
    (unsupported codec => decode_ok=False), and the WAV lane decodes
    every synthesized clip."""
    import __ray_entry__ as entrymod

    out = entrymod.queries()["media_features"]("/root/testdata/sf0.001")
    got = {(r.kind, bool(r.decode_ok)): (int(r.n), int(r.sum_pixels))
           for r in out.itertuples()}
    assert got == {
        ("bmp", True): (167, 4511),
        ("png", False): (166, 0),
        ("ppm", True): (167, 4508),
        ("wav", True): (50, 63520),
    }

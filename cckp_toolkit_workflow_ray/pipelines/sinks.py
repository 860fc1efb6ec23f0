"""Output publication sink — the UploadToSynapse analog (K6).

The reference optionally pushes every result artifact to external storage
behind a flag (``/root/reference/modules/UploadToSynapse.nf:30-35``,
gated by ``params.upload_to_synapse`` at ``main.nf:135-137``).  The
engine analog publishes the run's output tree (violations/, verdicts,
profile, report) to any pyarrow-filesystem URI (local path, ``s3://``
bucket, ...) — no vendor client, no network dependency in-engine.
"""

from __future__ import annotations

import os

import pyarrow.fs as pafs


def publish_outputs(out_dir: str, target_uri: str) -> list[str]:
    """Copy a validation run's artifacts to ``target_uri``.

    Returns the list of published paths.  Idempotent: re-publishing
    overwrites (the reference's ``synapse store`` loop is likewise
    last-write-wins).
    """
    fs, target_root = pafs.FileSystem.from_uri(target_uri)
    local = pafs.LocalFileSystem()
    published = []
    for base, _, files in os.walk(out_dir):
        for f in files:
            src = os.path.join(base, f)
            rel = os.path.relpath(src, out_dir)
            dst = f"{target_root}/{rel}"
            fs.create_dir(os.path.dirname(dst), recursive=True)
            with local.open_input_stream(src) as r, fs.open_output_stream(dst) as w:
                w.write(r.read())
            published.append(dst)
    return sorted(published)


def write_partitioned_by_key(ds, out_dir: str, key: str = "lang", **kwargs):
    """Partitioned parquet layout: one directory per key value (the K4
    publishDir-per-record analog as a key-range layout) — downstream
    readers prune whole partitions by path, and a rerun can target a
    single key's directory."""
    ds.write_parquet(out_dir, partition_cols=[key], **kwargs)
    return out_dir

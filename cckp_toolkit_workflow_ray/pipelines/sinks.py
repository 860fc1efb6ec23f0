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


_COPY_CHUNK = 8 << 20  # 8 MiB


def publish_outputs(out_dir: str, target_uri: str) -> list[str]:
    """Copy a validation run's artifacts to ``target_uri``.

    Returns the list of published paths.  Idempotent at the RUN level:
    the target subtree is cleared first, because parquet part files carry
    per-run UUID names — merely overwriting same-named files would
    accumulate stale parts from earlier runs.  Relative local targets are
    resolved to absolute paths (FileSystem.from_uri requires a scheme or
    an absolute path).
    """
    if "://" not in target_uri:
        target_uri = os.path.abspath(target_uri)
    fs, target_root = pafs.FileSystem.from_uri(target_uri)
    try:
        fs.delete_dir_contents(target_root, missing_dir_ok=True)
    except (OSError, NotImplementedError):
        pass  # fresh target or a store without directory semantics
    local = pafs.LocalFileSystem()
    published = []
    for base, _, files in os.walk(out_dir):
        for f in files:
            src = os.path.join(base, f)
            rel = os.path.relpath(src, out_dir)
            dst = f"{target_root}/{rel}"
            fs.create_dir(os.path.dirname(dst), recursive=True)
            with local.open_input_stream(src) as r, fs.open_output_stream(dst) as w:
                while True:
                    chunk = r.read(_COPY_CHUNK)
                    if not chunk:
                        break
                    w.write(chunk)
            published.append(dst)
    return sorted(published)


def write_partitioned_by_key(ds, out_dir: str, key: str = "lang", **kwargs):
    """Partitioned parquet layout: one directory per key value (the K4
    publishDir-per-record analog as a key-range layout) — downstream
    readers prune whole partitions by path, and a rerun can target a
    single key's directory."""
    ds.write_parquet(out_dir, partition_cols=[key], **kwargs)
    return out_dir

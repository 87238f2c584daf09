"""Build-once cached artifacts under the system temp dir.

The engine materializes several deterministic artifacts per testdata
generation — the IVF index (centroids + inverted lists + PQ codebooks)
and the full-corpus minhash signature store — and amortizes their build
across every query that rides them. This module is the one copy of the
lifecycle those caches share:

- **content key**: the cache name embeds a fingerprint of the source
  parquet (abspath + mtime + size), so a regenerated testdata directory
  can never serve a stale artifact;
- **staged build + atomic rename**: concurrent sessions that both see a
  missing cache each build into a private staging dir and `rename()`
  into place — readers observe either nothing or a complete artifact,
  never interleaved `mode('overwrite')` writes;
- **race adjudication**: a failed rename is swallowed only if the
  winner's completion marker actually exists — any other failure
  (permissions, EXDEV, a foreign dir squatting on the path) surfaces
  instead of silently discarding the freshly built artifact;
- **stale-generation cleanup**: older cache dirs matching the caller's
  prefixes are pruned once they have been idle for a day, so
  regenerated testdata does not leak unbounded /tmp state while
  concurrently-live caches for OTHER sf_dirs survive.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time
from typing import Callable

#: idle age after which a stale cache generation is reclaimed
STALE_AFTER_S = 86400


def content_tag(src: str) -> str:
    """12-hex fingerprint of a source file's identity AND content
    generation (mtime+size): the piece of every cache name that makes
    regenerated testdata miss the old cache."""
    st = os.stat(src)
    return hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]


def cached_artifact(
    name: str,
    marker: str,
    build: Callable[[str], None],
    stale_prefixes: tuple[str, ...] = (),
) -> str:
    """Return the path of the cached artifact ``<tmpdir>/<name>``,
    building it first via ``build(staging_dir)`` if ``<name>/<marker>``
    does not exist. ``marker`` is the relative path whose presence
    means the artifact is complete (write it LAST in ``build``)."""
    tmp_root = tempfile.gettempdir()
    path = os.path.join(tmp_root, name)
    if os.path.exists(os.path.join(path, marker)):
        # refresh mtime on every USE, so the stale-pruning cutoff means
        # idle-since-last-read — a still-live cache for another sf_dir
        # built days ago must not be reclaimed out from under a reader
        try:
            os.utime(path)
        except OSError:
            pass
    else:
        stage = tempfile.mkdtemp(prefix=f"{name}_stage_", dir=tmp_root)
        try:
            build(stage)
            try:
                os.rename(stage, path)
            except OSError:
                # only swallow if a concurrent builder really won the
                # race; any other rename failure must surface
                if not os.path.exists(os.path.join(path, marker)):
                    raise
                shutil.rmtree(stage, ignore_errors=True)
        except BaseException:
            shutil.rmtree(stage, ignore_errors=True)
            raise
        if stale_prefixes:
            _prune_stale(tmp_root, stale_prefixes, keep=name)
    return path


def _prune_stale(tmp_root: str, prefixes: tuple[str, ...], keep: str) -> None:
    cutoff = time.time() - STALE_AFTER_S
    for d in os.listdir(tmp_root):
        p = os.path.join(tmp_root, d)
        if d.startswith(prefixes) and d != keep and os.path.isdir(p):
            try:
                if os.stat(p).st_mtime < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass

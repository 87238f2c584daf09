"""Driver-side small-artifact publishing through the Hadoop
FileSystem API.

Manifests and datacards are kilobyte JSON files that must land NEXT TO
the data they describe — which at scale is an object-store path
(``s3a://…``, ``hdfs://…``), not a local directory. ``os.makedirs`` /
``open`` / ``os.replace`` only work for driver-local paths, so
publishing goes through the same Hadoop ``FileSystem`` the writes use:
create a dot-prefixed temp file (invisible to partition discovery),
then rename over the final name — the rename-committer pattern, atomic
on HDFS and rename-capable stores.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def publish_json(spark: SparkSession, dir_path: str, name: str, obj) -> None:
    """Atomically publish ``obj`` as ``dir_path/name`` JSON via the
    Hadoop FileSystem for ``dir_path`` (works for local, HDFS, and
    object-store URIs alike)."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    conf = spark._jsc.hadoopConfiguration()
    d = Path(dir_path)
    fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    tmp = Path(f"{dir_path}/.{name}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(obj, indent=1, sort_keys=True).encode())
    finally:
        out.close()
    final = Path(f"{dir_path}/{name}")
    # Atomic overwrite: FileContext.rename(OVERWRITE) replaces an
    # existing artifact in one operation, so a reader (or a crash)
    # between publishes always sees old-or-new contents — FileSystem
    # .rename refuses an existing dst, and delete-then-rename would
    # open a window with NO artifact at all.
    Rename = jvm.org.apache.hadoop.fs.Options.Rename
    opts = spark._sc._gateway.new_array(Rename, 1)
    opts[0] = Rename.OVERWRITE
    ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        final.toUri(), conf
    )
    ctx.rename(tmp, final, opts)  # raises on failure


def read_json(spark: SparkSession, dir_path: str, name: str) -> dict:
    """Read back a ``publish_json`` artifact through the same
    FileSystem (readers may live on a different machine than the
    driver that published)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{dir_path}/{name}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        # IOUtils returns byte[] (→ Python bytes); a readFully into a
        # Python bytearray would NOT round-trip — py4j passes byte
        # arrays by value, so Java-side mutation is invisible here
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(data).decode())

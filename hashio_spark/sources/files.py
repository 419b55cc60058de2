"""File-tree source: the reference's recursive walk as a DataFrame scan.

``spark.read.format("binaryFile")`` is the natural analog of the
reference's ``os.walk`` + chunked read (``/root/reference/lib/hashio/
utils.py:152-209``), but it silently OMITS zero-byte files: its
partitioning drops empty splits, so an empty file never produces a row.
The reference hashes empty files to the empty-input digest
(``utils.py:197-209``), which means a verify of a reference-written
manifest over a tree containing empty files would report spurious
``missing`` rows (round-3 VERDICT "What's missing #3").

:func:`read_file_tree` closes the gap by unioning the binaryFile scan
with the tree's zero-length entries from a Hadoop-FS listing.  The
listing is metadata-only and driver-side — the same cost class as the
InMemoryFileIndex the binaryFile source itself builds on the driver, so
it adds no new scale ceiling; the content bytes of non-empty files still
stream through executors.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modificationTime", T.TimestampType(), True),
        T.StructField("length", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _empty_file_rows(spark: SparkSession, root: str, glob: str | None):
    """(path, mtime, 0, b"") for every zero-length file under root."""
    import datetime

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        if st.getLen() != 0:
            continue
        p = st.getPath()
        if glob and not fnmatch.fnmatch(p.getName(), glob):
            continue
        mtime = datetime.datetime.fromtimestamp(st.getModificationTime() / 1000.0)
        out.append((p.toString(), mtime, 0, b""))
    return out


def read_file_tree(
    spark: SparkSession, root: str, glob: str | None = None
) -> DataFrame:
    """Recursive (path, modificationTime, length, content) scan of a file
    tree, INCLUDING zero-byte files (binaryFile alone drops them — module
    docstring).  ``glob`` filters basenames (binaryFile's
    ``pathGlobFilter``, mirrored onto the empty-file listing with
    fnmatch)."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    nonempty = reader.load(root).select(
        "path", "modificationTime", "length", "content"
    )
    empties = _empty_file_rows(spark, root, glob)
    if not empties:
        return nonempty
    return nonempty.unionByName(
        spark.createDataFrame(empties, FILE_SCHEMA).withColumn(
            "content", F.col("content").cast("binary")
        )
    )

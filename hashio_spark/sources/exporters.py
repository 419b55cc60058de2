"""Manifest sinks with byte-parity to the reference's exporters.

* :func:`write_hash_json` — reproduces ``JSONExporter``
  (``/root/reference/lib/hashio/exporter.py:70-137``) byte-for-byte:
  ``{\\n`` header, one ``    "path": <json indent=8>,\\n`` entry per row,
  close-time fixup stripping the trailing ``,\\n`` and writing ``\\n}``.
* :func:`write_txt` — ``TXTExporter`` (``exporter.py:306-364``):
  ``"<hash> <path>"`` lines.
* :func:`read_hash_json` / :func:`read_txt` — the matching readers.

Scale note: these sinks exist for interoperability with the reference's
manifest files (small, per-partition or per-run).  They collect to the
driver deliberately — a 10^12-row manifest lives in the Iceberg manifest
table (``manifest_store``), not in a JSON file; the distributed path for
bulk output is ``df.write.json/parquet``.  ``to_manifest_rows`` is the
distributed formatter used by both.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_manifest_entries(df: DataFrame, key_col: str, algo: str, digest_col: str = "digest",
                        meta_cols: tuple[str, ...] = ()) -> list[tuple[str, dict]]:
    """Collect (key, entry-dict) pairs in deterministic key order.  The
    entry layout mirrors the reference manifest entry
    (``/root/reference/lib/hashio/exporter.py:111-133``): metadata fields
    plus one ``<algo>: <hexdigest>`` field."""
    cols = [F.col(key_col).cast("string").alias("_k"), F.col(digest_col).alias("_d")]
    cols += [F.col(c) for c in meta_cols]
    rows = df.select(*cols).orderBy("_k").collect()
    out = []
    for r in rows:
        entry = {c: r[c] for c in meta_cols}
        entry[algo] = r["_d"]
        out.append((r["_k"], entry))
    return out


def write_hash_json(df: DataFrame, path: str, key_col: str, algo: str,
                    digest_col: str = "digest", meta_cols: tuple[str, ...] = ()) -> None:
    """Write a reference-byte-compatible HASH.json manifest."""
    entries = to_manifest_entries(df, key_col, algo, digest_col, meta_cols)
    if not entries:
        # the trailing-comma fixup below would otherwise truncate the
        # "{\n" header and leave invalid JSON for an empty manifest
        with open(path, "w") as f:
            f.write("{\n}")
        return
    with open(path, "w") as f:
        f.write("{\n")
        for k, entry in entries:
            f.write('    "{0}": {1},\n'.format(k, json.dumps(entry, indent=8)))
    # close-time fixup (exporter.py:82-95): strip trailing ",\n", write "\n}"
    with open(path, "rb+") as f:
        import os

        f.seek(-2, os.SEEK_END)
        f.truncate()
    with open(path, "a+") as f:
        f.write("\n}")


def read_hash_json(path: str) -> dict:
    with open(path) as fp:
        return json.load(fp)


def write_txt(df: DataFrame, path: str, key_col: str, digest_col: str = "digest") -> None:
    """``"<hash> <path>"`` flat lines (TXTExporter.write, exporter.py:351-364)."""
    rows = df.select(F.col(digest_col).alias("_d"), F.col(key_col).cast("string").alias("_k")).orderBy("_k").collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['_d']} {r['_k']}\n")


def read_txt(path: str, algo: str) -> dict:
    """TXTExporter.read parity (exporter.py:321-345)."""
    result: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ", 1)
            if len(parts) == 2:
                checksum, key = parts
                result[key] = {algo: checksum}
    return result


def write_mhl(
    df: DataFrame, path: str, key_col: str, digest_col: str = "digest",
    algo: str = "md5", size_col: str | None = None, mtime_col: str | None = None,
    hashdate: int = 0,
) -> None:
    """MHL 1.1 hashlist export (``MHLExporter``,
    ``/root/reference/lib/hashio/exporter.py:184-303``): ``<hashlist
    version="1.1">`` with one ``<hash>`` element per row containing
    ``file``/``hashdate``/``<algo>``/optional ``size``/
    ``lastmodificationdate``.  stdlib ``xml.etree`` (lxml not required);
    ``hashdate`` is caller-supplied for determinism (the reference stamps
    now())."""
    import xml.etree.ElementTree as ET
    from datetime import datetime, timezone

    def ts(v: float) -> str:
        return datetime.fromtimestamp(int(v), tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")

    cols = [F.col(key_col).cast("string").alias("_k"), F.col(digest_col).alias("_d")]
    if size_col:
        cols.append(F.col(size_col).alias("_s"))
    if mtime_col:
        cols.append(F.col(mtime_col).alias("_m"))
    rows = df.select(*cols).orderBy("_k").collect()
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<hashlist version="1.1">\n')
        for r in rows:
            h = ET.Element("hash")
            if mtime_col:
                ET.SubElement(h, "lastmodificationdate").text = ts(r["_m"])
            if size_col:
                ET.SubElement(h, "size").text = str(r["_s"])
            ET.SubElement(h, algo).text = r["_d"]
            ET.SubElement(h, "hashdate").text = ts(hashdate)
            ET.SubElement(h, "file").text = r["_k"]
            ET.indent(h, space="  ")
            f.write(ET.tostring(h, encoding="unicode") + "\n")
        f.write("</hashlist>\n")


def read_mhl(path: str, algo: str = "md5") -> dict:
    """MHLExporter.read parity: path-keyed dict of hash entries."""
    import xml.etree.ElementTree as ET

    tree = ET.parse(path)
    out = {}
    for h in tree.getroot().findall("hash"):
        key = h.findtext("file")
        out[key] = {
            "hashdate": h.findtext("hashdate"),
            "lastmodificationdate": h.findtext("lastmodificationdate"),
            "size": int(h.findtext("size", default="0") or 0),
            "file": key,
            algo: h.findtext(algo, default=""),
        }
    return out


def txt_lines_df(df: DataFrame, key_col: str, digest_col: str = "digest") -> DataFrame:
    """Distributed TXT formatting — use ``.write.text(...)`` on the result
    for bulk export (the scale path; ordering is per-partition)."""
    return df.select(F.concat_ws(" ", F.col(digest_col), F.col(key_col).cast("string")).alias("value"))


# ---------------------------------------------------------------------------
# Exporter registry (reference S9: get_caching_class / extension dispatch,
# /root/reference/lib/hashio/exporter.py:367-397) — a new sink plugs in the
# same way a new digest algo does.
# ---------------------------------------------------------------------------

class ExporterRegistry:
    """Extension → (writer, reader) dispatch.

    ``writer(df, path, key_col, algo, digest_col)`` and
    ``reader(path, algo) -> dict``; registered like encoders so callers
    resolve a sink from the output filename alone."""

    def __init__(self) -> None:
        self._by_ext: dict[str, tuple] = {}

    def register(self, ext: str, writer, reader) -> None:
        self._by_ext[ext.lower().lstrip(".")] = (writer, reader)

    def for_path(self, path: str) -> tuple:
        ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
        if ext not in self._by_ext:
            raise ValueError(f"no exporter registered for extension: .{ext or '<none>'}")
        return self._by_ext[ext]

    def write(self, df: DataFrame, path: str, key_col: str, algo: str = "md5",
              digest_col: str = "digest") -> None:
        writer, _ = self.for_path(path)
        writer(df, path, key_col, algo, digest_col)

    def read(self, path: str, algo: str = "md5") -> dict:
        _, reader = self.for_path(path)
        return reader(path, algo)

    def extensions(self) -> tuple[str, ...]:
        return tuple(sorted(self._by_ext))


def _w_json(df, path, key_col, algo, digest_col):
    write_hash_json(df, path, key_col, algo, digest_col)


def _r_json(path, algo):
    return read_hash_json(path)


def _w_txt(df, path, key_col, algo, digest_col):
    write_txt(df, path, key_col, digest_col)


def _w_mhl(df, path, key_col, algo, digest_col):
    write_mhl(df, path, key_col, digest_col, algo)


EXPORTERS = ExporterRegistry()
EXPORTERS.register("json", _w_json, _r_json)
EXPORTERS.register("txt", _w_txt, read_txt)
EXPORTERS.register("mhl", _w_mhl, read_mhl)

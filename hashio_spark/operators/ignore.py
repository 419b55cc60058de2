"""Ignore filter: pattern-union exclusion predicate (reference S2).

The reference ships ~30 fnmatch ignore patterns, env-overridable, and
drops matching paths during the walk (``/root/reference/lib/hashio/
config.py:105-139``, ``utils.py:129-136``).  The Spark analog is a single
compiled regex-union predicate pushed into the scan filter: Catalyst
evaluates one ``RLIKE`` per row inside codegen, and — when the filtered
column is a partition column — prunes whole partitions before any I/O.

Patterns are fnmatch-style globs full-matched against ANY path segment
or, when they contain ``/``, a segment-aligned suffix of the full path
(see :func:`ignore_predicate` for the deliberate divergence from the
reference's raw suffix-search semantics).
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# well-known junk/system artifacts (the reference's default set covers the
# same families: VCS metadata, editor swap, OS thumbnail, bytecode caches)
DEFAULT_IGNORE_PATTERNS: tuple[str, ...] = (
    ".DS_Store",
    "Thumbs.db",
    "desktop.ini",
    ".git",
    ".git/*",
    ".svn",
    ".hg",
    "__pycache__",
    "*.pyc",
    "*.pyo",
    "*.swp",
    "*.swo",
    "*~",
    ".#*",
    "#*#",
    "*.tmp",
    "*.temp",
    "*.bak",
    "*.orig",
    "*.lock",
    ".cache",
    ".cache/*",
    ".Trash*",
    ".nfs*",
    "lost+found",
    "*.part",
    "*.crdownload",
    "._*",
    ".Spotlight-V100",
    ".fseventsd",
)

ENV_VAR = "HASHIO_SPARK_IGNORE"


def ignore_patterns() -> tuple[str, ...]:
    """Default patterns, overridable via ``HASHIO_SPARK_IGNORE`` (colon-
    separated), mirroring the reference's env-config override."""
    env = os.environ.get(ENV_VAR)
    if env:
        return tuple(p for p in env.split(":") if p)
    return DEFAULT_IGNORE_PATTERNS


def ignore_predicate(path_col: Column | str, patterns: tuple[str, ...] | None = None) -> Column:
    """TRUE for rows whose path matches any ignore pattern.

    Bare patterns full-match ANY path segment (so ``.git`` drops both the
    ``.git`` entry and everything under a ``.git/`` directory); patterns
    containing ``/`` match a path suffix aligned at a segment boundary.
    Compiled into two regex unions → two ``RLIKE`` ops per row regardless
    of pattern count.

    Anchoring: ``fnmatch.translate`` end-anchors only (``...\\Z``), while
    ``RLIKE`` uses unanchored find() semantics — without anchoring every
    pattern degrades to a raw suffix match.  Bare alternatives are
    anchored at segment boundaries on BOTH sides (start-of-string or
    after ``/``; before ``/`` or end), so ``.git`` never drops a
    legitimate file named ``foo.git`` (round-2 ADVICE) but does drop
    ``a/.git/config``; path alternatives anchor at start-of-string OR
    just after a ``/`` and keep translate's end anchor.

    DELIBERATE divergence from the reference: its ``is_ignorable``
    (``/root/reference/lib/hashio/utils.py:129-136``) does ``re.search``
    of end-anchored patterns over the FULL path — raw suffix-match
    semantics under which ``.git`` also drops ``foo.git`` and ``.cache``
    drops ``a.cache``.  Segment-boundary matching keeps the part users
    rely on (whole ignored directories, via the dotall ``.*`` in globs
    like ``venv*`` consuming the rest of the path) while not inheriting
    those accidental substring hits.
    """
    pats = patterns if patterns is not None else ignore_patterns()
    c = F.col(path_col) if isinstance(path_col, str) else path_col

    def body(r: str) -> str:
        # fnmatch.translate emits '(?s:...)\Z'; strip the end anchor so
        # the alternative can compose with our own boundary anchors
        return r[:-2] if r.endswith("\\Z") else r

    base_regexes = [fnmatch.translate(p) for p in pats if "/" not in p]
    full_regexes = [fnmatch.translate(p) for p in pats if "/" in p]
    pred = F.lit(False)
    if base_regexes:
        union = "|".join(f"(?:(?:\\A|(?<=/)){body(r)}(?=/|\\z))" for r in base_regexes)
        pred = pred | c.rlike(union)
    if full_regexes:
        union = "|".join(f"(?:(?:\\A|(?<=/)){r})" for r in full_regexes)
        pred = pred | c.rlike(union)
    return pred


def apply_ignore(df: DataFrame, path_col: str = "path", patterns: tuple[str, ...] | None = None) -> DataFrame:
    """Drop ignored rows (the scan-side exclusion filter)."""
    return df.filter(~ignore_predicate(path_col, patterns))


def subpath_predicate(path_col: Column | str, parent: str) -> Column:
    """TRUE for rows whose path lies under ``parent`` (reference
    ``is_subpath``, ``/root/reference/lib/hashio/utils.py:139-149``).

    Normalizes the parent to a trailing ``/`` so ``/a/bc`` is NOT under
    ``/a/b``; equality with the parent itself also matches.  A prefix
    predicate like this pushes down to partition pruning when the path
    column is (or prefixes) a partition key.
    """
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    p = parent.rstrip("/")
    return c.startswith(p + "/") | (c == p)

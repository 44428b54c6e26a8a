"""File-based table CATALOG over the versioned tables: names, tags,
branches, and ref-pinned retention — the Iceberg-catalog contract on
plain files (the sandbox has no external catalog service; SURVEY §1.4).

Layout under a catalog root:

    root/tables/<name>/           one vtable (data/ + versions/, see
                                  operators/vtable.py — _SUCCESS commit
                                  markers make torn creates invisible)
    root/refs/<name>/tag.<t>      IMMUTABLE named pointer to a version
    root/refs/<name>/branch.<b>   MUTABLE named pointer (CAS-updated)

Semantics (mirroring Iceberg refs):
- A TABLE exists iff it has >= 1 committed snapshot — a crash between
  directory creation and the first commit leaves nothing visible.
- TAGS are immutable: created with O_CREAT|O_EXCL (atomic on POSIX), so
  two racers cannot both win, and re-tagging refuses. They may be
  dropped, never moved.
- BRANCHES move by compare-and-set: the caller states the version it
  believes the branch is at (``expect``); a short O_EXCL lock file makes
  the read-check-replace atomic between cooperating writers. A crashed
  holder leaves a stale lock — ``break_branch_lock`` is the explicit,
  human-invoked recovery (never automatic: auto-stealing would turn a
  slow writer into a lost update).
- RETENTION respects refs: ``expire_table_snapshots`` REFUSES to expire
  any version a tag or branch still points at — a ref is a promise that
  time travel to it keeps working. Drop the ref first.

Everything here is tiny driver-side metadata (one short text file per
ref); the data path stays the vtable machinery — reads by
name/tag/branch resolve to a version and go through the snapshot-pinned
zone-map read, so they inherit file skipping and snapshot isolation.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from . import vtable as V

__all__ = [
    "break_branch_lock",
    "create_catalog_table",
    "create_tag",
    "drop_ref",
    "drop_table",
    "expire_table_snapshots",
    "list_refs",
    "list_tables",
    "load_table",
    "resolve_ref",
    "set_branch",
    "table_path",
]

_SAFE = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-.")


def _check_name(name: str, what: str) -> str:
    if not name or set(name) - _SAFE or name.startswith("."):
        raise ValueError(f"{what} {name!r}: use [A-Za-z0-9_.-], no leading dot")
    return name


def table_path(root: str, name: str) -> str:
    return f"{root}/tables/{_check_name(name, 'table')}"


def _refdir(root: str, name: str) -> str:
    return f"{root}/refs/{name}"


def _reffile(root: str, name: str, kind: str, ref: str) -> str:
    return os.path.join(_refdir(root, name),
                        f"{kind}.{_check_name(ref, kind)}")


def list_tables(root: str) -> list[str]:
    """Names with at least one COMMITTED snapshot (torn creates and bare
    directories are invisible, the vtable commit-marker rule)."""
    td = f"{root}/tables"
    if not os.path.isdir(td):
        return []
    return sorted(n for n in os.listdir(td)
                  if V.list_versions(os.path.join(td, n)))


def create_catalog_table(
    df: DataFrame,
    root: str,
    name: str,
    stat_cols: tuple[str, ...],
    sum_cols: tuple[str, ...] = (),
    n_files: int = 8,
) -> str:
    """CREATE TABLE <name>: snapshot 0 via vtable.create_table. Returns
    the table path. Refuses a name that already has committed state."""
    path = table_path(root, name)
    V.create_table(df, path, stat_cols, sum_cols=sum_cols, n_files=n_files)
    return path


def drop_table(root: str, name: str) -> None:
    """DROP TABLE: removes data, manifests, and every ref. Refuses an
    unknown name (a silent no-op would mask typos in an irreversible op)."""
    path = table_path(root, name)
    if not V.list_versions(path):
        raise ValueError(f"drop_table: no committed table {name!r}")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(_refdir(root, name), ignore_errors=True)


def list_refs(root: str, name: str) -> dict[str, int]:
    """{'tag.<t>' | 'branch.<b>': version} for one table."""
    rd = _refdir(root, name)
    if not os.path.isdir(rd):
        return {}
    out = {}
    for f in sorted(os.listdir(rd)):
        if f.startswith(("tag.", "branch.")) and not f.endswith(".lock"):
            with open(os.path.join(rd, f)) as fh:
                out[f] = int(fh.read().strip())
    return out


def _committed_version(root: str, name: str, version: int | None) -> int:
    path = table_path(root, name)
    vs = V.list_versions(path)
    if not vs:
        raise ValueError(f"no committed table {name!r} at {root}")
    if version is None:
        return vs[-1]
    if version not in vs:
        raise ValueError(f"{name!r} has no committed version {version} "
                         f"(have {vs})")
    return version


def create_tag(root: str, name: str, tag: str,
               version: int | None = None) -> int:
    """Immutable ref: pin ``version`` (default: current) under a name.
    O_CREAT|O_EXCL makes creation atomic — re-tagging or racing refuses."""
    v = _committed_version(root, name, version)
    os.makedirs(_refdir(root, name), exist_ok=True)
    target = _reffile(root, name, "tag", tag)
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        raise ValueError(
            f"tag {tag!r} already exists on {name!r} — tags are immutable; "
            "drop_ref first if you really mean to move it") from None
    with os.fdopen(fd, "w") as fh:
        fh.write(str(v))
        fh.flush()
        os.fsync(fh.fileno())
    return v


def set_branch(root: str, name: str, branch: str, version: int | None = None,
               expect: int | None = None) -> int:
    """Move (or create) a mutable ref by COMPARE-AND-SET: ``expect`` is
    the version the caller believes the branch is at (None = 'I am
    creating it'). A lock file (O_EXCL) serializes the read-check-replace
    against cooperating writers; a mismatched expectation refuses — the
    caller lost a race and must re-read before retrying."""
    v = _committed_version(root, name, version)
    os.makedirs(_refdir(root, name), exist_ok=True)
    target = _reffile(root, name, "branch", branch)
    lock = target + ".lock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        raise ValueError(
            f"branch {branch!r} on {name!r} is locked by another writer "
            "(stale after a crash? break_branch_lock)") from None
    try:
        os.close(fd)
        cur = None
        if os.path.exists(target):
            with open(target) as fh:
                cur = int(fh.read().strip())
        if cur != expect:
            raise ValueError(
                f"set_branch CAS failed on {name!r}/{branch!r}: expected "
                f"{expect}, found {cur} — re-read and retry")
        tmp = target + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, target)
        return v
    finally:
        os.unlink(lock)


def break_branch_lock(root: str, name: str, branch: str) -> bool:
    """Explicit recovery for a lock left by a crashed writer. Never
    called automatically. Returns whether a lock existed."""
    lock = _reffile(root, name, "branch", branch) + ".lock"
    if os.path.exists(lock):
        os.unlink(lock)
        return True
    return False


def drop_ref(root: str, name: str, ref: str) -> None:
    """Remove a tag or branch by its full ref name ('tag.x' /
    'branch.y'). Refuses unknown refs."""
    kind, _, short = ref.partition(".")
    if kind not in ("tag", "branch") or not short:
        raise ValueError(f"drop_ref: {ref!r} is not 'tag.<t>' or 'branch.<b>'")
    target = _reffile(root, name, kind, short)
    if not os.path.exists(target):
        raise ValueError(f"drop_ref: no ref {ref!r} on {name!r}")
    os.unlink(target)


def resolve_ref(root: str, name: str, ref: str | int | None) -> int:
    """version | 'tag.<t>' | 'branch.<b>' | None (current) -> version.
    Resolution re-validates that the pinned version is still committed
    (an expired-under-a-ref state can only arise from external deletion;
    refuse rather than silently read something else)."""
    if ref is None or isinstance(ref, int):
        return _committed_version(root, name, ref)
    refs = list_refs(root, name)
    if ref not in refs:
        raise ValueError(f"{name!r} has no ref {ref!r} (have {sorted(refs)})")
    return _committed_version(root, name, refs[ref])


def load_table(spark: SparkSession, root: str, name: str,
               ref: str | int | None = None) -> DataFrame:
    """SELECT * FROM <name> [FOR VERSION AS OF ...]: read the snapshot a
    version/tag/branch resolves to, through the zone-map-pinned read."""
    return V.read_table(spark, table_path(root, name),
                        resolve_ref(root, name, ref))


def expire_table_snapshots(spark: SparkSession, root: str, name: str,
                           keep_from_version: int) -> dict:
    """vtable.expire_snapshots with the REF GUARD: refuses while any
    tag/branch points below ``keep_from_version`` — refs are promises
    that time travel keeps working; drop them first."""
    pinned = {r: v for r, v in list_refs(root, name).items()
              if v < keep_from_version}
    if pinned:
        raise ValueError(
            f"expire_table_snapshots: refs still pin older versions of "
            f"{name!r}: {pinned} — drop_ref them first")
    return V.expire_snapshots(spark, table_path(root, name),
                              keep_from_version)

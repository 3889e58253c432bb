"""Atomic directory commit — the snapshot-swap primitive shared by
compaction and MERGE (the plain-parquet stand-in for an Iceberg snapshot
commit: readers see the whole old table or the whole new one, never a mix).

Protocol: build the complete new table in ``<dir>.<suffix>_tmp`` (hardlinks
for unchanged files — no data copy), then
    1. rename <dir>      -> <dir>.<suffix>_bak
    2. rename tmp        -> <dir>
    3. rmtree bak
A failure of (2) rolls (1) back in-process. A hard crash between (1) and
(2) leaves <dir> absent but the bak complete; :func:`recover` (called by
every writer on entry) renames it back. A crash after (2) leaves a stale
bak that :func:`recover` garbage-collects. In both cases the table stays
readable with exactly one committed snapshot.
"""

from __future__ import annotations

import os
import shutil


def _bak(data_dir: str, suffix: str) -> str:
    return data_dir.rstrip("/") + f".{suffix}_bak"


def recover(data_dir: str, suffix: str) -> bool:
    """Repair an interrupted swap. Returns True if a rollback happened."""
    bak = _bak(data_dir, suffix)
    if not os.path.exists(bak):
        return False
    if not os.path.exists(data_dir):
        # crashed between rename(dir->bak) and rename(tmp->dir): roll back
        os.rename(bak, data_dir)
        return True
    # crashed after the new dir was committed: the bak is garbage
    shutil.rmtree(bak)
    return False


def swap(data_dir: str, tmp_dir: str, suffix: str) -> None:
    """Commit ``tmp_dir`` as the new content of ``data_dir`` (see module
    docstring for the crash matrix)."""
    bak = _bak(data_dir, suffix)
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(data_dir, bak)
    try:
        os.rename(tmp_dir, data_dir)
    except BaseException:
        os.rename(bak, data_dir)  # roll back: the original stays committed
        raise
    shutil.rmtree(bak)


def link_tree(src: str, dst: str) -> None:
    """Copy a file/dir into dst by hardlink (zero data copy, bit-identical
    inodes — unchanged content keeps its exact bytes AND mtime)."""
    if os.path.isdir(src):
        shutil.copytree(src, dst, copy_function=os.link)
    else:
        os.link(src, dst)

"""Single-writer file locks for snapshot read-modify-write sections.

The emulated-Iceberg tables commit via ``os.replace`` of a snapshot
file, which makes each WRITE atomic but not the read→modify→write
SECTION: two concurrent writers both read the same snapshot and the
loser's update is silently dropped (lost update).  An O_EXCL lock file
serializes the section; a hard-killed holder's lock is broken by age
via an atomic RENAME claim, so exactly one of several concurrent
breakers wins (remove+create has a TOCTOU admitting two).

A lock older than the TTL whose holder is genuinely still alive is the
documented operational limit of file locks — set ``ttl_sec`` above the
worst-case section time.  On Iceberg proper the catalog's atomic
metadata-pointer swap replaces this module.
"""

from __future__ import annotations

import os
import time
import uuid


def try_acquire(lock_path: str, ttl_sec: float = 3600.0) -> bool:
    """Try to take the lock; break-by-age a stale one.  Returns False
    when the lock is live and held by someone else."""

    def _open() -> bool:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.write(fd, f"{os.getpid()} {time.time()}".encode())
        os.close(fd)
        return True

    if _open():
        return True
    try:
        stale = time.time() - os.path.getmtime(lock_path) > ttl_sec
    except FileNotFoundError:
        stale = False  # holder just released it: treat as contended
    if not stale:
        return False
    claim = lock_path + f".broken-{uuid.uuid4().hex[:8]}"
    try:
        os.rename(lock_path, claim)
    except FileNotFoundError:  # lost the claim race
        return False
    try:
        os.remove(claim)
    except FileNotFoundError:
        pass
    return _open()


def release(lock_path: str) -> None:
    try:
        os.remove(lock_path)
    except FileNotFoundError:
        pass

"""Single-writer file locks for snapshot read-modify-write sections.

The emulated-Iceberg tables commit via ``os.replace`` of a snapshot
file, which makes each WRITE atomic but not the read→modify→write
SECTION: two concurrent writers both read the same snapshot and the
loser's update is silently dropped (lost update).  An O_EXCL lock file
serializes the section; a hard-killed holder's lock is broken by age
via an atomic RENAME claim, so exactly one of several concurrent
breakers wins (remove+create has a TOCTOU admitting two).

Ownership tokens NARROW the break-races-release hole (review r4): a
slow-but-alive holder whose lock was broken by TTL must not delete the
NEW holder's lock in its cleanup — ``release`` unlinks only when the
file still carries the caller's own token, so the stale holder's
release becomes a no-op in every realistic interleaving.  The residual
window is the non-atomic read→unlink inside ``release`` itself (a
break + re-acquire landing between the two); closing it needs an
atomic compare-and-delete the filesystem doesn't offer — on Iceberg
proper the catalog swap makes the whole module moot.

A lock older than the TTL whose holder is genuinely still alive is the
documented operational limit of file locks — set ``ttl_sec`` above the
worst-case section time.  On Iceberg proper the catalog's atomic
metadata-pointer swap replaces this module.
"""

from __future__ import annotations

import os
import time
import uuid


def try_acquire(lock_path: str, ttl_sec: float = 3600.0) -> str | None:
    """Try to take the lock; break-by-age a stale one.  Returns the
    ownership token on success (pass it to ``release``), None when the
    lock is live and held by someone else."""

    def _open() -> str | None:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None
        token = f"{os.getpid()}-{uuid.uuid4().hex}"
        os.write(fd, token.encode())
        os.close(fd)
        return token

    token = _open()
    if token is not None:
        return token
    try:
        stale = time.time() - os.path.getmtime(lock_path) > ttl_sec
    except FileNotFoundError:
        stale = False  # holder just released it: treat as contended
    if not stale:
        return None
    claim = lock_path + f".broken-{uuid.uuid4().hex[:8]}"
    try:
        os.rename(lock_path, claim)
    except FileNotFoundError:  # lost the claim race
        return None
    try:
        os.remove(claim)
    except FileNotFoundError:
        pass
    return _open()


def release(lock_path: str, token: str) -> None:
    """Unlink the lock only if it is still OURS: after a break-by-age,
    the original holder's release must not remove the new holder's
    lock."""
    try:
        with open(lock_path, "rb") as f:
            if f.read().decode("utf-8", "replace") != token:
                return  # broken and re-acquired by someone else
    except OSError:
        return
    try:
        os.remove(lock_path)
    except FileNotFoundError:
        pass


def start_heartbeat(lock_path: str, token: str, interval_sec: float) -> "callable":
    """Keep a held lock visibly alive: a daemon thread refreshes the
    lock file's mtime every ``interval_sec`` while the critical section
    runs, so break-by-age (``try_acquire``'s TTL) only ever fires on a
    holder that is actually DEAD — not on a live holder whose section
    ran long (review r5: a 30 s TTL without refresh let a waiting
    writer break a live 40 s merge and lose its update).  Each beat
    verifies ownership and touches through one fd, so a break +
    re-acquire landing mid-beat can only ever refresh the renamed-away
    OLD inode — never the new holder's lock.

    Returns a zero-argument ``stop()``; call it in the ``finally``
    block before ``release``."""
    import threading

    stop_event = threading.Event()

    def beat() -> None:
        misses = 0
        while not stop_event.wait(interval_sec):
            try:
                # verify ownership and touch through the SAME fd
                # (ADVICE r5: a path-based check-then-utime pair is not
                # atomic — a break + re-acquire between them would have
                # the old holder refresh the NEW holder's lease).  A
                # TTL break renames the path away, so this fd keeps
                # pointing at the OLD inode: if the token matches, the
                # utime lands on a file that is still ours by identity,
                # never on a successor that reused the path.
                fd = os.open(lock_path, os.O_RDONLY)
                try:
                    if os.read(fd, 256).decode("utf-8", "replace") != token:
                        return  # no longer ours — stop touching it
                    os.utime(fd)
                finally:
                    os.close(fd)
                misses = 0
            except OSError:
                # transient failure (utime hiccup, momentary EACCES)
                # must not silently disable the lease protection
                # (review r5); only give up after several consecutive
                # misses — by then the lock is likely genuinely gone
                misses += 1
                if misses >= 3:
                    return

    t = threading.Thread(target=beat, name="lock-heartbeat", daemon=True)
    t.start()

    def stop() -> None:
        stop_event.set()
        t.join(timeout=interval_sec + 1.0)

    return stop

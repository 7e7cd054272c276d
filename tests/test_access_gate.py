"""Access-gate operator tests (check_auth decision table, app.py:163-194)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def session():
    from ocr_api_spark.plans.session import build_session

    return build_session(app_name="access-tests", master="local[2]", shuffle_partitions=2)


def test_access_decision_table(session):
    from ocr_api_spark.operators.access import admitted, credit_decrements, with_access

    requests = session.createDataFrame(
        [
            ("r1", "c_ok", "pan"),
            ("r2", "c_noflag", "pan"),
            ("r3", "c_negcred_allowed", "pan"),
            ("r4", "c_negcred_denied", "pan"),
            ("r5", "c_missing", "pan"),
        ],
        "req_id string, company string, doc_type string",
    )
    accounts = session.createDataFrame(
        [
            ("c_ok", 1, 10, 0),
            ("c_noflag", 0, 10, 0),
            ("c_negcred_allowed", 1, -5, 1),
            ("c_negcred_denied", 1, -5, 0),
        ],
        "company string, access_flag int, credits_left int, is_negative_credit_allowed int",
    )
    out = {r["req_id"]: r for r in with_access(requests, accounts).collect()}
    assert out["r1"]["access_granted"] and out["r1"]["access_reason"] == " access granted"
    assert not out["r2"]["access_granted"] and out["r2"]["access_reason"] == " pan not provided "
    assert out["r3"]["access_granted"]
    assert not out["r4"]["access_granted"] and out["r4"]["access_reason"] == "credit not avilable"
    assert not out["r5"]["access_granted"] and out["r5"]["access_reason"] == "unauthorized access"

    adm = admitted(requests, accounts)
    assert {r["req_id"] for r in adm.collect()} == {"r1", "r3"}
    dec = {r["company"]: r["credits_used"] for r in credit_decrements(adm).collect()}
    assert dec == {"c_ok": 1, "c_negcred_allowed": 1}


def test_credits_merge_stream_negative_policy(session, tmp_path):
    """End-to-end J5 MERGE (foreachBatch upsert into the accounts table)
    with the reference's negative-credit policy: a company that goes
    negative stops consuming unless is_negative_credit_allowed=1
    (app.py:163-194 + 2251-2256)."""
    import pandas as pd

    from ocr_api_spark.streaming.stream import run_credits_merge_stream

    accounts_path = str(tmp_path / "accounts.parquet")
    pd.DataFrame(
        {
            "company": ["c1", "c2", "c3"],
            "access_flag": [1, 1, 0],
            "credits_left": [2, 1, 7],
            "is_negative_credit_allowed": [0, 1, 0],
        }
    ).to_parquet(accounts_path, index=False)

    claims_dir = tmp_path / "claims_stream"
    claims_dir.mkdir()
    batch = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(5)],
            "company": ["c1", "c1", "c2", "c2", "c3"],
            "doc_type": ["pan"] * 5,
        }
    )
    # three identical micro-batches (maxFilesPerTrigger=1): the expected
    # balances are order-independent by construction
    for i in range(3):
        batch.to_parquet(str(claims_dir / f"b{i}.parquet"), index=False)

    run_credits_merge_stream(session, str(claims_dir), accounts_path, str(tmp_path / "ckpt"))

    final = {
        r["company"]: r["credits_left"]
        for r in session.read.parquet(accounts_path).collect()
    }
    # c1: 2 -> 0 -> -2 -> DENIED (negative, not allowed) -> stays -2
    assert final["c1"] == -2
    # c2: negative allowed, keeps consuming: 1 -> -1 -> -3 -> -5
    assert final["c2"] == -5
    # c3: access flag 0, never admitted
    assert final["c3"] == 7


def test_credits_merge_batch_replay_is_idempotent(session, tmp_path):
    """foreachBatch is at-least-once: replaying the same batch_id after a
    crash must not double-decrement (the applied batch id travels inside
    the accounts snapshot)."""
    import pandas as pd

    from ocr_api_spark.streaming.stream import merge_credits_batch

    accounts_path = str(tmp_path / "accounts.parquet")
    pd.DataFrame(
        {
            "company": ["c1"],
            "access_flag": [1],
            "credits_left": [10],
            "is_negative_credit_allowed": [0],
        }
    ).to_parquet(accounts_path, index=False)
    batch = session.createDataFrame(
        [("u1", "c1", "pan"), ("u2", "c1", "pan")], "url string, company string, doc_type string"
    )
    assert merge_credits_batch(session, accounts_path, batch, batch_id=0) is True
    assert merge_credits_batch(session, accounts_path, batch, batch_id=0) is False  # replay: no-op
    row = session.read.parquet(accounts_path).collect()[0]
    assert row["credits_left"] == 8  # decremented exactly once
    assert merge_credits_batch(session, accounts_path, batch, batch_id=1) is True
    assert session.read.parquet(accounts_path).collect()[0]["credits_left"] == 6

    # ADVICE r2: a recreated checkpoint restarts batch ids at 0 under a
    # NEW run id — that batch is genuinely new work, not a replay ...
    assert merge_credits_batch(session, accounts_path, batch, batch_id=0, run_id="ckpt2") is True
    assert session.read.parquet(accounts_path).collect()[0]["credits_left"] == 4
    # ... while a replay within EITHER stream still dedupes
    assert merge_credits_batch(session, accounts_path, batch, batch_id=0, run_id="ckpt2") is False
    assert merge_credits_batch(session, accounts_path, batch, batch_id=1) is False
    assert session.read.parquet(accounts_path).collect()[0]["credits_left"] == 4


def test_credits_merge_upgrades_legacy_watermark(session, tmp_path):
    """Snapshots written by the round-2 code carried a single
    __last_batch_id column; it is adopted as the 'default' run's
    watermark so replays across the upgrade stay no-ops."""
    import pandas as pd

    from ocr_api_spark.streaming.stream import merge_credits_batch

    accounts_path = str(tmp_path / "accounts.parquet")
    pd.DataFrame(
        {
            "company": ["c1"],
            "access_flag": [1],
            "credits_left": [10],
            "is_negative_credit_allowed": [0],
            "__last_batch_id": [3],
        }
    ).to_parquet(accounts_path, index=False)
    batch = session.createDataFrame(
        [("u1", "c1", "pan")], "url string, company string, doc_type string"
    )
    assert merge_credits_batch(session, accounts_path, batch, batch_id=3) is False
    assert merge_credits_batch(session, accounts_path, batch, batch_id=4) is True
    after = session.read.parquet(accounts_path)
    assert "__last_batch_id" not in after.columns  # migrated to the map
    assert after.collect()[0]["credits_left"] == 9


def test_credits_merge_concurrent_runs_interleaved(session, tmp_path):
    """Two live streams (distinct run_ids) merging into the same
    accounts table, each with a replay injected mid-flight: per-run
    watermarks must not cross-suppress each other's genuinely new
    batches, and each replay must stay a no-op (VERDICT r3 task 8)."""
    import pandas as pd

    from ocr_api_spark.streaming.stream import merge_credits_batch

    accounts_path = str(tmp_path / "accounts.parquet")
    pd.DataFrame(
        {
            "company": ["c1"],
            "access_flag": [1],
            "credits_left": [20],
            "is_negative_credit_allowed": [0],
        }
    ).to_parquet(accounts_path, index=False)
    batch = session.createDataFrame(
        [("u1", "c1", "pan")], "url string, company string, doc_type string"
    )

    def bal():
        return session.read.parquet(accounts_path).collect()[0]["credits_left"]

    assert merge_credits_batch(session, accounts_path, batch, 0, run_id="a") is True
    assert merge_credits_batch(session, accounts_path, batch, 0, run_id="b") is True  # not suppressed by a's watermark
    assert bal() == 18
    assert merge_credits_batch(session, accounts_path, batch, 0, run_id="a") is False  # a's replay
    assert merge_credits_batch(session, accounts_path, batch, 1, run_id="a") is True
    assert merge_credits_batch(session, accounts_path, batch, 0, run_id="b") is False  # b's replay
    assert merge_credits_batch(session, accounts_path, batch, 1, run_id="b") is True
    assert bal() == 16
    # neither run's progress leaked into the other's watermark
    assert merge_credits_batch(session, accounts_path, batch, 2, run_id="a") is True
    assert merge_credits_batch(session, accounts_path, batch, 2, run_id="b") is True
    assert bal() == 14


def test_credits_merge_lock_serializes_writers(session, tmp_path, monkeypatch):
    """ADVICE r3: the read->decrement->replace section holds an O_EXCL
    lock; a live contender WAITS with bounded backoff (an exception
    from foreachBatch would kill the streaming query) and only raises
    when the wait is exhausted; a stale lock from a hard-killed holder
    is broken by age."""
    import os

    import pandas as pd
    import pytest

    from ocr_api_spark import streaming
    from ocr_api_spark.streaming.stream import merge_credits_batch

    monkeypatch.setattr(streaming.stream, "_MERGE_LOCK_ATTEMPTS", 3)
    monkeypatch.setattr(streaming.stream, "_MERGE_LOCK_WAIT_SEC", 0.05)

    accounts_path = str(tmp_path / "accounts.parquet")
    pd.DataFrame(
        {
            "company": ["c1"],
            "access_flag": [1],
            "credits_left": [10],
            "is_negative_credit_allowed": [0],
        }
    ).to_parquet(accounts_path, index=False)
    batch = session.createDataFrame(
        [("u1", "c1", "pan")], "url string, company string, doc_type string"
    )

    lock_path = accounts_path + ".merge.lock"
    with open(lock_path, "w") as f:
        f.write("123 0")
    with pytest.raises(BlockingIOError):
        merge_credits_batch(session, accounts_path, batch, 0)
    assert session.read.parquet(accounts_path).collect()[0]["credits_left"] == 10

    # stale holder (mtime past the TTL) is broken and the merge proceeds
    os.utime(lock_path, (0, 0))
    assert merge_credits_batch(session, accounts_path, batch, 0) is True
    assert session.read.parquet(accounts_path).collect()[0]["credits_left"] == 9
    assert not os.path.exists(lock_path)  # released on the way out


def test_lock_release_checks_ownership(tmp_path):
    """Review r4: a slow holder whose lock was broken by age must not
    delete the NEW holder's lock on its way out — release is a no-op
    unless the file still carries the caller's own token."""
    import os

    from ocr_api_spark.plans import locks

    lock = str(tmp_path / "x.lock")
    old_token = locks.try_acquire(lock)
    assert old_token is not None
    os.utime(lock, (0, 0))  # holder stalls past the TTL
    new_token = locks.try_acquire(lock, ttl_sec=1.0)  # breaker wins
    assert new_token is not None and new_token != old_token
    locks.release(lock, old_token)  # stale holder's cleanup: no-op
    assert os.path.exists(lock)
    locks.release(lock, new_token)  # real owner releases
    assert not os.path.exists(lock)


def test_heartbeat_protects_live_holder(tmp_path):
    """Review r5: a short break-by-age TTL must not let a waiter break a
    LIVE holder mid-section — the heartbeat refreshes the lock's mtime,
    so age only accumulates on a dead holder."""
    import os
    import time

    from ocr_api_spark.plans import locks

    lock = str(tmp_path / "hb.lock")
    # interval-to-TTL margin of 20x: a multi-second host scheduling
    # burst (documented ambient on this box) must not flake the test
    token = locks.try_acquire(lock, ttl_sec=4.0)
    assert token is not None
    stop = locks.start_heartbeat(lock, token, interval_sec=0.2)
    try:
        time.sleep(6.0)  # well past the TTL: without the heartbeat,
        # the second acquire below would break the lock by age
        assert locks.try_acquire(lock, ttl_sec=4.0) is None
        assert os.path.exists(lock)
    finally:
        stop()
        locks.release(lock, token)
    # once released (holder done), the lock is free again
    t2 = locks.try_acquire(lock, ttl_sec=4.0)
    assert t2 is not None
    locks.release(lock, t2)


def test_heartbeat_stops_touching_after_break(tmp_path):
    """A stale holder's heartbeat must not refresh the NEW holder's
    lock after a break: the thread re-checks the ownership token."""
    import time

    from ocr_api_spark.plans import locks

    lock = str(tmp_path / "hb2.lock")
    token = locks.try_acquire(lock, ttl_sec=3600)
    stop = locks.start_heartbeat(lock, token, interval_sec=0.1)
    # simulate a crash-recovery break: new holder replaces the file
    import os

    os.remove(lock)
    t2 = locks.try_acquire(lock, ttl_sec=3600)
    assert t2 is not None
    mtime = os.path.getmtime(lock)
    time.sleep(0.8)  # several beat intervals
    assert os.path.getmtime(lock) == mtime  # old heartbeat left it alone
    stop()
    locks.release(lock, t2)

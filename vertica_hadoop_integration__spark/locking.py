"""Filesystem mutual exclusion for driver-side state (job runs, ledger
snapshots). Reference: ``JobLock`` (sqoop_etl.py:29,92-94,104).

Protocol notes:

* The lock file is created with its owner pid ALREADY WRITTEN by
  hardlinking a fully-written temp file into place (``os.link`` fails
  with EEXIST if the lock exists) — there is never a moment where the
  lock file exists but is empty, so stale-detection can always read a
  pid.
* Stale reclaim: if the recorded pid is dead, the claimant atomically
  ``os.rename``s the lock file aside before deleting it — rename is
  atomic, so exactly one of several concurrent claimants wins and the
  window where two processes both "reclaim and acquire" is closed.
* This targets a single driver host (the reference's model: one cron
  box). Multi-driver deployments should scope one driver per
  ledger/job, or swap this class for a distributed lock.
"""

from __future__ import annotations

import os
import time
import uuid


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        # exists but owned by another user
        return True


class FileLock:
    """O_EXCL-style file lock with pid stamping and dead-owner reclaim."""

    def __init__(self, path: str):
        self._path = path
        self._held = False
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    @property
    def path(self) -> str:
        return self._path

    def acquire(self, blocking: bool = False, timeout: float = 60.0) -> bool:
        """Try to take the lock. Non-blocking by default (the reference
        exits when the lock is held, sqoop_etl.py:92-94); pass
        ``blocking=True`` to spin until ``timeout`` seconds."""
        deadline = time.monotonic() + timeout
        while True:
            if self._try_acquire():
                return True
            if self._reclaim_if_stale():
                continue
            if not blocking or time.monotonic() >= deadline:
                return False
            time.sleep(0.05)

    def _try_acquire(self) -> bool:
        tmp = f"{self._path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(str(os.getpid()))
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._path)  # atomic create-with-content
            self._held = True
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _reclaim_if_stale(self) -> bool:
        """Remove the lock if its owner pid is dead. Returns True when the
        caller should retry acquisition immediately."""
        try:
            with open(self._path) as f:
                pid = int(f.read().strip() or "0")
        except FileNotFoundError:
            return True  # released between our attempts
        except ValueError:
            pid = 0
        if pid > 0 and _pid_alive(pid):
            return False
        # atomically claim the stale file: exactly one renamer succeeds
        claim = f"{self._path}.stale-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        try:
            os.rename(self._path, claim)
        except FileNotFoundError:
            return True  # another claimant won
        os.unlink(claim)
        return True

    def release(self) -> None:
        if self._held:
            self._held = False
            try:
                os.remove(self._path)
            except FileNotFoundError:
                pass

    def __enter__(self) -> "FileLock":
        if not self.acquire(blocking=True):
            raise TimeoutError(f"could not acquire lock {self._path}")
        return self

    def __exit__(self, *exc) -> None:
        self.release()

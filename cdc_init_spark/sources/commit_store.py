"""CommitStore — the put-if-absent primitive DeltaLogFormat commits
through (VERDICT r6 "Next round" item 5).

The entire correctness of an optimistic-concurrency table format hangs
on ONE storage operation: atomically create `_log/{version}.json` iff no
object with that name exists, so exactly one of N racing writers owns
each version. Everything else (data files, checkpoints, the `_last_
checkpoint` pointer) tolerates last-writer-wins. Naming that operation
as a seam keeps the format honest about its storage assumptions — the
100 TB deployment story is "bind CommitStore to your object store's
conditional put", not "hope the filesystem is POSIX":

- **Local / NFS / HDFS** — ``LocalCommitStore``: ``os.link`` from a
  fully-fsynced temp file (hard-link creation is atomic and fails with
  EEXIST when the target exists; POSIX semantics, also what HDFS-style
  ``create(overwrite=false)`` gives).
- **S3** — ``PutObject`` with ``If-None-Match: *`` (conditional writes,
  GA since 2024); before that, Delta used a DynamoDB-backed LogStore to
  serialize the same decision. One HTTP call implements
  ``put_if_absent``.
- **GCS** — upload with ``x-goog-if-generation-match: 0`` (object
  generation 0 = "does not exist yet").
- **Azure Blob** — ``Put Blob`` with ``If-None-Match: *``.

Contract (pinned by tests/test_delta_log_stress.py, runnable against
any implementation):
1. For a given name, across ALL concurrent callers — threads OR
   processes — exactly one ``put_if_absent`` returns True.
2. After the winner returns, every reader sees the winner's COMPLETE
   payload (no torn/partial reads, no loser bytes).
3. Losers return False and leave no trace under the final name.
"""

from __future__ import annotations

import os
import uuid
from abc import ABC, abstractmethod


class CommitStore(ABC):
    """Atomic put-if-absent of a finished payload under a final name."""

    @abstractmethod
    def put_if_absent(self, path: str, payload: bytes) -> bool:
        """Create ``path`` with ``payload`` iff it does not exist.
        Returns True when this caller created it, False when some other
        writer already owns the name. MUST be atomic: a concurrent
        reader sees either nothing or the full winning payload."""


def fsync_dir(path: str) -> None:
    """fsync a DIRECTORY: durably persist its entries (names), not just
    file contents. POSIX makes file-data and directory-entry durability
    separate operations — ``os.fsync(file_fd)`` alone leaves a freshly
    linked/renamed NAME eligible to vanish on power loss."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class LocalCommitStore(CommitStore):
    """POSIX implementation: write + fsync a uniquely-named temp file in
    the target directory, then ``os.link`` it to the final name. Link
    creation is atomic in the directory inode; EEXIST = lost the race.
    The temp file is always removed — win or lose.

    Durability (ADVICE r7): the winner also fsyncs the PARENT DIRECTORY
    before acknowledging — ``os.link`` creates a directory entry, and an
    entry not yet flushed can be lost on power failure even though the
    inode's data was fsynced, silently dropping an acknowledged commit."""

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        else:
            fsync_dir(d)
            return True
        finally:
            os.unlink(tmp)

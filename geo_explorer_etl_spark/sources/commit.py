"""Pluggable commit service: the storage primitives behind the
TableStore's ACID story (SURVEY §2.11 S11 / §2.12 I2 — the reference
leaned on its RDBMS transaction for exactly this, scdb.py:51–71).

The transaction protocol in ``store.py`` needs precisely two things
from storage:

1. **versioned manifest publish** — make snapshot version N+1 current
   iff N is still current (the snapshot point readers resolve);
2. **writer mutual exclusion** — either real (a lock) or optimistic
   (compare-and-swap with conflict retry).

On a laptop both come free from POSIX: atomic ``rename(2)`` and
``flock(2)`` — that is :class:`LocalFSBackend`, byte-identical to the
pre-factoring behavior. At 100 TB the store lives on S3-class object
storage with NEITHER primitive; what object stores DO give you is an
atomic single-key PUT and (since S3 conditional writes / GCS
generation preconditions / Azure ETags) a **conditional put-if-absent**.
:class:`CASBackend` builds the same two guarantees from only those:

- the manifest becomes an append-only log of versioned, immutable
  commit files ``<part>/_cas/<key>/{N:020d}.json``; "current" = the
  highest N (one LIST + one GET);
- publishing version N+1 is a put-if-absent on that exact key — two
  writers racing for N+1 produce exactly one winner; the loser gets
  :class:`CommitConflict`, re-reads the new current snapshot, and
  retries its (now rebased) update — optimistic concurrency, no lock
  anywhere. Locally the conditional put is emulated with
  ``os.link(tmp, target)``, which fails with ``FileExistsError`` iff
  the key exists — the same all-or-nothing semantics as S3's
  ``If-None-Match: *``;
- ``lock()`` is a documented no-op: every writer path in ``store.py``
  is written as read-version → compute → CAS → retry-on-conflict, so
  mutual exclusion is not required for correctness (only the POSIX
  backend uses the lock, to keep its unconditional rename safe).

File DATA writes need nothing special on either backend: every data
file is written once under a unique name and never modified (staging
moves are idempotent re-puts of unique keys — an object-store "move"
being copy+delete is safe because a redo skips keys already present).

Delta Lake's LogStore/commit-coordinator and Iceberg's catalog CAS are
the production versions of exactly this interface.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from abc import ABC, abstractmethod
from contextlib import contextmanager
from pathlib import Path


class CommitConflict(Exception):
    """The targeted snapshot version was committed by another writer;
    re-read the current snapshot and retry the update against it."""


class CommitBackend(ABC):
    """Versioned read / conditional-write of small JSON control blobs
    (partition manifests, the epoch ledger), plus an optional
    store-wide writer lock. ``key`` is the blob's logical name within
    directory ``d`` (e.g. ``_committed.json``).

    ``format_name`` identifies the ON-DISK LAYOUT this backend reads
    and writes (``"localfs"``: blob at ``d/key``; ``"cas"``: versioned
    log under ``d/_cas/key/``). The store records it in a root-level
    format tag on first open and refuses a later open under a backend
    with a DIFFERENT layout — without the tag, a localfs store opened
    as cas (or vice versa) reads no manifests at all, silently
    degrades every partition to listing mode, and the next commit
    resurrects superseded files. ``None`` (wrappers, test doubles)
    opts out of tagging; delegating wrappers should forward their
    inner backend's value."""

    format_name: str | None = None

    #: Bytes of SOURCE JSON retained by the parsed-manifest cache
    #: before a wholesale reset. Byte-accounted, not count-bounded:
    #: entries are whole manifest bodies (stats + blooms maps can be
    #: MBs on a wide partition), so a count cap could pin GiBs of
    #: driver RSS for stores no longer in use (review r10 wave 4 —
    #: the same argument that made the bloom memo byte-accounted).
    READ_CACHE_MAX_BYTES = 64 << 20

    def __init__(self) -> None:
        # Backends are process-shared singletons (make_backend) and
        # the store runs concurrent readers/writers over one instance
        # (DELETE_PARALLELISM pool, parallel tests), so every cache
        # touch — including delete()'s prefix sweep — goes through
        # this lock; a bare dict iteration races a concurrent insert
        # into "dictionary changed size during iteration".
        self._read_cache: dict[str, tuple[tuple, tuple[int, dict], int]] = {}
        self._read_cache_bytes = 0
        self._read_cache_lock = threading.Lock()

    def _cache_get(self, path: str, sig: tuple) -> tuple[int, dict] | None:
        with self._read_cache_lock:
            hit = self._read_cache.get(path)
            if hit is not None and hit[0] == sig:
                return hit[1]
        return None

    def _cache_put(
        self, path: str, sig: tuple, out: tuple[int, dict], cost: int
    ) -> None:
        with self._read_cache_lock:
            old = self._read_cache.pop(path, None)
            if old is not None:
                self._read_cache_bytes -= old[2]
            if self._read_cache_bytes + cost > self.READ_CACHE_MAX_BYTES:
                self._read_cache.clear()
                self._read_cache_bytes = 0
            self._read_cache[path] = (sig, out, cost)
            self._read_cache_bytes += cost

    def _cache_drop(self, path: str) -> None:
        with self._read_cache_lock:
            old = self._read_cache.pop(path, None)
            if old is not None:
                self._read_cache_bytes -= old[2]

    def _cache_drop_prefix(self, prefix: str) -> None:
        with self._read_cache_lock:
            for k in [k for k in self._read_cache if k.startswith(prefix)]:
                self._read_cache_bytes -= self._read_cache[k][2]
                del self._read_cache[k]

    @abstractmethod
    def read(self, d: Path, key: str) -> tuple[int, dict] | None:
        """Current (version, body) of the blob, or None if never
        committed. Versions start at 1.

        Returned bodies may be CACHED and SHARED across calls (both
        backends memoize parsed JSON keyed by the blob's identity —
        stat signature / immutable commit-file name — because a hot
        serving path re-reads the same manifest on every query and the
        parse dominated the driver-side plan cost). Callers must treat
        them as READ-ONLY: every update_fn builds a new body (verified
        across store.py), never mutates the prior in place."""

    @abstractmethod
    def write(self, d: Path, key: str, body: dict, expected_version: int) -> int:
        """Publish ``body`` as version ``expected_version + 1``;
        raise :class:`CommitConflict` if that version already exists
        (another writer won). Returns the committed version."""

    @abstractmethod
    def delete(self, d: Path, key: str) -> None:
        """Drop the blob entirely (the partition leaves manifest
        control — e.g. legacy replace_product)."""

    @abstractmethod
    @contextmanager
    def lock(self, root: Path):
        """Store-wide writer mutual exclusion. Real for the POSIX
        backend; a no-op for CAS (optimistic writers need none)."""


class LocalFSBackend(CommitBackend):
    """POSIX primitives: blob lives AT ``d/key``, swapped via
    tmp + atomic rename. The version rides inside the body (absent = 0
    for manifests written before versioning existed). The conditional
    check runs under a PER-BLOB flock (``d/key.lock``): a bare
    read-check-rename would be a cross-process TOCTOU — two appenders
    could both pass the version check and the loser's update would
    silently vanish. The per-blob lock is distinct from the store-wide
    writer lock (``lock()``), so a publisher already holding the store
    lock never re-enters the same flock (no self-deadlock), and
    lock-ordering is always store-lock → blob-lock."""

    format_name = "localfs"

    def read(self, d: Path, key: str) -> tuple[int, dict] | None:
        f = d / key
        # stat-signature memo: the atomic-rename publish always lands a
        # NEW inode, so (mtime_ns, size, ino) equality proves the cached
        # parse is the current snapshot — a read-heavy serving loop pays
        # the JSON parse once per commit, not once per query
        for _ in range(3):
            try:
                st = f.stat()
            except OSError:
                return None
            sig = (st.st_mtime_ns, st.st_size, st.st_ino)
            hit = self._cache_get(str(f), sig)
            if hit is not None:
                return hit
            try:
                text = f.read_text()
            except FileNotFoundError:
                continue  # swapped away between stat and read: re-resolve
            body = json.loads(text)
            out = (int(body.get("version", 0)), body)
            self._cache_put(str(f), sig, out, len(text))
            return out
        raise OSError(f"{f}: kept vanishing between stat and read")

    def write(self, d: Path, key: str, body: dict, expected_version: int) -> int:
        import fcntl

        d.mkdir(parents=True, exist_ok=True)
        with open(d / f"{key}.lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                cur = self.read(d, key)
                if (cur[0] if cur else 0) != expected_version:
                    raise CommitConflict(
                        f"{d / key}: expected version {expected_version}, "
                        f"found {cur[0] if cur else 0}"
                    )
                version = expected_version + 1
                body = dict(body, version=version)
                tmp = d / f"{key}.tmp"
                tmp.write_text(json.dumps(body))
                tmp.rename(d / key)  # atomic swap: the snapshot point
                return version
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def delete(self, d: Path, key: str) -> None:
        self._cache_drop(str(d / key))  # never serve a deleted body
        (d / key).unlink(missing_ok=True)
        # the .lock file is deliberately LEFT BEHIND: unlinking a path
        # another process may be flock()ing (or about to) hands the
        # next writer a fresh inode whose lock it wins immediately —
        # two writers inside the critical section, the exact lost
        # update the lock prevents. A few empty lock files are the
        # cost of correctness.

    @contextmanager
    def lock(self, root: Path):
        import fcntl

        root.mkdir(parents=True, exist_ok=True)
        f = open(root / "_lock", "w")
        try:
            fcntl.flock(f, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)
            f.close()


class CASBackend(CommitBackend):
    """Object-store model: immutable versioned commit files under
    ``d/_cas/<key>/{N:020d}.json``; current = highest N; publish =
    put-if-absent on version N+1 (emulated with ``os.link``, which is
    atomic-exclusive like S3 ``If-None-Match: *``). No lock: writers
    are optimistic and serialize through CAS conflicts.

    A superseded version's commit file stays (metadata-sized, doubles
    as audit trail); ``prune_commits`` keeps the log bounded the same
    way Delta checkpoints do. A reader that LISTs between two commits
    simply resolves the then-current version — immutability makes the
    read atomic without coordination."""

    format_name = "cas"

    KEEP_COMMITS = 64  # retained commit files per blob after pruning

    @staticmethod
    def _log_dir(d: Path, key: str) -> Path:
        return d / "_cas" / key

    def read(self, d: Path, key: str) -> tuple[int, dict] | None:
        log = self._log_dir(d, key)
        if not log.exists():
            return None
        latest = None
        for f in log.iterdir():
            if f.suffix == ".json" and (latest is None or f.name > latest.name):
                latest = f
        if latest is None:
            return None
        # commit files are immutable once linked in — but a PATH can be
        # REUSED with different content after delete() (legacy
        # replace_product drops the whole log and versioning restarts
        # at 1), or after an out-of-band rmtree+recreate of the store
        # root. Key the cache on the file's stat signature too, the
        # same rule as the localfs backend: the put-if-absent link
        # always creates a fresh inode, so signature equality proves
        # the cached parse is this very commit (review r10).
        try:
            st = latest.stat()
        except OSError:
            return None  # pruned between LIST and stat: re-resolve next read
        sig = (st.st_mtime_ns, st.st_size, st.st_ino)
        hit = self._cache_get(str(latest), sig)
        if hit is not None:
            return hit
        text = latest.read_text()
        out = (int(latest.stem), json.loads(text))
        self._cache_put(str(latest), sig, out, len(text))
        return out

    def write(self, d: Path, key: str, body: dict, expected_version: int) -> int:
        version = expected_version + 1
        log = self._log_dir(d, key)
        log.mkdir(parents=True, exist_ok=True)
        body = dict(body, version=version)
        tmp = log / f".tmp-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(body))
        target = log / f"{version:020d}.json"
        try:
            os.link(tmp, target)  # put-if-absent: exactly one winner
        except FileExistsError:
            raise CommitConflict(f"{target}: version {version} already committed")
        finally:
            tmp.unlink(missing_ok=True)
        self.prune_commits(d, key)
        return version

    def prune_commits(self, d: Path, key: str) -> int:
        """Drop all but the newest ``KEEP_COMMITS`` commit files —
        bounded metadata, like Delta's log cleanup after checkpoints.
        (Time travel reads resolve through the separate ``_history``
        journal, which is retained independently.)"""
        log = self._log_dir(d, key)
        if not log.exists():
            return 0
        commits = sorted(
            (f for f in log.iterdir() if f.suffix == ".json"), key=lambda f: f.name
        )
        removed = 0
        for f in commits[: -self.KEEP_COMMITS] if self.KEEP_COMMITS else commits:
            f.unlink(missing_ok=True)
            removed += 1
        return removed

    def delete(self, d: Path, key: str) -> None:
        import shutil

        log = self._log_dir(d, key)
        # purge cached parses under this log FIRST: after the rmtree,
        # version numbering restarts and the same commit paths are
        # REUSED — a same-tick, same-size, recycled-inode rewrite
        # could collide with the stat signature (review r10 wave 3),
        # so the in-protocol delete path drops the entries outright
        prefix = str(log) + "/"
        self._cache_drop_prefix(prefix)
        if log.exists():
            shutil.rmtree(log, ignore_errors=True)

    @contextmanager
    def lock(self, root: Path):
        yield  # optimistic: CAS conflicts are the serialization point


def cas_update(
    backend: CommitBackend,
    d: Path,
    key: str,
    update_fn,
    max_retries: int = 50,
):
    """THE optimistic-concurrency loop every control-blob write goes
    through: ``update_fn(current_body_or_None)`` returns the full new
    body (or None to abort). Read version → compute → conditional
    write → retry against the winner's snapshot on conflict. Returns
    the committed body, or None when the update aborted. Raises
    :class:`CommitConflict` after ``max_retries`` losses (a live-lock
    signal, not a normal outcome).

    Repeated losses back off with jittered exponential sleep (the
    standard optimistic-concurrency remedy, same as Delta/Iceberg
    commit retries): without it, N writers hammering one blob can
    starve a loser 50 straight races (measured with
    tools/commit_contention.py — 8 unthrottled threads livelocked a
    thread past the retry cap; with backoff every writer commits).
    The first two retries stay immediate, so the common one-conflict
    case pays nothing."""
    import random
    import time

    for attempt in range(max_retries):
        cur = backend.read(d, key)
        body = update_fn(cur[1] if cur else None)
        if body is None:
            return None
        try:
            v = backend.write(d, key, body, cur[0] if cur else 0)
        except CommitConflict:
            if attempt >= 2:
                time.sleep(
                    min(0.1, 0.001 * (2 ** min(attempt, 7))) * random.random()
                )
            continue
        return dict(body, version=v)
    raise CommitConflict(
        f"{d / key}: still conflicting after {max_retries} retries"
    )


_SHARED_BACKENDS: dict[str, CommitBackend] = {}


def make_backend(backend: str | CommitBackend) -> CommitBackend:
    if isinstance(backend, CommitBackend):
        return backend
    if backend in ("localfs", "cas"):
        # one shared instance per kind: both are stateless apart from
        # their read caches, and sharing lets a serving pattern that
        # constructs a fresh TableStore per query keep its parsed
        # manifests warm across handles
        if backend not in _SHARED_BACKENDS:
            _SHARED_BACKENDS[backend] = (
                LocalFSBackend() if backend == "localfs" else CASBackend()
            )
        return _SHARED_BACKENDS[backend]
    raise ValueError(f"unknown commit backend {backend!r} (localfs|cas)")

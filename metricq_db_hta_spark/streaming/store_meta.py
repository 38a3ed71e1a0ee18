"""Single owner of the raw-store durability metadata: the batch-directory
layout, the ``_last_commit.json`` marker, and the streaming checkpoint's
commits log. Both writers of the store — the ingest service
(`ingest_stream.StreamingIngest`) and the compaction maintenance pass
(`operators/maintenance`) — go through these helpers, so the marker format
and its semantics have exactly one implementation.

Marker semantics: ``committed_batches`` is the set of batch ids whose raw
write AND derived level state are both complete. It is updated
incrementally ((old - remove) | add, clipped to what is actually on disk)
— never recomputed as "everything on disk", because a torn batch from a
crashed writer may be on disk without being complete, and marking it
committed would permanently disable its `recover()` repair.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import threading
import time

# -- store mutation lock (r14: live writer racing maintenance) ---------------
#
# Every metadata mutator below is a read-modify-write over a small JSON
# file (marker, retired set, removal intents). Atomic rename makes each
# WRITE all-or-nothing, but two concurrent mutators can still interleave
# read->write and lose one update (ingest committing batch N while
# retention de-commits batch M drops one of the two changes). The lock
# serializes those RMWs: a per-store re-entrant thread lock (the normal
# deployment — one driver hosts both the stream and maintenance ops) plus
# an fcntl flock on <store>/_mutation.lock for cross-process safety on
# POSIX stores. Leaf mutators take it internally; composite operations may
# wrap whole sequences (re-entrant).

_MUTEX_GUARD = threading.Lock()
_MUTEX: dict[str, tuple[threading.RLock, list]] = {}
#: stores already warned about a degraded (thread-only) mutation lock —
#: the flock failure repeats on every acquisition, the warning must not
_FLOCK_WARNED: set[str] = set()


def _locked(fn):
    """Decorator form of :func:`mutation_lock` for the leaf RMW mutators
    (first positional arg must be ``store_dir``)."""
    import functools

    @functools.wraps(fn)
    def wrapper(store_dir, *a, **k):
        with mutation_lock(store_dir):
            return fn(store_dir, *a, **k)

    return wrapper


@contextlib.contextmanager
def mutation_lock(store_dir: str):
    key = os.path.abspath(store_dir)
    with _MUTEX_GUARD:
        ent = _MUTEX.get(key)
        if ent is None:
            # [lock fd, depth] — flock taken once per process at depth 0;
            # same-process threads serialize on the RLock alone
            ent = _MUTEX[key] = (threading.RLock(), [None, 0])
    rlock, state = ent
    with rlock:
        if state[1] == 0:
            # the flock leg degrades gracefully on read-only/odd mounts
            # (r14 review #4: a read-only fsck walk must not crash on the
            # lockfile open) — the re-entrant thread lock alone still
            # serializes every mutator within this process, which is the
            # normal single-driver deployment
            fd = None
            try:
                os.makedirs(store_dir, exist_ok=True)
                fd = os.open(
                    os.path.join(key, "_mutation.lock"),
                    os.O_CREAT | os.O_RDWR,
                )
                import fcntl

                fcntl.flock(fd, fcntl.LOCK_EX)
            except (ImportError, OSError) as e:
                # thread lock still covers one process — but the
                # CROSS-process guarantees built on this flock (the
                # batch-id allocator's collision-free reservation, marker
                # RMW atomicity vs a separate maintenance process) are
                # silently gone on this mount. Say so once per store so a
                # multi-process deployment on an odd/read-only mount gets
                # a signal instead of a quietly reopened fuzz-class-20
                # race (ADVICE r14).
                if key not in _FLOCK_WARNED:
                    _FLOCK_WARNED.add(key)
                    import logging

                    logging.getLogger(__name__).warning(
                        "mutation lock on %s: flock unavailable (%r) - "
                        "cross-process mutual exclusion degraded to "
                        "thread-only for this store",
                        key,
                        e,
                    )
            state[0] = fd
        state[1] += 1
        try:
            yield
        finally:
            state[1] -= 1
            if state[1] == 0:
                fd, state[0] = state[0], None
                if fd is not None:
                    try:
                        import fcntl

                        fcntl.flock(fd, fcntl.LOCK_UN)
                    except (ImportError, OSError):
                        pass
                    os.close(fd)


def raw_path(store_dir: str) -> str:
    return os.path.join(store_dir, "raw")


def batch_dir(store_dir: str, batch_id: int) -> str:
    return os.path.join(raw_path(store_dir), f"ingest_batch={batch_id}")


def marker_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_last_commit.json")


def width_table_dirs(store_dir: str, prefix: str) -> dict[int, str]:
    """``<prefix>_<digits>`` table dirs under the store root, as
    ``{width_ns: path}``. The ONE owner of this layout parse (r13 review:
    it was re-implemented four times across serve discovery, SQL view
    registration and retention width discovery — a convention change
    fixed in one copy would silently desynchronize the others)."""
    import glob

    out: dict[int, str] = {}
    for d in sorted(glob.glob(os.path.join(store_dir, f"{prefix}_*"))):
        tail = os.path.basename(d).split("_", 1)[1]
        if tail.isdigit():
            out[int(tail)] = d
    return out


def raw_batches_on_disk(store_dir: str) -> set[int]:
    """ingest_batch ids present in raw, from the directory layout — no
    data scan."""
    root = raw_path(store_dir)
    if not os.path.exists(root):
        return set()
    return {
        int(name.split("=", 1)[1])
        for name in os.listdir(root)
        if name.startswith("ingest_batch=")
    }


def committed_batches(store_dir: str) -> set[int]:
    path = marker_path(store_dir)
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return set(json.load(f).get("committed_batches", []))


@_locked
def update_commit_marker(
    store_dir: str, add: set[int], remove: set[int] = frozenset()
) -> set[int]:
    """Atomic (tmp-write + rename, A6 durability barrier) incremental
    marker update: committed := ((committed - remove) | add) ∩ on-disk.
    Returns the new committed set."""
    new = (committed_batches(store_dir) - set(remove)) | set(add)
    on_disk = raw_batches_on_disk(store_dir)
    clipped = new - on_disk
    if clipped and _any_fresh_writer_marker(store_dir):
        # a batch is transiently absent from raw during the two renames of
        # a LIVE replay swap — clipping it here would silently de-commit
        # it and drop its rows from every committed-set-based read until a
        # later recover() re-adopts it (r14 review #2: the write-side twin
        # of require_committed_batches_on_disk's transient-missing check).
        # Keep it committed; if it is REAL loss, the maintenance guard
        # still reports it once the writer marker ages out.
        clipped = set()
    elif clipped:
        # A committed batch missing from disk without an explicit remove=
        # is the torn-replay loss signature (ADVICE r12); clipping it
        # silently would erase the only evidence. Warn loudly — the
        # maintenance guards (missing_committed_batches) refuse to run
        # before any marker update could reach this clip.
        import logging

        logging.getLogger(__name__).warning(
            "commit marker clipped batches missing from raw: %s", sorted(clipped)
        )
        new -= clipped
    path = marker_path(store_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"committed_batches": sorted(new)}, f)
    os.replace(tmp, path)
    # every durable state change republishes the snapshot manifest, so
    # CURRENT always points at the latest consistent readable set — the
    # per-microbatch cost is two tiny json writes + a rename
    publish_snapshot(store_dir)
    return new


def _alloc_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_batch_alloc.json")


@_locked
def allocate_negative_batch_id(store_dir: str) -> int:
    """Shared descending-negative batch-id allocator for the two writers
    outside the streaming engine's namespace (backfill appends, compaction
    dests). The id must be RESERVED atomically, not just computed: before
    r14 both writers independently derived ``min(on_disk) - 1``, and a
    backfill racing a compaction could allocate the SAME id — the
    compaction dest dir then appears under the backfill's id, the
    backfill's isdir check mistakes its fresh append for a streaming
    replay, and the stage-then-swap replaces the compaction's rows with
    the backfill's (silent loss; caught by fuzz class 20). The floor file
    only ever decreases, so a crashed reservation wastes one id and can
    never hand it out twice."""
    try:
        with open(_alloc_path(store_dir)) as f:
            floor = int(json.load(f)["floor"])
    except (FileNotFoundError, ValueError, KeyError):
        floor = 0
    on = raw_batches_on_disk(store_dir)
    lo = min(min(on) if on else 0, floor, 0)
    # a pending compaction journal names a dest that may not be on disk
    # yet (and, on a store whose floor file predates this allocator, not
    # under the floor either) — never hand that id out
    j = read_journal(store_dir)
    if j is not None:
        lo = min(lo, int(j["dest"]))
    bid = lo - 1
    _write_json_atomic(_alloc_path(store_dir), {"floor": bid})
    return bid


def _checkpoint_log_ids(store_dir: str, log: str) -> set[int]:
    path = os.path.join(store_dir, "_checkpoint", log)
    if not os.path.isdir(path):
        return set()
    return {int(f) for f in os.listdir(path) if f.isdigit()}


def replayable_batches(store_dir: str) -> set[int]:
    """Batch ids the streaming engine WILL replay on restart: ids with an
    offsets entry but no commits entry — the engine writes offsets, runs
    the batch, then writes the commit, so at most one id is ever in this
    state. This is the definition, not mere commits-file absence: a
    commits entry can also be missing because the engine purged it past
    ``minBatchesToRetain`` (then the offsets entry is purged too — not
    replayable) or because the checkpoint was rebuilt from scratch (no
    offsets at all — nothing can replay). Negative ids
    (backfill/compaction namespace) never appear in either log."""
    return _checkpoint_log_ids(store_dir, "offsets") - _checkpoint_log_ids(
        store_dir, "commits"
    )


# -- replay staging (torn-replay durability, ADVICE r12) -------------------
#
# A replayed microbatch must REPLACE its own committed batch subtree
# (raw/ingest_batch=N, drops_log/ingest_batch=N). Deleting the old subtree
# before the replacement write is durable opens a window where batch N's
# rows are absent from disk while the commit marker still claims them —
# maintenance run in that window would bake the loss into level tables.
# Protocol (all renames same-filesystem, atomic):
#
#   1. write the replacement under <parent>/_replay_staging/<N>
#      (underscore prefix: Spark/Hadoop readers ignore it; the batch-dir
#      scan above only matches ``ingest_batch=``). Job commit drops
#      ``_SUCCESS`` — the durability certificate.
#   2. rename <final> -> _replay_staging/<N>.old        (old data kept)
#   3. rename _replay_staging/<N> -> <final>
#   4. rmtree the .old aside
#
# Every crash point is settled by ``settle_replay_staging``: after 3 the
# aside is garbage; between 2 and 3 the staging's _SUCCESS proves the swap
# may complete; before 2 the old subtree is untouched and any staging is
# stale (the stream will replay the batch again).


def replay_staging_root(parent: str) -> str:
    return os.path.join(parent, "_replay_staging")


def replay_stage_path(parent: str, batch_id: int) -> str:
    return os.path.join(replay_staging_root(parent), str(int(batch_id)))


#: every writer-liveness marker file starts with this name; each writer
#: owns its OWN marker (``_writer_alive.<pid>.<n>``) so two concurrent
#: replay writers on one parent (a stream replay racing a backfill
#: replay) each hold their own flock — a single shared EX-locked marker
#: cannot represent two live writers, and 'flock-free means dead' would
#: then sweep the second, still-live writer's staging (r15 review #1/#2)
WRITER_MARKER_PREFIX = "_writer_alive"

#: (parent abspath, thread id) -> (marker path, fd|None). The calling
#: thread's active marker: mark/touch, release and swap all operate on
#: this thread's own entry, so one writer's release can never drop a
#: peer's flock. The fd holds LOCK_EX for the whole write+swap; the
#: kernel releases it the instant the holder dies, so a probe
#: distinguishes "live writer — wait" from "crash leftover — settle
#: now" without the 15-minute mtime age-out (r15, ADVICE r14:
#: refuse_live from backfill()/start() would otherwise make every crash
#: restart wait out the window).
_ACTIVE_MARKERS: dict[tuple[str, int], tuple[str, int | None]] = {}
_MARKER_SEQ = [0]


def _writer_markers(parent: str) -> list[str]:
    """All writer-liveness marker files currently in the staging root."""
    root = replay_staging_root(parent)
    try:
        names = os.listdir(root)
    except OSError:
        return []
    return sorted(
        os.path.join(root, n)
        for n in names
        if n.startswith(WRITER_MARKER_PREFIX)
    )


def _marker_key(parent: str) -> tuple[str, int]:
    return (os.path.abspath(parent), threading.get_ident())


def mark_replay_writer(parent: str) -> str:
    """Create (or refresh) THIS thread's writer-liveness marker inside
    the staging root and take a LOCK_EX flock on it; returns the marker
    path. Planted BEFORE the staging write is handed to Spark (r14
    review). Two jobs: (1) the root is never empty while a write may be
    in flight, so a concurrent settle's only-when-empty
    ``os.rmdir(root)`` cannot race Spark's own mkdirs of the staging
    path; (2) the held flock (exact) and the mtime (backstop) give the
    maintenance pre-flight its liveness signal. Removed by
    ``swap_replayed_subtree`` on completion.

    Holds the parent-keyed mutation lock so a settle's marker sweep can
    never interleave between this touch and its own probe (r14 review
    #3); the retry covers a settle's rmdir of a momentarily-empty root
    winning between mkdir and touch across PROCESSES that lost the
    flock leg. The flock itself can only fail on mounts without flock
    support (the file name is unique to this writer, and liveness
    probes take LOCK_SH) — then the mtime window remains the signal,
    exactly the pre-r15 behavior."""
    key = _marker_key(parent)
    with mutation_lock(parent):
        ent = _ACTIVE_MARKERS.get(key)
        if ent is not None and os.path.exists(ent[0]):
            os.utime(ent[0])
            return ent[0]
        for _ in range(100):
            os.makedirs(replay_staging_root(parent), exist_ok=True)
            _MARKER_SEQ[0] += 1
            marker = os.path.join(
                replay_staging_root(parent),
                f"{WRITER_MARKER_PREFIX}.{os.getpid()}.{_MARKER_SEQ[0]}",
            )
            try:
                with open(marker, "w"):
                    pass
                os.utime(marker)
            except FileNotFoundError:
                continue
            fd = None
            try:
                fd = os.open(marker, os.O_RDWR)
                import fcntl

                # probes run under this same mutation lock, so the only
                # way this NB acquisition of our own fresh file can fail
                # is a mount without flock support (OSError) — retry a
                # couple of times for paranoia, then degrade
                for attempt in range(3):
                    try:
                        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                        break
                    except BlockingIOError:
                        time.sleep(0.002 * (attempt + 1))
                else:
                    raise OSError("flock contended past retries")
            except (ImportError, OSError):
                if fd is not None:
                    os.close(fd)
                fd = None
            # the marker RECORDS whether its writer holds a flock ('F')
            # or is mtime-only ('M', degraded mount): a probe finding an
            # unheld 'F' marker has PROOF the writer died, while an 'M'
            # marker is never "provably dead" — without the mode byte, a
            # flock-degraded LIVE writer would read exactly like a dead
            # one and its in-progress staging would be swept (r15 review
            # #2/#3)
            try:
                if fd is not None:
                    os.write(fd, b"F")
                else:
                    with open(marker, "w") as f:
                        f.write("M")
                os.utime(marker)
            except OSError:
                pass  # empty content reads as mtime-only: conservative
            _ACTIVE_MARKERS[key] = (marker, fd)
            return marker
    raise RuntimeError(
        f"could not establish replay-writer marker under {parent}"
    )


def release_replay_writer(parent: str) -> None:
    """Drop THIS thread's writer flock WITHOUT removing its marker — the
    failure path of a replay write (the marker's mtime keeps documenting
    the recent write; a settle sweeps it once provably dead). Process
    death releases the flock implicitly; this is for the in-process
    crash (exception) where the fd would otherwise stay registered and
    read as a live writer forever. Never touches a peer's entry."""
    ent = _ACTIVE_MARKERS.pop(_marker_key(parent), None)
    if ent is not None and ent[1] is not None:
        try:
            import fcntl

            fcntl.flock(ent[1], fcntl.LOCK_UN)
        except (ImportError, OSError):
            pass
        os.close(ent[1])


def _probe_marker(marker: str) -> bool | None:
    """One marker's liveness state: True = flock held (live writer),
    False = an 'F'-mode marker with its flock provably unheld (the
    writer took the lock and the kernel released it — dead), None =
    unknowable (an 'M'-mode/legacy marker whose writer never held a
    flock, no flock support here, or the marker vanished mid-probe).
    Probes with LOCK_SH so two concurrent probes never read each other
    as a live writer (r15 review #4) while still conflicting with a
    writer's LOCK_EX; callers hold the parent mutation lock so a probe
    can never interleave with mark_replay_writer's own acquisition."""
    fd = None
    try:
        fd = os.open(marker, os.O_RDONLY)
        mode = os.read(fd, 1)
        import fcntl

        try:
            fcntl.flock(fd, fcntl.LOCK_SH | fcntl.LOCK_NB)
        except BlockingIOError:
            return True
        fcntl.flock(fd, fcntl.LOCK_UN)
        # unheld: only conclusive if the writer RECORDED holding a flock
        return False if mode == b"F" else None
    except (ImportError, OSError):
        return None
    finally:
        if fd is not None:
            os.close(fd)


def probe_replay_writer_live(parent: str) -> bool | None:
    """Aggregate writer liveness over every marker in the staging root.

    ``True``  — at least one marker is flock-held: a replay write/swap
                is in flight RIGHT NOW.
    ``False`` — markers exist and EVERY one is provably unheld: all
                writers that planted them are dead, whatever the
                markers' ages.
    ``None``  — no markers, or at least one marker's flock state is
                unknowable: fall back to the mtime window."""
    markers = _writer_markers(parent)
    if not markers:
        return None
    states = [_probe_marker(m) for m in markers]
    if any(s is True for s in states):
        return True
    if all(s is False for s in states):
        return False
    return None


def _any_fresh_writer_marker(store_dir: str) -> bool:
    """True when any replay writer's liveness marker (raw or drops_log)
    is flock-held by a live writer OR inside the mtime liveness window —
    a batch dir may be transiently absent mid-swap right now. The flock
    leg extends protection to writes longer than the window; the mtime
    leg is the conservative backstop where flock is unavailable (both
    legs suppress the loss alarm, never assert loss)."""
    for parent in (raw_path(store_dir), os.path.join(store_dir, "drops_log")):
        if not os.path.isdir(replay_staging_root(parent)):
            continue  # no lock either: mutation_lock would CREATE the dir
        # under the parent lock so probes never collide with a writer's
        # own flock acquisition in mark_replay_writer (r15 review #3)
        with mutation_lock(parent):
            for marker in _writer_markers(parent):
                if _probe_marker(marker) is True:
                    return True
                try:
                    age = time.time() - os.path.getmtime(marker)
                except OSError:
                    continue
                if age < REPLAY_LIVENESS_WINDOW_S:
                    return True
    return False


def swap_replayed_subtree(parent: str, batch_id: int) -> None:
    """Steps 2-4 above. The staging dir must hold a job-committed write.

    The writer-liveness marker is RE-TOUCHED here, not trusted from the
    caller's pre-write mark: a staging write longer than
    ``REPLAY_LIVENESS_WINDOW_S`` (plausible for large replayed batches)
    would otherwise arrive at this swap with a stale marker, and during
    the two-rename window — the one moment the batch is genuinely absent
    from ``parent`` — ``update_commit_marker`` would see
    ``_any_fresh_writer_marker() == False`` and de-commit the mid-swap
    batch with a false torn-replay warning, while
    ``require_committed_batches_on_disk`` would raise the non-retriable
    torn-replay alarm instead of the retriable live-replay refusal
    (ADVICE r14, medium)."""
    mark_replay_writer(parent)
    final = os.path.join(parent, f"ingest_batch={int(batch_id)}")
    staging = replay_stage_path(parent, batch_id)
    aside = staging + ".old"
    if os.path.isdir(aside):  # leftover from an earlier settled crash
        shutil.rmtree(aside)
    if os.path.isdir(final):
        os.rename(final, aside)
    os.rename(staging, final)
    if os.path.isdir(aside):
        shutil.rmtree(aside)
    with mutation_lock(parent):
        # remove THIS thread's marker (write+swap complete): every writer
        # owns its own marker file, so a LIVE peer replay writer on the
        # same parent keeps its liveness signal untouched (r15 review
        # #1). Provably DEAD sibling markers (flock released — e.g. this
        # writer's own earlier crashed attempt) are swept too, so a
        # successful retry leaves the staging root empty; under the
        # mutation lock a marker is either creator-flocked or its
        # creator is gone, so a False probe here is conclusive.
        ent = _ACTIVE_MARKERS.get(_marker_key(parent))
        release_replay_writer(parent)
        if ent is not None:
            try:
                os.remove(ent[0])
            except FileNotFoundError:
                pass
        for m in _writer_markers(parent):
            if _probe_marker(m) is False:
                try:
                    os.remove(m)
                except FileNotFoundError:
                    pass
    try:
        os.rmdir(replay_staging_root(parent))  # only when empty
    except OSError:
        pass


#: a _SUCCESS-less replay staging whose newest tree mtime is younger than
#: this is presumed to belong to a LIVE replay write (Spark's task commits
#: touch the staging tree continuously; replay writers have no journal to
#: heartbeat, so tree freshness is the liveness signal — same window as
#: maintenance.LIVENESS_WINDOW_S for the compaction journal)
REPLAY_LIVENESS_WINDOW_S = 15 * 60


def _newest_tree_mtime(path: str) -> float:
    newest = 0.0
    for dirpath, _dirs, files in os.walk(path):
        for p in [dirpath] + [os.path.join(dirpath, f) for f in files]:
            try:
                newest = max(newest, os.stat(p).st_mtime)
            except OSError:
                continue
    return newest


def settle_replay_staging(store_dir: str, refuse_live: bool = False) -> list[str]:
    """Finish or roll back any replay swap interrupted by a crash, so the
    invariant 'every marker-committed batch's subtree is on disk' is
    restored before anything reads or mutates the store. Idempotent;
    returns a human-readable action list (empty in the common case).

    ``refuse_live=True`` (the maintenance pre-flight and the
    start()/backfill() entry settles, ADVICE r14) raises instead of
    dropping a _SUCCESS-less staging whose tree mtime is fresh — that
    write may belong to a LIVE ingest replay running concurrently, and
    rmtree'ing it mid-write crashes the stream batch (r14 review; mirrors
    recover_compaction's journal liveness guard). A provably LIVE writer
    (marker flock held) refuses on EVERY path, including the
    unconditional ``recover()`` settle — repairing a store under a live
    writer is wrong everywhere, and the owner settles before it writes so
    it can never trip over its own flock. A provably DEAD writer (an
    'F'-mode marker with its flock released) settles immediately; only
    the ambiguous cases (mtime-only markers, no marker at all) fall back
    to the fresh-tree age-out, so a refused run always unblocks by
    waiting."""
    actions: list[str] = []
    parents = (raw_path(store_dir), os.path.join(store_dir, "drops_log"))
    # Every present parent's lock is held for the whole settle (r15
    # review #6 + follow-ups): marks serialize on the same locks, so no
    # writer can appear on an already-locked parent mid-settle, and the
    # flock-live AND fresh-marker refusals all land in _prepare BEFORE
    # the first repair action. Only the per-ENTRY tree-mtime backstop
    # (fresh marker-less staging, a pre-r14-writer crash state) can
    # still refuse between parents — that raise reports the actions
    # already performed. Lock order is raw-then-drops everywhere;
    # writers take exactly one parent lock at a time, so no cycle
    # exists. Only parents whose staging root EXISTS are locked:
    # mutation_lock creates its key directory as a side effect, and
    # materializing an empty drops_log/ breaks consumers that
    # parquet-read it when present (caught by fuzz class 20); a root
    # created after this sweep belongs to a brand-new writer and has
    # nothing to settle.
    with contextlib.ExitStack() as _locks:
        locked: set[str] = set()

        def _prepare(parent: str) -> bool:
            """Lock (once) and run every pre-mutation refusal for one
            parent; True when the parent has a root to settle."""
            if not os.path.isdir(replay_staging_root(parent)):
                return False
            if parent not in locked:
                locked.add(parent)
                _locks.enter_context(mutation_lock(parent))
            live = probe_replay_writer_live(parent)
            if live is True:
                # raised on the unconditional path too: the owner
                # settles BEFORE it writes, so it can never hold its own
                # flock here — a held flock is always a live peer, and
                # sweeping under it would reopen the rmdir-vs-mkdirs
                # race; repairing a store under a live writer is wrong
                # on every path
                raise RuntimeError(
                    f"a replay writer flock is held under {parent} - a "
                    "live ingest replay is writing on this parent; wait "
                    "for it to finish"
                )
            if refuse_live and live is not False:
                # ambiguous liveness (M-mode/legacy markers): the
                # pre-flight's mtime refusal is checked HERE, across all
                # parents, before anything mutates
                for marker in _writer_markers(parent):
                    try:
                        age = time.time() - os.path.getmtime(marker)
                    except OSError:
                        continue
                    if age < REPLAY_LIVENESS_WINDOW_S:
                        raise RuntimeError(
                            f"replay writer marker {marker} is fresh "
                            f"({age:.0f}s old) - a live ingest replay "
                            "may be writing; wait for it (a dead "
                            "writer's marker ages out of the "
                            f"{REPLAY_LIVENESS_WINDOW_S}s window)"
                        )
            return True

        ready = [parent for parent in parents if _prepare(parent)]
        for parent in ready:
            _settle_parent(parent, refuse_live, actions)
    return actions


def _settle_parent(
    parent: str, refuse_live: bool, actions: list[str]
) -> None:
    """One parent's settle pass; appends performed repairs to the SHARED
    ``actions`` list (so a residual per-entry refusal can report what
    already ran). Caller holds every ready parent's mutation lock and
    ran the pre-mutation refusals (_prepare)."""
    root = replay_staging_root(parent)
    if not os.path.isdir(root):
        return
    # writer-liveness markers first (r14): a FRESH or flock-held
    # marker means a replay writer may be mid-write or mid-swap
    # RIGHT NOW — the maintenance pre-flight refuses before touching
    # anything (the per-entry tree-mtime guards below stay as the
    # crash-state backstop). Markers are probed and swept under the
    # parent-keyed mutation lock, the same lock mark_replay_writer
    # holds for its touch — without it a writer could plant a marker
    # between this probe and the sweep (r14 review #3). Exact flock
    # liveness beats the mtime window in BOTH directions: a held
    # flock is a live writer even past the window (>15-min staging
    # write), and all-markers-unheld is a provably dead writer even
    # seconds after a crash, so the settle need not wait out the
    # window (the availability cost ADVICE r14's refuse_live-from-
    # backfill/start fix would otherwise add to every crash restart).
    writer_known_dead = False
    live = probe_replay_writer_live(parent)
    if live is True:
        # normally phase 1 already raised under the held locks; this
        # re-check covers a root (and writer) that appeared after the
        # lock selection, where no lock protects the parent
        raise RuntimeError(
            f"a replay writer flock is held under {parent} - a live "
            "ingest replay is writing on this parent; wait for it to "
            "finish"
        )
    if live is False:
        writer_known_dead = True  # settle entries immediately
    for marker in _writer_markers(parent):
        try:
            marker_age = time.time() - os.path.getmtime(marker)
        except OSError:
            continue  # vanished: a live swap just removed it
        if (
            not writer_known_dead
            and refuse_live
            and marker_age < REPLAY_LIVENESS_WINDOW_S
        ):
            raise RuntimeError(
                f"replay writer marker {marker} is fresh "
                f"({marker_age:.0f}s old) - a live ingest replay "
                "may be writing; wait for it (a dead writer's "
                "marker ages out of the "
                f"{REPLAY_LIVENESS_WINDOW_S}s window)"
            )
        # owner settle (the single writer itself), a provably
        # dead writer, or a stale marker: the crash leftover is
        # swept so the root can empty out
        try:
            os.remove(marker)
            actions.append(f"swept replay writer marker {marker}")
        except FileNotFoundError:
            pass
    try:
        names = sorted(
            n
            for n in os.listdir(root)
            if not n.startswith(WRITER_MARKER_PREFIX)
        )
    except FileNotFoundError:
        # the root vanished between the isdir check and the listing:
        # a live writer's swap just completed and emptied it — there
        # is nothing left to settle here
        return
    # asides first: they encode the furthest-along crash states and
    # may consume their staging sibling
    for name in [n for n in names if n.endswith(".old")] + [
        n for n in names if not n.endswith(".old")
    ]:
        path = os.path.join(root, name)
        if not os.path.exists(path):  # consumed by an earlier branch
            continue
        bid = name[:-4] if name.endswith(".old") else name
        final = os.path.join(parent, f"ingest_batch={bid}")
        try:
            _settle_one_staging_entry(
                actions,
                refuse_live and not writer_known_dead,
                root,
                parent,
                path,
                name,
                bid,
                final,
            )
        except FileNotFoundError:
            # the entry vanished mid-action: only a LIVE writer's own
            # swap can consume it concurrently (crash states are
            # inert) — the pre-flight refuses, the owner moves on
            if refuse_live:
                raise RuntimeError(
                    f"replay staging entry {path} vanished mid-settle "
                    "- a live ingest replay is swapping concurrently; "
                    "wait for it"
                )
    try:
        os.rmdir(root)  # only when empty
    except OSError:
        pass


def _settle_one_staging_entry(
    actions: list[str],
    refuse_live: bool,
    root: str,
    parent: str,
    path: str,
    name: str,
    bid: str,
    final: str,
) -> None:
    """One staging-root entry's settle action (split out of the scan loop
    so the loop can map a concurrent FileNotFoundError to 'a live writer
    consumed this entry'). ``refuse_live`` arrives pre-resolved by the
    caller: False when the marker flock proved the writer dead, so fresh
    tree mtimes (the approximate backstop) no longer block the settle."""
    if name.endswith(".old"):
        staging = os.path.join(root, bid)
        # LIVENESS for the swap window too (r14 review): an aside also
        # exists for the few steps of a LIVE swap_replayed_subtree. The
        # aside's own mtimes are the ORIGINAL batch's (rename preserves
        # them), so liveness is judged from the freshly-written side: the
        # staging tree (live between renames 1 and 2) or the final tree
        # (live between rename 2 and the aside cleanup). Completing the
        # swap here would race the live writer's own rename and crash its
        # stream batch. Crashed swaps age out.
        if refuse_live:
            probe = staging if os.path.isdir(staging) else final
            if os.path.isdir(probe):
                age = time.time() - _newest_tree_mtime(probe)
                if age < REPLAY_LIVENESS_WINDOW_S:
                    raise RuntimeError(
                        f"replay swap around {final} looks live "
                        f"({age:.0f}s-fresh write) - a live "
                        "ingest replay may be mid-swap; wait for "
                        "it (a crashed swap ages out of the "
                        f"{REPLAY_LIVENESS_WINDOW_S}s window)"
                    )
        if os.path.isdir(final):
            shutil.rmtree(path)  # crashed after step 3
            actions.append(f"dropped settled aside {path}")
        elif os.path.isfile(os.path.join(staging, "_SUCCESS")):
            os.rename(staging, final)  # crashed between 2 and 3
            shutil.rmtree(path)
            actions.append(f"completed replay swap into {final}")
        else:  # defensive: protocol can't reach here
            os.rename(path, final)
            actions.append(f"restored {final} from aside")
    else:
        # stale staging (crash before step 2, or after a deliberate
        # batch removal): the old subtree — if the batch still
        # exists — is intact, and the stream replays the batch
        # anyway, so dropping is safe — UNLESS the write is still
        # running (no _SUCCESS yet = possibly mid-write)
        if refuse_live:
            age = time.time() - _newest_tree_mtime(path)
            if age < REPLAY_LIVENESS_WINDOW_S:
                raise RuntimeError(
                    f"replay staging {path} is fresh "
                    f"({age:.0f}s old, no _SUCCESS) - a live "
                    "ingest replay may be writing it; wait for "
                    "it to finish (a dead staging ages out of "
                    f"the {REPLAY_LIVENESS_WINDOW_S}s window)"
                    + (
                        f"; settle actions already performed: {actions}"
                        if actions
                        else ""
                    )
                )
        shutil.rmtree(path)
        actions.append(f"dropped stale replay staging {path}")


def missing_committed_batches(store_dir: str) -> set[int]:
    """Marker-committed batch ids whose raw subtree is absent — the
    torn-replay loss signature. Maintenance must refuse to run while this
    is non-empty (after ``settle_replay_staging`` had its chance to heal):
    rebuild/compact/retention would otherwise bake the loss into derived
    state."""
    return (
        committed_batches(store_dir)
        - raw_batches_on_disk(store_dir)
        - set(retired_batches(store_dir))
    )


# -- removal intent (deliberate batch-dir deletion, r13) -------------------
#
# retention/erase delete a fully-emptied batch DIRECTORY and then de-commit
# it from the marker. A crash between the two produces the same
# "marker-committed batch missing from raw" signature as torn-replay loss —
# and would permanently wedge the maintenance guard below (r13 review #1:
# unlike compaction there is no journal to roll forward). So whole-batch
# deletions record their intent FIRST; the settle finishes the de-commit
# for any intent batch whose dir is gone, and drops intents whose dir
# still exists (the op re-runs idempotently).


def removal_intent_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_removal_intent.json")


def _read_intent_map(store_dir: str) -> dict[int, float]:
    """intent batch id -> record time (unix s). Reads both the r14 map
    form ({"batches": {"12": ts}}) and the r13 list form ({"batches":
    [12]}) — list-form entries get timestamp 0 (always stale: they
    predate this code, so their writer is dead by definition)."""
    try:
        with open(removal_intent_path(store_dir)) as f:
            b = json.load(f).get("batches", {})
    except (FileNotFoundError, ValueError):
        return {}
    if isinstance(b, list):
        return {int(x): 0.0 for x in b}
    return {int(k): float(v) for k, v in b.items()}


def read_removal_intent(store_dir: str) -> set[int]:
    return set(_read_intent_map(store_dir))


@_locked
def record_removal_intent(store_dir: str, ids: set[int]) -> None:
    cur = _read_intent_map(store_dir)
    now = time.time()
    for b in ids:
        cur[int(b)] = now
    _write_json_atomic(
        removal_intent_path(store_dir),
        {"batches": {str(k): v for k, v in sorted(cur.items())}},
    )


@_locked
def clear_removal_intent(store_dir: str, ids: set[int]) -> None:
    cur = {
        k: v for k, v in _read_intent_map(store_dir).items()
        if k not in {int(b) for b in ids}
    }
    if cur:
        _write_json_atomic(
            removal_intent_path(store_dir),
            {"batches": {str(k): v for k, v in sorted(cur.items())}},
        )
    else:
        try:
            os.remove(removal_intent_path(store_dir))
        except FileNotFoundError:
            pass


@_locked
def settle_removal_intent(store_dir: str) -> list[str]:
    """Finish a crash-interrupted deliberate batch removal: any intent
    batch whose dir is gone gets its marker de-commit completed (safe and
    idempotent even if the owning op is still alive — its own de-commit
    then no-ops under the lock); an intent whose dir SURVIVED is dropped
    only once it is STALE (the op is dead and re-runs from scratch). A
    fresh alive-dir intent belongs to a retention/erase pass that is
    still running (r14 review: clearing it mid-flight reopened the r13
    wedge — the op deletes the dir after losing its intent, crashes
    before the de-commit, and the loss signature permanently blocks
    maintenance). Idempotent."""
    intents = _read_intent_map(store_dir)
    if not intents:
        return []
    actions: list[str] = []
    on_disk = raw_batches_on_disk(store_dir)
    gone = set(intents) - on_disk
    finish = gone & committed_batches(store_dir)
    if finish:
        update_commit_marker(store_dir, add=set(), remove=finish)
        actions.append(
            f"finished de-commit of deliberately removed batches {sorted(finish)}"
        )
    now = time.time()
    clearable = gone | {
        b
        for b in set(intents) & on_disk
        if now - intents[b] >= REPLAY_LIVENESS_WINDOW_S
    }
    if clearable:
        clear_removal_intent(store_dir, clearable)
    return actions


def require_committed_batches_on_disk(store_dir: str, op: str) -> None:
    """Maintenance pre-flight: settle any crashed replay swap and any
    crash-interrupted deliberate removal, then refuse if a
    marker-committed batch is STILL missing from raw — running
    rebuild/compact/retention/erase over a raw view with a committed batch
    absent would permanently bake the loss into derived state."""
    # refuse_live: a concurrently-writing replay's staging must not be
    # reclaimed out from under the live stream by a maintenance pre-flight
    settle_replay_staging(store_dir, refuse_live=True)
    settle_removal_intent(store_dir)
    missing = missing_committed_batches(store_dir)
    if missing:
        # a batch can be transiently "missing" during the two renames of a
        # LIVE swap that started after the settle's marker probe — check
        # the writer markers before declaring loss, so the race surfaces
        # as the retriable live-replay refusal, not the torn-replay alarm
        if _any_fresh_writer_marker(store_dir):
            raise RuntimeError(
                "a replay writer marker is fresh - a live ingest replay "
                f"may be mid-swap; retry {op} when it finishes"
            )
        raise RuntimeError(
            f"marker-committed batches missing from raw: {sorted(missing)} "
            f"- torn replay or manual deletion; restore them (or remove "
            f"them from the commit marker explicitly) before {op}"
        )


def checkpoint_committed(store_dir: str, batch_id: int) -> bool:
    """True iff the checkpoint can never replay ``batch_id``. The store
    marker is written inside foreachBatch, BEFORE the engine's commit
    record, so a crash in that window leaves a batch that is
    marker-committed yet still replayable; anything that deletes or merges
    batch partitions (compaction) must additionally require this check for
    non-negative (streaming-owned) ids."""
    if batch_id < 0:
        return True
    return batch_id not in replayable_batches(store_dir)


# -- compaction journal (shared: maintenance writes it, readers honor it) --


def journal_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_compaction.json")


def read_journal(store_dir: str) -> dict | None:
    # tolerate the journal vanishing between exists and open (a concurrent
    # recover/settle just finished): absent either way
    try:
        with open(journal_path(store_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def excluded_batches_for_read(store_dir: str) -> set[int]:
    """Batch ids a READER must skip to see exactly-once data while a
    compaction journal is pending — the reader-side (non-mutating)
    counterpart of recover_compaction: in the ``writing`` state the dest
    may be partial and the sources are authoritative (skip dest); in the
    ``written`` state the dest is verified complete and any surviving
    source dirs are its duplicates (skip sources). Also always excludes
    RETIRED batches (deferred-delete compaction sources awaiting vacuum —
    their rows live on in the compaction dest), so a root-listing reader
    stays exactly-once for the whole retire-to-vacuum window, not just
    while the journal is pending."""
    ex = set(retired_batches(store_dir))
    j = read_journal(store_dir)
    if j is None:
        return ex
    if j["state"] == "writing":
        return ex | {int(j["dest"])}
    return ex | {int(b) for b in j["sources"]}


def data_file_count(root: str) -> int:
    """Count parquet data files under a directory tree (driver-side
    metadata walk)."""
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


# -- snapshot manifests (versioned readable batch sets) --------------------
#
# The plain-parquet answer to the one concurrency gap a transactional
# table format would close (README / maintenance.py "Concurrency
# contract"): a reader that LISTS the raw root races compaction twice —
# between its journal read and its file listing (TOCTOU), and between the
# dest write and the source deletes (double copy). A snapshot manifest
# removes both races the way Delta/Iceberg do: each version file pins an
# immutable batch set, ``CURRENT`` is swapped atomically (tmp+rename),
# and a reader that opens CURRENT once sees exactly one consistent
# version no matter what compaction does concurrently. Batch-granular
# (not file-granular) manifests suffice because batch dirs are immutable
# once committed — the manifest is a few hundred bytes at any scale.
#
# Writers publish implicitly: every ``update_commit_marker`` call (the
# streaming commit, backfill, compaction, recover repair) republishes,
# so CURRENT is always the latest consistent committed set. Deleting
# data out from under a pinned reader is prevented by DEFERRED deletes:
# ``compact_raw(defer_source_delete=True)`` retires its sources instead
# of deleting them, and ``maintenance.vacuum`` removes them only after a
# grace period — size the grace above the longest read, exactly like
# Delta's VACUUM retention.

#: manifest versions kept on disk — readers only ever open CURRENT, so
#: history depth just bounds how stale a pinned version can be and still
#: have its manifest file (its DATA durability is governed by vacuum
#: grace, not by this)
SNAPSHOT_KEEP = 8


def snapshots_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "_snapshots")


def _current_path(store_dir: str) -> str:
    return os.path.join(snapshots_dir(store_dir), "CURRENT")


def _version_path(store_dir: str, version: int) -> str:
    return os.path.join(snapshots_dir(store_dir), f"v{version}.json")


def retired_path(store_dir: str) -> str:
    return os.path.join(snapshots_dir(store_dir), "retired.json")


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def retired_batches(store_dir: str) -> dict[int, float]:
    """Deferred-delete compaction sources awaiting vacuum, with their
    retirement time (unix seconds). Their rows are duplicated by a
    compaction dest, so every reader path must skip them and recover()
    must not mistake them for torn batches."""
    try:
        with open(retired_path(store_dir)) as f:
            return {
                int(k): float(v) for k, v in json.load(f)["retired"].items()
            }
    except FileNotFoundError:
        return {}


@_locked
def retire_batches(store_dir: str, ids: set[int]) -> None:
    """Atomic merge-write; idempotent — a re-run (crash-recovery
    roll-forward) keeps the FIRST retirement time so the vacuum grace
    clock is never reset by replays."""
    cur = retired_batches(store_dir)
    now = time.time()
    for b in ids:
        cur.setdefault(int(b), now)
    os.makedirs(snapshots_dir(store_dir), exist_ok=True)
    _write_json_atomic(
        retired_path(store_dir),
        {"retired": {str(k): v for k, v in sorted(cur.items())}},
    )


@_locked
def clear_retired(store_dir: str, ids: set[int]) -> None:
    cur = {
        k: v for k, v in retired_batches(store_dir).items() if k not in ids
    }
    os.makedirs(snapshots_dir(store_dir), exist_ok=True)
    _write_json_atomic(
        retired_path(store_dir),
        {"retired": {str(k): v for k, v in sorted(cur.items())}},
    )


def current_snapshot(store_dir: str) -> dict | None:
    """The manifest CURRENT points at: ``{"version": N, "batches": [...],
    "published_unix": ts}`` — or None when the store has never published
    (pre-snapshot stores keep working through the listing readers)."""
    try:
        with open(_current_path(store_dir)) as f:
            version = int(f.read().strip())
        with open(_version_path(store_dir, version)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


@_locked
def publish_snapshot(store_dir: str) -> dict:
    """Pin the current consistent readable set — committed minus retired
    minus any pending-journal exclusion — as the next manifest version
    and swap CURRENT to it. No-op (returns the existing manifest) when
    the set is unchanged, so idempotent recovery replays don't churn
    versions. The version file is fully written before CURRENT moves, so
    a crash between the two writes leaves CURRENT on the previous valid
    version."""
    batches = sorted(
        committed_batches(store_dir) - excluded_batches_for_read(store_dir)
    )
    cur = current_snapshot(store_dir)
    if cur is not None and cur["batches"] == batches:
        return cur
    version = (cur["version"] + 1) if cur is not None else 1
    snap = {
        "version": version,
        "batches": batches,
        "published_unix": time.time(),
    }
    os.makedirs(snapshots_dir(store_dir), exist_ok=True)
    _write_json_atomic(_version_path(store_dir, version), snap)
    tmp = _current_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _current_path(store_dir))
    stale = _version_path(store_dir, version - SNAPSHOT_KEEP)
    try:
        os.remove(stale)
    except FileNotFoundError:
        pass
    return snap


# -- level-coverage listing (month granularity, no data scan) ---------------
# The rollup cascade recomputes every TOUCHED (metric, bucket_month)
# partition of a level table from ALL raw in that partition
# (ingest_stream._update_cascade), so a level month directory existing
# means that whole (metric, month) is consistent with raw — coverage is
# decidable from the directory layout alone. Used to guard the leveled
# counter serving paths on stores whose counter levels were enabled after
# raw history already existed (pre-enablement months have raw but no
# level rows until operators/fsck.rebuild_levels runs).


def _month_bounds_ns(d_iso: str) -> tuple[int, int]:
    """[start, end) ns of the UTC month containing ISO date ``d_iso``."""
    import datetime as _dt

    d = _dt.date.fromisoformat(d_iso)
    lo = _dt.datetime(d.year, d.month, 1, tzinfo=_dt.timezone.utc)
    hi = (
        _dt.datetime(d.year + 1, 1, 1, tzinfo=_dt.timezone.utc)
        if d.month == 12
        else _dt.datetime(d.year, d.month + 1, 1, tzinfo=_dt.timezone.utc)
    )
    return (
        int(lo.timestamp()) * 1_000_000_000,
        int(hi.timestamp()) * 1_000_000_000,
    )


def _metric_month_dirs(parent: str) -> dict[str, set[str]]:
    """{metric: {month-ISO}} under one ``metric=*/<time>=*`` tree. Both
    ``ts_month``/``bucket_month`` (first-of-month) and ``ts_date`` (day
    partitions, truncated to their month) layouts are understood; metric
    names are partition-unescaped."""
    from urllib.parse import unquote

    out: dict[str, set[str]] = {}
    if not os.path.isdir(parent):
        return out
    for mname in os.listdir(parent):
        if not mname.startswith("metric="):
            continue
        mdir = os.path.join(parent, mname)
        if not os.path.isdir(mdir):
            continue
        metric = unquote(mname.split("=", 1)[1])
        months = out.setdefault(metric, set())
        for tname in os.listdir(mdir):
            col, eq, val = tname.partition("=")
            if not eq or col not in ("ts_month", "ts_date", "bucket_month"):
                continue
            months.add(val[:8] + "01")  # YYYY-MM-01
    return out


def raw_months_by_metric(store_dir: str) -> dict[str, set[str]]:
    """Months of SERVED raw per metric — committed batches minus the
    read-excluded set (retired / journal-pending), from the directory
    layout alone. Scale note: O(batches x metrics x months) directory
    entries driver-side, the same cardinality class as the store layout
    itself and the documented ``list_metrics`` seam (SCALE.md)."""
    served = committed_batches(store_dir) - excluded_batches_for_read(
        store_dir
    )
    out: dict[str, set[str]] = {}
    for b in sorted(served):
        for metric, months in _metric_month_dirs(
            batch_dir(store_dir, b)
        ).items():
            out.setdefault(metric, set()).update(months)
    return out


def level_months_by_metric(store_dir: str, table: str) -> dict[str, set[str]]:
    """Months present per metric in one level table (``level_<w>`` /
    ``hist_<w>`` / ``counter_<w>``), from the directory layout."""
    return _metric_month_dirs(os.path.join(store_dir, table))


def counter_coverage_gaps(
    store_dir: str,
    width_ns: int,
    raw_months: dict[str, set[str]] | None = None,
) -> dict[str, list[tuple[int, int]]]:
    """Per-metric [start, end)-ns month spans that SERVED raw holds but
    ``counter_<width_ns>`` does NOT — i.e. ranges where the leveled
    counter serving paths would silently miss data (counter levels
    enabled on a store with pre-existing raw; healed by
    ``operators/fsck.rebuild_levels``). Empty dict on a healthy store.

    Month granularity is exact-or-conservative: a level month dir
    existing proves the whole (metric, month) consistent (cascade
    recomputes whole partitions); the reverse test can only over-report
    near month boundaries (a sample whose bucket starts in the previous
    month), costing a needless raw fallback, never a wrong answer.
    Adjacent uncovered months are merged into one span.
    ``raw_months`` (precomputed :func:`raw_months_by_metric`) lets a
    caller checking several widths walk raw once."""
    cov = level_months_by_metric(store_dir, f"counter_{width_ns}")
    if raw_months is None:
        raw_months = raw_months_by_metric(store_dir)
    gaps: dict[str, list[tuple[int, int]]] = {}
    for metric, months in raw_months.items():
        missing = sorted(months - cov.get(metric, set()))
        if not missing:
            continue
        spans: list[tuple[int, int]] = []
        for m in missing:
            lo, hi = _month_bounds_ns(m)
            if spans and spans[-1][1] == lo:
                spans[-1] = (spans[-1][0], hi)
            else:
                spans.append((lo, hi))
        gaps[metric] = spans
    return gaps


# -- store epoch (mutation clock for resident readers) -----------------------


def epoch_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_epoch")


def bump_store_epoch(store_dir: str) -> int:
    """Advance the explicit surgery tick. Called by mutators whose work
    is INVISIBLE in the other metadata files a reader can stat — metric
    erase/rename (when no batch empties, they only rewrite data dirs)
    and level rebuilds. Writers that already move the commit marker /
    retention floors / retired ledger don't need it: ``store_epoch``
    folds those files' stat signatures in."""
    try:
        with open(epoch_path(store_dir)) as f:
            n = int(f.read().strip())
    except (FileNotFoundError, ValueError):
        n = 0
    n += 1
    tmp = epoch_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, epoch_path(store_dir))
    return n


def store_epoch(store_dir: str) -> tuple:
    """Cheap composite mutation stamp: changes whenever committed data,
    retention floors, the retired ledger, or the surgery tick change —
    i.e. whenever a resident server's pinned relations and prepared
    plans may be stale. Four stat calls, no file reads; compare tuples
    for equality only."""
    sig = []
    for p in (
        marker_path(store_dir),
        os.path.join(store_dir, "_retention.json"),
        retired_path(store_dir),
        epoch_path(store_dir),
    ):
        try:
            st = os.stat(p)
            sig.append((st.st_mtime_ns, st.st_size))
        except FileNotFoundError:
            sig.append(None)
    return tuple(sig)

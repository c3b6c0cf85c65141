"""Serving-state snapshots: pin an immutable, queryable view of the
incremental serving family — Iceberg's snapshot / time-travel model
applied to the Lucene-style multi-segment family that
:mod:`nadry_spark.streaming.ingest` maintains.

A snapshot records the serving state (ordered segment list + batch
watermark) at a point in time under ``segments_root/snapshots/``.
Because segments are immutable once written (finalizes only ADD
segments; only compaction rewrites), pinning the segment list is
enough to reproduce the exact corpus a query saw — including
tombstone semantics: a snapshot taken before a re-crawl does not list
the newer segment, so the superseded doc is served un-tombstoned,
exactly as it was at snapshot time.

Lineage: each snapshot records its ``parent`` (the previous snapshot
id), forming the commit chain the north rule's resumability story
asks for. Garbage collection is explicit and snapshot-aware:
``vacuum_segments`` removes only segment directories referenced by
neither the current serving state nor any live snapshot, and
``compact_serving`` (in :mod:`.ingest`) routes its post-merge cleanup
through the same liveness check, so a forced merge can never delete a
segment a snapshot still needs.

Reference parity note: the reference serves only "latest" state
(Nadry-Search-Engine-BE has no versioned index); snapshots are part of
the large-scale operability layer this rebuild adds on top.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

_SNAP_DIR = "snapshots"
_SNAP_RE = re.compile(r"^snap_(\d+)\.json$")
_SERVING_STATE = "serving_state.json"


def _snap_dir(segments_root: str) -> str:
    return os.path.join(segments_root, _SNAP_DIR)


def list_snapshots(segments_root: str) -> list[dict]:
    """All snapshots, ordered by id ascending."""
    d = _snap_dir(segments_root)
    if not os.path.isdir(d):
        return []
    snaps = []
    for name in os.listdir(d):
        m = _SNAP_RE.match(name)
        if m:
            with open(os.path.join(d, name)) as f:
                snaps.append(json.load(f))
    return sorted(snaps, key=lambda s: s["id"])


def create_snapshot(segments_root: str, note: str | None = None) -> dict:
    """Pin the CURRENT serving state as a new immutable snapshot.

    Returns the snapshot dict (``id``, ``parent``, ``segments``,
    ``finalized_through``, ``note``, ``created_utc``). The file write
    is atomic (tmp + rename); a crash mid-call leaves no partial
    snapshot. Calling with an unchanged serving state creates a new id
    over the same segment list — ids are commit points, not content
    hashes."""
    state_path = os.path.join(segments_root, _SERVING_STATE)
    with open(state_path) as f:
        state = json.load(f)
    snaps = list_snapshots(segments_root)
    new_id = (snaps[-1]["id"] + 1) if snaps else 1
    snap = {
        "id": new_id,
        "parent": snaps[-1]["id"] if snaps else None,
        "finalized_through": state["finalized_through"],
        "segments": list(state["segments"]),
        "note": note,
        "created_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    d = _snap_dir(segments_root)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"snap_{new_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f)
    os.replace(tmp, path)
    return snap


def get_snapshot(segments_root: str, snapshot_id: int) -> dict:
    path = os.path.join(_snap_dir(segments_root), f"snap_{int(snapshot_id)}.json")
    with open(path) as f:
        return json.load(f)


def open_snapshot(spark, segments_root: str, snapshot_id: int):
    """Time travel: a MultiSegmentIndex serving exactly the corpus the
    family held when the snapshot was taken."""
    from nadry_spark.sources.segments import MultiSegmentIndex

    snap = get_snapshot(segments_root, snapshot_id)
    return MultiSegmentIndex(
        spark, [os.path.join(segments_root, n) for n in snap["segments"]]
    )


def drop_snapshot(segments_root: str, snapshot_id: int) -> None:
    """Remove a snapshot commit point. Segment data it pinned becomes
    eligible for :func:`vacuum_segments` (it is NOT deleted here)."""
    path = os.path.join(_snap_dir(segments_root), f"snap_{int(snapshot_id)}.json")
    os.remove(path)


def live_segment_names(segments_root: str) -> set[str]:
    """Segment dir names referenced by the current serving state or by
    any snapshot — everything GC must keep."""
    live: set[str] = set()
    state_path = os.path.join(segments_root, _SERVING_STATE)
    if os.path.exists(state_path):
        with open(state_path) as f:
            live.update(json.load(f)["segments"])
    for snap in list_snapshots(segments_root):
        live.update(snap["segments"])
    return live


def vacuum_segments(segments_root: str) -> list[str]:
    """Delete segment directories (``seg_*``) referenced by neither the
    serving state nor any snapshot. Returns the removed names. Only
    paths matching the segment naming scheme are ever touched."""
    live = live_segment_names(segments_root)
    removed = []
    for name in sorted(os.listdir(segments_root)):
        full = os.path.join(segments_root, name)
        if name.startswith("seg_") and os.path.isdir(full) and name not in live:
            shutil.rmtree(full)
            removed.append(name)
    return removed

"""State / bookmark handling: fold, persist, restore.

Reference semantics:
- STATE messages fold cumulatively with ``stateRecords.putAll(value)`` —
  last value per key wins across the run (AbstractPythonSinger.java:249-251).
- Merged state is persisted to a KV store under ``stateName`` (default
  ``singer-state``) only after a successful run
  (AbstractPythonSinger.java:240-247; taps/AbstractPythonTap.java:104-106).
- On the next run the state is restored, ``{}`` if absent
  (taps/AbstractPythonTap.java:69-80).
- Bookmarks live under ``state["bookmarks"][stream]`` as replication-key
  high-water marks (models/StateBookmark.java:10-12).

Engine upgrade: bookmarks are co-committed with the lake-table snapshot
(see lake/table.py properties) so state and data are atomic — the reference
is only at-least-once (state saved after data), we are exactly-once.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

DEFAULT_STATE_NAME = "singer-state"  # AbstractPythonSinger.java:70-72


def merge_state(acc: dict[str, Any], value: dict[str, Any]) -> dict[str, Any]:
    """``putAll`` fold — shallow last-writer-wins per top-level key, with one
    refinement: ``bookmarks`` sub-maps merge per-stream (Singer taps emit
    per-stream bookmark updates; a later STATE for stream B must not drop
    stream A's bookmark)."""
    for k, v in (value or {}).items():
        if k == "bookmarks" and isinstance(v, dict) and isinstance(acc.get(k), dict):
            acc[k] = {**acc[k], **v}
        else:
            acc[k] = v
    return acc


def fold_states(states: list[tuple[int, dict[str, Any]]]) -> dict[str, Any]:
    """Fold STATE messages in seq order into the final state map."""
    acc: dict[str, Any] = {}
    for _seq, value in sorted(states, key=lambda x: x[0]):
        merge_state(acc, value)
    return acc


def get_bookmark(state: dict[str, Any], stream: str, key: str | None = None) -> Any:
    bm = (state.get("bookmarks") or {}).get(stream)
    if bm is None:
        return None
    if key is None:
        return bm
    if isinstance(bm, dict):
        return bm.get(key)
    return bm


def set_bookmark(state: dict[str, Any], stream: str, key: str, value: Any) -> dict[str, Any]:
    state.setdefault("bookmarks", {}).setdefault(stream, {})[key] = value
    return state


class StateStore:
    """File-backed KV store for state JSON — the engine's analog of the
    reference's run-context KV store. Writes are atomic (tmp + rename) so a
    crashed run never leaves a torn state file."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def load(self, name: str = DEFAULT_STATE_NAME) -> dict[str, Any]:
        """Restore state; missing ⇒ {} (taps/AbstractPythonTap.java:77-79)."""
        try:
            with open(self._path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def save(self, state: dict[str, Any], name: str = DEFAULT_STATE_NAME) -> str:
        """Persist only non-empty state (targets/AbstractPythonTarget.java:56-58)."""
        if not state:
            return self._path(name)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f, sort_keys=True)
        os.replace(tmp, self._path(name))
        return self._path(name)

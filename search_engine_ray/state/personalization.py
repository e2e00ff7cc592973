"""User-profile personalization engine.

Reimplements the reference's ``PersonalizationEngine``
(``/root/reference/src/domain/PersonalizationEngine.ts:49-293``): a
JSON-file-backed map of user profiles — per-doc event counters,
preferences, tags — with save-on-mutation persistence and
``getBoost(userId, docId) -> event count`` (``:144-159``).

Rank-time semantics: the reference *wires* a ``personalizationEngine``
per index (``SearchEngine.ts:92,111``) but has no call site applying the
boost during ranking — so the integration here is explicitly opt-in and
documented as this repo's interpretation: ``IndexSearcher.search(...,
user_id=...)`` adds the user's per-doc event count to the BM25 score
before top-k selection (additive boost, the natural reading of
``getBoost`` returning a count).

Scale shape: one user's profile is tiny (the docs they interacted
with), so the boost table rides into scoring tasks as a small dict —
broadcast, never shuffled.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

EVENT_TYPES = (
    "click", "view", "purchase", "bookmark", "share", "like", "dislike",
)  # UserEventType, PersonalizationEngine.ts:17-25


def _empty_profile() -> Dict[str, Any]:
    # PersonalizationEngine.ts:118-123
    return {"events": {}, "lastActivity": None, "tags": []}


class PersonalizationEngine:
    """File-backed user-profile store (addEvent / getBoost / save / load).

    ``autosave=True`` mirrors the reference's save-on-every-mutation
    (``addEvent`` → ``this.save()``, PersonalizationEngine.ts:135);
    pass ``False`` for batch loads and call :meth:`save` once.
    """

    def __init__(
        self, file_path: str = "./userProfiles.json", autosave: bool = True
    ):
        if not file_path or not isinstance(file_path, str):
            raise ValueError("File path must be a non-empty string")
        self.file_path = file_path
        self.autosave = autosave
        self.profiles: Dict[str, Dict[str, Any]] = {}
        self.load()

    # --- persistence (ts:66-102) ---------------------------------------
    def load(self) -> None:
        try:
            if os.path.exists(self.file_path):
                with open(self.file_path) as f:
                    data = json.load(f)
                if isinstance(data, dict):
                    self.profiles = {
                        u: p for u, p in data.items() if isinstance(p, dict)
                    }
        except (OSError, json.JSONDecodeError):
            # reference logs and continues with an empty map (ts:85-88)
            self.profiles = {}

    def save(self) -> None:
        tmp = self.file_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.profiles, f, indent=2)
        os.replace(tmp, self.file_path)

    def _maybe_save(self) -> None:
        if self.autosave:
            self.save()

    # --- mutation (ts:110-136, 179-237) --------------------------------
    def _profile(self, user_id: str) -> Dict[str, Any]:
        if not user_id or not isinstance(user_id, str):
            raise ValueError("User ID must be a non-empty string")
        return self.profiles.setdefault(user_id, _empty_profile())

    def add_event(
        self, user_id: str, doc_id, event_type: str = "click"
    ) -> None:
        if event_type not in EVENT_TYPES:
            raise ValueError(f"unknown event type: {event_type!r}")
        p = self._profile(user_id)
        events = p.setdefault("events", {})
        key = str(doc_id)
        events[key] = events.get(key, 0) + 1
        p["lastActivity"] = time.time()
        self._maybe_save()

    def set_user_preferences(
        self, user_id: str, preferences: Dict[str, Any]
    ) -> None:
        if not isinstance(preferences, dict):
            raise ValueError("Preferences must be an object")
        p = self._profile(user_id)
        p["preferences"] = dict(preferences)
        p["lastActivity"] = time.time()
        self._maybe_save()

    def add_user_tags(self, user_id: str, tags: List[str]) -> None:
        if not isinstance(tags, list):
            raise ValueError("Tags must be an array")
        p = self._profile(user_id)
        have = p.setdefault("tags", [])
        for t in tags:  # unique, order-preserving (ts:229-233)
            if isinstance(t, str) and t not in have:
                have.append(t)
        p["lastActivity"] = time.time()
        self._maybe_save()

    def remove_user(self, user_id: str) -> bool:
        if self.profiles.pop(user_id, None) is not None:
            self._maybe_save()
            return True
        return False

    def clear(self) -> None:
        self.profiles.clear()
        self._maybe_save()

    # --- lookup (ts:144-172, 243-245, 277-292) -------------------------
    def get_boost(self, user_id: str, doc_id) -> int:
        p = self.profiles.get(user_id) if isinstance(user_id, str) else None
        if not p:
            return 0
        return int((p.get("events") or {}).get(str(doc_id), 0))

    def get_user_profile(self, user_id: str) -> Optional[Dict[str, Any]]:
        return self.profiles.get(user_id) if isinstance(user_id, str) else None

    def get_user_ids(self) -> List[str]:
        return list(self.profiles.keys())

    def user_events(self, user_id: str) -> Dict[int, int]:
        """The user's {doc_id: count} table with int64 doc ids — the
        broadcast side-table for rank-time boosting."""
        p = self.profiles.get(user_id)
        out: Dict[int, int] = {}
        for k, v in ((p or {}).get("events") or {}).items():
            try:
                out[int(k)] = int(v)
            except (TypeError, ValueError):
                continue
        return out

    def stats(self) -> Dict[str, float]:
        total_users = len(self.profiles)
        total_events = sum(
            sum((p.get("events") or {}).values())
            for p in self.profiles.values()
        )
        return {
            "totalUsers": total_users,
            "totalEvents": total_events,
            "averageEventsPerUser": (
                total_events / total_users if total_users else 0.0
            ),
        }

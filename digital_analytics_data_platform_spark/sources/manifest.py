"""File manifest with content hashes — idempotent re-upload guard (S9):
sha256 of file bytes registered per logical key; an already-active
identical hash is a skip, a changed hash supersedes
(``01_Notebook_v8.ipynb:215,224,265``: ``file_hash`` + ``status='active'``).
"""

from __future__ import annotations

import hashlib
import json
import os
import time


class FileManifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    @staticmethod
    def content_hash(file_path: str) -> str:
        h = hashlib.sha256()
        with open(file_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def should_process(self, logical_key: str, file_path: str) -> bool:
        """True if the file's content differs from the active entry."""
        entries = self._load()
        active = entries.get(logical_key)
        return active is None or active["file_hash"] != self.content_hash(file_path)

    def register(self, logical_key: str, file_path: str) -> dict:
        """Mark this content as the active version for the key
        (supersedes any prior entry — delete-then-replace semantics)."""
        entries = self._load()
        rec = {
            "file_hash": self.content_hash(file_path),
            "source_path": file_path,
            "registered_at": time.time(),
            "status": "active",
        }
        entries[logical_key] = rec
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f, indent=1)
        os.replace(tmp, self.path)
        return rec

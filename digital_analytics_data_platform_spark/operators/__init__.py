"""Operator library — the reference's relational/dataflow patterns
(SURVEY.md §2) re-expressed as composable DataFrame transforms, plus
the training-data-pipeline operators (dedup families, similarity
search, text analysis, multimodal plumbing)."""

from .dedupe import dedupe_lww, dedupe_lww_window, dedupe_lww_salted
from .asof import asof_join
from .patch import PatchTable, patch_collapse

__all__ = [
    "dedupe_lww",
    "dedupe_lww_window",
    "dedupe_lww_salted",
    "asof_join",
    "PatchTable",
    "patch_collapse",
]

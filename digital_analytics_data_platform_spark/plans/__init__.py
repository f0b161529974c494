"""Medallion pipeline plans for the transcripts data model:
Bronze (CDC apply — lake.merge) → Silver (enrichment) → Gold (marts),
plus the QA suite (quality.py), mirroring the reference's
Bronze→Silver→Gold orchestration contract (``README.md:267-268``:
"Gold QA should pass before dashboards consume")."""

from .transcripts import (
    build_silver,
    conv_dim_snapshot,
    gold_daily_wide,
    gold_long,
    gold_weekly_wide,
)
from .quality import run_quality_checks
from .pipeline import MedallionPipeline, MedallionResult
from .ivm import DistinctCountRollup, IncrementalRollup, JoinRollup, SketchRollup

__all__ = [
    "DistinctCountRollup",
    "IncrementalRollup",
    "JoinRollup",
    "SketchRollup",
    "MedallionPipeline",
    "MedallionResult",
    "build_silver",
    "conv_dim_snapshot",
    "gold_daily_wide",
    "gold_weekly_wide",
    "gold_long",
    "run_quality_checks",
]

"""File ingestion: landing -> raw zone routing (EP1, pre-Spark stage).

Mirrors the reference's Lambda (reference: lambda/ingestion_to_raw.py):
  * accept only .csv (:21-23)
  * file_type = filename prefix before the first '_' (:28-29)
  * load_date = today UTC (:25)
  * rename with a millisecond timestamp suffix (:31-33)
  * move to raw/{file_type}/fecha_carga={load_date}/ (:35-47)

Pure-Python file staging — not a Spark op; at scale this is whatever
object-store event routing the deployment uses. The function returns the
arguments the reference passes to its Glue job (:49-60), which here feed
transform.run_pipeline directly.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path


@dataclass(frozen=True)
class IngestResult:
    file_type: str
    raw_path: str
    load_date: str  # YYYY-MM-DD
    skipped: bool = False
    reason: str = ""


def ingest_file(landing_file: str | Path, lake_root: str | Path, *, now: datetime | None = None) -> IngestResult:
    """Move one landed file into the raw zone; returns routing args."""
    src = Path(landing_file)
    root = Path(lake_root)
    now = now or datetime.now(timezone.utc)
    load_date = now.strftime("%Y-%m-%d")

    if src.suffix.lower() != ".csv":
        return IngestResult("", str(src), load_date, skipped=True, reason="not a .csv file")

    base = src.stem
    file_type = base.split("_", 1)[0].lower()
    ts_ms = int(now.timestamp() * 1000)
    dest_dir = root / "raw" / file_type / f"fecha_carga={load_date}"
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / f"{base}_{ts_ms}.csv"
    shutil.move(str(src), str(dest))
    return IngestResult(file_type, str(dest), load_date)

"""Data-layout utilities (SURVEY.md §2.12 O4).

Plain-Python equivalents of the reference's click CLIs — these are
filesystem preparation steps that run before any Spark job:

- ``untar_directory``    (reference: click/untar_directory.py:18-77)
- ``reorganise_candidate_dirs`` by schedule-block date
                         (reference: click/reorg_cand_dir.py:20-142)
- ``delete_empty_candidate_dirs``
                         (reference: click/delete_empty_cand_dirs.py:16-37)

Kept out of the engine proper (no DataFrame semantics); a cluster
deployment would run these on the landing zone or replace them with
object-store lifecycle rules.
"""

from __future__ import annotations

import json
import shutil
import tarfile
from pathlib import Path


def untar_directory(
    source_dir: str | Path, dest_dir: str | Path, remove_archives: bool = False
) -> list[Path]:
    """Extract every ``*.tar*`` under source_dir into dest_dir (one
    subdirectory per archive, like the reference's per-file extraction).
    Returns the extraction roots."""
    source, dest = Path(source_dir), Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    roots: list[Path] = []
    for archive in sorted(source.rglob("*.tar*")):
        target = dest / archive.stem.replace(".tar", "")
        target.mkdir(parents=True, exist_ok=True)
        with tarfile.open(archive) as tf:
            tf.extractall(target, filter="data")
        roots.append(target)
        if remove_archives:
            archive.unlink()
    return roots


def _sb_date_of(cand_dir: Path) -> str | None:
    """Date (YYYY-MM-DD) of the schedule block recorded in the dir's run
    summary, or None when absent/unparseable."""
    for summary in cand_dir.glob("*run_summary.json"):
        try:
            doc = json.loads(summary.read_text())
            start = doc.get("sb_details", {}).get("actual_start_time", "")
            if len(start) >= 10:
                return start[:10]
        except (json.JSONDecodeError, OSError):
            continue
    return None


def reorganise_candidate_dirs(data_dir: str | Path) -> dict[str, list[str]]:
    """Move each candidate directory under a ``<YYYY-MM-DD>/`` partition
    derived from its schedule block start (the reference's reorg CLI).
    Returns {date: [moved dirs]}; dirs without a parseable summary stay."""
    root = Path(data_dir)
    moved: dict[str, list[str]] = {}
    for cand_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        if len(cand_dir.name) == 10 and cand_dir.name[4] == "-":
            continue  # already a partition dir
        date = _sb_date_of(cand_dir)
        if date is None:
            continue
        part = root / date
        part.mkdir(exist_ok=True)
        target = part / cand_dir.name
        shutil.move(str(cand_dir), str(target))
        moved.setdefault(date, []).append(cand_dir.name)
    return moved


def delete_empty_candidate_dirs(data_dir: str | Path) -> list[str]:
    """Remove empty candidate directories (reference: delete_empty_cand_dirs)."""
    root = Path(data_dir)
    removed = []
    for p in sorted(root.rglob("*"), reverse=True):
        if p.is_dir() and not any(p.iterdir()):
            p.rmdir()
            removed.append(str(p))
    return removed

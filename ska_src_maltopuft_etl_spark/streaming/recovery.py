"""Checkpoint recovery for kill-during-batch-0 restarts.

Round-14 racy-restart fuzzing (`tools/fuzz_stream.py --force-racy`)
surfaced a second sharp edge past the watermark-advance hole: a kill
landing while Spark is writing the very FIRST offset-log entry leaves
residue (a temp/partial file) in ``{checkpoint}/offsets`` without a
committed entry. On restart, ``OffsetSeqLog.getLatest()`` finds no
committed batch, so ``MicroBatchExecution`` treats the query as NEW and
``verifyNewCheckpointDirectory`` hard-fails with
``STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY`` ("The checkpoint location
.../offsets should be empty on batch 0 ... either use a new checkpoint
location, or delete the existing data"). Every further restart fails
identically — the checkpoint is wedged.

Spark's suggested remedy ("delete the existing data") is exactly-once
SAFE here, and this module makes the safety argument checkable instead
of hoped-for:

- The micro-batch WAL order is: write ``offsets/N`` -> execute batch N
  -> commit sink (``_spark_metadata/N`` for file sinks) -> write
  ``commits/N``. No committed ``offsets`` entry therefore implies no
  batch ever EXECUTED, no sink commit, and no state-store snapshot for
  any batch — everything in the checkpoint is uncommitted residue.
- Clearing it and restarting reprocesses the sources from scratch;
  with nothing previously committed to the sink's metadata log, the
  rerun is the FIRST delivery — exactly-once holds. This is the same
  re-run contract as the reference's idempotent loader
  (core/database_loader.py:159-189): a failed run that never committed
  may be repeated wholesale.

``clear_aborted_batch0`` REFUSES (returns False, deletes nothing) when
either precondition is observable-false: a committed (numeric-named)
entry in ``offsets``/``commits``, or — when ``sink_path`` is given — a
committed batch in the sink's ``_spark_metadata`` (a reused sink from
an OLDER checkpoint lineage would silently swallow the rerun's batch 0,
because ``FileStreamSink`` skips already-committed batch ids).

Paths are local-filesystem (``file:``) scoped — the deployment model of
this repo's availableNow batch loads; object-store checkpoints go
through the same logic once a Hadoop-FS seam is needed.
"""

from __future__ import annotations

import os
import shutil


def _committed_entries(metadata_dir: str) -> list[str]:
    """Committed HDFSMetadataLog entries: files whose basename is purely
    numeric (batch ids). Temp residue (``.N.<uuid>.tmp``), CRC files and
    anything else is NOT a committed entry."""
    if not os.path.isdir(metadata_dir):
        return []
    return [n for n in os.listdir(metadata_dir) if n.isdigit()]


def _residue(metadata_dir: str) -> list[str]:
    if not os.path.isdir(metadata_dir):
        return []
    return os.listdir(metadata_dir)


def is_aborted_batch0(checkpoint: str) -> bool:
    """True iff the checkpoint shows the wedged kill-during-batch-0
    signature: residue in ``offsets`` (or ``commits``/``state``) but no
    committed entry anywhere — the state that makes Spark raise
    ``STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY`` on restart."""
    ckpt = checkpoint.rstrip("/")
    offsets = os.path.join(ckpt, "offsets")
    commits = os.path.join(ckpt, "commits")
    if _committed_entries(offsets) or _committed_entries(commits):
        return False
    return bool(
        _residue(offsets)
        or _residue(commits)
        or _residue(os.path.join(ckpt, "state"))
    )


def clear_aborted_batch0(checkpoint: str, sink_path: str | None = None) -> bool:
    """Clear a checkpoint wedged by a kill during the batch-0 offset
    write, iff that is provably what happened. Returns True when the
    checkpoint was cleared (safe to restart on the SAME location) and
    False when preconditions fail (nothing is touched).

    Safety preconditions, all checked:

    1. no committed entry in ``{checkpoint}/offsets`` — no batch was
       ever planned to completion;
    2. no committed entry in ``{checkpoint}/commits`` — implied by (1),
       checked anyway (defense against a hand-edited checkpoint);
    3. if ``sink_path`` is given: no committed batch in the sink's
       ``_spark_metadata`` — a sink that already committed batches
       belongs to another lineage, and ``FileStreamSink`` would skip
       the rerun's batch 0 instead of writing it.
    """
    ckpt = checkpoint.rstrip("/")
    if not os.path.isdir(ckpt):
        return False
    if _committed_entries(os.path.join(ckpt, "offsets")):
        return False
    if _committed_entries(os.path.join(ckpt, "commits")):
        return False
    if sink_path is not None:
        sink_log = os.path.join(sink_path.rstrip("/"), "_spark_metadata")
        if _committed_entries(sink_log):
            return False
    for name in os.listdir(ckpt):
        p = os.path.join(ckpt, name)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                pass
    return True

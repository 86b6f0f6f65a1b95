"""Crash-safe snapshot store for foreachBatch maintainers
(`upsert_stream`, `sketch_stream`): replace a parquet directory so that
SOME complete state always survives a kill at any instant.

The naive ``rmtree(target); rename(tmp, target)`` has a window where
the old state is deleted and the new one not yet in place — a crash
there, followed by Structured Streaming's batch replay, makes the
maintainer silently rebuild from ONE batch (the target is simply
absent, which is indistinguishable from "first batch ever").  The
three-step swap here never has both copies gone:

    write tmp  →  rename(target, old)  →  rename(tmp, target)
               →  rmtree(old)

and ``recover`` (called before every read of the state) repairs the
one remaining window — target renamed away but the new one not yet in
— by renaming ``old`` back.  Stale ``tmp``/``old`` leftovers from
killed batches are cleaned on the next call.  On an object store the
whole pattern collapses into a table-format MERGE/commit (Iceberg,
Delta); these renames are its filesystem stand-in.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def _old(target_dir: str) -> str:
    return target_dir + ".__old"


def recover(target_dir: str) -> None:
    """Repair a half-finished swap: if the live dir is missing but the
    set-aside previous state exists, promote it back.  Idempotent."""
    if not os.path.exists(target_dir) and os.path.exists(_old(target_dir)):
        os.rename(_old(target_dir), target_dir)


def atomic_replace(df: DataFrame, target_dir: str, batch_id: int) -> None:
    """Materialize ``df`` as the new content of ``target_dir`` with the
    crash-safe three-step swap."""
    tmp = target_dir + f".__next{batch_id}"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_dir):
        shutil.rmtree(_old(target_dir), ignore_errors=True)
        os.rename(target_dir, _old(target_dir))
    os.rename(tmp, target_dir)
    shutil.rmtree(_old(target_dir), ignore_errors=True)

"""THE create-if-absent publish seam — the one function every
commit-protocol surface routes its atomicity through.

Two sinks need "exactly one concurrent writer may publish this name;
everyone else observes a conflict; readers never see partial content":
the versioned-table manifest (`sources/versioned.py`) and the
WebDataset streaming ledger (`llm/webdataset.py`). Both express it via
:func:`publish_atomic` so the object-store port is ONE function — S3
``If-None-Match: *``, GCS ``x-goog-if-generation-match: 0``, Azure
``If-None-Match: *``, or a metastore conditional insert on stores
without conditional puts (the Delta-on-S3 commit-service shape).
Nothing else in commit/read/vacuum/ledger code touches filesystem
atomicity primitives.

Contract (everything both protocols' correctness rests on):

- ``staged`` is fully written before the call; ``publish_atomic``
  makes it visible under ``dst`` all-at-once (readers can never
  observe partial content — the stage-then-link discipline, NOT
  open-exclusive-then-write, which exposes a torn-read window
  between creation and the last byte).
- Exactly one concurrent caller for a given ``dst`` succeeds; every
  other MUST observe ``FileExistsError`` — never a silent overwrite.
- The caller owns cleanup of ``staged`` (success and conflict alike).

This implementation is POSIX-local: ``os.link`` is kernel-atomic and
fails EEXIST.
"""

from __future__ import annotations

import json
import os
import tempfile


def publish_atomic(staged: str, dst: str) -> None:
    """Atomically publish the fully-written file ``staged`` as ``dst``,
    create-if-absent. Raises ``FileExistsError`` if ``dst`` exists."""
    os.link(staged, dst)


def publish_json_atomic(obj: dict, dst: str) -> bool:
    """Stage ``obj`` as JSON next to ``dst`` and publish it atomically.

    Returns ``True`` on success, ``False`` if ``dst`` already existed
    (the at-least-once replay case: a prior attempt published an
    equivalent entry — callers treat it as a no-op re-publish). The
    staging file never survives either way.
    """
    d = os.path.dirname(dst)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(obj, fh)
        publish_atomic(tmp, dst)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)

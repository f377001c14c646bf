"""External formatter hook (SURVEY M36).

Non-fatal subprocess fan-out to a user-configured formatter over written
YAML/SQL paths (reference: src/dbt_osmosis/core/formatting.py:36-135 —
shlex-split command + file args, 120 s timeout, failures logged not raised).
"""

from __future__ import annotations

import logging
import shlex
import subprocess
from pathlib import Path

log = logging.getLogger(__name__)

FORMATTER_TIMEOUT_S = 120


def run_formatter(command: str, paths: list[str | Path]) -> bool:
    """`command` is shlex-split, file paths appended; returns success.
    Never raises — a broken formatter must not fail the pipeline."""
    if not command or not paths:
        return True
    argv = shlex.split(command) + [str(p) for p in paths]
    try:
        proc = subprocess.run(
            argv, capture_output=True, text=True, timeout=FORMATTER_TIMEOUT_S
        )
        if proc.returncode != 0:
            log.warning("formatter %r exited %d: %s", argv[0], proc.returncode, proc.stderr[:500])
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as e:
        log.warning("formatter %r failed: %s", argv[0], e)
        return False
